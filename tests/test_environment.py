"""Environment sanity tests (analog of reference tests/test_warmup.cu: raw
CUDA vector-add/reduction/properties checks): verify the JAX stack beneath
the simulator behaves before blaming simulator code."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestJaxEnvironment:
    def test_devices_present(self):
        assert len(jax.devices()) >= 1

    def test_virtual_device_count_for_sharding_tests(self):
        # conftest requests 8 virtual CPU devices; sharding suites need them
        assert len(jax.devices()) == 8

    def test_elementwise(self):
        x = jnp.arange(1024, dtype=jnp.float32)
        y = jax.jit(lambda a: a * 2 + 1)(x)
        np.testing.assert_allclose(np.asarray(y), np.arange(1024) * 2 + 1)

    def test_reduction(self):
        x = jnp.ones((4096,), jnp.float32)
        assert float(jnp.sum(x)) == 4096.0

    def test_matmul_precision_highest(self):
        # the engine relies on Precision.HIGHEST f32 contractions
        rng = np.random.default_rng(0)
        a = rng.standard_normal((64, 64)).astype(np.float32)
        b = rng.standard_normal((64, 64)).astype(np.float32)
        out = jax.jit(
            lambda x, y: jnp.einsum(
                "ij,jk->ik", x, y, precision=jax.lax.Precision.HIGHEST
            )
        )(a, b)
        np.testing.assert_allclose(
            np.asarray(out), a.astype(np.float64) @ b.astype(np.float64),
            rtol=1e-5, atol=1e-4,
        )

    def test_prng_reproducibility(self):
        k = jax.random.PRNGKey(42)
        a = jax.random.uniform(k, (16,))
        b = jax.random.uniform(k, (16,))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_donation_semantics(self):
        # buffer donation must not change results
        f = jax.jit(lambda s: s * 2.0, donate_argnums=(0,))
        x = jnp.ones((256,), jnp.float32)
        y = f(x)
        assert float(y[0]) == 2.0

    def test_x64_enabled_for_oracle_comparisons(self):
        assert jnp.asarray(np.float64(1.0)).dtype == jnp.float64
