"""Test configuration.

Runs the whole suite on CPU with 8 virtual XLA host devices so that
(a) CI needs no TPU hardware (the reference's biggest testing weakness was
requiring a self-hosted GPU runner; reference .github/workflows/build-test.
yml:11-13), and (b) multi-chip sharding paths execute for real against an
8-device mesh. x64 is enabled so complex128 oracle comparisons are exact.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env presets a TPU platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The session's sitecustomize registers a TPU PJRT plugin and force-sets
# jax_platforms at interpreter startup; the config update (not just the env
# var) is what actually pins tests to CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compile cache: the suite is compile-bound (hundreds of distinct
# jitted circuit programs); caching across runs cuts wall-clock several-fold.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def random_state(num_qubits: int, rng: np.random.Generator) -> np.ndarray:
    """A normalized random complex128 state."""
    dim = 1 << num_qubits
    s = rng.standard_normal(dim) + 1j * rng.standard_normal(dim)
    return s / np.linalg.norm(s)


def assert_states_close(a, b, atol=1e-10):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol, rtol=0)


def assert_states_close_up_to_phase(a, b, atol=1e-10):
    """Global-phase-insensitive comparison (analog of the reference's
    comparator in tests/test_gate_algebra.cu:46-97)."""
    a = np.asarray(a).ravel()
    b = np.asarray(b).ravel()
    i = int(np.argmax(np.abs(b)))
    if abs(b[i]) < 1e-12:
        raise AssertionError("reference state is ~zero")
    ph = a[i] / b[i]
    assert abs(abs(ph) - 1.0) < 1e-6, f"amplitude mismatch: |phase|={abs(ph)}"
    np.testing.assert_allclose(a, ph * b, atol=atol, rtol=0)
