"""Shared benchmark harness utilities.

All timings chain K executions inside one jitted program (single dispatch)
and sync with a scalar readback — honest device-side numbers with no
async-launch artifacts (the pitfall behind the reference's flat ~0.25 ms
curves, reference README.md:40-41) and no remote-tunnel dispatch tax.
"""

from __future__ import annotations

import time
from typing import Callable

import numpy as np


def setup_jax():
    import os

    import jax

    # Honor JAX_PLATFORMS even when a sitecustomize registered a TPU plugin
    # and force-set jax_platforms at interpreter startup (config wins over
    # the env var, so reconcile config with the env before any backend
    # initializes — e.g. smoke tests pin subprocesses to CPU this way).
    env_platforms = os.environ.get("JAX_PLATFORMS", "")
    if env_platforms and str(jax.config.jax_platforms or "") != env_platforms:
        try:
            jax.config.update("jax_platforms", env_platforms)
        except Exception:
            pass

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    float(jnp.sum(jnp.ones((8,), jnp.float32)))  # device warmup
    return jax


def time_chained(inner: Callable, x, reps: int = 10, trials: int = 3) -> float:
    """Seconds per single `inner` application: two-point fori-chained
    timing, (t(4R) - t(R)) / 3R — the dispatch/readback floor (~38 ms
    through the remote tunnel) appears in both terms and cancels exactly,
    unlike naive total/reps division."""
    import jax
    import jax.numpy as jnp

    from tpu_qsim.utils import jit_scoped

    if hasattr(inner, "run_parts"):
        # sweep engine: chain its native part-tuple form (flat<->parts
        # conversion is a one-time cost for callers, not per application)
        x = jax.jit(inner.to_parts)(x)
        inner = inner.run_parts

    def chained(k):
        return jit_scoped(
            lambda state: jax.lax.fori_loop(0, k, lambda i, s: inner(s), state)
        )

    f_lo = chained(reps)
    f_hi = chained(4 * reps)

    def sync(z):
        leaf = jax.tree_util.tree_leaves(z)[0]
        return float(jnp.sum(leaf * leaf))

    sync(f_lo(x))  # compile + warm
    sync(f_hi(x))
    ts = []
    for _ in range(max(trials, 3)):
        t0 = time.perf_counter()
        sync(f_lo(x))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        sync(f_hi(x))
        t_hi = time.perf_counter() - t0
        ts.append((t_hi - t_lo) / (3 * reps))
    ts.sort()
    return max(ts[len(ts) // 2], 1e-9)


def build_circuit_runner(circuit, backend: str):
    """circuit -> planes-state->planes-state callable on the given backend."""
    import tpu_qsim.apply as ap

    if backend == "pallas":
        from tpu_qsim.kernels.fused_circuit import build_pallas_run

        return build_pallas_run(circuit, np.float32)
    if backend == "segmented":
        from tpu_qsim.kernels.segmented import build_segmented_run

        return build_segmented_run(circuit, np.float32)
    if backend == "sweeps":
        from tpu_qsim.kernels.sweeps import build_sweep_run

        return build_sweep_run(circuit, np.float32)
    if backend == "dispatch":
        # production auto-dispatch: whole-circuit VMEM kernel, part-map
        # sweep engine, segmented grid kernel, or fused-XLA by size/config
        from tpu_qsim.config import SimConfig
        from tpu_qsim.kernels.dispatch import maybe_build_pallas_circuit_run

        fn = maybe_build_pallas_circuit_run(
            circuit, np.float32, SimConfig(dtype="complex64")
        )
        if fn is not None:
            return fn
        backend = "xla-fused"
    from tpu_qsim.fusion import fuse_circuit, unfused_circuit
    from tpu_qsim.statevector import build_xla_run_fn

    groups = (
        fuse_circuit(circuit, 5) if backend == "xla-fused"
        else unfused_circuit(circuit)
    )
    return build_xla_run_fn(groups, np.float32, False)
