#!/usr/bin/env python
"""Headline benchmark: 100-gate mixed random circuit (H/X/CNOT/Rz)
wall-clock per circuit on one TPU chip, at 16 qubits (headline) and 20
qubits (secondary).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Baselines (reference CUDA simulator, RTX 4070 Laptop, reference
README.md:27-38): 100-gate mixed circuit = 0.29 ms at 16 qubits, 0.28 ms at
20 qubits. vs_baseline = baseline_ms / our_ms (>1 = faster than the
reference). The 16-qubit comparison is the headline: both simulators are
steady-state there, and our whole-circuit VMEM-resident Pallas kernel
applies. (The reference's flat ~0.28 ms at 20+ qubits is launch-bound by
its own README's admission; ours is honest device time either way.)

Method: K circuit executions chained inside ONE jitted program via
lax.fori_loop (single dispatch, no async-launch artifacts), synced by scalar
readback, with the readback floor measured and subtracted. Fidelity is
checked against the NumPy oracle before timing.
"""

from __future__ import annotations

import json
import sys
import time

BASELINES_MS = {16: 0.29, 20: 0.28}   # reference README.md:27-38
NUM_GATES = 100
REPS = {16: 200, 20: 50}


def _floor(jnp, x) -> float:
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(jnp.sum(x * x))
        best = min(best, time.perf_counter() - t0)
    return best


def _bench_one(n: int, check_fidelity: bool):
    import jax
    import jax.numpy as jnp
    import numpy as np

    import tpu_qsim as q
    import tpu_qsim.apply as ap
    from tpu_qsim.config import SimConfig
    from tpu_qsim.kernels.dispatch import maybe_build_pallas_circuit_run

    circuit = q.random_circuit(n, NUM_GATES, seed=42)
    backend = "pallas"
    inner = None
    try:
        inner = maybe_build_pallas_circuit_run(
            circuit, np.float32, SimConfig(dtype="complex64")
        )
    except Exception:
        inner = None
    if inner is None:
        backend = "xla"
        from tpu_qsim.fusion import fuse_circuit
        from tpu_qsim.statevector import build_xla_run_fn

        inner = build_xla_run_fn(fuse_circuit(circuit, 5), np.float32, False)

    x = ap.initial_state(n, np.float32)
    err = None
    if check_fidelity:
        y = inner(x)
        ora = q.CPUReferenceSimulator(n)
        ora.run(circuit)
        err = float(np.max(np.abs(ap.to_complex(y) - ora.get_state())))
        if err > 1e-4:
            raise RuntimeError(f"fidelity failure at {n}q: max|diff|={err:.2e}")

    reps = REPS.get(n, 20)

    @jax.jit
    def run_many(state):
        return jax.lax.fori_loop(0, reps, lambda i, s: inner(s), state)

    z = run_many(x)
    float(jnp.sum(z * z))          # compile + warm
    floor = _floor(jnp, x)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        z = run_many(x)
        _ = float(jnp.sum(z * z))
        best = min(best, time.perf_counter() - t0)
    per_ms = max(best - floor, 1e-9) / reps * 1e3
    return per_ms, backend, err


def main() -> int:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # device warmup (remote-tunnel init can take minutes; not our measurement)
    float(jnp.sum(jnp.ones((8,), jnp.float32)))

    try:
        ms16, backend16, err16 = _bench_one(16, check_fidelity=True)
    except Exception as e:
        print(json.dumps({"metric": "16q_100gate_circuit_ms", "value": -1.0,
                          "unit": "ms", "vs_baseline": 0.0, "error": str(e)[:200]}))
        return 1
    try:
        ms20, backend20, _ = _bench_one(20, check_fidelity=False)
    except Exception:
        ms20, backend20 = None, None

    # per-gate honest comparison: the reference's own synced throughput
    # table says H @20q = 24,600 gates/s (reference README.md:54-63)
    h20 = None
    try:
        import jax as _jax
        import jax.numpy as _jnp
        import numpy as _np

        import tpu_qsim as q
        import tpu_qsim.apply as ap
        from tpu_qsim.config import SimConfig
        from tpu_qsim.kernels.dispatch import maybe_build_pallas_circuit_run

        c = q.Circuit(20)
        for i in range(NUM_GATES):
            c.h(i % 20)
        inner = maybe_build_pallas_circuit_run(
            c, _np.float32, SimConfig(dtype="complex64")
        )
        if inner is not None:
            x = ap.initial_state(20, _np.float32)
            reps = 50

            @_jax.jit
            def run_h(state):
                return _jax.lax.fori_loop(0, reps, lambda i, s: inner(s), state)

            z = run_h(x)
            float(_jnp.sum(z * z))
            floor = _floor(_jnp, x)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                z = run_h(x)
                _ = float(_jnp.sum(z * z))
                best = min(best, time.perf_counter() - t0)
            h20 = NUM_GATES * reps / max(best - floor, 1e-9)
    except Exception:
        h20 = None

    out = {
        "metric": "16q_100gate_circuit_ms",
        "value": round(ms16, 4),
        "unit": "ms",
        "vs_baseline": round(BASELINES_MS[16] / ms16, 2),
        "gates_per_sec_16q": round(NUM_GATES / (ms16 / 1e3)),
        "backend": backend16,
        "max_amp_err_vs_oracle": err16,
        "secondary_20q_ms": round(ms20, 4) if ms20 else None,
        "secondary_20q_vs_baseline": (
            round(BASELINES_MS[20] / ms20, 3) if ms20 else None
        ),
        # reference's own synced per-gate table: H @20q = 24,600 gates/s
        "h_20q_gates_per_sec": round(h20) if h20 else None,
        "h_20q_vs_reference_gate_table": (
            round(h20 / 24600.0, 2) if h20 else None
        ),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
