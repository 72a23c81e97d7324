#!/usr/bin/env python
"""Headline benchmark: 20-qubit, 100-gate mixed random circuit (H/X/CNOT/Rz),
sustained per-circuit wall-clock on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference CUDA simulator reports 0.28 ms for a 100-gate mixed
circuit at 20 qubits on an RTX 4070 Laptop GPU (reference README.md:37) —
its steady-state launch-bound number. vs_baseline = baseline_ms / our_ms
(>1 means faster than the reference).

Method: the whole circuit is one VMEM-resident Pallas kernel; we execute K
chained repetitions inside a single jitted program (one dispatch) and force
completion with a scalar readback, so the measurement is pure device compute
— no async-launch artifacts (the reference's flat 0.28 ms was launch-bound,
its own README admits the GPU was not saturated). Fidelity is checked
against the NumPy oracle before timing.
"""

from __future__ import annotations

import json
import sys
import time

BASELINE_MS = 0.28          # reference README.md:37, 100 gates @ 20 qubits
NUM_QUBITS = 20
NUM_GATES = 100
REPS = 20                   # chained circuit executions inside one program


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import tpu_qsim as q
    import tpu_qsim.apply as ap

    circuit = q.random_circuit(NUM_QUBITS, NUM_GATES, seed=42)

    # device warmup (remote-tunnel init can take minutes; not our measurement)
    float(jnp.sum(jnp.ones((8,), jnp.float32)))

    backend = "pallas"
    inner = None
    try:
        from tpu_qsim.config import SimConfig
        from tpu_qsim.kernels.dispatch import maybe_build_pallas_circuit_run

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

    @jax.jit
    def run_many(state):
        # fori_loop keeps one kernel instance regardless of REPS (fast
        # compile); the loop is sequential so timing stays honest.
        return jax.lax.fori_loop(0, REPS, lambda i, s: inner(s), state)

    x = ap.initial_state(NUM_QUBITS, np.float32)

    # correctness gate: one circuit vs the NumPy oracle
    y = inner(x)
    ora = q.CPUReferenceSimulator(NUM_QUBITS)
    ora.run(circuit)
    err = float(np.max(np.abs(ap.to_complex(y) - ora.get_state())))
    if err > 1e-4:
        print(json.dumps({"metric": "20q_100gate_circuit_ms", "value": -1.0,
                          "unit": "ms", "vs_baseline": 0.0,
                          "error": f"fidelity failure max|diff|={err:.2e}"}))
        return 1

    # compile + warm the K-rep program
    z = run_many(x)
    float(jnp.sum(z * z))

    # timed: single dispatch of K chained circuits, scalar-readback synced
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        z = run_many(x)
        _ = float(jnp.sum(z * z))
        best = min(best, time.perf_counter() - t0)

    per_circuit_ms = best / REPS * 1e3
    print(json.dumps({
        "metric": "20q_100gate_circuit_ms",
        "value": round(per_circuit_ms, 4),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / per_circuit_ms, 3),
        "gates_per_sec": round(NUM_GATES / (per_circuit_ms / 1e3)),
        "backend": backend,
        "max_amp_err_vs_oracle": err,
        "device": str(jax.devices()[0]),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
