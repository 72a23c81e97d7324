#!/usr/bin/env python
"""Algorithm-layer benchmark: end-to-end workloads through the whole stack.

Times the algorithm factories the reference could not express at all (no
multi-controlled gates, no parameter abstraction, no observables): Grover
search, QFT, quantum phase estimation, Trotterized TFIM dynamics (first and
second order), classical-shadow acquisition, and a jitted VQE optimizer
step. Each row reports whole-circuit wall-clock under the same honest
two-point chained timing as every other benchmark here (benchmarks/
common.py), plus the gate count the circuit carries BEFORE the engines'
fusion/folding passes.

Usage: python benchmarks/benchmark_algorithms.py [--qubits 16] [--shadows 256]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _runner(circuit):
    from tpu_qsim.config import SimConfig
    from tpu_qsim.fusion import fuse_circuit
    from tpu_qsim.kernels.dispatch import maybe_build_pallas_circuit_run
    from tpu_qsim.statevector import build_xla_run_fn

    inner = maybe_build_pallas_circuit_run(
        circuit, np.float32, SimConfig(dtype="complex64")
    )
    if inner is None:
        inner = build_xla_run_fn(
            fuse_circuit(circuit, 5), np.float32, False
        )
    return inner


def main() -> int:
    ap_ = argparse.ArgumentParser()
    ap_.add_argument("--qubits", type=int, default=16)
    ap_.add_argument("--shadows", type=int, default=256)
    ap_.add_argument("--reps", type=int, default=10)
    args = ap_.parse_args()

    from benchmarks.common import setup_jax, time_chained

    setup_jax()

    import tpu_qsim as q
    import tpu_qsim.apply as ap
    from tpu_qsim.algorithms import (
        classical_shadow,
        grover_circuit,
        phase_estimation_circuit,
        tfim_hamiltonian,
        trotter_circuit,
        vqe_minimize,
    )

    n = args.qubits
    rows: list[tuple[str, int, float]] = []

    def add_circuit_row(name, circuit):
        inner = _runner(circuit)
        x = ap.initial_state(circuit.num_qubits, np.float32)
        if hasattr(inner, "run_view"):
            x = inner.to_view(x)
            inner = inner.run_view
        per_s = time_chained(inner, x, reps=args.reps)
        rows.append((name, len(circuit.gates), per_s * 1e3))

    add_circuit_row(f"grover-{min(n, 10)}q", grover_circuit(min(n, 10), 5))
    add_circuit_row(f"qft-{n}q", q.qft_circuit(n))
    add_circuit_row("qpe(m=10)", phase_estimation_circuit(0.3125, 10))
    tfim = tfim_hamiltonian(n, 1.0, 0.7)
    add_circuit_row(
        f"trotter1-{n}q(4 steps)",
        trotter_circuit(tfim, 0.5, 4, num_qubits=n, order=1),
    )
    add_circuit_row(
        f"trotter2-{n}q(4 steps)",
        trotter_circuit(tfim, 0.5, 4, num_qubits=n, order=2),
    )

    # shadows: one vmapped device program per chunk; report snapshots/s
    sim = q.StateVectorSimulator(min(n, 14))
    sim.run(q.ghz_circuit(min(n, 14)))
    classical_shadow(sim, 8, seed=0)        # compile
    t0 = time.perf_counter()
    classical_shadow(sim, args.shadows, seed=1)
    dt = time.perf_counter() - t0
    print(f"{'classical shadows':26s} {min(n, 14)}q "
          f"{args.shadows / dt:10.0f} snapshots/s")

    # VQE: seconds per jitted Adam step — two-point over step counts so
    # the one-time compile (inside the first call) cancels
    nq_vqe = min(n, 10)
    ham = tfim_hamiltonian(nq_vqe, 1.0, 0.7)
    vqe_minimize(ham, nq_vqe, layers=2, steps=1, learning_rate=0.1)  # warm
    t0 = time.perf_counter()
    vqe_minimize(ham, nq_vqe, layers=2, steps=10, learning_rate=0.1)
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    vqe_minimize(ham, nq_vqe, layers=2, steps=40, learning_rate=0.1)
    t_hi = time.perf_counter() - t0
    per_step = (t_hi - t_lo) / 30
    print(f"{'vqe adam step':26s} {nq_vqe}q "
          f"{per_step * 1e3:10.3f} ms/step (2-layer ansatz)")

    print(f"\n{'workload':26s} {'gates':>6s} {'ms/circuit':>12s}")
    for name, gates, ms in rows:
        print(f"{name:26s} {gates:6d} {ms:12.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
