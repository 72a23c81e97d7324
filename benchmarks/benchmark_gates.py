#!/usr/bin/env python
"""Gate throughput by type and qubit count (analog of reference
benchmarks/benchmark_gates.cu: H/X/Rz/CNOT at 10-24 qubits).

Each measurement runs a homogeneous 100-gate circuit on the best backend for
the size and reports gates/second.

Usage: python benchmarks/benchmark_gates.py [--sizes 12,16,20] [--gates 100]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def homogeneous_circuit(name: str, n: int, gates: int):
    import tpu_qsim as q

    c = q.Circuit(n)
    for i in range(gates):
        if name == "h":
            c.h(i % n)
        elif name == "x":
            c.x(i % n)
        elif name == "rz":
            c.rz(i % n, 0.1 + 0.01 * i)
        elif name == "cnot":
            c.cnot(i % n, (i + 1) % n)
    return c


def main() -> int:
    ap_ = argparse.ArgumentParser()
    ap_.add_argument("--sizes", default="12,16,20")
    ap_.add_argument("--gates", type=int, default=100)
    ap_.add_argument("--backend", default="auto",
                     choices=["auto", "pallas", "xla-fused", "xla"])
    args = ap_.parse_args()

    from common import build_circuit_runner, setup_jax, time_chained

    setup_jax()
    import tpu_qsim.apply as ap

    sizes = [int(s) for s in args.sizes.split(",")]
    print(f"{'gate':>6} {'qubits':>7} {'backend':>10} {'ms/circuit':>11} "
          f"{'gates/s':>12}")
    for n in sizes:
        for gname in ("h", "x", "rz", "cnot"):
            backend = args.backend
            if backend == "auto":
                backend = "pallas" if 10 <= n <= 20 else "xla-fused"
            c = homogeneous_circuit(gname, n, args.gates)
            runner = build_circuit_runner(c, backend)
            x = ap.initial_state(n, np.float32)
            sec = time_chained(runner, x, reps=10)
            print(f"{gname:>6} {n:>7} {backend:>10} {sec*1e3:>11.3f} "
                  f"{args.gates/sec:>12.0f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
