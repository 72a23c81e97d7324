#!/usr/bin/env python
"""Backend comparison: Pallas kernel vs fused-XLA vs unfused-XLA on the same
circuit (analog of reference benchmarks/benchmark_optimized.cu original-vs-
shared-vs-coalesced-vs-auto comparison).

Usage: python benchmarks/benchmark_backends.py [--qubits 16] [--gates 100]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    ap_ = argparse.ArgumentParser()
    ap_.add_argument("--qubits", type=int, default=16)
    ap_.add_argument("--gates", type=int, default=100)
    args = ap_.parse_args()

    from common import build_circuit_runner, setup_jax, time_chained

    setup_jax()
    import tpu_qsim as q
    import tpu_qsim.apply as ap

    c = q.random_circuit(args.qubits, args.gates, seed=42)
    x = ap.initial_state(args.qubits, np.float32)

    print(f"{args.qubits} qubits, {args.gates} mixed gates "
          f"(fusion groups: {len(__import__('tpu_qsim.fusion', fromlist=['f']).fuse_circuit(c, 5))})")
    print(f"{'backend':>12} {'ms/circuit':>11} {'gates/s':>12} {'vs unfused':>11}")
    results = {}
    for backend in ("xla", "xla-fused", "pallas"):
        if backend == "pallas" and not (10 <= args.qubits <= 20):
            continue
        try:
            runner = build_circuit_runner(c, backend)
            sec = time_chained(runner, x, reps=10)
            results[backend] = sec
        except Exception as e:
            print(f"{backend:>12} failed: {e}")
            continue
        base = results.get("xla", sec)
        print(f"{backend:>12} {sec*1e3:>11.3f} {args.gates/sec:>12.0f} "
              f"{base/sec:>11.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
