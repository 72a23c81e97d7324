#!/usr/bin/env python
"""Scaling benchmark: init cost + 100-gate circuit time vs qubit count, and
device vs single-threaded NumPy-oracle speedup (analog of reference
benchmarks/benchmark_scaling.cu: 10-26 qubits, GPU-vs-CPU table).

Usage: python benchmarks/benchmark_scaling.py [--sizes 10,14,18,20,22,24]
       [--cpu-max 18] (oracle comparison capped: NumPy grows exponentially)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    ap_ = argparse.ArgumentParser()
    ap_.add_argument("--sizes", default="10,14,18,20,22,24,26")
    ap_.add_argument("--gates", type=int, default=100)
    ap_.add_argument("--cpu-max", type=int, default=16)
    args = ap_.parse_args()

    from common import build_circuit_runner, setup_jax, time_chained

    setup_jax()
    import jax.numpy as jnp

    import tpu_qsim as q
    import tpu_qsim.apply as ap

    sizes = [int(s) for s in args.sizes.split(",")]
    print(f"{'qubits':>7} {'states':>12} {'init ms':>9} {'circuit ms':>11} "
          f"{'gates/s':>11} {'cpu ms':>10} {'speedup':>8}")
    for n in sizes:
        # init time (allocate + set basis state, synced)
        t0 = time.perf_counter()
        x = ap.initial_state(n, np.float32)
        float(jnp.sum(x * x))
        init_ms = (time.perf_counter() - t0) * 1e3

        c = q.random_circuit(n, args.gates, seed=42)
        # production auto-dispatch: whole-circuit Pallas <= 18q, part-map
        # sweep engine 22-26q, segmented grid between, fused-XLA fallback
        try:
            runner = build_circuit_runner(c, "dispatch")
            sec = time_chained(runner, x, reps=10)
        except Exception:
            runner = build_circuit_runner(c, "xla-fused")
            sec = time_chained(runner, x, reps=10)

        cpu_ms = float("nan")
        speedup = float("nan")
        if n <= args.cpu_max:
            ora = q.CPUReferenceSimulator(n)
            t0 = time.perf_counter()
            ora.run(c)
            cpu_ms = (time.perf_counter() - t0) * 1e3
            speedup = cpu_ms / (sec * 1e3)

        print(f"{n:>7} {1 << n:>12,} {init_ms:>9.2f} {sec*1e3:>11.3f} "
              f"{args.gates/sec:>11.0f} {cpu_ms:>10.2f} {speedup:>8.1f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
