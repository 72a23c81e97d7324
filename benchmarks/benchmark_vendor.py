#!/usr/bin/env python
"""Vendor head-to-head analog: our numbers on the exact cuStateVec workloads.

The reference's strongest external credibility artifact is its benchmark
against NVIDIA cuStateVec 1.11.0 (reference benchmarks/benchmark_custatevec.cu,
README.md:373-385). No TPU-side vendor state-vector library exists in this
environment to race in-process, so this script measures OUR side of the same
workloads on the TPU and prints them against the reference's published
cuStateVec/reference-CUDA numbers (RTX 4070 Laptop). Cross-device comparison:
clearly labeled, useful for orders of magnitude, not a same-silicon race.

Workloads (mirroring benchmark_custatevec.cu):
  1. per-gate Hadamard at 20/24/26 qubits — measured BOTH as an isolated
     single-gate program chained K times (the cuStateVec execution model:
     one apply per call) and on the production fused path (100 H circuit,
     per-gate equivalent);
  2. adjacent-pair CNOT at 20 qubits (same two modes);
  3. depth-10 alternating H+CNOT layer circuits at 20/24 qubits, gates/s.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# Published numbers: reference README.md:373-385 (ms per gate; gates/s for
# circuits). (ref_cuda, custatevec)
PUBLISHED = {
    ("h", 20): (0.035, 0.067),
    ("h", 24): (2.7, 2.7),
    ("h", 26): (9.9, 9.7),
    ("cnot_adj", 20): (0.012, 0.033),  # ref range 0.004-0.025; midpoint-ish
    ("circuit", 20): (48791.0, 20238.0),  # gates/s
    ("circuit", 24): (637.0, 547.0),
}


def hcnot_layers(n: int, depth: int = 10):
    import tpu_qsim as q

    c = q.Circuit(n)
    for d in range(depth):
        if d % 2 == 0:
            for qq in range(n):
                c.h(qq)
        else:
            for qq in range(0, n - 1, 2):
                c.cnot(qq, qq + 1)
    return c


def main() -> int:
    from common import build_circuit_runner, setup_jax, time_chained

    setup_jax()
    import tpu_qsim as q
    import tpu_qsim.apply as ap

    print("cross-device comparison: TPU v5e (ours) vs RTX 4070L "
          "(reference CUDA + cuStateVec 1.11.0, published numbers)")
    print("CAVEAT: cross-precision as well as cross-device — ours runs f32"
          " split planes,\nthe published reference/cuStateVec table is"
          " complex128; every multiple below\ninherits both caveats.\n")

    print(f"{'workload':>16} {'ours ms/gate':>13} {'refCUDA':>9} "
          f"{'cuStateVec':>11}")
    for name, gate, sizes in (("h", lambda c, n: c.h(n // 2), (20, 24, 26)),
                              ("cnot_adj", lambda c, n: c.cnot(0, 1), (20,))):
        for n in sizes:
            # single-gate execution model (one program per gate application)
            c1 = q.Circuit(n)
            gate(c1, n)
            runner = build_circuit_runner(c1, "dispatch")
            x = ap.initial_state(n, np.float32)
            reps = max(4, min(200, 1 << max(0, 24 - n)))
            single = time_chained(runner, x, reps=reps) * 1e3
            # production path: 100 gates of the same kind fused. Cycle the
            # target qubit: 100x the SAME gate would compose to (near-)
            # identity under window fusion — a legitimate optimization, but
            # a meaningless throughput claim.
            c100 = q.Circuit(n)
            for i in range(100):
                if name == "h":
                    c100.h(i % n)
                else:
                    j = i % (n - 1)
                    c100.cnot(j, j + 1)
            runner = build_circuit_runner(c100, "dispatch")
            fused = time_chained(runner, x, reps=max(3, reps // 4)) * 1e3 / 100
            ref_ms, cusv_ms = PUBLISHED[(name, n)]
            # sub-10us/gate values sit below the tunnel-timing noise floor
            fs = f"{fused:.4f}" if fused >= 0.01 else "<0.01"
            print(f"{name+'@'+str(n)+'q':>16} {single:>7.4f}/{fs} "
                  f"{ref_ms:>9.3f} {cusv_ms:>11.3f}   (single/fused)")

    print(f"\n{'circuit':>16} {'ours gates/s':>13} {'refCUDA':>9} "
          f"{'cuStateVec':>11}")
    for n in (20, 24):
        c = hcnot_layers(n)
        runner = build_circuit_runner(c, "dispatch")
        x = ap.initial_state(n, np.float32)
        sec = time_chained(runner, x, reps=8 if n == 20 else 3)
        ours = len(c.gates) / sec
        ref_gs, cusv_gs = PUBLISHED[("circuit", n)]
        print(f"{'h+cnot d10@'+str(n)+'q':>16} {ours:>13,.0f} "
              f"{ref_gs:>9,.0f} {cusv_gs:>11,.0f}")
    print("\nnote: circuit rows use the reference's exact workload; our "
          "commute-aware window fusion composes its repeated H layers "
          "(H·H = I), which per-gate execution models cannot — part of the "
          "speedup is that optimization, and it is reported as such.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
