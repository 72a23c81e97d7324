#!/usr/bin/env python
"""Per-op-class net cost inside the grid-sweep pipeline (view-form regime).

Refreshes docs/PERF_NOTES.md §6's per-op table, which was measured in the
flat-form streaming regime (round 3a) — 3b's view-form chaining removed
the per-call retile and changed the per-sweep anatomy, so per-class µs
values drift. Method: per op class, a homogeneous circuit built through
the production planner; net µs/op = (t_class − t_floor) / emitted, where
t_floor is a 1-diag circuit on the same geometry (same sweep count /
stream traffic) and `emitted` counts post-folding planned gates — 1q runs
on a shared qubit FOLD (`merge_1q_chains`; H·H even elides to identity),
so 1q classes place exactly one gate per distinct qubit and the divisor
comes from the plan, never the raw gate count. Reference analog:
benchmarks/benchmark_gates.cu times homogeneous gate workloads per type;
this goes one level lower — per emission class of the TPU kernel.

Usage: python benchmarks/benchmark_perop.py [--size 26] [--ops 40]
NOTE: each class compiles its own grid kernel through the remote relay
(~minutes at 26q geometry) — expect a 20-40 min cold run; warm cache
re-runs take ~2 min. Small-width 1q classes (lane = 7 emitted ops) carry
proportionally more two-point noise; read them as bands.

`--plan-only` builds and plans every class without executing (fast,
device-free) — the CI smoke mode.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from common import setup_jax, time_chained


def classes(n: int, k: int):
    """(name, builder) per emission class; qubit picks assume the default
    geometry's bit roles at 20-30q (lane 0-6, rows 7+, top bits active or
    ext per plan — see tpu_qsim/kernels/fused_circuit.py bit classes).
    1q builders use each qubit ONCE (same-qubit 1q runs fold); 2q classes
    cycle pairs freely (only 1q chains fold)."""
    top = list(range(max(n - 6, 16), n))

    def cyc(seq, i):
        return seq[i % len(seq)]

    return [
        ("diag in-kernel", lambda c: [c.rz(q, 0.1 + q * 0.01) for q in range(15)]),
        ("diag high-bit", lambda c: [c.rz(q, 0.1 + q * 0.01) for q in top]),
        ("dense1q lane(0-6)", lambda c: [c.rx(q, 0.3 + q * 0.05) for q in range(7)]),
        ("dense1q low-row(7-9)", lambda c: [c.rx(q, 0.3 + q * 0.05) for q in (7, 8, 9)]),
        ("dense1q row(10+)", lambda c: [c.rx(q, 0.3 + q * 0.05) for q in range(10, 15)]),
        ("dense1q top", lambda c: [c.rx(q, 0.3 + q * 0.05) for q in top]),
        ("cnot high-ctrl", lambda c: [c.cnot(cyc(top, i), i % 7) for i in range(k)]),
        ("cnot row-ctrl", lambda c: [c.cnot(10 + i % 5, i % 7) for i in range(k)]),
        ("cnot lane-ctrl", lambda c: [c.cnot(i % 7, 7 + i % 8) for i in range(k)]),
        ("crz row-ctrl", lambda c: [c.cp(10 + i % 5, i % 7, 0.2 + i * 0.01) for i in range(k)]),
    ]


def main() -> int:
    ap_ = argparse.ArgumentParser()
    ap_.add_argument("--size", type=int, default=26)
    ap_.add_argument("--ops", type=int, default=40)
    ap_.add_argument("--reps", type=int, default=6)
    ap_.add_argument("--plan-only", action="store_true",
                     help="plan every class without executing (CI smoke)")
    args = ap_.parse_args()

    jax = setup_jax()
    import jax.numpy as jnp

    import tpu_qsim as q
    from tpu_qsim.kernels.gridsweeps import (
        build_grid_sweep_run,
        default_geometry,
        plan_grid_sweeps,
    )

    n, k = args.size, args.ops
    params, cap = default_geometry(n)

    if args.plan_only:
        for name, make in [("floor (1 diag)", lambda c: c.rz(0, 0.3))] + classes(n, k):
            c = q.Circuit(n)
            make(c)
            plan = plan_grid_sweeps(c, params=params, max_gates=cap)
            emitted = sum(len(s.gates) for s in plan)
            print(f"{name:22s} emitted={emitted:3d} sweeps={len(plan)}", flush=True)
        print("plan-only: all classes planned")
        return 0

    def measure(name, make):
        c = q.Circuit(n)
        make(c)
        # emitted (post-folding) op count from the same planner the
        # program uses — the honest divisor
        plan = plan_grid_sweeps(c, params=params, max_gates=cap)
        emitted = sum(len(s.gates) for s in plan)
        prog = build_grid_sweep_run(c, np.float32)
        x0 = jax.jit(
            lambda: jnp.zeros(prog.vshape, jnp.float32)
            .at[(0,) * (len(prog.vshape) - 1) + (0,)].set(1.0)
        )()
        t = time_chained(prog.run_view, x0, reps=args.reps)
        print(
            f"{name:22s} emitted={emitted:3d} sweeps={prog.num_sweeps} "
            f"t={t*1e3:8.3f} ms",
            flush=True,
        )
        return t, emitted, prog.num_sweeps

    t_floor, _, _ = measure("floor (1 diag)", lambda c: c.rz(0, 0.3))

    rows = []
    for name, make in classes(n, k):
        try:
            t, emitted, sw = measure(name, make)
            if emitted:
                rows.append((name, (t - t_floor) / emitted * 1e6, emitted, sw))
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)

    print(f"\nnet µs/op at {n}q (view-form, floor-subtracted):")
    for name, net_us, emitted, sw in sorted(rows, key=lambda r: -r[1]):
        star = "*" if sw > 1 else " "
        print(
            f"  {name:22s} {net_us:8.1f} µs/op{star} (n_ops={emitted}, sweeps={sw})"
        )
    print("  * multi-sweep class: net also carries the extra sweeps'")
    print("    fixed streaming cost over the 1-sweep floor")
    return 0


if __name__ == "__main__":
    sys.exit(main())
