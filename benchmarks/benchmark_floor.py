#!/usr/bin/env python
"""The 22-26q compute-floor certificate harness (round-5 VERDICT item 1).

BENCH_r04 showed ``roofline_pct`` stuck at 12.6-15.4% at 22-26q — but that
metric is an HBM-streaming roofline, and rounds 3b-4 established that the
aliased in-place grid sweeps stream nearly free (a zero-gate 24q sweep runs
~0.16 ms for 268 MB r+w, docs/PERF_NOTES.md §7): at these sizes the engine
is COMPUTE-bound, so the binding roofline is the VPU arithmetic rate, not
HBM. This harness measures both sides of that claim:

* ``--decompose N``: per-sweep decomposition of the production seed-42 plan
  at N qubits — the SAME sweep structure with (a) all gates, (b) no gates
  (streaming-only), (c) one diagonal per sweep — isolating per-sweep
  streaming cost vs exposed compute, per sweep and chained.
* ``--scale N``: the minimal Mosaic repro — ONE production-geometry grid
  kernel containing K independent CNOT-blend ops (the §13 dominant class),
  K in {0, 8, 16, 32}: the us/op slope IS the engine's marginal per-op
  cost, with no planning, fusion, or mixed-class confounders. Two blend
  flavors: row-control (in-kernel iota mask) and ext-control (scalar
  program-id predicate).
* ``--vpu``: the chip's deliverable elementwise rate, measured with a
  K-step rotation chain (not constant-foldable; 6 flops/element/step)
  inside the same grid/block shape — the denominator for the floor math.
* ``--plan-only`` (CPU-safe, no device): (i) exact vector-op census of the
  emitted kernel program per class (traced jaxpr, flop-weighted) → the
  analytic VPU floor per op; (ii) the lane-coverage upper bound for the
  "circuit-wide per-sweep lane placement" lever — the best 7-bit subset of
  qubits maximizing gates fully inside the lane window, vs the relayout
  cost of importing those bits (round-4 §16 measured a lane import at the
  same cost class as the blend it replaces).

Together: measured us/op ~= analytic VPU floor -> the engine is AT the
arithmetic roofline and the HBM roofline_pct number was the wrong lens;
measured >> floor -> Mosaic scheduling is the bound and this script is the
repro. Either way the result is the PERF_NOTES §20 certificate.

Reference anchor: the rows being chased are reference README.md:47-52
(launch-bound by its own admission, README.md:40-41).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from benchmarks.common import setup_jax, time_chained  # noqa: E402

VPU_RATE_DEFAULT = 1.9e12   # measured f32 op/s (docs/PERF_NOTES.md §5)
SEED = 42
NUM_GATES = 100
LOOPS = {20: 100, 22: 20, 24: 8, 26: 3, 27: 2}


# ---------------------------------------------------------------------------
# gate-list builders for the scaling repro
# ---------------------------------------------------------------------------

def _cnot_rowctrl_gates(k: int, blk_bits: int):
    """K sequential CNOTs with control on a ROW_GROUP row bit and target on
    a row bit OUTSIDE every window group (bits 14..blk-1): no window can
    absorb them, no folding pass applies to 2q gates — each emits as one
    row-control mask blend (the §13 "cnot row-ctrl" class)."""
    import tpu_qsim as q

    c = q.Circuit(blk_bits)
    for i in range(k):
        c.cnot(8 + (i % 6), 14 + (i % max(blk_bits - 14, 1)))
    return c


def _cnot_extctrl_gates(k: int, n: int, blk_bits: int):
    """K CNOTs with the control on an INACTIVE high bit (resolves as a
    per-invocation scalar select — the §13 417us/op class) and the target
    on a row bit."""
    import tpu_qsim as q

    c = q.Circuit(n)
    for i in range(k):
        c.cnot(n - 1 - (i % 2), 14 + (i % max(blk_bits - 14, 1)))
    return c


# ---------------------------------------------------------------------------
# --plan-only: vector-op census + lane-coverage bound
# ---------------------------------------------------------------------------

_FLOP_PRIMS = {
    "add", "sub", "mul", "div", "max", "min", "neg",
    "select_n", "eq", "ne", "lt", "le", "gt", "ge", "and", "or", "xor",
    "shift_right_logical", "shift_left",
}
_MOVE_PRIMS = {"roll", "rev", "concatenate", "gather", "dynamic_slice",
               "pad", "transpose"}


def census_ops(gates, n_bits: int, rows: int):
    """Trace the production emission (interpret mode: jnp.roll stands in
    1:1 for pltpu.roll) and tally flop-weighted vector work per element."""
    import jax

    from tpu_qsim.kernels.fused_circuit import emit_ops, materialize_ops

    ops, const_table = materialize_ops(
        gates, n_bits=n_bits, profile="grid", merge=False
    )
    assert const_table is None, "census path expects no const-table ops"

    def body(xr, xi):
        return emit_ops(xr, xi, ops, n_bits, True, None, {})

    shape = jax.ShapeDtypeStruct((rows, 128), np.float32)
    jaxpr = jax.make_jaxpr(body)(shape, shape)

    flops = 0
    moved = 0
    small = 0   # sub-plane work (masks, iotas): shapes below the full plane
    plane = rows * 128

    def walk(jx):
        nonlocal flops, moved, small
        for eqn in jx.eqns:
            for sub in (v for v in eqn.params.values() if hasattr(v, "eqns")):
                walk(sub)
            if "jaxpr" in eqn.params and hasattr(eqn.params["jaxpr"], "jaxpr"):
                walk(eqn.params["jaxpr"].jaxpr)
            name = eqn.primitive.name
            size = max(
                (int(np.prod(o.aval.shape)) for o in eqn.outvars
                 if hasattr(o.aval, "shape")),
                default=0,
            )
            if name in _FLOP_PRIMS:
                if size >= plane:
                    flops += size
                else:
                    small += size
            elif name in _MOVE_PRIMS:
                moved += size

    walk(jaxpr.jaxpr)
    return {
        "emitted_ops": len(ops),
        "plane_elems": plane,
        "alu_flops_per_elem": flops / plane,
        "moved_elems_per_elem": moved / plane,
        "subplane_flops_per_elem": small / plane,
    }


def lane_coverage_bound(n: int):
    """Upper bound for the circuit-wide lane-placement lever: the 7-bit
    qubit subset maximizing post-fold gates whose MOVING qubits all lie
    inside it (those could ride mm lane windows if the layout put them on
    lanes). Exhaustive over C(n,7) subsets with bitmask counting."""
    from itertools import combinations

    import tpu_qsim as q
    from tpu_qsim.kernels.fused_circuit import as_pgates, merge_1q_chains
    from tpu_qsim.kernels.sweeps import moving_qubits

    c = q.random_circuit(n, NUM_GATES, seed=SEED)
    gates = merge_1q_chains(as_pgates(c.gates))
    masks = []
    for g in gates:
        mv = moving_qubits(g.u, g.qubits)
        if mv:
            masks.append(sum(1 << b for b in mv))
    marr = np.array(masks, dtype=np.int64)
    best, best_bits = -1, ()
    # prune: only bits that appear in some mask are candidates
    used = sorted({b for m in masks for b in range(n) if m >> b & 1})
    for bits in combinations(used, min(7, len(used))):
        sel = np.int64(sum(1 << b for b in bits))
        cov = int(np.count_nonzero((marr & ~sel) == 0))
        if cov > best:
            best, best_bits = cov, bits
    return {
        "post_fold_gates": len(gates),
        "moving_gates": len(masks),
        "best_7bit_coverage": best,
        "best_bits": list(best_bits),
        # measured costs (docs/PERF_NOTES.md §13/§16): a covered gate saves
        # at most its blend cost (~136-194us row/lane ctrl) minus its share
        # of the mm window (~25-250us per window); importing one non-lane
        # bit into the lanes costs a lane-swap plane op of the SAME class
        # as a blend (~370us, §16) and the import must be paid per sweep.
        "note": (
            "win_bound_us ~= coverage * 170; relayout_cost_us ~= "
            "imported_bits * 370 * sweeps (both directions)"
        ),
    }


# ---------------------------------------------------------------------------
# on-chip modes
# ---------------------------------------------------------------------------

def _grid_program(circuit, n, plan=None, params=None):
    from tpu_qsim.kernels.gridsweeps import (
        GridSweepProgram,
        build_grid_sweep_run,
    )

    if plan is None and params is None:
        return build_grid_sweep_run(circuit, np.float32)
    return GridSweepProgram(
        circuit, False, params, num_qubits=n, plan=plan
    )


def run_decompose(n: int) -> None:
    import jax

    import tpu_qsim as q
    import tpu_qsim.apply as ap
    from tpu_qsim.kernels.gridsweeps import GridSweep, GridSweepProgram
    from tpu_qsim.utils import jit_scoped

    circuit = q.random_circuit(n, NUM_GATES, seed=SEED)
    prog = _grid_program(circuit, n)
    params = prog.params
    plan = [
        GridSweep(active=set(a), gates=list(g))
        for a, g in zip(prog.active_sets, prog.sweep_gates)
    ]
    print(f"# {n}q production plan: {prog.num_sweeps} sweeps, "
          f"gates per sweep = {[len(s.gates) for s in plan]}, "
          f"geometry rb{params.rb_bits}/a{params.a_max}")

    def empty_like(sweeps):
        return [GridSweep(active=set(s.active), gates=[]) for s in sweeps]

    variants = {
        "full": prog,
        "zero-gate": GridSweepProgram(
            circuit, False, params, num_qubits=n, plan=empty_like(plan)
        ),
    }
    x = ap.initial_state(n, np.float32)
    reps = LOOPS.get(n, 3)
    out = {}
    for name, p in variants.items():
        xv = p.to_view(x)
        per_s = time_chained(p.run_view, xv, reps=reps, trials=5)
        out[name] = per_s * 1e3
        print(f"{n}q {name:10s}: {per_s * 1e3:8.4f} ms/circuit")

    # per-sweep timing of the full program (each sweep alone, then summed)
    total = 0.0
    for i, fn in enumerate(prog._fns):
        f = jit_scoped(fn)
        xv = prog.to_view(x)
        per_s = time_chained(f, xv, reps=reps, trials=5)
        total += per_s
        ng = len(plan[i].gates)
        print(f"{n}q sweep[{i}] ({ng:2d} gates): {per_s * 1e3:8.4f} ms")
    print(f"{n}q sum-of-sweeps: {total * 1e3:8.4f} ms "
          f"(chained full: {out['full']:.4f} ms)")
    exposed = out["full"] - out["zero-gate"]
    ng = sum(len(s.gates) for s in plan)
    print(
        f"{n}q exposed compute: {exposed:.4f} ms over {ng} gates = "
        f"{exposed * 1e3 / max(ng, 1):.1f} us/gate; streaming-only "
        f"{out['zero-gate']:.4f} ms = "
        f"{100 * out['zero-gate'] / out['full']:.1f}% of wall-clock"
    )


def run_scale(n: int, flavor: str = "rowctrl") -> None:
    import tpu_qsim.apply as ap
    from tpu_qsim.kernels.gridsweeps import (
        GridSweep,
        GridSweepProgram,
        default_geometry,
    )

    params, _ = default_geometry(n)
    blk = params.blk_bits
    reps = LOOPS.get(n, 3)
    x = ap.initial_state(n, np.float32)
    results = {}
    for k in (0, 8, 16, 32):
        if flavor == "rowctrl":
            gates = list(_cnot_rowctrl_gates(k, blk))
        else:
            gates = list(_cnot_extctrl_gates(k, n, blk))
        from tpu_qsim.kernels.fused_circuit import as_pgates

        plan = [GridSweep(active=set(), gates=as_pgates(gates))]
        prog = GridSweepProgram(
            None, False, params, num_qubits=n, plan=plan
        )
        xv = prog.to_view(x)
        per_s = time_chained(prog.run_view, xv, reps=reps, trials=5)
        results[k] = per_s * 1e3
        print(f"{n}q {flavor} K={k:3d}: {per_s * 1e3:8.4f} ms/sweep")
    for k0, k1 in ((0, 8), (8, 16), (16, 32)):
        us = (results[k1] - results[k0]) * 1e3 / (k1 - k0)
        print(f"{n}q {flavor} us/op [{k0}->{k1}]: {us:7.1f}")


def run_vpu(n: int, ks=(16, 64, 256)) -> None:
    """Deliverable elementwise f32 rate inside the production block shape:
    a K-step rotation chain (r,i) <- (r c - i s, r s + i c) with per-step
    angles — 6 flops/element/step, not constant-foldable (XLA does not
    re-associate floats)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import tpu_qsim.apply as ap
    from tpu_qsim.kernels.gridsweeps import default_geometry
    from tpu_qsim.kernels.sweeps import _VMEM_LIMIT
    from tpu_qsim.utils import jit_scoped

    params, _ = default_geometry(n)
    hb = n - params.blk_bits
    a_max = min(params.a_max, hb)
    rows = (1 << a_max) * params.rb
    vshape = (2,) + (2,) * hb + (params.rb, 128)
    bshape = (2,) + tuple(
        2 if t < a_max else 1 for t in range(hb)
    ) + (params.rb, 128)
    steps = 1 << (hb - a_max)

    def index_map(s):
        coords = [0]
        for t in range(hb):
            coords.append(0 if t < a_max else (s >> (t - a_max)) & 1)
        coords += [0, 0]
        return tuple(coords)

    x = ap.initial_state(n, np.float32)
    reps = LOOPS.get(n, 3)
    results = {}
    for k in ks:
        angles = [0.1 + 0.001 * i for i in range(k)]

        def kernel(in_ref, out_ref, _angles=angles):
            v = in_ref[...]
            r = v[0].reshape(rows, 128)
            im = v[1].reshape(rows, 128)
            for a in _angles:
                c, s = jnp.float32(np.cos(a)), jnp.float32(np.sin(a))
                r, im = r * c - im * s, r * s + im * c
            blk = bshape[1:-2]
            out_ref[...] = jnp.stack(
                [r.reshape(*blk, params.rb, 128),
                 im.reshape(*blk, params.rb, 128)]
            )

        call = pl.pallas_call(
            kernel,
            grid=(steps,),
            out_shape=jax.ShapeDtypeStruct(vshape, np.float32),
            in_specs=[pl.BlockSpec(bshape, index_map)],
            out_specs=pl.BlockSpec(bshape, index_map),
            input_output_aliases={0: 0},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT
            ),
        )
        xv = jit_scoped(lambda s: s.reshape(vshape))(x)
        per_s = time_chained(call, xv, reps=reps, trials=5)
        results[k] = per_s
        print(f"{n}q rotation-chain K={k:4d}: {per_s * 1e3:8.4f} ms/sweep")
    for k0, k1 in zip(ks[:-1], ks[1:]):
        dt = results[k1] - results[k0]
        elems = 2 * (1 << n)    # both planes
        rate = 6.0 * elems * (k1 - k0) / max(dt, 1e-12)
        print(f"{n}q VPU rate [{k0}->{k1}]: {rate / 1e12:6.2f} Tflop/s "
              f"({dt * 1e6 / (k1 - k0):6.1f} us/step)")


def run_plan_only() -> None:
    print("== emitted-program vector-op census (production emission, "
          "interpret-mode trace) ==")
    rows = 1 << 13          # rb9/a4 kernel rows
    for k in (1, 8, 16):
        c = _cnot_rowctrl_gates(k, 16)
        from tpu_qsim.kernels.fused_circuit import as_pgates

        gates = as_pgates(list(c))
        info = census_ops(gates, 20, rows)
        flop = info["alu_flops_per_elem"]
        mv = info["moved_elems_per_elem"]
        print(f"cnot-rowctrl x{k:2d}: {info['emitted_ops']:2d} ops, "
              f"{flop:6.2f} plane-flops/elem, {mv:5.2f} moved/elem "
              f"(per op: {flop / k:5.2f} flops/elem, {mv / k:4.2f} moved)")
        elems = 2 * (1 << 26)
        floor_us = (flop / k) * elems / VPU_RATE_DEFAULT * 1e6
        print(f"   -> analytic 26q VPU floor (ALU only): "
              f"{floor_us:6.1f} us/op at {VPU_RATE_DEFAULT:.1e} flop/s")
    print()
    print("== circuit-wide lane-placement upper bound (lever (b)) ==")
    for n in (22, 24, 26):
        info = lane_coverage_bound(n)
        cov = info["best_7bit_coverage"]
        win = cov * 170.0
        # the best subset's bits must be imported to lanes and restored:
        # >= 2 plane-op relayouts per imported bit per sweep (§16)
        sweeps = {22: 2, 24: 2, 26: 2}[n]
        imported = sum(1 for b in info["best_bits"] if b >= 7)
        cost = imported * 2 * 370.0 * sweeps
        print(f"{n}q: {cov}/{info['moving_gates']} moving gates coverable "
              f"by bits {info['best_bits']} -> win bound ~{win:.0f} us vs "
              f"relayout ~{cost:.0f} us ({imported} imported bits x "
              f"{sweeps} sweeps) -> "
              f"{'NET LOSS' if cost >= win else 'candidate'}")


def main() -> int:
    ap_ = argparse.ArgumentParser()
    ap_.add_argument("--plan-only", action="store_true")
    ap_.add_argument("--decompose", type=int, default=None)
    ap_.add_argument("--scale", type=int, default=None)
    ap_.add_argument("--flavor", choices=("rowctrl", "extctrl"),
                     default="rowctrl")
    ap_.add_argument("--vpu", type=int, default=None)
    args = ap_.parse_args()

    if args.plan_only:
        run_plan_only()
        return 0
    setup_jax()
    if args.decompose:
        run_decompose(args.decompose)
    if args.scale:
        run_scale(args.scale, args.flavor)
    if args.vpu:
        run_vpu(args.vpu)
    return 0


if __name__ == "__main__":
    sys.exit(main())
