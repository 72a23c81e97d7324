"""Active-bit grid sweep executor: overlapped streaming for n > 21.

The second-generation >VMEM engine. The map-based part executor
(:mod:`tpu_qsim.kernels.sweeps`) streams operands at the XLA staging rate
(~335-615 GB/s) but staging and kernel compute are strictly additive; the
Pallas *grid* pipeline streams at the collapsed mixed-DMA rate (~220 GB/s)
but overlaps the streams with compute (docs/PERF_NOTES.md). For the
compute-heavy sweeps of 22q+ circuits max(stream, compute) beats
stage + compute, so this engine runs every sweep as one ``pallas_call``
grid whose block pipeline double-buffers the slices.

Design (vs sweeps.py):

* **One sweep shape.** A sweep is a set of <= A_MAX *active* high bits (any
  bits >= 16, mid or top — no low/high split) plus gates whose moving
  qubits lie in ``[0, 16) | active``. Fewer, fuller sweeps: a 26q
  100-gate circuit plans 3 sweeps here vs 4 in the map engine.
* **Zero layout passes.** The flat (2, 2^n) state is *reshaped* (free) to
  ``(2, 2, 2, ..., RB, 128)`` — one size-2 axis per state bit >= 16, in
  descending bit order. A sweep's block spans the full plane axis, the full
  size-2 axes of its active bits, and one coordinate of each inactive-bit
  axis: the 2^a scattered slices the kernel couples form a single
  rectangular block. No part stacking, no transposes, no relocations.
* **Stacked-row realization.** Inside the kernel the block collapses to a
  ``(2^a * RB, 128)`` plane whose row bits [RB_BITS, RB_BITS+a) realize the
  active bits in ascending order — the same kernel-bit layout the emission
  layer (:func:`..fused_circuit.emit_ops`) already supports; inactive bits
  resolve through ``ext`` scalars derived from ``pl.program_id``.

Reference comparison: this is the TPU replacement for one-kernel-per-gate
global-memory execution (reference src/Gates.cu:19-121, Simulator.cu:28-36)
at sizes where the state exceeds VMEM; the reference had no analog (its
single allocation simply capped at device memory, StateVector.cu:173-176).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..circuit import Circuit, Gate
from ..gates import gate_matrix
from .fused_circuit import (
    LANE_BITS,
    PGate,
    _SWAP_U,
    _is_diagonal,
    as_pgates,
    emit_ops,
    materialize_ops,
)
from .sweeps import _EXT_BASE, _VMEM_LIMIT, MAX_SWEEP_GATES, moving_qubits

RB_BITS = 9                      # row bits per slice: slice = bits [0, 16)
# Spend spare active-bit slots on the sweep's hottest ext-control bits
# (scored by the §13 per-op-class costs) instead of the lowest high bits.
FILL_HOT_BITS = True
A_MAX = 4                        # active bits per sweep (VMEM-bounded)
MIN_GRID_QUBITS = RB_BITS + LANE_BITS + A_MAX + 1   # 21
MAX_GRID_QUBITS = 30                 # = reference MAX_QUBITS (Constants.hpp:68)


def default_max_gates(n: int) -> int:
    """Per-size kernel gate cap, settled by on-chip A/B (cap56 vs cap70 on
    100-gate random circuits): bigger kernels (fewer sweeps) win through 25q
    (22q 1.11 vs 1.19 ms, 24q 3.95 vs 4.64) but at 26q+ the larger compute
    body overruns the stream-overlap budget (16.1 vs 13.4 ms). Round-3
    view-form A/B (docs/PERF_NOTES.md §7): 24q cap80 2.84 ms vs cap90
    2.97 / cap100 3.05 / cap65 3.38, but 22q cap90 0.834 vs cap80 0.856 —
    the cap splits at 24q."""
    if n <= 21:
        return 100
    if n <= 23:
        return 90
    return 80 if n <= 25 else MAX_SWEEP_GATES


def default_geometry(n: int) -> tuple[GridParams, int]:
    """Measured-fastest (params, max_gates) per size (docs/PERF_NOTES.md §6).

    20-21q: whole-state 1-sweep grid, one HBM pass for the whole circuit
    when it fits one kernel (0.206 vs 0.217 ms segmented at 20q).
    22-25q: one row bit shifted into the active budget (identical 16.8 MB
    block, identical 20-bit kernel) halves the sweep count: 2 sweeps at a
    deliberately IMBALANCED 90/10 split — per-sweep fixed cost beats
    balancing (90/10 measured 1.03/3.88 ms at 22/24q vs 1.29/4.47 for
    50/50 splits). 26-27q: the wider active sets measured slower per sweep
    (15.1-15.5 vs 13.4 ms at 26q); keep rb9/a4 with the 56-gate cap.
    28q+: three row bits shifted (rb6/a7) gets 2-sweep plans and measured
    57.5 vs 64.4 ms at 28q."""
    if n <= 20:
        return GridParams(), 100
    if n == 21:
        return GridParams(rb_bits=8, a_max=5), 100
    if n <= 25:
        return GridParams(rb_bits=8, a_max=5), (90 if n <= 23 else 80)
    if n <= 27:
        return GridParams(), MAX_SWEEP_GATES
    return GridParams(rb_bits=6, a_max=7), 70


def geometry_candidates(
    n: int,
) -> list[tuple[GridParams, int, int | None, bool, bool]]:
    """Ordered geometry candidates tried at program build: ``(params,
    cap, required_sweeps, partition, balance)``. The first candidate
    whose plan meets its sweep requirement wins; the final entry
    (requirement None) is the measured default. Preference order is
    MEASURED, not derived — on-chip A/Bs (2026-08-18, view-form chains,
    100-gate seed-42 mixes):

    * 26q: rb8/a5 balanced 2-sweep [50,50] 9.03 ms < rb9/a4 3-sweep
      default 9.69 ms < rb6/a7 2-sweep [50,50] 10.39 ms — the wider
      rb6/a7 budget is NOT a fallback at 26q; circuits without an
      rb8/a5 partition keep the default.
    * 27q: rb6/a7 balanced [50,50] 19.2 ms vs rb9/a4 3-sweep 21.7.
    * 28q: rb6/a7 balanced [50,50] 38.2 ms vs [70,30] 43.9 (same sweep
      count — balance itself pays at this size).
    * 29q: a wash — [70,30] 94.4/95.5 ms vs balanced [50,50] 96.4/92.7
      across two paired A/Bs; default keeps the frontier fill,
      partition rescues odd circuits at balance=False.
    * 30q: the FILL partition [67,33] 195.5 ms beat both the frontier
      3-sweep [70,25,5] (210.7) and the balanced [50,50] (226.7) —
      balance=False, like 29q.
    * 22q/24q: balanced [50,50] LOSES (1.10 vs 0.834; 3.53 vs 2.844) —
      below 26q the imbalanced big-kernel defaults stand, so no
      candidate is added there.

    Not every circuit admits a 2-sweep partition (seed-dependent),
    hence per-circuit candidates rather than new fixed defaults.
    """
    cands: list[tuple[GridParams, int, int | None, bool, bool]] = []
    if n == 26:
        cands.append((GridParams(rb_bits=8, a_max=5), 70, 2, True, True))
    elif n == 27 or n == 28:
        cands.append((GridParams(rb_bits=6, a_max=7), 50, 2, True, True))
    params, cap = default_geometry(n)
    if n >= 29 or n <= 25:
        # rescue odd >bound frontier plans with the FILL form: balanced
        # shapes measured slower than imbalanced both at 22-24q (the
        # +0.7 ms balanced penalty at 24q exceeds a sweep's ~0.35 ms
        # fixed cost) and at 29-30q; only 26-28q prefer balance.
        cands.append((params, cap, None, True, False))
    else:
        cands.append((params, cap, None, True, True))
    return cands


@dataclass(frozen=True)
class GridParams:
    """Engine geometry — module defaults for production; tests shrink it."""

    rb_bits: int = RB_BITS
    a_max: int = A_MAX

    @property
    def blk_bits(self) -> int:
        return self.rb_bits + LANE_BITS

    @property
    def rb(self) -> int:
        return 1 << self.rb_bits


@dataclass
class GridSweep:
    active: set = field(default_factory=set)   # moving state bits >= blk
    gates: list[PGate] = field(default_factory=list)


def _two_sweep_partition(
    gates: list[PGate],
    mv_cache: list[frozenset],
    a_max: int,
    max_gates: int,
    balance: bool = True,
) -> list[GridSweep] | None:
    """Exact 2-sweep planning by active-set partition enumeration.

    The greedy frontier packer fills a sweep's active budget on a
    first-ready basis, which can cost a whole extra full-state sweep vs
    the attainable lower bound ceil(|used bits| / a_max): the 100-gate
    bench circuits at 26q (rb8/a5) and 30q (rb6/a7) both admit
    order-feasible 2-sweep partitions the greedy packer misses. A sweep
    plan's runtime is (fixed streaming cost per sweep) x sweeps +
    per-gate compute, so a saved sweep is a direct win.

    Enumerates every split of the used high bits into two <= a_max
    halves (C(|used|, size1) candidates, capped) and checks order
    feasibility with a linear drain over the precomputed commutation
    DAG. Returns the feasible plan minimizing the larger sweep (compile
    time is superlinear in kernel gate count), or None.
    """
    from itertools import combinations
    from math import comb

    from ..commute import dependency_edges

    used = sorted(set().union(*mv_cache)) if mv_cache else []
    u = len(used)
    ng = len(gates)
    if u <= a_max or u > 2 * a_max or ng > 2 * max_gates:
        return None
    n_parts = sum(comb(u, s1) for s1 in range(u - a_max, a_max + 1))
    if n_parts * ng > 4_000_000:
        return None

    preds = dependency_edges(gates)
    half = (ng + 1) // 2

    def plan_for(s1: frozenset, s2: frozenset) -> tuple | None:
        """Minimal sweep-1 = transitive predecessor closure of the
        S1-colored gates, then balanced fill with other S1-placeable
        gates (smaller kernels compile and run better — measured cap
        A/Bs, docs/PERF_NOTES.md §7). Program order is a valid order
        within each sweep (dependency edges only point backward)."""
        need = [False] * ng           # must be in sweep 1
        can1 = [False] * ng           # may be in sweep 1
        for i, mv in enumerate(mv_cache):
            if mv and not (mv <= s1 or mv <= s2):
                return None           # moving set straddles the partition
            need[i] = bool(mv) and mv <= s1
            can1[i] = mv <= s1 and all(can1[p] for p in preds[i])
        for i in range(ng - 1, -1, -1):
            if need[i]:
                if not can1[i]:
                    return None       # an S1 gate depends on an S2 gate
                for p in preds[i]:
                    need[p] = True
        m = sum(need)
        if m > max_gates:
            return None
        # balance=True fills sweep 1 to ~half (28q A/B: [50,50] 38.2 ms
        # vs [70,30] 43.9); balance=False max-fills it (29q A/B: [70,30]
        # 94.4 ms vs [50,50] 96.4 — the preference flips with size)
        fill = half if balance else max_gates
        target = min(max(m, fill, ng - max_gates), max_gates)
        sel = list(need)
        size1 = m
        for i in range(ng):
            if size1 >= target:
                break
            if not sel[i] and can1[i] and all(sel[p] for p in preds[i]):
                sel[i] = True
                size1 += 1
        if ng - size1 > max_gates:
            return None
        return (
            [i for i in range(ng) if sel[i]],
            [i for i in range(ng) if not sel[i]],
        )

    best = None
    for size1 in range(u - a_max, a_max + 1):
        for c in combinations(used, size1):
            s1 = frozenset(c)
            r = plan_for(s1, frozenset(used) - s1)
            if r is None:
                continue
            score = max(len(o) for o in r)
            if best is None or score < best[0]:
                best = (score, r)
    if best is None:
        return None
    sweeps = []
    for order in best[1]:
        s = GridSweep()
        for i in order:
            s.gates.append(gates[i])
            s.active |= mv_cache[i]
        sweeps.append(s)
    return sweeps


def plan_grid_sweeps(
    circuit,
    n: int | None = None,
    params: GridParams = GridParams(),
    max_gates: int = MAX_SWEEP_GATES,
    partition: bool = True,
    balance: bool = True,
    premerged: bool = False,
) -> list[GridSweep]:
    """Partition the circuit into active-bit sweeps via frontier scheduling.

    ``circuit`` is a :class:`~tpu_qsim.circuit.Circuit` or any gate list
    :func:`~tpu_qsim.kernels.fused_circuit.as_pgates` accepts. A gate fits
    a sweep iff its moving qubits >= blk_bits fit the sweep's active
    budget. Diagonal/controlled structure along high bits costs nothing
    (ext resolution), so e.g. a CZ or a control anywhere always rides the
    current sweep.
    """
    from ..commute import FrontierScheduler

    if isinstance(circuit, Circuit):
        raw, n = circuit.gates, circuit.num_qubits if n is None else n
    else:
        raw = list(circuit)
        if n is None:
            raise ValueError("n is required for a raw gate list")
    if max_gates < 1:
        # a fresh sweep must absorb >= 1 ready gate for the frontier loop
        # to make progress; 0 would spin forever
        raise ValueError(f"max_gates must be >= 1, got {max_gates}")
    high = frozenset(range(params.blk_bits, n))
    a_max = min(params.a_max, n - params.blk_bits)

    _cnot = None
    gates: list[PGate] = []
    for g in as_pgates(raw):
        mv = moving_qubits(g.u, g.qubits)
        if len(mv & high) > a_max:
            if g.u.shape[0] == 4 and not np.any(g.u - _SWAP_U):
                if _cnot is None:
                    _cnot = gate_matrix("cnot").astype(np.complex128)
                a, b = g.qubits
                gates += as_pgates(
                    [(_cnot, (a, b)), (_cnot, (b, a)), (_cnot, (a, b))]
                )
                continue
            raise ValueError(
                f"gate on {g.qubits} moves {len(mv & high)} high "
                f"qubits; the grid engine stacks at most {a_max}"
            )
        gates.append(g)

    # fold same-qubit 1q runs BEFORE sweep planning: fewer gates to place
    # (and fewer emitted plane-ops per kernel — the engines are
    # compute-bound since round 3b). ``premerged`` skips the O(G^2) pass
    # when the caller already folded the list (the candidate loop of
    # build_grid_sweep_run plans the same circuit several times).
    if not premerged:
        import tpu_qsim.kernels.fused_circuit as _fc

        if _fc.DIAG_CTRL in (True, "all"):
            gates = _fc.diagonalize_controlled(gates)
        gates = _fc.merge_1q_chains(gates)

    mv_cache = [moving_qubits(g.u, g.qubits) & high for g in gates]

    # native planner (tpu_qsim/native/fusion.cpp::qsim_plan_grid_sweeps):
    # same frontier scheduling on matrix-free per-gate data; bit-identical
    # results (differential tests in tests/test_native.py), Python below is
    # the always-available fallback and the executable specification.
    from .. import native

    if native.available():
        planned = native.plan_grid_sweeps_native(
            [g.qubits for g in gates],
            [g.classes for g in gates],
            [sum(1 << q for q in mv) for mv in mv_cache],
            a_max,
            max_gates,
        )
        if planned is not None:
            sweeps = []
            for members in planned:
                s = GridSweep()
                for i in members:
                    s.gates.append(gates[i])
                    s.active |= mv_cache[i]
                sweeps.append(s)
            return _improve_plan(
                sweeps, gates, mv_cache, a_max, max_gates,
                partition, balance,
            )

    sched = FrontierScheduler(gates)
    sweeps: list[GridSweep] = []
    cur = GridSweep()
    while not sched.done():
        progressed = True
        while progressed:
            progressed = False
            for i in sched.ready():
                if (
                    len(cur.gates) < max_gates
                    and len(cur.active | mv_cache[i]) <= a_max
                ):
                    sched.emit(i)
                    cur.gates.append(gates[i])
                    cur.active |= mv_cache[i]
                    progressed = True
                    break
        if sched.done():
            break
        # a fresh sweep always absorbs at least one ready gate (every gate
        # passed the per-gate a_max validation above)
        sweeps.append(cur)
        cur = GridSweep()
    if cur.gates:
        sweeps.append(cur)
    return _improve_plan(
        sweeps, gates, mv_cache, a_max, max_gates, partition, balance
    )


def _improve_plan(
    sweeps: list[GridSweep],
    gates: list[PGate],
    mv_cache: list[frozenset],
    a_max: int,
    max_gates: int,
    partition: bool = True,
    balance: bool = True,
) -> list[GridSweep]:
    """Post-pass on a frontier plan: when the greedy packer used more
    sweeps than the active-bit lower bound and that bound is 2, replace
    the plan with an enumerated 2-sweep partition (see
    :func:`_two_sweep_partition`)."""
    if not partition:
        return sweeps
    used = set().union(*mv_cache) if mv_cache else set()
    bound = -(-len(used) // a_max) if used and a_max else 1
    if len(sweeps) > bound == 2:
        alt = _two_sweep_partition(gates, mv_cache, a_max, max_gates, balance)
        if alt is not None:
            return alt
    return sweeps


def _relabel_active(
    gates: list[PGate], n: int, active: list[int], params: GridParams
) -> list[PGate]:
    """blk bits direct; active bit (ascending) -> blk_bits + rank; all other
    high bits external."""
    rank = {p: i for i, p in enumerate(active)}
    out = []
    for g in gates:
        qs = []
        for q in g.qubits:
            if q < params.blk_bits:
                qs.append(q)
            elif q in rank:
                qs.append(params.blk_bits + rank[q])
            else:
                qs.append(_EXT_BASE + q)
        out.append(PGate(g.u, tuple(qs), g.classes))
    return out


def _pad_active(sweep: GridSweep, n: int, BLK: int, a_max: int) -> list[int]:
    """Pad the sweep's active set to ``a_max``: a larger block halves the
    step count and an unused in-kernel bit costs no extra bytes — but WHICH
    bit rides along matters. A control on an inactive high bit resolves as
    a per-invocation scalar select (~417 us/op at 26q, docs/PERF_NOTES.md
    §13) while the same control on an active (stacked-row) bit is an
    iota-mask blend (~194 us/op); conversely ext diagonal bits ride the
    extphase fusion for free while in-kernel diag costs ~43 us/op. Spend
    the spare slots on the bits with the best measured trade, then fill any
    remainder with the lowest high bits."""
    active = set(sweep.active)
    spare = a_max - len(active)
    if FILL_HOT_BITS and spare > 0:
        score: dict[int, float] = {}
        for g in sweep.gates:
            w = -43.0 if _is_diagonal(g.u) else 223.0
            for q in set(g.qubits):
                if BLK <= q < n and q not in active:
                    score[q] = score.get(q, 0.0) + w
        hot = sorted(
            (q for q, v in score.items() if v > 0),
            key=lambda q: (-score[q], q),
        )[:spare]
        active |= set(hot)
    for p in range(BLK, n):
        if len(active) >= a_max:
            break
        active.add(p)
    return sorted(active)


def _build_grid_sweep(
    sweep: GridSweep,
    n: int,
    interpret: bool,
    params: GridParams,
) -> Callable:
    """One pallas_call grid over the inactive-bit steps of this sweep."""
    RB = params.rb
    BLK = params.blk_bits
    hb = n - BLK                              # high-bit axes
    a_max = min(params.a_max, hb)

    active = _pad_active(sweep, n, BLK, a_max)
    a = len(active)
    nop = 1 << a
    rows = nop * RB
    kbits = BLK + a
    inact = [p for p in range(BLK, n) if p not in active]
    steps = 1 << len(inact)

    kgates = _relabel_active(as_pgates(sweep.gates), n, active, params)
    import tpu_qsim.kernels.fused_circuit as _fc

    if _fc.DIAG_CTRL == "ext":
        # plan-local: only the ext-control scalar-select class (417 us/op
        # at 26q, docs/PERF_NOTES.md §13) is rewritten; in-kernel blends
        # (136-194 us/op) stay. W factors land unmerged inside the kernel.
        kgates = _fc.diagonalize_controlled(kgates, only_ext_base=_EXT_BASE)
    # The "grid" profile's measured costs bar top-row windows (relayout
    # makes them ~2000-2800us each) and form lane windows eagerly (~25-35us
    # total — they pipeline at MXU rate under the block streams). The
    # factorial A/B that looked worse under this profile was confounded by
    # the W-rewrite, which regressed 26q 13.5 -> 22.7 ms on its own.
    ops, const_table = materialize_ops(
        kgates, n_bits=kbits, profile="grid", merge=False
    )

    # multi-dim view: (2 planes, bit n-1, ..., bit BLK, RB, 128)
    vshape = (2,) + (2,) * hb + (RB, 128)
    # block: full plane axis + full active axes + one coord per inactive axis
    bshape = (2,) + tuple(
        2 if (n - 1 - t) in active else 1 for t in range(hb)
    ) + (RB, 128)
    inact_pos = {p: b for b, p in enumerate(inact)}   # step-bit index

    def index_map(s):
        coords = [0]
        for t in range(hb):
            p = n - 1 - t
            if p in inact_pos:
                coords.append((s >> inact_pos[p]) & 1)
            else:
                coords.append(0)
        coords += [0, 0]
        return tuple(coords)

    blk_dims = bshape[1:-2]                   # the 1/2 bit-axis extents

    def kernel(*refs):
        k = 0
        const_ref = None
        if const_table is not None:
            const_ref = refs[0]
            k = 1
        in_ref, out_ref = refs[k], refs[k + 1]
        x = in_ref[...]
        xr = x[0].reshape(rows, 128)
        xi = x[1].reshape(rows, 128)
        s = pl.program_id(0)
        ext = {
            _EXT_BASE + p: (s >> b) & 1 for b, p in enumerate(inact)
        }
        xr, xi = emit_ops(xr, xi, ops, kbits, interpret, const_ref, ext)
        out_ref[...] = jnp.stack(
            [xr.reshape(*blk_dims, RB, 128), xi.reshape(*blk_dims, RB, 128)]
        )

    in_specs = []
    if const_table is not None:
        in_specs.append(
            pl.BlockSpec(
                const_table.shape, lambda s: (0, 0), memory_space=pltpu.VMEM
            )
        )
    in_specs.append(pl.BlockSpec(bshape, index_map))

    call = pl.pallas_call(
        kernel,
        grid=(steps,),
        out_shape=jax.ShapeDtypeStruct(vshape, np.float32),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(bshape, index_map),
        input_output_aliases={1 if const_table is not None else 0: 0},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )

    def sweep_fn_view(x):
        # operates on the vshape view; the program chains sweeps in view
        # form so the pallas operand IS the (donated) parameter — a bitcast
        # between a donated param and an aliased pallas operand makes XLA's
        # copy-insertion materialize a full-state copy, which at 30q is the
        # difference between fitting HBM (8.25 GB) and OOM (16.25 GB)
        if const_table is not None:
            return call(const_table, x)
        return call(x)

    return sweep_fn_view


class GridSweepProgram:
    """Compiled grid-sweep pipeline for one circuit.

    ``run``: (2, 2^n) -> (2, 2^n) flat planes (scoped-vmem-aware jit).
    """

    def __init__(
        self,
        circuit,
        interpret: bool,
        params: GridParams = GridParams(),
        num_qubits: int | None = None,
        max_gates: int | None = None,
        plan: list[GridSweep] | None = None,
    ):
        n = circuit.num_qubits if isinstance(circuit, Circuit) else num_qubits
        self.num_qubits = n
        self.params = params
        if plan is None:
            if max_gates is None:
                max_gates = default_max_gates(n)
            plan = plan_grid_sweeps(circuit, n, params, max_gates)
        self.num_sweeps = len(plan)
        self.active_sets = [sorted(s.active) for s in plan]
        # plan introspection (tests, debugging): the PGates are host-side
        # 4x4/8x8 complex128 — KBs per program, no device memory
        self.sweep_gates = [list(s.gates) for s in plan]
        self._fns = [
            _build_grid_sweep(s, n, interpret, params) for s in plan
        ]
        hb = n - params.blk_bits
        self.vshape = (2,) + (2,) * hb + (params.rb, 128)

        def run_view(x):
            for fn in self._fns:
                x = fn(x)
            return x

        def run_state(state):
            return run_view(state.reshape(self.vshape)).reshape(state.shape)

        from ..utils import jit_scoped

        self.run_state = run_state
        # 29q+ states (>= 4.3 GB of planes) are donated: the pallas calls
        # already alias in/out, and at 30q a preserved 8.6 GB input cannot
        # coexist with its 8.6 GB output in 16 GB of HBM. Callers must not
        # reuse the input buffer after a donating run (the simulator facade
        # rebinds its state, reference-style in-place semantics).
        self.donates = n >= 29
        dn = (0,) if self.donates else ()
        # view-form entry points: at 30q even ONE bitcast between the
        # donated parameter and an aliased pallas operand makes XLA
        # copy-insertion materialize a full-state copy (OOM); chain the
        # sweeps on the view and keep the flat<->view casts in their own
        # (donated, bitcast-only) programs
        self.run_view = jit_scoped(run_view, donate_argnums=dn)
        self.to_view = jit_scoped(
            lambda s: s.reshape(self.vshape), donate_argnums=dn
        )
        self.from_view = jit_scoped(
            lambda x: x.reshape((2, 1 << n)), donate_argnums=dn
        )
        if n >= 30:
            def run(state):
                return self.from_view(self.run_view(self.to_view(state)))

            self.run = run
        else:
            self.run = jit_scoped(run_state, donate_argnums=dn)

    def __call__(self, state):
        return self.run(state)


def build_grid_sweep_run(
    circuit,
    rdtype: np.dtype = np.float32,
    *,
    interpret: bool = False,
    params: GridParams | None = None,
    num_qubits: int | None = None,
    max_gates: int | None = None,
) -> GridSweepProgram:
    """Compile ``circuit`` (a Circuit, or any gate list ``as_pgates``
    accepts plus ``num_qubits``) into the active-bit grid sweep pipeline."""
    n = circuit.num_qubits if isinstance(circuit, Circuit) else num_qubits
    if n is None:
        raise ValueError("num_qubits is required for a raw gate list")
    if np.dtype(rdtype) != np.float32:
        raise ValueError("the grid sweep path is float32-only")
    if params is None:
        # production entry starts at 20 (the whole-state 1-sweep program
        # beats the segmented engine there: 0.206 vs 0.217 ms)
        if not (20 <= n <= MAX_GRID_QUBITS):
            raise ValueError(
                f"grid sweep path expects 20 <= n <= "
                f"{MAX_GRID_QUBITS}, got {n}"
            )
        if max_gates is not None:
            # explicit cap: keep the size's default geometry AND its
            # measured partition/balance policy (the bare plan default
            # of balance=True contradicts the pinned fill policy at
            # 22-25q and 29-30q)
            params, _ = default_geometry(n)
            _, _, _, part, bal = geometry_candidates(n)[-1]
            plan = plan_grid_sweeps(circuit, n, params, max_gates, part, bal)
            return GridSweepProgram(
                circuit, interpret, params, num_qubits=n, plan=plan
            )
        # first candidate whose plan meets its sweep requirement wins;
        # the final (requirement-free) entry is the measured default
        # (see geometry_candidates)
        chosen = None
        fallback = None      # a valid plan that missed its sweep target
        err: ValueError | None = None
        merged = None        # fold once, not once per candidate
        for p, cap, req, part, bal in geometry_candidates(n):
            try:
                if merged is None:
                    import tpu_qsim.kernels.fused_circuit as _fc

                    raw = (
                        circuit.gates
                        if isinstance(circuit, Circuit)
                        else list(circuit)
                    )
                    merged = as_pgates(raw)
                    if _fc.DIAG_CTRL in (True, "all"):
                        # NOTE: runs before plan_grid_sweeps' wide-swap ->
                        # 3-cnot decomposition, so those synthetic cnots
                        # would emit as (correct) blends. Reachable only at
                        # a_max == 1; every production geometry uses >= 4.
                        merged = _fc.diagonalize_controlled(merged)
                    merged = _fc.merge_1q_chains(merged)
                plan = plan_grid_sweeps(
                    merged, n, p, cap, part, bal, premerged=True
                )
            except ValueError as e:
                err = e
                continue
            if req is None or len(plan) <= req:
                chosen = (p, plan)
                break
            if fallback is None:
                fallback = (p, plan)
        if chosen is None:
            chosen = fallback   # e.g. a wide dense gate only a5 can stack
        if chosen is None:
            raise err if err is not None else ValueError("no geometry fits")
        params, plan = chosen
        return GridSweepProgram(
            circuit, interpret, params, num_qubits=n, plan=plan
        )
    if n <= params.blk_bits + 1:
        raise ValueError("n must exceed blk_bits + 1")
    return GridSweepProgram(
        circuit, interpret, params, num_qubits=n, max_gates=max_gates
    )
