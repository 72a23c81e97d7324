"""Part-map sweep executor for states larger than VMEM (n > 21).

Replaces the round-1 segmented grid kernel (``segmented.py``). The measured
DMA facts that shaped this design (one v5e chip, 26 qubits, this round):

* ANY Pallas kernel issuing bulk HBM write DMAs collapses every concurrent
  HBM stream to ~220 GB/s combined — read-only in-kernel DMA streams at
  ~670 GB/s and write-only at ~740, but mixed (or even strictly
  phase-alternated) r/w inside one kernel pins at ~220 regardless of
  buffering depth, block size, or queue layout;
* XLA's own operand staging around VMEM-resident ``pallas_call``s —
  sequential whole-operand calls and ``lax.map`` over stacked/zipped
  operands — streams at 335-615 GB/s on the same data.

So this executor NEVER issues a DMA from inside a kernel: every sweep is a
map/loop of whole-operand VMEM kernels whose HBM traffic is 100% XLA-staged.

Layout: the state is a tuple of ``NP = 2^K`` **parts** (split on the top K
state bits), each ``(G2, 2, RB, 128)``: leading axis = mid bits, then
real/imag planes of 512-row blocks (lanes = bits 0-6, rows = bits 7-15).
Two sweep shapes cover every bit:

* **LOW sweep** — one whole-part kernel per part: kernel state = bits
  ``[0, n-K)``; the part's top-K bits arrive as a per-call scalar.
* **HIGH sweep** — for an active top-bit subset A: zip-``lax.map`` over
  ``2^|A|`` parts per group; the kernel stacks the per-part blocks into a
  ``(2^|A|*RB, 128)`` plane where the stacked axis realizes the active top
  bits; mid bits + inactive top bits arrive via the per-step scalar.

Gates whose matrix is diagonal or controlled along an out-of-kernel bit
still execute there: the emission layer resolves those bits from the scalar
(``ext`` in :func:`..fused_circuit.emit_ops`). Only the *moving* qubits of
a gate must be in-kernel — for the library gate set that is the target of
cnot/cry/toffoli, the qubit of x/h/..., and both qubits of swap (decomposed
into cnots when they straddle the two shapes). There are NO relocation
passes and NO restore permutation: the state never leaves canonical qubit
order, unlike the round-1 segmented engine (and unlike the block-swap
relabeling the reference's literature analog uses).

Reference comparison: replaces one-kernel-per-gate global-memory execution
(reference src/Gates.cu:19-121, src/Simulator.cu:28-36) with whole-sweep
fusion — two XLA-staged HBM passes per sweep instead of two per gate.
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
from ..gates import op_matrix
from .fused_circuit import (
    LANE_BITS,
    _controlled_split,
    _is_diagonal,
    emit_ops,
    materialize_ops,
)

K_BITS = 5                 # part-split bits: top K state bits
RB_BITS = 9                # row bits per block: block = bits [0, 16)
MIN_SWEEP_QUBITS = RB_BITS + LANE_BITS + K_BITS + 1   # 22
MAX_SWEEP_QUBITS = 26
# Mosaic's VMEM allocator cannot hold a ~90-gate emission at 2^14-row values
# inside its ~100 MB budget, and its compile time grows superlinearly with
# emitted ops; bound both per kernel. MAX_ACTIVE_TOPS=4 keeps high-sweep
# kernels at 2^13 rows (16-operand maps — also the fastest measured shape).
MAX_SWEEP_GATES = 56
MAX_ACTIVE_TOPS = 4


@dataclass(frozen=True)
class SweepParams:
    """Engine geometry — module defaults for production; tests shrink it."""

    k_bits: int = K_BITS
    rb_bits: int = RB_BITS

    @property
    def np_(self) -> int:
        return 1 << self.k_bits

    @property
    def rb(self) -> int:
        return 1 << self.rb_bits

    @property
    def blk_bits(self) -> int:
        return self.rb_bits + LANE_BITS
# external-bit tokens: qubit ids >= _EXT_BASE + p denote out-of-kernel state
# bit p, resolved from the per-call/per-step scalar
from .fused_circuit import EXT_BASE as _EXT_BASE  # single source of truth
# Mosaic consumes its full vmem budget plus a few MB of operand frame; the
# XLA scoped check (utils.SCOPED_VMEM_KIB = 112 MB) must sit ABOVE this.
_VMEM_LIMIT = 100 * 1024 * 1024


def moving_qubits(u: np.ndarray, qubits: tuple[int, ...]) -> frozenset[int]:
    """Qubits along which ``u`` actually moves amplitudes — mirrors the
    emission recursion: diagonal matrices move nothing; a controlled matrix
    moves only what its inner block moves."""
    if _is_diagonal(u):
        return frozenset()
    v = _controlled_split(u)
    if v is not None:
        return moving_qubits(v, qubits[1:])
    return frozenset(qubits)


@dataclass
class Sweep:
    kind: str                      # "low" | "high"
    gates: list[Gate] = field(default_factory=list)
    tops: set = field(default_factory=set)   # high: active top bits (moving)


def plan_sweeps(
    circuit: Circuit,
    n: int | None = None,
    params: SweepParams = SweepParams(),
) -> list[Sweep]:
    """Partition the circuit into low/high sweeps via frontier scheduling.

    low kernel = bits [0, n-K); high kernel = bits [0, 16) + active top
    bits. A gate fits a sweep iff its moving qubits lie in that kernel.
    Local/diagonal gates fit everywhere and ride the current sweep. A swap
    moving across the two exclusive regions decomposes into 3 cnots.
    """
    from ..commute import FrontierScheduler

    n = circuit.num_qubits if n is None else n
    top = frozenset(range(n - params.k_bits, n))
    lowmid = frozenset(range(params.blk_bits, n - params.k_bits))

    max_tops = min(MAX_ACTIVE_TOPS, params.k_bits)
    gates: list[Gate] = []
    for g in circuit.gates:
        mv = moving_qubits(op_matrix(g), g.qubits)
        if mv & top and mv & lowmid:
            if g.name == "swap":
                a, b = g.qubits
                gates += [
                    Gate("cnot", (a, b)),
                    Gate("cnot", (b, a)),
                    Gate("cnot", (a, b)),
                ]
                continue
            raise ValueError(
                f"gate {g.name}{g.qubits} moves both a mid and a top qubit"
            )
        if len(mv & top) > max_tops:
            # a dense gate moving more top bits than a high kernel can stack
            # can never fit ANY sweep; without this check the scheduler below
            # would flip kinds forever without progress
            raise ValueError(
                f"gate {g.name}{g.qubits} moves {len(mv & top)} top qubits; "
                f"the sweep engine stacks at most {max_tops}"
            )
        gates.append(g)

    mv_cache = [
        moving_qubits(op_matrix(g), g.qubits) for g in gates
    ]

    def fits(i: int, cur: Sweep) -> bool:
        if len(cur.gates) >= MAX_SWEEP_GATES:
            return False
        mv = mv_cache[i]
        if cur.kind == "low":
            return not (mv & top)
        return (
            not (mv & lowmid)
            and len(cur.tops | (mv & top)) <= MAX_ACTIVE_TOPS
        )

    sched = FrontierScheduler(gates)
    sweeps: list[Sweep] = []
    cur: Sweep | None = None
    flips = 0
    while not sched.done():
        if cur is not None:
            progressed = True
            while progressed:
                progressed = False
                for i in sched.ready():
                    if fits(i, cur):
                        sched.emit(i)
                        cur.gates.append(gates[i])
                        cur.tops |= mv_cache[i] & top
                        progressed = True
                        break
        if sched.done():
            break
        ready = sched.ready()
        need_low = sum(1 for i in ready if mv_cache[i] & lowmid)
        need_high = sum(1 for i in ready if mv_cache[i] & top)
        nxt = "high" if need_high >= need_low else "low"
        if cur is None or cur.gates:
            if cur is not None:
                sweeps.append(cur)
            cur = Sweep(nxt)
            flips = 0
        else:  # fresh sweep absorbed nothing: flip kind
            cur = Sweep(nxt)
            flips += 1
            if flips > 2:  # both kinds tried fresh: nothing can ever fit
                g = gates[sched.ready()[0]]
                raise ValueError(
                    f"sweep planner cannot place gate {g.name}{g.qubits}"
                )
    if cur is not None and cur.gates:
        sweeps.append(cur)
    return sweeps


def _relabel_low(gates: list[Gate], n: int, params: SweepParams) -> list[Gate]:
    """low kernel: state bits [0, n-K) are kernel bits; top bits external."""
    cut = n - params.k_bits
    return [
        Gate(
            g.name,
            tuple(q if q < cut else _EXT_BASE + q for q in g.qubits),
            g.param,
        )
        for g in gates
    ]


def _relabel_high(
    gates: list[Gate], n: int, active: list[int], params: SweepParams
) -> list[Gate]:
    """high kernel: block bits direct; active top bit -> blk_bits+rank; all
    other bits external."""
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
        out.append(Gate(g.name, tuple(qs), g.param))
    return out


def _build_low_sweep(
    gates: list[Gate], n: int, interpret: bool, params: SweepParams
) -> Callable:
    """One whole-part kernel per part (NP sequential XLA-staged calls)."""
    NP, RB = params.np_, params.rb
    g2 = 1 << (n - params.k_bits - params.blk_bits)
    rows = g2 * RB
    kbits = n - params.k_bits
    tops = list(range(n - params.k_bits, n))
    kgates = _relabel_low(gates, n, params)
    ops, const_table = materialize_ops(kgates, n_bits=kbits)

    def kernel(*refs):
        idx_ref = refs[0]
        k = 1
        const_ref = None
        if const_table is not None:
            const_ref = refs[k]
            k += 1
        in_ref, out_ref = refs[k], refs[k + 1]
        pidx = idx_ref[0, 0]
        ext = {
            _EXT_BASE + p: (pidx >> (p - (n - params.k_bits))) & 1
            for p in tops
        }
        xr = in_ref[:, 0].reshape(rows, 128)
        xi = in_ref[:, 1].reshape(rows, 128)
        xr, xi = emit_ops(xr, xi, ops, kbits, interpret, const_ref, ext)
        out_ref[:, 0] = xr.reshape(g2, RB, 128)
        out_ref[:, 1] = xi.reshape(g2, RB, 128)

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    if const_table is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((g2, 2, RB, 128), np.float32),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )

    def sweep(parts):
        out = []
        for p in range(NP):
            idx = jnp.full((1, 1), p, jnp.int32)
            args = [idx]
            if const_table is not None:
                args.append(const_table)
            out.append(call(*args, parts[p]))
        return tuple(out)

    return sweep


def _build_high_sweep(
    sweep_def: Sweep, n: int, interpret: bool, params: SweepParams
) -> Callable:
    """Grouped zip-map: 2^a parts per map call (a = active top bits)."""
    NP, RB, BLK = params.np_, params.rb, params.blk_bits
    gates = sweep_def.gates
    # Pad the active set to MAX_ACTIVE_TOPS: bigger operand groups mean
    # fewer, larger map calls, which stage measurably faster (2.28 ms vs
    # 3.7 ms per 26q sweep for 16-operand vs 2-operand groups); an unused
    # in-kernel top bit costs nothing.
    active = set(sweep_def.tops)
    for p in range(n - params.k_bits, n):
        if len(active) >= min(MAX_ACTIVE_TOPS, params.k_bits):
            break
        active.add(p)
    active = sorted(active)
    a = len(active)
    nop = 1 << a
    rows = nop * RB
    kbits = BLK + a
    g2 = 1 << (n - params.k_bits - BLK)
    mids = list(range(BLK, n - params.k_bits))
    inactive = [p for p in range(n - params.k_bits, n) if p not in active]
    kgates = _relabel_high(gates, n, active, params)
    ops, const_table = materialize_ops(kgates, n_bits=kbits)
    mid_w = len(mids)

    def kernel(*refs):
        idx_ref = refs[0]
        k = 1
        const_ref = None
        if const_table is not None:
            const_ref = refs[k]
            k += 1
        ins = refs[k : k + nop]
        outs = refs[k + nop : k + 2 * nop]
        sr, si = refs[-2], refs[-1]
        for c in range(nop):
            sr[pl.ds(c * RB, RB), :] = ins[c][0]
            si[pl.ds(c * RB, RB), :] = ins[c][1]
        step = idx_ref[0, 0]
        ext = {}
        for p in mids:
            ext[_EXT_BASE + p] = (step >> (p - BLK)) & 1
        for i, p in enumerate(inactive):
            ext[_EXT_BASE + p] = (step >> (mid_w + i)) & 1
        xr, xi = emit_ops(sr[:], si[:], ops, kbits, interpret, const_ref, ext)
        for c in range(nop):
            outs[c][0] = xr[c * RB : (c + 1) * RB, :]
            outs[c][1] = xi[c * RB : (c + 1) * RB, :]

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    if const_table is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * nop

    call = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((2, RB, 128), np.float32)] * nop,
        in_specs=in_specs,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * nop,
        scratch_shapes=[pltpu.VMEM((rows, 128), np.float32)] * 2,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )

    # part index p spells the top-K bits of its amplitudes: bit t of p is
    # state bit (n-K)+t. A map group fixes the inactive top bits and zips
    # one part per active-bit assignment.
    act_sel = [p - (n - params.k_bits) for p in active]  # bit pos in part id
    inact_sel = [p - (n - params.k_bits) for p in inactive]

    def group_members(grp: int) -> list[int]:
        members = []
        for aidx in range(nop):
            pid = 0
            for j, t in enumerate(act_sel):
                pid |= ((aidx >> j) & 1) << t
            for j, t in enumerate(inact_sel):
                pid |= ((grp >> j) & 1) << t
            members.append(pid)
        return members

    n_groups = 1 << len(inactive)

    def sweep(parts):
        out = [None] * NP
        for grp in range(n_groups):
            members = group_members(grp)
            # per-step scalar: mid bits then inactive-top bits
            idxs = (
                jnp.arange(g2, dtype=jnp.int32) + (grp << mid_w)
            ).reshape(g2, 1, 1)
            flat = (idxs,) + tuple(parts[m] for m in members)

            def body(opnds):
                args = [opnds[0]]
                if const_table is not None:
                    args.append(const_table)
                args += list(opnds[1:])
                return call(*args)

            ys = jax.lax.map(body, flat)
            for j, m in enumerate(members):
                out[m] = ys[j]
        return tuple(out)

    return sweep


class SweepProgram:
    """Compiled sweep pipeline for one circuit.

    ``run``: (2, 2^n) -> (2, 2^n) flat planes (scoped-vmem-aware jit).
    ``run_parts``: part-tuple -> part-tuple, for chaining without the
    flat<->parts conversion passes.
    """

    def __init__(
        self,
        circuit: Circuit,
        interpret: bool,
        params: SweepParams = SweepParams(),
    ):
        n = circuit.num_qubits
        self.num_qubits = n
        self.params = params
        plan = plan_sweeps(circuit, n, params)
        self.sweep_kinds = [s.kind for s in plan]
        self._fns = [
            (
                _build_low_sweep(s.gates, n, interpret, params)
                if s.kind == "low"
                else _build_high_sweep(s, n, interpret, params)
            )
            for s in plan
        ]
        NP, RB = params.np_, params.rb
        g2 = 1 << (n - params.k_bits - params.blk_bits)

        def to_parts(state):
            x5 = state.reshape(2, NP, g2, RB, 128)
            return tuple(
                jnp.stack([x5[0, p], x5[1, p]], axis=1) for p in range(NP)
            )

        def from_parts(parts):
            r = jnp.stack([p[:, 0] for p in parts]).reshape(1 << n)
            i = jnp.stack([p[:, 1] for p in parts]).reshape(1 << n)
            return jnp.stack([r, i])

        def run_parts(parts):
            for fn in self._fns:
                parts = fn(parts)
            return parts

        from ..utils import jit_scoped

        self.to_parts = to_parts
        self.from_parts = from_parts
        self.run_parts = run_parts
        # jit_scoped: the sweep kernels run inside lax.map, where XLA's
        # default 16 MB scoped-VMEM budget applies (the kernel-level
        # vmem_limit_bytes compiler param is not propagated there)
        self.run = jit_scoped(lambda s: from_parts(run_parts(to_parts(s))))

    def __call__(self, state):
        return self.run(state)


def build_sweep_run(
    circuit: Circuit,
    rdtype: np.dtype = np.float32,
    *,
    interpret: bool = False,
    params: SweepParams | None = None,
) -> SweepProgram:
    """Compile ``circuit`` into the part-map sweep pipeline."""
    n = circuit.num_qubits
    if np.dtype(rdtype) != np.float32:
        raise ValueError("the sweep path is float32-only")
    if params is None:
        if not (MIN_SWEEP_QUBITS <= n <= MAX_SWEEP_QUBITS):
            raise ValueError(
                f"sweep path expects {MIN_SWEEP_QUBITS} <= n <= "
                f"{MAX_SWEEP_QUBITS}, got {n}"
            )
        params = SweepParams()
    else:
        if n <= params.blk_bits + params.k_bits:
            raise ValueError("n must exceed blk_bits + k_bits")
    return SweepProgram(circuit, interpret, params)
