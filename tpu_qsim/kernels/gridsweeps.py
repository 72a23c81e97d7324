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
    as_pgates,
    emit_ops,
    materialize_ops,
)
from .sweeps import _EXT_BASE, _VMEM_LIMIT, MAX_SWEEP_GATES, moving_qubits

RB_BITS = 9                      # row bits per slice: slice = bits [0, 16)
A_MAX = 4                        # active bits per sweep (VMEM-bounded)
MIN_GRID_QUBITS = RB_BITS + LANE_BITS + A_MAX + 1   # 21
MAX_GRID_QUBITS = 28


def default_max_gates(n: int) -> int:
    """Per-size kernel gate cap, settled by on-chip A/B (cap56 vs cap70 on
    100-gate random circuits): bigger kernels (fewer sweeps) win through 25q
    (22q 1.11 vs 1.19 ms, 24q 3.95 vs 4.64) but at 26q+ the larger compute
    body overruns the stream-overlap budget (16.1 vs 13.4 ms)."""
    return 70 if n <= 25 else MAX_SWEEP_GATES


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


def plan_grid_sweeps(
    circuit,
    n: int | None = None,
    params: GridParams = GridParams(),
    max_gates: int = MAX_SWEEP_GATES,
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

    mv_cache = [moving_qubits(g.u, g.qubits) & high for g in gates]

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

    # pad the active set to a_max: a larger block halves the step count and
    # an unused in-kernel bit costs nothing
    active = set(sweep.active)
    for p in range(BLK, n):
        if len(active) >= a_max:
            break
        active.add(p)
    active = sorted(active)
    a = len(active)
    nop = 1 << a
    rows = nop * RB
    kbits = BLK + a
    inact = [p for p in range(BLK, n) if p not in active]
    steps = 1 << len(inact)

    kgates = _relabel_active(as_pgates(sweep.gates), n, active, params)
    # The "grid" profile's measured costs bar top-row windows (relayout
    # makes them ~2000-2800us each) and form lane windows eagerly (~25-35us
    # total — they pipeline at MXU rate under the block streams). The
    # factorial A/B that looked worse under this profile was confounded by
    # the W-rewrite, which regressed 26q 13.5 -> 22.7 ms on its own.
    ops, const_table = materialize_ops(kgates, n_bits=kbits, profile="grid")

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

    def sweep_fn(state):
        x = state.reshape(vshape)
        if const_table is not None:
            y = call(const_table, x)
        else:
            y = call(x)
        return y.reshape(state.shape)

    return sweep_fn


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
    ):
        n = circuit.num_qubits if isinstance(circuit, Circuit) else num_qubits
        self.num_qubits = n
        self.params = params
        if max_gates is None:
            max_gates = default_max_gates(n)
        plan = plan_grid_sweeps(circuit, n, params, max_gates)
        self.num_sweeps = len(plan)
        self.active_sets = [sorted(s.active) for s in plan]
        self._fns = [
            _build_grid_sweep(s, n, interpret, params) for s in plan
        ]

        def run_state(state):
            for fn in self._fns:
                state = fn(state)
            return state

        from ..utils import jit_scoped

        self.run_state = run_state
        self.run = jit_scoped(run_state)

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
        if not (MIN_GRID_QUBITS <= n <= MAX_GRID_QUBITS):
            raise ValueError(
                f"grid sweep path expects {MIN_GRID_QUBITS} <= n <= "
                f"{MAX_GRID_QUBITS}, got {n}"
            )
        params = GridParams()
    else:
        if n <= params.blk_bits + 1:
            raise ValueError("n must exceed blk_bits + 1")
    return GridSweepProgram(
        circuit, interpret, params, num_qubits=n, max_gates=max_gates
    )
