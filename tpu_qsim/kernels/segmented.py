"""Segmented grid-kernel executor for states larger than VMEM (n > 20).

Pipeline per circuit (planned by :mod:`tpu_qsim.schedule`):

    gather-segment kernel -> gather-segment kernel -> ... -> [restore]

Each segment kernel is a grid ``pallas_call``: the grid ranges over the high
(block-index) bits, every program DMAs one 2^local_bits-amplitude block
HBM -> VMEM, applies the *entire segment* with the emission schemes of
:mod:`tpu_qsim.kernels.fused_circuit`, and writes back — two HBM passes per
segment instead of two per fused gate group.

Qubit relocations are **folded into the segment kernel's input gather**: when
a segment needs qubits living in the high (block-index) bits, the input
BlockSpec reads 2^(local-7-c) chunks of 2^c rows per output block, with an
index map that applies the whole bit relabeling — measured at the same
effective bandwidth as a plain block read (~507 vs ~481 GB/s on v5e), so a
relocation costs ZERO extra HBM passes. (Round 1 spent two full passes per
relocation on standalone :func:`tpu_qsim.apply.permute_qubits` transposes,
which dominated 22-26q wall-clock.) The planner keeps relocated row bits at
physical positions >= GATHER_SWAP_MIN so chunks stay >= 8 tile-dense rows.
Only the final restore-to-canonical runs as a standalone permute.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import apply as ap
from ..circuit import Circuit
from ..schedule import plan_segments
from .fused_circuit import LANE_BITS, emit_ops, materialize_ops

# Block size chosen for Mosaic compile time (grid kernels compile with
# per-block shapes; 2^16-amplitude blocks keep segment compiles ~tens of
# seconds) while staying far under VMEM (256 KB per plane per block).
DEFAULT_LOCAL_BITS = 16
MAX_SEGMENTED_QUBITS = 26
# Relocated row bits live in [GATHER_SWAP_MIN, local_bits): gather chunks are
# then >= 2^(GATHER_SWAP_MIN-7) = 8 rows, the (8, 128) tile floor.
GATHER_SWAP_MIN = 10
SWAP_HEADROOM = LANE_BITS + 3  # planner needs >= 3 victim slots
MIN_GATHER_CHUNK_BITS = 3      # 8-row chunks: the tile floor


def _gather_chunk_bits(src: tuple[int, ...], local_bits: int) -> int:
    """Contiguity budget of a relabeling: rows below the lowest moved row
    bit travel as one chunk."""
    moved_rows = [i for i in range(LANE_BITS, local_bits) if src[i] != i]
    if not moved_rows:
        return local_bits - LANE_BITS
    return min(moved_rows) - LANE_BITS


def _build_segment_kernel(
    gates: list,
    n: int,
    local_bits: int,
    interpret: bool,
    gather_src: tuple[int, ...] | None = None,
) -> Callable[[jax.Array], jax.Array]:
    """One segment sweep. ``gather_src`` (new bit i = old bit src[i], bits
    < GATHER_SWAP_MIN fixed) folds a qubit relabeling into the input reads.
    """
    rows_total = 1 << (n - LANE_BITS)
    rows_block = 1 << (local_bits - LANE_BITS)
    blocks = 1 << (n - local_bits)
    ops, const_table = materialize_ops(gates, n_bits=local_bits)

    out_is_aliased = gather_src is None

    if gather_src is None:
        grid: tuple[int, ...] = (blocks,)
        in_spec = pl.BlockSpec(
            (2, rows_block, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )
        out_spec = in_spec
        chunk_rows = rows_block
        n_chunks = 1
    else:
        src = gather_src
        c = _gather_chunk_bits(src, local_bits)
        assert c >= MIN_GATHER_CHUNK_BITS, "sub-tile gather; dispatch bug"
        chunk_rows = 1 << c
        n_chunks = rows_block // chunk_rows
        grid = (blocks, n_chunks)
        # inv[p] = output bit that carries old bit p
        inv = [0] * n
        for i, s in enumerate(src):
            inv[s] = i
        lo = LANE_BITS + c  # bits below lo are fixed and inside one chunk
        shifts = [inv[p] - lo for p in range(lo, n)]  # all >= 0 by closure

        def in_map(i, j):
            # output high bits [lo, n) as one integer, then gather each old
            # bit from its output position (static shifts, traced ints)
            out_hi = i * n_chunks + j
            in_hi = 0
            for t, s in enumerate(shifts):
                in_hi += ((out_hi >> s) & 1) << t
            return (0, in_hi, 0)

        in_spec = pl.BlockSpec(
            (2, chunk_rows, 128), in_map, memory_space=pltpu.VMEM
        )
        out_spec = pl.BlockSpec(
            (2, rows_block, 128), lambda i, j: (0, i, 0),
            memory_space=pltpu.VMEM,
        )

    def body(in_ref, out_ref, const_ref):
        if gather_src is None:
            xr, xi = emit_ops(
                in_ref[0], in_ref[1], ops, local_bits, interpret, const_ref
            )
            out_ref[0] = xr
            out_ref[1] = xi
            return
        j = pl.program_id(1)
        out_ref[:, pl.ds(j * chunk_rows, chunk_rows), :] = in_ref[:]

        @pl.when(j == n_chunks - 1)
        def _():
            xr, xi = emit_ops(
                out_ref[0], out_ref[1], ops, local_bits, interpret, const_ref
            )
            out_ref[0] = xr
            out_ref[1] = xi

    if const_table is None:

        def kernel(in_ref, out_ref):
            body(in_ref, out_ref, None)

        in_specs = [in_spec]
    else:

        def kernel(in_ref, const_ref, out_ref):
            body(in_ref, out_ref, const_ref)

        # constants: same full table every grid step (stays VMEM-resident)
        nargs = len(grid)
        in_specs = [
            in_spec,
            pl.BlockSpec(
                const_table.shape,
                (lambda i, j: (0, 0)) if nargs == 2 else (lambda i: (0, 0)),
                memory_space=pltpu.VMEM,
            ),
        ]

    # the block dim is embarrassingly parallel; the chunk dim must stay
    # sequential (the output block accumulates across chunk steps)
    semantics = ("parallel",) if len(grid) == 1 else ("parallel", "arbitrary")
    call = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((2, rows_total, 128), np.float32),
        in_specs=in_specs,
        out_specs=out_spec,
        # in-place only for the ungathered form: a gathered output block
        # overlaps OTHER programs' input blocks, so aliasing would race
        input_output_aliases={0: 0} if out_is_aliased else {},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics
        ),
        interpret=interpret,
    )

    def run(state: jax.Array) -> jax.Array:
        x = state.reshape(2, rows_total, 128)
        y = call(x) if const_table is None else call(x, const_table)
        return y.reshape(2, 1 << n)

    return run


def _bit_route(src: tuple[int, ...], n: int, lo: int):
    """Static shift table: composite high-bit gather for an index map.

    For a relabeling ``new bit i = old bit src[i]`` with bits < lo fixed,
    returns shifts s.t. old high bits = gather of new high bits:
    old bit lo+t = new bit lo+shifts[t].
    """
    inv = [0] * n
    for i, s in enumerate(src):
        inv[s] = i
    return [inv[p] - lo for p in range(lo, n)]


def _build_scatter_segment_kernel(
    gates: list,
    n: int,
    local_bits: int,
    interpret: bool,
    gather_src: tuple[int, ...] | None,
    scatter_src: tuple[int, ...],
) -> Callable[[jax.Array], jax.Array]:
    """Final segment sweep with the restore permutation folded into the
    OUTPUT writes: the grid's inner dim first assembles the block (gather
    phase), applies the segment at the last input chunk, then streams the
    block out as scatter chunks to their canonical locations. Saves the
    standalone restore transpose (2 full HBM passes)."""
    rows_total = 1 << (n - LANE_BITS)
    rows_block = 1 << (local_bits - LANE_BITS)
    blocks = 1 << (n - local_bits)
    ops, const_table = materialize_ops(gates, n_bits=local_bits)

    # gather side
    if gather_src is None:
        chunk_in = rows_block
        j_in = 1
        in_shifts = None
    else:
        c_in = _gather_chunk_bits(gather_src, local_bits)
        assert c_in >= MIN_GATHER_CHUNK_BITS
        chunk_in = 1 << c_in
        j_in = rows_block // chunk_in
        in_shifts = _bit_route(gather_src, n, LANE_BITS + c_in)

    # scatter side
    c_out = _gather_chunk_bits(scatter_src, local_bits)
    assert c_out >= MIN_GATHER_CHUNK_BITS
    chunk_out = 1 << c_out
    j_out = rows_block // chunk_out
    # scatter destination: canonical bit p = current bit scatter_src[p], so
    # dest high bits are a gather of current high bits by scatter_src itself
    lo_out = LANE_BITS + c_out
    out_shifts = [scatter_src[p] - lo_out for p in range(lo_out, n)]

    steps = j_in + j_out - 1
    grid = (blocks, steps)

    def in_map(i, j):
        jj = jnp.minimum(j, j_in - 1)
        if in_shifts is None:
            return (0, i, 0)
        out_hi = i * j_in + jj
        in_hi = 0
        for t, s in enumerate(in_shifts):
            in_hi += ((out_hi >> s) & 1) << t
        return (0, in_hi, 0)

    def out_map(i, j):
        jo = jnp.maximum(j - (j_in - 1), 0)
        cur_hi = i * j_out + jo
        dest_hi = 0
        for t, s in enumerate(out_shifts):
            dest_hi += ((cur_hi >> s) & 1) << t
        return (0, dest_hi, 0)

    in_spec = pl.BlockSpec((2, chunk_in, 128), in_map, memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (2, chunk_out, 128), out_map, memory_space=pltpu.VMEM
    )

    def body(in_ref, out_ref, scratch, const_ref):
        j = pl.program_id(1)

        @pl.when(j < j_in)
        def _():
            if in_shifts is None:
                scratch[:] = in_ref[:]
            else:
                scratch[:, pl.ds(j * chunk_in, chunk_in), :] = in_ref[:]

        @pl.when(j == j_in - 1)
        def _():
            xr, xi = emit_ops(
                scratch[0], scratch[1], ops, local_bits, interpret, const_ref
            )
            scratch[0] = xr
            scratch[1] = xi

        @pl.when(j >= j_in - 1)
        def _():
            jo = jnp.maximum(j - (j_in - 1), 0)
            out_ref[:] = scratch[:, pl.ds(jo * chunk_out, chunk_out), :]

    scratch_shapes = [pltpu.VMEM((2, rows_block, 128), np.float32)]
    if const_table is None:

        def kernel(in_ref, out_ref, scratch):
            body(in_ref, out_ref, scratch, None)

        in_specs = [in_spec]
    else:

        def kernel(in_ref, const_ref, out_ref, scratch):
            body(in_ref, out_ref, scratch, const_ref)

        in_specs = [
            in_spec,
            pl.BlockSpec(
                const_table.shape, lambda i, j: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]

    call = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((2, rows_total, 128), np.float32),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        interpret=interpret,
    )

    def run(state: jax.Array) -> jax.Array:
        x = state.reshape(2, rows_total, 128)
        y = call(x) if const_table is None else call(x, const_table)
        return y.reshape(2, 1 << n)

    return run


def build_segmented_run(
    circuit: Circuit,
    rdtype: np.dtype = np.float32,
    *,
    local_bits: int = DEFAULT_LOCAL_BITS,
    interpret: bool = False,
) -> Callable[[jax.Array], jax.Array]:
    """Compile ``circuit`` into the gather-segment kernel pipeline.

    Returns a jitted (2, 2^n) planes-state -> planes-state function.
    """
    n = circuit.num_qubits
    if np.dtype(rdtype) != np.float32:
        raise ValueError("the segmented path is float32-only")
    local_bits = min(local_bits, n - 1)
    if not (SWAP_HEADROOM <= local_bits < n <= MAX_SEGMENTED_QUBITS):
        raise ValueError(
            f"segmented path expects {SWAP_HEADROOM} <= local_bits < n <= "
            f"{MAX_SEGMENTED_QUBITS}, got local_bits={local_bits}, n={n}"
        )
    # Production blocks stage evictions into the top-4 row bits so gather
    # chunks stay >= 32 rows (32 KB DMAs — measured at plain-read rate;
    # 8-row chunks measured ~2x slower end-to-end). Tiny test blocks
    # (local_bits < 13) fall back to standalone permutes.
    if local_bits >= 13:
        stage_min = max(GATHER_SWAP_MIN, local_bits - 4)
        segments, restore = plan_segments(
            circuit, local_bits, swap_min=LANE_BITS, stage_min=stage_min
        )
    else:
        segments, restore = plan_segments(
            circuit, local_bits, swap_min=LANE_BITS
        )
    identity = tuple(range(n))
    # fold the restore into the last segment's output scatter when its
    # chunks clear the tile floor (always true in production: relocations
    # only ever touch bits >= GATHER_SWAP_MIN)
    fold_restore = (
        restore != identity
        and _gather_chunk_bits(restore, local_bits) >= MIN_GATHER_CHUNK_BITS
    )

    plan: list[tuple[tuple[int, ...] | None, Callable]] = []
    for idx, seg in enumerate(segments):
        src = seg.perm_src
        gather_ok = src is not None and (
            _gather_chunk_bits(src, local_bits) >= MIN_GATHER_CHUNK_BITS
        )
        pre = None if (src is None or gather_ok) else src
        gather_src = src if gather_ok else None
        if fold_restore and idx == len(segments) - 1:
            kernel = _build_scatter_segment_kernel(
                seg.gates, n, local_bits, interpret, gather_src, restore
            )
        else:
            kernel = _build_segment_kernel(
                seg.gates, n, local_bits, interpret, gather_src=gather_src
            )
        plan.append((pre, kernel))

    def run(state: jax.Array) -> jax.Array:
        for pre_permute, kernel in plan:
            if pre_permute is not None:
                state = ap.permute_qubits(state, pre_permute)
            state = kernel(state)
        if restore != identity and not fold_restore:
            state = ap.permute_qubits(state, restore)
        return state

    # no donation: see fused_circuit.build_pallas_run (perf-neutral,
    # and it would invalidate non-simulator callers' buffers)
    return jax.jit(run)
