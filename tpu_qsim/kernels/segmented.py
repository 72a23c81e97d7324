"""Segmented grid-kernel executor for states larger than VMEM (n > 20).

Pipeline per circuit (planned by :mod:`tpu_qsim.schedule`):

    [permute] -> segment kernel -> [permute] -> segment kernel -> ... -> restore

Each segment kernel is a grid ``pallas_call``: the grid ranges over the high
(block-index) bits, every program DMAs one 2^local_bits-amplitude block
HBM -> VMEM, applies the *entire segment* with the XOR-shift scheme of
:mod:`tpu_qsim.kernels.fused_circuit`, and writes back — two HBM passes per
segment instead of two per fused gate group. Permutations are tile-dense
qubit relabelings (:func:`tpu_qsim.apply.permute_qubits`).
"""

from __future__ import annotations

from typing import Callable

import numpy as np

import jax
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
SWAP_HEADROOM = 10  # planner needs local_bits - SWAP_MIN >= 3 victim slots


def _build_segment_kernel(
    gates: list,
    n: int,
    local_bits: int,
    interpret: bool,
) -> Callable[[jax.Array], jax.Array]:
    rows_total = 1 << (n - LANE_BITS)
    rows_block = 1 << (local_bits - LANE_BITS)
    grid = 1 << (n - local_bits)
    ops, const_table = materialize_ops(gates)

    spec = pl.BlockSpec(
        (2, rows_block, 128),
        lambda i: (0, i, 0),
        memory_space=pltpu.VMEM,
    )
    if const_table is None:

        def kernel(in_ref, out_ref):
            xr, xi = emit_ops(
                in_ref[0], in_ref[1], ops, local_bits, interpret
            )
            out_ref[0] = xr
            out_ref[1] = xi

        in_specs = [spec]
    else:

        def kernel(in_ref, const_ref, out_ref):
            xr, xi = emit_ops(
                in_ref[0], in_ref[1], ops, local_bits, interpret, const_ref
            )
            out_ref[0] = xr
            out_ref[1] = xi

        # constants: same full table every grid step (stays VMEM-resident)
        in_specs = [
            spec,
            pl.BlockSpec(
                const_table.shape,
                lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]

    call = pl.pallas_call(
        kernel,
        grid=(grid,),
        out_shape=jax.ShapeDtypeStruct((2, rows_total, 128), np.float32),
        in_specs=in_specs,
        out_specs=spec,
        input_output_aliases={0: 0},
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
    """Compile ``circuit`` into the permute/segment-kernel pipeline.

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
    segments, restore = plan_segments(circuit, local_bits)
    kernels = [
        (seg.perm_src, _build_segment_kernel(seg.gates, n, local_bits, interpret))
        for seg in segments
    ]
    identity = tuple(range(n))

    def run(state: jax.Array) -> jax.Array:
        for perm_src, kernel in kernels:
            if perm_src is not None:
                state = ap.permute_qubits(state, perm_src)
            state = kernel(state)
        if restore != identity:
            state = ap.permute_qubits(state, restore)
        return state

    # no donation: see fused_circuit.build_pallas_run (perf-neutral,
    # and it would invalidate non-simulator callers' buffers)
    return jax.jit(run)
