"""Whole-circuit VMEM-resident Pallas kernel.

One ``pallas_call`` executes an entire circuit with the state held in VMEM:
HBM traffic is 2 passes total (load + store) instead of 2 passes *per fused
group* on the XLA path — the decisive factor identified in SURVEY §7.3
("multi-gate fusion ... one HBM round-trip per fusion group is the headline
engineering problem").

Layout: the (2, 2^n) planes state is viewed as two (R, 128) f32 matrices
(R = 2^(n-7)); lane index = qubits 0..6, row index bit j = qubit 7+j. Each
gate is emitted as a sum of **XOR-shift variants**

    new[i] = sum_{v in {0,1}^k} C_v(i) * x[i ^ spread(v)]

where ``spread(v)`` places v's bits on the gate's qubits and ``C_v(i) =
U[bits_Q(i), bits_Q(i) ^ v]`` depends only on i's bits at the gate qubits:

* lane-qubit shifts are XOR lane shuffles: ``where(bit==0, roll(x, -d),
  roll(x, +d))`` on the 128-lane axis (VPU, no relayout);
* row-qubit shifts are a leading-axis reshape exposing the bit + a flip
  (leading-dim reshapes are layout-free on TPU);
* coefficient masks are built from iota bit tests and take at most 2^k
  distinct values; zero terms are elided at trace time (an X gate is one
  shuffle, a diagonal gate is one multiply).

This replaces the three CUDA regimes of the reference (pair-index global
kernels src/Gates.cu:19-25, shared-memory tiles src/OptimizedGates.cu:41-114,
and the fused diagonal layer :344-382) with a single uniform scheme that is
branch-free and transpose-free.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..circuit import Circuit
from ..gates import gate_matrix

LANE_BITS = 7          # qubits 0..6 live on the 128-lane axis
LANES = 1 << LANE_BITS

# Ceiling set by Mosaic compile time, not VMEM: kernel compile scales
# superlinearly with the per-op tile count (measured: 12q 1.5s, 16q 26s,
# 19q >17min through the remote compiler). 17q keeps compiles in the tens
# of seconds; larger states route through the segmented grid path, whose
# per-block shapes stay in this regime regardless of n.
MAX_PALLAS_QUBITS = 17              # default policy ceiling (compile time)
HARD_MAX_PALLAS_QUBITS = 20         # VMEM bound: beyond this compiles OOM
MIN_PALLAS_QUBITS = LANE_BITS + 3   # need a few row bits to be worthwhile


def _xor_shift(x: jax.Array, qubit: int, n: int, interpret: bool) -> jax.Array:
    """y[i] = x[i ^ (1 << qubit)] on an (R, 128) view."""
    if qubit < LANE_BITS:
        d = 1 << qubit
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        bit0 = (lane & d) == 0
        if interpret:
            fwd = jnp.roll(x, -d, axis=1)
            bwd = jnp.roll(x, d, axis=1)
        else:
            # pltpu.roll requires non-negative shifts; -d mod 128 is the same
            # lane rotation.
            fwd = pltpu.roll(x, LANES - d, 1)
            bwd = pltpu.roll(x, d, 1)
        return jnp.where(bit0, fwd, bwd)
    # row bit: expose it with a leading-dim reshape and flip
    rb = qubit - LANE_BITS                    # bit rb of the row index
    rows = x.shape[0]
    a = rows >> (rb + 1)                      # high rows
    b = 1 << rb                               # low rows
    xr = x.reshape(a, 2, b * LANES)
    xr = jnp.stack([xr[:, 1], xr[:, 0]], axis=1)
    return xr.reshape(rows, LANES)


def _bit_mask(shape: tuple[int, int], qubit: int) -> jax.Array:
    """Boolean (R, 128): bit ``qubit`` of the flat amplitude index."""
    if qubit < LANE_BITS:
        lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        return (lane & (1 << qubit)) != 0
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    return (row & (1 << (qubit - LANE_BITS))) != 0


def _coeff_array(
    values: np.ndarray,
    qubits: Sequence[int],
    shape: tuple[int, int],
    dtype,
) -> jax.Array | float:
    """Broadcast C_v over the state: values[b] is the coefficient when the
    gate qubits spell assignment b (qubits[0] = MSB). Constant-folds when all
    values coincide. Bit masks are rebuilt from iota at every use — they are
    VPU-free after fusion, whereas caching them would pin O(qubits) full-size
    arrays in VMEM for the whole kernel."""
    if np.all(values == values[0]):
        return float(values[0])
    k = len(qubits)
    acc = jnp.full(shape, float(values[0]), dtype=dtype)
    for b in range(1, 1 << k):
        if values[b] == values[0]:
            continue
        cond = None
        for j, q in enumerate(qubits):
            want = (b >> (k - 1 - j)) & 1
            m = _bit_mask(shape, q)
            m = m if want else ~m
            cond = m if cond is None else cond & m
        acc = jnp.where(cond, float(values[b]), acc)
    return acc


def _emit_gate(
    xr: jax.Array,
    xi: jax.Array,
    u: np.ndarray,
    qubits: tuple[int, ...],
    n: int,
    interpret: bool,
) -> tuple[jax.Array, jax.Array]:
    """Emit one k-qubit gate as XOR-shift variants. ``qubits[0]`` = matrix
    MSB (library convention).

    (A direct block-arithmetic variant for row-bit-only gates was measured
    and reverted: Mosaic relayouts on the stacked sub-blocks cost more than
    the mask/where scheme it replaced.)
    """
    return _emit_gate_generic(xr, xi, u, qubits, n, interpret)


def _emit_gate_generic(
    xr: jax.Array,
    xi: jax.Array,
    u: np.ndarray,
    qubits: tuple[int, ...],
    n: int,
    interpret: bool,
) -> tuple[jax.Array, jax.Array]:
    k = len(qubits)
    dim = 1 << k
    shape = xr.shape
    dtype = xr.dtype

    acc_r = None
    acc_i = None
    for v in range(dim):
        # C_v[b] = U[b, b ^ v] for each assignment b of the gate qubits
        col = np.array([u[b, b ^ v] for b in range(dim)])
        if np.all(col == 0):
            continue
        # shift x by v across the gate qubits (qubit j holds bit k-1-j of v)
        sr, si = xr, xi
        for j, q in enumerate(qubits):
            if (v >> (k - 1 - j)) & 1:
                sr = _xor_shift(sr, q, n, interpret)
                si = _xor_shift(si, q, n, interpret)
        cr = _coeff_array(col.real, qubits, shape, dtype)
        ci = _coeff_array(col.imag, qubits, shape, dtype)
        has_re = not (isinstance(cr, float) and cr == 0.0)
        has_im = not (isinstance(ci, float) and ci == 0.0)
        tr = ti = None
        if has_re:
            tr = cr * sr if not (isinstance(cr, float) and cr == 1.0) else sr
            ti = cr * si if not (isinstance(cr, float) and cr == 1.0) else si
        if has_im:
            tr = (tr if tr is not None else 0.0) - ci * si
            ti = (ti if ti is not None else 0.0) + ci * sr
        acc_r = tr if acc_r is None else acc_r + tr
        acc_i = ti if acc_i is None else acc_i + ti
    return acc_r, acc_i


def build_pallas_run(
    circuit: Circuit,
    rdtype: np.dtype = np.float32,
    *,
    interpret: bool = False,
) -> Callable[[jax.Array], jax.Array]:
    """Compile ``circuit`` into a single VMEM-resident Pallas kernel.

    Returns a jitted (2, 2^n) planes-state -> planes-state function.
    """
    n = circuit.num_qubits
    if np.dtype(rdtype) != np.float32:
        raise ValueError("the Pallas kernel is float32-only")
    if not (MIN_PALLAS_QUBITS <= n <= HARD_MAX_PALLAS_QUBITS):
        raise ValueError(
            f"Pallas path supports {MIN_PALLAS_QUBITS}.."
            f"{HARD_MAX_PALLAS_QUBITS} qubits, got {n}"
        )
    rows = 1 << (n - LANE_BITS)
    gate_list = [
        (gate_matrix(g.name, g.param).astype(np.complex128), g.qubits)
        for g in circuit.gates
    ]

    def kernel(in_ref, out_ref):
        xr = in_ref[0]
        xi = in_ref[1]
        for u, qubits in gate_list:
            xr, xi = _emit_gate(xr, xi, u, qubits, n, interpret)
        out_ref[0] = xr
        out_ref[1] = xi

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((2, rows, LANES), np.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        input_output_aliases={0: 0},
        interpret=interpret,
    )

    # NOTE: no donate_argnums here. It was measured on-chip as perf-neutral
    # (the pallas_call's input_output_aliases already covers the in-kernel
    # update) and donation invalidates the caller's buffer — a footgun for
    # benchmark loops and any non-simulator caller that reuses its input.
    @jax.jit
    def run(state: jax.Array) -> jax.Array:
        x = state.reshape(2, rows, LANES)
        y = call(x)
        return y.reshape(2, 1 << n)

    return run
