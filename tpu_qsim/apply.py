"""Core gate-application engine for the XLA path.

TPU-native state representation: **flat split real/imaginary planes**. The
state is one real array of shape ``(2, 2^n)`` — axis 0 is the [real, imag]
plane, axis 1 the flat amplitude index with qubit ``q`` at bit ``q``
(little-endian, see :mod:`tpu_qsim.gates`). Complex arithmetic is written out
in real ops.

Why not ``complex64``: TPU compute units are real (MXU/VPU), Pallas/Mosaic
has no complex dtype, and the deployed TPU runtime rejects complex programs
outright. Splitting planes ourselves keeps one representation across the XLA
path, the Pallas kernels and the sharded path — and skips the imaginary half
of the work for real gate matrices (H, X, CNOT, ...), which XLA cannot know
on its own.

Why flat and not a ``(2,)*n`` tensor: TPU layouts tile the two minor-most
dimensions to (8, 128); a rank-n tensor of 2s gets padded ~256x and every op
turns into a relayout. All engine ops therefore keep the trailing dimension
large: gates reshape the flat state into at most ``2k+2`` merged segments
(each contiguous run of non-target qubits is one axis), matricize with a
single transpose, and hit the MXU with a ``(2^k, 2^k) @ (2^k, rest)``
contraction — the TPU replacement for the reference's per-gate CUDA kernels
(reference src/Gates.cu:31-412). Index masks (measurement, collapse) are flat
iota bit-arithmetic, never high-rank broadcasts.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

# f32 matmuls on TPU default to bf16 MXU passes; amplitudes need the full
# mantissa, so every contraction pins the highest available precision.
PRECISION = lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Host <-> device representation
# ---------------------------------------------------------------------------

def num_qubits_of(state: jax.Array) -> int:
    return int(state.shape[-1]).bit_length() - 1


def to_complex(state: jax.Array) -> np.ndarray:
    """Device planes -> host complex (readback boundary only)."""
    flat = np.asarray(state)
    ctype = np.complex64 if flat.dtype == np.float32 else np.complex128
    return (flat[0] + 1j * flat[1]).astype(ctype)


def from_complex(amplitudes: np.ndarray, rdtype) -> jax.Array:
    """Host complex -> device planes (2, 2^n)."""
    amplitudes = np.asarray(amplitudes).reshape(-1)
    return jnp.asarray(
        np.stack([amplitudes.real, amplitudes.imag]).astype(rdtype)
    )


def split_matrix(mat: np.ndarray, rdtype) -> tuple[np.ndarray, np.ndarray | None]:
    """Split a complex matrix into (real, imag-or-None) host constants."""
    ur = np.ascontiguousarray(mat.real.astype(rdtype))
    if np.any(mat.imag != 0.0):
        return ur, np.ascontiguousarray(mat.imag.astype(rdtype))
    return ur, None


def initial_state(num_qubits: int, rdtype, index: int = 0) -> jax.Array:
    """|index> as (2, 2^n) planes (replaces initializeZero/BasisKernel,
    reference src/StateVector.cu:24-39)."""
    dim = 1 << num_qubits
    return jnp.zeros((2, dim), dtype=rdtype).at[0, index].set(1.0)


# ---------------------------------------------------------------------------
# Segment-reshape machinery
# ---------------------------------------------------------------------------

def _segments(n: int, qubits: tuple[int, ...]) -> tuple[list[int], dict[int, int]]:
    """Reshape plan: split the 2^n flat axis so each target qubit has its own
    size-2 axis and every contiguous run of non-target qubits is one merged
    axis. Returns (shape, {qubit: axis}). Axis 0 is the MSB side.
    """
    tpos = {n - 1 - q: q for q in qubits}  # position from left -> qubit
    shape: list[int] = []
    ax_of_qubit: dict[int, int] = {}
    i = 0
    while i < n:
        if i in tpos:
            ax_of_qubit[tpos[i]] = len(shape)
            shape.append(2)
            i += 1
        else:
            j = i
            while j < n and j not in tpos:
                j += 1
            shape.append(1 << (j - i))
            i = j
    return shape, ax_of_qubit


def apply_unitary(
    state: jax.Array,
    ur: np.ndarray | jax.Array,
    ui: np.ndarray | jax.Array | None,
    qubits: tuple[int, ...],
) -> jax.Array:
    """Apply a dense k-qubit unitary U = ur + i*ui to (2, 2^n) planes.

    ``qubits[0]`` is the matrix-index MSB. One transpose in, one MXU
    contraction (batched over the planes), one transpose out. Real U
    (ui None) costs a single batched matmul for both planes.
    """
    n = num_qubits_of(state)
    k = len(qubits)
    shape, axmap = _segments(n, qubits)
    x = state.reshape([2] + shape)
    taxes = [1 + axmap[q] for q in qubits]           # axes in matrix-bit order
    rest = [a for a in range(x.ndim) if a != 0 and a not in taxes]
    # TPU layout rule: the two minor-most dims are tiled to (8, 128), so small
    # trailing dims are padded up to 64x in materialized transposes. Order the
    # untouched segments by ascending size so the largest segments land
    # minor-most — this keeps every intermediate tile-dense.
    rest = sorted(rest, key=lambda a: x.shape[a])
    # Plane axis goes right after the targets so the 2D matricization has
    # column index = plane * R + rest: a plain (2^k, 2^k) @ (2^k, 2R) matmul.
    # (A plane-batched dot_general here compiles ~100x slower on TPU.)
    perm = taxes + [0] + rest
    xt = x.transpose(perm)
    tshape = xt.shape
    xt = xt.reshape(1 << k, -1)                      # (2^k, 2R), [re | im] cols

    yr = jnp.einsum("ij,jr->ir", jnp.asarray(ur), xt, precision=PRECISION)
    if ui is None:
        y = yr
    else:
        half = xt.shape[1] // 2
        yi = jnp.einsum("ij,jr->ir", jnp.asarray(ui), xt, precision=PRECISION)
        y = jnp.concatenate(
            [yr[:, :half] - yi[:, half:], yr[:, half:] + yi[:, :half]], axis=1
        )

    y = y.reshape(tshape).transpose(np.argsort(perm))
    return y.reshape(2, 1 << n)


def apply_diagonal(
    state: jax.Array,
    dr: np.ndarray | jax.Array,
    di: np.ndarray | jax.Array | None,
    qubits: tuple[int, ...],
) -> jax.Array:
    """Apply a diagonal k-qubit unitary given its (2^k,) diagonal d = dr+i*di.

    Pure broadcast multiply on the segment reshape — no transpose, no matmul;
    XLA fuses it into neighbors (the analog of the reference's fused
    diagonal-layer kernel, src/OptimizedGates.cu:344-382).
    """
    n = num_qubits_of(state)
    k = len(qubits)
    shape, axmap = _segments(n, qubits)
    x = state.reshape([2] + shape)

    # Build the broadcastable diagonal: axis j of the (2,)*k diag tensor
    # belongs to qubits[j]; place each on its segment axis.
    bshape = [1] * x.ndim
    for q in qubits:
        bshape[1 + axmap[q]] = 2
    # Transpose diag tensor axes into segment-axis order.
    order = sorted(range(k), key=lambda j: axmap[qubits[j]])
    dt_r = jnp.asarray(dr).reshape((2,) * k).transpose(order).reshape(bshape)
    if di is None:
        y = x * dt_r
    else:
        dt_i = jnp.asarray(di).reshape((2,) * k).transpose(order).reshape(bshape)
        re, im = x[0], x[1]
        y = jnp.stack([re * dt_r[0] - im * dt_i[0], im * dt_r[0] + re * dt_i[0]])
    return y.reshape(2, 1 << n)


# ---------------------------------------------------------------------------
# Readout / measurement primitives (flat, iota-based masks)
# ---------------------------------------------------------------------------

def probabilities(state: jax.Array) -> jax.Array:
    """|amplitude|^2 (2^n,) (replaces reference probabilityKernel,
    src/StateVector.cu:41-48)."""
    return state[0] * state[0] + state[1] * state[1]


def total_probability(state: jax.Array) -> jax.Array:
    return jnp.sum(state * state)


def permute_qubits(state: jax.Array, src: tuple[int, ...]) -> jax.Array:
    """Relabel index bits: new index bit ``i`` = old index bit ``src[i]``.

    The data-movement primitive behind segmented >VMEM execution (qubit
    relocation, the VMEM-blocking analog of the distributed state-vector
    literature's pair-exchange qubit swaps). Constraints: ``src`` is a
    permutation of range(n) and bits 0..6 are fixed (``src[i] == i`` for
    i < 7) so the 128-lane axis never moves — the transpose then keeps a
    (>=8, 128) tile-dense minor block and pays no layout padding.
    """
    n = num_qubits_of(state)
    moved = [i for i in range(n) if src[i] != i]
    if not moved:
        return state
    if min(moved) < LANE_FIXED_BITS:
        raise ValueError(f"cannot move lane bits (<{LANE_FIXED_BITS}): {moved}")
    if sorted(src) != list(range(n)):
        raise ValueError("src must be a permutation of range(n)")

    moved_set = set(moved)
    # Build the old-layout shape: walk bit positions MSB->LSB, exposing moved
    # bits, merging fixed runs. The bottom run (contains bits 0..6) is split
    # into (X, 128) so the two minor dims stay tile-dense through the copy.
    shape: list[int] = []
    axis_of_bit: dict[int, int] = {}
    slot_axis: list[int | None] = []  # per shape axis: exposed bit or None
    i = n - 1
    while i >= 0:
        if i in moved_set:
            axis_of_bit[i] = len(shape)
            slot_axis.append(i)
            shape.append(2)
            i -= 1
        else:
            j = i
            while j >= 0 and j not in moved_set:
                j -= 1
            slot_axis.append(None)
            shape.append(1 << (i - j))
            i = j
    # split bottom run (>= 2^7 since lanes are fixed)
    bottom = shape.pop()
    slot_axis.pop()
    shape.extend([bottom // 128, 128])
    slot_axis.extend([None, None])

    x = state.reshape([2] + shape)
    # axis k of x (k>=1) corresponds to shape[k-1]; build transpose: the slot
    # that held exposed bit b must now take the old axis of bit src-of-b.
    # src maps new->old; slot for new bit b is the old slot of bit b (the
    # moved set is closed under the permutation).
    perm = [0] + [
        (1 + axis_of_bit[src[b]]) if b is not None else 1 + k
        for k, b in enumerate(slot_axis)
    ]
    y = x.transpose(perm)
    return y.reshape(2, 1 << n)


LANE_FIXED_BITS = 7


def inner_product(a: jax.Array, b: jax.Array) -> tuple[jax.Array, jax.Array]:
    """<a|b> = (re, im) from two planes states."""
    ar, ai = a[0], a[1]
    br, bi = b[0], b[1]
    re = jnp.sum(ar * br + ai * bi)
    im = jnp.sum(ar * bi - ai * br)
    return re, im


def _bit_mask(n: int, qubit: int, dtype) -> jax.Array:
    """Flat (2^n,) 0/1 vector: bit ``qubit`` of each index."""
    idx = lax.broadcasted_iota(jnp.int32, (1 << n,), 0)
    return ((idx >> qubit) & 1).astype(dtype)


def qubit_marginal(state: jax.Array, qubit: int) -> jax.Array:
    """P(qubit = 1) via an on-device reduction (replaces the reference's
    full D2H + host loop, src/StateVector.cu:275-287)."""
    n = num_qubits_of(state)
    p = probabilities(state)
    return jnp.sum(p * _bit_mask(n, qubit, p.dtype))


def collapse(
    state: jax.Array, qubit: int, outcome: jax.Array, p_outcome: jax.Array
) -> jax.Array:
    """Project onto ``qubit == outcome`` and renormalize (flat mask —
    replaces reference collapseStateKernel, src/StateVector.cu:105-124)."""
    n = num_qubits_of(state)
    bit = _bit_mask(n, qubit, jnp.int32)
    keep = (bit == outcome.astype(jnp.int32))[None, :]
    norm = lax.rsqrt(jnp.maximum(p_outcome, jnp.finfo(state.dtype).tiny))
    return jnp.where(keep, state * norm.astype(state.dtype), 0.0)
