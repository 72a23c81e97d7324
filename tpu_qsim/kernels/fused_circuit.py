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
from ..gates import op_matrix

LANE_BITS = 7          # qubits 0..6 live on the 128-lane axis
LANES = 1 << LANE_BITS

# external-bit tokens: qubit ids >= EXT_BASE + p denote out-of-kernel state
# bit p, resolved from a per-call/per-step scalar (sweep/segment kernels)
EXT_BASE = 64

# Ceiling set by Mosaic compile time, not VMEM: kernel compile scales
# superlinearly with the per-op tile count (round-1 generic emission:
# 12q 1.5s, 16q 26s, 19q >17min through the remote compiler; the v2
# window/half-plane emission compiles 18q in ~22s and runs 20% faster than
# the segmented path there). Larger states route through the segmented grid
# path, whose per-block shapes stay in this regime regardless of n.
MAX_PALLAS_QUBITS = 19              # default policy ceiling: 19q compiles
# in ~18 s with the v4 emission + 100 MB kernel budget and runs 6% faster
# than the segmented grid (0.167 vs 0.178 ms); at 20q the whole-circuit
# form LOSES (0.375 vs 0.283 ms — per-call operand staging is additive
# while the grid pipeline overlaps it), so the ceiling stays below 20.
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
    rb = qubit - LANE_BITS                    # bit rb of the row index
    rows = x.shape[0]
    if rb < 3:
        # Sublane-regime row bits: the exposing reshape would put a 2 (or a
        # <8 run) in the sublane tile position and relayout (measured ~4x
        # cost). A full-axis roll + bit select is exact for XOR shifts
        # (same identity as the lane path) and stays tile-dense.
        d = 1 << rb
        row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        bit0 = (row & d) == 0
        if interpret:
            fwd = jnp.roll(x, -d, axis=0)
            bwd = jnp.roll(x, d, axis=0)
        else:
            fwd = pltpu.roll(x, rows - d, 0)
            bwd = pltpu.roll(x, d, 0)
        return jnp.where(bit0, fwd, bwd)
    # high row bit: expose it with a leading-dim reshape and swap the
    # size-2 axis
    a = rows >> (rb + 1)                      # high rows
    b = 1 << rb                               # low rows
    v = x.reshape(a, 2, b, LANES)
    return _swap2(v, 1).reshape(rows, LANES)


def _bit_mask(shape: tuple[int, int], qubit: int, ext=None):
    """Boolean (R, 128): bit ``qubit`` of the flat amplitude index.

    ``ext`` (sweep kernels) maps out-of-kernel qubit ids to traced 0/1
    scalars — bits of the amplitude index that are CONSTANT for the current
    kernel invocation (the map-step / chunk index of
    :mod:`tpu_qsim.kernels.sweeps`). For those, the "mask" is a scalar bool
    that broadcasts through every downstream where/select."""
    if ext is not None and qubit in ext:
        return ext[qubit] != 0
    # minimal broadcastable shapes: a (R,1) / (1,128) mask costs 128x / Rx
    # less to build than a full (R,128) one and fuses identically downstream
    if qubit < LANE_BITS:
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, shape[1]), 1)
        return (lane & (1 << qubit)) != 0
    row = jax.lax.broadcasted_iota(jnp.int32, (shape[0], 1), 0)
    return (row & (1 << (qubit - LANE_BITS))) != 0


def _coeff_array(
    values: np.ndarray,
    qubits: Sequence[int],
    shape: tuple[int, int],
    dtype,
    ext=None,
) -> jax.Array | float:
    """Broadcast C_v over the state: values[b] is the coefficient when the
    gate qubits spell assignment b (qubits[0] = MSB). Constant-folds when all
    values coincide. Bit masks are rebuilt from iota at every use — they are
    VPU-free after fusion, whereas caching them would pin O(qubits) full-size
    arrays in VMEM for the whole kernel. External qubits (``ext``) contribute
    scalar conditions that broadcast."""
    if np.all(values == values[0]):
        return float(values[0])
    k = len(qubits)
    # start from a (1,1) seed: the where-chain broadcasts only as far as the
    # participating masks' shapes require ((R,1), (1,128), or full)
    acc = jnp.full((1, 1), float(values[0]), dtype=dtype)
    for b in range(1, 1 << k):
        if values[b] == values[0]:
            continue
        cond = None
        for j, q in enumerate(qubits):
            want = (b >> (k - 1 - j)) & 1
            m = _bit_mask(shape, q, ext)
            m = m if want else ~m
            cond = m if cond is None else cond & m
        acc = jnp.where(cond, float(values[b]), acc)
    return acc


def _acc(
    acc_r,
    acc_i,
    coeff: complex,
    sr: jax.Array,
    si: jax.Array,
):
    """acc += coeff * (sr + i*si), with zero/±1 coefficient elision."""
    cr = float(np.real(coeff))
    ci = float(np.imag(coeff))
    if cr != 0.0:
        tr = sr if cr == 1.0 else (-sr if cr == -1.0 else cr * sr)
        ti = si if cr == 1.0 else (-si if cr == -1.0 else cr * si)
        acc_r = tr if acc_r is None else acc_r + tr
        acc_i = ti if acc_i is None else acc_i + ti
    if ci != 0.0:
        tr = -si if ci == 1.0 else (si if ci == -1.0 else -ci * si)
        ti = sr if ci == 1.0 else (-sr if ci == -1.0 else ci * sr)
        acc_r = tr if acc_r is None else acc_r + tr
        acc_i = ti if acc_i is None else acc_i + ti
    return acc_r, acc_i


# Direct block arithmetic needs the exposed row bit to sit above the (8, 128)
# tile: with bit rb exposed, the minor dims of each half/quadrant are
# (2^rb_low, 128), which is tile-dense only for rb_low >= 3. Below that the
# slices relayout (measured: q8/q9 gates cost ~4x q10+ on the reshape-stack
# scheme for the same reason) and the XOR-shift scheme wins.
_DIRECT_ROW_MIN = LANE_BITS + 3

_SWAP_U = np.array(
    [[1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]],
    dtype=np.complex128,
)


def _swap2(v: jax.Array, axis: int) -> jax.Array:
    """Exchange the two halves of a size-2 axis (lax.rev has no Mosaic
    lowering; a leading-axis slice pair + concatenate does)."""
    lo = jax.lax.slice_in_dim(v, 0, 1, axis=axis)
    hi = jax.lax.slice_in_dim(v, 1, 2, axis=axis)
    return jax.lax.concatenate([hi, lo], dimension=axis)


def _axis_const(values, shape: tuple[int, ...], axis: int):
    """Per-half coefficient broadcast: a tiny (1,..,2,..,1) array selecting
    values[h] on half h of ``axis``. Constant-folds when equal; built from
    an iota-compare so no array constant is captured."""
    v0, v1 = float(values[0]), float(values[1])
    if v0 == v1:
        return v0
    bshape = tuple(2 if d == axis else 1 for d in range(len(shape)))
    h = jax.lax.broadcasted_iota(jnp.int32, bshape, axis)
    return jnp.where(h == 1, jnp.float32(v1), jnp.float32(v0))


def _bc_terms(acc_r, acc_i, cr, ci, sr, si):
    """acc += (cr + i*ci) * (sr + i*si) where cr/ci are floats or broadcast
    arrays; zero/unit float coefficients are elided."""

    def mul(c, x):
        if isinstance(c, float):
            if c == 0.0:
                return None
            if c == 1.0:
                return x
            if c == -1.0:
                return -x
        return c * x

    def add(a, t):
        if t is None:
            return a
        return t if a is None else a + t

    is_zero_f = lambda c: isinstance(c, float) and c == 0.0  # noqa: E731
    if not is_zero_f(cr):
        acc_r = add(acc_r, mul(cr, sr))
        acc_i = add(acc_i, mul(cr, si))
    if not is_zero_f(ci):
        t = mul(ci, si)
        acc_r = add(acc_r, None if t is None else -t)
        acc_i = add(acc_i, mul(ci, sr))
    return acc_r, acc_i


def _emit_1q_row(
    xr: jax.Array, xi: jax.Array, u: np.ndarray, q: int
) -> tuple[jax.Array, jax.Array]:
    """1q gate on a high row bit, slicing-free: view the plane as
    (a, 2, b, 128) with the gate bit exposed on axis 1, fetch the partner
    half with a single axis reversal, and combine with per-half broadcast
    coefficients:

        y = diag_h * x + off_h * rev(x),   diag_h = u[h,h], off_h = u[h,1-h]

    ~1 data-movement pass + the arithmetic, vs the previous half-slice +
    restack scheme whose slice/concatenate plumbing dominated the jaxpr
    (~9 plane-touches per gate). The reference's analog is the pair-update
    kernel (src/Gates.cu:31-104), one thread per pair."""
    rows = xr.shape[0]
    rb = q - LANE_BITS
    a = rows >> (rb + 1)
    b = 1 << rb
    shape = (a, 2, b, LANES)
    vr = xr.reshape(shape)
    vi = xi.reshape(shape)

    dr = _axis_const((u[0, 0].real, u[1, 1].real), shape, 1)
    di = _axis_const((u[0, 0].imag, u[1, 1].imag), shape, 1)
    acc_r, acc_i = _bc_terms(None, None, dr, di, vr, vi)

    if u[0, 1] != 0 or u[1, 0] != 0:
        swr = _swap2(vr, 1)
        swi = _swap2(vi, 1)
        fr = _axis_const((u[0, 1].real, u[1, 0].real), shape, 1)
        fi = _axis_const((u[0, 1].imag, u[1, 0].imag), shape, 1)
        acc_r, acc_i = _bc_terms(acc_r, acc_i, fr, fi, swr, swi)

    z = None
    if acc_r is None or acc_i is None:
        z = jnp.zeros(shape, xr.dtype)
    acc_r = z if acc_r is None else acc_r
    acc_i = z if acc_i is None else acc_i
    return acc_r.reshape(rows, LANES), acc_i.reshape(rows, LANES)


def _grid_const(vals: np.ndarray, shape: tuple[int, ...], ax_hi: int, ax_lo: int):
    """(2,2) per-quadrant coefficient broadcast over two exposed axes."""
    if np.all(vals == vals[0, 0]):
        return float(vals[0, 0])
    bshape = tuple(
        2 if d in (ax_hi, ax_lo) else 1 for d in range(len(shape))
    )
    h = jax.lax.broadcasted_iota(jnp.int32, bshape, ax_hi)
    lo = jax.lax.broadcasted_iota(jnp.int32, bshape, ax_lo)
    v = [[jnp.float32(float(vals[i, j])) for j in (0, 1)] for i in (0, 1)]
    return jnp.where(
        h == 1,
        jnp.where(lo == 1, v[1][1], v[1][0]),
        jnp.where(lo == 1, v[0][1], v[0][0]),
    )


def _emit_2q_row(
    xr: jax.Array, xi: jax.Array, u: np.ndarray, qubits: tuple[int, ...]
) -> tuple[jax.Array, jax.Array]:
    """2q gate with both qubits on high row bits, slicing-free: both bits
    exposed as size-2 axes, the four XOR variants fetched by axis reversals,
    combined with per-quadrant broadcast coefficients (zero variants
    elided — CNOT keeps one reversal + a 2-value select, SWAP two)."""
    qa, qb = qubits  # qa = matrix-index MSB
    rows = xr.shape[0]
    rhi = max(qa, qb) - LANE_BITS
    rlo = min(qa, qb) - LANE_BITS
    a = rows >> (rhi + 1)
    b = 1 << (rhi - rlo - 1)
    c = 1 << rlo
    shape = (a, 2, b, 2, c, LANES)
    vr = xr.reshape(shape)
    vi = xi.reshape(shape)

    def m_of(h: int, lo: int) -> int:
        return (h << 1 | lo) if qa > qb else (lo << 1 | h)

    acc_r = acc_i = None
    for fhi in (0, 1):
        for flo in (0, 1):
            vals = np.array(
                [
                    [u[m_of(h, lo), m_of(h ^ fhi, lo ^ flo)] for lo in (0, 1)]
                    for h in (0, 1)
                ]
            )
            if not np.any(vals):
                continue
            sr, si = vr, vi
            for d, f in ((1, fhi), (3, flo)):
                if f:
                    sr = _swap2(sr, d)
                    si = _swap2(si, d)
            cr = _grid_const(vals.real, shape, 1, 3)
            ci = _grid_const(vals.imag, shape, 1, 3)
            acc_r, acc_i = _bc_terms(acc_r, acc_i, cr, ci, sr, si)

    z = None
    if acc_r is None or acc_i is None:
        z = jnp.zeros(shape, xr.dtype)
    acc_r = z if acc_r is None else acc_r
    acc_i = z if acc_i is None else acc_i
    return acc_r.reshape(rows, LANES), acc_i.reshape(rows, LANES)


# Window-matmul pass count. "highest" = XLA f32 (6 bf16 MXU passes);
# "bf16x3" = hand-split two-term product (3 passes, ~2x faster, ~1e-8-class
# absolute amplitude error per window on normalized states — Mosaic has no
# lowering for jax.lax.Precision.HIGH, so the split is explicit).
WINDOW_DOT = "highest"


def _win_dot(a: jax.Array, b: jax.Array) -> jax.Array:
    if WINDOW_DOT == "bf16x3":
        ah = a.astype(jnp.bfloat16)
        al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        bh = b.astype(jnp.bfloat16)
        bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
        d = lambda p, q: jnp.dot(  # noqa: E731
            p, q, preferred_element_type=jnp.float32
        )
        return d(ah, bh) + (d(ah, bl) + d(al, bh))
    return jnp.dot(
        a,
        b,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _emit_lane_window(
    xr: jax.Array,
    xi: jax.Array,
    wr: jax.Array,
    wi: jax.Array | None,
) -> tuple[jax.Array, jax.Array]:
    """A fused run of gates on lane qubits (0..6) as one (R,128)@(128,128)
    MXU contraction: y = x @ U^T (U composed on the host in complex128;
    ``wr``/``wi`` are the pre-transposed planes, read from the kernel's
    constant-table input).

    This is the TPU replacement for the reference's shared-memory tiled
    kernels (src/OptimizedGates.cu:41-114): the whole run costs one matmul
    regardless of how many gates it absorbed. Complex U uses the 3-multiply
    (Karatsuba) form.
    """
    dot = lambda x, w: _win_dot(x, w)  # noqa: E731
    if wi is None:
        return dot(xr, wr), dot(xi, wr)
    t1 = dot(xr, wr)
    t2 = dot(xi, wi)
    t3 = dot(xr + xi, wr + wi)
    return t1 - t2, t3 - t1 - t2


def _emit_top_window(
    xr: jax.Array,
    xi: jax.Array,
    wr: jax.Array,
    wi: jax.Array | None,
) -> tuple[jax.Array, jax.Array]:
    """A fused run of gates on the top 7 row bits as ONE leading-axis MXU
    contraction: view the (R, 128) plane as (128, R) — leading axis = the 7
    highest kernel bits — and compute y = U @ x (no slab loop; the reshape
    is layout-free on the leading dims and the matmul runs at the MXU
    roofline, measured ~29 TFLOP/s at f32-HIGHEST on a 21-bit kernel).

    This is the missing third window class the round-2 VERDICT identified:
    gates on kernel bits >= 14 — including the stacked active-top bits of
    high sweeps (kernels/sweeps.py) — previously ran as ~2-op VPU singles
    that dominated 26q wall-clock."""
    rows = xr.shape[0]

    def bdot(w, x):
        return _win_dot(w, x.reshape(LANES, rows)).reshape(rows, LANES)

    if wi is None:
        return bdot(wr, xr), bdot(wr, xi)
    t1 = bdot(wr, xr)
    t2 = bdot(wi, xi)
    t3 = bdot(wr + wi, xr + xi)
    return t1 - t2, t3 - t1 - t2


def _is_diagonal(u: np.ndarray) -> bool:
    return not np.any(u - np.diag(np.diagonal(u)))


def _controlled_split(u: np.ndarray) -> np.ndarray | None:
    """If u = block-diag(I, V) w.r.t. its MSB qubit (the library layout of
    cnot/cz/cry/crz/cp/toffoli), return V, else None."""
    d = u.shape[0] >> 1
    if (
        not np.any(u[:d, d:])
        and not np.any(u[d:, :d])
        and not np.any(u[:d, :d] - np.eye(d))
    ):
        return np.ascontiguousarray(u[d:, d:])
    return None


def _emit_gate(
    xr: jax.Array,
    xi: jax.Array,
    u: np.ndarray,
    qubits: tuple[int, ...],
    n: int,
    interpret: bool,
    ext=None,
) -> tuple[jax.Array, jax.Array]:
    """Emit one k-qubit gate, picking the cheapest scheme. ``qubits[0]`` =
    matrix MSB (library convention).

    * diagonal -> single coefficient multiply (XOR-shift degenerate case);
    * 1q / 2q on high row bits -> direct half-plane / quadrant arithmetic;
    * everything else (lane qubits, low row bits, mixed) -> XOR-shift
      variants.

    ``ext`` maps out-of-kernel qubit ids to traced 0/1 scalars (sweep
    kernels). A gate may involve external qubits only along axes where it is
    diagonal or controlled — the sweep planner guarantees every *moving*
    qubit is in-kernel.
    """
    k = len(qubits)
    has_ext = ext is not None and any(q in ext for q in qubits)
    if _is_diagonal(u) and not has_ext:
        # Diagonal gates on high row bits: direct half/quadrant scaling beats
        # the generic coefficient-plane path (~2 FMA/element vs building a
        # full (R,128) mask-select plane per distinct diagonal value).
        if k == 1 and qubits[0] >= _DIRECT_ROW_MIN:
            return _emit_1q_row(xr, xi, u, qubits[0])
        if k == 2 and min(qubits) >= _DIRECT_ROW_MIN:
            return _emit_2q_row(xr, xi, u, qubits)
    if not _is_diagonal(u):
        if has_ext:
            v = _controlled_split(u)
            if v is not None:
                if EXT_CTRL_COND and qubits[0] in ext:
                    # The control is an out-of-kernel bit: the predicate is
                    # a per-invocation SCALAR (step / program_id bit), so
                    # the sub-gate can branch away entirely (lax.cond ->
                    # scf.if) instead of compute-then-blend — the ~half of
                    # the blocks with control=0 skip the gate's plane-ops.
                    return jax.lax.cond(
                        ext[qubits[0]] != 0,
                        lambda a, b: _emit_gate(
                            a, b, v, qubits[1:], n, interpret, ext
                        ),
                        lambda a, b: (a, b),
                        xr,
                        xi,
                    )
                yr, yi = _emit_gate(xr, xi, v, qubits[1:], n, interpret, ext)
                ctrl = _bit_mask(xr.shape, qubits[0], ext)
                return jnp.where(ctrl, yr, xr), jnp.where(ctrl, yi, xi)
            raise ValueError(
                "gate moves an external qubit (sweep planner invariant broken)"
            )
        if k == 1 and qubits[0] >= _DIRECT_ROW_MIN:
            return _emit_1q_row(xr, xi, u, qubits[0])
        if k == 2 and min(qubits) >= _DIRECT_ROW_MIN:
            return _emit_2q_row(xr, xi, u, qubits)
        if k == 2 and not np.any(u - _SWAP_U):
            # SWAP as exchange-of-shifts: y = x[i^a^b] where the two bits
            # differ (2 shifts + 1 select vs 3 variant terms)
            qa, qb = qubits
            sr = _xor_shift(_xor_shift(xr, qa, n, interpret), qb, n, interpret)
            si = _xor_shift(_xor_shift(xi, qa, n, interpret), qb, n, interpret)
            differ = _bit_mask(xr.shape, qa) != _bit_mask(xr.shape, qb)
            return jnp.where(differ, sr, xr), jnp.where(differ, si, xi)
        if k >= 2:
            v = _controlled_split(u)
            if v is not None:
                q0 = qubits[0]
                if CTRL_SLAB_SLICE and q0 >= LANE_BITS + 3:
                    # Control on a high row bit: expose it as a leading
                    # axis and emit the sub-gate on the control=1 slab
                    # only. Gate bits below q0 keep their positions inside
                    # the half-size plane; row bits above q0 shift down
                    # one position when the control axis is sliced away,
                    # so they are relabeled (all emission helpers derive
                    # layout from the operand shape). Halves the
                    # sub-gate's plane-ops and replaces the 2-plane blend
                    # with a restack. b = 2^(q0-7) >= 8 keeps every
                    # boundary sublane-tile aligned.
                    rows = xr.shape[0]
                    rb = q0 - LANE_BITS
                    a = rows >> (rb + 1)
                    b = 1 << rb
                    vr = xr.reshape(a, 2, b, LANES)
                    vi = xi.reshape(a, 2, b, LANES)
                    yr, yi = _emit_gate(
                        vr[:, 1].reshape(a * b, LANES),
                        vi[:, 1].reshape(a * b, LANES),
                        v,
                        tuple(
                            qq - 1 if qq > q0 else qq for qq in qubits[1:]
                        ),
                        n - 1,
                        interpret,
                    )
                    outr = jnp.stack(
                        [vr[:, 0], yr.reshape(a, b, LANES)], axis=1
                    )
                    outi = jnp.stack(
                        [vi[:, 0], yi.reshape(a, b, LANES)], axis=1
                    )
                    return (
                        outr.reshape(rows, LANES),
                        outi.reshape(rows, LANES),
                    )
                # controlled-U as select-of-recursion: emit V on the
                # remaining qubits, keep the control=0 half untouched.
                # Collapses cross-axis cnot/toffoli/cry from the full
                # XOR-shift variant expansion (~15 VPU ops/element) to
                # one sub-gate + one select (~5).
                yr, yi = _emit_gate(xr, xi, v, qubits[1:], n, interpret)
                ctrl = _bit_mask(xr.shape, qubits[0])
                return jnp.where(ctrl, yr, xr), jnp.where(ctrl, yi, xi)
    return _emit_gate_generic(xr, xi, u, qubits, n, interpret, ext)


def _emit_gate_generic(
    xr: jax.Array,
    xi: jax.Array,
    u: np.ndarray,
    qubits: tuple[int, ...],
    n: int,
    interpret: bool,
    ext=None,
) -> tuple[jax.Array, jax.Array]:
    k = len(qubits)
    dim = 1 << k
    shape = xr.shape
    dtype = xr.dtype
    if (
        ext is not None
        and not _is_diagonal(u)
        and any(q in ext for q in qubits)
    ):
        raise ValueError(
            "gate moves an external qubit (sweep planner invariant broken)"
        )

    acc_r = None
    acc_i = None
    basis = np.arange(dim)
    # diagonal: only the v=0 variant survives — skip the 2^k column scan
    # (matters for wide diagonal gates like a 10-qubit MCZ)
    variants = (0,) if _is_diagonal(u) else range(dim)
    for v in variants:
        # C_v[b] = U[b, b ^ v] for each assignment b of the gate qubits
        col = u[basis, basis ^ v]
        if not np.any(col):
            continue
        # shift x by v across the gate qubits (qubit j holds bit k-1-j of v)
        sr, si = xr, xi
        for j, q in enumerate(qubits):
            if (v >> (k - 1 - j)) & 1:
                sr = _xor_shift(sr, q, n, interpret)
                si = _xor_shift(si, q, n, interpret)
        cr = _coeff_array(col.real, qubits, shape, dtype, ext)
        ci = _coeff_array(col.imag, qubits, shape, dtype, ext)
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


# Cost model for window emission. A window matmul pays a FIXED cost
# regardless of how many gates it absorbed, so a window is emitted when the
# summed single-emission cost of its members clears the matmul's cost.
# Costs are ENGINE-PROFILE dependent — the grid-sweep pipeline overlaps the
# first chunk of compute under its block streams and runs at different
# operand shapes than the VMEM-resident whole-state kernels:
#
# * "kernel" profile (whole-circuit / map-sweep / segmented paths), units of
#   one diagonal single: lane window ~2-3 lane singles, top-row window ~10
#   direct-row singles (docs/PERF_NOTES.md, 21-bit kernel measurements).
# * "grid" profile (gridsweeps), units of us per op over a full 26q state,
#   measured per-class on-chip (round-3 calibration): lane windows are
#   nearly free (~25-35us total — they pipeline at MXU rate under the
#   stream) while top-row windows pay a relayout (~2000-2800us).
_WINDOW_COST = {  # "kernel" profile: kind -> (real-U cost, complex-U cost)
    "mm": (6.0, 6.0),
    "mmb": (8.0, 8.0),
    "mmt": (20.0, 20.0),
}
_SINGLE_COST = {  # "kernel" profile single-gate costs
    "diag": 1.0, "lane1": 3.0, "row1": 2.0, "low1": 3.0,
    "ctrl_step": 1.0, "row2": 4.0, "k_base": 3.0,
}
# Grid-profile window bars, settled by on-chip factorial A/B at 22-26q:
# kernel-profile ratios for lane/row windows (the us-calibrated eager-lane
# variant measured 16.1 vs 13.5 ms at 26q), with top-row windows barred
# outright — their leading-axis reshape relayouts (~2000-2800us each at
# 26q) never repay in the grid pipeline.
_GRID_WINDOW_COST = {
    "mm": (6.0, 10.0),
    "mmb": (12.0, 20.0),
    "mmt": (1e9, 1e9),
}
_GRID_SINGLE_COST = dict(_SINGLE_COST)


# The W.cdiag.W-dagger rewrite measured as a net loss on the segmented 20q
# path (0.286 vs 0.230 ms without) and unproven elsewhere; profiles opt in.
REWRITE_PROFILES: frozenset = frozenset()
# Ext-phase fusion: fold all out-of-kernel diagonal gates into one scalar
# complex multiply per kernel (cannot lose: replaces >= 1 plane-op each).
EXT_PHASE_FUSION = True
# Ext-controlled gates branch (lax.cond on the scalar step-bit predicate)
# instead of compute-then-blend: control=0 blocks skip the sub-gate.
# OFF: on real Mosaic the cond lowers to a scalar-predicate
# `arith.select` over (8,128) vectors, which fails legalization
# ("failed to legalize operation 'arith.select'", job 153 — interpret
# mode accepts it, the TPU compiler does not). Exact-identity tested;
# re-try if a future Mosaic legalizes scalar-pred vector selects.
EXT_CTRL_COND = False
# In-kernel controls on high row bits slice out the control=1 slab and
# emit the sub-gate on the half-size plane instead of compute-then-blend.
# OFF: measured on-chip as a net REGRESSION (job 153: 20q 0.123->0.137,
# 22q 0.67->0.74, 24q 2.37->2.96 ms) — the expose-slice-restack
# relayout costs more than the saved half-plane blend at every size.
CTRL_SLAB_SLICE = False
# Controlled-1q diagonalization for the grid engine: C-V with dense V
# emits as compute-then-blend (136-417 us/op over a 26q state, docs/
# PERF_NOTES.md §13) while diagonal gates cost ~0-43 us at ANY control
# placement (including out-of-kernel scalar controls). Rewriting
# C-V -> (I⊗W)·C-diag(λ)·(I⊗W†), V = WΛW† (cnot -> H·CZ·H), trades the
# blend for a diagonal plus two 1q denses that merge_1q_chains folds
# into neighboring same-qubit 1q runs. Modes:
#   False  — off (blend emission, the round-3d state);
#   "all"  — rewrite every controlled-1q BEFORE the fold pass in the
#            grid planner, so the W factors merge into 1q runs;
#   "ext"  — plan-local: rewrite only gates whose control lands on an
#            out-of-kernel (ext) bit inside each built sweep — exactly
#            the 417 us/op scalar-select class — leaving cheap in-kernel
#            blends alone (the W factors are emitted unmerged here).
DIAG_CTRL: bool | str = False

# Matricized-tile emission (round-4 VERDICT item 2): cluster dense/controlled
# gates into <= MATRICIZE-bit groups, swap the group's bits into lane
# positions (tracked as a running bit-placement permutation; placement is
# restored before kernel exit), and let the window planner fold each group
# into ONE (R,128)@(128,128) MXU contraction — fused groups as the emission
# unit, with no per-gate relayout (the swaps are the per-GROUP relayout and
# amortize over the group's members). 0 = off. Set to a group bit width
# (4-7) to enable; MATRICIZE_MIN gates the flush (clusters below it emit as
# plain singles at their current placement).
MATRICIZE: int = 0
MATRICIZE_MIN: int = 3
# When not None, matricize_pgates appends (gates_in, gates_out, swaps,
# clusters_matmulled) per call — plan introspection for tests and the
# on-chip A/B harness.
MATRICIZE_STATS: list | None = None


def diagonalize_controlled(
    pgates: list[PGate], only_ext_base: int | None = None
) -> list[PGate]:
    """C-V -> (I⊗W) · C-diag(λ) · (I⊗W†) for every (multi-)controlled
    dense-1q-core gate (cnot/cry/toffoli/...); other gates pass through.

    ``only_ext_base``: rewrite only gates with at least one control qubit
    id >= this value (the relabeled ext ids of a built sweep kernel).

    The replacement is exact (complex128 host eigendecomposition,
    verified by :func:`_eig_1q` to 1e-11); application order in the
    returned list is W† first, then the controlled diagonal, then W."""
    out: list[PGate] = []
    for pg in pgates:
        if _is_diagonal(pg.u):
            out.append(pg)
            continue
        r = _split_controlled_1q(pg)
        if r is not None and only_ext_base is not None:
            if not any(c >= only_ext_base for c in r[0]):
                r = None
        e = _eig_1q(r[1]) if r is not None else None
        if e is None:
            out.append(pg)
            continue
        ctrls, _, t = r
        out.extend(_diag_triple(ctrls, t, *e))
    return out


def _diag_triple(ctrls, t: int, w, lam) -> list[PGate]:
    """The (I⊗W)·C-diag(λ)·(I⊗W†) replacement triple for C-(WΛW†), in
    application order (W† first). Shared by :func:`diagonalize_controlled`
    and :func:`_rewrite_windowable` so the controlled-diag layout
    (λ in the last two diagonal slots) has one source of truth."""
    k = len(ctrls) + 1
    dvec = np.ones(1 << k, dtype=np.complex128)
    dvec[-2] = lam[0]
    dvec[-1] = lam[1]
    wd = np.ascontiguousarray(w.conj().T)
    d = np.diag(dvec)
    qs = tuple(ctrls) + (t,)
    return [
        PGate(wd, (t,), matrix_classes(wd, (t,))),
        PGate(d, qs, matrix_classes(d, qs)),
        PGate(w, (t,), matrix_classes(w, (t,))),
    ]


def _cost_tables(profile: str):
    if profile == "grid":
        return _GRID_WINDOW_COST, _GRID_SINGLE_COST
    return _WINDOW_COST, _SINGLE_COST


def _single_cost(u: np.ndarray, qubits: tuple[int, ...], sc=None) -> float:
    """Estimated VPU emission cost of one gate under a profile table."""
    sc = _SINGLE_COST if sc is None else sc
    if _is_diagonal(u):
        return sc["diag"]
    v = _controlled_split(u)
    if v is not None:
        return sc["ctrl_step"] + _single_cost(v, qubits[1:], sc)
    k = len(qubits)
    if k == 1:
        q = qubits[0]
        if q < LANE_BITS:
            return sc["lane1"]
        return sc["row1"] if q >= _DIRECT_ROW_MIN else sc["low1"]
    if k == 2 and min(qubits) >= _DIRECT_ROW_MIN:
        return sc["row2"]
    return sc["k_base"] * (1 << (k - 1))


def _window_pays(kind: str, window, u: np.ndarray, profile: str) -> bool:
    wc_table, sc = _cost_tables(profile)
    wr, wc = wc_table[kind]
    bar = wc if np.any(u.imag) else wr
    return sum(_single_cost(g.u, g.qubits, sc) for g in window) >= bar
# Row windows unroll their slab loop up to this many slabs (best runtime);
# larger kernels switch to a fori_loop over scratch refs — an unrolled
# 128-slab window was the dominant Mosaic compile cost at 21-bit kernels
# (>10 min per kernel through the remote compiler).
ROW_WINDOW_MAX_SLABS = 16

_LANE_GROUP = (6, 5, 4, 3, 2, 1, 0)       # 7-qubit lane space, MSB-first
ROW_AXIS_BITS = LANE_BITS + 7              # qubits 7..13: the row-matmul axis
_ROW_GROUP = tuple(range(ROW_AXIS_BITS - 1, LANE_BITS - 1, -1))  # (13..7)


def _window_class(gate, n_bits: int) -> str | None:
    if all(q < LANE_BITS for q in gate.qubits):
        return "lane"
    if n_bits >= ROW_AXIS_BITS and all(
        LANE_BITS <= q < ROW_AXIS_BITS for q in gate.qubits
    ):
        return "rowb"
    if n_bits > ROW_AXIS_BITS and all(
        n_bits - LANE_BITS <= q < n_bits for q in gate.qubits
    ):
        # top-row window: the 7 highest kernel bits, realized by a single
        # leading-axis (128, 128) @ (128, R) contraction (no slab loop).
        # For kernels narrower than 21 bits the group dips into the rowb
        # range; the rowb test above wins ties for pure mid-bit gates.
        return "rowt"
    return None


def _q_class1(q: int, n_bits: int) -> str | None:
    """Window class of a single qubit (the 1q-gate case of _window_class)."""
    if q < LANE_BITS:
        return "lane"
    if n_bits >= ROW_AXIS_BITS and q < ROW_AXIS_BITS:
        return "rowb"
    if n_bits > ROW_AXIS_BITS and n_bits - LANE_BITS <= q < n_bits:
        return "rowt"
    return None


class PGate:
    """Planner gate: an explicit unitary + qubit tuple.

    The emission planner works on these instead of named circuit gates so
    rewrite passes can introduce synthetic gates (the W / W-dagger factors of
    the cross-axis diagonalization below). ``classes`` carries the per-qubit
    commutation classes consumed by :func:`tpu_qsim.commute.qubit_classes`.
    """

    __slots__ = ("u", "qubits", "classes")

    def __init__(self, u: np.ndarray, qubits: tuple[int, ...], classes):
        self.u = u
        self.qubits = qubits
        self.classes = classes


def matrix_classes(u: np.ndarray, qubits: tuple[int, ...]) -> tuple:
    """Conservative per-qubit commutation classes derived from a matrix
    (for gates that arrive without a library name): diagonal axes commute
    as DIAG, peeled control axes as DIAG, everything else OTHER."""
    from ..commute import DIAG, OTHER

    if _is_diagonal(u):
        return (DIAG,) * len(qubits)
    v = _controlled_split(u)
    if v is not None:
        return (DIAG,) + matrix_classes(v, qubits[1:])
    return (OTHER,) * len(qubits)


def as_pgates(gates) -> list[PGate]:
    """Normalize a gate list to planner gates: named circuit Gates pick up
    their library matrix + name-based commute classes; (matrix, qubits)
    pairs and existing PGates pass through."""
    from ..commute import qubit_classes

    out = []
    for g in gates:
        if isinstance(g, PGate):
            out.append(g)
        elif isinstance(g, tuple):
            u, qubits = g
            u = np.asarray(u, dtype=np.complex128)
            out.append(PGate(u, tuple(qubits), matrix_classes(u, qubits)))
        else:
            out.append(
                PGate(
                    op_matrix(g).astype(np.complex128),
                    g.qubits,
                    qubit_classes(g),
                )
            )
    return out


_to_pgates = as_pgates


def merge_1q_chains(pgates: list[PGate]) -> list[PGate]:
    """Commute-aware same-qubit 1q-run folding.

    Under frontier scheduling, a 1q gate whose target already carries an
    emitted 1q gate with no intervening non-commuting toucher folds into
    it (u = u2 @ u1, composed in complex128 on host); exact-identity
    products (H·H, X·X, CNOT-free Rz(a)·Rz(-a)) are elided outright.
    On the 100-gate bench mixes this removes 42-49 of 100 gates — every
    emitted gate is ~2-9 VPU plane-ops over the full state, so fewer
    emitted gates is a direct compute cut (the engines are compute-bound
    since round 3b, docs/PERF_NOTES.md §7). The reference's analog is
    nothing: it launches one kernel per gate unconditionally (reference
    src/Simulator.cu:28-36).

    Safety: merging places g at its partner's position; any gate that
    could forbid that must not commute with g, hence (conservative rule,
    tpu_qsim/commute.py) shares g's qubit — and every toucher of a qubit
    closes that qubit's open slot below. Identity elision requires exact
    I (no global-phase freedom: amplitudes are compared literally
    against the oracle).
    """
    from ..commute import FrontierScheduler

    if sum(1 for g in pgates if len(g.qubits) == 1) < 2:
        return list(pgates)
    sched = FrontierScheduler(list(pgates))
    out: list[PGate | None] = []
    open_1q: dict[int, int] = {}        # qubit -> open slot index in out
    while not sched.done():
        ready = sched.ready()
        pick = None
        for i in ready:
            g = sched.gates[i]
            if len(g.qubits) == 1 and g.qubits[0] in open_1q:
                pick = i
                break
        if pick is not None:
            g = sched.gates[pick]
            sched.emit(pick)
            j = open_1q[g.qubits[0]]
            u = g.u @ out[j].u
            if not np.any(np.abs(u - np.eye(2)) > 1e-12):
                out[j] = None               # folded to identity: elide
                del open_1q[g.qubits[0]]
            else:
                out[j] = PGate(u, g.qubits, matrix_classes(u, g.qubits))
            continue
        i = ready[0]
        g = sched.gates[i]
        sched.emit(i)
        for qq in g.qubits:
            open_1q.pop(qq, None)
        out.append(g)
        if len(g.qubits) == 1:
            open_1q[g.qubits[0]] = len(out) - 1
    return [g for g in out if g is not None]


def matricize_pgates(
    pgates: list[PGate],
    n_bits: int,
    k_bits: int = 5,
    min_gates: int = 3,
) -> list[PGate]:
    """Matricized-tile rewrite: route dense-gate clusters onto the lane axis.

    Maintains a bit-placement permutation (logical kernel bit -> physical
    position). Dense/controlled gates whose bits all live in-kernel are
    greedily clustered while their union stays within ``k_bits`` distinct
    bits; at flush, the cluster's bits are swapped into lane positions
    (explicit SWAP gates — the per-GROUP relayout) and the members emit as
    lane-qubit gates, which the window planner downstream composes into one
    (R,128)@(128,128) MXU contraction. Diagonal gates ride along free when
    their bits are already cluster-resident; everything else (ext-involving
    gates, diagonals on foreign bits) passes through at its current
    placement. Placement is restored to identity before return, so the
    transform is a drop-in exact rewrite (same unitary to f64 composition
    accuracy) validated by the interpret-mode differential tests.

    This is the round-4 experiment mandated by the VERDICT: fused groups as
    MXU matmuls with no per-gate relayout. Whether the group relayout
    (swaps) + matmul beats the per-gate VPU blend emission is decided by
    on-chip A/B (docs/PERF_NOTES.md §16), not by this code.
    """
    from ..commute import FrontierScheduler

    k_bits = min(k_bits, LANE_BITS)
    pos = list(range(n_bits))           # logical bit -> physical position
    at = list(range(n_bits))            # physical position -> logical bit
    out: list[PGate] = []
    n_swaps = 0
    n_matmul_clusters = 0

    def remap(g: PGate) -> PGate:
        qs = tuple(pos[q] if q < n_bits else q for q in g.qubits)
        return PGate(g.u, qs, g.classes)

    def swap_phys(a: int, b: int) -> None:
        nonlocal n_swaps
        n_swaps += 1
        out.append(PGate(_SWAP_U, (a, b), matrix_classes(_SWAP_U, (a, b))))
        la, lb = at[a], at[b]
        at[a], at[b] = lb, la
        pos[la], pos[lb] = b, a

    cluster: list[PGate] = []
    cbits: set[int] = set()

    def flush() -> None:
        nonlocal cluster, cbits
        if not cluster:
            return
        if len(cluster) < min_gates:
            out.extend(remap(g) for g in cluster)
        else:
            nonlocal n_matmul_clusters
            n_matmul_clusters += 1
            need = [b for b in sorted(cbits) if pos[b] >= LANE_BITS]
            free = [p for p in range(LANE_BITS) if at[p] not in cbits]
            for b, p in zip(need, free):
                swap_phys(pos[b], p)
            # all cluster bits now sit in lanes: members emit as lane-class
            # gates and the window planner folds them into one matmul
            out.extend(remap(g) for g in cluster)
        cluster, cbits = [], set()

    def kernel_bits(g: PGate) -> set[int]:
        return {q for q in g.qubits if q < n_bits}

    def passthrough(g: PGate) -> bool:
        return _is_diagonal(g.u) or any(q >= EXT_BASE for q in g.qubits)

    sched = FrontierScheduler(list(pgates))
    while not sched.done():
        ready = sched.ready()
        pick_ext = pick_free = pick_new = None
        best_ext = best_new = None
        for i in ready:
            g = sched.gates[i]
            bits = kernel_bits(g)
            if passthrough(g):
                if _is_diagonal(g.u) and cluster and bits and bits <= cbits:
                    # a diagonal on cluster-resident bits folds into the
                    # group matmul for free
                    pick_ext = i
                    best_ext = 0
                    break
                if not (bits & cbits):
                    # disjoint bits => commutes with every cluster member:
                    # safe to place before the (later) flush
                    if pick_free is None:
                        pick_free = i
                continue
            # locality-aware selection: swaps are the cost, so prefer the
            # extender adding fewest NEW bits to the cluster, and seed new
            # clusters from the gate with most bits already lane-resident
            if cluster and len(cbits | bits) <= k_bits:
                new_bits = len(bits - cbits)
                if best_ext is None or new_bits < best_ext:
                    pick_ext, best_ext = i, new_bits
                    if new_bits == 0:
                        break
                continue
            resident = sum(1 for b in bits if pos[b] < LANE_BITS)
            score = resident - len(bits)
            if best_new is None or score > best_new:
                pick_new, best_new = i, score
        if pick_ext is not None:
            g = sched.gates[pick_ext]
            sched.emit(pick_ext)
            cluster.append(g)
            cbits |= kernel_bits(g)
            continue
        if pick_free is not None:
            g = sched.gates[pick_free]
            sched.emit(pick_free)
            out.append(remap(g))
            continue
        flush()
        if pick_new is not None:
            g = sched.gates[pick_new]
            sched.emit(pick_new)
            bits = kernel_bits(g)
            if len(bits) <= k_bits and not passthrough(g):
                cluster, cbits = [g], set(bits)
            else:
                out.append(remap(g))
        else:
            # only passthroughs blocked on the (now flushed) cluster remain
            i = sched.ready()[0]
            g = sched.gates[i]
            sched.emit(i)
            out.append(remap(g))
    flush()
    # restore placement to identity (kernel I/O layout is fixed)
    for p in range(n_bits):
        while at[p] != p:
            swap_phys(p, pos[p])
    if MATRICIZE_STATS is not None:
        MATRICIZE_STATS.append(
            (len(pgates), len(out), n_swaps, n_matmul_clusters)
        )
    return out


def _split_controlled_1q(pg: PGate):
    """Peel leading control qubits; return (controls, core_2x2, target) when
    the gate is a (multi-)controlled non-diagonal 1q operation, else None."""
    v = pg.u
    qs = pg.qubits
    ctrls: list[int] = []
    while True:
        s = _controlled_split(v)
        if s is None:
            break
        ctrls.append(qs[0])
        v = s
        qs = qs[1:]
    if len(qs) != 1 or not ctrls or _is_diagonal(v):
        return None
    return tuple(ctrls), v, qs[0]


def _eig_1q(v: np.ndarray):
    """Unitary eigendecomposition v = W diag(lam) W^dagger (2x2), or None."""
    lam, vec = np.linalg.eig(v)
    w = vec.astype(np.complex128).copy()
    w[:, 0] /= np.linalg.norm(w[:, 0])
    w[:, 1] -= (w[:, 0].conj() @ w[:, 1]) * w[:, 0]
    nrm = np.linalg.norm(w[:, 1])
    if nrm < 1e-9:
        return None
    w[:, 1] /= nrm
    d = np.diag(lam)
    if not np.allclose(w @ d @ w.conj().T, v, atol=1e-11):
        return None
    return w, lam


def _rewrite_windowable(
    pgates: list[PGate], n_bits: int, profile: str = "kernel"
) -> list[PGate]:
    """Cross-axis controlled gates -> W . controlled-diag . W-dagger.

    A controlled gate whose control sits outside its target's window axis
    (including out-of-kernel ``ext`` controls of the sweep/segment paths)
    cannot join a matmul window and costs ~5 VPU ops as a controlled-select
    single. Diagonalizing the 1q core (cnot -> H.CZ.H, cry -> W.c-diag.W†,
    toffoli -> H.CCZ.H) turns it into two windowable 1q gates plus a
    diagonal gate — and diagonal singles are the cheapest emission class
    (~1-2 VPU ops, any control placement, ext-compatible).

    Gated by a member pre-count per window class so the W factors don't land
    as extra singles when no window would form anyway.
    """
    wc_table, sc = _cost_tables(profile)
    w1 = {"lane": sc["lane1"], "rowb": sc["row1"], "rowt": sc["row1"]}
    costs: dict[str, float] = {}
    cands: dict[int, tuple] = {}
    for i, pg in enumerate(pgates):
        if _is_diagonal(pg.u):
            continue
        wc = _window_class(pg, n_bits)
        if wc is not None:
            costs[wc] = costs.get(wc, 0.0) + _single_cost(pg.u, pg.qubits, sc)
            continue
        r = _split_controlled_1q(pg)
        if r is None:
            continue
        ctrls, v, t = r
        tc = _q_class1(t, n_bits)
        if tc is None:
            continue
        e = _eig_1q(v)
        if e is None:
            continue
        cands[i] = (ctrls, t, tc, e)
        costs[tc] = costs.get(tc, 0.0) + 2.0 * w1[tc]   # the two W factors
    # enable per class only when the projected member cost clears the
    # complex-window emission bar — if no window forms, the W factors land
    # as extra singles (measured regression at 24q when gated loosely)
    _kind = {"lane": "mm", "rowb": "mmb", "rowt": "mmt"}
    enabled = {c for c, m in costs.items() if m >= wc_table[_kind[c]][1]}
    if not enabled:
        return pgates
    out: list[PGate] = []
    for i, pg in enumerate(pgates):
        c = cands.get(i)
        if c is None or c[2] not in enabled:
            out.append(pg)
            continue
        ctrls, t, _, (w, lam) = c
        out.extend(_diag_triple(ctrls, t, w, lam))
    return out


def _plan_emission(gates, n_bits: int) -> list[tuple[str, object]]:
    """Reorder commuting gates to batch same-axis gates into matmul windows.

    Returns emission items ``("lane", [Gate...])`` (all qubits < 7),
    ``("rowb", [Gate...])`` (all qubits in 7..13, when the state exposes a
    full 128-row axis), and ``("gate", Gate)``, in an order equivalent to
    program order under the conservative commutation rule of
    :mod:`tpu_qsim.commute`. Frontier scheduling, biased toward BIG windows:
    every ready non-windowable gate is emitted first (emitting one can only
    ready more window members, never remove any), then the class with the
    most ready gates opens a window and drains to fixpoint (draining can
    ready more of the same class).
    """
    from ..commute import FrontierScheduler

    sched = FrontierScheduler(list(gates))
    items: list[tuple[str, object]] = []
    while not sched.done():
        progressed = True
        while progressed:
            progressed = False
            for i in sched.ready():
                if _window_class(sched.gates[i], n_bits) is None:
                    sched.emit(i)
                    items.append(("gate", sched.gates[i]))
                    progressed = True
                    break
        if sched.done():
            break
        counts: dict[str, int] = {}
        for i in sched.ready():
            c = _window_class(sched.gates[i], n_bits)
            if c is not None:
                counts[c] = counts.get(c, 0) + 1
        cls = max(counts, key=lambda c: counts[c])
        window = []
        while True:
            nxt = [
                i
                for i in sched.ready()
                if _window_class(sched.gates[i], n_bits) == cls
            ]
            if not nxt:
                break
            sched.emit(nxt[0])
            window.append(sched.gates[nxt[0]])
        items.append((cls, window))
    return items


def _compose_window(gates, group: tuple[int, ...]) -> np.ndarray:
    """Compose a window gate run into one 128x128 complex128 unitary over
    the 7-qubit ``group`` (basis index == axis index)."""
    from ..fusion import expand_matrix

    u = np.eye(LANES, dtype=np.complex128)
    for g in gates:
        u = expand_matrix(g.u, g.qubits, group) @ u
    return u


def _emit_row_window(
    xr: jax.Array,
    xi: jax.Array,
    wr: jax.Array,
    wi: jax.Array | None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """A fused run of gates on the row-axis qubits (7..13) as per-slab MXU
    matmuls: view the (R, 128) plane as (A, 128, 128) slabs and compute
    y[a] = U @ x[a] (U untransposed; rows of U index outputs). Same FLOPs as
    a lane window plus an A-slab loop.

    Small kernels unroll the slab loop; large (sweep) kernels run it as a
    ``fori_loop`` over scratch refs — unrolled 128-slab windows were the
    dominant Mosaic compile cost at 21-bit kernels (>10 min per kernel)."""
    rows = xr.shape[0]
    a_cnt = rows // LANES

    def mxu(w, slab):
        return _win_dot(w, slab)

    if interpret or a_cnt <= ROW_WINDOW_MAX_SLABS:

        def bdot(w, x):
            x3 = x.reshape(a_cnt, LANES, LANES)
            ys = [mxu(w, x3[a]) for a in range(a_cnt)]
            return jnp.stack(ys, axis=0).reshape(rows, LANES)

    else:

        def bdot(w, x):
            def scoped(xref, yref):
                xref[:] = x

                def step(a, _):
                    yref[pl.ds(a * LANES, LANES), :] = mxu(
                        w, xref[pl.ds(a * LANES, LANES), :]
                    )
                    return 0

                jax.lax.fori_loop(0, a_cnt, step, 0)
                return yref[:]

            return pl.run_scoped(
                scoped,
                xref=pltpu.VMEM((rows, LANES), jnp.float32),
                yref=pltpu.VMEM((rows, LANES), jnp.float32),
            )

    if wi is None:
        return bdot(wr, xr), bdot(wr, xi)
    t1 = bdot(wr, xr)
    t2 = bdot(wi, xi)
    t3 = bdot(wr + wi, xr + xi)
    return t1 - t2, t3 - t1 - t2


def _emit_lane_diag(
    xr: jax.Array,
    xi: jax.Array,
    wr: jax.Array,
    wi: jax.Array | None,
) -> tuple[jax.Array, jax.Array]:
    """Composed diagonal lane window: one broadcast multiply with a (1, 128)
    constant-table row (the degenerate, free-est case of the window scheme)."""
    if wi is None:
        return xr * wr, xi * wr
    return xr * wr - xi * wi, xi * wr + xr * wi


def materialize_ops(
    gates,
    rdtype=np.float32,
    n_bits: int | None = None,
    profile: str = "kernel",
    merge: bool = True,
) -> tuple[list[tuple], np.ndarray | None]:
    """Plan + constant-fold a gate list into kernel emission ops.

    ``n_bits`` is the per-kernel-instance state width (local_bits for the
    segmented path); it gates the row-axis and top-row window classes.
    Returns ``(ops, const_table)``. Ops: ``("gate", u_c128, qubits)`` |
    ``("mm"|"mmb"|"mmt", row_off_r, row_off_i_or_None)`` (lane / row-axis /
    top-row matmul windows) | ``("diag", row_off_r, row_off_i_or_None)``
    where row offsets
    index the (K, 128) float32 ``const_table`` (``None`` when no op needs
    constants). Pallas kernels cannot capture array constants, so window
    matrices/diagonals travel as one extra kernel input. Shared by the
    whole-circuit kernel and each segment kernel.
    """
    if n_bits is None:
        n_bits = 1 + max(
            (q for g in gates for q in g.qubits), default=LANE_BITS
        )
    pgates = _to_pgates(gates)
    if merge:    # grid sweeps arrive pre-merged (planner folds first)
        pgates = merge_1q_chains(pgates)
    if profile in REWRITE_PROFILES:
        pgates = _rewrite_windowable(pgates, n_bits, profile)
    if MATRICIZE:
        pgates = matricize_pgates(
            pgates, n_bits, k_bits=MATRICIZE, min_gates=MATRICIZE_MIN
        )
    # Ext-phase fusion: a diagonal gate whose qubits are ALL out-of-kernel
    # is lambda(ext) * I on the kernel state — it commutes with every kernel
    # op, so the whole set folds into ONE complex scalar multiply (vs ~6 VPU
    # plane-ops per gate emitted individually).
    extphase = []
    if EXT_PHASE_FUSION:
        extphase = [
            pg
            for pg in pgates
            if _is_diagonal(pg.u) and all(q >= EXT_BASE for q in pg.qubits)
        ]
    if extphase:
        keep = set(map(id, extphase))
        pgates = [pg for pg in pgates if id(pg) not in keep]
    ops: list[tuple] = []
    rows: list[np.ndarray] = []
    offset = 0

    def push(arr: np.ndarray) -> int:
        nonlocal offset
        rows.append(np.ascontiguousarray(arr.astype(rdtype)))
        off = offset
        offset += arr.shape[0]
        return off

    def push_gates(window) -> None:
        for g in window:
            ops.append(("gate", g.u, g.qubits))

    for kind, payload in _plan_emission(pgates, n_bits):
        if kind == "gate":
            push_gates([payload])
            continue
        window = payload
        if kind == "lane":
            u = _compose_window(window, _LANE_GROUP)
            if _is_diagonal(u):
                d = np.ascontiguousarray(np.diagonal(u))
                if np.allclose(d, 1.0):
                    continue  # identity window
                off_r = push(d.real.reshape(1, LANES))
                off_i = (
                    push(d.imag.reshape(1, LANES)) if np.any(d.imag) else None
                )
                ops.append(("diag", off_r, off_i))
            elif _window_pays("mm", window, u, profile):
                off_r = push(u.real.T)
                off_i = push(u.imag.T) if np.any(u.imag) else None
                ops.append(("mm", off_r, off_i))
            else:
                push_gates(window)
            continue
        if kind == "rowt":
            # top-row window: y = U @ x over the (128, R) leading-axis view
            group = tuple(range(n_bits - 1, n_bits - LANE_BITS - 1, -1))
            u = _compose_window(window, group)
            if not _is_diagonal(u) and _window_pays("mmt", window, u, profile):
                off_r = push(u.real)
                off_i = push(u.imag) if np.any(u.imag) else None
                ops.append(("mmt", off_r, off_i))
            else:
                # below breakeven (or fully diagonal): the direct half-plane
                # singles are cheaper
                push_gates(window)
            continue
        # row-axis window: y[slab] = U @ x[slab] over (A, 128, 128) slabs
        u = _compose_window(window, _ROW_GROUP)
        if not _is_diagonal(u) and _window_pays("mmb", window, u, profile):
            off_r = push(u.real)
            off_i = push(u.imag) if np.any(u.imag) else None
            ops.append(("mmb", off_r, off_i))
        else:
            push_gates(window)
    if extphase:
        ops.append(
            (
                "extphase",
                tuple(
                    (tuple(np.diagonal(pg.u)), pg.qubits) for pg in extphase
                ),
            )
        )
    table = np.concatenate(rows, axis=0) if rows else None
    return ops, table


def emit_ops(
    xr: jax.Array,
    xi: jax.Array,
    ops: list[tuple],
    n: int,
    interpret: bool,
    const_ref=None,
    ext=None,
) -> tuple[jax.Array, jax.Array]:
    for op in ops:
        if op[0] == "gate":
            xr, xi = _emit_gate(xr, xi, op[1], op[2], n, interpret, ext)
        elif op[0] == "extphase":
            # one complex scalar multiply for ALL out-of-kernel diagonal
            # gates: lambda = prod of each gate's diagonal entry selected by
            # the ext bits (scalar select chains, negligible vs plane math)
            lam_r = jnp.float32(1.0)
            lam_i = jnp.float32(0.0)
            for values, qubits in op[1]:
                k = len(qubits)
                vr = lam_r
                vi = lam_i
                gr = gi = None
                for b, v in enumerate(values):
                    cond = None
                    for j, q in enumerate(qubits):
                        want = (b >> (k - 1 - j)) & 1
                        m = ext[q] != 0
                        m = m if want else ~m
                        cond = m if cond is None else cond & m
                    er = jnp.float32(float(np.real(v)))
                    ei = jnp.float32(float(np.imag(v)))
                    gr = er if gr is None else jnp.where(cond, er, gr)
                    gi = ei if gi is None else jnp.where(cond, ei, gi)
                lam_r = vr * gr - vi * gi
                lam_i = vr * gi + vi * gr
            tr = lam_r * xr - lam_i * xi
            xi = lam_r * xi + lam_i * xr
            xr = tr
        elif op[0] == "mm":
            wr = const_ref[op[1] : op[1] + LANES, :]
            wi = None if op[2] is None else const_ref[op[2] : op[2] + LANES, :]
            xr, xi = _emit_lane_window(xr, xi, wr, wi)
        elif op[0] == "mmb":
            wr = const_ref[op[1] : op[1] + LANES, :]
            wi = None if op[2] is None else const_ref[op[2] : op[2] + LANES, :]
            xr, xi = _emit_row_window(xr, xi, wr, wi, interpret)
        elif op[0] == "mmt":
            wr = const_ref[op[1] : op[1] + LANES, :]
            wi = None if op[2] is None else const_ref[op[2] : op[2] + LANES, :]
            xr, xi = _emit_top_window(xr, xi, wr, wi)
        else:
            wr = const_ref[op[1] : op[1] + 1, :]
            wi = None if op[2] is None else const_ref[op[2] : op[2] + 1, :]
            xr, xi = _emit_lane_diag(xr, xi, wr, wi)
    return xr, xi


def build_pallas_run(
    circuit: Circuit,
    rdtype: np.dtype = np.float32,
    *,
    interpret: bool = False,
) -> Callable[[jax.Array], jax.Array]:
    """Compile ``circuit`` into a single VMEM-resident Pallas kernel.

    Returns a jitted (2, 2^n) planes-state -> planes-state function.
    """
    return build_pallas_run_gates(
        circuit.gates, circuit.num_qubits, rdtype, interpret=interpret
    )


def build_pallas_run_gates(
    gates,
    n: int,
    rdtype: np.dtype = np.float32,
    *,
    interpret: bool = False,
) -> Callable[[jax.Array], jax.Array]:
    """Same as :func:`build_pallas_run` for a raw gate list — named Gates,
    (matrix, qubits) pairs, or PGates (see :func:`as_pgates`). Used by the
    sharded executors, whose segments carry relabeled matrices."""
    if np.dtype(rdtype) != np.float32:
        raise ValueError("the Pallas kernel is float32-only")
    if not (MIN_PALLAS_QUBITS <= n <= HARD_MAX_PALLAS_QUBITS):
        raise ValueError(
            f"Pallas path supports {MIN_PALLAS_QUBITS}.."
            f"{HARD_MAX_PALLAS_QUBITS} qubits, got {n}"
        )
    rows = 1 << (n - LANE_BITS)
    ops, const_table = materialize_ops(gates, n_bits=n)

    if const_table is None:

        def kernel(in_ref, out_ref):
            xr, xi = emit_ops(in_ref[0], in_ref[1], ops, n, interpret)
            out_ref[0] = xr
            out_ref[1] = xi

        in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]
    else:

        def kernel(in_ref, const_ref, out_ref):
            xr, xi = emit_ops(
                in_ref[0], in_ref[1], ops, n, interpret, const_ref
            )
            out_ref[0] = xr
            out_ref[1] = xi

        in_specs = [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((2, rows, LANES), np.float32),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        input_output_aliases={0: 0},
        # default scoped-VMEM budget is 16 MB; a 100-gate emission at
        # 2^12-row values needs far more (the 18q ceiling was partly this)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )

    # NOTE: no donate_argnums here. It was measured on-chip as perf-neutral
    # (the pallas_call's input_output_aliases already covers the in-kernel
    # update) and donation invalidates the caller's buffer — a footgun for
    # benchmark loops and any non-simulator caller that reuses its input.
    @jax.jit
    def run(state: jax.Array) -> jax.Array:
        x = state.reshape(2, rows, LANES)
        y = call(x) if const_table is None else call(x, const_table)
        return y.reshape(2, 1 << n)

    return run
