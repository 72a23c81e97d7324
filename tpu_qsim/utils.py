"""Utilities: endianness adapters, fidelity metrics, timing/profiling.

The endianness adapter is the documented bridge the reference lacked: the
library convention is qubit q <-> bit q (little-endian, Qiskit-like); Cirq
orders its computational basis big-endian, so comparisons against Cirq
require the bit-reversal permutation below (the reference hand-rolled the
same conversion only inside its cuStateVec benchmark,
reference benchmarks/benchmark_custatevec.cu:116-118, while its docs and
kernels disagreed about endianness — SURVEY quirk #1).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterator

import numpy as np

import jax
import jax.numpy as jnp


def bit_reversal_permutation(num_qubits: int) -> np.ndarray:
    """perm[i] = bit-reversed i over ``num_qubits`` bits.

    ``state_cirq = state_ours[perm]`` converts our little-endian amplitudes
    to Cirq's big-endian basis ordering (and the map is an involution).
    """
    dim = 1 << num_qubits
    idx = np.arange(dim)
    out = np.zeros(dim, dtype=np.int64)
    for b in range(num_qubits):
        out |= ((idx >> b) & 1) << (num_qubits - 1 - b)
    return out


def to_big_endian(state: np.ndarray, num_qubits: int) -> np.ndarray:
    """Reorder amplitudes from qubit0=LSB (ours/Qiskit) to qubit0=MSB (Cirq)."""
    return np.asarray(state)[bit_reversal_permutation(num_qubits)]


from_big_endian = to_big_endian  # bit reversal is an involution


def state_fidelity(a: np.ndarray, b: np.ndarray) -> float:
    """|<a|b>|^2 with normalization."""
    a = np.asarray(a).ravel()
    b = np.asarray(b).ravel()
    na = np.linalg.norm(a)
    nb = np.linalg.norm(b)
    if na == 0 or nb == 0:
        return 0.0
    return float(abs(np.vdot(a, b)) ** 2 / (na * nb) ** 2)


def max_amplitude_error(a: np.ndarray, b: np.ndarray, *, up_to_phase: bool = True) -> float:
    """Elementwise max |a - phase*b|, optionally aligning global phase."""
    a = np.asarray(a).ravel()
    b = np.asarray(b).ravel()
    if up_to_phase:
        i = int(np.argmax(np.abs(b)))
        if abs(b[i]) > 1e-12:
            ph = a[i] / b[i]
            if abs(ph) > 1e-12:
                # only ever align by a UNIT-modulus phase: applying the full
                # complex ratio would silently mask magnitude errors
                b = b * (ph / abs(ph))
    return float(np.max(np.abs(a - b)))


def sync_time(fn: Callable[[], jax.Array], *, repeats: int = 1) -> float:
    """Wall-clock seconds for ``repeats`` chained calls, forced to completion
    by a scalar readback (``block_until_ready`` alone does not drain
    remote-tunneled TPU queues; see .claude/skills/verify/SKILL.md)."""
    out = None
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn()
    _ = float(jnp.sum(jnp.ravel(jnp.asarray(out))[0:1]))
    return (time.perf_counter() - t0) / repeats


@contextlib.contextmanager
def profiler_trace(log_dir: str) -> Iterator[None]:
    """jax.profiler trace context — the tracing/observability hook (the
    reference reserved Nsight artifact patterns but had no profiling driver;
    SURVEY §5)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_persistent_compilation_cache(path: str = ".jax_cache") -> None:
    """Turn on the on-disk XLA compile cache (compiles through the remote
    TPU relay take minutes; cache hits are instant)."""
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def view_amp_summary(y, *, ends: int = 1):
    """Scalar amplitude summary of a grid-engine *view-form* planes state.

    ``y`` is a ``GridSweepProgram.vshape`` array: axis 0 = plane (re/im),
    remaining axes = state-bit groups in descending significance, so flat
    amplitude 0 sits at the all-zero coordinate and flat 2^n - 1 at the
    all-max coordinate. Returns ``(a0_re, a0_im, rest)`` for ``ends=1`` or
    ``(a0_re, a0_im, aN_re, aN_im, rest)`` for ``ends=2``, where ``rest``
    is max |plane value| over all other amplitudes' planes.

    Everything is computed IN view form with reductions the compiler fuses:
    a reshape to flat ``(2, 2^n)`` retiles the TPU layout and materializes
    a full-state copy — next to an 8 GB donated argument at 30 qubits that
    is an OOM (the reference simply read amplitudes from its single global
    allocation, reference src/StateVector.cu:207-216; on TPU the readback
    itself must be layout-aware).
    """
    import jax.numpy as jnp

    m0 = mN = None
    for ax in range(1, y.ndim):
        idx = jax.lax.broadcasted_iota(jnp.int32, y.shape, ax)
        lo, hi = idx == 0, idx == y.shape[ax] - 1
        m0 = lo if m0 is None else m0 & lo
        mN = hi if mN is None else mN & hi
    mask = m0 if ends == 1 else m0 | mN
    rest = jnp.max(jnp.where(mask, 0.0, jnp.abs(y)))
    zero = (0,) * (y.ndim - 1)
    out = [y[(0,) + zero], y[(1,) + zero]]
    if ends == 2:
        top = tuple(s - 1 for s in y.shape[1:])
        out += [y[(0,) + top], y[(1,) + top]]
    return tuple(out) + (rest,)


# XLA's default per-kernel scoped-VMEM budget (16 MB) is enforced on Pallas
# kernels compiled inside control flow (lax.map/scan bodies), where the
# kernel-level ``vmem_limit_bytes`` compiler param is not propagated — the
# sweep kernels of :mod:`tpu_qsim.kernels.sweeps` hold a 2^21-amplitude
# block plus emission temporaries and need far more. The module-level debug
# option below raises it; it is proto-backed, so it forwards through
# AOT/remote compilers where XLA_FLAGS cannot be set.
SCOPED_VMEM_KIB = 114688


def jit_scoped(
    fn: Callable,
    scoped_vmem_kib: int = SCOPED_VMEM_KIB,
    donate_argnums: tuple[int, ...] = (),
):
    """``jax.jit`` with a raised XLA scoped-VMEM limit (TPU backends).

    Returns a callable with a per-signature compile cache built via
    ``lower().compile(compiler_options=...)``. On backends that reject the
    option (CPU tests), falls back to plain ``jax.jit``.
    ``donate_argnums`` is forwarded to ``jax.jit`` (needed at 30 qubits,
    where a non-donated 8.6 GB planes state cannot be double-buffered in
    16 GB of HBM).
    """
    jitted = jax.jit(fn, donate_argnums=donate_argnums)
    cache: dict = {}
    fallback = jax.default_backend() in ("cpu", "gpu")

    def wrapped(*args):
        if fallback:
            return jitted(*args)
        leaves = jax.tree_util.tree_leaves(args)
        if any(isinstance(a, jax.core.Tracer) for a in leaves):
            # called under an outer trace: inline as a plain jit call (the
            # OUTER compile must itself raise the scoped limit — use
            # jit_scoped there too)
            return jitted(*args)
        key = (
            jax.tree_util.tree_structure(args),
            tuple((tuple(a.shape), str(a.dtype)) for a in leaves),
        )
        compiled = cache.get(key)
        if compiled is None:
            try:
                compiled = jitted.lower(*args).compile(
                    compiler_options={
                        "xla_tpu_scoped_vmem_limit_kib": scoped_vmem_kib
                    }
                )
            except Exception as e:
                # surface the fallback: a silently-missing scoped-VMEM raise
                # turns into an opaque allocator OOM deep inside lax.map
                import warnings

                warnings.warn(
                    "jit_scoped: compiler_options compile failed "
                    f"({type(e).__name__}: {e}); falling back to plain "
                    "jax.jit without the raised scoped-VMEM limit"
                )
                compiled = jitted
            cache[key] = compiled
        return compiled(*args)

    return wrapped
