"""Exact mixed-state simulation: density matrix + Kraus channels.

The analog of the reference's ``DensityMatrix``/``DensityMatrixSimulator``
(reference include/DensityMatrix.cuh:63-224, src/DensityMatrix.cu), built on
a TPU-native identity: an n-qubit density matrix is a planes state over 2n
index bits — row qubit ``q`` lives at bit ``q + n``, column qubit ``q`` at
bit ``q``. Every operation reuses the flat segment/matmul engine of
:mod:`tpu_qsim.apply`:

* gate:    rho' = U rho U^dag  ==  apply U on row bits, conj(U) on col bits
* channel: rho' = sum_k K_k rho K_k^dag  ==  sum of (row, col) pairs

This removes three reference defects by construction: the approximate
depolarizing channel (off-diagonal-only damping, src/DensityMatrix.cu:
995-1001), the bit-phase-flip approximated by phase-flip (:343-356), and the
amplitude-damping kernel data race (:1023-1043; SURVEY quirks #5/#6) — here
every channel is the exact Kraus sum, and updates are functional.

Unsupported reference gates CRY/CRZ/Toffoli (which *threw* in the reference,
src/DensityMatrix.cu:264-265) simply work here — the engine is
gate-agnostic.
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np

import jax
import jax.numpy as jnp

from . import apply as ap
from .base import BaseSimulator
from .circuit import Circuit
from .config import DEFAULT_CONFIG, SimConfig
from .fusion import unfused_circuit
from .noise import NoiseModel, kraus_operators

# Same practical ceiling as the reference (dim^2 amplitudes; reference
# src/DensityMatrix.cu:25-27 capped at 14).
MAX_DM_QUBITS = 14


def _row_qubits(qubits: tuple[int, ...], n: int) -> tuple[int, ...]:
    return tuple(q + n for q in qubits)


def _apply_gate_rho(
    rho: jax.Array,
    ur: np.ndarray,
    ui: np.ndarray | None,
    qubits: tuple[int, ...],
    n: int,
    diagonal: bool,
) -> jax.Array:
    """rho' = U rho U^dag on the flat 2n-bit planes state."""
    if diagonal:
        rho = ap.apply_diagonal(rho, ur, ui, _row_qubits(qubits, n))
        # conj of a diagonal: negate imaginary part
        return ap.apply_diagonal(rho, ur, None if ui is None else -ui, qubits)
    rho = ap.apply_unitary(rho, ur, ui, _row_qubits(qubits, n))
    return ap.apply_unitary(rho, ur, None if ui is None else -ui, qubits)


def _apply_kraus_channel(
    rho: jax.Array,
    kraus: list[tuple[np.ndarray, np.ndarray | None]],
    qubit: int,
    n: int,
) -> jax.Array:
    """Exact rho' = sum_k K_k rho K_k^dag."""
    acc = None
    for kr, ki in kraus:
        term = ap.apply_unitary(rho, kr, ki, (qubit + n,))
        term = ap.apply_unitary(term, kr, None if ki is None else -ki, (qubit,))
        acc = term if acc is None else acc + term
    return acc


class DensityMatrixSimulator(BaseSimulator):
    """Exact noisy simulator on rho (TPU analog of reference
    ``DensityMatrixSimulator``, include/DensityMatrix.cuh:158-224).

    Noise semantics default to the reference's DM convention: after each
    gate, every channel covering each of the gate's qubits is applied to
    that qubit (``insertion="gate_qubits"``; reference src/DensityMatrix.cu:
    201-212, 269-296), with global channels resolved to all qubits.
    ``insertion="all"`` instead fires every registered application after
    every gate — the reference NoisySimulator's convention — so MCWF and DM
    can be cross-validated under ONE policy (the reference's two backends
    silently disagreed; SURVEY quirk #2 and NoiseModel docstring).
    """

    def __init__(
        self,
        num_qubits: int,
        noise_model: NoiseModel | None = None,
        config: SimConfig = DEFAULT_CONFIG,
        *,
        seed: int = 0,
        insertion: str = "gate_qubits",
    ):
        if not (1 <= num_qubits <= MAX_DM_QUBITS):
            raise ValueError(
                f"density matrix supports 1..{MAX_DM_QUBITS} qubits, got "
                f"{num_qubits}"
            )
        if insertion not in ("all", "gate_qubits"):
            raise ValueError(
                f"insertion must be 'all' or 'gate_qubits', got {insertion!r}"
            )
        super().__init__(num_qubits, config, seed=seed)
        self.noise_model = noise_model if noise_model is not None else NoiseModel()
        self.insertion = insertion
        self._run_cache: dict[Any, Callable] = {}
        # self._state: (2, 4^n) flat planes over 2n index bits = |0..0><0..0|
        self._state = ap.initial_state(2 * self.num_qubits, self._rdtype)

    # -- state management ---------------------------------------------------

    def reset(self, basis_index: int = 0) -> None:
        """rho = |index><index| (reference DensityMatrix::reset /
        initializeZero, src/DensityMatrix.cu:56-79)."""
        if not (0 <= basis_index < self.dim):
            raise ValueError(f"basis index {basis_index} out of range")
        flat = basis_index * self.dim + basis_index
        self._state = ap.initial_state(2 * self.num_qubits, self._rdtype, flat)

    def set_maximally_mixed(self) -> None:
        """rho = I / 2^n (reference initializeMaximallyMixed,
        src/DensityMatrix.cu:96-105)."""
        diag = np.zeros((2, self.dim * self.dim), dtype=self._rdtype)
        idx = np.arange(self.dim) * (self.dim + 1)
        diag[0, idx] = 1.0 / self.dim
        self._state = jnp.asarray(diag)

    def init_from_pure_state(self, amplitudes: Any) -> None:
        """rho = |psi><psi| via on-host outer product (reference
        initFromPureState outer-product kernel, src/DensityMatrix.cu:
        123-128, 412-425)."""
        psi = np.asarray(amplitudes).reshape(-1)
        if psi.shape != (self.dim,):
            raise ValueError(f"state must have shape ({self.dim},)")
        rho = np.outer(psi, psi.conj())
        self.set_matrix(rho)

    def set_matrix(self, rho: np.ndarray) -> None:
        rho = np.asarray(rho)
        if rho.shape != (self.dim, self.dim):
            raise ValueError(f"matrix must have shape ({self.dim}, {self.dim})")
        flat = rho.reshape(-1)
        self._state = jnp.asarray(
            np.stack([flat.real, flat.imag]).astype(self._rdtype)
        )

    def get_matrix(self) -> np.ndarray:
        """Device -> host complex rho (reference getMatrix,
        src/DensityMatrix.cu:81-94)."""
        flat = np.asarray(self._state)
        ctype = np.complex64 if flat.dtype == np.float32 else np.complex128
        return (flat[0] + 1j * flat[1]).astype(ctype).reshape(self.dim, self.dim)

    # pure-state setters from BaseSimulator do not apply to rho
    def set_state(self, amplitudes: Any) -> None:
        self.init_from_pure_state(amplitudes)

    def get_state(self) -> np.ndarray:
        return self.get_matrix()

    # -- execution ----------------------------------------------------------

    def _compiled_run(self, circuit: Circuit) -> Callable:
        key = (circuit.signature(), self.noise_model.signature(), self.insertion)
        fn = self._run_cache.get(key)
        if fn is None:
            fn = self._build_run(circuit)
            self._run_cache[key] = fn
        return fn

    def _build_run(self, circuit: Circuit) -> Callable:
        n = self.num_qubits
        ops = []
        for g in unfused_circuit(circuit):
            ur, ui = ap.split_matrix(g.diag if g.diagonal else g.matrix,
                                     self._rdtype)
            ops.append(("gate", g.qubits, g.diagonal, ur, ui))
            if self.noise_model.has_noise():
                if self.insertion == "gate_qubits":
                    apps = [
                        (ch.type, q, ch.probability)
                        for q in g.qubits
                        for ch in self.noise_model.channels_for_qubit(q)
                    ]
                else:   # "all": the reference NoisySimulator's convention
                    apps = self.noise_model.applications_per_gate(n)
                for ntype, q, p in apps:
                    if p == 0.0:
                        continue
                    kraus = [
                        ap.split_matrix(k, self._rdtype)
                        for k in kraus_operators(ntype, p)
                    ]
                    ops.append(("kraus", q, kraus))

        def step(rho: jax.Array) -> jax.Array:
            for op in ops:
                if op[0] == "gate":
                    _, qubits, diagonal, ur, ui = op
                    rho = _apply_gate_rho(rho, ur, ui, qubits, n, diagonal)
                else:
                    _, q, kraus = op
                    rho = _apply_kraus_channel(rho, kraus, q, n)
            return rho

        return jax.jit(step, donate_argnums=(0,) if self.config.donate_state else ())

    def run(self, circuit: Circuit) -> "DensityMatrixSimulator":
        if circuit.num_qubits != self.num_qubits:
            raise ValueError(
                f"circuit has {circuit.num_qubits} qubits, simulator has "
                f"{self.num_qubits}"
            )
        self._state = self._compiled_run(circuit)(self._state)
        return self

    def apply_gate(self, name: str, *qubits: int, param: float | None = None) -> None:
        c = Circuit(self.num_qubits).add(name, *qubits, param=param)
        self.run(c)

    # -- readout ------------------------------------------------------------

    def probabilities(self) -> jax.Array:
        """Diagonal of rho (reference dmComputeDiagonal,
        src/DensityMatrix.cu:435-440)."""
        return _dm_diag_jit(self._state, self.dim)

    def trace(self) -> float:
        """Re tr(rho) (reference dmComputeTrace, src/DensityMatrix.cu:
        442-449 — an atomicAdd kernel there, a fused reduction here)."""
        return float(jnp.sum(_dm_diag_jit(self._state, self.dim)))

    def purity(self) -> float:
        """tr(rho^2) = sum |rho_ij|^2 for Hermitian rho (the reference
        computed this with a host double-loop over dim^2 elements,
        src/DensityMatrix.cu:147-167; here it is one on-device reduction)."""
        return float(_purity_jit(self._state))

    def total_probability(self) -> float:
        return self.trace()

    def is_valid(self, atol: float = 1e-4) -> bool:
        """trace ~ 1 and 1/dim <= purity <= 1 (reference isValid,
        src/DensityMatrix.cu:169-181)."""
        tr = self.trace()
        pu = self.purity()
        return (
            abs(tr - 1.0) < atol
            and pu <= 1.0 + atol
            and pu >= 1.0 / self.dim - atol
        )

    def qubit_probability(self, qubit: int) -> float:
        self._check_qubit(qubit)
        p = np.asarray(self.probabilities())
        mask = ((np.arange(self.dim) >> qubit) & 1).astype(bool)
        return float(p[mask].sum())

    def expectation_pauli(self, pauli: str) -> float:
        """tr(rho P) for a Pauli string (same string convention as
        BaseSimulator.expectation_pauli — rightmost char = qubit 0).

        Overrides the pure-state implementation, which would silently
        compute tr(rho^2 P) on the rho planes."""
        pauli = pauli.upper()
        if len(pauli) > self.num_qubits or not set(pauli) <= set("IXYZ"):
            raise ValueError(f"invalid Pauli string {pauli!r}")
        ops = tuple(
            (len(pauli) - 1 - i, p) for i, p in enumerate(pauli) if p != "I"
        )
        if not ops:
            return self.trace()
        return float(
            _dm_pauli_expectation_jit(self._state, ops, self.num_qubits)
        )

    # -- sampling / measurement --------------------------------------------

    def sample(self, shots: int, key: jax.Array | None = None) -> jax.Array:
        if shots < 1:
            raise ValueError("shots must be >= 1")
        key = self._next_key(key)
        return _dm_sample_jit(self._state, key, self.dim, shots)

    def measure_qubit(self, qubit: int, key: jax.Array | None = None) -> int:
        """Projective measurement with collapse: rho' = P rho P / p
        (reference dmCollapseMeasurement, src/DensityMatrix.cu:1134-1157)."""
        self._check_qubit(qubit)
        key = self._next_key(key)
        fn = (
            _dm_measure_jit_donating
            if self.config.donate_state
            else _dm_measure_jit
        )
        outcome, self._state = fn(self._state, key, qubit, self.num_qubits)
        return int(outcome)

    def reduced_density_matrix(self, qubits) -> np.ndarray:
        """Partial trace of rho onto ``qubits`` (2^k x 2^k, index bit j =
        qubits[j]): sum over equal traced row/col assignments, computed
        on device (only the reduced matrix is read back). The
        mixed-state override of the pure-state version in BaseSimulator
        (the 2n-bit rho layout needs a genuine trace, not M M-dagger)."""
        qs = self._validated_subset(qubits)
        rr, ri = _dm_reduced_jit(self._state, qs, self.num_qubits)
        return np.asarray(rr).astype(np.float64) + 1j * np.asarray(
            ri
        ).astype(np.float64)

    def fidelity_with(self, other) -> float:
        """Fidelity of rho against ``other``.

        * pure-state simulator (``(2, 2^n)`` planes): F = <psi|rho|psi>,
          computed on device;
        * another DensityMatrixSimulator: Uhlmann fidelity
          (tr sqrt(sqrt(rho) sigma sqrt(rho)))^2 via host
          eigendecompositions — O(8^n), supported to 10 qubits.
        """
        nq = getattr(other, "num_qubits", None)
        if nq is not None and nq != self.num_qubits:
            # width FIRST: raw shape tests alias across types (a 2n-qubit
            # pure state's planes look exactly like this rho)
            raise ValueError(
                f"register width mismatch: {nq} vs {self.num_qubits} qubits"
            )
        planes = getattr(other, "state_planes", other)
        if tuple(planes.shape) == (2, self.dim):
            return float(_dm_pure_fidelity_jit(self._state, planes, self.dim))
        if tuple(planes.shape) == (2, self.dim * self.dim):
            if self.num_qubits > 10:
                raise ValueError(
                    "mixed-mixed Uhlmann fidelity is host-side "
                    "eigendecomposition work; supported to 10 qubits"
                )
            rho = self.get_matrix().astype(np.complex128)
            sig = (
                np.asarray(planes[0]) + 1j * np.asarray(planes[1])
            ).astype(np.complex128).reshape(self.dim, self.dim)
            lam, u = np.linalg.eigh(rho)
            sq = (u * np.sqrt(np.clip(lam, 0.0, None))) @ u.conj().T
            ev = np.linalg.eigvalsh(sq @ sig @ sq)
            return float(np.sqrt(np.clip(ev, 0.0, None)).sum() ** 2)
        raise ValueError(
            f"state shape mismatch: {tuple(planes.shape)} is neither a "
            f"(2, {self.dim}) pure state nor a (2, {self.dim**2}) rho"
        )


# ---------------------------------------------------------------------------
# jitted helpers
# ---------------------------------------------------------------------------

from functools import partial


@partial(jax.jit, static_argnums=(1,))
def _dm_diag_jit(rho: jax.Array, dim: int) -> jax.Array:
    re = rho[0].reshape(dim, dim)
    return jnp.diagonal(re)


@jax.jit
def _purity_jit(rho: jax.Array) -> jax.Array:
    return jnp.sum(rho * rho)


@partial(jax.jit, static_argnums=(1, 2))
def _dm_reduced_jit(rho: jax.Array, qs: tuple, n: int):
    """Partial trace on the 2n-bit planes: row qubit q = bit q+n, column
    qubit q = bit q (density.py header). Kept row/col axes fronted
    (reduced bit j = qs[j]), traced row/col axes paired and traced."""
    k = len(qs)
    rest = [b for b in range(n) if b not in qs]
    t = len(rest)

    def axes_of(bits):
        return [2 * n - 1 - b for b in bits]

    perm = (
        axes_of([q + n for q in reversed(qs)])
        + axes_of(list(reversed(qs)))
        + axes_of([b + n for b in rest])
        + axes_of(rest)
    )

    def f(plane):
        v = (
            plane.reshape((2,) * (2 * n))
            .transpose(perm)
            .reshape(1 << k, 1 << k, 1 << t, 1 << t)
        )
        return jnp.trace(v, axis1=2, axis2=3)

    return f(rho[0]), f(rho[1])


@partial(jax.jit, static_argnums=(2,))
def _dm_pure_fidelity_jit(rho: jax.Array, psi: jax.Array, dim: int):
    """<psi|rho|psi> = Re(psi^dag (M psi)) — real for Hermitian rho."""
    mr = rho[0].reshape(dim, dim)
    mi = rho[1].reshape(dim, dim)
    hi = jax.lax.Precision.HIGHEST
    # y = M psi (complex via real matmuls)
    yr = jnp.matmul(mr, psi[0], precision=hi) - jnp.matmul(
        mi, psi[1], precision=hi
    )
    yi = jnp.matmul(mr, psi[1], precision=hi) + jnp.matmul(
        mi, psi[0], precision=hi
    )
    return jnp.sum(psi[0] * yr + psi[1] * yi)


@partial(jax.jit, static_argnums=(1, 2))
def _dm_pauli_expectation_jit(rho: jax.Array, ops: tuple, n: int) -> jax.Array:
    from .gates import gate_matrix

    # apply P on the row side of the 2n-bit planes state, then take Re tr
    transformed = rho
    for qubit, p in ops:
        ur, ui = ap.split_matrix(gate_matrix(p.lower()), np.dtype(rho.dtype))
        transformed = ap.apply_unitary(transformed, ur, ui, (qubit + n,))
    dim = 1 << n
    re = transformed[0].reshape(dim, dim)
    return jnp.sum(jnp.diagonal(re))


@partial(jax.jit, static_argnums=(2, 3))
def _dm_sample_jit(rho: jax.Array, key: jax.Array, dim: int, shots: int) -> jax.Array:
    p = jnp.maximum(_dm_diag_jit.__wrapped__(rho, dim), 0.0)
    logp = jnp.log(jnp.maximum(p, jnp.finfo(p.dtype).tiny))
    return jax.random.categorical(key, logp, shape=(shots,)).astype(jnp.int32)


def _dm_measure(
    rho: jax.Array, key: jax.Array, qubit: int, n: int
) -> tuple[jax.Array, jax.Array]:
    dim = 1 << n
    diag = _dm_diag_jit.__wrapped__(rho, dim)
    mask1 = ((jax.lax.broadcasted_iota(jnp.int32, (dim,), 0) >> qubit) & 1)
    p1 = jnp.sum(diag * mask1.astype(diag.dtype))
    outcome = jax.random.bernoulli(key, jnp.clip(p1, 0.0, 1.0))
    p_outcome = jnp.where(outcome, p1, 1.0 - p1)
    # keep only rows AND cols whose bit(qubit) == outcome
    idx2n = jax.lax.broadcasted_iota(jnp.int32, (dim * dim,), 0)
    row_bit = (idx2n >> (qubit + n)) & 1
    col_bit = (idx2n >> qubit) & 1
    o = outcome.astype(jnp.int32)
    keep = ((row_bit == o) & (col_bit == o))[None, :]
    inv = 1.0 / jnp.maximum(p_outcome, jnp.finfo(rho.dtype).tiny)
    new_rho = jnp.where(keep, rho * inv.astype(rho.dtype), 0.0)
    return outcome.astype(jnp.int32), new_rho


# donation variants selected by SimConfig.donate_state (see base.py rationale)
_dm_measure_jit = partial(jax.jit, static_argnums=(2, 3))(_dm_measure)
_dm_measure_jit_donating = partial(
    jax.jit, static_argnums=(2, 3), donate_argnums=(0,)
)(_dm_measure)
