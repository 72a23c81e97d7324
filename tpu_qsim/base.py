"""Shared simulator base: state container + readout/measurement surface.

Provides the uniform API that every reference simulator facade exposed
(``run/getProbabilities/sample/measureQubit/reset``; reference
include/Simulator.hpp:55-112, include/NoiseModel.cuh:139-297) on top of the
flat planes state representation of :mod:`tpu_qsim.apply`. Subclasses own
circuit execution; this class owns everything downstream of the state.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from . import apply as ap
from .config import DEFAULT_CONFIG, SimConfig


class BaseSimulator:
    """State container + seeded readout/measurement, shared by all backends."""

    def __init__(
        self,
        num_qubits: int,
        config: SimConfig = DEFAULT_CONFIG,
        *,
        seed: int = 0,
    ):
        from .circuit import MAX_QUBITS

        if not (1 <= num_qubits <= MAX_QUBITS):
            raise ValueError(
                f"num_qubits must be in [1, {MAX_QUBITS}], got {num_qubits}"
            )
        self.num_qubits = int(num_qubits)
        self.dim = 1 << self.num_qubits
        self.config = config
        self._rdtype = config.real_dtype
        self._key = jax.random.PRNGKey(seed)
        # grid-view cache: backends whose native layout is the grid engine's
        # multi-dim view form park the state here between runs (the flat<->
        # view retile costs ~25% of a 24q circuit, docs/PERF_NOTES.md §7);
        # the `_state` property materializes flat planes lazily on readback
        self._view_state = None
        self._view_prog = None
        self._state = ap.initial_state(self.num_qubits, self._rdtype)

    # -- key chain ----------------------------------------------------------

    def set_seed(self, seed: int) -> None:
        """Re-seed the simulator's RNG chain (analog of NoisySimulator::
        setSeed, reference src/NoiseModel.cu:351-354 — but here it is the
        *only* RNG; nothing is unseeded)."""
        self._key = jax.random.PRNGKey(seed)

    def _next_key(self, key: jax.Array | None) -> jax.Array:
        if key is not None:
            return key
        self._key, sub = jax.random.split(self._key)
        return sub

    # -- state management ---------------------------------------------------

    @property
    def _state(self) -> jax.Array:
        """Flat (2, 2^n) planes; materializes (and drops) any parked
        grid-view state. ``from_view`` donates the view buffer at 29q+ —
        the flat and view forms never coexist at sizes where they cannot."""
        if self._view_state is not None:
            self._flat_state = self._view_prog.from_view(self._view_state)
            self._view_state = None
            self._view_prog = None
        return self._flat_state

    @_state.setter
    def _state(self, value: jax.Array) -> None:
        self._flat_state = value
        self._view_state = None
        self._view_prog = None

    def reset(self, basis_index: int = 0) -> None:
        if not (0 <= basis_index < self.dim):
            raise ValueError(f"basis index {basis_index} out of range")
        self._state = ap.initial_state(self.num_qubits, self._rdtype, basis_index)

    @property
    def state_planes(self) -> jax.Array:
        """Device-resident (2, 2^n) [real, imag] amplitude planes."""
        return self._state

    def get_state(self) -> np.ndarray:
        """Device -> host complex amplitudes (analog of StateVector::toHost,
        reference src/StateVector.cu:204-215)."""
        return ap.to_complex(self._state)

    def set_state(self, amplitudes: Any) -> None:
        amplitudes = np.asarray(amplitudes)
        if amplitudes.shape != (self.dim,):
            raise ValueError(f"state must have shape ({self.dim},)")
        self._state = ap.from_complex(amplitudes, self._rdtype)

    # -- readout ------------------------------------------------------------

    def probabilities(self) -> jax.Array:
        return _probs_jit(self._state)

    def get_probabilities(self) -> np.ndarray:
        return np.asarray(self.probabilities())

    def total_probability(self) -> float:
        return float(_total_prob_jit(self._state))

    def is_normalized(self, atol: float = 1e-4) -> bool:
        return abs(self.total_probability() - 1.0) < atol

    def assert_normalized(self, atol: float = 1e-4) -> None:
        tp = self.total_probability()
        if abs(tp - 1.0) >= atol:
            raise RuntimeError(f"state not normalized: total probability {tp}")

    def qubit_probability(self, qubit: int) -> float:
        """P(qubit = 1)."""
        self._check_qubit(qubit)
        return float(_marginal_jit(self._state, qubit))

    # -- sampling / measurement --------------------------------------------

    def sample(self, shots: int, key: jax.Array | None = None) -> jax.Array:
        """Multishot sampling without collapse — on-device categorical over
        basis states (replaces the reference's host CDF walk,
        src/StateVector.cu:316-342). Returns int32 basis indices [shots]."""
        if shots < 1:
            raise ValueError("shots must be >= 1")
        key = self._next_key(key)
        return sample_from_state(self._state, key, shots)

    def histogram(self, shots: int, key: jax.Array | None = None) -> dict[int, int]:
        samples = np.asarray(self.sample(shots, key))
        return counts_to_histogram(samples, self.dim)

    def measure_qubit(self, qubit: int, key: jax.Array | None = None) -> int:
        """Measure one qubit; collapse the state; return 0 or 1.

        One fused jit program: marginal -> bernoulli -> masked renormalize
        (the reference needed a kernel + full D2H + host loop + kernel,
        src/StateVector.cu:260-314)."""
        self._check_qubit(qubit)
        key = self._next_key(key)
        fn = (
            _measure_and_collapse_donating
            if self.config.donate_state
            else measure_and_collapse
        )
        outcome, self._state = fn(self._state, key, qubit)
        return int(outcome)

    # -- observables ---------------------------------------------------------

    def expectation_pauli(self, pauli: str) -> float:
        """<psi| P |psi> for a Pauli string, e.g. ``"ZZ"`` or ``"XIY"``.

        The string reads like a ket: the rightmost character acts on qubit 0;
        strings shorter than ``num_qubits`` are padded with identities on the
        high qubits. Capability the reference lacked entirely — its only
        observables were probabilities.
        """
        pauli = pauli.upper()
        if len(pauli) > self.num_qubits or not set(pauli) <= set("IXYZ"):
            raise ValueError(f"invalid Pauli string {pauli!r}")
        ops = tuple(
            (len(pauli) - 1 - i, p) for i, p in enumerate(pauli) if p != "I"
        )  # (qubit, pauli) pairs; rightmost char = qubit 0
        if not ops:
            return 1.0
        return float(_pauli_expectation_jit(self._state, ops))

    def reduced_density_matrix(self, qubits) -> np.ndarray:
        """Partial trace of the pure state onto ``qubits``: a (2^k, 2^k)
        complex matrix with index bit j = ``qubits[j]`` (the library's
        qubit-q-=-bit-q convention). Computed on device as two MXU
        matmuls over the split planes (rho = M M^dagger for the
        (2^k, 2^(n-k)) reshaped state); only the 2^k x 2^k result is
        read back. Capability the reference lacked (its only
        observables were probabilities)."""
        qs = self._validated_subset(qubits)
        rr, ri = _reduced_dm_jit(self._state, qs, self.num_qubits)
        return np.asarray(rr).astype(np.float64) + 1j * np.asarray(
            ri
        ).astype(np.float64)

    def entanglement_entropy(self, qubits) -> float:
        """Von Neumann entropy S(rho_A) in bits (base 2) of the reduced
        state on ``qubits``: 0 for product states, 1 for a Bell pair's
        single qubit. Eigenvalues on host from the device-computed
        reduced density matrix."""
        rho = self.reduced_density_matrix(qubits)
        lam = np.clip(np.linalg.eigvalsh(rho).real, 0.0, 1.0)
        nz = lam[lam > 1e-12]
        return float(-(nz * np.log2(nz)).sum())

    def fidelity_with(self, other) -> float:
        """|<psi|phi>|^2 against another same-width pure-state simulator
        (or anything exposing (2, 2^n) ``state_planes``). On-device
        inner product; one scalar readback."""
        planes = self._peer_planes(other, (2, self.dim))
        return float(_fidelity_jit(self._state, planes))

    def _validated_subset(self, qubits) -> tuple:
        """Shared partial-trace subset validation (pure / DM / batched)."""
        qs = tuple(int(q) for q in qubits)
        for q in qs:
            self._check_qubit(q)
        if len(set(qs)) != len(qs):
            raise ValueError("duplicate qubits in partial-trace subset")
        if not (1 <= len(qs) <= 12):
            raise ValueError(
                "reduced density matrix supports 1..12 qubits "
                f"(2^k x 2^k output), got {len(qs)}"
            )
        return qs

    def _peer_planes(self, other, want_shape: tuple):
        """Resolve ``other`` to planes of ``want_shape``. Simulator peers
        are checked by register width FIRST — a raw shape test alone
        aliases across types (a 1-qubit rho's (2, 4) planes look exactly
        like a 2-qubit pure state) and would return garbage silently."""
        nq = getattr(other, "num_qubits", None)
        if nq is not None and nq != self.num_qubits:
            raise ValueError(
                f"register width mismatch: {nq} vs {self.num_qubits} qubits"
            )
        planes = getattr(other, "state_planes", other)
        if tuple(planes.shape) != want_shape:
            raise ValueError(
                f"state shape mismatch: {tuple(planes.shape)} vs {want_shape}"
            )
        return planes

    # -- checkpoint / resume -------------------------------------------------

    def save_state(self, path: str) -> None:
        """Checkpoint amplitudes + metadata to ``.npz`` (the durable superset
        of the reference's toHost/initializeBasis import-export surface,
        reference src/StateVector.cu:193-215; the reference had no persistent
        checkpointing at all)."""
        np.savez(
            path,
            planes=np.asarray(self._state),
            num_qubits=self.num_qubits,
            dtype=str(self._rdtype),
        )

    def load_state(self, path: str) -> None:
        """Restore a checkpoint written by :meth:`save_state`."""
        data = np.load(path)
        if int(data["num_qubits"]) != self.num_qubits:
            raise ValueError(
                f"checkpoint has {int(data['num_qubits'])} qubits, simulator "
                f"has {self.num_qubits}"
            )
        planes = np.asarray(data["planes"], dtype=self._rdtype)
        if planes.shape != self._state.shape:
            raise ValueError(f"checkpoint shape {planes.shape} mismatch")
        self._state = jnp.asarray(planes)

    # -- misc ---------------------------------------------------------------

    @property
    def memory_bytes(self) -> int:
        """Device bytes held by the state (planes x amplitudes x itemsize)."""
        return int(np.prod(self._state.shape)) * np.dtype(self._rdtype).itemsize

    def _check_qubit(self, qubit: int) -> None:
        if not (0 <= qubit < self.num_qubits):
            raise ValueError(f"qubit index {qubit} out of range")

    def block_until_ready(self):
        jax.block_until_ready(self._state)
        return self

    def sync(self) -> float:
        """Force execution to completion (scalar readback — the tunnel-proof
        synchronization point; ``block_until_ready`` alone may not drain
        remote TPU queues). Returns the total probability."""
        return float(_total_prob_jit(self._state))


def counts_to_histogram(samples: np.ndarray, dim: int) -> dict[int, int]:
    """Sample indices -> {index: count}; uses the native C++ single-pass
    counter when built, NumPy otherwise."""
    from . import native

    counts = native.histogram_native(samples, dim) if native.available() else None
    if counts is None:
        vals, cnts = np.unique(samples, return_counts=True)
        return {int(v): int(c) for v, c in zip(vals, cnts)}
    nz = np.nonzero(counts)[0]
    return {int(v): int(counts[v]) for v in nz}


# ---------------------------------------------------------------------------
# Shared jitted helpers (cached by jax on (shape, static args))
# ---------------------------------------------------------------------------


@jax.jit
def _probs_jit(state: jax.Array) -> jax.Array:
    return ap.probabilities(state)


@jax.jit
def _total_prob_jit(state: jax.Array) -> jax.Array:
    return ap.total_probability(state)


@partial(jax.jit, static_argnums=(1,))
def _marginal_jit(state: jax.Array, qubit: int) -> jax.Array:
    return ap.qubit_marginal(state, qubit)


@partial(jax.jit, static_argnums=(1,))
def _pauli_expectation_jit(state: jax.Array, ops: tuple) -> jax.Array:
    import numpy as _np

    from .gates import gate_matrix

    transformed = state
    for qubit, p in ops:
        ur, ui = ap.split_matrix(
            gate_matrix(p.lower()), _np.dtype(state.dtype)
        )
        transformed = ap.apply_unitary(transformed, ur, ui, (qubit,))
    re, _ = ap.inner_product(state, transformed)
    return re


@partial(jax.jit, static_argnums=(2,))
def sample_from_state(state: jax.Array, key: jax.Array, shots: int) -> jax.Array:
    p = ap.probabilities(state)
    logp = jnp.log(jnp.maximum(p, jnp.finfo(p.dtype).tiny))
    return jax.random.categorical(key, logp, shape=(shots,)).astype(jnp.int32)


def _measure_and_collapse(
    state: jax.Array, key: jax.Array, qubit: int
) -> tuple[jax.Array, jax.Array]:
    p1 = ap.qubit_marginal(state, qubit)
    outcome = jax.random.bernoulli(key, jnp.clip(p1, 0.0, 1.0))
    p_outcome = jnp.where(outcome, p1, 1.0 - p1)
    new_state = ap.collapse(state, qubit, outcome, p_outcome)
    return outcome.astype(jnp.int32), new_state


@partial(jax.jit, static_argnums=(1, 2))
def _reduced_dm_jit(state: jax.Array, qs: tuple, n: int):
    """rho_A = M M^dagger over split planes: M is the (2^k, 2^(n-k))
    reshape with kept qubits fronted (row bit j = qs[j]; reshape axis a
    of the (2,)*n view is state bit n-1-a)."""

    k = len(qs)
    front = [n - 1 - q for q in reversed(qs)]
    rest = [a for a in range(n) if a not in front]
    perm = front + rest
    shape = (1 << k, 1 << (n - k))

    def m_of(plane):
        return plane.reshape((2,) * n).transpose(perm).reshape(shape)

    mr, mi = m_of(state[0]), m_of(state[1])
    hi = jax.lax.Precision.HIGHEST
    rr = jnp.matmul(mr, mr.T, precision=hi) + jnp.matmul(
        mi, mi.T, precision=hi
    )
    ri = jnp.matmul(mi, mr.T, precision=hi) - jnp.matmul(
        mr, mi.T, precision=hi
    )
    return rr, ri


@jax.jit
def _fidelity_jit(a: jax.Array, b: jax.Array) -> jax.Array:

    re = jnp.sum(a[0] * b[0] + a[1] * b[1])
    im = jnp.sum(a[0] * b[1] - a[1] * b[0])
    return re * re + im * im


# Two compiled variants, selected by SimConfig.donate_state: donation keeps
# the in-place update but invalidates any caller-held reference to the input
# planes — the same aliasing footgun deliberately avoided elsewhere (see
# kernels/fused_circuit.build_pallas_run).
measure_and_collapse = partial(jax.jit, static_argnums=(2,))(_measure_and_collapse)
_measure_and_collapse_donating = partial(
    jax.jit, static_argnums=(2,), donate_argnums=(0,)
)(_measure_and_collapse)
