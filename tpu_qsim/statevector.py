"""Jit-compiled state-vector simulator — the flagship execution path.

Where the reference launches one CUDA kernel per gate and relies on stream
ordering (reference src/Simulator.cu:28-98), this simulator traces the whole
circuit — after gate fusion — into a single XLA program: one dispatch, full
operator fusion, buffer donation for in-place amplitude updates. Measurement,
sampling and probability readout are separate jitted programs that stay on
device (the reference pulled the full 2^n probability array to the host and
reduced it there; reference src/StateVector.cu:275-287).

State lives on device as split real/imag float planes (see
:mod:`tpu_qsim.apply` for why this is the TPU-native representation); the
public API speaks complex numpy at the host boundary.

All randomness is explicit: the simulator owns a ``jax.random`` key chain
seeded at construction (fixing the reference's unseeded ``std::random_device``
measurement RNG, reference src/StateVector.cu:290-292).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import numpy as np

import jax
import jax.numpy as jnp

from . import apply as ap
from .circuit import Circuit
from .config import DEFAULT_CONFIG, SimConfig
from .fusion import FusedGate, fuse_circuit, unfused_circuit


def build_xla_run_fn(
    groups: list[FusedGate], rdtype: np.dtype, donate: bool
) -> Callable[[jax.Array], jax.Array]:
    """Compile a fused group list into one jitted planes-state -> planes-state
    program. Group matrices are baked in as NumPy constants (host-composed in
    complex128, split into real/imag at the simulator's real dtype)."""

    consts: list[tuple[tuple[int, ...], bool, np.ndarray, np.ndarray | None]] = []
    for g in groups:
        mat = g.diag if g.diagonal else g.matrix
        ur, ui = ap.split_matrix(mat, rdtype)
        consts.append((g.qubits, g.diagonal, ur, ui))

    def step(state: jax.Array) -> jax.Array:
        for qubits, diagonal, ur, ui in consts:
            if diagonal:
                state = ap.apply_diagonal(state, ur, ui, qubits)
            else:
                state = ap.apply_unitary(state, ur, ui, qubits)
        return state

    return jax.jit(step, donate_argnums=(0,) if donate else ())


class StateVectorSimulator:
    """Exact pure-state simulator (TPU analog of reference ``Simulator``,
    include/Simulator.hpp:53-85)."""

    def __init__(
        self,
        num_qubits: int,
        config: SimConfig = DEFAULT_CONFIG,
        *,
        seed: int = 0,
    ):
        if num_qubits < 1:
            raise ValueError("num_qubits must be >= 1")
        self.num_qubits = int(num_qubits)
        self.dim = 1 << self.num_qubits
        self.config = config
        self._rdtype = config.real_dtype
        self._key = jax.random.PRNGKey(seed)
        self._run_cache: dict[Any, Callable] = {}
        self._state = ap.initial_state(self.num_qubits, self._rdtype)

    # -- key chain ----------------------------------------------------------

    def _next_key(self, key: jax.Array | None) -> jax.Array:
        if key is not None:
            return key
        self._key, sub = jax.random.split(self._key)
        return sub

    # -- state management ---------------------------------------------------

    def reset(self, basis_index: int = 0) -> None:
        if not (0 <= basis_index < self.dim):
            raise ValueError(f"basis index {basis_index} out of range")
        self._state = ap.initial_state(self.num_qubits, self._rdtype, basis_index)

    @property
    def state_planes(self) -> jax.Array:
        """Device-resident (2, 2^n) [real, imag] amplitude planes."""
        return self._state

    def get_state(self) -> np.ndarray:
        """Device -> host complex amplitude copy (analog of
        StateVector::toHost, reference src/StateVector.cu:204-215)."""
        return ap.to_complex(self._state)

    def set_state(self, amplitudes: Any) -> None:
        amplitudes = np.asarray(amplitudes)
        if amplitudes.shape != (self.dim,):
            raise ValueError(f"state must have shape ({self.dim},)")
        self._state = ap.from_complex(amplitudes, self._rdtype)

    # -- circuit execution --------------------------------------------------

    def _compiled_run(self, circuit: Circuit) -> Callable:
        key = circuit.signature()
        fn = self._run_cache.get(key)
        if fn is None:
            if self.config.fuse:
                groups = fuse_circuit(circuit, self.config.max_fused_qubits)
            else:
                groups = unfused_circuit(circuit)
            fn = self._dispatch_backend(groups)
            self._run_cache[key] = fn
        return fn

    def _dispatch_backend(self, groups: list[FusedGate]) -> Callable:
        if self.config.use_pallas:
            try:
                from .kernels.dispatch import maybe_build_pallas_run

                fn = maybe_build_pallas_run(
                    groups, self.num_qubits, self._rdtype, self.config
                )
                if fn is not None:
                    return fn
            except ImportError:
                pass
        return build_xla_run_fn(groups, self._rdtype, self.config.donate_state)

    def run(self, circuit: Circuit) -> "StateVectorSimulator":
        """Apply every gate of ``circuit`` to the current state.

        Does not reset first (same contract as reference Simulator::run,
        src/Simulator.cu:28-36). Compilation is cached per circuit signature.
        """
        if circuit.num_qubits != self.num_qubits:
            raise ValueError(
                f"circuit has {circuit.num_qubits} qubits, simulator has "
                f"{self.num_qubits}"
            )
        self._state = self._compiled_run(circuit)(self._state)
        return self

    def apply_gate(self, name: str, *qubits: int, param: float | None = None) -> None:
        """Single-gate convenience (compiles/caches a 1-gate circuit)."""
        c = Circuit(self.num_qubits).add(name, *qubits, param=param)
        self.run(c)

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
        return _sample_jit(self._state, key, shots)

    def histogram(self, shots: int, key: jax.Array | None = None) -> dict[int, int]:
        samples = np.asarray(self.sample(shots, key))
        vals, counts = np.unique(samples, return_counts=True)
        return {int(v): int(c) for v, c in zip(vals, counts)}

    def measure_qubit(self, qubit: int, key: jax.Array | None = None) -> int:
        """Measure one qubit; collapse the state; return 0 or 1.

        One fused jit program: marginal -> bernoulli -> masked renormalize
        (the reference needed a kernel + full D2H + host loop + kernel,
        src/StateVector.cu:260-314)."""
        self._check_qubit(qubit)
        key = self._next_key(key)
        outcome, self._state = _measure_jit(self._state, key, qubit)
        return int(outcome)

    # -- misc ---------------------------------------------------------------

    def _check_qubit(self, qubit: int) -> None:
        if not (0 <= qubit < self.num_qubits):
            raise ValueError(f"qubit index {qubit} out of range")

    def block_until_ready(self) -> "StateVectorSimulator":
        jax.block_until_ready(self._state)
        return self


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


@partial(jax.jit, static_argnums=(2,))
def _sample_jit(state: jax.Array, key: jax.Array, shots: int) -> jax.Array:
    p = ap.probabilities(state)
    logp = jnp.log(jnp.maximum(p, jnp.finfo(p.dtype).tiny))
    return jax.random.categorical(key, logp, shape=(shots,)).astype(jnp.int32)


@partial(jax.jit, static_argnums=(2,), donate_argnums=(0,))
def _measure_jit(
    state: jax.Array, key: jax.Array, qubit: int
) -> tuple[jax.Array, jax.Array]:
    p1 = ap.qubit_marginal(state, qubit)
    outcome = jax.random.bernoulli(key, jnp.clip(p1, 0.0, 1.0))
    p_outcome = jnp.where(outcome, p1, 1.0 - p1)
    new_state = ap.collapse(state, qubit, outcome, p_outcome)
    return outcome.astype(jnp.int32), new_state
