"""Monte-Carlo wavefunction (trajectory) simulation.

``NoisySimulator`` is the analog of the reference's curand-based Monte-Carlo
simulator (reference include/NoiseModel.cuh:139-214) and ``BatchedSimulator``
of its batched-trajectory variant (include/NoiseModel.cuh:231-297) — with two
deliberate upgrades over the reference:

1. **Textbook MCWF unraveling.** One Kraus branch is drawn per channel
   application per trajectory and applied to the whole state (with Born-rule
   branch probabilities for non-unitary Kraus sets). The reference instead
   flipped an independent coin per amplitude *pair* inside one trajectory
   (src/NoiseModel.cu:185-218; SURVEY quirk #3), which is not a valid
   unraveling of the channel.
2. **Full coverage by construction.** The batched path is ``jax.vmap`` of the
   single-trajectory step over a key axis, so every gate and every channel
   works batched — the reference's hand-written batched kernels covered only
   X/Y/Z/H, CNOT and depolarizing (src/NoiseModel.cu:742-892; SURVEY quirk
   #4), and its "global" channels were dead code (quirk #2).

Noise insertion points follow the reference's NoisySimulator semantics: after
every gate, every registered channel fires once per qubit it covers
(src/NoiseModel.cu:369-382, 573-577). Gates are therefore applied unfused
(fusing across an insertion point would change the physics).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import numpy as np

import jax
import jax.numpy as jnp

from . import apply as ap
from .base import BaseSimulator, sample_from_state
from .circuit import Circuit
from .config import DEFAULT_CONFIG, SimConfig
from .fusion import unfused_circuit
from .noise import (
    NoiseModel,
    UNITARY_MIX_TYPES,
    kraus_operators,
    unitary_mix,
)


# ---------------------------------------------------------------------------
# Channel application inside jit
# ---------------------------------------------------------------------------

def _apply_unitary_mix(
    state: jax.Array,
    key: jax.Array,
    probs: np.ndarray,
    urs: np.ndarray,
    uis: np.ndarray | None,
    qubit: int,
) -> jax.Array:
    """Pauli-type channel: draw a branch (state-independent probs), apply the
    selected 2x2 unitary. One gate application regardless of branch count —
    the branch matrices are blended with a one-hot instead of lax.switch so
    the compiled program stays a single contraction."""
    b = probs.shape[0]
    logp = np.log(np.maximum(probs, 1e-30)).astype(np.float32)
    idx = jax.random.categorical(key, jnp.asarray(logp))
    onehot = jax.nn.one_hot(idx, b, dtype=state.dtype)
    mr = jnp.tensordot(onehot, jnp.asarray(urs), axes=(0, 0))
    if uis is None:
        return ap.apply_unitary(state, mr, None, (qubit,))
    mi = jnp.tensordot(onehot, jnp.asarray(uis), axes=(0, 0))
    return ap.apply_unitary(state, mr, mi, (qubit,))


def _apply_general_kraus(
    state: jax.Array,
    key: jax.Array,
    kraus: list[tuple[np.ndarray, np.ndarray | None]],
    qubit: int,
) -> jax.Array:
    """General channel (damping): compute every Kraus branch, draw one with
    Born probability ||K_b psi||^2, renormalize. B branch applications."""
    branches = [ap.apply_unitary(state, kr, ki, (qubit,)) for kr, ki in kraus]
    stacked = jnp.stack(branches)                      # [B, 2, dim]
    norms = jnp.sum(stacked * stacked, axis=(1, 2))    # [B]
    logp = jnp.log(jnp.maximum(norms, jnp.finfo(state.dtype).tiny))
    idx = jax.random.categorical(key, logp)
    onehot = jax.nn.one_hot(idx, stacked.shape[0], dtype=state.dtype)
    picked = jnp.tensordot(onehot, stacked, axes=(0, 0))
    norm = jnp.maximum(jnp.sum(onehot * norms), jnp.finfo(state.dtype).tiny)
    return picked * jax.lax.rsqrt(norm).astype(state.dtype)


# A channel covering this many qubits or more is applied as ONE lax.scan
# layer (O(1) traced subgraphs) instead of per-qubit unrolled applications
# (O(n) subgraphs per gate — a 26q circuit with one global channel used to
# trace 2,600 channel subgraphs per 100 gates).
GLOBAL_SCAN_MIN = 8


def _rotate_bits_right(w: jax.Array) -> jax.Array:
    """(2, 2^(n-1), 2) planes view: move bit 0 to the MSB position.

    Flat index before: i = rest * 2 + bit0; after: i' = bit0 * 2^(n-1) +
    rest — i.e. every bit q+1 becomes bit q and bit 0 becomes bit n-1. n
    applications restore the original order."""
    rest = w.shape[1]
    return w.transpose(0, 2, 1).reshape(2, rest, 2)


def _mix_layer_scan(
    state: jax.Array,
    key: jax.Array,
    probs: np.ndarray,
    urs: np.ndarray,
    uis: np.ndarray | None,
    n: int,
) -> jax.Array:
    """Global Pauli-mix channel on all n qubits as one scan.

    Branch indices for every qubit are drawn in one categorical call, the
    selected 2x2s in one tensordot; the scan body applies the step's matrix
    to bit 0 and rotates the bit order right by one, so step t acts on
    original qubit t and the layout is restored after n steps. The body is
    qubit-independent — one traced subgraph per layer regardless of n."""
    b = probs.shape[0]
    logp = np.log(np.maximum(probs, 1e-30)).astype(np.float32)
    idx = jax.random.categorical(key, jnp.asarray(logp), shape=(n,))
    onehot = jax.nn.one_hot(idx, b, dtype=state.dtype)              # (n, B)
    mrs = jnp.tensordot(onehot, jnp.asarray(urs), axes=(1, 0))      # (n,2,2)
    zi = np.zeros_like(urs) if uis is None else uis
    mis = jnp.tensordot(onehot, jnp.asarray(zi), axes=(1, 0))
    mats = jnp.stack([mrs, mis], axis=1)                            # (n,2,2,2)

    v = state.reshape(2, state.shape[-1] // 2, 2)

    def body(w, m):
        mr, mi = m[0], m[1]
        wr, wi = w[0], w[1]
        nr = wr @ mr.T - wi @ mi.T
        ni = wr @ mi.T + wi @ mr.T
        return _rotate_bits_right(jnp.stack([nr, ni])), None

    v, _ = jax.lax.scan(body, v, mats)
    return v.reshape(state.shape)


def _kraus_layer_scan(
    state: jax.Array,
    key: jax.Array,
    kraus: list[tuple[np.ndarray, np.ndarray | None]],
    n: int,
) -> jax.Array:
    """Global general-Kraus (damping) channel on all n qubits as one scan.

    Same bit-rotation body as the mix layer, but each step computes every
    Kraus branch on bit 0, draws the branch with Born probability
    ||K_b psi||^2 and renormalizes — the per-qubit math of
    _apply_general_kraus, one traced subgraph per layer."""
    kr = jnp.stack([k for k, _ in kraus])                           # (B,2,2)
    ki = jnp.stack(
        [np.zeros_like(kraus[0][0]) if k is None else k for _, k in kraus]
    )
    keys = jax.random.split(key, n)
    v = state.reshape(2, state.shape[-1] // 2, 2)

    def body(w, k):
        wr, wi = w[0], w[1]
        brs = jnp.einsum("rb,Bcb->Brc", wr, kr) - jnp.einsum(
            "rb,Bcb->Brc", wi, ki
        )
        bis = jnp.einsum("rb,Bcb->Brc", wr, ki) + jnp.einsum(
            "rb,Bcb->Brc", wi, kr
        )
        norms = jnp.sum(brs * brs + bis * bis, axis=(1, 2))         # (B,)
        logp = jnp.log(jnp.maximum(norms, jnp.finfo(wr.dtype).tiny))
        idx = jax.random.categorical(k, logp)
        onehot = jax.nn.one_hot(idx, norms.shape[0], dtype=wr.dtype)
        nr = jnp.tensordot(onehot, brs, axes=(0, 0))
        ni = jnp.tensordot(onehot, bis, axes=(0, 0))
        norm = jnp.maximum(
            jnp.sum(onehot * norms), jnp.finfo(wr.dtype).tiny
        )
        scale = jax.lax.rsqrt(norm).astype(wr.dtype)
        return _rotate_bits_right(jnp.stack([nr * scale, ni * scale])), None

    v, _ = jax.lax.scan(body, v, keys)
    return v.reshape(state.shape)


def build_trajectory_step(
    circuit: Circuit,
    noise_model: NoiseModel | None,
    rdtype: np.dtype,
    insertion: str = "all",
) -> tuple[Callable[[jax.Array, jax.Array], jax.Array], int]:
    """Build the pure (state, key) -> state single-trajectory function.

    Returns (step_fn, num_random_draws). The function is vmap/jit friendly;
    gate matrices and channel tables are baked in as NumPy constants.

    Channels covering every qubit (global registrations) on circuits of
    >= GLOBAL_SCAN_MIN qubits are applied as one scan layer per gate —
    same math and same per-qubit application order, ~n x fewer traced ops.
    """
    if insertion not in ("all", "gate_qubits"):
        raise ValueError(
            f"insertion must be 'all' or 'gate_qubits', got {insertion!r}"
        )
    n = circuit.num_qubits
    gate_consts = []
    for g in unfused_circuit(circuit):
        ur, ui = ap.split_matrix(g.diag if g.diagonal else g.matrix, rdtype)
        gate_consts.append((g.qubits, g.diagonal, ur, ui))

    noise_apps: list[tuple[Any, ...]] = []
    if noise_model is not None and noise_model.has_noise():
        for c in noise_model.channels:
            p = c.probability
            if p == 0.0:
                continue
            qs = c.resolved_qubits(n)
            # the scan layer covers all qubits at once, which is only
            # equivalent under the "all" insertion policy ("gate_qubits"
            # filters applications per gate)
            as_scan = (
                insertion == "all"
                and len(qs) == n
                and n >= GLOBAL_SCAN_MIN
            )
            if c.type in UNITARY_MIX_TYPES:
                probs, us = unitary_mix(c.type, p)
                urs = us.real.astype(rdtype)
                uis = us.imag.astype(rdtype) if np.any(us.imag != 0) else None
                if as_scan:
                    noise_apps.append(("mix_scan", None, probs, urs, uis))
                else:
                    for q in qs:
                        noise_apps.append(("mix", q, probs, urs, uis))
            else:
                kraus = [
                    ap.split_matrix(k, rdtype)
                    for k in kraus_operators(c.type, p)
                ]
                if as_scan:
                    noise_apps.append(("kraus_scan", None, kraus))
                else:
                    for q in qs:
                        noise_apps.append(("kraus", q, kraus))

    # Insertion policy (see NoiseModel docstring): "all" fires every
    # registered application after every gate (reference NoisySimulator,
    # src/NoiseModel.cu:573-577); "gate_qubits" fires only applications on
    # the gate's own qubits (reference DensityMatrixSimulator,
    # src/DensityMatrix.cu:201-212). Exposing both on every backend lets
    # MCWF and DM be cross-validated in the regimes where the reference's
    # two conventions disagree.
    per_gate_apps = [
        noise_apps
        if insertion == "all"
        else [a for a in noise_apps if a[1] in qubits]
        for qubits, _, _, _ in gate_consts
    ]
    n_draws = sum(len(a) for a in per_gate_apps)

    def step(state: jax.Array, key: jax.Array) -> jax.Array:
        keys = jax.random.split(key, n_draws) if n_draws else None
        ki = 0
        for (qubits, diagonal, ur, ui), apps in zip(gate_consts, per_gate_apps):
            if diagonal:
                state = ap.apply_diagonal(state, ur, ui, qubits)
            else:
                state = ap.apply_unitary(state, ur, ui, qubits)
            for app in apps:
                if app[0] == "mix":
                    _, q, probs, urs, uis = app
                    state = _apply_unitary_mix(state, keys[ki], probs, urs, uis, q)
                elif app[0] == "mix_scan":
                    _, _, probs, urs, uis = app
                    state = _mix_layer_scan(state, keys[ki], probs, urs, uis, n)
                elif app[0] == "kraus_scan":
                    _, _, kraus = app
                    state = _kraus_layer_scan(state, keys[ki], kraus, n)
                else:
                    _, q, kraus = app
                    state = _apply_general_kraus(state, keys[ki], kraus, q)
                ki += 1
        return state

    return step, n_draws


class NoisySimulator(BaseSimulator):
    """Single-trajectory Monte-Carlo wavefunction simulator (analog of
    reference ``NoisySimulator``, include/NoiseModel.cuh:139-214)."""

    def __init__(
        self,
        num_qubits: int,
        noise_model: NoiseModel | None = None,
        config: SimConfig = DEFAULT_CONFIG,
        *,
        seed: int = 0,
        insertion: str = "all",
    ):
        """``insertion``: noise-application policy — "all" (default;
        reference NoisySimulator semantics) or "gate_qubits" (the reference
        DM simulator's convention). See the NoiseModel docstring."""
        super().__init__(num_qubits, config, seed=seed)
        self.noise_model = noise_model if noise_model is not None else NoiseModel()
        self.insertion = insertion
        self._run_cache: dict[Any, Callable] = {}

    def _compiled_run(self, circuit: Circuit) -> Callable:
        key = (circuit.signature(), self.noise_model.signature(), self.insertion)
        fn = self._run_cache.get(key)
        if fn is None:
            step, _ = build_trajectory_step(
                circuit, self.noise_model, self._rdtype, self.insertion
            )
            fn = jax.jit(step, donate_argnums=(0,) if self.config.donate_state else ())
            self._run_cache[key] = fn
        return fn

    def run(self, circuit: Circuit, key: jax.Array | None = None) -> "NoisySimulator":
        """Run one stochastic trajectory (reference src/NoiseModel.cu:369-382)."""
        if circuit.num_qubits != self.num_qubits:
            raise ValueError(
                f"circuit has {circuit.num_qubits} qubits, simulator has "
                f"{self.num_qubits}"
            )
        self._state = self._compiled_run(circuit)(self._state, self._next_key(key))
        return self


class BatchedSimulator(BaseSimulator):
    """Many parallel trajectories = ``vmap`` over a PRNG-key axis (analog of
    reference ``BatchedSimulator``, include/NoiseModel.cuh:231-297).

    The state is a (batch, 2, 2^n) planes array. Averaging, per-trajectory
    probabilities, sampling and histograms all stay on device.
    """

    def __init__(
        self,
        num_qubits: int,
        batch_size: int,
        noise_model: NoiseModel | None = None,
        config: SimConfig = DEFAULT_CONFIG,
        *,
        seed: int = 0,
        insertion: str = "all",
    ):
        if batch_size < 1:
            raise ValueError("batch_size must be >= 1")
        super().__init__(num_qubits, config, seed=seed)
        self.batch_size = int(batch_size)
        self.noise_model = noise_model if noise_model is not None else NoiseModel()
        self.insertion = insertion
        self._run_cache: dict[Any, Callable] = {}
        self._states = self._initial_batch()

    def _initial_batch(self) -> jax.Array:
        one = ap.initial_state(self.num_qubits, self._rdtype)
        return jnp.broadcast_to(one, (self.batch_size,) + one.shape)

    def reset(self, basis_index: int = 0) -> None:
        if not (0 <= basis_index < self.dim):
            raise ValueError(f"basis index {basis_index} out of range")
        one = ap.initial_state(self.num_qubits, self._rdtype, basis_index)
        self._states = jnp.broadcast_to(one, (self.batch_size,) + one.shape)

    # -- execution ----------------------------------------------------------

    def _compiled_run(self, circuit: Circuit) -> Callable:
        cache_key = (
            circuit.signature(), self.noise_model.signature(), self.insertion
        )
        fn = self._run_cache.get(cache_key)
        if fn is None:
            step, _ = build_trajectory_step(
                circuit, self.noise_model, self._rdtype, self.insertion
            )
            fn = jax.jit(
                jax.vmap(step),
                donate_argnums=(0,) if self.config.donate_state else (),
            )
            self._run_cache[cache_key] = fn
        return fn

    def run(self, circuit: Circuit, key: jax.Array | None = None) -> "BatchedSimulator":
        """Advance every trajectory through ``circuit`` with independent
        noise randomness (reference src/NoiseModel.cu:815-831 — but every
        gate type and channel works here)."""
        if circuit.num_qubits != self.num_qubits:
            raise ValueError(
                f"circuit has {circuit.num_qubits} qubits, simulator has "
                f"{self.num_qubits}"
            )
        keys = jax.random.split(self._next_key(key), self.batch_size)
        self._states = self._compiled_run(circuit)(self._states, keys)
        return self

    # -- readout (batch-aware overrides) ------------------------------------

    @property
    def state_planes(self) -> jax.Array:
        return self._states

    def get_state(self) -> np.ndarray:
        """(batch, 2^n) complex trajectory amplitudes."""
        flat = np.asarray(self._states)
        ctype = np.complex64 if flat.dtype == np.float32 else np.complex128
        return (flat[:, 0] + 1j * flat[:, 1]).astype(ctype)

    def trajectory_probabilities(self) -> jax.Array:
        """(batch, 2^n) per-trajectory probabilities (reference
        getTrajectoryProbabilities, src/NoiseModel.cu:916-936)."""
        return _batch_probs_jit(self._states)

    def probabilities(self) -> jax.Array:
        """Batch-averaged probabilities (reference getAverageProbabilities,
        src/NoiseModel.cu:894-914 — but averaged on device)."""
        return _avg_probs_jit(self._states)

    def average_probabilities(self) -> np.ndarray:
        return np.asarray(self.probabilities())

    def total_probability(self) -> float:
        return float(jnp.mean(jnp.sum(self._states * self._states, axis=(1, 2))))

    def sample(self, shots: int, key: jax.Array | None = None) -> jax.Array:
        """(batch, shots) samples, one draw stream per trajectory."""
        if shots < 1:
            raise ValueError("shots must be >= 1")
        keys = jax.random.split(self._next_key(key), self.batch_size)
        return _batch_sample_jit(self._states, keys, shots)

    def histogram(self, shots: int, key: jax.Array | None = None) -> dict[int, int]:
        """Aggregate histogram over all trajectories; total counts =
        batch_size * shots (reference getHistogram, src/NoiseModel.cu:
        952-972)."""
        from .base import counts_to_histogram

        samples = np.asarray(self.sample(shots, key)).ravel()
        return counts_to_histogram(samples, self.dim)

    def measure_qubit(self, qubit: int, key: jax.Array | None = None) -> np.ndarray:
        """Per-trajectory projective measurement with collapse.

        Every trajectory draws its own Born-rule outcome and collapses
        independently (one vmapped measure-and-collapse); returns the
        (batch,) int32 outcome vector. The uniform ``measureQubit`` surface
        the reference exposed on every simulator (include/NoiseModel.cuh:
        139-297) — its BatchedSimulator never implemented it.
        """
        self._check_qubit(qubit)
        keys = jax.random.split(self._next_key(key), self.batch_size)
        outcomes, self._states = _batch_measure_jit(self._states, keys, qubit)
        return np.asarray(outcomes)

    def qubit_probability(self, qubit: int) -> float:
        self._check_qubit(qubit)
        p = np.asarray(self.probabilities())
        mask = ((np.arange(self.dim) >> qubit) & 1).astype(bool)
        return float(p[mask].sum())

    def reduced_density_matrix(self, qubits) -> np.ndarray:
        """ENSEMBLE reduced density matrix: the trajectory average of the
        per-trajectory partial traces — i.e. the partial trace of
        rho_ens = mean_t |psi_t><psi_t| (the MCWF estimate of the exact
        channel rho). Batch-aware override of the pure-state version;
        ``entanglement_entropy`` inherits through it and therefore
        reports noise-averaged subsystem entropy."""
        qs = self._validated_subset(qubits)
        rr, ri = _batch_reduced_dm_jit(self._states, qs, self.num_qubits)
        return np.asarray(rr).astype(np.float64) + 1j * np.asarray(
            ri
        ).astype(np.float64)

    def fidelity_with(self, other) -> float:
        """Mean trajectory fidelity against a pure state: the average of
        |<psi_t|phi>|^2 over the batch = <phi| rho_ens |phi>."""
        from .base import _fidelity_jit

        planes = self._peer_planes(other, (2, self.dim))
        return float(
            jnp.mean(jax.vmap(lambda s: _fidelity_jit(s, planes))(self._states))
        )

    @property
    def total_memory_bytes(self) -> int:
        """Device bytes held by the trajectory batch (analog of reference
        getTotalMemoryBytes, include/NoiseModel.cuh:272)."""
        return self.batch_size * 2 * self.dim * np.dtype(self._rdtype).itemsize

    # -- batch-aware overrides of single-state BaseSimulator methods --------
    # (the inherited versions would silently read/write the unused single
    # `_state` buffer)

    @property
    def memory_bytes(self) -> int:
        return self.total_memory_bytes

    def set_state(self, amplitudes: Any) -> None:
        """Start every trajectory from the given pure state."""
        amplitudes = np.asarray(amplitudes)
        if amplitudes.shape != (self.dim,):
            raise ValueError(f"state must have shape ({self.dim},)")
        one = ap.from_complex(amplitudes, self._rdtype)
        self._states = jnp.broadcast_to(one, (self.batch_size,) + one.shape)

    def expectation_pauli(self, pauli: str) -> float:
        """Trajectory-ensemble estimator: mean over trajectories of
        <psi_t| P |psi_t> (converges to tr(rho P))."""
        pauli = pauli.upper()
        if len(pauli) > self.num_qubits or not set(pauli) <= set("IXYZ"):
            raise ValueError(f"invalid Pauli string {pauli!r}")
        ops = tuple(
            (len(pauli) - 1 - i, p) for i, p in enumerate(pauli) if p != "I"
        )
        if not ops:
            return 1.0
        from .base import _pauli_expectation_jit

        vals = jax.vmap(lambda s: _pauli_expectation_jit(s, ops))(self._states)
        return float(jnp.mean(vals))

    def save_state(self, path: str) -> None:
        np.savez(
            path,
            planes=np.asarray(self._states),
            num_qubits=self.num_qubits,
            batch_size=self.batch_size,
            dtype=str(self._rdtype),
        )

    def load_state(self, path: str) -> None:
        data = np.load(path)
        if int(data["num_qubits"]) != self.num_qubits:
            raise ValueError("checkpoint qubit count mismatch")
        if int(data.get("batch_size", -1)) != self.batch_size:
            raise ValueError("checkpoint batch size mismatch")
        planes = np.asarray(data["planes"], dtype=self._rdtype)
        if planes.shape != self._states.shape:
            raise ValueError("checkpoint shape mismatch")
        self._states = jnp.asarray(planes)

    def sync(self) -> float:
        return self.total_probability()

    def block_until_ready(self):
        jax.block_until_ready(self._states)
        return self


@jax.jit
def _batch_probs_jit(states: jax.Array) -> jax.Array:
    return states[:, 0] * states[:, 0] + states[:, 1] * states[:, 1]


@partial(jax.jit, static_argnums=(2,))
def _batch_measure_jit(
    states: jax.Array, keys: jax.Array, qubit: int
) -> tuple[jax.Array, jax.Array]:
    from .base import _measure_and_collapse

    return jax.vmap(lambda s, k: _measure_and_collapse(s, k, qubit))(
        states, keys
    )


@partial(jax.jit, static_argnums=(1, 2))
def _batch_reduced_dm_jit(states: jax.Array, qs: tuple, n: int):
    """Ensemble reduced rho = (1/B) sum_t M_t M_t^dagger, computed as ONE
    matmul pair by folding the batch axis into the traced columns
    (M = (2^k, B * 2^(n-k))) — a vmapped per-trajectory version would
    materialize (B, 2^k, 2^k) intermediates (~GBs at k >= 10)."""
    B = states.shape[0]
    k = len(qs)
    front = [n - 1 - q for q in reversed(qs)]
    rest = [a for a in range(n) if a not in front]

    def m_of(planes):  # (B, 2^n) -> (2^k, 2^(n-k) * B)
        v = planes.reshape((B,) + (2,) * n)
        v = v.transpose([1 + a for a in front] + [1 + a for a in rest] + [0])
        return v.reshape(1 << k, (1 << (n - k)) * B)

    mr, mi = m_of(states[:, 0]), m_of(states[:, 1])
    hi = jax.lax.Precision.HIGHEST
    rr = (
        jnp.matmul(mr, mr.T, precision=hi)
        + jnp.matmul(mi, mi.T, precision=hi)
    ) / B
    ri = (
        jnp.matmul(mi, mr.T, precision=hi)
        - jnp.matmul(mr, mi.T, precision=hi)
    ) / B
    return rr, ri


@jax.jit
def _avg_probs_jit(states: jax.Array) -> jax.Array:
    return jnp.mean(states[:, 0] * states[:, 0] + states[:, 1] * states[:, 1], axis=0)


@partial(jax.jit, static_argnums=(2,))
def _batch_sample_jit(states: jax.Array, keys: jax.Array, shots: int) -> jax.Array:
    return jax.vmap(lambda s, k: sample_from_state(s, k, shots))(states, keys)
