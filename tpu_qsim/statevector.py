"""Jit-compiled state-vector simulator — the flagship execution path.

Where the reference launches one CUDA kernel per gate and relies on stream
ordering (reference src/Simulator.cu:28-98), this simulator traces the whole
circuit — after gate fusion — into a single XLA program: one dispatch, full
operator fusion, buffer donation for in-place amplitude updates. Measurement,
sampling and probability readout are separate jitted programs that stay on
device (see :class:`tpu_qsim.base.BaseSimulator`).

State lives on device as split real/imag float planes (see
:mod:`tpu_qsim.apply` for why that is the TPU-native representation); the
public API speaks complex numpy at the host boundary.
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
from .fusion import FusedGate, fuse_circuit, unfused_circuit


def build_xla_run_fn(
    groups: list[FusedGate], rdtype: np.dtype, donate: bool,
    renorm_every: int = 0,
) -> Callable[[jax.Array], jax.Array]:
    """Compile a fused group list into one jitted planes-state -> planes-state
    program. Group matrices are baked in as NumPy constants (host-composed in
    complex128, split into real/imag at the simulator's real dtype).
    ``renorm_every``: insert a renormalization every N groups (deep-circuit
    norm-drift mitigation; see SimConfig.renorm_every)."""

    consts: list[tuple[tuple[int, ...], bool, np.ndarray, np.ndarray | None]] = []
    for g in groups:
        mat = g.diag if g.diagonal else g.matrix
        ur, ui = ap.split_matrix(mat, rdtype)
        consts.append((g.qubits, g.diagonal, ur, ui))

    def step(state: jax.Array) -> jax.Array:
        for i, (qubits, diagonal, ur, ui) in enumerate(consts):
            if diagonal:
                state = ap.apply_diagonal(state, ur, ui, qubits)
            else:
                state = ap.apply_unitary(state, ur, ui, qubits)
            if renorm_every and (i + 1) % renorm_every == 0:
                norm = jnp.sum(state * state)
                state = state * jax.lax.rsqrt(
                    jnp.maximum(norm, jnp.finfo(state.dtype).tiny)
                ).astype(state.dtype)
        return state

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def build_parameterized_run_fn(
    circuit: Circuit, rdtype: np.dtype, donate: bool
) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """Compile a circuit structure into a (state, params) -> state program.

    Fixed gates are baked in as constants; parameterized gates build their
    matrices from traced scalars (:mod:`tpu_qsim.gates_jax`). Unfused — the
    matrices are runtime values, so host-side complex128 group composition
    does not apply.
    """
    from . import gates_jax
    from .gates import op_matrix

    plan = []  # ("const", qubits, diag, ur, ui) | ("param", name, qubits, idx)
    pi = 0
    for g in circuit.gates:
        if g.name in gates_jax.TRACED_GATES:
            plan.append(("param", g.name, g.qubits, pi))
            pi += 1
        elif g.param is not None:
            # A parameterized gate without a traced builder cannot share the
            # structure-keyed executable: folding it would (a) desynchronize
            # the params vector from circuit.params() and (b) bake its value
            # into a cache entry keyed only by structure. Fail loudly.
            raise ValueError(
                f"gate '{g.name}' has no traced-parameter builder; "
                f"run_parameterized supports {sorted(gates_jax.TRACED_GATES)} "
                f"(use run() for circuits with custom parameterized gates)"
            )
        else:
            mat = op_matrix(g)
            from .gates import DIAGONAL_GATES

            diag = g.name in DIAGONAL_GATES
            ur, ui = ap.split_matrix(
                np.ascontiguousarray(np.diagonal(mat)) if diag else mat, rdtype
            )
            plan.append(("const", g.qubits, diag, ur, ui))

    def step(state: jax.Array, params: jax.Array) -> jax.Array:
        for op in plan:
            if op[0] == "const":
                _, qubits, diag, ur, ui = op
                if diag:
                    state = ap.apply_diagonal(state, ur, ui, qubits)
                else:
                    state = ap.apply_unitary(state, ur, ui, qubits)
            else:
                _, name, qubits, idx = op
                builder, diag = gates_jax.TRACED_GATES[name]
                ur, ui = builder(params[idx], state.dtype)
                if diag:
                    state = ap.apply_diagonal(state, ur, ui, qubits)
                else:
                    state = ap.apply_unitary(state, ur, ui, qubits)
        return state

    return jax.jit(step, donate_argnums=(0,) if donate else ())


class StateVectorSimulator(BaseSimulator):
    """Exact pure-state simulator (TPU analog of reference ``Simulator``,
    include/Simulator.hpp:53-85)."""

    def __init__(
        self,
        num_qubits: int,
        config: SimConfig = DEFAULT_CONFIG,
        *,
        seed: int = 0,
    ):
        super().__init__(num_qubits, config, seed=seed)
        self._run_cache: dict[Any, Callable] = {}

    # -- circuit execution --------------------------------------------------

    def _compiled_run(self, circuit: Circuit) -> Callable:
        key = circuit.signature()
        fn = self._run_cache.get(key)
        if fn is None:
            fn = self._dispatch_backend(circuit)
            self._run_cache[key] = fn
        return fn

    def _dispatch_backend(self, circuit: Circuit) -> Callable:
        # Tier 1: whole-circuit VMEM-resident Pallas kernel (the analog of
        # the reference's optimized-kernel auto-dispatch,
        # src/OptimizedGates.cu:388-413).
        if self.config.use_pallas:
            from .kernels.dispatch import maybe_build_pallas_circuit_run

            fn = maybe_build_pallas_circuit_run(circuit, self._rdtype, self.config)
            if fn is not None:
                return fn
        # Tier 2: fused XLA program.
        if self.config.fuse:
            groups = fuse_circuit(circuit, self.config.max_fused_qubits)
        else:
            groups = unfused_circuit(circuit)
        return build_xla_run_fn(
            groups,
            self._rdtype,
            self.config.donate_state,
            getattr(self.config, "renorm_every", 0),
        )

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
        fn = self._compiled_run(circuit)
        if hasattr(fn, "run_view"):
            # grid engine (20q+): keep the state in the engine's native
            # view form between runs — the flat<->view retile costs ~25% of
            # a 24q circuit (docs/PERF_NOTES.md §7) and is only needed on
            # readback (the `_state` property materializes it lazily)
            if (
                self._view_state is not None
                and self._view_state.shape == fn.vshape
            ):
                v = self._view_state
                self._view_state = None      # run_view donates it at 29q+
                self._view_prog = None
            else:
                v = fn.to_view(self._state)
                # drop the flat ref: stale after this run (and at 29q+
                # to_view donated its buffer outright)
                self._flat_state = None
            self._view_state = fn.run_view(v)
            self._view_prog = fn
        else:
            self._state = fn(self._state)
        return self

    def apply_gate(self, name: str, *qubits: int, param: float | None = None) -> None:
        """Single-gate convenience (compiles/caches a 1-gate circuit)."""
        c = Circuit(self.num_qubits).add(name, *qubits, param=param)
        self.run(c)

    def apply_matrix(self, matrix: Any, qubits: tuple[int, ...] | list[int]) -> None:
        """Apply an arbitrary k-qubit unitary (the analog of cuStateVec's
        ``custatevecApplyMatrix``, which the reference benchmarked against
        but did not expose itself). ``qubits[0]`` is the matrix-index MSB.

        Unitarity is checked on host (atol 1e-6); compiled programs are
        cached by matrix bytes.
        """
        qubits = tuple(int(q) for q in qubits)
        for q in qubits:
            self._check_qubit(q)
        if len(set(qubits)) != len(qubits):
            raise ValueError("qubits must be distinct")
        u = np.asarray(matrix, dtype=np.complex128)
        k = len(qubits)
        if u.shape != (1 << k, 1 << k):
            raise ValueError(
                f"matrix shape {u.shape} does not match {k} qubit(s)"
            )
        if not np.allclose(u.conj().T @ u, np.eye(1 << k), atol=1e-6):
            raise ValueError("matrix is not unitary")
        key = ("matrix", qubits, u.tobytes())
        fn = self._run_cache.get(key)
        if fn is None:
            ur, ui = ap.split_matrix(u, self._rdtype)

            def step(state: jax.Array) -> jax.Array:
                return ap.apply_unitary(state, ur, ui, qubits)

            fn = jax.jit(
                step,
                donate_argnums=(0,) if self.config.donate_state else (),
            )
            self._run_cache[key] = fn
        self._state = fn(self._state)

    # -- parameterized execution (variational workloads) ---------------------

    def run_parameterized(
        self, circuit: Circuit, params: Any | None = None
    ) -> "StateVectorSimulator":
        """Run ``circuit`` with its gate parameters as *traced* inputs.

        One compile per circuit **structure**: subsequent calls with any
        parameter vector (ordered as ``circuit.params()``) reuse the same
        executable — the VQE/QAOA sweep primitive. Capability beyond the
        reference, which had no parameter abstraction at all.
        """
        if circuit.num_qubits != self.num_qubits:
            raise ValueError(
                f"circuit has {circuit.num_qubits} qubits, simulator has "
                f"{self.num_qubits}"
            )
        if params is None:
            params = circuit.params()
        params = jnp.asarray(params, dtype=self._rdtype)
        expected = len(circuit.params())
        if params.shape != (expected,):
            raise ValueError(
                f"circuit has {expected} parameters, got {params.shape}"
            )
        key = ("parameterized", circuit.structure())
        fn = self._run_cache.get(key)
        if fn is None:
            fn = build_parameterized_run_fn(
                circuit, self._rdtype, self.config.donate_state
            )
            self._run_cache[key] = fn
        self._state = fn(self._state, params)
        return self


def _parse_pauli_term(pauli: str, num_qubits: int) -> tuple:
    """Pauli string -> ((qubit, P), ...) pairs, expectation_pauli
    convention (rightmost char acts on qubit 0; short strings pad with
    identities on high qubits)."""
    pauli = pauli.upper()
    if len(pauli) > num_qubits or not set(pauli) <= set("IXYZ"):
        raise ValueError(f"invalid Pauli string {pauli!r}")
    return tuple(
        (len(pauli) - 1 - i, p) for i, p in enumerate(pauli) if p != "I"
    )


def build_expectation_fn(
    circuit: Circuit,
    observable,
    rdtype: np.dtype = np.float32,
) -> Callable[[jax.Array], jax.Array]:
    """Differentiable ``params -> <psi(params)| H |psi(params)>``.

    ``observable`` is a Pauli string (``"ZZ"``, ``"XIY"``) or a weighted
    Pauli sum as ``[(coeff, pauli_string), ...]`` — a Hamiltonian. The
    state is prepared ONCE per evaluation and every term is measured on
    it, so an E-term Hamiltonian costs one circuit execution plus E
    cheap Pauli contractions (not E executions).

    Returns a pure jit-compiled function of the parameter vector
    (ordered as ``circuit.params()``). It composes with every JAX
    transform: ``jax.grad`` / ``jax.value_and_grad`` give reverse-mode
    gradients through the whole circuit (the adjoint-differentiation
    capability variational algorithms need — no parameter-shift
    double-execution), ``jax.vmap`` batches parameter sweeps, and
    ``jax.jit`` composes for optimizer steps. Pauli-string convention
    matches :meth:`tpu_qsim.base.BaseSimulator.expectation_pauli`
    (string reads like a ket: rightmost char acts on qubit 0).

    Capability beyond the reference, which has no parameter abstraction
    at all (every GateOp carries a baked double, reference
    include/Circuit.hpp:64-84) and could not differentiate anything;
    gradients are where the functional-transform design pays.
    """
    from .base import _pauli_expectation_jit

    if isinstance(observable, str):
        terms = [(1.0, observable)]
    else:
        terms = [(float(c), p) for c, p in observable]
    parsed = [
        (c, _parse_pauli_term(p, circuit.num_qubits)) for c, p in terms
    ]
    n_params = len(circuit.params())
    # donate=False: the state is an internal temporary here, and donation
    # would serve nothing under the outer jit while breaking re-use of
    # residuals in the reverse-mode pass
    run = build_parameterized_run_fn(circuit, np.dtype(rdtype), donate=False)
    n = circuit.num_qubits
    dt = np.dtype(rdtype)

    @jax.jit
    def expval(params: jax.Array) -> jax.Array:
        params = jnp.asarray(params, dtype=dt)
        if params.shape != (n_params,):
            raise ValueError(
                f"circuit has {n_params} parameters, got {params.shape}"
            )
        state = run(ap.initial_state(n, dt), params)
        total = jnp.asarray(0.0, dtype=dt)
        for coeff, ops in parsed:
            term = (
                jnp.asarray(1.0, dtype=dt)
                if not ops
                else _pauli_expectation_jit(state, ops)
            )
            total = total + coeff * term
        return total

    return expval
