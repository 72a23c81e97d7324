"""Reference algorithms built on the circuit IR — end-to-end workloads that
exercise the whole stack (multi-controlled gates, diagonal oracles,
parameterized layers, expectation values).

These go beyond the reference's factory circuits (Bell/GHZ/random) and pair
with the framework's capabilities: Grover drives deep Toffoli ladders through
the fused executor; QAOA drives ``run_parameterized`` + ``expectation_pauli``
the way a variational optimizer would.
"""

from __future__ import annotations

import math
from typing import Sequence

from .circuit import Circuit


def _multi_controlled_x(c: Circuit, controls: Sequence[int], target: int) -> None:
    c.mcx(*controls, target)


def _multi_controlled_z(c: Circuit, qubits: Sequence[int]) -> None:
    """Phase-flip the all-ones state of ``qubits`` — a single diagonal MCZ
    gate on every backend (see Circuit.mcz)."""
    c.mcz(*qubits)


def grover_circuit(num_qubits: int, marked: int, iterations: int | None = None) -> Circuit:
    """Grover search for basis state ``marked`` over ``num_qubits`` qubits.

    Oracle: phase-flip on |marked> (X-conjugated multi-controlled Z).
    Diffusion: H^n . (phase flip on |0..0>) . H^n. The MCZ primitive is a
    single diagonal gate, so circuits stay shallow at any register size
    (the reference's Grover analog was impossible: no multi-controlled
    gate beyond Toffoli).
    """
    from .gates import MAX_MCZ_QUBITS

    if not (2 <= num_qubits <= MAX_MCZ_QUBITS):
        raise ValueError(f"grover supports 2..{MAX_MCZ_QUBITS} qubits")
    if not (0 <= marked < (1 << num_qubits)):
        raise ValueError("marked state out of range")
    if iterations is None:
        # floor, not round: k rotations give amplitude sin((2k+1)theta);
        # overshooting rotates past the target (n=2: 1 iteration is exact,
        # 2 would land back at uniform)
        iterations = max(1, int(math.pi / 4 * math.sqrt(1 << num_qubits)))

    c = Circuit(num_qubits)
    for q in range(num_qubits):
        c.h(q)
    all_qs = list(range(num_qubits))
    for _ in range(iterations):
        # oracle: flip phase of |marked>
        for q in all_qs:
            if not ((marked >> q) & 1):
                c.x(q)
        _multi_controlled_z(c, all_qs)
        for q in all_qs:
            if not ((marked >> q) & 1):
                c.x(q)
        # diffusion: 2|s><s| - I
        for q in all_qs:
            c.h(q)
            c.x(q)
        _multi_controlled_z(c, all_qs)
        for q in all_qs:
            c.x(q)
            c.h(q)
    return c


def qaoa_maxcut_circuit(
    edges: Sequence[tuple[int, int]],
    num_qubits: int,
    gammas: Sequence[float],
    betas: Sequence[float],
) -> Circuit:
    """QAOA ansatz for MaxCut: |+>^n then alternating cost/mixer layers.

    Cost layer: exp(-i gamma C) with C = sum (1 - Z_a Z_b)/2, realized per
    edge as CNOT-Rz(-gamma)-CNOT (= exp(+i gamma/2 Z_a Z_b), global phase
    dropped). Mixer: Rx(2 beta) on every qubit. Parameterized: run with
    ``StateVectorSimulator.run_parameterized`` to sweep (gammas, betas).
    """
    if len(gammas) != len(betas):
        raise ValueError("gammas and betas must have equal length")
    c = Circuit(num_qubits)
    for q in range(num_qubits):
        c.h(q)
    for gamma, beta in zip(gammas, betas):
        for a, b in edges:
            c.cnot(a, b)
            c.rz(b, -float(gamma))
            c.cnot(a, b)
        for q in range(num_qubits):
            c.rx(q, 2.0 * float(beta))
    return c


def qaoa_maxcut_objective(
    edges: Sequence[tuple[int, int]],
    num_qubits: int,
    depth: int = 1,
):
    """Differentiable QAOA objective: ``(gammas, betas) -> <C>``.

    Builds the depth-``depth`` ansatz once and returns a pure function
    of the two length-``depth`` angle vectors that evaluates the MaxCut
    expectation <C> = sum over edges of (1 - <Z_a Z_b>)/2 on ONE state
    preparation (weighted Pauli-sum observable). Maximize it with
    ``jax.grad``:

        obj = qaoa_maxcut_objective(edges, n, depth=2)
        step = jax.jit(jax.grad(lambda p: -obj(p[0], p[1])))

    The per-gate parameter vector the executable expects is
    reconstructed from the shared (gamma, beta) angles layer by layer
    (per layer: one rz(-gamma) per edge, then one rx(2 beta) per
    qubit), so gradients flow through the sharing. The reference had no
    parameter abstraction, no observables beyond probabilities, and no
    differentiation of any kind.
    """
    import jax.numpy as jnp

    from .statevector import build_expectation_fn

    circuit = qaoa_maxcut_circuit(
        edges, num_qubits, [0.0] * depth, [0.0] * depth
    )
    terms = [(0.5 * len(edges), "I" * num_qubits)]
    for a, b in edges:
        zz = ["I"] * num_qubits
        zz[num_qubits - 1 - a] = "Z"
        zz[num_qubits - 1 - b] = "Z"
        terms.append((-0.5, "".join(zz)))
    expect_h = build_expectation_fn(circuit, terms)
    n_edges = len(edges)

    def objective(gammas, betas):
        gammas = jnp.asarray(gammas)
        betas = jnp.asarray(betas)
        layers = [
            jnp.concatenate(
                [
                    jnp.full((n_edges,), -gammas[layer]),
                    jnp.full((num_qubits,), 2.0 * betas[layer]),
                ]
            )
            for layer in range(depth)
        ]
        return expect_h(jnp.concatenate(layers))

    return objective


def maxcut_expectation(sim, edges: Sequence[tuple[int, int]]) -> float:
    """<C> = sum over edges of (1 - <Z_a Z_b>) / 2 on the simulator's state."""
    total = 0.0
    n = sim.num_qubits
    for a, b in edges:
        zz = ["I"] * n
        zz[n - 1 - a] = "Z"
        zz[n - 1 - b] = "Z"
        total += 0.5 * (1.0 - sim.expectation_pauli("".join(zz)))
    return total


def phase_estimation_circuit(phase: float, num_ancilla: int) -> Circuit:
    """Textbook quantum phase estimation of U = P(2*pi*phase).

    Layout: qubit 0 is the eigenstate target (prepared |1>, the
    eigenvector of a phase gate with eigenvalue e^{2*pi*i*phase});
    qubits 1..num_ancilla form the readout register, ancilla j (qubit
    1+j) accumulating phase 2^j via controlled-P, followed by the
    inverse QFT on the register. Measuring the register yields
    k ~ round(phase * 2^m) with probability 1 when phase is dyadic and
    >= 4/pi^2 at the nearest k otherwise; decode with
    ``k / 2**num_ancilla`` where k is the register value read LSB-first
    from qubit 1 (``estimate_phase`` does both steps).

    Beyond the reference's factory set: exercises the cp ladder and a
    mapped inverse QFT (Circuit.inverse of the factory QFT) in one
    end-to-end algorithm with an exactly checkable output distribution.
    """
    from .circuit import Gate, qft_circuit

    if num_ancilla < 1:
        raise ValueError("phase estimation needs at least one ancilla")
    m = num_ancilla
    c = Circuit(m + 1)
    c.x(0)                          # |1> eigenstate of the phase gate
    for j in range(m):
        c.h(1 + j)
    for j in range(m):
        # controlled-U^(2^j): one cp with the composed angle
        c.cp(1 + j, 0, (2.0 * math.pi * phase) * (1 << j))
    # inverse QFT on the readout register: invert the factory QFT and
    # shift its qubit ids onto ancillas 1..m (ancilla j = bit j)
    for g in qft_circuit(m).inverse().gates:
        c.append(Gate(g.name, tuple(q + 1 for q in g.qubits), g.param))
    return c


def estimate_phase(probabilities, num_ancilla: int) -> float:
    """Decode a phase-estimation run: argmax over the readout register's
    marginal distribution -> k / 2^m. ``probabilities`` is the full
    (2^(m+1),) distribution from ``get_probabilities`` (target qubit 0
    is traced out by summing its two values per register assignment)."""
    m = num_ancilla
    best_k, best_p = 0, -1.0
    for k in range(1 << m):
        p = float(probabilities[(k << 1)] + probabilities[(k << 1) | 1])
        if p > best_p:
            best_k, best_p = k, p
    return best_k / float(1 << m)
