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


def _multi_controlled_phase(
    c: Circuit, controls: Sequence[int], target: int, theta: float
) -> None:
    """C^k P(theta): phase e^{i theta} iff all controls and the target are 1.

    Ancilla-free textbook recursion:
      C^k P(t) = CP(t/2)(c_k, target) . C^{k-1}X(c_1..c_{k-1} -> c_k)
               . CP(-t/2)(c_k, target) . C^{k-1}X(...) .
               . C^{k-1}P(t/2)(c_1..c_{k-1}, target)
    with C^1X = cnot, C^2X = toffoli (deeper X-recursions are not needed for
    the <= 4-qubit demo registers).
    """
    cs = list(controls)
    if not cs:
        c.p(target, theta)
        return
    if len(cs) == 1:
        c.cp(cs[0], target, theta)
        return
    last = cs[-1]
    rest = cs[:-1]
    c.cp(last, target, theta / 2)
    _multi_controlled_x(c, rest, last)
    c.cp(last, target, -theta / 2)
    _multi_controlled_x(c, rest, last)
    _multi_controlled_phase(c, rest, target, theta / 2)


def _multi_controlled_x(c: Circuit, controls: Sequence[int], target: int) -> None:
    cs = list(controls)
    if len(cs) == 1:
        c.cnot(cs[0], target)
    elif len(cs) == 2:
        c.toffoli(cs[0], cs[1], target)
    else:
        raise ValueError("demo registers need at most 2-controlled X")


def _multi_controlled_z(c: Circuit, qubits: Sequence[int]) -> None:
    """Phase-flip the all-ones state of ``qubits`` (any count the recursion
    supports; 1..4 for these demos)."""
    qs = list(qubits)
    if len(qs) == 1:
        c.z(qs[0])
    elif len(qs) == 2:
        c.cz(qs[0], qs[1])
    else:
        import math as _math

        _multi_controlled_phase(c, qs[:-1], qs[-1], _math.pi)


def grover_circuit(num_qubits: int, marked: int, iterations: int | None = None) -> Circuit:
    """Grover search for basis state ``marked`` over ``num_qubits`` qubits.

    Oracle: phase-flip on |marked> (X-conjugated multi-controlled Z).
    Diffusion: H^n . (phase flip on |0..0>) . H^n.
    """
    if not (2 <= num_qubits <= 4):
        raise ValueError("grover demo supports 2..4 qubits")
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
