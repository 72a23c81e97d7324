#!/usr/bin/env python
"""Live differential validation against Cirq (when installed).

Runs OUR simulator head-to-head with ``cirq.Simulator`` on the full gate set
and random circuits — the reference's script never executed its own engine
(reference validation/validate_against_cirq.py:67-260). Cirq orders basis
states big-endian (qubit 0 = MSB), so our amplitudes go through the
bit-reversal adapter (tpu_qsim.utils.to_big_endian) before comparison;
global phase is aligned (Cirq drops global phase in some gate
decompositions).

Run: python validation/validate_against_cirq.py
Exit 0 = all match. Without cirq installed, the comparison runs against
the vendored amplitude-fixture pack (validation/fixtures/
cirq_fixtures.npz — see generate_cirq_fixtures.py for provenance) AND the
analytic convention tables; both must pass.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
# Convention checks are exact (complex128) work: force CPU regardless of the
# environment's default platform (TPU backends lack float64).
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np


def our_state_big_endian(circuit) -> np.ndarray:
    import tpu_qsim as q
    from tpu_qsim.utils import to_big_endian

    sim = q.StateVectorSimulator(
        circuit.num_qubits, q.SimConfig(dtype="complex128", use_pallas=False)
    )
    sim.run(circuit)
    return to_big_endian(sim.get_state(), circuit.num_qubits)


def cirq_state(circuit) -> np.ndarray:
    import cirq

    qs = cirq.LineQubit.range(circuit.num_qubits)
    ops = []
    dispatch = {
        "i": lambda g: cirq.I(qs[g.qubits[0]]),
        "x": lambda g: cirq.X(qs[g.qubits[0]]),
        "y": lambda g: cirq.Y(qs[g.qubits[0]]),
        "z": lambda g: cirq.Z(qs[g.qubits[0]]),
        "h": lambda g: cirq.H(qs[g.qubits[0]]),
        "s": lambda g: cirq.S(qs[g.qubits[0]]),
        "sdg": lambda g: (cirq.S ** -1)(qs[g.qubits[0]]),
        "t": lambda g: cirq.T(qs[g.qubits[0]]),
        "tdg": lambda g: (cirq.T ** -1)(qs[g.qubits[0]]),
        "rx": lambda g: cirq.rx(g.param)(qs[g.qubits[0]]),
        "ry": lambda g: cirq.ry(g.param)(qs[g.qubits[0]]),
        "rz": lambda g: cirq.rz(g.param)(qs[g.qubits[0]]),
        "p": lambda g: (cirq.Z ** (g.param / np.pi))(qs[g.qubits[0]]),
        "cnot": lambda g: cirq.CNOT(qs[g.qubits[0]], qs[g.qubits[1]]),
        "cz": lambda g: cirq.CZ(qs[g.qubits[0]], qs[g.qubits[1]]),
        "swap": lambda g: cirq.SWAP(qs[g.qubits[0]], qs[g.qubits[1]]),
        "cry": lambda g: cirq.ControlledGate(cirq.ry(g.param))(
            qs[g.qubits[0]], qs[g.qubits[1]]),
        "crz": lambda g: cirq.ControlledGate(cirq.rz(g.param))(
            qs[g.qubits[0]], qs[g.qubits[1]]),
        "toffoli": lambda g: cirq.TOFFOLI(
            qs[g.qubits[0]], qs[g.qubits[1]], qs[g.qubits[2]]),
    }
    for g in circuit.gates:
        ops.append(dispatch[g.name](g))
    # cirq orders its state vector with qubit 0 (first LineQubit) as MSB
    res = cirq.Simulator(dtype=np.complex128).simulate(
        cirq.Circuit(ops), qubit_order=qs
    )
    return np.asarray(res.final_state_vector)


def aligned_max_diff(a: np.ndarray, b: np.ndarray) -> float:
    from tpu_qsim.utils import max_amplitude_error

    return max_amplitude_error(a, b, up_to_phase=True)


def run_fixture_pack(tol: float = 1e-9) -> int:
    """Compare OUR amplitudes against the vendored fixture pack (all 67
    corpus cases), in Cirq's basis ordering."""
    from generate_cirq_fixtures import FIXTURE_PATH, corpus

    import tpu_qsim as q

    pack = np.load(FIXTURE_PATH)
    print(f"fixture pack: {pack['__provenance__']}")
    failures = 0
    worst = 0.0
    for name, n, gates in corpus():
        c = q.Circuit(n)
        for gname, qubits, param in gates:
            c.add(gname, *qubits, param=param)
        diff = aligned_max_diff(our_state_big_endian(c), pack[name])
        worst = max(worst, diff)
        if diff >= tol:
            failures += 1
            print(f"FAIL  {name:16s} max|diff|={diff:.2e}")
    print(
        f"{67 - failures}/67 fixture cases passed "
        f"(worst max|diff| = {worst:.2e})"
    )
    return 1 if failures else 0


def run(tol: float = 1e-9) -> int:
    try:
        import cirq  # noqa: F401
    except ImportError:
        print("cirq not installed - comparing against the vendored fixture "
              "pack + analytic convention tables")
        rc = run_fixture_pack(tol)
        from validate_conventions import run as run_conv

        return rc or run_conv()

    import tpu_qsim as q

    failures = 0
    cases = [("all-gates", (
        q.Circuit(3).h(0).x(1).y(2).z(0).s(1).sdg(2).t(0).tdg(1)
        .rx(2, 0.3).ry(0, 1.1).rz(1, 2.2).p(2, 0.5)
        .cnot(0, 1).cz(1, 2).swap(0, 2).cry(2, 0, 0.9).crz(0, 2, 1.3)
        .toffoli(0, 1, 2)))]
    for seed in range(10):
        cases.append((f"random-{seed}", q.random_circuit(5, 80, seed=seed)))
    cases.append(("ghz-8", q.ghz_circuit(8)))

    for name, c in cases:
        diff = aligned_max_diff(our_state_big_endian(c), cirq_state(c))
        ok = diff < tol
        failures += not ok
        print(f"{'PASS' if ok else 'FAIL'}  {name:16s} max|diff|={diff:.2e}")
    print(f"\n{len(cases) - failures}/{len(cases)} cirq cross-checks passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(run())
