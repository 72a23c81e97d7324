#!/usr/bin/env python
"""Live differential validation against Qiskit-Aer (when installed).

Unlike the reference's script (which only checked that Qiskit agrees with
hard-coded tables, reference validation/validate_against_qiskit.py:86-303),
this one actually runs OUR simulator head-to-head with Qiskit's statevector
simulator on the full gate set and random circuits. Both use qubit0 = LSB,
so amplitudes compare directly, with global phase aligned (Qiskit tracks
global phase through its gate definitions exactly as we do, so the aligned
phase should be ~1; we still align to be robust).

Run: python validation/validate_against_qiskit.py
Exit 0 = all match. Without qiskit installed, the comparison runs against
the vendored amplitude-fixture pack (validation/fixtures/
qiskit_fixtures.npz — see generate_qiskit_fixtures.py for provenance) AND
the analytic convention tables; both must pass.
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


def our_state(circuit) -> np.ndarray:
    import tpu_qsim as q

    sim = q.StateVectorSimulator(
        circuit.num_qubits, q.SimConfig(dtype="complex128", use_pallas=False)
    )
    sim.run(circuit)
    return sim.get_state()


def qiskit_state(circuit) -> np.ndarray:
    from qiskit import QuantumCircuit
    from qiskit.quantum_info import Statevector

    qc = QuantumCircuit(circuit.num_qubits)
    dispatch = {
        "i": lambda g: qc.id(g.qubits[0]),
        "x": lambda g: qc.x(g.qubits[0]),
        "y": lambda g: qc.y(g.qubits[0]),
        "z": lambda g: qc.z(g.qubits[0]),
        "h": lambda g: qc.h(g.qubits[0]),
        "s": lambda g: qc.s(g.qubits[0]),
        "sdg": lambda g: qc.sdg(g.qubits[0]),
        "t": lambda g: qc.t(g.qubits[0]),
        "tdg": lambda g: qc.tdg(g.qubits[0]),
        "rx": lambda g: qc.rx(g.param, g.qubits[0]),
        "ry": lambda g: qc.ry(g.param, g.qubits[0]),
        "rz": lambda g: qc.rz(g.param, g.qubits[0]),
        "p": lambda g: qc.p(g.param, g.qubits[0]),
        "cnot": lambda g: qc.cx(*g.qubits),
        "cz": lambda g: qc.cz(*g.qubits),
        "swap": lambda g: qc.swap(*g.qubits),
        "cry": lambda g: qc.cry(g.param, *g.qubits),
        "crz": lambda g: qc.crz(g.param, *g.qubits),
        "toffoli": lambda g: qc.ccx(*g.qubits),
    }
    for g in circuit.gates:
        dispatch[g.name](g)
    return np.asarray(Statevector(qc).data)


def aligned_max_diff(a: np.ndarray, b: np.ndarray) -> float:
    from tpu_qsim.utils import max_amplitude_error

    return max_amplitude_error(a, b, up_to_phase=True)


def run_fixture_pack(tol: float = 1e-9) -> int:
    """Compare OUR amplitudes against the vendored fixture pack (all 67
    corpus cases). Qiskit shares our little-endian basis ordering, so
    amplitudes compare index-for-index with no bit reversal."""
    from generate_qiskit_fixtures import FIXTURE_PATH
    from generate_cirq_fixtures import corpus

    import tpu_qsim as q

    pack = np.load(FIXTURE_PATH)
    print(f"fixture pack: {pack['__provenance__']}")
    failures = 0
    worst = 0.0
    total = 0
    for name, n, gates in corpus():
        total += 1
        c = q.Circuit(n)
        for gname, qubits, param in gates:
            c.add(gname, *qubits, param=param)
        diff = aligned_max_diff(our_state(c), pack[name])
        worst = max(worst, diff)
        if diff >= tol:
            failures += 1
            print(f"FAIL  {name:16s} max|diff|={diff:.2e}")
    print(
        f"{total - failures}/{total} qiskit fixture cases passed "
        f"(worst max|diff| = {worst:.2e})"
    )
    return 1 if failures else 0


def run(tol: float = 1e-9) -> int:
    try:
        import qiskit  # noqa: F401
    except ImportError:
        print("qiskit not installed - comparing against the vendored "
              "fixture pack + analytic convention tables")
        rc = run_fixture_pack(tol)
        from validate_conventions import run as run_conv

        return rc or run_conv()

    import tpu_qsim as q

    failures = 0
    cases = []
    # every gate type on small registers
    cases.append(("all-gates", (
        q.Circuit(3).h(0).x(1).y(2).z(0).s(1).sdg(2).t(0).tdg(1)
        .rx(2, 0.3).ry(0, 1.1).rz(1, 2.2).p(2, 0.5)
        .cnot(0, 1).cz(1, 2).swap(0, 2).cry(2, 0, 0.9).crz(0, 2, 1.3)
        .toffoli(0, 1, 2))))
    for seed in range(10):
        cases.append((f"random-{seed}", q.random_circuit(5, 80, seed=seed)))
    cases.append(("ghz-8", q.ghz_circuit(8)))

    for name, c in cases:
        diff = aligned_max_diff(our_state(c), qiskit_state(c))
        ok = diff < tol
        failures += not ok
        print(f"{'PASS' if ok else 'FAIL'}  {name:16s} max|diff|={diff:.2e}")
    print(f"\n{len(cases) - failures}/{len(cases)} qiskit cross-checks passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(run())
