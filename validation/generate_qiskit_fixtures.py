#!/usr/bin/env python
"""Generate the vendored Qiskit amplitude-fixture pack.

Produces ``validation/fixtures/qiskit_fixtures.npz``: complex128 final-state
amplitudes, in QISKIT's basis ordering (qubit 0 = least significant bit —
the same little-endian convention tpu_qsim uses, so no bit reversal is
needed at comparison time), for the SAME fixed corpus as the Cirq pack
(every library gate at several qubit positions, GHZ 4-10, QFT 4-8, and
depth-100 random circuits at 6/8/10 qubits — see
``generate_cirq_fixtures.corpus``; sharing the corpus keeps the two vendor
witnesses case-for-case comparable).

Provenance (recorded in the pack's ``provenance`` field):

* With qiskit installed, amplitudes come from
  ``qiskit.quantum_info.Statevector`` itself — true vendor numbers. Run
  this script on any machine with qiskit to refresh the pack with that
  provenance.
* Without qiskit (this image has no qiskit and no network), amplitudes come
  from the self-contained interpreter below — an INDEPENDENT transcription
  of Qiskit's documented gate matrices and qargs convention (matrix index
  bit k <-> k-th qubit argument; e.g. ``CXGate`` is
  [[1,0,0,0],[0,0,0,1],[0,0,1,0],[0,1,0,0]] with the CONTROL on index
  bit 0) that shares no code with tpu_qsim and no layout with the Cirq
  generator (index-gather sums over a flat little-endian vector vs the
  Cirq pack's big-endian tensordot vs tpu_qsim's split f32/f64 planes).
  It pins the same conventions the reference's checker pinned
  (reference validation/validate_against_qiskit.py:86-303), upgraded from
  hard-coded spot values to full corpus amplitudes.

``--check`` regenerates in memory and verifies the committed pack matches
(guards pack/script drift in CI).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from generate_cirq_fixtures import corpus, corpus_digest  # shared corpus

FIXTURE_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "fixtures",
    "qiskit_fixtures.npz",
)

# ---------------------------------------------------------------------------
# Mode B: independent interpreter of Qiskit's documented conventions.
# Little-endian (qubit 0 = LSB), qargs convention (matrix index bit k is the
# k-th qubit argument), matrices transcribed from the Qiskit circuit-library
# docs; NO tpu_qsim imports here.
# ---------------------------------------------------------------------------


def _m(rows):
    return np.array(rows, dtype=np.complex128)


def _ctrl_qargs(u: np.ndarray) -> np.ndarray:
    """Controlled-U in Qiskit's qargs convention: the CONTROL is qubit
    argument 0 = matrix index bit 0 (qiskit CXGate.__array__: control on
    the low index bit), targets are the higher index bits."""
    d = u.shape[0]
    out = np.eye(2 * d, dtype=np.complex128)
    odd = np.arange(1, 2 * d, 2)          # states with the control bit set
    out[np.ix_(odd, odd)] = u
    return out


def _gate_unitary(name: str, param: float | None) -> np.ndarray:
    s2 = 1.0 / np.sqrt(2.0)
    fixed = {
        "i": _m([[1, 0], [0, 1]]),
        "x": _m([[0, 1], [1, 0]]),
        "y": _m([[0, -1j], [1j, 0]]),
        "z": _m([[1, 0], [0, -1]]),
        "h": _m([[s2, s2], [s2, -s2]]),
        "s": _m([[1, 0], [0, 1j]]),
        "sdg": _m([[1, 0], [0, -1j]]),
        "t": _m([[1, 0], [0, np.exp(1j * np.pi / 4)]]),
        "tdg": _m([[1, 0], [0, np.exp(-1j * np.pi / 4)]]),
        "swap": _m([[1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]]),
    }
    if name in fixed:
        return fixed[name]
    if name == "rx":  # qiskit.RXGate = exp(-i X theta / 2)
        c, s = np.cos(param / 2), np.sin(param / 2)
        return _m([[c, -1j * s], [-1j * s, c]])
    if name == "ry":  # qiskit.RYGate
        c, s = np.cos(param / 2), np.sin(param / 2)
        return _m([[c, -s], [s, c]])
    if name == "rz":  # qiskit.RZGate = diag(e^{-i l/2}, e^{i l/2})
        return _m([[np.exp(-0.5j * param), 0], [0, np.exp(0.5j * param)]])
    if name == "p":   # qiskit.PhaseGate = diag(1, e^{i l})
        return _m([[1, 0], [0, np.exp(1j * param)]])
    if name == "cnot":   # qiskit.CXGate, control = qarg 0
        return _ctrl_qargs(_gate_unitary("x", None))
    if name == "cz":
        return _ctrl_qargs(_gate_unitary("z", None))
    if name == "cry":    # qiskit.CRYGate(theta, control, target)
        return _ctrl_qargs(_gate_unitary("ry", param))
    if name == "crz":
        return _ctrl_qargs(_gate_unitary("rz", param))
    if name == "cp":
        return _ctrl_qargs(_gate_unitary("p", param))
    if name == "toffoli":  # qiskit.CCXGate(c1, c2, target)
        # controls = qargs 0 and 1 = index bits 0 and 1, target = bit 2
        return _ctrl_qargs(_ctrl_qargs(_gate_unitary("x", None)))
    raise ValueError(f"no independent matrix for gate {name!r}")


def _apply_qargs(psi: np.ndarray, u: np.ndarray, qubits) -> np.ndarray:
    """out[i] = sum_s U[sub(i), s] * psi[i with gate bits set to s], where
    sub(i) packs bit(qubits[k]) of i into matrix-index bit k (Qiskit's
    qargs convention). Index-gather formulation — no tensor reshapes."""
    dim = psi.size
    idx = np.arange(dim, dtype=np.int64)
    sub = np.zeros(dim, dtype=np.int64)
    cleared = idx.copy()
    for pos, q in enumerate(qubits):
        sub |= ((idx >> q) & 1) << pos
        cleared &= ~(1 << q)
    out = np.zeros_like(psi)
    for s in range(u.shape[0]):
        src = cleared.copy()
        for pos, q in enumerate(qubits):
            src |= np.int64((s >> pos) & 1) << q
        out += u[sub, s] * psi[src]
    return out


def _reference_state(n: int, gates) -> np.ndarray:
    """Little-endian final state under Qiskit's conventions.

    Corpus gate tuples use tpu_qsim spellings; the qubit-argument order of
    the controlled gates matches qiskit's signatures exactly as the live
    validator dispatches them (validate_against_qiskit.py): cnot(a,b) ->
    qc.cx(a,b) (control a), cry/crz/cp(a,b,l) -> control a, toffoli(a,b,c)
    -> qc.ccx(a,b,c) (controls a,b)."""
    psi = np.zeros(1 << n, dtype=np.complex128)
    psi[0] = 1.0
    for name, qubits, param in gates:
        psi = _apply_qargs(psi, _gate_unitary(name, param), qubits)
    return psi


def _qiskit_state(n: int, gates) -> np.ndarray:
    from qiskit import QuantumCircuit
    from qiskit.quantum_info import Statevector

    qc = QuantumCircuit(n)
    for name, qubits, param in gates:
        {
            "i": lambda: qc.id(qubits[0]),
            "x": lambda: qc.x(qubits[0]),
            "y": lambda: qc.y(qubits[0]),
            "z": lambda: qc.z(qubits[0]),
            "h": lambda: qc.h(qubits[0]),
            "s": lambda: qc.s(qubits[0]),
            "sdg": lambda: qc.sdg(qubits[0]),
            "t": lambda: qc.t(qubits[0]),
            "tdg": lambda: qc.tdg(qubits[0]),
            "rx": lambda: qc.rx(param, qubits[0]),
            "ry": lambda: qc.ry(param, qubits[0]),
            "rz": lambda: qc.rz(param, qubits[0]),
            "p": lambda: qc.p(param, qubits[0]),
            "cnot": lambda: qc.cx(*qubits),
            "cz": lambda: qc.cz(*qubits),
            "swap": lambda: qc.swap(*qubits),
            "cry": lambda: qc.cry(param, *qubits),
            "crz": lambda: qc.crz(param, *qubits),
            "cp": lambda: qc.cp(param, *qubits),
            "toffoli": lambda: qc.ccx(*qubits),
        }[name]()
    return np.asarray(Statevector(qc).data, dtype=np.complex128)


def generate() -> tuple[dict[str, np.ndarray], str]:
    try:
        import qiskit

        state_of, prov = _qiskit_state, f"qiskit-{qiskit.__version__}"
    except ImportError:
        state_of, prov = _reference_state, (
            "independent-convention-interpreter "
            "(qiskit unavailable at generation time; rerun this script "
            "with qiskit installed for vendor provenance)"
        )
    cases = corpus()
    out = {}
    for name, n, gates in cases:
        out[name] = state_of(n, gates)
    return out, f"{prov}; corpus={corpus_digest(cases)}"


def main() -> int:
    ap_ = argparse.ArgumentParser()
    ap_.add_argument("--check", action="store_true",
                     help="verify the committed pack matches a regeneration")
    args = ap_.parse_args()

    amps, prov = generate()
    if args.check:
        pack = np.load(FIXTURE_PATH)
        assert set(pack.files) - {"__provenance__"} == set(amps), "case set drift"
        worst = 0.0
        for k, v in amps.items():
            worst = max(worst, float(np.abs(pack[k] - v).max()))
        print(f"pack check: {len(amps)} cases, max regen diff = {worst:.2e}")
        print(f"pack provenance: {pack['__provenance__']}")
        return 0 if worst < 1e-12 else 1

    os.makedirs(os.path.dirname(FIXTURE_PATH), exist_ok=True)
    np.savez_compressed(
        FIXTURE_PATH, __provenance__=np.str_(prov), **amps
    )
    size = os.path.getsize(FIXTURE_PATH)
    print(f"wrote {FIXTURE_PATH}: {len(amps)} cases, {size/1024:.0f} KiB")
    print(f"provenance: {prov}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
