#!/usr/bin/env python
"""Generate the vendored Cirq amplitude-fixture pack.

Produces ``validation/fixtures/cirq_fixtures.npz``: complex128 final-state
amplitudes, in CIRQ's basis ordering (qubit 0 = most significant bit), for
a fixed corpus — every library gate at several qubit positions, GHZ 4-10,
QFT 4-8, and depth-100 random circuits at 6/8/10 qubits.

Provenance (recorded in the pack's ``provenance`` field):

* With cirq installed, amplitudes come from ``cirq.Simulator`` itself —
  true vendor numbers. Run this script on any machine with cirq to refresh
  the pack with that provenance.
* Without cirq (this image has no cirq and no network), amplitudes come
  from the self-contained interpreter below — an INDEPENDENT transcription
  of Cirq's documented gate matrices and big-endian state ordering that
  shares no code with tpu_qsim (different layout: big-endian tensordot
  over a (2,)*n tensor vs tpu_qsim's little-endian split planes; different
  composition). It pins the same conventions the reference's checker
  pinned (reference validation/validate_against_cirq.py:67-260), upgraded
  from hard-coded spot values to full corpus amplitudes.

``--check`` regenerates in memory and verifies the committed pack matches
(guards pack/script drift in CI).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

FIXTURE_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "fixtures", "cirq_fixtures.npz"
)

# ---------------------------------------------------------------------------
# The corpus: pure data — (name, num_qubits, [(gate, qubits, param), ...]).
# Gate names use tpu_qsim spellings; BOTH generators and the validator map
# them to their own semantics independently.
# ---------------------------------------------------------------------------


def corpus() -> list[tuple[str, int, list[tuple[str, tuple[int, ...], float | None]]]]:
    cases = []

    g1 = ["i", "x", "y", "z", "h", "s", "sdg", "t", "tdg"]
    for gate in g1:
        for qb in (0, 1, 3):
            cases.append(
                (f"{gate}-q{qb}", 4, [("h", (q,), None) for q in range(4)]
                 + [(gate, (qb,), None)])
            )
    for gate in ["rx", "ry", "rz", "p"]:
        for qb, ang in ((0, 0.37), (2, 2.11)):
            cases.append(
                (f"{gate}-q{qb}", 4, [("h", (q,), None) for q in range(4)]
                 + [(gate, (qb,), ang)])
            )
    for gate in ["cnot", "cz", "swap"]:
        for pair in ((0, 1), (1, 3), (3, 0)):
            cases.append(
                (f"{gate}-{pair[0]}{pair[1]}", 4,
                 [("h", (q,), None) for q in range(4)]
                 + [(gate, pair, None)])
            )
    for gate in ["cry", "crz", "cp"]:
        for pair, ang in (((0, 2), 0.81), ((3, 1), 1.93)):
            cases.append(
                (f"{gate}-{pair[0]}{pair[1]}", 4,
                 [("h", (q,), None) for q in range(4)]
                 + [(gate, pair, ang)])
            )
    cases.append(
        ("toffoli-012", 4, [("h", (q,), None) for q in range(4)]
         + [("toffoli", (0, 1, 2), None)])
    )
    cases.append(
        ("toffoli-310", 4, [("h", (q,), None) for q in range(4)]
         + [("toffoli", (3, 1, 0), None)])
    )

    import tpu_qsim as q

    for n in range(4, 11):
        cases.append((f"ghz-{n}", n,
                      [(g.name, g.qubits, g.param) for g in q.ghz_circuit(n)]))
    for n in range(4, 9):
        cases.append((f"qft-{n}", n,
                      [(g.name, g.qubits, g.param) for g in q.qft_circuit(n)]))
    for n in (6, 8, 10):
        c = q.random_circuit(n, 100, seed=n)
        # add the gate kinds random_circuit omits
        c.s(0).t(1).sdg(2).tdg(3).ry(4, 0.77).p(5, 1.23)
        c.cz(0, 3).swap(1, 4).cry(2, 5, 0.5).crz(5, 0, 0.9).cp(1, 3, 1.7)
        c.toffoli(0, 2, 4)
        cases.append((f"random-{n}", n,
                      [(g.name, g.qubits, g.param) for g in c]))
    return cases


def corpus_digest(cases) -> str:
    blob = json.dumps(
        [(name, n, [(g, list(qs), p) for g, qs, p in gates])
         for name, n, gates in cases],
        sort_keys=True,
    ).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


# ---------------------------------------------------------------------------
# Mode B: independent interpreter of Cirq's documented conventions.
# Big-endian (qubit 0 = MSB), matrices transcribed from Cirq's docs; NO
# tpu_qsim imports here.
# ---------------------------------------------------------------------------

def _m(rows):
    return np.array(rows, dtype=np.complex128)


def _ctrl(u: np.ndarray) -> np.ndarray:
    d = u.shape[0]
    out = np.eye(2 * d, dtype=np.complex128)
    out[d:, d:] = u
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
    if name == "rx":  # cirq.rx = exp(-i X t / 2)
        c, s = np.cos(param / 2), np.sin(param / 2)
        return _m([[c, -1j * s], [-1j * s, c]])
    if name == "ry":
        c, s = np.cos(param / 2), np.sin(param / 2)
        return _m([[c, -s], [s, c]])
    if name == "rz":
        return _m([[np.exp(-0.5j * param), 0], [0, np.exp(0.5j * param)]])
    if name == "p":   # cirq.ZPowGate(exponent=param/pi): diag(1, e^{i*param})
        return _m([[1, 0], [0, np.exp(1j * param)]])
    if name == "cnot":
        return _ctrl(_gate_unitary("x", None))
    if name == "cz":
        return _ctrl(_gate_unitary("z", None))
    if name == "cry":
        return _ctrl(_gate_unitary("ry", param))
    if name == "crz":
        return _ctrl(_gate_unitary("rz", param))
    if name == "cp":
        return _ctrl(_gate_unitary("p", param))
    if name == "toffoli":
        return _ctrl(_ctrl(_gate_unitary("x", None)))
    raise ValueError(f"no independent matrix for gate {name!r}")


def _reference_state(n: int, gates) -> np.ndarray:
    """Big-endian final state: psi as a (2,)*n tensor whose axis q is qubit
    q (axis 0 = most significant), updated by tensordot per gate."""
    psi = np.zeros((2,) * n, dtype=np.complex128)
    psi[(0,) * n] = 1.0
    for name, qubits, param in gates:
        u = _gate_unitary(name, param)
        k = len(qubits)
        ut = u.reshape((2,) * (2 * k))
        psi = np.tensordot(ut, psi, axes=(list(range(k, 2 * k)), list(qubits)))
        psi = np.moveaxis(psi, list(range(k)), list(qubits))
    return psi.reshape(-1)


def _cirq_state(n: int, gates) -> np.ndarray:
    import cirq

    qs = cirq.LineQubit.range(n)
    ops = []
    for name, qubits, param in gates:
        a = [qs[i] for i in qubits]
        d = {
            "i": lambda: cirq.I(*a), "x": lambda: cirq.X(*a),
            "y": lambda: cirq.Y(*a), "z": lambda: cirq.Z(*a),
            "h": lambda: cirq.H(*a), "s": lambda: cirq.S(*a),
            "sdg": lambda: (cirq.S ** -1)(*a), "t": lambda: cirq.T(*a),
            "tdg": lambda: (cirq.T ** -1)(*a),
            "rx": lambda: cirq.rx(param)(*a),
            "ry": lambda: cirq.ry(param)(*a),
            "rz": lambda: cirq.rz(param)(*a),
            "p": lambda: (cirq.Z ** (param / np.pi))(*a),
            "cnot": lambda: cirq.CNOT(*a), "cz": lambda: cirq.CZ(*a),
            "swap": lambda: cirq.SWAP(*a),
            "cry": lambda: cirq.ControlledGate(cirq.ry(param))(*a),
            "crz": lambda: cirq.ControlledGate(cirq.rz(param))(*a),
            "cp": lambda: (cirq.CZ ** (param / np.pi))(*a),
            "toffoli": lambda: cirq.TOFFOLI(*a),
        }
        ops.append(d[name]())
    res = cirq.Simulator(dtype=np.complex128).simulate(
        cirq.Circuit(ops), qubit_order=qs
    )
    return np.asarray(res.final_state_vector, dtype=np.complex128)


def generate() -> tuple[dict[str, np.ndarray], str]:
    try:
        import cirq

        state_of, prov = _cirq_state, f"cirq-{cirq.__version__}"
    except ImportError:
        state_of, prov = _reference_state, (
            "independent-convention-interpreter "
            "(cirq unavailable at generation time; rerun this script with "
            "cirq installed for vendor provenance)"
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
