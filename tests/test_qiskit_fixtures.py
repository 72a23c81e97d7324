"""Vendored Qiskit-convention fixture pack (validation/fixtures): the pack
loads, carries provenance, regenerates bit-exactly from its script, a sample
of cases matches our complex128 engine directly (shared little-endian
ordering — no adapter), and the Qiskit pack agrees with the Cirq pack
through the bit-reversal map (two INDEPENDENT convention interpreters —
big-endian tensordot vs little-endian index-gather — pinning the same
physics; full 67-case sweep runs in validation/validate_against_qiskit.py)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "validation"))

import tpu_qsim as q


@pytest.fixture(scope="module")
def pack():
    from generate_qiskit_fixtures import FIXTURE_PATH

    return np.load(FIXTURE_PATH)


def test_pack_has_provenance_and_cases(pack):
    assert "__provenance__" in pack.files
    assert len(pack.files) >= 60


@pytest.mark.parametrize(
    "case", ["ghz-8", "qft-6", "random-8", "toffoli-310", "cp-31"]
)
def test_sample_cases_match_our_engine(pack, case):
    from generate_cirq_fixtures import corpus

    from tpu_qsim.utils import max_amplitude_error

    name_to_case = {nm: (n, gates) for nm, n, gates in corpus()}
    n, gates = name_to_case[case]
    c = q.Circuit(n)
    for gname, qubits, param in gates:
        c.add(gname, *qubits, param=param)
    sim = q.CPUReferenceSimulator(n)
    sim.run(c)
    # qiskit and tpu_qsim share qubit0 = LSB: amplitudes compare directly
    assert max_amplitude_error(sim.get_state(), pack[case],
                               up_to_phase=True) < 1e-12


def test_pack_regenerates_exactly():
    from generate_qiskit_fixtures import FIXTURE_PATH, generate

    amps, _ = generate()
    pack = np.load(FIXTURE_PATH)
    for k, v in amps.items():
        assert np.abs(pack[k] - v).max() == 0.0, k


def test_cross_pack_consistency_with_cirq():
    """qiskit_pack[name] (little-endian) must equal cirq_pack[name]
    (big-endian) under the bit-reversal permutation, EXACTLY for the
    shared-convention gates: the two packs were produced by structurally
    different interpreters, so agreement is a genuine cross-check of both
    transcriptions (and of the corpus wiring)."""
    from generate_cirq_fixtures import FIXTURE_PATH as CIRQ_PATH, corpus
    from generate_qiskit_fixtures import FIXTURE_PATH as QISKIT_PATH

    from tpu_qsim.utils import max_amplitude_error, to_big_endian

    cpack = np.load(CIRQ_PATH)
    qpack = np.load(QISKIT_PATH)
    worst = 0.0
    for name, n, _ in corpus():
        diff = max_amplitude_error(
            to_big_endian(qpack[name], n), cpack[name], up_to_phase=True
        )
        worst = max(worst, diff)
        assert diff < 1e-12, (name, diff)
    assert worst < 1e-12
