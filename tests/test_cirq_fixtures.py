"""Vendored Cirq-convention fixture pack (validation/fixtures): the pack
loads, carries provenance, regenerates bit-exactly from its script, and a
sample of cases matches our complex128 engine through the bit-reversal
adapter (full 67-case sweep runs in validation/validate_against_cirq.py)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "validation"))

import tpu_qsim as q


@pytest.fixture(scope="module")
def pack():
    from generate_cirq_fixtures import FIXTURE_PATH

    return np.load(FIXTURE_PATH)


def test_pack_has_provenance_and_cases(pack):
    assert "__provenance__" in pack.files
    assert len(pack.files) >= 60


@pytest.mark.parametrize(
    "case", ["ghz-8", "qft-6", "random-8", "toffoli-310", "cp-31"]
)
def test_sample_cases_match_our_engine(pack, case):
    from generate_cirq_fixtures import corpus

    from tpu_qsim.utils import max_amplitude_error, to_big_endian

    name_to_case = {nm: (n, gates) for nm, n, gates in corpus()}
    n, gates = name_to_case[case]
    c = q.Circuit(n)
    for gname, qubits, param in gates:
        c.add(gname, *qubits, param=param)
    sim = q.CPUReferenceSimulator(n)
    sim.run(c)
    ours = to_big_endian(sim.get_state(), n)
    assert max_amplitude_error(ours, pack[case], up_to_phase=True) < 1e-12


def test_pack_regenerates_exactly():
    from generate_cirq_fixtures import FIXTURE_PATH, generate

    amps, _ = generate()
    pack = np.load(FIXTURE_PATH)
    for k, v in amps.items():
        assert np.abs(pack[k] - v).max() == 0.0, k
