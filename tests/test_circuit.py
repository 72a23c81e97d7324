"""Circuit IR tests (analog of the builder/validation parts of the
reference's test_gates.cu / test_boundary.cu suites)."""

import pytest

from tpu_qsim.circuit import (
    Circuit,
    Gate,
    bell_circuit,
    ghz_circuit,
    random_circuit,
)


class TestGateValidation:
    def test_unknown_gate(self):
        with pytest.raises(ValueError, match="unknown gate"):
            Gate("bogus", (0,))

    def test_wrong_arity(self):
        with pytest.raises(ValueError, match="acts on 2"):
            Gate("cnot", (0,))
        with pytest.raises(ValueError, match="acts on 1"):
            Gate("h", (0, 1))

    def test_duplicate_qubits(self):
        with pytest.raises(ValueError, match="distinct"):
            Gate("cnot", (1, 1))
        with pytest.raises(ValueError, match="distinct"):
            Gate("toffoli", (0, 1, 0))

    def test_param_required(self):
        with pytest.raises(ValueError, match="requires a parameter"):
            Gate("rx", (0,))

    def test_param_forbidden(self):
        with pytest.raises(ValueError, match="takes no parameter"):
            Gate("x", (0,), 1.0)


class TestCircuitBuilder:
    def test_fluent_chaining(self):
        c = Circuit(3).h(0).cnot(0, 1).rz(2, 0.5).toffoli(0, 1, 2)
        assert len(c) == 4
        names = [g.name for g in c]
        assert names == ["h", "cnot", "rz", "toffoli"]

    def test_aliases(self):
        c = Circuit(3).cx(0, 1).ccx(0, 1, 2)
        assert [g.name for g in c] == ["cnot", "toffoli"]

    def test_qubit_out_of_range(self):
        with pytest.raises(ValueError, match="out of range"):
            Circuit(2).h(2)
        with pytest.raises(ValueError, match="out of range"):
            Circuit(2).cnot(0, 5)

    def test_invalid_qubit_count(self):
        with pytest.raises(ValueError):
            Circuit(0)
        with pytest.raises(ValueError):
            Circuit(100)

    def test_depth(self):
        # Same leveling semantics as reference Circuit::getDepth
        # (src/Circuit.cpp:165-182).
        c = Circuit(3).h(0).h(1).h(2)
        assert c.depth() == 1
        c = Circuit(3).h(0).cnot(0, 1).cnot(1, 2)
        assert c.depth() == 3
        c = Circuit(4).h(0).h(1).cnot(0, 1).h(2).h(3).cnot(2, 3)
        assert c.depth() == 2
        assert Circuit(2).depth() == 0

    def test_to_string(self):
        s = Circuit(2).h(0).rz(1, 0.25).to_string()
        assert "h(0)" in s
        assert "rz(1, 0.25)" in s

    def test_signature_and_structure(self):
        a = Circuit(2).h(0).rz(1, 0.5)
        b = Circuit(2).h(0).rz(1, 0.5)
        c = Circuit(2).h(0).rz(1, 0.7)
        assert a.signature() == b.signature()
        assert a.signature() != c.signature()
        assert a.structure() == c.structure()
        assert hash(a) == hash(b)
        assert a == b and a != c


class TestFactories:
    def test_bell(self):
        c = bell_circuit()
        assert c.num_qubits == 2
        assert [(g.name, g.qubits) for g in c] == [("h", (0,)), ("cnot", (0, 1))]

    def test_ghz(self):
        c = ghz_circuit(5)
        assert len(c) == 5
        assert c.gates[0].name == "h"
        assert all(g.name == "cnot" for g in c.gates[1:])
        with pytest.raises(ValueError):
            ghz_circuit(1)

    def test_random_reproducible(self):
        a = random_circuit(6, 50, seed=7)
        b = random_circuit(6, 50, seed=7)
        c = random_circuit(6, 50, seed=8)
        assert a.signature() == b.signature()
        assert a.signature() != c.signature()
        assert len(a) == 50
        assert set(g.name for g in a) <= {"h", "x", "cnot", "rz"}

    def test_random_single_qubit(self):
        c = random_circuit(1, 20, seed=3)
        assert all(g.arity == 1 for g in c)
