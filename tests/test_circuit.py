"""Circuit IR tests (analog of the builder/validation parts of the
reference's test_gates.cu / test_boundary.cu suites)."""

import numpy as np
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


class TestInverse:
    def test_inverse_restores_state(self):
        import tpu_qsim as q

        c = q.random_circuit(8, 60, seed=3)
        # add the gate kinds random_circuit omits
        c.s(0).t(3).sdg(5).tdg(1).cry(2, 6, 0.4).crz(0, 7, 0.9)
        c.cp(1, 4, 0.3).swap(2, 5).toffoli(0, 1, 6).mcz(0, 2, 4, 6)
        sim = q.CPUReferenceSimulator(8)
        sim.run(c)
        sim.run(c.inverse())
        expected = np.zeros(1 << 8, dtype=np.complex128)
        expected[0] = 1.0
        np.testing.assert_allclose(sim.get_state(), expected, atol=1e-12)

    def test_registered_gate_inverts_via_adjoint(self):
        import tpu_qsim as q
        from tpu_qsim.gates import register_gate

        rng = np.random.default_rng(5)
        m = rng.standard_normal((4, 4)) + 1j * rng.standard_normal((4, 4))
        qm, _ = np.linalg.qr(m)
        register_gate("inv_test_u2", qm, num_qubits=2)
        c = Circuit(4).h(0).add("inv_test_u2", 1, 3).cnot(0, 2)
        sim = q.CPUReferenceSimulator(4)
        sim.run(c)
        sim.run(c.inverse())
        got = sim.get_state()
        assert abs(got[0] - 1.0) < 1e-12
        assert np.abs(got[1:]).max() < 1e-12

    def test_registered_param_gate_raises(self):
        from tpu_qsim.gates import register_gate

        register_gate(
            "inv_test_p1",
            lambda t: np.array(
                [[1, 0], [0, np.exp(1j * t)]], dtype=np.complex128
            ),
            num_qubits=1,
        )
        c = Circuit(2).add("inv_test_p1", 0, param=0.3)
        with pytest.raises(ValueError, match="cannot invert"):
            c.inverse()


class TestRegistryHygiene:
    """Round-4 VERDICT item 7: no global side effects from inverse(); inline
    matrix payloads are validated and hash-distinct."""

    def test_inverse_does_not_register_global_gates(self):
        import tpu_qsim as q
        from tpu_qsim import gates as G

        rng = np.random.default_rng(11)
        m = rng.standard_normal((2, 2)) + 1j * rng.standard_normal((2, 2))
        qm, _ = np.linalg.qr(m)
        G.register_gate("hyg_test_u1", qm)
        before = set(G.GATE_NAMES)
        c = Circuit(3).add("hyg_test_u1", 1).h(0)
        inv = c.inverse()
        assert set(G.GATE_NAMES) == before  # no __dag registration
        g = inv.gates[-1]
        assert g.matrix_bytes is not None
        np.testing.assert_allclose(g.matrix, qm.conj().T, atol=1e-15)
        # double inverse round-trips numerically
        sim = q.CPUReferenceSimulator(3)
        sim.run(c)
        sim.run(inv)
        got = sim.get_state()
        assert abs(got[0] - 1.0) < 1e-12 and np.abs(got[1:]).max() < 1e-12

    def test_inline_matrix_gate_validation(self):
        good = np.ascontiguousarray(np.eye(2, dtype=np.complex128)).tobytes()
        Gate("anything", (0,), matrix_bytes=good)  # name needn't be registered
        with pytest.raises(ValueError, match="payload"):
            Gate("bad", (0, 1), matrix_bytes=good)  # wrong size for 2 qubits
        with pytest.raises(ValueError, match="no parameter"):
            Gate("bad", (0,), param=0.5, matrix_bytes=good)

    def test_inline_matrix_distinguishes_signature(self):
        a = np.ascontiguousarray(np.eye(2, dtype=np.complex128)).tobytes()
        b = np.ascontiguousarray(
            np.array([[0, 1], [1, 0]], dtype=np.complex128)
        ).tobytes()
        g1 = Gate("u", (0,), matrix_bytes=a)
        g2 = Gate("u", (0,), matrix_bytes=b)
        assert g1 != g2 and hash(g1) != hash(g2)

    def test_mcz_registration_updates_shared_sets_in_place(self):
        from tpu_qsim import gates as G

        names_obj = G.GATE_NAMES
        diag_obj = G.DIAGONAL_GATES
        Circuit(9).mcz(*range(9))
        assert "mcz9" in names_obj and "mcz9" in diag_obj  # same objects
