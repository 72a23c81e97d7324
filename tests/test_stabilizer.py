"""Stabilizer (CHP tableau) simulator: differential tests vs the
state-vector engine on random Clifford circuits, measurement/collapse
semantics, and large-n smoke far beyond any amplitude engine's reach."""

import numpy as np
import pytest

import tpu_qsim as q
from tpu_qsim.stabilizer import CLIFFORD_GATES, StabilizerSimulator

CLIFFORD_1Q = ["i", "x", "y", "z", "h", "s", "sdg"]
CLIFFORD_2Q = ["cnot", "cz", "swap"]
PAULIS = "IXYZ"


def random_clifford_circuit(n: int, num_gates: int, seed: int) -> q.Circuit:
    rng = np.random.default_rng(seed)
    c = q.Circuit(n)
    for _ in range(num_gates):
        if n >= 2 and rng.random() < 0.4:
            a, b = rng.choice(n, size=2, replace=False)
            c.add(str(rng.choice(CLIFFORD_2Q)), int(a), int(b))
        else:
            c.add(str(rng.choice(CLIFFORD_1Q)), int(rng.integers(n)))
    return c


def sv_expectation(circuit: q.Circuit, pauli: str) -> float:
    sim = q.StateVectorSimulator(circuit.num_qubits)
    sim.run(circuit)
    return float(sim.expectation_pauli(pauli))


class TestDifferentialVsStateVector:
    @pytest.mark.parametrize("seed", range(8))
    def test_random_clifford_pauli_expectations(self, seed):
        n = 4
        circ = random_clifford_circuit(n, 30, seed)
        stab = StabilizerSimulator(n).run(circ)
        rng = np.random.default_rng(1000 + seed)
        for _ in range(12):
            pauli = "".join(rng.choice(list(PAULIS), size=n))
            want = sv_expectation(circ, pauli)
            got = stab.expectation_pauli(pauli)
            assert got in (-1.0, 0.0, 1.0)
            assert got == pytest.approx(want, abs=1e-6), (pauli, circ.to_string())

    @pytest.mark.parametrize("seed", range(4))
    def test_single_qubit_probabilities(self, seed):
        n = 5
        circ = random_clifford_circuit(n, 40, 50 + seed)
        stab = StabilizerSimulator(n).run(circ)
        sv = q.StateVectorSimulator(n)
        sv.run(circ)
        for qu in range(n):
            assert stab.qubit_probability(qu) == pytest.approx(
                float(sv.qubit_probability(qu)), abs=1e-6
            )

    def test_sample_distribution_ghz(self):
        n = 3
        circ = q.ghz_circuit(n)
        stab = StabilizerSimulator(n, seed=7).run(circ)
        vals = stab.sample(400)
        assert set(np.unique(vals)) <= {0, 2**n - 1}
        frac = float(np.mean(vals == 0))
        assert 0.35 < frac < 0.65

    def test_sample_distribution_uniform(self):
        circ = q.Circuit(2).h(0).h(1)
        stab = StabilizerSimulator(2, seed=3).run(circ)
        h = stab.histogram(2000)
        assert set(h) == {0, 1, 2, 3}
        for v in h.values():
            assert 380 < v < 620  # ~500 each


class TestMeasurement:
    def test_deterministic_outcome(self):
        stab = StabilizerSimulator(2).run(q.Circuit(2).x(0))
        assert stab.measure_qubit(0) == 1
        assert stab.measure_qubit(1) == 0

    def test_bell_outcomes_correlated(self):
        for seed in range(10):
            stab = StabilizerSimulator(2, seed=seed).run(q.bell_circuit())
            a = stab.measure_qubit(0)
            b = stab.measure_qubit(1)
            assert a == b

    def test_repeated_measurement_is_stable(self):
        stab = StabilizerSimulator(1, seed=0).run(q.Circuit(1).h(0))
        first = stab.measure_qubit(0)
        for _ in range(5):
            assert stab.measure_qubit(0) == first

    def test_collapse_updates_expectations(self):
        stab = StabilizerSimulator(2, seed=1).run(q.bell_circuit())
        assert stab.expectation_pauli("IZ") == 0.0  # Z on qubit 0
        out = stab.measure_qubit(0)
        want = 1.0 if out == 0 else -1.0
        assert stab.expectation_pauli("IZ") == want
        assert stab.expectation_pauli("ZI") == want  # Bell correlation: qubit 1

    def test_random_outcomes_are_seeded(self):
        a = StabilizerSimulator(1, seed=42).run(q.Circuit(1).h(0))
        b = StabilizerSimulator(1, seed=42).run(q.Circuit(1).h(0))
        assert a.measure_qubit(0) == b.measure_qubit(0)

    def test_sample_does_not_collapse(self):
        stab = StabilizerSimulator(2, seed=5).run(q.bell_circuit())
        stab.sample(20)
        assert stab.expectation_pauli("XX") == 1.0
        assert stab.expectation_pauli("ZZ") == 1.0
        assert stab.expectation_pauli("IZ") == 0.0


class TestStabilizerAlgebra:
    def test_ghz_stabilizer_group(self):
        n = 4
        stab = StabilizerSimulator(n).run(q.ghz_circuit(n))
        assert stab.expectation_pauli("XXXX") == 1.0
        assert stab.expectation_pauli("ZZII") == 1.0
        assert stab.expectation_pauli("IZZI") == 1.0
        assert stab.expectation_pauli("YYXX") == -1.0
        assert stab.expectation_pauli("ZIII") == 0.0

    def test_graph_state_via_cz(self):
        # star graph centered on qubit 0: |+>^3 with CZ(0,1), CZ(0,2).
        # Stabilizers (ket order, rightmost char = qubit 0):
        # X0 Z1 Z2 = "ZZX", X1 Z0 = "IXZ", X2 Z0 = "XIZ"
        stab = StabilizerSimulator(3).run(
            q.Circuit(3).h(0).h(1).h(2).cz(0, 1).cz(0, 2)
        )
        assert stab.expectation_pauli("ZZX") == 1.0
        assert stab.expectation_pauli("IXZ") == 1.0
        assert stab.expectation_pauli("XIZ") == 1.0

    def test_sdg_is_s_inverse(self):
        circ = q.Circuit(2).h(0).s(0).sdg(0).h(0)  # identity
        stab = StabilizerSimulator(2).run(circ)
        assert stab.expectation_pauli("ZI") == 1.0

    def test_y_phase_convention(self):
        # S H |0> is the +i eigenstate of Y
        stab = StabilizerSimulator(1).run(q.Circuit(1).h(0).s(0))
        assert stab.expectation_pauli("Y") == 1.0


class TestValidationAndScale:
    def test_non_clifford_gate_rejected(self):
        stab = StabilizerSimulator(2)
        with pytest.raises(ValueError, match="not Clifford"):
            stab.run(q.Circuit(2).t(0))
        with pytest.raises(ValueError, match="not Clifford"):
            stab.apply_gate("rz", 0, param=0.3)

    def test_qubit_bounds(self):
        stab = StabilizerSimulator(2)
        with pytest.raises(ValueError, match="out of range"):
            stab.apply_gate("x", 5)
        with pytest.raises(ValueError, match="out of range"):
            stab.measure_qubit(-1)
        with pytest.raises(ValueError):
            StabilizerSimulator(0)
        with pytest.raises(ValueError, match="circuit has"):
            stab.run(q.Circuit(3).x(0))

    def test_bad_pauli_string(self):
        stab = StabilizerSimulator(2)
        with pytest.raises(ValueError, match="invalid Pauli"):
            stab.expectation_pauli("ZZZ")  # longer than the register
        with pytest.raises(ValueError, match="invalid Pauli"):
            stab.expectation_pauli("QZ")

    def test_short_pauli_pads_high_qubits(self):
        stab = StabilizerSimulator(3).run(q.Circuit(3).x(0))
        assert stab.expectation_pauli("Z") == -1.0   # qubit 0
        assert stab.expectation_pauli("ZI") == 1.0   # qubit 1
        assert stab.expectation_pauli("") == 1.0

    def test_500_qubit_ghz(self):
        # beyond Circuit's MAX_QUBITS=30 (an amplitude-engine bound):
        # wide registers are driven through apply_gate directly
        n = 500
        stab = StabilizerSimulator(n, seed=9)
        stab.apply_gate("h", 0)
        for i in range(n - 1):
            stab.apply_gate("cnot", i, i + 1)
        assert stab.expectation_pauli("Z" * n) == 1.0
        assert stab.expectation_pauli("X" * n) == 1.0
        assert stab.expectation_pauli("Z" + "I" * (n - 1)) == 0.0
        bits = stab.sample(3)  # wide path: (shots, n) bit array
        assert bits.shape == (3, n)
        for row in bits:
            assert row.min() == row.max()  # all-0 or all-1
        assert stab.memory_bytes() < 2_200_000

    def test_memory_is_quadratic_not_exponential(self):
        assert StabilizerSimulator(100).memory_bytes() < 100_000

    def test_reset(self):
        stab = StabilizerSimulator(3, seed=2).run(q.ghz_circuit(3))
        stab.reset()
        assert stab.expectation_pauli("ZZZ") == 1.0
        assert stab.measure_qubit(0) == 0

    def test_clifford_gate_set_is_what_it_says(self):
        assert CLIFFORD_GATES == {
            "i", "x", "y", "z", "h", "s", "sdg", "cnot", "cz", "swap"
        }


class TestCliffordCircuit:
    """Wide-register circuit representation accepted by run()."""

    def test_wide_ghz_via_run(self):
        from tpu_qsim.stabilizer import CliffordCircuit

        n = 300
        stab = StabilizerSimulator(n, seed=3).run(CliffordCircuit.ghz(n))
        assert stab.expectation_pauli("Z" * n) == 1.0
        assert stab.expectation_pauli("X" * n) == 1.0

    def test_builder_matches_circuit_semantics(self):
        """The same Clifford program through Circuit and CliffordCircuit
        lands on the same stabilizer state (all Pauli expectations agree)."""
        from tpu_qsim.stabilizer import CliffordCircuit

        c = q.Circuit(4).h(0).cnot(0, 1).s(2).cz(1, 2).swap(2, 3).x(3).sdg(1)
        a = StabilizerSimulator(4, seed=0).run(c)
        b = StabilizerSimulator(4, seed=0).run(CliffordCircuit.from_circuit(c))
        for p in ("ZIII", "XXII", "ZZZZ", "IYIZ", "XIXI"):
            assert a.expectation_pauli(p) == b.expectation_pauli(p)

    def test_inverse_round_trip(self):
        from tpu_qsim.stabilizer import CliffordCircuit

        rng = __import__("numpy").random.default_rng(5)
        n = 64
        cc = CliffordCircuit(n)
        for _ in range(200):
            g = ["h", "s", "sdg", "x", "y", "z", "cnot", "cz", "swap"][
                int(rng.integers(0, 9))
            ]
            if g in ("cnot", "cz", "swap"):
                a_, b_ = (int(v) for v in rng.choice(n, size=2, replace=False))
                cc.add(g, a_, b_)
            else:
                cc.add(g, int(rng.integers(0, n)))
        stab = StabilizerSimulator(n, seed=1).run(cc).run(cc.inverse())
        for qb in (0, 17, 63):
            assert stab.qubit_probability(qb) == 0.0

    def test_validation(self):
        from tpu_qsim.stabilizer import CliffordCircuit

        import pytest

        cc = CliffordCircuit(3)
        with pytest.raises(ValueError, match="not Clifford"):
            cc.add("t", 0)
        with pytest.raises(ValueError, match="takes 2"):
            cc.add("cnot", 0)
        with pytest.raises(ValueError, match="out of range"):
            cc.add("h", 3)
        with pytest.raises(ValueError, match="distinct"):
            cc.add("swap", 1, 1)
        with pytest.raises(ValueError, match="qubits, simulator"):
            StabilizerSimulator(4).run(CliffordCircuit.ghz(3))

    def test_from_circuit_rejects_non_clifford(self):
        from tpu_qsim.stabilizer import CliffordCircuit

        import pytest

        with pytest.raises(ValueError, match="rz.*not Clifford"):
            CliffordCircuit.from_circuit(q.Circuit(2).h(0).rz(1, 0.3))

    def test_top_level_export(self):
        import tpu_qsim

        assert tpu_qsim.CliffordCircuit.ghz(40).num_gates == 40
