"""State container / readout tests (analog of reference
tests/test_statevector.cu): init invariants, basis init, sampling
determinism, measurement collapse, Bell correlations, checkpoint/resume,
demo smoke."""

import os

import numpy as np
import pytest

import jax

from tpu_qsim import Circuit, SimConfig, StateVectorSimulator, bell_circuit

CFG = SimConfig(dtype="complex128", use_pallas=False)


class TestInitialization:
    def test_ground_state(self):
        sim = StateVectorSimulator(3, CFG)
        s = sim.get_state()
        assert s[0] == 1.0
        assert np.all(s[1:] == 0)
        assert sim.total_probability() == pytest.approx(1.0)

    def test_basis_init(self):
        sim = StateVectorSimulator(3, CFG)
        sim.reset(5)
        assert sim.get_state()[5] == 1.0
        assert sim.qubit_probability(0) == pytest.approx(1.0)  # 5 = 0b101
        assert sim.qubit_probability(1) == pytest.approx(0.0)
        assert sim.qubit_probability(2) == pytest.approx(1.0)

    def test_set_get_roundtrip(self, rng):
        from conftest import random_state

        psi = random_state(4, rng)
        sim = StateVectorSimulator(4, CFG)
        sim.set_state(psi)
        np.testing.assert_allclose(sim.get_state(), psi, atol=1e-15)


class TestSampling:
    def test_basis_state_sampling_deterministic(self):
        sim = StateVectorSimulator(3, CFG, seed=9)
        sim.reset(6)
        s = np.asarray(sim.sample(100))
        assert np.all(s == 6)

    def test_sampling_reproducible_with_key(self):
        k = jax.random.PRNGKey(5)
        sim = StateVectorSimulator(2, CFG)
        sim.run(bell_circuit())
        a = np.asarray(sim.sample(50, key=k))
        b = np.asarray(sim.sample(50, key=k))
        np.testing.assert_array_equal(a, b)

    def test_bell_sampling_distribution(self):
        sim = StateVectorSimulator(2, CFG, seed=0)
        sim.run(bell_circuit())
        h = sim.histogram(4000)
        assert set(h) <= {0, 3}
        assert h[0] == pytest.approx(2000, abs=200)

    def test_key_chain_advances(self):
        sim = StateVectorSimulator(2, CFG, seed=0)
        sim.run(bell_circuit())
        a = np.asarray(sim.sample(50))
        b = np.asarray(sim.sample(50))
        assert not np.array_equal(a, b)  # chained keys differ


class TestMeasurement:
    def test_deterministic_outcomes(self):
        sim = StateVectorSimulator(2, CFG)
        sim.run(Circuit(2).x(1))
        assert sim.measure_qubit(1) == 1
        assert sim.measure_qubit(0) == 0

    def test_collapse_renormalizes(self):
        sim = StateVectorSimulator(2, CFG, seed=4)
        sim.run(bell_circuit())
        sim.measure_qubit(0)
        assert sim.total_probability() == pytest.approx(1.0, abs=1e-10)

    def test_bell_correlation(self):
        for seed in range(8):
            sim = StateVectorSimulator(2, CFG, seed=seed)
            sim.run(bell_circuit())
            assert sim.measure_qubit(0) == sim.measure_qubit(1)

    def test_measurement_statistics(self):
        outcomes = [
            StateVectorSimulator(1, CFG, seed=s).run(Circuit(1).h(0)).measure_qubit(0)
            for s in range(200)
        ]
        assert 60 < sum(outcomes) < 140  # ~Binomial(200, 0.5)


class TestCheckpoint:
    def test_save_load_roundtrip(self, tmp_path):
        path = str(tmp_path / "ckpt.npz")
        sim = StateVectorSimulator(4, CFG, seed=2)
        sim.run(Circuit(4).h(0).cnot(0, 1).rz(2, 0.7).toffoli(0, 1, 3))
        sim.save_state(path)

        restored = StateVectorSimulator(4, CFG)
        restored.load_state(path)
        np.testing.assert_allclose(restored.get_state(), sim.get_state(),
                                   atol=1e-15)

    def test_load_mismatch_raises(self, tmp_path):
        path = str(tmp_path / "ckpt.npz")
        StateVectorSimulator(3, CFG).save_state(path)
        with pytest.raises(ValueError, match="qubits"):
            StateVectorSimulator(4, CFG).load_state(path)


class TestDemo:
    def test_demo_runs(self, capsys):
        from tpu_qsim.__main__ import main

        assert main() == 0
        out = capsys.readouterr().out
        assert "Bell state" in out
        assert "GHZ-4" in out
        assert "purity" in out


class TestExpectationValues:
    def test_z_on_ground(self):
        sim = StateVectorSimulator(2, CFG)
        assert sim.expectation_pauli("Z") == pytest.approx(1.0)
        assert sim.expectation_pauli("ZZ") == pytest.approx(1.0)

    def test_z_on_excited(self):
        sim = StateVectorSimulator(2, CFG)
        sim.run(Circuit(2).x(0))
        assert sim.expectation_pauli("Z") == pytest.approx(-1.0)   # qubit 0
        assert sim.expectation_pauli("ZI") == pytest.approx(1.0)   # qubit 1
        assert sim.expectation_pauli("ZZ") == pytest.approx(-1.0)

    def test_x_on_plus(self):
        sim = StateVectorSimulator(1, CFG)
        sim.run(Circuit(1).h(0))
        assert sim.expectation_pauli("X") == pytest.approx(1.0)
        assert sim.expectation_pauli("Z") == pytest.approx(0.0, abs=1e-12)

    def test_y_eigenstate(self):
        # S H |0> = (|0> + i|1>)/sqrt2 is the +1 eigenstate of Y
        sim = StateVectorSimulator(1, CFG)
        sim.run(Circuit(1).h(0).s(0))
        assert sim.expectation_pauli("Y") == pytest.approx(1.0)

    def test_bell_correlations(self):
        sim = StateVectorSimulator(2, CFG)
        sim.run(bell_circuit())
        assert sim.expectation_pauli("ZZ") == pytest.approx(1.0)
        assert sim.expectation_pauli("XX") == pytest.approx(1.0)
        assert sim.expectation_pauli("YY") == pytest.approx(-1.0)
        assert sim.expectation_pauli("Z") == pytest.approx(0.0, abs=1e-12)

    def test_identity_string(self):
        sim = StateVectorSimulator(3, CFG)
        assert sim.expectation_pauli("III") == 1.0

    def test_invalid_string(self):
        sim = StateVectorSimulator(2, CFG)
        with pytest.raises(ValueError):
            sim.expectation_pauli("QZ")
        with pytest.raises(ValueError):
            sim.expectation_pauli("ZZZ")
