"""Extensibility + statistical rigor tests: custom matrices, user-registered
gates, chi-square goodness-of-fit on the sampler."""

import numpy as np
import pytest

from tpu_qsim import Circuit, CPUReferenceSimulator, SimConfig, StateVectorSimulator

CFG = SimConfig(dtype="complex128", use_pallas=False)


class TestApplyMatrix:
    def test_matches_named_gate(self, rng):
        from conftest import random_state

        from tpu_qsim.gates import CNOT, H

        psi0 = random_state(3, rng)
        a = StateVectorSimulator(3, CFG)
        a.set_state(psi0)
        a.apply_matrix(H, (1,))
        a.apply_matrix(CNOT, (0, 2))

        b = StateVectorSimulator(3, CFG)
        b.set_state(psi0)
        b.run(Circuit(3).h(1).cnot(0, 2))
        np.testing.assert_allclose(a.get_state(), b.get_state(), atol=1e-12)

    def test_random_unitary(self, rng):
        from conftest import random_state

        u = np.linalg.qr(
            rng.standard_normal((8, 8)) + 1j * rng.standard_normal((8, 8))
        )[0]
        psi0 = random_state(4, rng)
        sim = StateVectorSimulator(4, CFG)
        sim.set_state(psi0)
        sim.apply_matrix(u, (3, 1, 0))

        ora = CPUReferenceSimulator(4)
        ora.set_state(psi0)
        ora.apply_matrix(u, (3, 1, 0))
        np.testing.assert_allclose(sim.get_state(), ora.get_state(), atol=1e-12)
        assert sim.total_probability() == pytest.approx(1.0, abs=1e-10)

    def test_non_unitary_rejected(self):
        sim = StateVectorSimulator(2, CFG)
        with pytest.raises(ValueError, match="unitary"):
            sim.apply_matrix(np.ones((2, 2)), (0,))

    def test_shape_mismatch_rejected(self):
        sim = StateVectorSimulator(2, CFG)
        with pytest.raises(ValueError, match="shape"):
            sim.apply_matrix(np.eye(4), (0,))

    def test_program_cache_by_matrix(self, rng):
        u = np.linalg.qr(
            rng.standard_normal((2, 2)) + 1j * rng.standard_normal((2, 2))
        )[0]
        sim = StateVectorSimulator(2, CFG)
        sim.apply_matrix(u, (0,))
        size = len(sim._run_cache)
        sim.apply_matrix(u, (0,))
        assert len(sim._run_cache) == size


class TestRegisterGate:
    def test_fixed_gate_roundtrip(self):
        from tpu_qsim import gates

        sx = np.array([[1 + 1j, 1 - 1j], [1 - 1j, 1 + 1j]]) / 2  # sqrt(X)
        if "sx_test" not in gates.GATE_NAMES:
            gates.register_gate("sx_test", sx)
        sim = StateVectorSimulator(1, CFG)
        sim.run(Circuit(1).add("sx_test", 0).add("sx_test", 0))
        # sqrt(X)^2 = X
        np.testing.assert_allclose(sim.get_probabilities(), [0, 1], atol=1e-10)

    def test_parameterized_gate(self):
        from tpu_qsim import gates

        def rzz(theta):
            return np.diag(np.exp(1j * theta / 2 * np.array([-1, 1, 1, -1])))

        if "rzz_test" not in gates.GATE_NAMES:
            gates.register_gate("rzz_test", rzz, num_qubits=2)
        sim = StateVectorSimulator(2, CFG)
        sim.run(Circuit(2).h(0).h(1).add("rzz_test", 0, 1, param=0.8))
        assert sim.total_probability() == pytest.approx(1.0, abs=1e-10)

    def test_duplicate_rejected(self):
        from tpu_qsim import gates

        with pytest.raises(ValueError, match="already exists"):
            gates.register_gate("h", np.eye(2))

    def test_non_unitary_rejected(self):
        from tpu_qsim import gates

        with pytest.raises(ValueError, match="unitary"):
            gates.register_gate("bad_test", np.ones((2, 2)))


class TestSamplerStatistics:
    def test_chi_square_uniform(self):
        # H^3 |000> is uniform over 8 outcomes; chi-square at alpha=0.001
        # (7 dof -> critical value 24.32)
        n, shots = 3, 8000
        sim = StateVectorSimulator(n, CFG, seed=123)
        c = Circuit(n)
        for q in range(n):
            c.h(q)
        sim.run(c)
        counts = np.bincount(np.asarray(sim.sample(shots)), minlength=8)
        expected = shots / 8
        chi2 = float(np.sum((counts - expected) ** 2 / expected))
        assert chi2 < 24.32, f"chi2={chi2}, counts={counts}"

    def test_chi_square_biased(self):
        # Ry(2*pi/6)|0>: P(1) = sin^2(pi/6) = 0.25
        shots = 8000
        sim = StateVectorSimulator(1, CFG, seed=7)
        sim.run(Circuit(1).ry(0, np.pi / 3))
        counts = np.bincount(np.asarray(sim.sample(shots)), minlength=2)
        expected = np.array([0.75, 0.25]) * shots
        chi2 = float(np.sum((counts - expected) ** 2 / expected))
        assert chi2 < 10.83  # 1 dof, alpha=0.001
