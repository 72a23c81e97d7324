"""Density-matrix physics tests (analog of reference
tests/test_density_matrix.cu) plus differential checks against the pure-state
simulator and exact channel algebra the reference approximated."""

import numpy as np
import pytest

from tpu_qsim import Circuit, SimConfig, StateVectorSimulator, bell_circuit
from tpu_qsim.density import MAX_DM_QUBITS, DensityMatrixSimulator
from tpu_qsim.noise import NoiseModel, NoiseType, kraus_operators

CFG = SimConfig(dtype="complex128", use_pallas=False)


def dm(n, noise=None):
    return DensityMatrixSimulator(n, noise, CFG)


class TestInitialization:
    def test_ground_state(self):
        sim = dm(2)
        rho = sim.get_matrix()
        expected = np.zeros((4, 4))
        expected[0, 0] = 1.0
        np.testing.assert_allclose(rho, expected, atol=1e-12)
        assert sim.trace() == pytest.approx(1.0)
        assert sim.purity() == pytest.approx(1.0)

    def test_basis_reset(self):
        sim = dm(2)
        sim.reset(3)
        rho = sim.get_matrix()
        assert rho[3, 3] == pytest.approx(1.0)
        assert np.sum(np.abs(rho)) == pytest.approx(1.0)

    def test_maximally_mixed(self):
        sim = dm(3)
        sim.set_maximally_mixed()
        np.testing.assert_allclose(sim.get_matrix(), np.eye(8) / 8, atol=1e-12)
        assert sim.trace() == pytest.approx(1.0)
        assert sim.purity() == pytest.approx(1.0 / 8)
        assert sim.is_valid()

    def test_from_pure_state(self):
        psi = np.array([1, 1j, 0, 0]) / np.sqrt(2)
        sim = dm(2)
        sim.init_from_pure_state(psi)
        np.testing.assert_allclose(sim.get_matrix(), np.outer(psi, psi.conj()),
                                   atol=1e-12)
        assert sim.purity() == pytest.approx(1.0)

    def test_qubit_limit(self):
        with pytest.raises(ValueError):
            DensityMatrixSimulator(MAX_DM_QUBITS + 1, None, CFG)
        with pytest.raises(ValueError):
            DensityMatrixSimulator(0, None, CFG)


class TestGatesOnDensityMatrix:
    @pytest.mark.parametrize("build", [
        lambda c: c.h(0),
        lambda c: c.x(0).y(1),
        lambda c: c.h(0).cnot(0, 1),
        lambda c: c.h(0).s(1).cz(0, 1).t(0),
        lambda c: c.rx(0, 0.7).cry(0, 1, 1.2).swap(0, 1),
        lambda c: c.h(0).crz(1, 0, 0.9).rz(1, 0.4),
    ])
    def test_matches_pure_state_evolution(self, build):
        # no noise => rho must equal |psi><psi| from the SV simulator
        n = 2
        c = Circuit(n)
        build(c)
        sv = StateVectorSimulator(n, CFG)
        sv.run(c)
        psi = sv.get_state()

        sim = dm(n)
        sim.run(c)
        np.testing.assert_allclose(sim.get_matrix(), np.outer(psi, psi.conj()),
                                   atol=1e-12)

    def test_three_qubit_gate(self):
        # Toffoli *threw* in the reference DM simulator; here it must work.
        c = Circuit(3).x(0).x(1).toffoli(0, 1, 2)
        sim = dm(3)
        sim.run(c)
        probs = np.asarray(sim.probabilities())
        assert probs[7] == pytest.approx(1.0, abs=1e-12)

    def test_bell_diagonal(self):
        sim = dm(2)
        sim.run(bell_circuit())
        p = np.asarray(sim.probabilities())
        np.testing.assert_allclose(p, [0.5, 0, 0, 0.5], atol=1e-12)
        assert sim.purity() == pytest.approx(1.0)


class TestKrausChannels:
    def _apply_channel_manually(self, rho, ntype, p, qubit, n):
        out = np.zeros_like(rho)
        for k in kraus_operators(ntype, p):
            full = 1
            for q in reversed(range(n)):  # qubit 0 = LSB -> rightmost factor
                full = np.kron(full, k if q == qubit else np.eye(2))
            out += full @ rho @ full.conj().T
        return out

    @pytest.mark.parametrize("ntype", list(NoiseType))
    def test_exact_channel_vs_manual(self, ntype):
        # Differential: simulator channel == dense Kraus algebra on a
        # non-trivial state. Catches the depolarizing/bit-phase-flip
        # approximations the reference shipped.
        n, p = 2, 0.23
        nm = NoiseModel().add(ntype, p, 0)
        sim = dm(n, nm)
        c = Circuit(n).h(0).cnot(0, 1)  # gate qubits include 0 -> channel fires
        sim.run(c)

        # manual: bell rho, then channel on qubit 0 fired after each gate
        sv = StateVectorSimulator(n, CFG)
        rho = np.zeros((4, 4), dtype=complex)
        rho[0, 0] = 1.0
        from tpu_qsim.gates import gate_matrix
        from tpu_qsim.fusion import expand_matrix
        for g in c.gates:
            u = expand_matrix(gate_matrix(g.name, g.param), g.qubits,
                              tuple(sorted(range(n), reverse=True)))
            rho = u @ rho @ u.conj().T
            for q in g.qubits:
                if q == 0:  # the channel is registered on qubit 0 only
                    rho = self._apply_channel_manually(rho, ntype, p, q, n)
        np.testing.assert_allclose(sim.get_matrix(), rho, atol=1e-12)

    def test_depolarizing_exact_endpoint(self):
        # p=1 depolarizing (uniform Pauli mix) on |0>:
        # rho -> (1/3)(XrhoX + YrhoY + ZrhoZ) = diag(1/3, 2/3)
        nm = NoiseModel().add_depolarizing(1.0, 0)
        sim = dm(1, nm)
        sim.run(Circuit(1).i(0))
        np.testing.assert_allclose(sim.get_matrix(),
                                   np.diag([1 / 3, 2 / 3]), atol=1e-12)

    def test_noise_reduces_purity(self):
        nm = NoiseModel().add_depolarizing(0.1)
        sim = dm(2, nm)
        sim.run(bell_circuit())
        assert sim.purity() < 1.0 - 1e-4
        assert sim.trace() == pytest.approx(1.0, abs=1e-10)
        assert sim.is_valid()

    def test_phase_damping_preserves_diagonal(self):
        nm = NoiseModel().add_phase_damping(0.4)
        sim = dm(2, nm)
        sim.run(bell_circuit())
        ideal = dm(2)
        ideal.run(bell_circuit())
        np.testing.assert_allclose(np.asarray(sim.probabilities()),
                                   np.asarray(ideal.probabilities()),
                                   atol=1e-10)
        # but coherence is reduced
        assert abs(sim.get_matrix()[0, 3]) < abs(ideal.get_matrix()[0, 3])

    def test_amplitude_damping_full_decay(self):
        nm = NoiseModel().add_amplitude_damping(1.0, 0)
        sim = dm(1, nm)
        sim.run(Circuit(1).x(0))
        np.testing.assert_allclose(sim.get_matrix(), np.diag([1.0, 0.0]),
                                   atol=1e-12)

    def test_trace_preserved_under_deep_noise(self):
        from tpu_qsim import random_circuit
        nm = (NoiseModel().add_depolarizing(0.02)
              .add_amplitude_damping(0.01).add_phase_damping(0.015))
        sim = dm(3, nm)
        sim.run(random_circuit(3, 60, seed=8))
        assert sim.trace() == pytest.approx(1.0, abs=1e-9)
        assert sim.is_valid()


class TestMeasurement:
    def test_deterministic_measurement(self):
        sim = dm(2)
        sim.run(Circuit(2).x(1))
        assert sim.measure_qubit(1) == 1
        assert sim.measure_qubit(0) == 0
        assert sim.trace() == pytest.approx(1.0, abs=1e-10)

    def test_bell_measurement_collapses(self):
        sim = DensityMatrixSimulator(2, None, CFG, seed=3)
        sim.run(bell_circuit())
        m0 = sim.measure_qubit(0)
        # after measuring qubit 0, qubit 1 must be perfectly correlated
        m1 = sim.measure_qubit(1)
        assert m0 == m1
        assert sim.purity() == pytest.approx(1.0, abs=1e-9)

    def test_mixed_state_sampling(self):
        sim = DensityMatrixSimulator(2, None, CFG, seed=1)
        sim.set_maximally_mixed()
        s = np.asarray(sim.sample(4000))
        counts = np.bincount(s, minlength=4) / 4000
        np.testing.assert_allclose(counts, [0.25] * 4, atol=0.03)


class TestQubitProbability:
    def test_qubit_probability(self):
        nm = NoiseModel().add_bit_flip(0.2, 0)
        sim = dm(1, nm)
        sim.run(Circuit(1).i(0))
        assert sim.qubit_probability(0) == pytest.approx(0.2, abs=1e-10)


class TestMixedStateExpectation:
    def test_werner_state_zz(self):
        # regression: the inherited pure-state expectation computed
        # tr(rho^2 P) instead of tr(rho P) on mixed states
        from tpu_qsim.noise import NoiseModel

        lam = 0.5  # rho = lam |Phi+><Phi+| + (1-lam) I/4
        bell = np.zeros((4, 4), dtype=complex)
        bell[0, 0] = bell[0, 3] = bell[3, 0] = bell[3, 3] = 0.5
        rho = lam * bell + (1 - lam) * np.eye(4) / 4
        sim = dm(2)
        sim.set_matrix(rho)
        # tr(rho ZZ) = lam * 1 + (1-lam) * 0 = lam
        assert sim.expectation_pauli("ZZ") == pytest.approx(lam, abs=1e-10)
        assert sim.expectation_pauli("XX") == pytest.approx(lam, abs=1e-10)
        assert sim.expectation_pauli("Z") == pytest.approx(0.0, abs=1e-10)
        assert sim.expectation_pauli("II") == pytest.approx(1.0, abs=1e-10)

    def test_matches_pure_state_when_pure(self):
        from tpu_qsim import StateVectorSimulator

        c = Circuit(2).h(0).t(0).cnot(0, 1).ry(1, 0.7)
        sv = StateVectorSimulator(2, CFG)
        sv.run(c)
        d = dm(2)
        d.run(c)
        for pauli in ("Z", "ZZ", "XY", "YX", "XX"):
            assert d.expectation_pauli(pauli) == pytest.approx(
                sv.expectation_pauli(pauli), abs=1e-10
            )
