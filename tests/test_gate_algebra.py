"""Property-based algebra tests: identities any correct implementation must
satisfy (analog of reference tests/test_gate_algebra.cu). Comparisons use a
global-phase-insensitive comparator on random input states."""

import numpy as np
import pytest

from tpu_qsim import Circuit, SimConfig, StateVectorSimulator

from conftest import assert_states_close_up_to_phase, random_state

CFG = SimConfig(dtype="complex128", use_pallas=False)
N = 4  # enough qubits that target position matters


@pytest.fixture
def psi(rng):
    return random_state(N, rng)


def apply(build, psi0):
    sim = StateVectorSimulator(N, CFG)
    sim.set_state(psi0)
    c = Circuit(N)
    build(c)
    sim.run(c)
    return sim.get_state()


@pytest.mark.parametrize("q", range(N))
class TestInvolutions:
    def test_xx(self, q, psi):
        assert_states_close_up_to_phase(apply(lambda c: c.x(q).x(q), psi), psi)

    def test_yy(self, q, psi):
        assert_states_close_up_to_phase(apply(lambda c: c.y(q).y(q), psi), psi)

    def test_zz(self, q, psi):
        assert_states_close_up_to_phase(apply(lambda c: c.z(q).z(q), psi), psi)

    def test_hh(self, q, psi):
        assert_states_close_up_to_phase(apply(lambda c: c.h(q).h(q), psi), psi)


@pytest.mark.parametrize("q", [0, 2])
class TestPhaseFamilies:
    def test_ss_is_z(self, q, psi):
        assert_states_close_up_to_phase(
            apply(lambda c: c.s(q).s(q), psi), apply(lambda c: c.z(q), psi)
        )

    def test_tt_is_s(self, q, psi):
        assert_states_close_up_to_phase(
            apply(lambda c: c.t(q).t(q), psi), apply(lambda c: c.s(q), psi)
        )

    def test_t8_identity(self, q, psi):
        def build(c):
            for _ in range(8):
                c.t(q)
        assert_states_close_up_to_phase(apply(build, psi), psi)

    def test_sdg_s_identity(self, q, psi):
        assert_states_close_up_to_phase(apply(lambda c: c.sdg(q).s(q), psi), psi)

    def test_tdg_t_identity(self, q, psi):
        assert_states_close_up_to_phase(apply(lambda c: c.tdg(q).t(q), psi), psi)


@pytest.mark.parametrize("q", [0, 3])
class TestRotations:
    def test_full_rotation_is_identity_up_to_phase(self, q, psi):
        # R(2pi) = -I for half-angle rotations
        for name in ("rx", "ry", "rz"):
            out = apply(lambda c: c.add(name, q, param=2 * np.pi), psi)
            assert_states_close_up_to_phase(out, psi)

    def test_rotation_additivity(self, q, psi):
        a, b = 0.4, 1.1
        for name in ("rx", "ry", "rz"):
            lhs = apply(lambda c: c.add(name, q, param=a).add(name, q, param=b), psi)
            rhs = apply(lambda c: c.add(name, q, param=a + b), psi)
            assert_states_close_up_to_phase(lhs, rhs)

    def test_rz_vs_phase(self, q, psi):
        # Rz(theta) ~ P(theta) up to global phase
        th = 0.8
        lhs = apply(lambda c: c.rz(q, th), psi)
        rhs = apply(lambda c: c.p(q, th), psi)
        assert_states_close_up_to_phase(lhs, rhs)


@pytest.mark.parametrize("a,b", [(0, 1), (1, 3), (2, 0)])
class TestTwoQubitIdentities:
    def test_cnot_squared(self, a, b, psi):
        assert_states_close_up_to_phase(
            apply(lambda c: c.cnot(a, b).cnot(a, b), psi), psi
        )

    def test_cz_squared(self, a, b, psi):
        assert_states_close_up_to_phase(
            apply(lambda c: c.cz(a, b).cz(a, b), psi), psi
        )

    def test_swap_squared(self, a, b, psi):
        assert_states_close_up_to_phase(
            apply(lambda c: c.swap(a, b).swap(a, b), psi), psi
        )

    def test_cz_symmetric(self, a, b, psi):
        assert_states_close_up_to_phase(
            apply(lambda c: c.cz(a, b), psi), apply(lambda c: c.cz(b, a), psi)
        )

    def test_cnot_equals_h_cz_h(self, a, b, psi):
        lhs = apply(lambda c: c.cnot(a, b), psi)
        rhs = apply(lambda c: c.h(b).cz(a, b).h(b), psi)
        assert_states_close_up_to_phase(lhs, rhs)

    def test_swap_equals_three_cnots(self, a, b, psi):
        lhs = apply(lambda c: c.swap(a, b), psi)
        rhs = apply(lambda c: c.cnot(a, b).cnot(b, a).cnot(a, b), psi)
        assert_states_close_up_to_phase(lhs, rhs)


class TestAnticommutation:
    def test_xz_equals_minus_zx(self, psi):
        q = 1
        lhs = apply(lambda c: c.x(q).z(q), psi)
        rhs = -np.asarray(apply(lambda c: c.z(q).x(q), psi))
        np.testing.assert_allclose(lhs, rhs, atol=1e-10)


class TestToffoliIdentities:
    def test_toffoli_squared(self, psi):
        assert_states_close_up_to_phase(
            apply(lambda c: c.toffoli(0, 1, 2).toffoli(0, 1, 2), psi), psi
        )

    def test_toffoli_control_symmetry(self, psi):
        assert_states_close_up_to_phase(
            apply(lambda c: c.toffoli(0, 1, 2), psi),
            apply(lambda c: c.toffoli(1, 0, 2), psi),
        )


class TestNormPreservation:
    def test_random_circuit_preserves_norm(self, rng):
        from tpu_qsim import random_circuit

        sim = StateVectorSimulator(N, CFG)
        sim.set_state(random_state(N, rng))
        sim.run(random_circuit(N, 200, seed=11))
        assert sim.total_probability() == pytest.approx(1.0, abs=1e-9)
