"""Hand-value gate tests on the jit state-vector simulator.

The analog of the reference's tests/test_gates.cu: apply one gate, compare
the full state vector to hand-computed amplitudes. The library convention is
qubit q <-> bit q of the flat index (little-endian).
"""

import numpy as np
import pytest

from tpu_qsim import Circuit, SimConfig, StateVectorSimulator
from tpu_qsim.gates import INV_SQRT2

CFG = SimConfig(dtype="complex128", use_pallas=False)


def run_gates(n, build):
    sim = StateVectorSimulator(n, CFG)
    c = Circuit(n)
    build(c)
    sim.run(c)
    return sim.get_state()


class TestSingleQubitGates:
    def test_x_on_qubit0(self):
        # |00> -> |01> : index 1 (qubit 0 = bit 0), cf. reference
        # test_gates.cu little-endian behavior.
        s = run_gates(2, lambda c: c.x(0))
        np.testing.assert_allclose(s, [0, 1, 0, 0], atol=1e-12)

    def test_x_on_qubit1(self):
        s = run_gates(2, lambda c: c.x(1))
        np.testing.assert_allclose(s, [0, 0, 1, 0], atol=1e-12)

    def test_h(self):
        s = run_gates(1, lambda c: c.h(0))
        np.testing.assert_allclose(s, [INV_SQRT2, INV_SQRT2], atol=1e-12)

    def test_h_twice_identity(self):
        s = run_gates(1, lambda c: c.h(0).h(0))
        np.testing.assert_allclose(s, [1, 0], atol=1e-12)

    def test_y(self):
        # Y|0> = i|1>
        s = run_gates(1, lambda c: c.y(0))
        np.testing.assert_allclose(s, [0, 1j], atol=1e-12)

    def test_z_on_plus(self):
        # Z(H|0>) = |->
        s = run_gates(1, lambda c: c.h(0).z(0))
        np.testing.assert_allclose(s, [INV_SQRT2, -INV_SQRT2], atol=1e-12)

    def test_s_t_phases(self):
        s = run_gates(1, lambda c: c.x(0).s(0))
        np.testing.assert_allclose(s, [0, 1j], atol=1e-12)
        s = run_gates(1, lambda c: c.x(0).t(0))
        np.testing.assert_allclose(s, [0, np.exp(1j * np.pi / 4)], atol=1e-12)
        s = run_gates(1, lambda c: c.x(0).sdg(0))
        np.testing.assert_allclose(s, [0, -1j], atol=1e-12)
        s = run_gates(1, lambda c: c.x(0).tdg(0))
        np.testing.assert_allclose(s, [0, np.exp(-1j * np.pi / 4)], atol=1e-12)

    def test_rx_pi(self):
        # Rx(pi)|0> = -i|1>
        s = run_gates(1, lambda c: c.rx(0, np.pi))
        np.testing.assert_allclose(s, [0, -1j], atol=1e-12)

    def test_ry_pi_half(self):
        s = run_gates(1, lambda c: c.ry(0, np.pi / 2))
        np.testing.assert_allclose(s, [np.cos(np.pi / 4), np.sin(np.pi / 4)],
                                   atol=1e-12)

    def test_rz_phases(self):
        # Rz(theta)|0> = e^{-i theta/2}|0>
        theta = 0.7
        s = run_gates(1, lambda c: c.rz(0, theta))
        np.testing.assert_allclose(s, [np.exp(-0.5j * theta), 0], atol=1e-12)

    def test_p_gate(self):
        lam = 1.1
        s = run_gates(1, lambda c: c.x(0).p(0, lam))
        np.testing.assert_allclose(s, [0, np.exp(1j * lam)], atol=1e-12)


class TestTwoQubitGates:
    def test_cnot_control_set(self):
        # |01> (q0=1) --cnot(0,1)--> |11> : index 1 -> 3
        s = run_gates(2, lambda c: c.x(0).cnot(0, 1))
        np.testing.assert_allclose(s, [0, 0, 0, 1], atol=1e-12)

    def test_cnot_control_clear(self):
        s = run_gates(2, lambda c: c.cnot(0, 1))
        np.testing.assert_allclose(s, [1, 0, 0, 0], atol=1e-12)

    def test_bell_state(self):
        s = run_gates(2, lambda c: c.h(0).cnot(0, 1))
        np.testing.assert_allclose(s, [INV_SQRT2, 0, 0, INV_SQRT2], atol=1e-12)

    def test_cz_sign(self):
        # CZ on |11>
        s = run_gates(2, lambda c: c.x(0).x(1).cz(0, 1))
        np.testing.assert_allclose(s, [0, 0, 0, -1], atol=1e-12)

    def test_swap(self):
        # |01> -> |10>: index 1 -> 2
        s = run_gates(2, lambda c: c.x(0).swap(0, 1))
        np.testing.assert_allclose(s, [0, 0, 1, 0], atol=1e-12)

    def test_cry(self):
        theta = 0.9
        s = run_gates(2, lambda c: c.x(0).cry(0, 1, theta))
        expected = np.zeros(4, dtype=complex)
        expected[1] = np.cos(theta / 2)   # |q1=0,q0=1>
        expected[3] = np.sin(theta / 2)   # |q1=1,q0=1>
        np.testing.assert_allclose(s, expected, atol=1e-12)

    def test_crz(self):
        theta = 1.3
        s = run_gates(2, lambda c: c.x(0).x(1).crz(0, 1, theta))
        expected = np.zeros(4, dtype=complex)
        expected[3] = np.exp(0.5j * theta)
        np.testing.assert_allclose(s, expected, atol=1e-12)

    def test_crz_control_clear_is_identity(self):
        s = run_gates(2, lambda c: c.x(1).crz(0, 1, 2.0))
        np.testing.assert_allclose(s, [0, 0, 1, 0], atol=1e-12)


class TestThreeQubitGates:
    @pytest.mark.parametrize("c1,c2,t", [(0, 1, 2), (2, 0, 1), (1, 2, 0)])
    def test_toffoli_truth_table(self, c1, c2, t):
        # index = sum over set qubits of 2^q (reference test_gates.cu:261)
        for input_bits in range(8):
            sim = StateVectorSimulator(3, CFG)
            circ = Circuit(3)
            for q in range(3):
                if (input_bits >> q) & 1:
                    circ.x(q)
            circ.toffoli(c1, c2, t)
            sim.run(circ)
            out = input_bits
            if ((input_bits >> c1) & 1) and ((input_bits >> c2) & 1):
                out = input_bits ^ (1 << t)
            expected = np.zeros(8)
            expected[out] = 1.0
            np.testing.assert_allclose(sim.get_state(), expected, atol=1e-12)


class TestGHZ:
    @pytest.mark.parametrize("n", [2, 3, 5, 8])
    def test_ghz_probabilities(self, n):
        from tpu_qsim import ghz_circuit

        sim = StateVectorSimulator(n, CFG)
        sim.run(ghz_circuit(n))
        p = sim.get_probabilities()
        assert p[0] == pytest.approx(0.5, abs=1e-10)
        assert p[-1] == pytest.approx(0.5, abs=1e-10)
        assert p[1:-1] == pytest.approx(np.zeros((1 << n) - 2), abs=1e-10)
