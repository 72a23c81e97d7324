"""Parameterized execution + extended circuit library tests (QFT, ansatz,
cp gate) — capabilities beyond the reference's surface."""

import numpy as np
import pytest

from tpu_qsim import (
    Circuit,
    CPUReferenceSimulator,
    SimConfig,
    StateVectorSimulator,
)
from tpu_qsim.circuit import hardware_efficient_ansatz, qft_circuit

CFG = SimConfig(dtype="complex128", use_pallas=False)


class TestQFT:
    @pytest.mark.parametrize("n,basis", [(3, 5), (4, 11), (5, 0), (1, 1)])
    def test_qft_analytic(self, n, basis):
        sim = StateVectorSimulator(n, CFG)
        sim.reset(basis)
        sim.run(qft_circuit(n))
        dim = 1 << n
        expected = np.exp(2j * np.pi * basis * np.arange(dim) / dim) / np.sqrt(dim)
        np.testing.assert_allclose(sim.get_state(), expected, atol=1e-12)

    def test_qft_matches_oracle(self, rng):
        from conftest import random_state

        n = 5
        psi0 = random_state(n, rng)
        c = qft_circuit(n)
        sim = StateVectorSimulator(n, CFG)
        sim.set_state(psi0)
        sim.run(c)
        ora = CPUReferenceSimulator(n)
        ora.set_state(psi0)
        ora.run(c)
        np.testing.assert_allclose(sim.get_state(), ora.get_state(), atol=1e-12)


class TestCPGate:
    def test_cp_phase(self):
        sim = StateVectorSimulator(2, CFG)
        sim.run(Circuit(2).x(0).x(1).cp(0, 1, 0.7))
        np.testing.assert_allclose(
            sim.get_state(), [0, 0, 0, np.exp(0.7j)], atol=1e-12
        )

    def test_cp_control_clear(self):
        sim = StateVectorSimulator(2, CFG)
        sim.run(Circuit(2).x(1).cp(0, 1, 0.7))
        np.testing.assert_allclose(sim.get_state(), [0, 0, 1, 0], atol=1e-12)

    def test_cp_symmetric(self, rng):
        from conftest import random_state

        psi0 = random_state(3, rng)
        a = StateVectorSimulator(3, CFG)
        a.set_state(psi0)
        a.run(Circuit(3).cp(0, 2, 1.1))
        b = StateVectorSimulator(3, CFG)
        b.set_state(psi0)
        b.run(Circuit(3).cp(2, 0, 1.1))
        np.testing.assert_allclose(a.get_state(), b.get_state(), atol=1e-12)


class TestParameterizedExecution:
    def test_matches_static_run(self):
        c = hardware_efficient_ansatz(4, 2, seed=3)
        static = StateVectorSimulator(4, CFG)
        static.run(c)
        dynamic = StateVectorSimulator(4, CFG)
        dynamic.run_parameterized(c)
        np.testing.assert_allclose(dynamic.get_state(), static.get_state(),
                                   atol=1e-12)

    def test_parameter_sweep_shares_executable(self):
        c = hardware_efficient_ansatz(3, 1, seed=0)
        sim = StateVectorSimulator(3, CFG)
        base_params = np.asarray(c.params())
        sim.run_parameterized(c, base_params)
        n_compiled = len(sim._run_cache)
        out1 = sim.get_state()

        sim.reset()
        sim.run_parameterized(c, base_params * 0.5)
        assert len(sim._run_cache) == n_compiled  # no recompile
        out2 = sim.get_state()
        assert not np.allclose(out1, out2)

        # sweep result must equal a static run of the re-parameterized circuit
        gates = c.gates
        swept = Circuit(3)
        pi = 0
        for g in gates:
            if g.param is not None:
                swept.add(g.name, *g.qubits, param=float(base_params[pi] * 0.5))
                pi += 1
            else:
                swept.add(g.name, *g.qubits)
        static = StateVectorSimulator(3, CFG)
        static.run(swept)
        np.testing.assert_allclose(out2, static.get_state(), atol=1e-12)

    def test_all_traced_gate_types(self, rng):
        from conftest import random_state

        psi0 = random_state(3, rng)
        c = (Circuit(3).rx(0, 0.3).ry(1, 1.2).rz(2, 2.1).p(0, 0.5)
             .cry(0, 1, 0.8).crz(1, 2, 1.5).cp(2, 0, 0.9).h(1).cnot(0, 2))
        dyn = StateVectorSimulator(3, CFG)
        dyn.set_state(psi0)
        dyn.run_parameterized(c)
        ora = CPUReferenceSimulator(3)
        ora.set_state(psi0)
        ora.run(c)
        np.testing.assert_allclose(dyn.get_state(), ora.get_state(), atol=1e-12)

    def test_wrong_param_count_raises(self):
        c = Circuit(2).rx(0, 0.5)
        sim = StateVectorSimulator(2, CFG)
        with pytest.raises(ValueError, match="parameters"):
            sim.run_parameterized(c, np.zeros(3))


class TestAnsatzFactory:
    def test_structure(self):
        c = hardware_efficient_ansatz(4, 3, seed=1)
        assert len(c) == 3 * (2 * 4 + 4)
        assert len(c.params()) == 3 * 2 * 4

    def test_single_qubit_no_ring(self):
        c = hardware_efficient_ansatz(1, 2)
        assert all(g.arity == 1 for g in c)


class TestNonTracedParamGateRejected:
    def test_registered_param_gate_raises(self):
        # regression: folding a non-traced parameterized gate desynchronized
        # the params vector and poisoned the structure-keyed cache
        from tpu_qsim import gates

        def myphase(theta):
            return np.diag([1.0, np.exp(1j * theta)])

        if "myphase_t" not in gates.GATE_NAMES:
            gates.register_gate("myphase_t", myphase, num_qubits=1)
        c = Circuit(2).add("myphase_t", 0, param=0.8).rx(0, 1.0)
        sim = StateVectorSimulator(2, CFG)
        with pytest.raises(ValueError, match="traced-parameter"):
            sim.run_parameterized(c)
        # plain run() still works with the custom gate
        sim.run(c)
        assert sim.total_probability() == pytest.approx(1.0, abs=1e-10)
