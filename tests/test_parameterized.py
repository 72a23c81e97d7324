"""Parameterized execution + extended circuit library tests (QFT, ansatz,
cp gate) — capabilities beyond the reference's surface."""

import numpy as np
import pytest

import tpu_qsim as q

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


class TestDifferentiableExpectation:
    """build_expectation_fn: pure params -> <H> with reverse-mode
    gradients through the whole circuit (capability the reference could
    not express: no parameter abstraction, reference
    include/Circuit.hpp:64-84, and observables limited to
    probabilities)."""

    def test_value_matches_stateful_path(self):
        import jax.numpy as jnp

        c = Circuit(3)
        c.ry(0, 0.4).ry(1, -0.9).cnot(0, 1).rz(2, 0.5).cnot(1, 2).rx(2, 1.3)
        f = q.build_expectation_fn(c, "ZXZ")
        got = float(f(jnp.asarray(c.params())))
        sim = q.StateVectorSimulator(3)
        sim.run(c)
        assert abs(got - sim.expectation_pauli("ZXZ")) < 1e-6

    def test_grad_is_analytic_for_single_rotation(self):
        import jax
        import jax.numpy as jnp

        c = Circuit(1)
        c.ry(0, 0.0)
        f = q.build_expectation_fn(c, "Z")       # <Z> = cos(theta)
        for theta in (0.0, 0.3, 1.2, -2.1):
            v, g = jax.value_and_grad(f)(jnp.asarray([theta]))
            assert abs(float(v) - np.cos(theta)) < 1e-6
            assert abs(float(g[0]) + np.sin(theta)) < 1e-6

    def test_grad_matches_finite_differences(self):
        import jax
        import jax.numpy as jnp

        c = Circuit(3)
        c.ry(0, 0.0).ry(1, 0.0).ry(2, 0.0).cnot(0, 1).cnot(1, 2)
        c.rz(1, 0.0).rx(2, 0.0)
        f = q.build_expectation_fn(c, "XZY")
        params = jnp.asarray([0.4, -0.9, 0.7, 0.2, 1.3])
        g = np.asarray(jax.grad(f)(params))
        eps = 1e-3
        for i in range(len(params)):
            e = jnp.zeros_like(params).at[i].set(eps)
            fd = (float(f(params + e)) - float(f(params - e))) / (2 * eps)
            assert abs(g[i] - fd) < 5e-4

    def test_pauli_sum_observable(self):
        import jax.numpy as jnp

        c = Circuit(2)
        c.ry(0, 0.7).cnot(0, 1).rz(1, -0.3)
        params = jnp.asarray(c.params())
        h = [(0.5, "II"), (1.25, "ZZ"), (-2.0, "XI")]
        f = q.build_expectation_fn(c, h)
        parts = [
            q.build_expectation_fn(c, p)(params) for _, p in h
        ]
        want = sum(co * float(v) for (co, _), v in zip(h, parts))
        assert abs(float(f(params)) - want) < 1e-6

    def test_vmap_batches_parameter_sweeps(self):
        import jax
        import jax.numpy as jnp

        c = Circuit(1)
        c.ry(0, 0.0)
        f = q.build_expectation_fn(c, "Z")
        thetas = jnp.asarray([[0.1], [0.9], [2.2]])
        batch = np.asarray(jax.vmap(f)(thetas))
        np.testing.assert_allclose(
            batch, np.cos([0.1, 0.9, 2.2]), atol=1e-6
        )

    def test_invalid_pauli_raises(self):
        c = Circuit(2)
        c.ry(0, 0.1)
        with pytest.raises(ValueError, match="invalid Pauli"):
            q.build_expectation_fn(c, "ZQ")
        with pytest.raises(ValueError, match="invalid Pauli"):
            q.build_expectation_fn(c, "ZZZ")   # longer than the register


class TestQAOAGradientDescent:
    EDGES = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]

    def test_objective_matches_stateful_expectation(self):
        import jax.numpy as jnp

        from tpu_qsim.algorithms import (
            maxcut_expectation,
            qaoa_maxcut_circuit,
            qaoa_maxcut_objective,
        )

        obj = qaoa_maxcut_objective(self.EDGES, 4, depth=1)
        got = float(obj(jnp.asarray([0.37]), jnp.asarray([-0.44])))
        sim = q.StateVectorSimulator(4)
        sim.run(qaoa_maxcut_circuit(self.EDGES, 4, [0.37], [-0.44]))
        assert abs(got - maxcut_expectation(sim, self.EDGES)) < 1e-6

    def test_gradient_ascent_improves_the_cut(self):
        import jax
        import jax.numpy as jnp

        from tpu_qsim.algorithms import qaoa_maxcut_objective

        obj = qaoa_maxcut_objective(self.EDGES, 4, depth=1)
        loss = lambda p: -obj(p[:1], p[1:])     # noqa: E731
        p = jnp.asarray([0.2, 0.2])
        start = -float(loss(p))
        step = jax.jit(jax.grad(loss))
        for _ in range(60):
            p = p - 0.1 * step(p)
        end = -float(loss(p))
        assert end > start + 0.2                # a real improvement
        assert end > 3.0                        # near the p=1 optimum
