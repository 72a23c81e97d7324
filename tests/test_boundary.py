"""Boundary and lifecycle tests (analog of reference tests/test_boundary.cu):
extreme sizes, exception contracts, normalization under deep circuits, reset
semantics, simulator coexistence, and buffer hygiene."""

import numpy as np
import pytest

import jax

from tpu_qsim import (
    Circuit,
    SimConfig,
    StateVectorSimulator,
    ghz_circuit,
    random_circuit,
)

CFG = SimConfig(dtype="complex64", use_pallas=False)


class TestSizeLimits:
    def test_single_qubit_minimum(self):
        sim = StateVectorSimulator(1, CFG)
        sim.run(Circuit(1).h(0))
        assert sim.total_probability() == pytest.approx(1.0, abs=1e-6)

    def test_sixteen_qubits(self):
        sim = StateVectorSimulator(16, CFG)
        sim.run(ghz_circuit(16))
        p = sim.get_probabilities()
        assert p[0] == pytest.approx(0.5, abs=1e-5)
        assert p[-1] == pytest.approx(0.5, abs=1e-5)

    def test_twenty_qubit_allocation(self):
        sim = StateVectorSimulator(20, CFG)
        assert sim.dim == 1 << 20
        assert sim.total_probability() == pytest.approx(1.0, abs=1e-6)

    def test_invalid_qubit_counts(self):
        for bad in (0, -1, 100):
            with pytest.raises(ValueError):
                StateVectorSimulator(bad, CFG)


class TestExceptionContracts:
    def test_circuit_simulator_mismatch(self):
        sim = StateVectorSimulator(3, CFG)
        with pytest.raises(ValueError, match="qubits"):
            sim.run(Circuit(2).h(0))

    def test_invalid_measure_index(self):
        sim = StateVectorSimulator(2, CFG)
        with pytest.raises(ValueError):
            sim.measure_qubit(2)
        with pytest.raises(ValueError):
            sim.measure_qubit(-1)

    def test_invalid_basis_reset(self):
        sim = StateVectorSimulator(2, CFG)
        with pytest.raises(ValueError):
            sim.reset(4)

    def test_invalid_set_state_shape(self):
        sim = StateVectorSimulator(2, CFG)
        with pytest.raises(ValueError, match="shape"):
            sim.set_state(np.ones(3))

    def test_invalid_shots(self):
        sim = StateVectorSimulator(2, CFG)
        with pytest.raises(ValueError):
            sim.sample(0)


class TestNormalizationStability:
    def test_thousand_gates(self):
        # c64 planes through 1000 gates must hold normalization tightly
        # (analog of reference test_boundary.cu:197-212)
        sim = StateVectorSimulator(6, CFG)
        sim.run(random_circuit(6, 1000, seed=13))
        assert sim.total_probability() == pytest.approx(1.0, abs=1e-4)
        sim.assert_normalized(atol=1e-3)

    def test_deep_circuit_fidelity_c64(self):
        from tpu_qsim import CPUReferenceSimulator

        c = random_circuit(5, 1000, seed=17)
        sim = StateVectorSimulator(5, CFG)
        sim.run(c)
        ora = CPUReferenceSimulator(5)
        ora.run(c)
        assert np.max(np.abs(sim.get_state() - ora.get_state())) < 5e-4


class TestLifecycle:
    def test_reset_restores_ground_state(self):
        sim = StateVectorSimulator(3, CFG)
        sim.run(ghz_circuit(3))
        sim.reset()
        p = sim.get_probabilities()
        assert p[0] == pytest.approx(1.0, abs=1e-7)

    def test_run_accumulates(self):
        # run() must not reset (reference Simulator::run contract)
        sim = StateVectorSimulator(1, CFG)
        sim.run(Circuit(1).h(0))
        sim.run(Circuit(1).h(0))
        assert sim.get_probabilities()[0] == pytest.approx(1.0, abs=1e-6)

    def test_many_simulators_coexist(self):
        sims = [StateVectorSimulator(n, CFG) for n in (2, 4, 6, 8)] * 3
        for s in sims:
            s.run(ghz_circuit(s.num_qubits))
        for s in sims:
            assert s.total_probability() == pytest.approx(1.0, abs=1e-5)

    def test_no_buffer_leak_across_lifecycles(self):
        # the analog of the reference's valgrind gate: repeated construct/
        # run/destroy cycles must not accumulate live device buffers
        import gc

        def live_count():
            gc.collect()
            return len(jax.live_arrays())

        sim0 = StateVectorSimulator(8, CFG)
        sim0.run(ghz_circuit(8))
        del sim0
        before = live_count()
        for _ in range(10):
            s = StateVectorSimulator(8, CFG)
            s.run(ghz_circuit(8))
            s.sample(10)
            del s
        after = live_count()
        assert after <= before + 2  # allow jit-cache constants, not states


class TestCompileCache:
    def test_same_circuit_compiles_once(self):
        sim = StateVectorSimulator(4, CFG)
        c = ghz_circuit(4)
        fn1 = sim._compiled_run(c)
        fn2 = sim._compiled_run(c)
        assert fn1 is fn2

    def test_param_change_recompiles(self):
        sim = StateVectorSimulator(2, CFG)
        a = sim._compiled_run(Circuit(2).rz(0, 0.1))
        b = sim._compiled_run(Circuit(2).rz(0, 0.2))
        assert a is not b


class TestDeepCircuitPrecision:
    """f32-planes error grows ~sqrt(depth) (measured: 2e-8 at 100 gates to
    3e-7 at 4000, norm drift 10-40x larger than max-amp error — see
    docs/PERF_NOTES.md). The renorm_every knob removes the norm-drift
    component on the XLA path. Analog of the reference's 1000-gate
    normalization check (reference tests/test_boundary.cu:197-212), which
    had no mitigation to offer (complex128-only)."""

    def test_renorm_knob_bounds_norm_drift(self):
        import tpu_qsim as q
        from tpu_qsim.config import SimConfig
        from tpu_qsim.statevector import StateVectorSimulator

        c = q.random_circuit(10, 1500, seed=11)
        base = StateVectorSimulator(
            10, SimConfig(dtype="complex64", use_pallas=False)
        )
        base.run(c)
        drift0 = abs(float(base.total_probability()) - 1.0)

        ren = StateVectorSimulator(
            10,
            SimConfig(dtype="complex64", use_pallas=False, renorm_every=25),
        )
        ren.run(c)
        drift1 = abs(float(ren.total_probability()) - 1.0)
        # renormalization must hold the final norm at the one-reduction
        # rounding floor, at least as tight as unmitigated
        assert drift1 <= max(drift0, 5e-7)
        assert drift1 < 1e-6

        # and it must not disturb the physics: amplitudes still match the
        # complex128 oracle at the f32 depth-error class
        ora = q.CPUReferenceSimulator(10)
        ora.run(c)
        import numpy as np

        err = np.abs(np.asarray(ren.get_state()) - ora.get_state()).max()
        assert err < 2e-6
