"""Noise-stack tests (analog of reference tests/test_noise.cu): registration,
deterministic corners (p=0, p=1), physics/statistics with fixed keys, batched
invariants, seed reproducibility — plus Kraus completeness checks the
reference never had."""

import numpy as np
import pytest

import jax

from tpu_qsim import Circuit, SimConfig, bell_circuit, ghz_circuit
from tpu_qsim.noise import (
    NoiseChannel,
    NoiseModel,
    NoiseType,
    kraus_operators,
    unitary_mix,
)
from tpu_qsim.noisy import BatchedSimulator, NoisySimulator

CFG = SimConfig(dtype="complex128", use_pallas=False)


class TestKrausAlgebra:
    @pytest.mark.parametrize("ntype", list(NoiseType))
    @pytest.mark.parametrize("p", [0.0, 0.1, 0.5, 1.0])
    def test_completeness(self, ntype, p):
        # sum_k K^dag K = I for every channel at every probability
        ks = kraus_operators(ntype, p)
        total = sum(k.conj().T @ k for k in ks)
        np.testing.assert_allclose(total, np.eye(2), atol=1e-12)

    @pytest.mark.parametrize(
        "ntype",
        [NoiseType.DEPOLARIZING, NoiseType.BIT_FLIP, NoiseType.PHASE_FLIP,
         NoiseType.BIT_PHASE_FLIP],
    )
    def test_unitary_mix_consistency(self, ntype):
        probs, us = unitary_mix(ntype, 0.3)
        assert probs.sum() == pytest.approx(1.0)
        for u in us:
            np.testing.assert_allclose(u.conj().T @ u, np.eye(2), atol=1e-12)


class TestNoiseModel:
    def test_registration_and_queries(self):
        nm = (NoiseModel()
              .add_depolarizing(0.01, 0)
              .add_bit_flip(0.02, [1, 2])
              .add_amplitude_damping(0.005))
        assert len(nm) == 3
        assert nm.has_noise()
        types = [c.type for c in nm.channels]
        assert types == [NoiseType.DEPOLARIZING, NoiseType.BIT_FLIP,
                         NoiseType.AMPLITUDE_DAMPING]

    def test_global_channel_applies_everywhere(self):
        # Fixes reference quirk #2: global channels were dead in the
        # reference's NoisySimulator.
        nm = NoiseModel().add_phase_damping(0.1)
        for q in range(5):
            assert nm.channels[0].applies_to(q)
        apps = nm.applications_per_gate(3)
        assert [(a[1]) for a in apps] == [0, 1, 2]

    def test_invalid_probability(self):
        with pytest.raises(ValueError):
            NoiseModel().add_bit_flip(1.5)
        with pytest.raises(ValueError):
            NoiseModel().add_depolarizing(-0.1)

    def test_signature(self):
        a = NoiseModel().add_bit_flip(0.1, 0)
        b = NoiseModel().add_bit_flip(0.1, 0)
        c = NoiseModel().add_bit_flip(0.2, 0)
        assert a.signature() == b.signature() != c.signature()


class TestNoisySimulator:
    def test_no_noise_matches_ideal(self):
        sim = NoisySimulator(3, NoiseModel(), CFG)
        sim.run(ghz_circuit(3))
        p = sim.get_probabilities()
        assert p[0] == pytest.approx(0.5, abs=1e-10)
        assert p[7] == pytest.approx(0.5, abs=1e-10)

    def test_zero_probability_matches_ideal(self):
        nm = NoiseModel().add_depolarizing(0.0).add_bit_flip(0.0)
        sim = NoisySimulator(2, nm, CFG)
        sim.run(bell_circuit())
        p = sim.get_probabilities()
        np.testing.assert_allclose(p, [0.5, 0, 0, 0.5], atol=1e-10)

    def test_certain_bit_flip(self):
        # p=1 bit flip after each gate: x(0) then certain flip -> back to |00>
        nm = NoiseModel().add_bit_flip(1.0, 0)
        sim = NoisySimulator(2, nm, CFG)
        sim.run(Circuit(2).x(0))
        np.testing.assert_allclose(sim.get_probabilities(), [1, 0, 0, 0],
                                   atol=1e-10)

    def test_certain_amplitude_damping(self):
        # x(0) prepares |1>, gamma=1 damping must land in |0>
        nm = NoiseModel().add_amplitude_damping(1.0, 0)
        sim = NoisySimulator(1, nm, CFG)
        sim.run(Circuit(1).x(0))
        np.testing.assert_allclose(sim.get_probabilities(), [1, 0], atol=1e-10)

    def test_phase_flip_preserves_populations(self):
        nm = NoiseModel().add_phase_flip(0.5)
        sim = NoisySimulator(2, nm, CFG, seed=5)
        sim.run(Circuit(2).h(0).h(1))
        np.testing.assert_allclose(sim.get_probabilities(),
                                   [0.25] * 4, atol=1e-10)

    def test_norm_preserved_under_noise(self):
        nm = (NoiseModel().add_depolarizing(0.05)
              .add_amplitude_damping(0.03).add_phase_damping(0.02))
        sim = NoisySimulator(3, nm, CFG, seed=11)
        from tpu_qsim import random_circuit
        sim.run(random_circuit(3, 40, seed=2))
        assert sim.total_probability() == pytest.approx(1.0, abs=1e-9)

    def test_seed_reproducibility(self):
        nm = NoiseModel().add_depolarizing(0.3)
        a = NoisySimulator(3, nm, CFG, seed=123).run(ghz_circuit(3))
        b = NoisySimulator(3, nm, CFG, seed=123).run(ghz_circuit(3))
        c = NoisySimulator(3, nm, CFG, seed=124).run(ghz_circuit(3))
        np.testing.assert_array_equal(a.get_state(), b.get_state())
        # different seed gives a different trajectory (overwhelmingly likely)
        assert not np.allclose(a.get_state(), c.get_state())

    def test_explicit_key_overrides_chain(self):
        nm = NoiseModel().add_depolarizing(0.3)
        k = jax.random.PRNGKey(9)
        a = NoisySimulator(3, nm, CFG, seed=1).run(ghz_circuit(3), key=k)
        b = NoisySimulator(3, nm, CFG, seed=2).run(ghz_circuit(3), key=k)
        np.testing.assert_array_equal(a.get_state(), b.get_state())

    def test_reset(self):
        nm = NoiseModel().add_bit_flip(0.5)
        sim = NoisySimulator(2, nm, CFG, seed=3)
        sim.run(bell_circuit())
        sim.reset()
        np.testing.assert_allclose(sim.get_probabilities(), [1, 0, 0, 0],
                                   atol=1e-12)


class TestTrajectoryStatistics:
    """Physics-level checks over many vmapped trajectories."""

    def test_bit_flip_rate(self):
        # |0> -(i gate + bit flip p)-> flipped fraction ~ p
        p = 0.25
        nm = NoiseModel().add_bit_flip(p, 0)
        sim = BatchedSimulator(1, 2000, nm, CFG, seed=0)
        sim.run(Circuit(1).i(0))
        avg = sim.average_probabilities()
        assert avg[1] == pytest.approx(p, abs=0.04)

    def test_amplitude_damping_decay(self):
        # |1> with gamma: P(0) ~ gamma
        gamma = 0.3
        nm = NoiseModel().add_amplitude_damping(gamma, 0)
        sim = BatchedSimulator(1, 2000, nm, CFG, seed=1)
        sim.run(Circuit(1).x(0))
        avg = sim.average_probabilities()
        assert avg[0] == pytest.approx(gamma, abs=0.05)

    def test_depolarizing_shrinks_coherence(self):
        # |+> under depolarizing: average X expectation shrinks
        p = 0.5
        nm = NoiseModel().add_depolarizing(p, 0)
        sim = BatchedSimulator(1, 3000, nm, CFG, seed=2)
        sim.run(Circuit(1).h(0))
        # <X> per trajectory = 2*Re(a0* a1); ensemble average ~ (1-4p/3+...)
        states = sim.get_state()
        x_exp = float(np.mean(2 * np.real(states[:, 0].conj() * states[:, 1])))
        expected = 1.0 - 4.0 * p / 3.0  # Pauli-twirl factor for depolarizing
        assert x_exp == pytest.approx(expected, abs=0.06)


class TestBatchedSimulator:
    def test_initialization(self):
        sim = BatchedSimulator(3, 10, NoiseModel(), CFG)
        probs = sim.trajectory_probabilities()
        assert probs.shape == (10, 8)
        np.testing.assert_allclose(np.asarray(probs)[:, 0], 1.0, atol=1e-12)

    def test_ideal_batch_matches_single(self):
        sim = BatchedSimulator(3, 7, NoiseModel(), CFG)
        sim.run(ghz_circuit(3))
        avg = sim.average_probabilities()
        np.testing.assert_allclose(avg[[0, 7]], [0.5, 0.5], atol=1e-10)
        assert sim.total_probability() == pytest.approx(1.0, abs=1e-9)

    def test_full_gate_set_batched(self):
        # Fixes reference quirk #4: batched path covered only X/Y/Z/H + CNOT.
        c = (Circuit(3).h(0).t(1).toffoli(0, 1, 2).swap(1, 2)
             .cry(0, 2, 0.7).rz(1, 0.3).sdg(2).crz(2, 0, 1.1))
        sim = BatchedSimulator(3, 5, NoiseModel().add_depolarizing(0.01), CFG,
                               seed=4)
        sim.run(c)
        assert sim.total_probability() == pytest.approx(1.0, abs=1e-9)

    def test_histogram_total(self):
        sim = BatchedSimulator(2, 8, NoiseModel().add_bit_flip(0.2), CFG, seed=5)
        sim.run(bell_circuit())
        h = sim.histogram(125)
        assert sum(h.values()) == 8 * 125

    def test_sample_shape_and_range(self):
        sim = BatchedSimulator(2, 4, None, CFG)
        sim.run(bell_circuit())
        s = np.asarray(sim.sample(50))
        assert s.shape == (4, 50)
        assert set(np.unique(s)) <= {0, 3}

    def test_memory_accounting(self):
        sim = BatchedSimulator(4, 100, None, SimConfig(dtype="complex64"))
        # 100 trajectories x 2 planes x 16 amps x 4 bytes
        assert sim.total_memory_bytes == 100 * 2 * 16 * 4

    def test_seed_reproducibility(self):
        nm = NoiseModel().add_depolarizing(0.2)
        a = BatchedSimulator(2, 6, nm, CFG, seed=42).run(bell_circuit())
        b = BatchedSimulator(2, 6, nm, CFG, seed=42).run(bell_circuit())
        np.testing.assert_array_equal(a.get_state(), b.get_state())

    def test_trajectories_differ(self):
        nm = NoiseModel().add_depolarizing(0.5)
        sim = BatchedSimulator(2, 16, nm, CFG, seed=1).run(bell_circuit())
        states = sim.get_state()
        # with p=0.5 the 16 trajectories cannot all be identical
        assert not all(np.allclose(states[0], s) for s in states[1:])

    def test_invalid_batch_size(self):
        with pytest.raises(ValueError):
            BatchedSimulator(2, 0, None, CFG)

    def test_measure_qubit_bell_correlation(self):
        # per-trajectory collapse: measuring both qubits of a Bell state
        # must give perfectly correlated (batch,) outcome vectors with both
        # values represented at batch=64
        from tpu_qsim import bell_circuit

        sim = BatchedSimulator(2, 64, None, CFG, seed=11)
        sim.run(bell_circuit())
        a = sim.measure_qubit(0)
        b = sim.measure_qubit(1)
        assert a.shape == (64,) and b.shape == (64,)
        assert np.array_equal(a, b)
        assert set(np.unique(a)) == {0, 1}
        # post-collapse states are basis states: total prob stays 1
        assert sim.total_probability() == pytest.approx(1.0, abs=1e-5)

    def test_measure_qubit_deterministic_on_basis(self):
        sim = BatchedSimulator(3, 8, None, CFG, seed=2)
        sim.run(Circuit(3).x(1))
        assert np.array_equal(sim.measure_qubit(1), np.ones(8, dtype=np.int32))
        assert np.array_equal(sim.measure_qubit(0), np.zeros(8, dtype=np.int32))


class TestBatchedStateSurface:
    """Regression tests: BatchedSimulator must not fall through to the
    single-state BaseSimulator methods (which read an unused buffer)."""

    def test_expectation_reflects_trajectories(self):
        from tpu_qsim import Circuit

        bs = BatchedSimulator(1, 500, NoiseModel().add_bit_flip(0.3, 0), CFG,
                              seed=2)
        bs.run(Circuit(1).i(0))
        # <Z> = P(0) - P(1) ~ 0.7 - 0.3 = 0.4 (NOT the +1.0 of the unused
        # initial buffer)
        assert bs.expectation_pauli("Z") == pytest.approx(0.4, abs=0.08)

    def test_set_state_broadcasts(self):
        bs = BatchedSimulator(2, 5, None, CFG)
        psi = np.array([0, 1, 0, 0], dtype=complex)
        bs.set_state(psi)
        states = bs.get_state()
        assert states.shape == (5, 4)
        np.testing.assert_allclose(states, np.tile(psi, (5, 1)), atol=1e-12)

    def test_checkpoint_roundtrip(self, tmp_path):
        path = str(tmp_path / "batch.npz")
        nm = NoiseModel().add_depolarizing(0.2)
        a = BatchedSimulator(2, 6, nm, CFG, seed=9)
        a.run(bell_circuit())
        a.save_state(path)
        b = BatchedSimulator(2, 6, nm, CFG)
        b.load_state(path)
        np.testing.assert_allclose(a.get_state(), b.get_state(), atol=1e-15)

    def test_checkpoint_batch_mismatch(self, tmp_path):
        path = str(tmp_path / "batch.npz")
        BatchedSimulator(2, 6, None, CFG).save_state(path)
        with pytest.raises(ValueError, match="batch"):
            BatchedSimulator(2, 7, None, CFG).load_state(path)

    def test_memory_bytes_matches_batch(self):
        bs = BatchedSimulator(3, 10, None, SimConfig(dtype="complex64"))
        assert bs.memory_bytes == bs.total_memory_bytes == 10 * 2 * 8 * 4


class TestGlobalScanLayer:
    """Round-4 VERDICT item 8: global channels apply as one scan layer per
    gate (O(1) traced subgraphs) with the same physics as the unrolled
    per-qubit path."""

    def test_p1_global_bit_flip_flips_every_qubit(self):
        n = 8  # == GLOBAL_SCAN_MIN: the scan path
        nm = NoiseModel().add_bit_flip(1.0)
        sim = NoisySimulator(n, nm, CFG, seed=3)
        sim.run(Circuit(n).i(0))  # one gate -> one global layer
        probs = sim.get_probabilities()
        # i(0) then certain flips on all 8 qubits: |0...0> -> |1...1>
        assert probs[(1 << n) - 1] == pytest.approx(1.0, abs=1e-9)

    def test_p1_global_amplitude_damping_decays_all(self):
        n = 8
        nm = NoiseModel().add_amplitude_damping(1.0)
        sim = NoisySimulator(n, nm, CFG, seed=5)
        sim.set_state(np.eye(1, 1 << n, (1 << n) - 1).ravel())  # |1...1>
        sim.run(Circuit(n).i(0))
        probs = sim.get_probabilities()
        assert probs[0] == pytest.approx(1.0, abs=1e-9)

    @pytest.mark.parametrize("add", ["add_depolarizing", "add_phase_damping"])
    def test_scan_matches_unrolled_ensemble(self, add, monkeypatch):
        """Same channel via the scan layer and the unrolled path: the
        trajectory-ensemble average probabilities must agree (streams
        differ, physics must not)."""
        import tpu_qsim.noisy as noisy_mod

        n, batch = 8, 384
        circuit = Circuit(n).h(0).cnot(0, 1).h(2).cnot(2, 3)
        nm = getattr(NoiseModel(), add)(0.25)

        scan_sim = BatchedSimulator(n, batch, nm, CFG, seed=7)
        scan_sim.run(circuit)
        p_scan = scan_sim.average_probabilities()

        monkeypatch.setattr(noisy_mod, "GLOBAL_SCAN_MIN", 10_000)
        unroll_sim = BatchedSimulator(n, batch, nm, CFG, seed=7)
        unroll_sim.run(circuit)
        p_unroll = unroll_sim.average_probabilities()

        # marginal per-qubit probabilities are the statistically stable
        # comparison at this batch size
        def marginals(p):
            return [
                p[((np.arange(1 << n) >> q) & 1).astype(bool)].sum()
                for q in range(n)
            ]

        np.testing.assert_allclose(
            marginals(p_scan), marginals(p_unroll), atol=0.08
        )

    def test_scan_layer_shrinks_trace(self):
        """A 16q circuit with one global channel must trace ~n x fewer
        equations through the scan layer than unrolled."""
        import tpu_qsim.noisy as noisy_mod
        from tpu_qsim import random_circuit
        from tpu_qsim.noisy import build_trajectory_step

        n, gates = 16, 30
        circuit = random_circuit(n, gates, seed=1)
        nm = NoiseModel().add_depolarizing(0.01)

        step, _ = build_trajectory_step(circuit, nm, np.dtype(np.float32))
        key = jax.random.PRNGKey(0)
        import tpu_qsim.apply as ap

        x = ap.initial_state(n, np.float32)
        scan_eqns = len(jax.make_jaxpr(step)(x, key).eqns)

        old = noisy_mod.GLOBAL_SCAN_MIN
        try:
            noisy_mod.GLOBAL_SCAN_MIN = 10_000
            step_u, _ = build_trajectory_step(
                circuit, nm, np.dtype(np.float32)
            )
        finally:
            noisy_mod.GLOBAL_SCAN_MIN = old
        unroll_eqns = len(jax.make_jaxpr(step_u)(x, key).eqns)
        assert scan_eqns * 4 < unroll_eqns, (scan_eqns, unroll_eqns)

    def test_insertion_gate_qubits_keeps_unrolled_path(self):
        """The scan layer is 'all'-insertion only; gate_qubits must still
        filter per gate (and stay correct)."""
        n = 8
        nm = NoiseModel().add_bit_flip(1.0)
        sim = NoisySimulator(n, nm, CFG, seed=3, insertion="gate_qubits")
        sim.run(Circuit(n).i(0))
        probs = sim.get_probabilities()
        # only qubit 0 (the gate's qubit) flips
        assert probs[1] == pytest.approx(1.0, abs=1e-9)
