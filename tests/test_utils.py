"""Utility-layer tests: endianness adapters, fidelity metrics, profiler
hook — plus the flagship physics cross-validation: the ensemble average of
vmapped Monte-Carlo trajectories must converge to the exact density-matrix
evolution (the two noise stacks validate each other)."""

import os

import numpy as np
import pytest

from tpu_qsim import Circuit, SimConfig, StateVectorSimulator, bell_circuit
from tpu_qsim.utils import (
    bit_reversal_permutation,
    max_amplitude_error,
    state_fidelity,
    to_big_endian,
)

CFG = SimConfig(dtype="complex128", use_pallas=False)


class TestEndiannessAdapter:
    def test_bit_reversal_involution(self):
        perm = bit_reversal_permutation(5)
        assert np.array_equal(perm[perm], np.arange(32))

    def test_known_values(self):
        perm = bit_reversal_permutation(3)
        # 0b001 -> 0b100, 0b011 -> 0b110
        assert perm[1] == 4
        assert perm[3] == 6
        assert perm[7] == 7

    def test_x0_maps_to_big_endian_msb(self):
        # our x(0) excites index 1; in Cirq's ordering (qubit 0 = MSB) the
        # excited index is 2^(n-1)
        sim = StateVectorSimulator(3, CFG)
        sim.run(Circuit(3).x(0))
        big = to_big_endian(sim.get_state(), 3)
        assert big[4] == 1.0


class TestFidelityMetrics:
    def test_identical_states(self, rng):
        from conftest import random_state

        psi = random_state(4, rng)
        assert state_fidelity(psi, psi) == pytest.approx(1.0)
        assert max_amplitude_error(psi, psi) == pytest.approx(0.0, abs=1e-15)

    def test_orthogonal_states(self):
        a = np.array([1, 0, 0, 0], dtype=complex)
        b = np.array([0, 1, 0, 0], dtype=complex)
        assert state_fidelity(a, b) == pytest.approx(0.0)

    def test_global_phase_ignored(self, rng):
        from conftest import random_state

        psi = random_state(3, rng)
        rotated = psi * np.exp(0.77j)
        assert state_fidelity(psi, rotated) == pytest.approx(1.0)
        assert max_amplitude_error(rotated, psi) == pytest.approx(0.0, abs=1e-12)


class TestProfilerHook:
    def test_trace_writes_artifacts(self, tmp_path):
        import jax.numpy as jnp

        from tpu_qsim.utils import profiler_trace

        logdir = str(tmp_path / "trace")
        with profiler_trace(logdir):
            jnp.sum(jnp.ones(128)).block_until_ready()
        # a plugins/profile dir with at least one artifact must exist
        found = any("profile" in root for root, _, files in os.walk(logdir)
                    if files)
        assert found


class TestMCWFMatchesDensityMatrix:
    """Ensemble average of the trajectory unraveling == exact Kraus
    evolution. This cross-validates noisy.py against density.py with no
    shared code path — the strongest correctness statement the noise stack
    can make. (Noise semantics are aligned by registering channels on the
    same qubits every gate touches.)"""

    @pytest.mark.parametrize(
        "add_channel,p",
        [
            ("add_bit_flip", 0.15),
            ("add_phase_flip", 0.2),
            ("add_depolarizing", 0.2),
            ("add_amplitude_damping", 0.25),
            ("add_phase_damping", 0.3),
        ],
    )
    def test_single_qubit_channel(self, add_channel, p):
        from tpu_qsim.density import DensityMatrixSimulator
        from tpu_qsim.noise import NoiseModel
        from tpu_qsim.noisy import BatchedSimulator

        nm = getattr(NoiseModel(), add_channel)(p, 0)
        circuit = Circuit(1).h(0).t(0).h(0)  # every gate acts on qubit 0

        dm = DensityMatrixSimulator(1, nm, CFG)
        dm.run(circuit)
        exact = np.asarray(dm.probabilities())

        bs = BatchedSimulator(1, 6000, nm, CFG, seed=0)
        bs.run(circuit)
        mcwf = np.asarray(bs.average_probabilities())

        np.testing.assert_allclose(mcwf, exact, atol=0.03)

    def test_two_qubit_circuit(self):
        from tpu_qsim.density import DensityMatrixSimulator
        from tpu_qsim.noise import NoiseModel
        from tpu_qsim.noisy import BatchedSimulator

        # every gate touches both qubits -> both stacks fire the global
        # channel on both qubits after every gate
        nm = NoiseModel().add_depolarizing(0.08)
        circuit = Circuit(2).swap(0, 1).cnot(0, 1).cz(1, 0)

        dm = DensityMatrixSimulator(2, nm, CFG)
        dm.set_state(np.array([0.5, 0.5, 0.5, 0.5]))
        dm.run(circuit)
        exact = np.asarray(dm.probabilities())

        bs = BatchedSimulator(2, 8000, nm, CFG, seed=3)
        bs.set_state(np.array([0.5, 0.5, 0.5, 0.5]))
        bs.run(circuit)
        mcwf = np.asarray(bs.average_probabilities())

        np.testing.assert_allclose(mcwf, exact, atol=0.03)

    def test_non_coinciding_regime_policy_all(self):
        # THE regime where the reference's two conventions disagree: a
        # channel on a qubit the gates never touch. Under a unified
        # insertion="all" policy on BOTH backends the ensemble average must
        # still match the exact Kraus evolution.
        from tpu_qsim.density import DensityMatrixSimulator
        from tpu_qsim.noise import NoiseModel
        from tpu_qsim.noisy import BatchedSimulator

        nm = NoiseModel().add_amplitude_damping(0.2, 2)
        circuit = Circuit(3).h(0).cnot(0, 1).t(1)   # never touches qubit 2

        dm = DensityMatrixSimulator(3, nm, CFG, insertion="all")
        dm.set_state(np.full(8, 1 / np.sqrt(8)))
        dm.run(circuit)
        exact = np.asarray(dm.probabilities())

        bs = BatchedSimulator(3, 6000, nm, CFG, seed=5, insertion="all")
        bs.set_state(np.full(8, 1 / np.sqrt(8)))
        bs.run(circuit)
        mcwf = np.asarray(bs.average_probabilities())

        np.testing.assert_allclose(mcwf, exact, atol=0.03)
        # and the channel genuinely fired: qubit-2-excited mass decayed
        p2 = exact.reshape(2, 4).sum(axis=1)[1]
        assert p2 < 0.5 - 0.05

    def test_non_coinciding_regime_policy_gate_qubits(self):
        # Same circuit under the unified "gate_qubits" policy: the off-gate
        # channel must NOT fire on either backend, and both must agree with
        # the ideal evolution.
        from tpu_qsim.density import DensityMatrixSimulator
        from tpu_qsim.noise import NoiseModel
        from tpu_qsim.noisy import NoisySimulator
        from tpu_qsim.statevector import StateVectorSimulator

        nm = NoiseModel().add_bit_flip(0.4, 2)
        circuit = Circuit(3).h(0).cnot(0, 1).t(1)

        ideal = StateVectorSimulator(3, CFG)
        ideal.run(circuit)
        expected = np.asarray(ideal.get_probabilities())

        dm = DensityMatrixSimulator(3, nm, CFG)   # default gate_qubits
        dm.run(circuit)
        np.testing.assert_allclose(
            np.asarray(dm.probabilities()), expected, atol=1e-5
        )

        ns = NoisySimulator(3, nm, CFG, seed=1, insertion="gate_qubits")
        ns.run(circuit)
        np.testing.assert_allclose(
            np.asarray(ns.get_probabilities()), expected, atol=1e-5
        )

    def test_insertion_validation(self):
        from tpu_qsim.density import DensityMatrixSimulator
        from tpu_qsim.noisy import NoisySimulator, build_trajectory_step

        with pytest.raises(ValueError, match="insertion"):
            DensityMatrixSimulator(2, insertion="bogus")
        with pytest.raises(ValueError, match="insertion"):
            build_trajectory_step(Circuit(1).h(0), None, np.float32, "bogus")


class TestViewAmpSummary:
    """view_amp_summary must match flat-form readback on every view shape
    the grid engine produces (bench.py's 29-30q rows and the 30q on-chip
    certification depend on this equivalence — at those sizes the flat
    reshape itself is an OOM, so this small-shape proof is the only
    cross-check)."""

    def _flat_check(self, y, ends):
        import jax.numpy as jnp

        from tpu_qsim.utils import view_amp_summary

        flat = np.asarray(y).reshape(2, -1)
        got = [float(v) for v in view_amp_summary(jnp.asarray(y), ends=ends)]
        want = [flat[0, 0], flat[1, 0]]
        drop = [0]
        if ends == 2:
            want += [flat[0, -1], flat[1, -1]]
            drop.append(flat.shape[1] - 1)
        rest = np.abs(np.delete(flat, drop, axis=1)).max()
        want.append(rest)
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-7)

    @pytest.mark.parametrize("ends", [1, 2])
    @pytest.mark.parametrize(
        "shape",
        [
            (2, 4, 8),                       # minimal view: (plane, RB, lanes)
            (2, 2, 2, 4, 8),                 # two high-bit axes
            (2, 2, 2, 2, 2, 2, 4, 8),        # deep 30q-like axis chain
        ],
    )
    def test_matches_flat_readback(self, ends, shape):
        rng = np.random.default_rng(7)
        y = rng.normal(size=shape).astype(np.float32)
        self._flat_check(y, ends)

    def test_corner_amplitudes_not_masked(self):
        """ends=2 must exclude ONLY flat 0 and flat N-1 from ``rest`` — a
        mixed corner coordinate (max on one axis, zero on another) is a
        regular amplitude and must still be visible."""
        import jax.numpy as jnp

        from tpu_qsim.utils import view_amp_summary

        y = np.zeros((2, 2, 4, 8), np.float32)
        y[0, 1, 0, 0] = 0.5          # mixed corner: high axis max, rest zero
        *_, rest = view_amp_summary(jnp.asarray(y), ends=2)
        assert float(rest) == pytest.approx(0.5)

    def test_jit_and_shapes_match_grid_program(self):
        """The summary works under jit on an actual GridSweepProgram vshape."""
        import jax
        import jax.numpy as jnp

        from tpu_qsim.utils import view_amp_summary

        # 20q vshape under the default geometry (no TPU needed: pure jnp)
        from tpu_qsim.kernels.gridsweeps import default_geometry

        params, _cap = default_geometry(20)
        hb = 20 - (params.rb_bits + 7)
        vshape = (2,) + (2,) * hb + (1 << params.rb_bits, 128)
        y = jnp.zeros(vshape, jnp.float32).at[(0,) + (0,) * (len(vshape) - 1)].set(1.0)
        a0r, a0i, rest = jax.jit(view_amp_summary)(y)
        assert float(a0r) == 1.0 and float(a0i) == 0.0 and float(rest) == 0.0
