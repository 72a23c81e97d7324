"""Reduced density matrices, entanglement entropy, and state fidelity on
the pure-state simulators — observables the reference lacked entirely (its
only observable was the probability vector).

Convention under test: reduced index bit j = ``qubits[j]`` (the library's
qubit-q = bit-q rule), checked against an independent NumPy partial trace
built straight from the definition.
"""

import numpy as np
import pytest

import tpu_qsim as q
from tpu_qsim import SimConfig, StateVectorSimulator

CFG = SimConfig(dtype="complex128", use_pallas=False)


def numpy_partial_trace(amps: np.ndarray, qubits, n: int) -> np.ndarray:
    """Independent oracle: rho[i, j] = sum_rest psi(i,rest) psi*(j,rest)
    with kept-qubit assignment i spelled bit j = qubits[j]."""
    k = len(qubits)
    rho = np.zeros((1 << k, 1 << k), dtype=complex)
    rest_qubits = [b for b in range(n) if b not in qubits]
    for i in range(1 << k):
        for j in range(1 << k):
            acc = 0.0 + 0.0j
            for r in range(1 << len(rest_qubits)):
                ia = ja = 0
                for t, qq in enumerate(qubits):
                    ia |= ((i >> t) & 1) << qq
                    ja |= ((j >> t) & 1) << qq
                for t, qq in enumerate(rest_qubits):
                    bit = (r >> t) & 1
                    ia |= bit << qq
                    ja |= bit << qq
                acc += amps[ia] * np.conj(amps[ja])
            rho[i, j] = acc
    return rho


class TestReducedDensityMatrix:
    def test_bell_single_qubit_maximally_mixed(self):
        sim = StateVectorSimulator(2, CFG)
        sim.run(q.bell_circuit())
        for qq in (0, 1):
            rho = sim.reduced_density_matrix([qq])
            assert np.abs(rho - np.eye(2) / 2).max() < 1e-12

    def test_bell_full_subset_is_pure(self):
        sim = StateVectorSimulator(2, CFG)
        sim.run(q.bell_circuit())
        rho = sim.reduced_density_matrix([0, 1])
        s2 = 1 / np.sqrt(2)
        psi = np.array([s2, 0, 0, s2])
        assert np.abs(rho - np.outer(psi, psi.conj())).max() < 1e-12
        assert abs(np.trace(rho @ rho).real - 1.0) < 1e-12

    def test_product_state_pure_marginal(self):
        sim = StateVectorSimulator(3, CFG)
        sim.run(q.Circuit(3).h(0).x(2))
        rho = sim.reduced_density_matrix([0])
        plus = np.array([1, 1]) / np.sqrt(2)
        assert np.abs(rho - np.outer(plus, plus)).max() < 1e-12

    @pytest.mark.parametrize("subset", [(0,), (3,), (1, 4), (5, 2), (0, 3, 6)])
    def test_random_circuit_vs_numpy_trace(self, subset):
        n = 7
        c = q.random_circuit(n, 60, seed=17)
        sim = StateVectorSimulator(n, CFG)
        sim.run(c)
        amps = sim.get_state()
        rho = sim.reduced_density_matrix(list(subset))
        ref = numpy_partial_trace(amps, list(subset), n)
        assert np.abs(rho - ref).max() < 1e-10
        # every reduced state: trace 1, Hermitian, PSD
        assert abs(np.trace(rho).real - 1.0) < 1e-10
        assert np.abs(rho - rho.conj().T).max() < 1e-12
        assert np.linalg.eigvalsh(rho).min() > -1e-10

    def test_f32_engine_close_to_oracle(self):
        n = 10
        c = q.random_circuit(n, 80, seed=3)
        sim = StateVectorSimulator(n)          # default complex64 planes
        sim.run(c)
        ora = q.CPUReferenceSimulator(n)
        ora.run(c)
        rho = sim.reduced_density_matrix([2, 7])
        ref = numpy_partial_trace(ora.state, [2, 7], n)
        assert np.abs(rho - ref).max() < 1e-5

    def test_invalid_subsets(self):
        sim = StateVectorSimulator(3, CFG)
        with pytest.raises(ValueError):
            sim.reduced_density_matrix([0, 0])
        with pytest.raises(ValueError):
            sim.reduced_density_matrix([3])
        with pytest.raises(ValueError):
            sim.reduced_density_matrix([])


class TestEntanglementEntropy:
    def test_bell_is_one_bit(self):
        sim = StateVectorSimulator(2, CFG)
        sim.run(q.bell_circuit())
        assert abs(sim.entanglement_entropy([0]) - 1.0) < 1e-9

    def test_product_state_zero(self):
        sim = StateVectorSimulator(4, CFG)
        sim.run(q.Circuit(4).h(0).h(1).x(3))
        for subset in ([0], [1], [0, 1], [2, 3]):
            assert sim.entanglement_entropy(subset) < 1e-9

    def test_ghz_bipartitions_one_bit(self):
        sim = StateVectorSimulator(5, CFG)
        sim.run(q.ghz_circuit(5))
        # any bipartition of a GHZ state carries exactly one bit
        for subset in ([0], [2], [0, 1], [1, 2, 3]):
            assert abs(sim.entanglement_entropy(subset) - 1.0) < 1e-9

    def test_symmetric_under_complement(self):
        n = 6
        sim = StateVectorSimulator(n, CFG)
        sim.run(q.random_circuit(n, 50, seed=8))
        a = sim.entanglement_entropy([0, 2])
        b = sim.entanglement_entropy([1, 3, 4, 5])
        assert abs(a - b) < 1e-8


class TestFidelity:
    def test_self_fidelity_one(self):
        sim = StateVectorSimulator(4, CFG)
        sim.run(q.random_circuit(4, 30, seed=1))
        assert abs(sim.fidelity_with(sim) - 1.0) < 1e-10

    def test_orthogonal_states(self):
        a = StateVectorSimulator(2, CFG)
        b = StateVectorSimulator(2, CFG)
        b.run(q.Circuit(2).x(0))
        assert a.fidelity_with(b) < 1e-12

    def test_plus_vs_zero_is_half(self):
        a = StateVectorSimulator(1, CFG)
        b = StateVectorSimulator(1, CFG)
        b.run(q.Circuit(1).h(0))
        assert abs(a.fidelity_with(b) - 0.5) < 1e-12

    def test_matches_numpy_overlap(self):
        c1 = q.random_circuit(6, 40, seed=5)
        c2 = q.random_circuit(6, 40, seed=6)
        a = StateVectorSimulator(6, CFG)
        a.run(c1)
        b = StateVectorSimulator(6, CFG)
        b.run(c2)
        ref = abs(np.vdot(a.get_state(), b.get_state())) ** 2
        assert abs(a.fidelity_with(b) - ref) < 1e-10

    def test_shape_mismatch_raises(self):
        a = StateVectorSimulator(3, CFG)
        b = StateVectorSimulator(4, CFG)
        with pytest.raises(ValueError):
            a.fidelity_with(b)


class TestDensityMatrixReduced:
    def test_pure_bell_rho_marginal(self):
        from tpu_qsim import DensityMatrixSimulator

        dm = DensityMatrixSimulator(2, config=CFG)
        dm.run(q.bell_circuit())
        rho = dm.reduced_density_matrix([0])
        assert np.abs(rho - np.eye(2) / 2).max() < 1e-10
        # entropy inherits through the override
        assert abs(dm.entanglement_entropy([0]) - 1.0) < 1e-8

    def test_vs_numpy_partial_trace_of_get_matrix(self):
        from tpu_qsim import DensityMatrixSimulator, NoiseModel, NoiseType

        nm = NoiseModel()
        nm.add(NoiseType.DEPOLARIZING, 0.05)
        dm = DensityMatrixSimulator(4, nm, CFG)
        dm.run(q.random_circuit(4, 25, seed=13))
        full = dm.get_matrix()
        for subset in ([1], [0, 2], [3, 1]):
            got = dm.reduced_density_matrix(subset)
            v = full.reshape((2,) * 8)
            n = 4
            k = len(subset)
            rest = [b for b in range(n) if b not in subset]
            perm = (
                [2 * n - 1 - (qq + n) for qq in reversed(subset)]
                + [2 * n - 1 - qq for qq in reversed(subset)]
                + [2 * n - 1 - (b + n) for b in rest]
                + [2 * n - 1 - b for b in rest]
            )
            w = v.transpose(perm).reshape(
                1 << k, 1 << k, 1 << len(rest), 1 << len(rest)
            )
            ref = np.trace(w, axis1=2, axis2=3)
            assert np.abs(got - ref).max() < 1e-10
            assert abs(np.trace(got).real - 1.0) < 1e-8

    def test_fidelity_dm_vs_pure(self):
        from tpu_qsim import DensityMatrixSimulator

        dm = DensityMatrixSimulator(2, config=CFG)
        dm.run(q.bell_circuit())
        sv = StateVectorSimulator(2, CFG)
        sv.run(q.bell_circuit())
        assert abs(dm.fidelity_with(sv) - 1.0) < 1e-10
        orth = StateVectorSimulator(2, CFG)
        orth.run(q.Circuit(2).x(0))
        assert dm.fidelity_with(orth) < 1e-10

    def test_fidelity_mixed_mixed_uhlmann(self):
        from tpu_qsim import DensityMatrixSimulator

        a = DensityMatrixSimulator(2, config=CFG)
        a.run(q.bell_circuit())
        b = DensityMatrixSimulator(2, config=CFG)
        b.set_maximally_mixed()
        # F(pure bell, I/4) = <phi| I/4 |phi> = 1/4
        assert abs(a.fidelity_with(b) - 0.25) < 1e-8
        assert abs(b.fidelity_with(b) - 1.0) < 1e-8

    def test_fidelity_shape_mismatch(self):
        from tpu_qsim import DensityMatrixSimulator

        dm = DensityMatrixSimulator(3, config=CFG)
        with pytest.raises(ValueError):
            dm.fidelity_with(StateVectorSimulator(4, CFG))


class TestBatchedEnsemble:
    def test_noiseless_batch_matches_pure(self):
        from tpu_qsim import BatchedSimulator, NoiseModel

        b = BatchedSimulator(3, 8, NoiseModel(), CFG)
        b.run(q.ghz_circuit(3))
        sv = StateVectorSimulator(3, CFG)
        sv.run(q.ghz_circuit(3))
        rho_b = b.reduced_density_matrix([0, 1])
        rho_p = sv.reduced_density_matrix([0, 1])
        assert np.abs(rho_b - rho_p).max() < 1e-10
        assert abs(b.fidelity_with(sv) - 1.0) < 1e-10
        assert abs(b.entanglement_entropy([0]) - 1.0) < 1e-8

    def test_noisy_ensemble_approaches_exact_dm(self):
        from tpu_qsim import (
            BatchedSimulator,
            DensityMatrixSimulator,
            NoiseModel,
            NoiseType,
        )

        nm = NoiseModel()
        nm.add(NoiseType.PHASE_FLIP, 0.15)
        c = q.Circuit(2).h(0).cnot(0, 1)
        b = BatchedSimulator(
            2, 512, nm, CFG, seed=7, insertion="gate_qubits"
        )
        b.run(c)
        dm = DensityMatrixSimulator(2, nm, CFG)
        dm.run(c)
        rho_mc = b.reduced_density_matrix([0, 1])
        rho_ex = dm.reduced_density_matrix([0, 1])
        # Monte-Carlo estimate: statistical agreement at 512 trajectories
        assert np.abs(rho_mc - rho_ex).max() < 0.08


class TestPeerAliasing:
    def test_pure_vs_half_width_dm_raises(self):
        # a 1-qubit rho's (2, 4) planes look exactly like a 2-qubit pure
        # state; the width check must reject it (returned 0.4999 silently
        # before the fix)
        from tpu_qsim import DensityMatrixSimulator

        sv = StateVectorSimulator(2, CFG)
        dm = DensityMatrixSimulator(1, config=CFG)
        with pytest.raises(ValueError, match="width"):
            sv.fidelity_with(dm)

    def test_dm_vs_double_width_pure_raises(self):
        from tpu_qsim import DensityMatrixSimulator

        dm = DensityMatrixSimulator(2, config=CFG)
        sv = StateVectorSimulator(4, CFG)
        with pytest.raises(ValueError, match="width"):
            dm.fidelity_with(sv)

    def test_batched_vs_half_width_dm_raises(self):
        from tpu_qsim import BatchedSimulator, DensityMatrixSimulator, NoiseModel

        b = BatchedSimulator(2, 4, NoiseModel(), CFG)
        dm = DensityMatrixSimulator(1, config=CFG)
        with pytest.raises(ValueError, match="width"):
            b.fidelity_with(dm)

    def test_raw_planes_still_accepted(self):
        # raw arrays (no num_qubits attribute) keep the shape-only contract
        sv = StateVectorSimulator(2, CFG)
        assert abs(sv.fidelity_with(sv.state_planes) - 1.0) < 1e-12


class TestObservablesAcrossFamilies:
    def test_noisy_trajectory_observables(self):
        # NoisySimulator holds one pure trajectory: the inherited
        # pure-state observables apply as-is
        from tpu_qsim import NoiseModel, NoisySimulator, NoiseType

        nm = NoiseModel()
        nm.add(NoiseType.DEPOLARIZING, 0.0)   # p=0: trajectory = ideal
        sim = NoisySimulator(3, nm, CFG, seed=2)
        sim.run(q.ghz_circuit(3))
        assert abs(sim.entanglement_entropy([0]) - 1.0) < 1e-8
        sv = StateVectorSimulator(3, CFG)
        sv.run(q.ghz_circuit(3))
        assert abs(sim.fidelity_with(sv) - 1.0) < 1e-8

    def test_sharded_simulator_observables(self):
        # sharded planes flow through the same readout surface
        from tpu_qsim import ShardedStateVectorSimulator

        sim = ShardedStateVectorSimulator(10, config=CFG)
        sim.run(q.ghz_circuit(10))
        assert abs(sim.entanglement_entropy([0, 5]) - 1.0) < 1e-7
        rho = sim.reduced_density_matrix([9])
        assert np.abs(rho - np.eye(2) / 2).max() < 1e-7


class TestShardedBatchedEnsemble:
    def test_sharded_ensemble_observables(self):
        # the dp-sharded trajectory batch flows through the same
        # single-matmul ensemble partial trace (8 virtual devices)
        from tpu_qsim import NoiseModel, ShardedBatchedSimulator

        b = ShardedBatchedSimulator(6, 8, NoiseModel(), config=CFG)
        b.run(q.ghz_circuit(6))
        rho = b.reduced_density_matrix([0, 5])
        assert abs(np.trace(rho).real - 1.0) < 1e-8
        assert abs(b.entanglement_entropy([0]) - 1.0) < 1e-7
