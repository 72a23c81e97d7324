"""Explicit-collective (shard_map + all_to_all) executor tests on the
8-virtual-device CPU mesh: planner/permutation host logic verified
exhaustively with a placement simulator, then end-to-end differential
checks against the NumPy oracle."""

import random as pyrandom

import numpy as np
import pytest

import jax

import tpu_qsim.apply as ap
from tpu_qsim import Circuit, CPUReferenceSimulator, ghz_circuit, random_circuit
from tpu_qsim.parallel import make_mesh
from tpu_qsim.schedule import plan_blockswap_segments
from tpu_qsim.shardmap_engine import (
    _Sim,
    build_shardmap_run,
    plan_restore_ops,
    plan_victim_sandwich,
)

needs_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


class TestRestorePlanner:
    @pytest.mark.parametrize("seed", range(30))
    @pytest.mark.parametrize("g", [1, 2, 3])
    def test_random_reachable_placements(self, seed, g):
        # reachable placements: bits < 7 fixed (the engine never moves them)
        n = 7 + 2 * g + 4
        rng = pyrandom.Random(seed)
        perm = list(range(7, n))
        rng.shuffle(perm)
        pos = list(range(7)) + perm
        # pos maps logical -> physical; derive per-qubit pos list
        qpos = [0] * n
        for q in range(7):
            qpos[q] = q
        for i, b in enumerate(perm):
            qpos[7 + i] = b
        ops = plan_restore_ops(tuple(qpos), n, g)
        # the ops are validated by the assert inside plan_restore_ops; check
        # op budget: at most 2 swaps and 3 locals
        assert sum(1 for o in ops if o[0] == "swap") <= 2
        assert sum(1 for o in ops if o[0] == "local") <= 3

    def test_identity_needs_no_ops(self):
        n, g = 14, 3
        assert plan_restore_ops(tuple(range(n)), n, g) == []


class TestVictimSandwich:
    @pytest.mark.parametrize("victims", [(10, 9, 8), (9, 8, 7),
                                         (10, 8, 7), (8, 10, 7)])
    def test_sandwich_equals_sigma(self, victims):
        # simulate lam -> blockswap -> lam_inv and compare with the planner's
        # sigma (victim_j <-> device bit L+j)
        n, g = 14, 3
        L = n - g
        lam, lam_inv = plan_victim_sandwich(victims, L, g)
        sim = _Sim(tuple(range(n)), n, g)
        sim.local(lam)
        sim.swap()
        sim.local(lam_inv)
        expected = list(range(n))
        for j, v in enumerate(victims):
            expected[v], expected[L + j] = expected[L + j], expected[v]
        # expected[b] = logical qubit now at bit b
        assert sim.at == expected


class TestBlockswapPlanner:
    @pytest.mark.parametrize("seed", range(5))
    def test_gates_always_local(self, seed):
        c = random_circuit(16, 120, seed=seed)
        segs, final_pos = plan_blockswap_segments(c, 3)
        total = 0
        for seg in segs:
            for _, phys in seg.gates:
                assert all(b < 13 for b in phys)
            total += len(seg.gates)
        assert total == 120

    def test_swap_count_modest(self):
        c = random_circuit(16, 200, seed=1)
        segs, _ = plan_blockswap_segments(c, 3)
        swaps = sum(1 for s in segs if s.victims is not None)
        assert swaps < 40


@needs_devices
class TestShardMapExecution:
    CFG_N = 16  # 3 device bits + 13 local bits (>= SWAP_MIN + 3 + 3)

    def _run(self, circuit, psi0=None):
        mesh = make_mesh(("tp",))
        fn = build_shardmap_run(circuit, mesh, "tp", np.float64)
        if psi0 is None:
            state = ap.initial_state(circuit.num_qubits, np.float64)
        else:
            state = ap.from_complex(psi0, np.float64)
        state = jax.device_put(
            state,
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(None, "tp")),
        )
        return ap.to_complex(fn(state))

    def test_ghz_spans_device_bits(self):
        n = self.CFG_N
        out = self._run(ghz_circuit(n))
        expected = np.zeros(1 << n, dtype=complex)
        expected[0] = expected[-1] = 1 / np.sqrt(2)
        np.testing.assert_allclose(out, expected, atol=1e-12)

    @pytest.mark.parametrize("seed", range(3))
    def test_random_circuits_vs_oracle(self, seed):
        n = self.CFG_N
        c = random_circuit(n, 80, seed=seed)
        out = self._run(c)
        ora = CPUReferenceSimulator(n)
        ora.run(c)
        np.testing.assert_allclose(out, ora.get_state(), atol=1e-11)

    def test_gates_on_device_bits_only(self, rng):
        from conftest import random_state

        n = self.CFG_N
        psi0 = random_state(n, rng)
        c = (Circuit(n).h(15).x(14).cnot(15, 13).rz(14, 0.7)
             .toffoli(15, 14, 13).swap(13, 15).cry(14, 15, 1.1))
        out = self._run(c, psi0)
        ora = CPUReferenceSimulator(n)
        ora.set_state(psi0)
        ora.run(c)
        np.testing.assert_allclose(out, ora.get_state(), atol=1e-11)


@needs_devices
class TestEngineOption:
    def test_collective_engine_via_simulator(self):
        from tpu_qsim import SimConfig
        from tpu_qsim.parallel import ShardedStateVectorSimulator

        cfg = SimConfig(dtype="complex128", use_pallas=False)
        sim = ShardedStateVectorSimulator(16, config=cfg, engine="collective")
        c = random_circuit(16, 60, seed=9)
        sim.run(c)
        ora = CPUReferenceSimulator(16)
        ora.run(c)
        np.testing.assert_allclose(sim.get_state(), ora.get_state(), atol=1e-11)

    def test_unknown_engine(self):
        from tpu_qsim.parallel import ShardedStateVectorSimulator

        with pytest.raises(ValueError, match="engine"):
            ShardedStateVectorSimulator(16, engine="bogus")

    @pytest.mark.parametrize("n,rb,amax", [(16, 3, 2), (17, 3, 3)])
    def test_sweeps_engine_via_simulator(self, n, rb, amax):
        # sweep x sharding composition: block swaps ride the mesh between
        # segments, each segment's local gates run through the grid-sweep
        # kernel engine (shrunk geometry, interpret mode)
        from tpu_qsim import SimConfig
        from tpu_qsim.kernels.gridsweeps import GridParams
        from tpu_qsim.parallel import ShardedStateVectorSimulator

        cfg = SimConfig(dtype="complex64", pallas_interpret=True)
        sim = ShardedStateVectorSimulator(
            n,
            config=cfg,
            engine="sweeps",
            grid_params=GridParams(rb_bits=rb, a_max=amax),
        )
        c = random_circuit(n, 50, seed=4)
        sim.run(c)
        ora = CPUReferenceSimulator(n)
        ora.run(c)
        err = np.abs(sim.get_state() - ora.get_state()).max()
        assert err < 5e-6
