"""Multi-chip sharding tests — run on the 8 virtual CPU devices configured in
conftest.py. Differential: sharded execution must be numerically identical
to single-device execution."""

import numpy as np
import pytest

import jax
from jax.sharding import PartitionSpec as P

from tpu_qsim import (
    Circuit,
    CPUReferenceSimulator,
    SimConfig,
    ghz_circuit,
    random_circuit,
)
from tpu_qsim.noise import NoiseModel
from tpu_qsim.noisy import BatchedSimulator
from tpu_qsim.parallel import (
    ShardedBatchedSimulator,
    ShardedStateVectorSimulator,
    make_mesh,
)

CFG = SimConfig(dtype="complex128", use_pallas=False)

needs_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@needs_devices
class TestShardedStateVector:
    def test_ghz_sharded_matches_oracle(self):
        n = 10
        sim = ShardedStateVectorSimulator(n, config=CFG)
        sim.run(ghz_circuit(n))
        ora = CPUReferenceSimulator(n)
        ora.run(ghz_circuit(n))
        np.testing.assert_allclose(sim.get_state(), ora.get_state(), atol=1e-12)

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_random_circuit_sharded(self, seed):
        # random circuits hit gates on the sharded top qubits -> XLA must
        # insert cross-shard collectives; results stay exact
        n = 8
        c = random_circuit(n, 60, seed=seed)
        sim = ShardedStateVectorSimulator(n, config=CFG)
        sim.run(c)
        ora = CPUReferenceSimulator(n)
        ora.run(c)
        np.testing.assert_allclose(sim.get_state(), ora.get_state(), atol=1e-11)

    def test_state_is_actually_sharded(self):
        sim = ShardedStateVectorSimulator(10, config=CFG)
        sim.run(ghz_circuit(10))
        shards = sim.state_planes.sharding
        assert shards.spec == P(None, "tp")
        assert len(sim.state_planes.sharding.mesh.devices.ravel()) == 8

    def test_measurement_and_sampling_on_sharded_state(self):
        sim = ShardedStateVectorSimulator(10, config=CFG, seed=3)
        sim.run(ghz_circuit(10))
        s = np.asarray(sim.sample(200))
        assert set(np.unique(s)) <= {0, 1023}
        m = sim.measure_qubit(0)
        for q in range(1, 10):
            assert sim.measure_qubit(q) == m  # GHZ correlation

    def test_auto_engine_small_state_uses_gspmd(self):
        sim = ShardedStateVectorSimulator(10, config=CFG)
        assert sim.engine == "gspmd"

    def test_auto_engine_large_state_avoids_gspmd_replication(self, monkeypatch):
        # PERF_NOTES §15: the GSPMD partitioned program all-gathers the
        # full state to every device — above the replication limit "auto"
        # must resolve to an engine whose per-device footprint is 1/D.
        import tpu_qsim.parallel as par

        monkeypatch.setattr(par, "GSPMD_REPLICATION_LIMIT_BYTES", 1 << 10)
        # n=16: enough local bits (SWAP_MIN + 2*g_bits = 13) for the
        # collective engine's block-swap relabeling over the 8-device mesh
        n = 16
        sim = ShardedStateVectorSimulator(n, config=CFG)
        assert sim.engine == "collective"
        c = random_circuit(n, 40, seed=3)
        sim.run(c)
        ora = CPUReferenceSimulator(n)
        ora.run(c)
        np.testing.assert_allclose(sim.get_state(), ora.get_state(), atol=1e-11)

    def test_explicit_gspmd_above_limit_raises(self, monkeypatch):
        import tpu_qsim.parallel as par

        monkeypatch.setattr(par, "GSPMD_REPLICATION_LIMIT_BYTES", 1 << 10)
        with pytest.raises(ValueError, match="replicates the FULL"):
            ShardedStateVectorSimulator(10, config=CFG, engine="gspmd")
        # the escape hatch accepts the measured footprint explicitly
        sim = ShardedStateVectorSimulator(
            10, config=CFG, engine="gspmd", allow_replication=True
        )
        assert sim.engine == "gspmd"

    def test_indivisible_raises(self):
        with pytest.raises(ValueError, match="not divisible"):
            ShardedStateVectorSimulator(2, config=CFG)  # 4 amps, 8 shards


@needs_devices
class TestShardedBatched:
    def test_matches_unsharded_same_seed(self):
        nm = NoiseModel().add_depolarizing(0.1)
        a = ShardedBatchedSimulator(3, 16, nm, config=CFG, seed=7)
        b = BatchedSimulator(3, 16, nm, CFG, seed=7)
        a.run(ghz_circuit(3))
        b.run(ghz_circuit(3))
        np.testing.assert_allclose(a.get_state(), b.get_state(), atol=1e-12)

    def test_dp_tp_mesh(self):
        mesh = make_mesh(("dp", "tp"), (2, 4))
        nm = NoiseModel().add_bit_flip(0.05)
        sim = ShardedBatchedSimulator(
            7, 8, nm, mesh=mesh, tp_axis="tp", config=CFG, seed=1
        )
        sim.run(random_circuit(7, 30, seed=4))
        assert sim.total_probability() == pytest.approx(1.0, abs=1e-9)
        h = sim.histogram(50)
        assert sum(h.values()) == 8 * 50

    def test_bad_batch_divisibility(self):
        with pytest.raises(ValueError, match="not divisible"):
            ShardedBatchedSimulator(3, 9, None, config=CFG)
