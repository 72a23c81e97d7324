"""Device-buffer census across every simulator family.

The TPU-native restoration of the reference's valgrind gate (reference
valgrind.sh:22-79 ran all 9 GTest suites under memcheck and hard-failed on
any definite/indirect leak): JAX owns device memory, so the leak class that
matters is *live device buffers accumulating across simulator lifecycles*
(e.g. a cache keyed on a leaked object, a global registry pinning states).
Each test below runs construct/run/observe/destroy cycles for one simulator
family and asserts the live-array census returns to its post-warmup
baseline.

Methodology: one warm cycle first (populates jax's global executable caches,
whose constant buffers legitimately stay live), then N identical cycles; a
real leak of even one state buffer per cycle shows up as >= N extra live
arrays.
"""

import gc

import numpy as np
import pytest

import jax

import tpu_qsim as q
from tpu_qsim.circuit import Circuit, ghz_circuit
from tpu_qsim.config import SimConfig

CFG = SimConfig(dtype="complex64")
CYCLES = 6
SLACK = 3  # jit-cache constants that first materialize after the warm cycle


def live_count() -> int:
    gc.collect()
    return len(jax.live_arrays())


def census(make_and_run, cycles: int = CYCLES, slack: int = SLACK) -> None:
    make_and_run()  # warm: global compile caches, lazy imports
    before = live_count()
    for _ in range(cycles):
        make_and_run()
    after = live_count()
    assert after <= before + slack, (
        f"live device buffers grew {before} -> {after} over {cycles} "
        f"identical lifecycles: a state or cache buffer is leaking"
    )


class TestLeakCensus:
    def test_statevector(self):
        def cycle():
            s = q.StateVectorSimulator(8, CFG)
            s.run(ghz_circuit(8))
            s.sample(16)
            s.get_probabilities()
            del s

        census(cycle)

    def test_statevector_measure_collapse(self):
        def cycle():
            s = q.StateVectorSimulator(6, CFG)
            s.run(ghz_circuit(6))
            s.measure_qubit(0)
            del s

        census(cycle)

    def test_noisy(self):
        nm = q.NoiseModel()
        nm.add_depolarizing(0.05)
        nm.add_amplitude_damping(0.02)

        def cycle():
            s = q.NoisySimulator(6, nm, CFG, seed=7)
            s.run(ghz_circuit(6))
            s.get_probabilities()
            del s

        census(cycle)

    def test_batched(self):
        nm = q.NoiseModel()
        nm.add_bit_flip(0.1)

        def cycle():
            s = q.BatchedSimulator(5, 8, nm, CFG, seed=3)
            s.run(ghz_circuit(5))
            s.average_probabilities()
            s.histogram(32)
            del s

        census(cycle)

    def test_density_matrix(self):
        nm = q.NoiseModel()
        nm.add_phase_damping(0.1)

        def cycle():
            s = q.DensityMatrixSimulator(4, nm, CFG)
            s.run(ghz_circuit(4))
            s.purity()
            s.trace()
            del s

        census(cycle)

    def test_sharded_statevector(self):
        def cycle():
            s = q.ShardedStateVectorSimulator(6, config=CFG)
            s.run(ghz_circuit(6))
            s.get_probabilities()
            del s

        census(cycle)

    def test_sharded_collective_engine(self):
        def cycle():
            s = q.ShardedStateVectorSimulator(16, config=CFG, engine="collective")
            s.run(ghz_circuit(16))
            s.total_probability()
            del s

        census(cycle)

    def test_sweep_program(self):
        from tpu_qsim.kernels.sweeps import SweepParams, build_sweep_run
        import tpu_qsim.apply as ap

        params = SweepParams(k_bits=2, rb_bits=2)
        c = q.random_circuit(12, 12, seed=5)

        def cycle():
            prog = build_sweep_run(c, np.float32, interpret=True, params=params)
            x = ap.initial_state(12, np.float32)
            np.asarray(prog.run(x))
            del prog, x

        census(cycle, cycles=4)

    def test_pallas_whole_circuit(self):
        from tpu_qsim.kernels.fused_circuit import build_pallas_run
        import tpu_qsim.apply as ap

        c = q.random_circuit(10, 12, seed=6)

        def cycle():
            run = build_pallas_run(c, np.float32, interpret=True)
            x = ap.initial_state(10, np.float32)
            np.asarray(run(x))
            del run, x

        census(cycle, cycles=4)

    def test_segmented_engine(self):
        from tpu_qsim.kernels.segmented import build_segmented_run
        import tpu_qsim.apply as ap

        c = q.random_circuit(11, 12, seed=8)

        def cycle():
            run = build_segmented_run(
                c, np.float32, interpret=True, local_bits=10
            )
            x = ap.initial_state(11, np.float32)
            np.asarray(run(x))
            del run, x

        census(cycle, cycles=4)

    def test_checkpoint_roundtrip(self, tmp_path):
        path = str(tmp_path / "state.npz")

        def cycle():
            s = q.StateVectorSimulator(7, CFG)
            s.run(ghz_circuit(7))
            s.save_state(path)
            s2 = q.StateVectorSimulator(7, CFG)
            s2.load_state(path)
            del s, s2

        census(cycle, cycles=4)


class TestObservableLeaks:
    def test_entanglement_observables(self):
        # the round-3e observables allocate per-call device buffers
        # (reduced matmuls, overlap scalars): the census must return to
        # baseline across lifecycles
        def cycle():
            s = q.StateVectorSimulator(8, CFG)
            s.run(ghz_circuit(8))
            s.reduced_density_matrix([0, 3])
            s.entanglement_entropy([1])
            s.fidelity_with(s)
            del s

        census(cycle)

    def test_dm_observables(self):
        def cycle():
            s = q.DensityMatrixSimulator(5, config=CFG)
            s.run(ghz_circuit(5))
            s.reduced_density_matrix([0, 2])
            s.purity()
            del s

        census(cycle)
