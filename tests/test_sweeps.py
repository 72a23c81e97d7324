"""Part-map sweep executor (kernels/sweeps.py): planner invariants and
interpret-mode correctness vs the complex128 oracle.

Production geometry (32 parts, 512-row blocks) starts at 22 qubits — too
large for CPU interpret — so these tests shrink the geometry
(``SweepParams``): the planner/relabeling/ext-scalar logic is identical at
every scale. The real-hardware analog of the reference's differential suite
(reference tests/test_simulator.cu) runs via bench.py's per-size
max-amp-err checks.
"""

import numpy as np
import pytest

import tpu_qsim as q
import tpu_qsim.apply as ap
from tpu_qsim.circuit import Circuit, Gate
from tpu_qsim.gates import gate_matrix
from tpu_qsim.kernels.sweeps import (
    MAX_SWEEP_GATES,
    SweepParams,
    build_sweep_run,
    moving_qubits,
    plan_sweeps,
)

P = SweepParams(k_bits=2, rb_bits=2)  # blk_bits=9, 4 parts


def oracle_state(circuit):
    sim = q.CPUReferenceSimulator(circuit.num_qubits)
    sim.run(circuit)
    return sim.state


def run_sweeps(circuit, params=P):
    prog = build_sweep_run(circuit, np.float32, interpret=True, params=params)
    x = ap.initial_state(circuit.num_qubits, np.float32)
    return np.asarray(ap.to_complex(prog.run(x))), prog


class TestMovingQubits:
    def test_diagonal_moves_nothing(self):
        for name, qubits, param in [
            ("rz", (3,), 0.7), ("cz", (1, 5), None), ("cp", (2, 9), 0.3),
        ]:
            assert moving_qubits(gate_matrix(name, param), qubits) == frozenset()

    def test_controlled_moves_target_only(self):
        assert moving_qubits(gate_matrix("cnot"), (4, 9)) == {9}
        assert moving_qubits(gate_matrix("toffoli"), (1, 2, 8)) == {8}
        assert moving_qubits(gate_matrix("cry", 0.5), (3, 7)) == {7}

    def test_dense_moves_all(self):
        assert moving_qubits(gate_matrix("h"), (5,)) == {5}
        assert moving_qubits(gate_matrix("swap"), (2, 8)) == {2, 8}


class TestPlanner:
    def test_moving_qubits_always_in_kernel(self):
        c = q.random_circuit(13, 120, seed=11)
        n = 13
        top = set(range(n - P.k_bits, n))
        lowmid = set(range(P.blk_bits, n - P.k_bits))
        for s in plan_sweeps(c, n, P):
            for g in s.gates:
                mv = moving_qubits(gate_matrix(g.name, g.param), g.qubits)
                if s.kind == "low":
                    assert not (mv & top), (s.kind, g)
                else:
                    assert not (mv & lowmid), (s.kind, g)
                    assert (mv & top) <= s.tops

    def test_gate_order_preserved_per_dependency(self):
        # planner output must contain every input gate exactly once
        c = q.random_circuit(12, 80, seed=5)
        plan = plan_sweeps(c, 12, P)
        n_out = sum(len(s.gates) for s in plan)
        n_swap = sum(1 for g in c.gates if g.name == "swap")
        assert n_out >= len(c.gates)          # swaps may expand to 3 cnots
        assert n_out <= len(c.gates) + 2 * n_swap

    def test_sweep_gate_cap(self):
        c = Circuit(12)
        for i in range(3 * MAX_SWEEP_GATES):
            c.h(i % 8)
        for s in plan_sweeps(c, 12, P):
            assert len(s.gates) <= MAX_SWEEP_GATES


class TestCorrectness:
    @pytest.mark.parametrize("seed", [7, 19])
    def test_random_circuit(self, seed):
        c = q.random_circuit(12, 60, seed=seed)
        ours, _ = run_sweeps(c)
        assert np.abs(ours - oracle_state(c)).max() < 5e-6

    def test_qft_with_cross_swaps(self):
        c = q.qft_circuit(12)
        ours, _ = run_sweeps(c)
        assert np.abs(ours - oracle_state(c)).max() < 5e-6

    def test_ghz_chain_through_all_regions(self):
        c = q.ghz_circuit(13)
        ours, _ = run_sweeps(c)
        assert np.abs(ours - oracle_state(c)).max() < 5e-6

    def test_external_bit_gates(self):
        # every flavor of out-of-kernel resolution: diagonal with both
        # qubits external, controlled with external control, toffoli with
        # split controls, swap straddling regions (decomposes)
        c = Circuit(12)
        c.h(0).h(11).cz(10, 11).cp(9, 11, 0.4).cnot(11, 2).cnot(9, 3)
        c.toffoli(11, 4, 8).cry(10, 2, 0.6).crz(11, 1, 0.2)
        c.swap(8, 11).rz(10, 0.9).x(9).h(10)
        ours, prog = run_sweeps(c)
        assert len(prog.sweep_kinds) >= 2
        assert np.abs(ours - oracle_state(c)).max() < 5e-6

    def test_deep_circuit_stability(self):
        c = q.random_circuit(12, 250, seed=23)
        ours, _ = run_sweeps(c)
        err = np.abs(ours - oracle_state(c)).max()
        assert err < 2e-5, err

    def test_norm_preserved(self):
        c = q.random_circuit(12, 100, seed=3)
        ours, _ = run_sweeps(c)
        assert np.sum(np.abs(ours) ** 2) == pytest.approx(1.0, abs=1e-5)

    def test_parts_roundtrip(self):
        c = q.random_circuit(12, 10, seed=1)
        prog = build_sweep_run(c, np.float32, interpret=True, params=P)
        x = ap.initial_state(12, np.float32)
        y = np.asarray(prog.from_parts(prog.to_parts(x)))
        np.testing.assert_array_equal(y, np.asarray(x))


class TestValidation:
    def test_rejects_small_n_with_default_geometry(self):
        with pytest.raises(ValueError):
            build_sweep_run(q.random_circuit(12, 5, seed=1), np.float32)

    def test_rejects_f64(self):
        with pytest.raises(ValueError):
            build_sweep_run(
                q.random_circuit(12, 5, seed=1), np.float64, params=P
            )

    def test_dispatcher_uses_sweeps_in_interpret_mode(self):
        from tpu_qsim.config import SimConfig
        from tpu_qsim.kernels.dispatch import maybe_build_pallas_circuit_run

        cfg = SimConfig(dtype="complex64", pallas_interpret=True)
        fn = maybe_build_pallas_circuit_run(
            q.random_circuit(22, 3, seed=1), np.float32, cfg
        )
        # the overlapped grid engine now owns 22q+; the map engine remains
        # the documented fallback for plans the grid planner rejects
        assert fn is not None and hasattr(fn, "num_sweeps")


class TestFallback:
    def test_unplaceable_gate_raises(self):
        # a dense 2q user gate moving both a mid and a top qubit cannot be
        # decomposed by the planner -> ValueError (the dispatcher then falls
        # back to the segmented engine)
        import tpu_qsim.gates as gates

        name = "dense2q_sweeptest"
        if name not in gates.GATE_NAMES:
            theta = 0.3
            u = np.kron(
                np.array([[np.cos(theta), -np.sin(theta)],
                          [np.sin(theta), np.cos(theta)]]),
                np.array([[np.cos(theta), 1j * np.sin(theta)],
                          [1j * np.sin(theta), np.cos(theta)]]),
            )
            gates.register_gate(name, u, num_qubits=2)
        c = Circuit(12)
        c.add(name, 10, 9)  # top bit 10 + mid bit 9 under the test geometry
        with pytest.raises(ValueError):
            plan_sweeps(c, 12, P)

    def test_swap_across_regions_decomposes(self):
        c = Circuit(12).swap(9, 11)  # mid 9 <-> top 11
        plan = plan_sweeps(c, 12, P)
        names = [g.name for s in plan for g in s.gates]
        assert names.count("cnot") == 3 and "swap" not in names


class TestLargeKernelGeometry:
    """rb_bits=4 geometry: low-sweep kernels span 12 bits, so in-kernel
    qubits reach the direct-row emission regime (>= _DIRECT_ROW_MIN = 10)
    that the shrunk default test geometry never exercises (round-2 advisor
    item) — this pins the ext + direct-row interaction."""

    P_BIG = SweepParams(k_bits=2, rb_bits=4)  # blk_bits=11, n=14

    def test_high_row_gates_vs_oracle(self):
        n = 14
        c = Circuit(n)
        # dense + diagonal + controlled traffic concentrated on kernel
        # bits 10/11 (direct-row paths) and the external tops 12/13
        c.h(10).h(11).x(10).ry(11, 0.7).cnot(10, 11).cz(11, 10)
        c.cnot(13, 10).cp(12, 11, 0.4).rz(10, 1.1).h(13).cnot(12, 3)
        c.swap(10, 11).t(11).cry(10, 11, 0.9).h(12).cnot(11, 10)
        ours, prog = run_sweeps(c, self.P_BIG)
        assert np.abs(ours - oracle_state(c)).max() < 5e-6

    def test_random_mixed_vs_oracle(self):
        c = q.random_circuit(14, 40, seed=31)
        ours, _ = run_sweeps(c, self.P_BIG)
        assert np.abs(ours - oracle_state(c)).max() < 5e-6


class TestPlannerNoHang:
    def test_wide_dense_gate_raises_instead_of_hanging(self):
        # round-2 advisor (medium): a dense gate moving more top bits than
        # MAX_ACTIVE_TOPS used to spin the planner forever; it must raise
        # so the dispatcher can fall back to the segmented engine
        import tpu_qsim.gates as gates

        name = "dense5q_sweeptest"
        if name not in gates.GATE_NAMES:
            u = np.array([[1.0]])
            x = np.array([[0.0, 1.0], [1.0, 0.0]])
            for _ in range(5):
                u = np.kron(u, x)
            gates.register_gate(name, u, num_qubits=5)
        params = SweepParams(k_bits=5, rb_bits=2)  # tops = 5 > MAX_ACTIVE_TOPS
        c = Circuit(15)
        c.add(name, 14, 13, 12, 11, 10)  # all five top bits move
        with pytest.raises(ValueError, match="top qubits"):
            plan_sweeps(c, 15, params)


class TestTopWindowInSweeps:
    """Low-sweep kernels at >= 15 bits must form "mmt" top-row windows and
    stay oracle-exact with ext bits in play (production: the 21-bit low
    kernels at 26q and the stacked active tops of high kernels)."""

    P15 = SweepParams(k_bits=1, rb_bits=4)  # n=16 -> low kernel = 15 bits

    def test_high_bit_run_vs_oracle(self):
        import tpu_qsim.kernels.fused_circuit as fc

        n = 16
        c = Circuit(n)
        # a run on bits 8..14 (the low kernel's top-7 group) + top bit 15
        # traffic + low-bit gates
        c.h(8).x(9).ry(10, 0.7).h(14).t(11).cnot(9, 8).swap(8, 12)
        c.rz(13, 1.1).h(12).cnot(10, 14).s(8).crz(14, 10, 0.5)
        c.h(15).cnot(15, 3).h(0).cnot(2, 6)
        old = fc._WINDOW_COST
        fc._WINDOW_COST = {**old, "mmt": (2.0, 2.0)}
        try:
            ours, prog = run_sweeps(c, self.P15)
        finally:
            fc._WINDOW_COST = old
        assert np.abs(ours - oracle_state(c)).max() < 5e-6
