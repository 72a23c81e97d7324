"""Active-bit grid sweep executor (kernels/gridsweeps.py): planner
invariants and interpret-mode correctness vs the complex128 oracle.

Production geometry (16-slice blocks of 512 rows) starts at 22 qubits — too
large for CPU interpret — so these tests shrink the geometry
(``GridParams``); the planner/relabeling/block-index logic is identical at
every scale. On-chip certification runs via bench.py's per-size
max-amp-err checks (the analog of the reference's differential suite,
reference tests/test_gpu_cpu_equivalence.cu).
"""

import numpy as np
import pytest

import tpu_qsim as q
import tpu_qsim.apply as ap
from tpu_qsim.circuit import Circuit, Gate
from tpu_qsim.gates import gate_matrix
from tpu_qsim.kernels.gridsweeps import (
    GridParams,
    build_grid_sweep_run,
    plan_grid_sweeps,
)
from tpu_qsim.kernels.sweeps import moving_qubits

P = GridParams(rb_bits=3, a_max=2)   # blk_bits=10


def oracle_state(circuit):
    sim = q.CPUReferenceSimulator(circuit.num_qubits)
    sim.run(circuit)
    return sim.state


def run_grid(circuit, params=P):
    prog = build_grid_sweep_run(
        circuit, np.float32, interpret=True, params=params
    )
    x = ap.initial_state(circuit.num_qubits, np.float32)
    return np.asarray(ap.to_complex(prog.run(x))), prog


class TestPlanner:
    def test_active_budget_respected(self):
        c = q.random_circuit(13, 80, seed=7)
        plan = plan_grid_sweeps(c, 13, P)
        high = frozenset(range(P.blk_bits, 13))
        for s in plan:
            assert len(s.active) <= P.a_max
            for g in s.gates:   # planner gates carry explicit matrices
                mv = moving_qubits(g.u, g.qubits)
                assert (mv & high) <= s.active

    def test_plan_covers_all_gates(self):
        c = q.random_circuit(13, 60, seed=3)
        plan = plan_grid_sweeps(c, 13, P)
        # merge_1q_chains folds same-qubit 1q runs before planning, so
        # the planned count is below the raw count — the coverage bar is
        # the merged list itself
        from tpu_qsim.kernels.fused_circuit import as_pgates, merge_1q_chains

        n_out = sum(len(s.gates) for s in plan)
        assert n_out == len(merge_1q_chains(as_pgates(c.gates)))

    def test_unified_shape_beats_lowhigh_split(self):
        # a circuit mixing mid-bit and top-bit movers plans fewer sweeps
        # than the bit-count would force under a rigid low/high split
        c = Circuit(13)
        c.h(10).h(11).cnot(0, 10).h(3).cnot(11, 2).rz(12, 0.4).h(5)
        plan = plan_grid_sweeps(c, 13, P)
        assert len(plan) <= 2

    def test_overwide_dense_gate_raises(self):
        from tpu_qsim.gates import register_gate

        rng = np.random.default_rng(0)
        m = rng.standard_normal((8, 8)) + 1j * rng.standard_normal((8, 8))
        qm, _ = np.linalg.qr(m)
        register_gate("grid_dense3_test", qm, num_qubits=3)
        c = Circuit(13)
        c.append(Gate("grid_dense3_test", (10, 11, 12)))
        with pytest.raises(ValueError, match="stacks at most"):
            plan_grid_sweeps(c, 13, P)

    def test_straddling_swap_decomposes(self):
        # a swap moving more high bits than one sweep can stack
        c = Circuit(13)
        c.swap(10, 12)
        plan = plan_grid_sweeps(c, 13, GridParams(rb_bits=3, a_max=1))
        cnot_u = gate_matrix("cnot")
        n_cnot = sum(
            1
            for s in plan
            for g in s.gates
            if g.u.shape == (4, 4) and not np.any(g.u - cnot_u)
        )
        assert n_cnot == 3


class TestPartitionPlanner:
    """``_improve_plan``: when the greedy frontier packer exceeds the
    active-bit lower bound and that bound is 2, an enumerated active-set
    partition replaces the plan — one saved sweep is one saved full-state
    HBM pass (the dominant fixed cost at 26q+)."""

    PP = GridParams(rb_bits=2, a_max=2)   # blk_bits=9; 4 high bits at n=13

    def _frontier_only(self, circuit, n, params, cap):
        from tpu_qsim.kernels import gridsweeps as gs

        orig = gs._improve_plan
        gs._improve_plan = lambda s, *a: s
        try:
            return plan_grid_sweeps(circuit, n, params, cap)
        finally:
            gs._improve_plan = orig

    def test_two_sweep_partition_beats_frontier(self):
        c = q.random_circuit(13, 40, seed=3)
        frontier = self._frontier_only(c, 13, self.PP, 100)
        plan = plan_grid_sweeps(c, 13, self.PP, 100)
        assert len(frontier) == 3
        assert len(plan) == 2
        assert sum(len(s.gates) for s in plan) == sum(
            len(s.gates) for s in frontier
        )
        high = frozenset(range(self.PP.blk_bits, 13))
        for s in plan:
            assert len(s.active) <= self.PP.a_max
            for g in s.gates:
                assert (moving_qubits(g.u, g.qubits) & high) <= s.active

    @pytest.mark.parametrize("seed", [3, 15, 22])
    def test_partitioned_plan_matches_oracle(self, seed):
        c = q.random_circuit(13, 40, seed=seed)
        ours, prog = run_grid(c, self.PP)
        assert prog.num_sweeps == 2
        assert np.abs(ours - oracle_state(c)).max() < 5e-6

    def test_respects_gate_cap(self):
        # with a cap below any feasible 2-sweep split, the partition is
        # rejected and the frontier plan stands
        c = q.random_circuit(13, 40, seed=3)
        plan = plan_grid_sweeps(c, 13, self.PP, 10)
        from tpu_qsim.kernels.fused_circuit import as_pgates, merge_1q_chains

        n_merged = len(merge_1q_chains(as_pgates(c.gates)))
        assert sum(len(s.gates) for s in plan) == n_merged
        assert all(len(s.gates) <= 10 for s in plan)

    def test_geometry_candidates_selected_per_circuit(self):
        # planning-only: construction never executes the kernels. The
        # bench circuit admits the measured-fastest rb8/a5 2-sweep plan
        # (9.03 ms on-chip); circuits that don't (seed 1) keep the
        # measured rb9/a4 default — the wider rb6/a7 2-sweep geometry
        # LOST its 26q A/B (10.39 ms vs 9.69) and must not be selected.
        c = q.random_circuit(26, 100, seed=42)
        prog = build_grid_sweep_run(c, np.float32)
        assert (prog.params.rb_bits, prog.params.a_max) == (8, 5)
        assert prog.num_sweeps == 2
        c1 = q.random_circuit(26, 100, seed=1)
        prog1 = build_grid_sweep_run(c1, np.float32)
        # post-merge even seed 1 admits an rb8/a5 2-sweep partition
        # (folding strips the dependency chains that blocked it)
        assert (prog1.params.rb_bits, prog1.params.a_max) == (8, 5)
        assert prog1.num_sweeps == 2

    def test_geometry_candidates_balance_28q(self):
        # 28q+: the balanced rb6/a7 [50,50] plan measured 38.2 ms vs
        # the [70,30] default's 43.9 — same sweep count, balance pays
        c = q.random_circuit(28, 100, seed=42)
        prog = build_grid_sweep_run(c, np.float32)
        assert (prog.params.rb_bits, prog.params.a_max) == (6, 7)
        assert prog.num_sweeps == 2
        assert max(len(s.gates) for s in
                   plan_grid_sweeps(c, 28, prog.params, 50)) == 49

    def test_geometry_policy_pins(self):
        """Pin the measured per-size partition policy (the balance
        preference FLIPS with size — every entry is an on-chip A/B,
        docs/PERF_NOTES.md): 27q balanced [50,50] (19.2 vs 21.7 ms
        3-sweep), 30q FILL [67,33] (195.5 vs 210.7 3-sweep vs 226.7
        balanced); 22-25q get no candidate (balanced lost there)."""
        from tpu_qsim.kernels.gridsweeps import geometry_candidates

        c27 = q.random_circuit(27, 100, seed=42)
        p27 = build_grid_sweep_run(c27, np.float32)
        assert (p27.params.rb_bits, p27.params.a_max, p27.num_sweeps) == (
            6, 7, 2,
        )
        c30 = q.random_circuit(30, 100, seed=42)
        p30 = build_grid_sweep_run(c30, np.float32)
        assert p30.num_sweeps == 2
        # fill, not balanced: the larger sweep keeps ~2/3 of the gates
        plan = plan_grid_sweeps(
            c30, 30, p30.params, 70, partition=True, balance=False
        )
        assert [len(s.gates) for s in plan] == [50, 12]
        for n in (22, 23, 24, 25):
            assert len(geometry_candidates(n)) == 1   # default only

    def test_production_plan_shapes(self):
        # planning-only (no execution): the 100-gate bench circuits at
        # 26q (under rb8/a5) and 30q (rb6/a7) admit 2-sweep partitions
        # the greedy packer misses (it plans 3)
        c = q.random_circuit(26, 100, seed=42)
        plan = plan_grid_sweeps(c, 26, GridParams(rb_bits=8, a_max=5), 70)
        # post-merge (merge_1q_chains) the 100-gate mix folds to 56
        # emitted gates; the closure minimum for sweep 1 is 45
        assert [len(s.gates) for s in plan] == [45, 11]
        c30 = q.random_circuit(30, 100, seed=42)
        plan30 = plan_grid_sweeps(c30, 30, GridParams(rb_bits=6, a_max=7), 70)
        assert [len(s.gates) for s in plan30] == [50, 12]


class TestCorrectness:
    @pytest.mark.parametrize("seed", [1, 2, 3, 4])
    def test_random_vs_oracle(self, seed):
        c = q.random_circuit(13, 60, seed=seed)
        ours, prog = run_grid(c)
        # seed 1's merged circuit folds into a single sweep — itself a
        # path worth covering; the others stay multi-sweep
        assert prog.num_sweeps >= (1 if seed == 1 else 2)
        assert np.abs(ours - oracle_state(c)).max() < 5e-6

    def test_all_gate_kinds(self):
        c = Circuit(12)
        c.h(0).x(11).y(5).z(10).s(3).t(7).rx(9, 0.3).ry(10, 1.1)
        c.rz(4, 0.7).cnot(0, 11).cnot(10, 2).cz(3, 11).swap(2, 9)
        c.cry(11, 4, 0.5).crz(1, 10, 0.9).toffoli(0, 11, 5).cp(10, 3, 0.4)
        ours, _ = run_grid(c)
        assert np.abs(ours - oracle_state(c)).max() < 5e-6

    def test_ghz_and_qft(self):
        for c in (q.ghz_circuit(12), q.qft_circuit(12)):
            ours, _ = run_grid(c)
            assert np.abs(ours - oracle_state(c)).max() < 5e-6

    def test_ext_controlled_cond_branch(self):
        # Program 2's controls sit on bit 12, which it never MOVES — the
        # planner leaves it inactive, so those gates take the
        # scalar-predicate lax.cond path (fused_circuit.EXT_CTRL_COND).
        # Program 1 superposes bit 12 first (in its own program, where 12
        # is active), so both cond arms see nonzero amplitudes. Identical
        # results with the blend fallback.
        from tpu_qsim.kernels import fused_circuit as fc

        c1 = Circuit(13)
        c1.h(12).h(0).h(1)
        c2 = Circuit(13)
        c2.cnot(12, 3).cry(12, 1, 0.8).toffoli(12, 2, 4)
        c2.h(10).cnot(10, 11).rz(12, 0.3)

        def run_pair():
            p1 = build_grid_sweep_run(c1, np.float32, interpret=True, params=P)
            p2 = build_grid_sweep_run(c2, np.float32, interpret=True, params=P)
            x = ap.initial_state(13, np.float32)
            return np.asarray(ap.to_complex(p2.run(p1.run(x)))), p2

        # Both knobs default OFF (job 153: EXT_CTRL_COND's lax.cond lowers
        # to a scalar-pred arith.select that real Mosaic cannot legalize;
        # CTRL_SLAB_SLICE measured as a relayout regression on-chip). The
        # emission paths stay in-tree; force them on here and demand exact
        # identity with the blend fallback.
        saved = fc.EXT_CTRL_COND, fc.CTRL_SLAB_SLICE
        try:
            fc.EXT_CTRL_COND = True
            fc.CTRL_SLAB_SLICE = True
            ours_on, p2 = run_pair()
            assert all(
                12 not in s for s in map(set, p2.active_sets)
            )  # the control really is ext in program 2
            both = Circuit(13)
            for g in list(c1.gates) + list(c2.gates):
                both.append(g)
            assert np.abs(ours_on - oracle_state(both)).max() < 5e-6
            # cnot(10, 11)'s control relabels to kernel bit 10 — the
            # CTRL_SLAB_SLICE path; disable both knobs, demand identity
            fc.EXT_CTRL_COND = False
            fc.CTRL_SLAB_SLICE = False
            ours_off, _ = run_pair()
        finally:
            fc.EXT_CTRL_COND, fc.CTRL_SLAB_SLICE = saved
        assert np.abs(ours_on - ours_off).max() == 0.0

    def test_diagonalize_controlled_pass_exact(self):
        # C-V -> (I x W) . C-diag . (I x W-dagger): the three replacement
        # factors must compose to the original gate exactly (host
        # complex128), and diagonal / plain-dense gates must pass through.
        from tpu_qsim.fusion import expand_matrix
        from tpu_qsim.kernels.fused_circuit import (
            as_pgates,
            diagonalize_controlled,
        )

        cases = [
            ("cnot", (1, 0), None),
            ("cry", (1, 2), 0.7),
            ("toffoli", (2, 1, 0), None),
            ("crz", (0, 2), 1.3),      # diagonal: pass-through
            ("cz", (0, 1), None),      # diagonal: pass-through
            ("swap", (0, 1), None),    # dense non-controlled: pass-through
            ("h", (2,), None),         # 1q dense: pass-through
        ]
        for name, qubits, p in cases:
            u = gate_matrix(name, p)
            out = diagonalize_controlled(as_pgates([(u, qubits)]))
            if name in ("crz", "cz", "swap", "h"):
                assert len(out) == 1 and out[0].u is not None
                assert np.abs(out[0].u - u).max() == 0.0
                continue
            assert len(out) == 3
            order = tuple(range(2, -1, -1))
            acc = np.eye(8, dtype=np.complex128)
            for g in out:
                acc = expand_matrix(g.u, g.qubits, order) @ acc
            ref = expand_matrix(u, qubits, order)
            assert np.abs(acc - ref).max() < 1e-12
            # the middle factor is the diagonal, the outer two are 1q
            from tpu_qsim.kernels.fused_circuit import _is_diagonal

            assert _is_diagonal(out[1].u)
            assert len(out[0].qubits) == 1 and len(out[2].qubits) == 1

    def test_diag_ctrl_grid_vs_oracle(self):
        # End-to-end grid execution with the DIAG_CTRL rewrite on: random
        # mixes (ext / active / row / lane control placements) and the
        # all-kinds circuit must match the oracle, and no controlled-dense
        # blend may remain in the planned programs.
        from tpu_qsim.kernels import fused_circuit as fc
        from tpu_qsim.kernels.fused_circuit import (
            _is_diagonal,
            _split_controlled_1q,
        )

        saved = fc.DIAG_CTRL
        try:
            fc.DIAG_CTRL = True
            for c in (
                q.random_circuit(13, 60, seed=2),
                q.random_circuit(12, 80, seed=9),
            ):
                ours, prog = run_grid(c)
                assert np.abs(ours - oracle_state(c)).max() < 5e-6
                for sw_gates in prog.sweep_gates:
                    for g in sw_gates:
                        # only controlled gates with a >= 2-qubit dense
                        # core (e.g. fredkin) may survive; any controlled
                        # dense-1q (incl. toffoli) must have rewritten
                        assert _is_diagonal(g.u) or (
                            _split_controlled_1q(g) is None
                        ), "controlled-1q blend survived the rewrite"
            c = Circuit(12)
            c.h(0).x(11).cnot(0, 11).cnot(10, 2).cz(3, 11)
            c.cry(11, 4, 0.5).crz(1, 10, 0.9).toffoli(0, 11, 5)
            c.cp(10, 3, 0.4).swap(2, 9).h(11)
            ours, _ = run_grid(c)
            assert np.abs(ours - oracle_state(c)).max() < 5e-6
            # plan-local ext-only mode: same circuits, same oracle bar
            fc.DIAG_CTRL = "ext"
            for c2 in (
                q.random_circuit(13, 60, seed=2),
                q.random_circuit(12, 80, seed=9),
            ):
                ours, _ = run_grid(c2)
                assert np.abs(ours - oracle_state(c2)).max() < 5e-6
        finally:
            fc.DIAG_CTRL = saved

    def test_deep_circuit(self):
        c = q.random_circuit(12, 300, seed=11)
        ours, _ = run_grid(c)
        assert np.abs(ours - oracle_state(c)).max() < 2e-5

    def test_chained_runs_compose(self):
        c1 = q.random_circuit(12, 30, seed=5)
        c2 = q.random_circuit(12, 30, seed=6)
        p1 = build_grid_sweep_run(c1, np.float32, interpret=True, params=P)
        p2 = build_grid_sweep_run(c2, np.float32, interpret=True, params=P)
        x = ap.initial_state(12, np.float32)
        y = np.asarray(ap.to_complex(p2.run(p1.run(x))))
        both = Circuit(12)
        for g in list(c1.gates) + list(c2.gates):
            both.append(g)
        assert np.abs(y - oracle_state(both)).max() < 5e-6

    def test_production_a4_geometry(self):
        # a_max=4 (production active width) at the smallest size it fits
        params = GridParams(rb_bits=3, a_max=4)
        c = q.random_circuit(15, 60, seed=9)
        ours, prog = run_grid(c, params)
        assert np.abs(ours - oracle_state(c)).max() < 5e-6

    def test_shifted_row_to_active_geometry(self):
        # the 2-sweep production geometries (rb8/a5, rb7/a6) shift row bits
        # into active bits at constant block size; mirror that shift at
        # test scale: same n, one fewer row bit, one more active bit
        base = GridParams(rb_bits=3, a_max=2)
        shifted = GridParams(rb_bits=2, a_max=3)
        c = q.random_circuit(13, 60, seed=12)
        ours_b, prog_b = run_grid(c, base)
        ours_s, prog_s = run_grid(c, shifted)
        ora = oracle_state(c)
        assert np.abs(ours_b - ora).max() < 5e-6
        assert np.abs(ours_s - ora).max() < 5e-6
        # the wider active budget can only tighten the plan
        assert prog_s.num_sweeps <= prog_b.num_sweeps


class TestGeometry:
    def test_rejects_non_f32(self):
        with pytest.raises(ValueError, match="float32"):
            build_grid_sweep_run(q.random_circuit(22, 4), np.float64)

    def test_rejects_small_n_at_default_params(self):
        with pytest.raises(ValueError, match="expects"):
            build_grid_sweep_run(q.random_circuit(12, 4), np.float32)

    def test_plans_to_thirty_qubits(self):
        # MAX_QUBITS parity (reference include/Constants.hpp:68): default
        # geometry must produce a valid plan at every size up to 30
        # (plan-only here; 29-30q execution is certified on-chip, where a
        # donating run fits the 8.6 GB planes state in HBM)
        for n in (29, 30):
            c = q.random_circuit(n, 60, seed=4)
            plan = plan_grid_sweeps(c, n)
            # merge_1q_chains folds the 60-gate mix to ~41-43 emitted
            # gates; coverage bar = every surviving gate planned
            assert sum(len(s.gates) for s in plan) >= 40
            for s in plan:
                assert len(s.active) <= GridParams().a_max

    def test_donation_flag_off_below_29(self):
        c = q.random_circuit(13, 10, seed=1)
        _, prog = run_grid(c)
        assert prog.donates is False


class TestFacadeViewCache:
    """StateVectorSimulator parks grid-engine state in view form between
    runs (the flat<->view retile is ~25% of a 24q circuit on-chip,
    docs/PERF_NOTES.md §7) and materializes flat planes lazily on readback.
    Production dispatch only builds grid programs at 20q+, so these tests
    inject a shrunk-geometry interpret program into the run cache."""

    def _sim_with_grid(self, circuit, params=P):
        sim = q.StateVectorSimulator(circuit.num_qubits)
        prog = build_grid_sweep_run(
            circuit, np.float32, interpret=True, params=params
        )
        sim._run_cache[circuit.signature()] = prog
        return sim, prog

    def test_single_run_matches_oracle(self):
        c = q.random_circuit(12, 40, seed=21)
        sim, _ = self._sim_with_grid(c)
        sim.run(c)
        assert sim._view_state is not None          # parked in view form
        got = sim.get_state()                        # lazy materialization
        assert sim._view_state is None
        np.testing.assert_allclose(
            got, oracle_state(c), rtol=0, atol=1e-6
        )

    def test_consecutive_runs_reuse_view(self):
        c = q.random_circuit(12, 30, seed=22)
        sim, prog = self._sim_with_grid(c)
        sim.run(c).run(c).run(c)
        assert sim._view_state is not None
        assert sim._view_state.shape == prog.vshape
        ora = q.CPUReferenceSimulator(12)
        for _ in range(3):
            ora.run(c)
        np.testing.assert_allclose(
            sim.get_state(), ora.state, rtol=0, atol=1e-6
        )

    def test_vshape_mismatch_falls_back_to_flat(self):
        c1 = q.random_circuit(12, 20, seed=23)
        c2 = q.random_circuit(12, 20, seed=24)
        sim, _ = self._sim_with_grid(c1)
        prog2 = build_grid_sweep_run(
            c2, np.float32, interpret=True,
            params=GridParams(rb_bits=2, a_max=3),   # different vshape
        )
        sim._run_cache[c2.signature()] = prog2
        sim.run(c1).run(c2)
        ora = q.CPUReferenceSimulator(12)
        ora.run(c1)
        ora.run(c2)
        np.testing.assert_allclose(
            sim.get_state(), ora.state, rtol=0, atol=1e-6
        )

    def test_readbacks_and_measurement_interleave(self):
        c = q.random_circuit(12, 25, seed=25)
        sim, _ = self._sim_with_grid(c)
        sim.run(c)
        assert abs(sim.total_probability() - 1.0) < 1e-4
        sim.run(c)                                    # re-parks after readback
        assert sim._view_state is not None
        outcome = sim.measure_qubit(3)                # collapses flat state
        assert outcome in (0, 1)
        assert sim._view_state is None
        assert abs(sim.total_probability() - 1.0) < 1e-4

    def test_reset_clears_view(self):
        c = q.random_circuit(12, 10, seed=26)
        sim, _ = self._sim_with_grid(c)
        sim.run(c)
        sim.reset()
        assert sim._view_state is None
        np.testing.assert_allclose(sim.get_probabilities()[0], 1.0)


class TestHotBitFill:
    """Spare active-slot padding targets ext-control bits (the ~417 us/op
    per-op class, docs/PERF_NOTES.md §13) and avoids pulling extphase-fused
    diagonal bits in-kernel."""

    def test_fill_prefers_ctrl_bits_avoids_diag_bits(self):
        from tpu_qsim.kernels.gridsweeps import _pad_active

        c = Circuit(13)
        for i in range(5):
            c.cnot(12, i)        # bit 12: non-moving ctrl of a dense gate
        for _ in range(3):
            c.rz(11, 0.3)        # bit 11: diagonal — extphase keeps it free
        plan = plan_grid_sweeps(c, 13, P)
        assert plan[0].active == set()       # nothing moves above blk
        padded = _pad_active(plan[0], 13, P.blk_bits, P.a_max)
        assert 12 in padded                  # hot ctrl bit rides in-kernel
        assert 11 not in padded              # diag bit stays external

    def test_fill_flag_off_matches_on(self):
        from tpu_qsim.kernels import gridsweeps as gs

        c = q.random_circuit(13, 40, seed=11)
        ref, _ = run_grid(c)
        old = gs.FILL_HOT_BITS
        gs.FILL_HOT_BITS = False
        try:
            off, _ = run_grid(c)
        finally:
            gs.FILL_HOT_BITS = old
        np.testing.assert_allclose(ref, off, atol=1e-6)
        np.testing.assert_allclose(ref, oracle_state(c), atol=1e-6)


class TestMeasuredGeometryDefaults:
    """Pin the on-chip-measured per-size geometry (docs/PERF_NOTES.md §6-7).
    These values are load-bearing performance calibration — a silent change
    shows up only as a regression on real hardware, so CI pins them."""

    def test_default_geometry_table(self):
        from tpu_qsim.kernels.gridsweeps import default_geometry

        expect = {
            20: (9, 4, 100),
            21: (8, 5, 100),
            22: (8, 5, 90), 23: (8, 5, 90),
            24: (8, 5, 80), 25: (8, 5, 80),
            26: (9, 4, 56), 27: (9, 4, 56),
            28: (6, 7, 70), 29: (6, 7, 70), 30: (6, 7, 70),
        }
        for n, (rb, a, cap) in expect.items():
            params, got_cap = default_geometry(n)
            assert (params.rb_bits, params.a_max, got_cap) == (rb, a, cap), n

    def test_default_max_gates_cap_splits_at_24(self):
        from tpu_qsim.kernels.gridsweeps import default_max_gates

        assert default_max_gates(21) == 100
        assert default_max_gates(22) == default_max_gates(23) == 90
        assert default_max_gates(24) == default_max_gates(25) == 80
        assert default_max_gates(26) == 56

    def test_planner_rejects_nonpositive_max_gates(self):
        # max_gates=0 would make the frontier loop spin forever (a fresh
        # sweep could never absorb a gate) — must raise, not hang
        from tpu_qsim.kernels.gridsweeps import plan_grid_sweeps

        c = Circuit(22)
        c.h(0).cnot(0, 21)
        with pytest.raises(ValueError, match="max_gates"):
            plan_grid_sweeps(c, max_gates=0)


class TestMatricize:
    """Round-4 matricized-tile rewrite (fused groups -> lane matmuls with
    tracked bit placement): exact-identity vs the oracle, placement
    restoration, and window formation."""

    def _run_matricized(self, circuit, k_bits, min_gates=2, params=P):
        import tpu_qsim.kernels.fused_circuit as fc

        old = (fc.MATRICIZE, fc.MATRICIZE_MIN)
        fc.MATRICIZE, fc.MATRICIZE_MIN = k_bits, min_gates
        try:
            return run_grid(circuit, params)[0]
        finally:
            fc.MATRICIZE, fc.MATRICIZE_MIN = old

    @pytest.mark.parametrize("k_bits", [4, 5, 7])
    @pytest.mark.parametrize("seed", [1, 5])
    def test_matricized_matches_oracle(self, k_bits, seed):
        c = q.random_circuit(13, 60, seed=seed)
        got = self._run_matricized(c, k_bits)
        np.testing.assert_allclose(got, oracle_state(c), atol=5e-6)

    def test_matricized_gate_variety(self):
        c = Circuit(12)
        c.h(0).cnot(10, 2).toffoli(3, 8, 1).swap(2, 9).cry(11, 4, 0.7)
        c.rz(10, 0.3).cp(5, 11, 0.4).x(6).y(7).mcz(0, 5, 9)
        c.cnot(1, 8).h(4).cnot(4, 10).rz(2, 1.1).cnot(9, 3)
        got = self._run_matricized(c, 5)
        np.testing.assert_allclose(got, oracle_state(c), atol=5e-6)

    def test_placement_restored_and_windows_form(self):
        """The rewritten list must realize the same unitary AND contain
        lane-window matmuls (the point of the exercise)."""
        from tpu_qsim.kernels.fused_circuit import (
            as_pgates,
            materialize_ops,
            matricize_pgates,
            merge_1q_chains,
        )

        c = q.random_circuit(13, 60, seed=2)
        pg = merge_1q_chains(as_pgates(c.gates))
        mat = matricize_pgates(pg, 13, k_bits=5, min_gates=3)
        ops, _ = materialize_ops(mat, n_bits=13, merge=False)
        kinds = {op[0] for op in ops}
        assert "mm" in kinds, f"no lane windows formed: {kinds}"
        # exact unitary equality of the rewritten list via the oracle
        sim = q.CPUReferenceSimulator(13)
        rng = np.random.default_rng(0)
        amps = rng.standard_normal(1 << 13) + 1j * rng.standard_normal(1 << 13)
        amps /= np.linalg.norm(amps)
        sim.set_state(amps)
        for g in pg:
            sim.apply_matrix(g.u, g.qubits)
        expect = sim.get_state()
        sim.set_state(amps)
        for g in mat:
            sim.apply_matrix(g.u, g.qubits)
        np.testing.assert_allclose(sim.get_state(), expect, atol=1e-10)

    def test_ext_and_diag_passthrough(self):
        """Gates with high (ext-destined) controls and foreign-bit diagonals
        pass through correctly under active placement."""
        c = Circuit(13)
        for i in range(6):
            c.cnot(12, i)           # high control, lane targets
            c.rz(11, 0.1 * (i + 1)) # diagonal on a foreign high bit
            c.h(i)
            c.cnot(i, (i + 1) % 7)
        got = self._run_matricized(c, 5)
        np.testing.assert_allclose(got, oracle_state(c), atol=5e-6)
