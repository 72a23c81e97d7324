"""Pallas kernel tests (interpret mode on CPU): the whole-circuit
VMEM-resident kernel must agree elementwise with the XLA engine and the
NumPy oracle — the analog of the reference's optimized-vs-standard kernel
suite (tests/test_optimized_gates.cu), run per gate type, per qubit
position (lane bits, row bits, mixed), and on random circuits."""

import numpy as np
import pytest

from tpu_qsim import Circuit, CPUReferenceSimulator, SimConfig, StateVectorSimulator
from tpu_qsim import ghz_circuit, random_circuit
from tpu_qsim.kernels.fused_circuit import build_pallas_run

from conftest import random_state

N = 10  # 3 row bits + 7 lane bits
XLA_CFG = SimConfig(dtype="complex64", use_pallas=False)


def pallas_apply(circuit, psi0=None):
    import tpu_qsim.apply as ap

    fn = build_pallas_run(circuit, np.float32, interpret=True)
    if psi0 is None:
        state = ap.initial_state(circuit.num_qubits, np.float32)
    else:
        state = ap.from_complex(psi0, np.float32)
    return ap.to_complex(fn(state))


def xla_apply(circuit, psi0=None):
    sim = StateVectorSimulator(circuit.num_qubits, XLA_CFG)
    if psi0 is not None:
        sim.set_state(psi0)
    sim.run(circuit)
    return sim.get_state()


SINGLE_GATES = [
    ("x", None), ("y", None), ("z", None), ("h", None), ("s", None),
    ("sdg", None), ("t", None), ("tdg", None), ("rx", 0.731), ("ry", 1.42),
    ("rz", 2.2), ("p", 0.3),
]


class TestPallasSingleGates:
    @pytest.mark.parametrize("name,param", SINGLE_GATES)
    @pytest.mark.parametrize("q", [0, 3, 6, 7, 8, 9])  # lane + row bits
    def test_gate_every_region(self, name, param, q, rng):
        psi0 = random_state(N, rng).astype(np.complex64)
        c = Circuit(N).add(name, q, param=param)
        np.testing.assert_allclose(
            pallas_apply(c, psi0), xla_apply(c, psi0), atol=2e-6
        )


class TestPallasMultiQubitGates:
    PAIRS = [(0, 1), (5, 6), (0, 9), (7, 8), (9, 2), (6, 7)]  # ll, lr, rr mixes

    @pytest.mark.parametrize("name,param",
                             [("cnot", None), ("cz", None), ("swap", None),
                              ("cry", 0.9), ("crz", 1.7)])
    @pytest.mark.parametrize("pair", PAIRS)
    def test_two_qubit(self, name, param, pair, rng):
        psi0 = random_state(N, rng).astype(np.complex64)
        c = Circuit(N).add(name, *pair, param=param)
        np.testing.assert_allclose(
            pallas_apply(c, psi0), xla_apply(c, psi0), atol=2e-6
        )

    @pytest.mark.parametrize("trip", [(0, 1, 2), (7, 8, 9), (0, 7, 3), (9, 1, 8)])
    def test_toffoli(self, trip, rng):
        psi0 = random_state(N, rng).astype(np.complex64)
        c = Circuit(N).toffoli(*trip)
        np.testing.assert_allclose(
            pallas_apply(c, psi0), xla_apply(c, psi0), atol=2e-6
        )


class TestPallasCircuits:
    def test_ghz(self):
        c = ghz_circuit(N)
        out = pallas_apply(c)
        expected = np.zeros(1 << N, dtype=complex)
        expected[0] = expected[-1] = 1 / np.sqrt(2)
        np.testing.assert_allclose(out, expected, atol=1e-6)

    @pytest.mark.parametrize("seed", range(5))
    def test_random_circuits_vs_oracle(self, seed):
        c = random_circuit(N, 60, seed=seed)
        ora = CPUReferenceSimulator(N)
        ora.run(c)
        np.testing.assert_allclose(pallas_apply(c), ora.get_state(), atol=5e-5)

    def test_all_gate_types_mixed(self, rng):
        psi0 = random_state(N, rng).astype(np.complex64)
        c = (Circuit(N).h(0).t(8).cnot(3, 9).rz(7, 0.4).toffoli(0, 8, 4)
             .swap(2, 9).cry(9, 1, 1.2).sdg(5).y(6).crz(4, 0, 0.9).z(7)
             .cz(1, 8).rx(0, 2.2).ry(9, 0.1).x(2).tdg(3).p(6, 0.5))
        np.testing.assert_allclose(
            pallas_apply(c, psi0), xla_apply(c, psi0), atol=5e-6
        )


class TestDispatchIntegration:
    def test_simulator_uses_pallas_when_configured(self):
        cfg = SimConfig(dtype="complex64", use_pallas=True, pallas_interpret=True)
        sim = StateVectorSimulator(N, cfg)
        sim.run(ghz_circuit(N))
        p = sim.get_probabilities()
        assert p[0] == pytest.approx(0.5, abs=1e-6)
        assert p[-1] == pytest.approx(0.5, abs=1e-6)

    def test_out_of_range_sizes_fall_back(self):
        # n below the Pallas window must silently use the XLA engine
        cfg = SimConfig(dtype="complex64", use_pallas=True, pallas_interpret=True)
        sim = StateVectorSimulator(4, cfg)
        sim.run(ghz_circuit(4))
        p = sim.get_probabilities()
        assert p[0] == pytest.approx(0.5, abs=1e-6)

    def test_c128_falls_back(self):
        cfg = SimConfig(dtype="complex128", use_pallas=True, pallas_interpret=True)
        sim = StateVectorSimulator(N, cfg)
        sim.run(ghz_circuit(N))
        assert sim.get_probabilities()[0] == pytest.approx(0.5, abs=1e-12)


class TestDeepCircuitStability:
    def test_500_gates_vs_oracle(self):
        # f32 error accumulation through a deep kernel stays bounded
        c = random_circuit(N, 500, seed=77)
        ora = CPUReferenceSimulator(N)
        ora.run(c)
        out = pallas_apply(c)
        assert np.max(np.abs(out - ora.get_state())) < 2e-4
        assert abs(np.sum(np.abs(out) ** 2) - 1.0) < 1e-4


def dense_apply(psi, u, qubits, n):
    """Dense tensor oracle: apply ``u`` on ``qubits`` (qubits[0] = matrix
    MSB) to a 2^n state — shares no reshape-view machinery with the
    emission under test."""
    k = len(qubits)
    t = psi.reshape([2] * n)                    # axis j = bit n-1-j
    axes = [n - 1 - q for q in qubits]
    t2 = np.tensordot(
        u.reshape((2,) * (2 * k)), t, axes=(list(range(k, 2 * k)), axes)
    )
    return np.moveaxis(t2, range(k), axes).reshape(-1)


class TestDirectRowEmission:
    """Unit tests of the slicing-free direct-row emission functions
    (_emit_1q_row/_emit_2q_row) at production-regime qubit positions
    (>= _DIRECT_ROW_MIN = 10) — pure jnp functions, testable on CPU
    without Pallas (round-2 advisor item: the shrunk sweep-test geometry
    never reached these paths)."""

    def _planes(self, psi, n):
        import jax.numpy as jnp

        rows = 1 << (n - 7)
        xr = jnp.asarray(psi.real.astype(np.float32).reshape(rows, 128))
        xi = jnp.asarray(psi.imag.astype(np.float32).reshape(rows, 128))
        return xr, xi

    def _collect(self, yr, yi):
        return (
            np.asarray(yr).ravel().astype(np.float64)
            + 1j * np.asarray(yi).ravel().astype(np.float64)
        )

    @pytest.mark.parametrize("name,param", [
        ("h", None), ("x", None), ("y", None), ("rz", 0.83), ("ry", 1.17),
        ("s", None), ("t", None),
    ])
    @pytest.mark.parametrize("q", [10, 11])
    def test_1q_row_vs_dense_oracle(self, name, param, q, rng):
        from tpu_qsim.gates import gate_matrix
        from tpu_qsim.kernels.fused_circuit import _emit_1q_row

        n = 12
        psi = random_state(n, rng)
        u = gate_matrix(name, param)
        xr, xi = self._planes(psi, n)
        out = self._collect(*_emit_1q_row(xr, xi, u, q))
        np.testing.assert_allclose(out, dense_apply(psi, u, (q,), n), atol=2e-6)

    @pytest.mark.parametrize("name,param", [
        ("cnot", None), ("cz", None), ("swap", None), ("cry", 0.6),
        ("cp", 0.9),
    ])
    @pytest.mark.parametrize("qubits", [(10, 11), (12, 10), (11, 12)])
    def test_2q_row_vs_dense_oracle(self, name, param, qubits, rng):
        from tpu_qsim.gates import gate_matrix
        from tpu_qsim.kernels.fused_circuit import _emit_2q_row

        n = 13
        psi = random_state(n, rng)
        u = gate_matrix(name, param)
        xr, xi = self._planes(psi, n)
        out = self._collect(*_emit_2q_row(xr, xi, u, qubits))
        np.testing.assert_allclose(
            out, dense_apply(psi, u, qubits, n), atol=2e-6
        )


class TestTopWindow:
    """The "rowt" MXU window (one leading-axis (128,128)@(128,R) matmul
    absorbing a run of gates on the top 7 kernel bits) must agree with the
    XLA engine — in both matmul pass modes. Window formation is forced by
    shrinking the mmt entry of the window cost table (production breakeven
    is ~10 direct-row singles)."""

    def _run(self, c, psi0, dot_mode="highest"):
        import tpu_qsim.kernels.fused_circuit as fc

        old_cost, old_dot = fc._WINDOW_COST, fc.WINDOW_DOT
        fc._WINDOW_COST = {**old_cost, "mmt": (2.0, 2.0)}
        fc.WINDOW_DOT = dot_mode
        try:
            return pallas_apply(c, psi0)
        finally:
            fc._WINDOW_COST, fc.WINDOW_DOT = old_cost, old_dot

    def _window_circuit(self, n):
        # >= 10 gates confined to the top-7 group [n-7, n), mixing dense,
        # diagonal, controlled, and cross-bit 2q traffic
        b = n - 7
        c = Circuit(n)
        c.h(b).x(b + 1).ry(b + 2, 0.7).h(b + 6).t(b + 3)
        c.cnot(b + 1, b).crz(b + 6, b + 2, 0.5).swap(b, b + 4)
        c.rz(b + 5, 1.1).h(b + 4).cnot(b + 2, b + 6).s(b)
        return c

    @pytest.mark.parametrize("n", [15, 16, 17])
    def test_window_vs_xla(self, n, rng):
        psi0 = random_state(n, rng).astype(np.complex64)
        c = self._window_circuit(n)
        got = self._run(c, psi0)
        np.testing.assert_allclose(got, xla_apply(c, psi0), atol=2e-6)

    def test_window_plans_as_mmt(self):
        import tpu_qsim.kernels.fused_circuit as fc

        old = fc._WINDOW_COST
        fc._WINDOW_COST = {**old, "mmt": (2.0, 2.0)}
        try:
            ops, table = fc.materialize_ops(
                self._window_circuit(16).gates, n_bits=16
            )
        finally:
            fc._WINDOW_COST = old
        kinds = [op[0] for op in ops]
        assert "mmt" in kinds
        assert table is not None

    def test_bf16x3_mode_accuracy(self, rng):
        # the 3-pass split must stay in the 1e-6 class on normalized states
        n = 16
        psi0 = random_state(n, rng).astype(np.complex64)
        c = self._window_circuit(n)
        got = self._run(c, psi0, dot_mode="bf16x3")
        np.testing.assert_allclose(got, xla_apply(c, psi0), atol=5e-6)

    def test_mixed_with_low_gates_vs_oracle(self, rng):
        # windows must interleave correctly with lane/rowb/cross-class gates
        n = 16
        psi0 = random_state(n, rng).astype(np.complex64)
        c = Circuit(n)
        c.h(0).cnot(3, 12).h(14).x(15).cnot(14, 9).ry(13, 0.4)
        c.h(10).cnot(15, 14).t(12).swap(2, 5).crz(9, 15, 0.8).h(11)
        got = self._run(c, psi0)
        np.testing.assert_allclose(got, xla_apply(c, psi0), atol=2e-6)


class TestMerge1qChains:
    """merge_1q_chains: commute-aware same-qubit 1q folding (the compute
    cut of round 3c — every emitted gate is plane-ops over the whole
    state, so fewer gates is faster; docs/PERF_NOTES.md §10)."""

    def _compose_dense(self, pgates, n):
        from tpu_qsim.fusion import expand_matrix

        group = tuple(range(n - 1, -1, -1))
        u = np.eye(1 << n, dtype=np.complex128)
        for g in pgates:
            u = expand_matrix(g.u, g.qubits, group) @ u
        return u

    def test_products_preserved_random(self):
        from tpu_qsim.kernels.fused_circuit import as_pgates, merge_1q_chains

        for seed in (0, 1, 2):
            c = random_circuit(6, 40, seed=seed)
            orig = as_pgates(c.gates)
            merged = merge_1q_chains(orig)
            assert len(merged) < len(orig)          # the mixes always fold
            np.testing.assert_allclose(
                self._compose_dense(merged, 6),
                self._compose_dense(orig, 6),
                atol=1e-12,
            )

    def test_identity_elision_exact_only(self):
        from tpu_qsim.kernels.fused_circuit import as_pgates, merge_1q_chains

        c = Circuit(2)
        c.h(0).h(0)                  # = I: elided
        c.s(1).s(1)                  # = Z: kept (diag, NOT identity)
        merged = merge_1q_chains(as_pgates(c.gates))
        assert len(merged) == 1
        np.testing.assert_allclose(
            merged[0].u, np.diag([1.0, -1.0]), atol=1e-12
        )

    def test_bench_h_workload_folds_5_to_1(self):
        # bench._bench_h_throughput's documented execution model: 100
        # round-robin H's on 20 qubits (5 per qubit, all mutually
        # commuting across qubits) fold to exactly one H per qubit.
        from tpu_qsim.kernels.fused_circuit import as_pgates, merge_1q_chains

        c = Circuit(20)
        for i in range(100):
            c.h(i % 20)
        merged = merge_1q_chains(as_pgates(c.gates))
        assert len(merged) == 20
        assert sorted(g.qubits[0] for g in merged) == list(range(20))
        for g in merged:
            np.testing.assert_allclose(
                g.u, np.array([[1, 1], [1, -1]]) / np.sqrt(2), atol=1e-12
            )

    def test_blocked_by_noncommuting_toucher(self):
        from tpu_qsim.kernels.fused_circuit import as_pgates, merge_1q_chains

        c = Circuit(2)
        c.h(0)
        c.cnot(0, 1)   # H then CNOT control on 0: no fold across it
        c.h(0)
        merged = merge_1q_chains(as_pgates(c.gates))
        assert len(merged) == 3

    def test_folds_across_commuting_toucher(self):
        from tpu_qsim.kernels.fused_circuit import as_pgates, merge_1q_chains

        c = Circuit(2)
        c.rz(0, 0.3)
        c.cnot(0, 1)   # Rz commutes with the CNOT control on qubit 0
        c.rz(0, -0.3)  # folds with the first rz -> exact identity
        merged = merge_1q_chains(as_pgates(c.gates))
        assert len(merged) == 1    # only the cnot remains
        assert merged[0].u.shape == (4, 4)

    def test_kernel_path_matches_oracle_after_merge(self):
        c = random_circuit(N, 120, seed=33)
        ours = pallas_apply(c)
        ora = CPUReferenceSimulator(N)
        ora.run(c)
        assert np.abs(np.asarray(ours) - ora.state).max() < 5e-6
