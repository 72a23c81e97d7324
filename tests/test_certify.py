"""De-correlated large-n certification (tpu_qsim/certify.py).

Proves, by fault injection, that the round-4 cross-engine and QFT-analytic
checks catch the class of bug the inverse round-trip is structurally blind
to: an adjoint-consistent systematic emission error (global conjugation of
every gate matrix in ONE engine)."""

import numpy as np
import pytest

import tpu_qsim as q
import tpu_qsim.apply as ap
from tpu_qsim.certify import (
    _qft_reference_amps,
    cross_engine_max_diff,
    qft_analytic_max_diff,
)
from tpu_qsim.kernels.gridsweeps import GridParams

P = GridParams(rb_bits=3, a_max=2)   # interpret-scale geometry (blk=10)


class TestQftFormula:
    @pytest.mark.parametrize("k", [0, 1, 5, 1023])
    def test_formula_matches_oracle(self, k):
        """Pin the closed form itself against the complex128 oracle."""
        n = 10
        sim = q.CPUReferenceSimulator(n)
        sim.set_state(np.eye(1, 1 << n, k).ravel().astype(np.complex128))
        sim.run(q.qft_circuit(n))
        idx = np.arange(1 << n)
        np.testing.assert_allclose(
            sim.get_state(), _qft_reference_amps(n, k, idx), atol=1e-12
        )


class TestChecksPass:
    def test_cross_engine_agrees_on_healthy_engines(self):
        c = q.random_circuit(13, 60, seed=4)
        d = cross_engine_max_diff(c, interpret=True, grid_params=P)
        assert d < 5e-6, d

    def test_qft_analytic_grid_engine(self):
        d = qft_analytic_max_diff(13, interpret=True, grid_params=P)
        assert d < 5e-6, d

    def test_qft_analytic_xla_engine(self):
        from tpu_qsim.fusion import fuse_circuit
        from tpu_qsim.statevector import build_xla_run_fn

        n = 12
        fn = build_xla_run_fn(
            fuse_circuit(q.qft_circuit(n), 5), np.float32, False
        )
        d = qft_analytic_max_diff(n, run_fn=fn)
        assert d < 5e-6, d


class _ConjugatingEmission:
    """Context manager injecting a systematic adjoint-consistent bug into
    the GRID engine only: every sweep kernel emits conj(U) instead of U.
    The XLA engine is untouched."""

    def __enter__(self):
        import tpu_qsim.kernels.fused_circuit as fc
        import tpu_qsim.kernels.gridsweeps as gs

        self._orig = gs.materialize_ops

        def conj_materialize(gates, *a, **kw):
            conj = [
                fc.PGate(np.conj(g.u), g.qubits, g.classes) for g in gates
            ]
            return self._orig(conj, *a, **kw)

        gs.materialize_ops = conj_materialize
        return self

    def __exit__(self, *exc):
        import tpu_qsim.kernels.gridsweeps as gs

        gs.materialize_ops = self._orig
        return False


class TestFaultInjection:
    """The VERDICT-mandated proof: the injected conjugation bug is caught
    by the new checks but NOT by the inverse round-trip."""

    def _grid_run(self, circuit):
        from tpu_qsim.kernels.gridsweeps import build_grid_sweep_run

        prog = build_grid_sweep_run(
            circuit, np.float32, interpret=True, params=P
        )
        return prog

    def test_round_trip_is_blind_to_conjugation(self):
        c = q.random_circuit(13, 40, seed=6)
        with _ConjugatingEmission():
            fwd = self._grid_run(c)
            inv = self._grid_run(c.inverse())
            x = ap.initial_state(13, np.float32)
            y = np.asarray(ap.to_complex(inv.run(fwd.run(x))))
        # the buggy engine still restores |0...0> exactly
        assert abs(y[0] - 1.0) < 1e-5
        assert np.abs(y[1:]).max() < 1e-5

    def test_cross_engine_catches_conjugation(self):
        c = q.random_circuit(13, 40, seed=6)
        healthy = cross_engine_max_diff(c, interpret=True, grid_params=P)
        with _ConjugatingEmission():
            buggy = cross_engine_max_diff(c, interpret=True, grid_params=P)
        assert healthy < 5e-6
        assert buggy > 1e-2, f"injected bug not caught: {buggy}"

    def test_qft_analytic_catches_conjugation(self):
        healthy = qft_analytic_max_diff(13, interpret=True, grid_params=P)
        with _ConjugatingEmission():
            buggy = qft_analytic_max_diff(13, interpret=True, grid_params=P)
        assert healthy < 5e-6
        assert buggy > 1e-2, f"injected bug not caught: {buggy}"


from tpu_qsim.certify import (  # noqa: E402  (round-4 additions)
    diag_layer_analytic_max_diff,
    permutation_analytic_max_dev,
)


class TestClosedFormChecks:
    """The bench-grade 28q+ analytic checks, pinned at test scale."""

    def test_diag_check_grid_engine(self):
        """The grid engine (interpret mode) agrees with the closed form —
        pins the qubits[0]=MSB convention the formula assumes."""
        d = diag_layer_analytic_max_diff(12, interpret=True, grid_params=P)
        assert d < 5e-6, d

    def test_diag_check_rejects_identity_engine(self):
        """|0...0> is far from the uniform-phase closed form, so a do-
        nothing engine cannot slip through."""
        d = diag_layer_analytic_max_diff(12, run_fn=lambda x: x)
        assert d > 1e-2, d

    def test_permutation_check_grid_engine(self):
        d = permutation_analytic_max_dev(13, interpret=True, grid_params=P)
        assert d < 5e-6, d

    def test_permutation_check_rejects_identity_engine(self):
        d = permutation_analytic_max_dev(13, run_fn=lambda x: x)
        assert d > 0.5  # |0...0> is far from the predicted basis vector


class _QubitOrderBug:
    """Inject a pair-ADDRESSING bug into the grid engine: every 2q gate's
    qubit tuple (and aligned classes) is reversed while the matrix stays —
    control/target of CNOT swap, dense 2q gates transpose their axes.
    Adjoint-consistent (the inverse engine mis-addresses identically) and
    phase-free on symmetric diagonals (cz/cp), so both the round-trip AND
    the diagonal-phase check are structurally blind to it."""

    def __enter__(self):
        import tpu_qsim.kernels.fused_circuit as fc
        import tpu_qsim.kernels.gridsweeps as gs

        self._orig = gs.materialize_ops

        def flip(gates, *a, **kw):
            out = []
            for g in gates:
                if len(g.qubits) == 2:
                    g = fc.PGate(
                        g.u,
                        (g.qubits[1], g.qubits[0]),
                        tuple(reversed(tuple(g.classes))),
                    )
                out.append(g)
            return self._orig(out, *a, **kw)

        gs.materialize_ops = flip
        return self

    def __exit__(self, *exc):
        import tpu_qsim.kernels.gridsweeps as gs

        gs.materialize_ops = self._orig
        return False


class TestClosedFormFaultInjection:
    def test_diag_check_catches_conjugation(self):
        healthy = diag_layer_analytic_max_diff(13, interpret=True, grid_params=P)
        with _ConjugatingEmission():
            buggy = diag_layer_analytic_max_diff(13, interpret=True, grid_params=P)
        assert healthy < 5e-6
        assert buggy > 1e-2, f"injected conjugation not caught: {buggy}"

    def test_permutation_check_catches_addressing_bug(self):
        healthy = permutation_analytic_max_dev(13, interpret=True, grid_params=P)
        with _QubitOrderBug():
            buggy = permutation_analytic_max_dev(13, interpret=True, grid_params=P)
        assert healthy < 5e-6
        assert buggy > 0.5, f"injected addressing bug not caught: {buggy}"

    def test_round_trip_is_blind_to_addressing_bug(self):
        """CNOT/SWAP/X are self-adjoint-consistent under the qubit-order
        flip, so U then U-dagger still restores |0...0> exactly — the
        round-trip cannot see what the permutation check catches."""
        from tpu_qsim.kernels.gridsweeps import build_grid_sweep_run

        c = q.Circuit(13)
        rng = np.random.default_rng(12)
        for _ in range(24):
            kind = int(rng.integers(0, 3))
            if kind == 0:
                c.x(int(rng.integers(0, 13)))
            elif kind == 1:
                a_, b_ = (int(v) for v in rng.choice(13, size=2, replace=False))
                c.cnot(a_, b_)
            else:
                a_, b_ = (int(v) for v in rng.choice(13, size=2, replace=False))
                c.swap(a_, b_)
        with _QubitOrderBug():
            fwd = build_grid_sweep_run(c, np.float32, interpret=True, params=P)
            inv = build_grid_sweep_run(
                c.inverse(), np.float32, interpret=True, params=P
            )
            x = ap.initial_state(13, np.float32)
            y = np.asarray(ap.to_complex(inv.run(fwd.run(x))))
        assert abs(y[0] - 1.0) < 1e-5
        assert np.abs(y[1:]).max() < 1e-5
