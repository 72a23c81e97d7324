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
