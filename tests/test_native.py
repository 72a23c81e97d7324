"""Native C++ planner tests: build, then differentially verify against the
pure-Python planner on many circuits (the native/Python pair is this repo's
analog of the reference's optimized-vs-standard kernel differential suite)."""

import numpy as np
import pytest

from tpu_qsim import Circuit, random_circuit
from tpu_qsim import native
from tpu_qsim.fusion import plan_groups


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available() and not native.build(verbose=True):
        pytest.skip("native toolchain unavailable")


def python_plan(circuit, max_k):
    """Run the pure-Python planner by bypassing the native dispatch."""
    import tpu_qsim.fusion as fusion_mod

    orig = native.available
    try:
        native.available = lambda: False
        return plan_groups(circuit, max_k)
    finally:
        native.available = orig


class TestNativePlanner:
    @pytest.mark.parametrize("seed", range(10))
    @pytest.mark.parametrize("max_k", [2, 3, 5])
    def test_matches_python_planner(self, seed, max_k):
        c = random_circuit(8, 120, seed=seed)
        nat = native.plan_groups_native(c.num_qubits,
                                        [g.qubits for g in c.gates], max_k)
        py = python_plan(c, max_k)
        assert nat == py

    def test_structured_circuits(self):
        for c in (Circuit(3).h(0).cnot(0, 1).toffoli(0, 1, 2),
                  Circuit(1).h(0).h(0).h(0),
                  Circuit(6).h(0).h(5).cnot(2, 3).cnot(0, 5)):
            nat = native.plan_groups_native(c.num_qubits,
                                            [g.qubits for g in c.gates], 5)
            assert nat == python_plan(c, 5)

    def test_empty_circuit(self):
        assert native.plan_groups_native(3, [], 5) == []

    def test_invalid_qubit_rejected(self):
        with pytest.raises(ValueError):
            native.plan_groups_native(2, [(5,)], 5)


class TestNativeDepth:
    @pytest.mark.parametrize("seed", range(5))
    def test_matches_python_depth(self, seed):
        c = random_circuit(6, 80, seed=seed)
        assert native.circuit_depth_native(
            c.num_qubits, [g.qubits for g in c.gates]
        ) == c.depth()

    def test_empty(self):
        assert native.circuit_depth_native(4, []) == 0


class TestNativeHistogram:
    def test_matches_numpy(self, rng):
        samples = rng.integers(0, 16, size=10_000).astype(np.int32)
        counts = native.histogram_native(samples, 16)
        np.testing.assert_array_equal(counts, np.bincount(samples, minlength=16))

    def test_out_of_range_ignored(self):
        samples = np.array([0, 1, 99, -3, 1], dtype=np.int32)
        counts = native.histogram_native(samples, 4)
        np.testing.assert_array_equal(counts, [1, 2, 0, 0])


class TestNativeGridPlanner:
    """Differential: native qsim_plan_grid_sweeps vs the pure-Python
    frontier-scheduling planner in kernels/gridsweeps.py. Sweeps must match
    exactly: same partition, same within-sweep emission order, same active
    sets (the executor builds index maps from both)."""

    def _both(self, circuit, params=None, max_gates=56):
        from tpu_qsim.kernels.gridsweeps import GridParams, plan_grid_sweeps

        params = params or GridParams()
        nat = plan_grid_sweeps(circuit, params=params, max_gates=max_gates)
        orig = native.available
        try:
            native.available = lambda: False
            py = plan_grid_sweeps(circuit, params=params, max_gates=max_gates)
        finally:
            native.available = orig
        return nat, py

    def _assert_same(self, nat, py):
        assert len(nat) == len(py)
        for sn, sp in zip(nat, py):
            assert sn.active == sp.active
            assert len(sn.gates) == len(sp.gates)
            for gn, gp in zip(sn.gates, sp.gates):
                assert gn.qubits == gp.qubits
                np.testing.assert_array_equal(gn.u, gp.u)

    @pytest.mark.parametrize("seed", range(8))
    @pytest.mark.parametrize("n", [22, 26, 30])
    def test_matches_python_random(self, seed, n):
        c = random_circuit(n, 120, seed=seed)
        self._assert_same(*self._both(c))

    @pytest.mark.parametrize("n", [22, 27])
    def test_matches_python_structured(self, n):
        from tpu_qsim import ghz_circuit, qft_circuit

        for c in (ghz_circuit(n), qft_circuit(n)):
            self._assert_same(*self._both(c))

    def test_swap_decomposition_and_tight_caps(self):
        # swaps across the block boundary decompose into 3 cnots first;
        # a tiny max_gates forces many sweep closures
        c = Circuit(24)
        for i in range(10):
            c.h(i % 24).swap(i % 24, (i + 13) % 24).cnot(2, 23)
        self._assert_same(*self._both(c, max_gates=4))

    def test_over_wide_gate_rejected_by_both(self):
        from tpu_qsim.gates import register_gate
        from tpu_qsim.kernels.gridsweeps import plan_grid_sweeps

        rng = np.random.default_rng(3)
        m = rng.normal(size=(32, 32)) + 1j * rng.normal(size=(32, 32))
        q, _ = np.linalg.qr(m)
        name = "dense5_nat_test"
        try:
            register_gate(name, q, num_qubits=5)
        except ValueError:
            pass  # already registered by an earlier parametrization
        c = Circuit(27)
        c.add(name, 21, 22, 23, 24, 25)
        with pytest.raises(ValueError, match="grid engine stacks"):
            plan_grid_sweeps(c)

    def test_empty_gate_list(self):
        nat, py = self._both(Circuit(22))
        assert nat == [] and py == []
