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
