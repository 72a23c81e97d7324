"""Segmented (>VMEM) execution tests in interpret mode: permutation
primitive, segment planner invariants, and end-to-end differential checks
vs the NumPy oracle with small local_bits so the grid machinery is
exercised at test-size states."""

import numpy as np
import pytest

import tpu_qsim.apply as ap
from tpu_qsim import Circuit, CPUReferenceSimulator, ghz_circuit, random_circuit
from tpu_qsim.kernels.segmented import build_segmented_run
from tpu_qsim.schedule import plan_segments

from conftest import random_state


class TestPermuteQubits:
    def _ref_permute(self, psi, src):
        """new index bit i = old index bit src[i], dense reference."""
        n = len(src)
        out = np.zeros_like(psi)
        for i in range(len(psi)):
            j = 0
            for b in range(n):
                j |= ((i >> b) & 1) << 0 if False else 0
            # build old index j from new index i
            j = 0
            for b in range(n):
                j |= ((i >> b) & 1) << src[b]
            out[i] = psi[j]
        return out

    @pytest.mark.parametrize("src_high", [
        (8, 7, 9),     # rotate bits 7,8,9
        (9, 8, 7),     # reverse
        (7, 9, 8),
    ])
    def test_against_dense_reference(self, src_high, rng):
        n = 10
        psi = random_state(n, rng).astype(np.complex64)
        src = tuple(range(7)) + src_high
        state = ap.from_complex(psi, np.float32)
        out = ap.to_complex(ap.permute_qubits(state, src))
        np.testing.assert_allclose(out, self._ref_permute(psi, src), atol=1e-7)

    def test_identity_is_noop(self, rng):
        n = 9
        psi = random_state(n, rng)
        state = ap.from_complex(psi, np.float64)
        out = ap.to_complex(ap.permute_qubits(state, tuple(range(n))))
        np.testing.assert_allclose(out, psi, atol=1e-15)

    def test_involution(self, rng):
        n = 11
        psi = random_state(n, rng).astype(np.complex64)
        src = tuple(range(7)) + (10, 9, 8, 7)  # reverse high bits
        inv = list(range(n))
        for i, s in enumerate(src):
            inv[s] = i
        state = ap.from_complex(psi, np.float32)
        roundtrip = ap.permute_qubits(
            ap.permute_qubits(state, src), tuple(inv)
        )
        np.testing.assert_allclose(ap.to_complex(roundtrip), psi, atol=1e-7)

    def test_lane_bit_move_rejected(self):
        state = ap.initial_state(8, np.float32)
        src = (1, 0) + tuple(range(2, 8))
        with pytest.raises(ValueError, match="lane bits"):
            ap.permute_qubits(state, src)


class TestPlanner:
    def test_local_circuit_single_segment(self):
        # all gates under local_bits -> one segment, no permutations
        c = Circuit(12)
        for i in range(20):
            c.h(i % 9).cnot(i % 9, (i + 1) % 9)
        segs, restore = plan_segments(c, local_bits=10)
        assert len(segs) == 1
        assert segs[0].perm_src is None
        assert restore == tuple(range(12))

    def test_nonlocal_gates_trigger_relocation(self):
        c = Circuit(12).h(11).cnot(11, 0).h(10)
        segs, restore = plan_segments(c, local_bits=10)
        assert segs[0].perm_src is not None
        for seg in segs:
            for g in seg.gates:
                assert all(b < 10 for b in g.qubits)

    @pytest.mark.parametrize("seed", range(5))
    def test_physical_qubits_always_local(self, seed):
        c = random_circuit(13, 150, seed=seed)
        segs, restore = plan_segments(c, local_bits=10)
        total = 0
        for seg in segs:
            for g in seg.gates:
                assert all(b < 10 for b in g.qubits)
                assert len(set(g.qubits)) == len(g.qubits)
            total += len(seg.gates)
        assert total == 150

    def test_segment_count_is_modest(self):
        # a random 13q circuit must not degenerate to 1 segment per gate
        c = random_circuit(13, 200, seed=3)
        segs, _ = plan_segments(c, local_bits=10)
        assert len(segs) < 40


class TestSegmentedExecution:
    @pytest.mark.parametrize("seed", range(4))
    def test_random_circuits_vs_oracle(self, seed):
        n = 12
        c = random_circuit(n, 80, seed=seed)
        fn = build_segmented_run(c, np.float32, local_bits=10, interpret=True)
        out = ap.to_complex(fn(ap.initial_state(n, np.float32)))
        ora = CPUReferenceSimulator(n)
        ora.run(c)
        np.testing.assert_allclose(out, ora.get_state(), atol=5e-5)

    @pytest.mark.parametrize("seed", range(3))
    def test_gather_fold_vs_oracle(self, seed):
        # local_bits=13 activates the production gather path (relocations
        # folded into the input index map, chunks >= 8 rows) at test size
        n = 15
        c = random_circuit(n, 60, seed=seed)
        fn = build_segmented_run(c, np.float32, local_bits=13, interpret=True)
        out = ap.to_complex(fn(ap.initial_state(n, np.float32)))
        ora = CPUReferenceSimulator(n)
        ora.run(c)
        np.testing.assert_allclose(out, ora.get_state(), atol=5e-5)

    def test_gather_fold_is_used(self):
        # the planner with the gather victim zone must produce relocations
        # whose chunk budget clears the tile floor (i.e. the fold engages)
        from tpu_qsim.kernels.segmented import (
            GATHER_SWAP_MIN,
            MIN_GATHER_CHUNK_BITS,
            _gather_chunk_bits,
        )

        c = random_circuit(15, 120, seed=1)
        segs, _ = plan_segments(c, 13, swap_min=GATHER_SWAP_MIN)
        relocs = [s.perm_src for s in segs if s.perm_src is not None]
        assert relocs, "expected at least one relocation at 15q/l13"
        for src in relocs:
            assert _gather_chunk_bits(src, 13) >= MIN_GATHER_CHUNK_BITS

    def test_ghz_spanning_all_bits(self):
        n = 13
        c = ghz_circuit(n)
        fn = build_segmented_run(c, np.float32, local_bits=10, interpret=True)
        out = ap.to_complex(fn(ap.initial_state(n, np.float32)))
        expected = np.zeros(1 << n, dtype=complex)
        expected[0] = expected[-1] = 1 / np.sqrt(2)
        np.testing.assert_allclose(out, expected, atol=1e-6)

    def test_all_gate_types(self, rng):
        n = 12
        c = (Circuit(n).h(11).t(10).cnot(3, 11).rz(9, 0.4).toffoli(0, 10, 11)
             .swap(2, 11).cry(11, 1, 1.2).sdg(10).y(9).crz(8, 11, 0.9)
             .cz(1, 10).rx(11, 2.2))
        psi0 = random_state(n, rng).astype(np.complex64)
        fn = build_segmented_run(c, np.float32, local_bits=10, interpret=True)
        out = ap.to_complex(fn(ap.from_complex(psi0, np.float32)))
        ora = CPUReferenceSimulator(n)
        ora.set_state(psi0)
        ora.run(c)
        np.testing.assert_allclose(out, ora.get_state(), atol=5e-6)
