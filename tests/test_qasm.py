"""OpenQASM 2.0 import/export (tpu_qsim/qasm.py).

The reference has no interchange format; these tests pin the migration
path: qelib1 text -> Circuit -> amplitudes (vs the NumPy oracle), and
Circuit -> QASM -> Circuit round-trips.
"""

import math

import numpy as np
import pytest

import tpu_qsim as q
from tpu_qsim.qasm import from_qasm, to_qasm


def _state(circuit: q.Circuit) -> np.ndarray:
    sim = q.CPUReferenceSimulator(circuit.num_qubits)
    sim.run(circuit)
    return sim.state


def _assert_same_state(a: q.Circuit, b: q.Circuit, atol=1e-12):
    np.testing.assert_allclose(_state(a), _state(b), atol=atol)


def _assert_same_up_to_phase(a: q.Circuit, b: q.Circuit, atol=1e-12):
    sa, sb = _state(a), _state(b)
    k = int(np.argmax(np.abs(sa)))
    phase = sb[k] / sa[k]
    assert abs(abs(phase) - 1.0) < atol
    np.testing.assert_allclose(sa * phase, sb, atol=atol)


BELL = """
OPENQASM 2.0;
include "qelib1.inc";
qreg q[2];
h q[0];
cx q[0],q[1];
"""


class TestImport:
    def test_bell(self):
        c = from_qasm(BELL)
        assert c.num_qubits == 2
        _assert_same_state(c, q.bell_circuit())

    def test_gate_name_mapping(self):
        c = from_qasm(
            "OPENQASM 2.0; qreg q[3];\n"
            "id q[0]; x q[0]; y q[1]; z q[2]; h q[0]; s q[1]; sdg q[1];\n"
            "t q[2]; tdg q[2]; cz q[0],q[1]; swap q[1],q[2];\n"
            "ccx q[0],q[1],q[2];"
        )
        names = [g.name for g in c.gates]
        assert names == ["i", "x", "y", "z", "h", "s", "sdg", "t", "tdg",
                         "cz", "swap", "toffoli"]

    def test_parameterized_and_angle_expressions(self):
        c = from_qasm(
            "OPENQASM 2.0; qreg q[2];\n"
            "rx(pi/2) q[0]; ry(-pi/4) q[0]; rz(3*pi/2) q[1];\n"
            "u1(0.25) q[0]; cu1(pi/8) q[0],q[1]; crz(1e-1) q[0],q[1];\n"
            "cry((pi+1)/2) q[0],q[1];"
        )
        got = [(g.name, g.param) for g in c.gates]
        want = [
            ("rx", math.pi / 2), ("ry", -math.pi / 4), ("rz", 3 * math.pi / 2),
            ("p", 0.25), ("cp", math.pi / 8), ("crz", 0.1),
            ("cry", (math.pi + 1) / 2),
        ]
        for (gn, gp), (wn, wp) in zip(got, want):
            assert gn == wn
            assert gp == pytest.approx(wp, abs=1e-15)

    def test_multiple_qregs_flatten_with_offsets(self):
        c = from_qasm(
            "OPENQASM 2.0; qreg a[2]; qreg b[3];\n"
            "x a[1]; x b[0]; cx a[0],b[2];"
        )
        assert c.num_qubits == 5
        assert [g.qubits for g in c.gates] == [(1,), (2,), (0, 4)]

    def test_whole_register_broadcast(self):
        c = from_qasm("OPENQASM 2.0; qreg q[4]; h q;")
        assert [(g.name, g.qubits) for g in c.gates] == [
            ("h", (0,)), ("h", (1,)), ("h", (2,)), ("h", (3,))
        ]

    def test_two_register_broadcast_is_pairwise(self):
        c = from_qasm("OPENQASM 2.0; qreg a[3]; qreg b[3]; cx a,b;")
        assert [g.qubits for g in c.gates] == [(0, 3), (1, 4), (2, 5)]

    def test_fixed_control_broadcast_target(self):
        c = from_qasm("OPENQASM 2.0; qreg a[2]; qreg b[2]; cx a[0],b;")
        assert [g.qubits for g in c.gates] == [(0, 2), (0, 3)]

    def test_barrier_and_include_ignored(self):
        c = from_qasm(
            'OPENQASM 2.0; include "qelib1.inc"; qreg q[2];\n'
            "h q[0]; barrier q; cx q[0],q[1];"
        )
        assert len(c) == 2

    def test_comments_stripped(self):
        c = from_qasm(
            "// header comment\nOPENQASM 2.0;\nqreg q[1]; // reg\nx q[0]; // gate\n"
        )
        assert [g.name for g in c.gates] == ["x"]

    def test_u3_matches_qiskit_matrix_up_to_phase(self):
        theta, phi, lam = 0.7, -0.3, 1.9
        c = from_qasm(f"OPENQASM 2.0; qreg q[1]; h q[0]; u3({theta},{phi},{lam}) q[0];")
        # dense reference: Qiskit U3 convention
        u = np.array([
            [math.cos(theta / 2), -np.exp(1j * lam) * math.sin(theta / 2)],
            [np.exp(1j * phi) * math.sin(theta / 2),
             np.exp(1j * (phi + lam)) * math.cos(theta / 2)],
        ])
        h = np.array([[1, 1], [1, -1]]) / math.sqrt(2)
        want = u @ h @ np.array([1.0, 0.0])
        got = _state(c)
        k = int(np.argmax(np.abs(want)))
        np.testing.assert_allclose(got * (want[k] / got[k]), want, atol=1e-12)

    def test_u2_is_u3_half_pi(self):
        phi, lam = 0.4, -1.1
        a = from_qasm(f"OPENQASM 2.0; qreg q[1]; u2({phi},{lam}) q[0];")
        b = from_qasm(f"OPENQASM 2.0; qreg q[1]; u3(pi/2,{phi},{lam}) q[0];")
        _assert_same_up_to_phase(a, b)

    def test_measure_rejected_by_default(self):
        src = "OPENQASM 2.0; qreg q[1]; creg c[1]; h q[0]; measure q[0] -> c[0];"
        with pytest.raises(ValueError, match="measure"):
            from_qasm(src)
        c = from_qasm(src, ignore_measurements=True)
        assert [g.name for g in c.gates] == ["h"]

    @pytest.mark.parametrize("src,msg", [
        ("OPENQASM 3.0; qreg q[1]; x q[0];", "2.0"),
        ("OPENQASM 2.0; qreg q[1]; reset q[0];", "unsupported"),
        ("OPENQASM 2.0; qreg q[1]; gate foo a { x a; } foo q[0];", "gate"),
        ("OPENQASM 2.0; qreg q[1]; frobnicate q[0];", "unsupported QASM gate"),
        ("OPENQASM 2.0; qreg q[1]; x q[3];", "out of range"),
        ("OPENQASM 2.0; qreg q[1]; x r[0];", "unknown qubit"),
        ("OPENQASM 2.0; qreg q[1]; rx(bad+1) q[0];", "angle"),
        ("OPENQASM 2.0; qreg q[1]; rx() q[0];", "parameter"),
        ("OPENQASM 2.0; x q[0];", "unknown qubit"),
        ("OPENQASM 2.0; qreg a[2]; qreg b[3]; cx a,b;", "mismatched"),
        ("OPENQASM 2.0; qreg q[1]; rx(__import__) q[0];", "angle"),
    ])
    def test_rejections(self, src, msg):
        with pytest.raises(ValueError, match=msg):
            from_qasm(src)

    def test_no_qreg_rejected(self):
        with pytest.raises(ValueError, match="no qreg"):
            from_qasm("OPENQASM 2.0;")


class TestExport:
    def test_roundtrip_every_exportable_gate(self):
        c = (
            q.Circuit(3)
            .i(0).x(0).y(1).z(2).h(0).s(1).sdg(1).t(2).tdg(2)
            .rx(0, 0.3).ry(1, -0.7).rz(2, 2.5).p(0, 0.9)
            .cnot(0, 1).cz(1, 2).swap(0, 2).cry(0, 1, 0.4).crz(1, 2, -0.2)
            .cp(0, 2, 1.1).toffoli(0, 1, 2)
        )
        rt = from_qasm(to_qasm(c))
        assert rt.signature() == c.signature()
        _assert_same_state(c, rt)

    def test_roundtrip_factories(self):
        for c in (q.bell_circuit(), q.ghz_circuit(5), q.qft_circuit(4),
                  q.random_circuit(6, 40, seed=7)):
            _assert_same_state(c, from_qasm(to_qasm(c)))

    def test_mcz3_exports_as_ccx_identity(self):
        c = q.Circuit(3).h(0).h(1).h(2).mcz(0, 1, 2)
        text = to_qasm(c)
        assert "ccx" in text and "mcz" not in text
        _assert_same_state(c, from_qasm(text))

    def test_wide_mcz_has_no_qasm2_form(self):
        c = q.Circuit(4).mcz(0, 1, 2, 3)
        with pytest.raises(ValueError, match="mcz4"):
            to_qasm(c)

    def test_header_and_spellings(self):
        text = to_qasm(q.Circuit(2).i(0).p(1, 0.5).cnot(0, 1))
        assert text.startswith('OPENQASM 2.0;\ninclude "qelib1.inc";\nqreg q[2];')
        assert "id q[0];" in text and "u1(0.5) q[0]" not in text  # p is on qubit 1
        assert "u1(0.5) q[1];" in text and "cx q[0],q[1];" in text


class TestEndToEnd:
    def test_qasm_circuit_runs_on_simulator(self):
        sim = q.StateVectorSimulator(2)
        sim.run(from_qasm(BELL))
        probs = sim.get_probabilities()
        np.testing.assert_allclose(probs, [0.5, 0, 0, 0.5], atol=1e-6)

    def test_file_roundtrip(self, tmp_path):
        from tpu_qsim.qasm import from_qasm_file

        p = tmp_path / "bell.qasm"
        p.write_text(to_qasm(q.bell_circuit()))
        _assert_same_state(q.bell_circuit(), from_qasm_file(str(p)))


class TestAdviceRegressions:
    """Round-4 advisor findings (ADVICE.md): NumPy-scalar params, builtin U,
    division-by-zero angles."""

    def test_numpy_scalar_param_exports_valid_qasm(self):
        c = q.Circuit(1).rx(0, np.float64(0.5))
        text = to_qasm(c)
        assert "np.float64" not in text
        _assert_same_state(c, from_qasm(text))

    def test_builtin_uppercase_U_imports(self):
        src = (
            "OPENQASM 2.0;\nqreg q[1];\n"
            "U(0.3,0.1,0.2) q[0];\n"
        )
        c = from_qasm(src)
        # same decomposition as lowercase u3
        c2 = from_qasm(src.replace("U(", "u3("))
        assert c.signature() == c2.signature()

    def test_zero_division_angle_raises_valueerror(self):
        with pytest.raises(ValueError, match="division by zero"):
            from_qasm("OPENQASM 2.0;\nqreg q[1];\nrx(1/0) q[0];")
