#!/usr/bin/env python
"""Gate-convention validation against analytic Qiskit/Cirq amplitudes.

The reference's validation scripts asserted that Cirq's/Qiskit-Aer's own
simulators reproduce hard-coded amplitudes for the documented conventions —
but never executed the CUDA binary (reference validation/
validate_against_cirq.py:67-260). This script closes that gap: it runs OUR
simulator on the same convention-pinning circuits and compares against the
analytic amplitudes (global-phase-sensitive — the conventions include
phase). Cross-checks against live Cirq/Qiskit run from
validate_against_cirq.py / validate_against_qiskit.py when those packages
are installed.

Run: python validation/validate_conventions.py  (exit 0 = all match)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
# Convention checks are exact (complex128) work: force CPU regardless of the
# environment's default platform (TPU backends lack float64).
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np


def build_cases():
    """(name, circuit builder, expected little-endian amplitudes)."""
    import tpu_qsim as q

    s2 = 1 / np.sqrt(2)
    e = np.exp
    pi = np.pi

    cases = [
        # -- single-qubit gates on |0> / |1> -------------------------------
        ("X|0> = |1>", q.Circuit(1).x(0), [0, 1]),
        ("Y|0> = i|1>", q.Circuit(1).y(0), [0, 1j]),
        ("Z|1> = -|1>", q.Circuit(1).x(0).z(0), [0, -1]),
        ("H|0> = |+>", q.Circuit(1).h(0), [s2, s2]),
        ("H|1> = |->", q.Circuit(1).x(0).h(0), [s2, -s2]),
        ("S|1> = i|1>", q.Circuit(1).x(0).s(0), [0, 1j]),
        ("Sdg|1> = -i|1>", q.Circuit(1).x(0).sdg(0), [0, -1j]),
        ("T|1> = e^{ipi/4}|1>", q.Circuit(1).x(0).t(0), [0, e(1j * pi / 4)]),
        ("Tdg|1>", q.Circuit(1).x(0).tdg(0), [0, e(-1j * pi / 4)]),
        # -- rotations: half-angle with global phase (Qiskit convention) ---
        ("Rx(pi)|0> = -i|1>", q.Circuit(1).rx(0, pi), [0, -1j]),
        ("Rx(pi/2)|0>", q.Circuit(1).rx(0, pi / 2), [s2, -1j * s2]),
        ("Ry(pi/2)|0>", q.Circuit(1).ry(0, pi / 2), [s2, s2]),
        ("Rz(pi/2)|+>", q.Circuit(1).h(0).rz(0, pi / 2),
         [s2 * e(-1j * pi / 4), s2 * e(1j * pi / 4)]),
        ("P(pi/2)|1> = i|1>", q.Circuit(1).x(0).p(0, pi / 2), [0, 1j]),
        # -- two-qubit gates (little-endian: |q1 q0>, index = q0 + 2 q1) ---
        ("CNOT(0,1): |01> -> |11>", q.Circuit(2).x(0).cnot(0, 1), [0, 0, 0, 1]),
        ("CNOT(1,0): |10> -> |11>", q.Circuit(2).x(1).cnot(1, 0), [0, 0, 0, 1]),
        ("CNOT no-op when control clear", q.Circuit(2).cnot(0, 1), [1, 0, 0, 0]),
        ("Bell = (|00>+|11>)/sqrt2", q.bell_circuit(), [s2, 0, 0, s2]),
        ("CZ|11> = -|11>", q.Circuit(2).x(0).x(1).cz(0, 1), [0, 0, 0, -1]),
        ("SWAP: |01> -> |10>", q.Circuit(2).x(0).swap(0, 1), [0, 0, 1, 0]),
        ("CRY(pi)|01> -> |11>", q.Circuit(2).x(0).cry(0, 1, pi), [0, 0, 0, 1]),
        ("CRZ(pi)|11> = i|11>", q.Circuit(2).x(0).x(1).crz(0, 1, pi),
         [0, 0, 0, 1j]),
        # -- three-qubit -----------------------------------------------------
        ("Toffoli |011> -> |111>", q.Circuit(3).x(0).x(1).toffoli(0, 1, 2),
         [0, 0, 0, 0, 0, 0, 0, 1]),
        ("Toffoli |010> unchanged", q.Circuit(3).x(1).toffoli(0, 1, 2),
         [0, 0, 1, 0, 0, 0, 0, 0]),
        # -- GHZ -------------------------------------------------------------
        ("GHZ-3", q.ghz_circuit(3), [s2, 0, 0, 0, 0, 0, 0, s2]),
    ]
    # -- QPE: endianness-sensitive end-to-end (dyadic phase 1/4 with a
    # 2-bit register concentrates amplitude EXACTLY 1 at |k=1>|1>, i.e.
    # little-endian index (1<<1)|1 = 3; any bit-order regression in the
    # cp ladder or the mapped inverse QFT moves the peak) ---------------
    from tpu_qsim.algorithms import phase_estimation_circuit

    qpe_expected = [0] * 8
    qpe_expected[3] = 1
    cases.append(
        ("QPE(phase=1/4, m=2) -> |k=1>|1>",
         phase_estimation_circuit(0.25, 2), qpe_expected)
    )
    return cases


def run(tol: float = 1e-7, verbose: bool = True) -> int:
    import tpu_qsim as q

    cfg = q.SimConfig(dtype="complex128", use_pallas=False)
    failures = 0
    for name, circuit, expected in build_cases():
        sim = q.StateVectorSimulator(circuit.num_qubits, cfg)
        sim.run(circuit)
        got = sim.get_state()
        err = np.max(np.abs(got - np.asarray(expected, dtype=complex)))
        ok = err < tol
        failures += not ok
        if verbose:
            print(f"{'PASS' if ok else 'FAIL'}  {name:40s} max|diff|={err:.2e}")
            if not ok:
                print(f"      expected {np.round(expected, 6)}")
                print(f"      got      {np.round(got, 6)}")
    print(f"\n{len(build_cases()) - failures}/{len(build_cases())} convention "
          f"checks passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(run())
