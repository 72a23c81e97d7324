"""Smoke tests for the benchmark/validation harnesses (tiny sizes, CPU):
guards the scripts against bitrot without measuring anything."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {**os.environ, "JAX_PLATFORMS": "cpu"}


def run_script(args, timeout=300):
    return subprocess.run(
        [sys.executable] + args,
        cwd=REPO,
        env=ENV,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


class TestBenchmarkScripts:
    def test_backends_benchmark(self):
        r = run_script(
            ["benchmarks/benchmark_backends.py", "--qubits", "10", "--gates", "10"]
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "xla-fused" in r.stdout

    def test_gates_benchmark(self):
        r = run_script(
            ["benchmarks/benchmark_gates.py", "--sizes", "10", "--gates", "10",
             "--backend", "xla-fused"]
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "cnot" in r.stdout

    def test_scaling_benchmark(self):
        r = run_script(
            ["benchmarks/benchmark_scaling.py", "--sizes", "10", "--gates",
             "10", "--cpu-max", "10"]
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "qubits" in r.stdout

    def test_perop_plan_only(self):
        # device-free: plans every emission class through the production
        # grid planner at the headline 26q geometry
        r = run_script(
            ["benchmarks/benchmark_perop.py", "--size", "26", "--plan-only"]
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "all classes planned" in r.stdout

    def test_algorithms_benchmark(self):
        r = run_script(
            ["benchmarks/benchmark_algorithms.py", "--qubits", "10",
             "--shadows", "8", "--reps", "2"],
            timeout=420,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "vqe adam step" in r.stdout
        assert "trotter2" in r.stdout

    def test_validation_conventions(self):
        r = run_script(["validation/validate_conventions.py"])
        assert r.returncode == 0, r.stdout[-2000:]
        # every case passed, however many there are (N/N, not N-1/N)
        import re

        m = re.search(r"(\d+)/(\d+) convention checks passed", r.stdout)
        assert m and m.group(1) == m.group(2), r.stdout[-500:]
        assert "FAIL" not in r.stdout


class TestNoisyMeasurement:
    def test_measure_qubit_on_noisy_simulator(self):
        # parity with reference NoisySimulator::measureQubit
        from tpu_qsim import Circuit, SimConfig
        from tpu_qsim.noise import NoiseModel
        from tpu_qsim.noisy import NoisySimulator

        cfg = SimConfig(dtype="complex128", use_pallas=False)
        sim = NoisySimulator(2, NoiseModel().add_phase_flip(0.3), cfg, seed=4)
        sim.run(Circuit(2).x(0))
        assert sim.measure_qubit(0) == 1  # phase flips never change populations
        assert sim.total_probability() == pytest.approx(1.0, abs=1e-9)
