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


class TestBenchAlwaysEmit:
    """Round-3's driver bench died with rc=124 and NO output (cold-cache
    compiles outran the driver timeout). These tests pin the fix: bench.py
    must ALWAYS emit exactly one final JSON line and exit cleanly, however
    little of the table fits the budget."""

    @staticmethod
    def _last_json(stdout: str):
        import json

        lines = [ln for ln in stdout.strip().splitlines() if ln.strip()]
        assert lines, "bench printed nothing"
        return json.loads(lines[-1])

    def test_watchdog_emits_partial_json_within_budget(self):
        import time

        env = {**ENV, "BENCH_BUDGET_S": "15"}
        t0 = time.monotonic()
        r = subprocess.run(
            [sys.executable, "bench.py"],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=120,
        )
        elapsed = time.monotonic() - t0
        assert r.returncode == 0, (r.returncode, r.stderr[-2000:])
        # the watchdog fires ~5s before the budget; allow import slack
        assert elapsed < 90, f"watchdog failed to cap wall-clock: {elapsed}"
        out = self._last_json(r.stdout)
        assert out["metric"] == "16q_100gate_circuit_ms"
        assert "skipped_rows" in out and "rows" in out
        assert out["budget_s"] == 15.0

    def test_sigterm_emits_json(self):
        import signal as _signal
        import time

        # watchdog at 85s backstops the case where SIGTERM lands while the
        # main thread is inside a blocking C compile call (signal handlers
        # only run between bytecodes) — either path must emit the JSON
        env = {**ENV, "BENCH_BUDGET_S": "90"}
        p = subprocess.Popen(
            [sys.executable, "bench.py"],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True,
        )
        time.sleep(8)  # let it get past imports into the first row
        p.send_signal(_signal.SIGTERM)
        try:
            stdout, _ = p.communicate(timeout=120)
        except subprocess.TimeoutExpired:
            p.kill()
            raise AssertionError("bench ignored SIGTERM and watchdog")
        assert p.returncode == 0
        out = self._last_json(stdout)
        assert "rows" in out and "note" in out


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
