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

    def test_floor_plan_only(self):
        # device-free half of the §20 floor certificate: the emitted-program
        # vector-op census (analytic VPU floor per blend) and the
        # lane-placement upper bound must keep reproducing — the on-chip
        # §20.3 numbers are interpreted against exactly these figures
        r = run_script(
            ["benchmarks/benchmark_floor.py", "--plan-only"], timeout=600
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "analytic 26q VPU floor" in r.stdout
        # the lever-(b) verdict is part of the certificate: all three sizes
        # must still price as net losses at their optimistic upper bound
        assert r.stdout.count("NET LOSS") == 3, r.stdout[-1500:]

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

        # The watchdog (fires ~5s before the 45s budget) backstops the case
        # where SIGTERM lands while the main thread is inside a blocking C
        # compile call (signal handlers only run between bytecodes) —
        # either path must emit the JSON. Deflaked (round-5 VERDICT item
        # 5): no wall-clock racing — poll the process with a deadline far
        # beyond any load-inflated compile stall, and keep the watchdog
        # budget small so the backstop fires early even under a loaded
        # host (the old 90s budget + 120s deadline lost the race when
        # concurrent CPU load stretched a compile past 35s).
        env = {**ENV, "BENCH_BUDGET_S": "45"}
        p = subprocess.Popen(
            [sys.executable, "bench.py"],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True,
        )
        time.sleep(8)  # let it get past imports into the first row
        p.send_signal(_signal.SIGTERM)
        try:
            stdout, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            raise AssertionError("bench ignored SIGTERM and watchdog")
        assert p.returncode == 0
        out = self._last_json(stdout)
        assert "rows" in out and "skipped_rows" in out
        # three legitimate endings, all honoring the always-emit contract:
        # the SIGTERM handler (note="terminated..."), the watchdog
        # (note="watchdog..."), or — on a fast host — a clean all-skipped
        # completion BEFORE the signal lands (no note, everything gated
        # into skipped_rows). Only the emitted-JSON + exit-0 contract is
        # asserted; which path won is load-dependent by construction.
        if "note" not in out:
            assert out["skipped_rows"], out


class TestNoiseTierRows:
    """The bench noise-tier rows (BASELINE configs 3-5) must run end to end
    hardware-free under the BENCH_SMOKE_TINY shrink knob: the row FUNCTIONS
    (trajectory chain, vmapped batch + histogram, exact-Kraus DM timing,
    their accuracy cross-checks) are covered; the numbers are meaningless
    on CPU and the rows stamp smoke_tiny."""

    def test_noise_rows_smoke(self):
        r = run_script_code(
            # a sitecustomize force-sets the TPU platform at interpreter
            # startup (config wins over JAX_PLATFORMS): reconcile first or
            # this 'CPU' smoke silently runs through the TPU tunnel
            "import jax; jax.config.update('jax_platforms', 'cpu')\n"
            "import bench\n"
            "for fn in (bench._bench_row_noisy, bench._bench_row_batched,\n"
            "           bench._bench_row_dm):\n"
            "    row = fn()\n"
            "    assert row['ms'] > 0, row\n"
            "print('noise rows ok')\n",
            extra_env={"BENCH_SMOKE_TINY": "1"},
            timeout=600,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        assert "noise rows ok" in r.stdout


def run_script_code(code, extra_env=None, timeout=300):
    return subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env={**ENV, **(extra_env or {})},
        capture_output=True,
        text=True,
        timeout=timeout,
    )


class TestCacheSeedManifest:
    """The committed .jax_cache seed is only warm while the sources it was
    compiled from are unchanged (compile-cache keys embed source locations);
    bench.py must detect drift and stamp it into the emitted JSON (round-5
    VERDICT item 6)."""

    def _import_bench(self):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "bench_under_test", os.path.join(REPO, "bench.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_manifest_roundtrip_and_drift(self, tmp_path, monkeypatch):
        bench = self._import_bench()
        manifest = tmp_path / "SOURCE_MANIFEST.json"
        monkeypatch.setattr(bench, "MANIFEST_PATH", str(manifest))

        # absent manifest -> "absent"
        assert bench.seed_manifest_status() == ("absent", [])

        # fresh manifest over the real sources -> "ok"
        import json as _json

        manifest.write_text(
            _json.dumps({"files": bench.manifest_digests()})
        )
        status, changed = bench.seed_manifest_status()
        assert status == "ok" and changed == []

        # tamper with one recorded hash -> "stale" naming the file
        payload = _json.loads(manifest.read_text())
        victim = sorted(payload["files"])[0]
        payload["files"][victim] = "0" * 64
        manifest.write_text(_json.dumps(payload))
        status, changed = bench.seed_manifest_status()
        assert status == "stale" and changed == [victim]

        # corrupt manifest degrades to "absent", never crashes bench
        manifest.write_text("{not json")
        assert bench.seed_manifest_status() == ("absent", [])

    def test_manifest_covers_cache_sensitive_sources(self):
        bench = self._import_bench()
        files = bench.manifest_digests()
        assert "bench.py" in files
        assert any(f.startswith("tpu_qsim/") for f in files)
        assert "tpu_qsim/kernels/gridsweeps.py" in files

    def test_make_manifest_tool(self):
        # --check must report status without writing anything
        r = run_script(["tools/make_cache_manifest.py", "--check"])
        assert r.returncode in (0, 1), r.stderr[-2000:]
        assert "cache seed manifest:" in r.stdout


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
