"""Compute-era tuning: 22q cap80 confirm, 26q small-kernel + window-bar
trials, 28q geometry rematch in view form."""
import sys
sys.path.insert(0, "/root/repo/benchmarks")
import collections
import time
import numpy as np
import jax
import jax.numpy as jnp
from common import setup_jax
setup_jax()
import tpu_qsim as q
import tpu_qsim.kernels.fused_circuit as fc
from tpu_qsim.kernels.gridsweeps import (
    GridParams, build_grid_sweep_run, plan_grid_sweeps,
)
from tpu_qsim.utils import jit_scoped


def fresh(vshape):
    return jax.jit(
        lambda: jnp.zeros(vshape, jnp.float32)
        .at[(0,) * len(vshape)].set(1.0)
    )()


def time_view(prog, reps, trials=3):
    vshape = prog.vshape

    def chained(k):
        return jit_scoped(
            lambda s: jax.lax.fori_loop(
                0, k, lambda i, a: prog.run_view(a), s
            )
        )

    f_lo, f_hi = chained(reps), chained(4 * reps)
    x = fresh(vshape)

    def sync(z):
        return float(jnp.sum(z[(0, 0) + (0,) * (len(vshape) - 2)]))

    sync(f_lo(x)); sync(f_hi(x))
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter(); sync(f_lo(x)); t_lo = time.perf_counter() - t0
        t0 = time.perf_counter(); sync(f_hi(x)); t_hi = time.perf_counter() - t0
        ts.append((t_hi - t_lo) / (3 * reps))
    ts.sort()
    return ts[len(ts) // 2] * 1e3


def trial(n, label, params=None, cap=None, reps=3):
    c = q.random_circuit(n, 100, seed=42)
    try:
        prog = build_grid_sweep_run(c, np.float32, params=params, max_gates=cap)
        pl = plan_grid_sweeps(
            c, n, prog.params, cap or __import__(
                "tpu_qsim.kernels.gridsweeps", fromlist=["default_geometry"]
            ).default_geometry(n)[1]
        )
        ms = time_view(prog, reps)
        print(f"{n}q {label}: {ms:.4f} ms sweeps={prog.num_sweeps} "
              f"gates={[len(s.gates) for s in pl]}", flush=True)
        return ms
    except Exception as e:
        print(f"{n}q {label}: FAILED {type(e).__name__}: {str(e)[:150]}",
              flush=True)
        return None


trial(22, "default cap80", reps=20)
trial(26, "cap40 small-kernels", params=GridParams(), cap=40, reps=3)

# window-bar probe: lower the grid mm/mmb bars so more gates MXU-ize
orig_mm = dict(fc._GRID_WINDOW_COST)
fc._GRID_WINDOW_COST["mm"] = (4.0, 6.0)
fc._GRID_WINDOW_COST["mmb"] = (6.0, 8.0)
try:
    trial(26, "low window bars (mm 4/6, mmb 6/8)",
          params=GridParams(), cap=56, reps=3)
finally:
    fc._GRID_WINDOW_COST.update(orig_mm)

trial(28, "rb9a4 cap56", params=GridParams(rb_bits=9, a_max=4), cap=56, reps=1)
trial(28, "rb8a5 cap80", params=GridParams(rb_bits=8, a_max=5), cap=80, reps=1)
