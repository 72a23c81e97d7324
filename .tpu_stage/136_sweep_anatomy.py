"""24q sweep anatomy: where do the 1.3 ms above the stream floor live?

1. Identity (0-gate) grid sweeps = pure pipeline stream at the exact
   geometry, with active bits innermost (contiguous 4.2 MB runs) vs
   outermost (131 KB scattered slices).
2. Per-sweep timing of the default rb8/a5 cap90 plan (split the 3.76 ms).
3. Gate-cap variants 100/80/65 (2-sweep split shapes).
"""
import sys
sys.path.insert(0, "/root/repo/benchmarks")
import time
import numpy as np
import jax
import jax.numpy as jnp
from common import setup_jax
setup_jax()
import tpu_qsim as q
from tpu_qsim.kernels.gridsweeps import (
    GridParams, GridSweep, _build_grid_sweep, build_grid_sweep_run,
    plan_grid_sweeps,
)
from tpu_qsim.utils import jit_scoped

N = 24
PARAMS = GridParams(rb_bits=8, a_max=5)   # BLK=15, hb=9
HB = N - PARAMS.blk_bits
VSHAPE = (2,) + (2,) * HB + (PARAMS.rb, 128)


def fresh():
    return jax.jit(
        lambda: jnp.zeros(VSHAPE, jnp.float32)
        .at[(0,) * len(VSHAPE)].set(1.0)
    )()


def time_view(fn, reps=10, trials=3):
    def chained(k):
        return jit_scoped(
            lambda s: jax.lax.fori_loop(0, k, lambda i, a: fn(a), s)
        )

    f_lo, f_hi = chained(reps), chained(4 * reps)
    x = fresh()

    def sync(z):
        return float(jnp.sum(z[(0, 0) + (0,) * (len(VSHAPE) - 2)]))

    sync(f_lo(x)); sync(f_hi(x))
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter(); sync(f_lo(x)); t_lo = time.perf_counter() - t0
        t0 = time.perf_counter(); sync(f_hi(x)); t_hi = time.perf_counter() - t0
        ts.append((t_hi - t_lo) / (3 * reps))
    ts.sort()
    return ts[len(ts) // 2] * 1e3


# --- 1. identity sweeps: pure stream at this geometry -----------------
for label, act in (
    ("inner {15..19}", set(range(15, 20))),
    ("outer {19..23}", set(range(19, 24))),
):
    fn = _build_grid_sweep(GridSweep(active=act), N, False, PARAMS)
    print(f"identity sweep, active {label}: {time_view(fn):.4f} ms",
          flush=True)

# --- 2. per-sweep split of the default plan ---------------------------
c = q.random_circuit(N, 100, seed=42)
prog = build_grid_sweep_run(c, np.float32)   # default geometry: rb8/a5 cap90
plan = plan_grid_sweeps(c, N, prog.params, 90)
print(f"default plan: sweeps={prog.num_sweeps} "
      f"gates={[len(s.gates) for s in plan]} "
      f"active={[sorted(s.active) for s in plan]}", flush=True)
total = time_view(prog.run_view)
print(f"default total: {total:.4f} ms", flush=True)
for i, fn in enumerate(prog._fns):
    print(f"  sweep {i}: {time_view(fn):.4f} ms", flush=True)

# --- 3. cap variants ---------------------------------------------------
for cap in (100, 80, 65):
    p2 = build_grid_sweep_run(c, np.float32, params=PARAMS, max_gates=cap)
    pl2 = plan_grid_sweeps(c, N, PARAMS, cap)
    ms = time_view(p2.run_view)
    print(f"cap{cap}: {ms:.4f} ms sweeps={p2.num_sweeps} "
          f"gates={[len(s.gates) for s in pl2]}", flush=True)
