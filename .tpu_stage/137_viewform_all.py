"""View-form chained timing across sizes: how much do the flat<->view
retiles cost at each n, and where does 26q compute actually sit?"""
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
    GridParams, build_grid_sweep_run, plan_grid_sweeps,
)
from tpu_qsim.utils import jit_scoped

REPS = {20: 100, 21: 60, 22: 20, 26: 3, 28: 1}


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


for n in (20, 21, 22, 26, 28):
    c = q.random_circuit(n, 100, seed=42)
    prog = build_grid_sweep_run(c, np.float32)
    ms = time_view(prog, REPS[n])
    print(f"{n}q view-form: {ms:.4f} ms sweeps={prog.num_sweeps}", flush=True)
    if n == 26:
        plan = plan_grid_sweeps(c, n, prog.params, 56)
        print(f"  26q plan gates={[len(s.gates) for s in plan]} "
              f"active={[sorted(s.active) for s in plan]}", flush=True)
        for i, fn in enumerate(prog._fns):
            class P:  # minimal shim for time_view
                vshape = prog.vshape
                run_view = staticmethod(fn)
            print(f"  26q sweep {i}: {time_view(P, 3):.4f} ms", flush=True)

# 26q 2-sweep variant now that stream is not the constraint
c = q.random_circuit(26, 100, seed=42)
try:
    p2 = build_grid_sweep_run(
        c, np.float32, params=GridParams(rb_bits=8, a_max=5), max_gates=100
    )
    pl2 = plan_grid_sweeps(c, 26, p2.params, 100)
    ms = time_view(p2, 3)
    print(f"26q rb8a5 cap100 view: {ms:.4f} ms sweeps={p2.num_sweeps} "
          f"gates={[len(s.gates) for s in pl2]}", flush=True)
except Exception as e:
    print(f"26q rb8a5 cap100: FAILED {type(e).__name__}: {str(e)[:150]}",
          flush=True)
