"""Second geometry round: 20q multi-step pipelining, 24q wider-active,
26q rb6/a7."""
import sys
sys.path.insert(0, "/root/repo/benchmarks")
import numpy as np
import jax
import jax.numpy as jnp
from common import time_chained
import tpu_qsim as q
from tpu_qsim.kernels.gridsweeps import build_grid_sweep_run, GridParams

import hashlib, os
def check(n, c, prog, x):
    key = hashlib.sha1(repr(c.signature()).encode()).hexdigest()[:16]
    path = f"/root/repo/.oracle_cache/{n}q_{key}.npy"
    if not os.path.exists(path) or n > 24:
        return None
    y = prog(x)
    ours = np.asarray(y[0]) + 1j * np.asarray(y[1])
    return float(np.abs(ours - np.load(path, mmap_mode="r")).max())

cases = [
    (20, "rb8a4cap100", GridParams(rb_bits=8, a_max=4), 100, 60),
    (20, "rb7a5cap100", GridParams(rb_bits=7, a_max=5), 100, 60),
    (24, "rb7a6cap90",  GridParams(rb_bits=7, a_max=6), 90, 10),
    (26, "rb6a7cap70",  GridParams(rb_bits=6, a_max=7), 70, 6),
]
for n, label, params, cap, reps in cases:
    c = q.random_circuit(n, 100, seed=42)
    x = jnp.zeros((2, 1 << n), jnp.float32).at[0, 0].set(1.0)
    try:
        prog = build_grid_sweep_run(c, np.float32, params=params, max_gates=cap)
        err = check(n, c, prog, x)
        ms = time_chained(prog, x, reps=reps) * 1e3
        print(f"{n}q {label}: {ms:.4f} ms sweeps={prog.num_sweeps} err={err}", flush=True)
    except Exception as e:
        print(f"{n}q {label}: FAILED {type(e).__name__}: {str(e)[:150]}", flush=True)
    del x
