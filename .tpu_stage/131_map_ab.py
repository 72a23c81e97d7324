"""Map-engine (sweeps.py) A/B vs grid engine at 24/26q: does XLA-staged
streaming (~550 GB/s, additive) now beat the grid's 220 GB/s overlapped
stream, given the v4 emission + mmt windows cut the compute term?"""
import sys
sys.path.insert(0, "/root/repo/benchmarks")
import numpy as np
import jax
import jax.numpy as jnp
from common import time_chained
import tpu_qsim as q
import tpu_qsim.apply as ap
from tpu_qsim.kernels.sweeps import build_sweep_run

for n, reps in ((24, 10), (26, 6)):
    c = q.random_circuit(n, 100, seed=42)
    try:
        prog = build_sweep_run(c, np.float32)
        x = ap.initial_state(n, np.float32)
        parts = jax.jit(prog.to_parts)(x)
        del x
        ms = time_chained(prog.run_parts, parts, reps=reps) * 1e3
        print(f"{n}q map-engine: {ms:.4f} ms sweeps={len(prog.sweep_kinds)}", flush=True)
        del parts
    except Exception as e:
        print(f"{n}q map-engine FAILED: {type(e).__name__} {str(e)[:200]}", flush=True)
