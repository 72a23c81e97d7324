"""Confirm the new default_geometry through dispatch at 20/21/22/24/26q,
plus 29q rb6/a7 and 26q rb6/a7 A/B."""
import sys

sys.path.insert(0, "/root/repo/benchmarks")
import numpy as np
import jax
import jax.numpy as jnp

from common import time_chained
import tpu_qsim as q
import tpu_qsim.apply as ap
from tpu_qsim.config import SimConfig
from tpu_qsim.kernels.dispatch import maybe_build_pallas_circuit_run
from tpu_qsim.kernels.gridsweeps import build_grid_sweep_run, GridParams

reps = {20: 60, 21: 40, 22: 20, 24: 10, 26: 6}
for n in (20, 21, 22, 24, 26):
    c = q.random_circuit(n, 100, seed=42)
    inner = maybe_build_pallas_circuit_run(c, np.float32, SimConfig(dtype="complex64"))
    x = ap.initial_state(n, np.float32)
    ns = getattr(inner, "num_sweeps", "-")
    ms = time_chained(inner, x, reps=reps[n]) * 1e3
    print(f"{n}q dispatch[{type(inner).__name__} sweeps={ns}]: {ms:.4f} ms", flush=True)
    del x

# 26q rb6/a7 candidate
c = q.random_circuit(26, 100, seed=42)
x = jnp.zeros((2, 1 << 26), jnp.float32).at[0, 0].set(1.0)
try:
    prog = build_grid_sweep_run(
        c, np.float32, params=GridParams(rb_bits=6, a_max=7), max_gates=70
    )
    ms = time_chained(prog, x, reps=6) * 1e3
    print(f"26q rb6a7cap70: {ms:.4f} ms sweeps={prog.num_sweeps}", flush=True)
except Exception as e:
    print(f"26q rb6a7cap70: FAILED {str(e)[:150]}", flush=True)
del x

# 29q via new default geometry (rb6/a7): inverse cert + timing
import time
from tpu_qsim.utils import jit_scoped

n = 29
c = q.random_circuit(n, 60, seed=42)
fwd = build_grid_sweep_run(c, np.float32)
inv = build_grid_sweep_run(c.inverse(), np.float32)
fresh = lambda p: jax.jit(
    lambda: jnp.zeros(p.vshape, jnp.float32)
    .at[(0,) * (len(p.vshape) - 1) + (0,)].set(1.0)
)()
z = inv.run_view(fwd.run_view(fresh(fwd))).reshape(2, -1)
amp0 = complex(float(z[0, 0]), float(z[1, 0]))
rest = float(jnp.max(jnp.abs(z.at[:, 0].set(0.0))))
print(f"29q rb6a7 inverse(60g): amp0={amp0} rest={rest:.2e} sweeps={fwd.num_sweeps}", flush=True)
del z

def chain(prog, k):
    body = lambda i, a: prog.run_view(a)
    return jit_scoped(lambda s: jax.lax.fori_loop(0, k, body, s),
                      donate_argnums=(0,))

f1, f4 = chain(fwd, 1), chain(fwd, 4)
float(jnp.sum(jnp.ravel(f1(fresh(fwd)))[:8]))
float(jnp.sum(jnp.ravel(f4(fresh(fwd)))[:8]))
ts = []
for _ in range(3):
    x = fresh(fwd)
    t0 = time.perf_counter(); float(jnp.sum(jnp.ravel(f1(x))[:8]))
    t_lo = time.perf_counter() - t0
    x = fresh(fwd)
    t0 = time.perf_counter(); float(jnp.sum(jnp.ravel(f4(x))[:8]))
    t_hi = time.perf_counter() - t0
    ts.append((t_hi - t_lo) / 3)
ts.sort()
print(f"29q rb6a7 random-60: {ts[1]*1e3:.2f} ms/circuit (rb9a4 was 100.9)", flush=True)
