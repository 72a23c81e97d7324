"""30q certification, OOM-safe: summaries use fused masked reductions (no
.at[].set copies - an 8 GB temp next to the 8 GB donated argument OOMs)."""
import time
import numpy as np
import jax
import jax.numpy as jnp

import tpu_qsim as q
from tpu_qsim.kernels.gridsweeps import build_grid_sweep_run
from tpu_qsim.utils import jit_scoped

n = 30


def fresh(p):
    return jax.jit(
        lambda: jnp.zeros(p.vshape, jnp.float32)
        .at[(0,) * (len(p.vshape) - 1) + (0,)].set(1.0)
    )()


def summarize(p, ends=2):
    """Masked reductions fused into the reduce: amp0, (ampN,) max|rest|."""

    def f(y):
        flat = y.reshape(2, -1)
        m = flat.shape[1]
        idx = jax.lax.broadcasted_iota(jnp.int32, flat.shape, 1)
        mask = (idx == 0) if ends == 1 else (idx == 0) | (idx == m - 1)
        rest = jnp.max(jnp.where(mask, 0.0, jnp.abs(flat)))
        out = [flat[0, 0], flat[1, 0]]
        if ends == 2:
            out += [flat[0, m - 1], flat[1, m - 1]]
        return tuple(out) + (rest,)

    return jax.jit(f, donate_argnums=(0,))


ghz = q.ghz_circuit(n)
prog = build_grid_sweep_run(ghz, np.float32)
vals = summarize(prog)(prog.run_view(fresh(prog)))
a0r, a0i, aNr, aNi, rest = (float(v) for v in vals)
print(f"30q GHZ sweeps={prog.num_sweeps} amp0={a0r}+{a0i}j ampN={aNr}+{aNi}j "
      f"rest={rest:.2e}", flush=True)

c = q.random_circuit(n, 40, seed=42)
fwd = build_grid_sweep_run(c, np.float32)
inv = build_grid_sweep_run(c.inverse(), np.float32)

vals = summarize(fwd, ends=1)(inv.run_view(fwd.run_view(fresh(fwd))))
a0r, a0i, rest = (float(v) for v in vals)
print(f"30q inverse(40g): amp0={a0r}+{a0i}j rest={rest:.2e} "
      f"sweeps={fwd.num_sweeps}", flush=True)


def chain(p, k):
    body = lambda i, a: p.run_view(a)
    return jit_scoped(lambda s: jax.lax.fori_loop(0, k, body, s),
                      donate_argnums=(0,))


f1, f4 = chain(fwd, 1), chain(fwd, 4)
drain = summarize(fwd, ends=1)


def run_once(f):
    x = fresh(fwd)
    t0 = time.perf_counter()
    vals = drain(f(x))
    _ = [float(v) for v in vals]
    return time.perf_counter() - t0


run_once(f1); run_once(f4)  # warm
ts = []
for _ in range(3):
    t_lo = run_once(f1)
    t_hi = run_once(f4)
    ts.append((t_hi - t_lo) / 3)
ts.sort()
print(f"30q random-40: {ts[1]*1e3:.2f} ms/circuit", flush=True)
