"""30q certification, readback-safe: all reductions consume the state in a
donated jit returning scalars only (two live 8 GB arrays OOM a 16 GB chip)."""
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


def summarize(p):
    """(amp0_r, amp0_i, ampN_r, ampN_i, max_rest) — consumes the state."""

    def f(y):
        flat = y.reshape(2, -1)
        a0r, a0i = flat[0, 0], flat[1, 0]
        aNr, aNi = flat[0, -1], flat[1, -1]
        rest = jnp.max(jnp.abs(flat.at[:, 0].set(0.0).at[:, -1].set(0.0)))
        return a0r, a0i, aNr, aNi, rest

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


def summarize0(p):
    def f(y):
        flat = y.reshape(2, -1)
        a0r, a0i = flat[0, 0], flat[1, 0]
        rest = jnp.max(jnp.abs(flat.at[:, 0].set(0.0)))
        return a0r, a0i, rest

    return jax.jit(f, donate_argnums=(0,))


vals = summarize0(fwd)(inv.run_view(fwd.run_view(fresh(fwd))))
a0r, a0i, rest = (float(v) for v in vals)
print(f"30q inverse(40g): amp0={a0r}+{a0i}j rest={rest:.2e} "
      f"sweeps={fwd.num_sweeps}", flush=True)


def chain(p, k):
    body = lambda i, a: p.run_view(a)
    return jit_scoped(lambda s: jax.lax.fori_loop(0, k, body, s),
                      donate_argnums=(0,))


f1, f4 = chain(fwd, 1), chain(fwd, 4)
drain = summarize0(fwd)


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
