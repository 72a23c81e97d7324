"""On-chip drive of the facade view-cache path at production sizes:
consecutive grid runs park state in view form; readback must match the
complex128 oracle; measurement/collapse interleave correctly."""
import hashlib
import os
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

import tpu_qsim as q

float(jnp.sum(jnp.ones((8,), jnp.float32)))


def oracle(circuit, reps=1):
    """bench.py's oracle-cache key format for reps=1 (the 22q/24q bench
    circuits are already cached); reps>1 gets its own entry."""
    tag = "" if reps == 1 else f"_x{reps}"
    key = hashlib.sha1(repr(circuit.signature()).encode()).hexdigest()[:16]
    path = (f"/root/repo/.oracle_cache/{circuit.num_qubits}q_{key}{tag}.npy")
    if os.path.exists(path):
        return np.load(path, mmap_mode="r")
    o = q.CPUReferenceSimulator(circuit.num_qubits)
    for _ in range(reps):
        o.run(circuit)
    np.save(path, o.state)
    return o.state

n = 20
c = q.random_circuit(n, 100, seed=42)
sim = q.StateVectorSimulator(n)
sim.run(c).run(c).run(c)
assert sim._view_state is not None, "state not parked in view form"
err = float(np.abs(sim.get_state() - oracle(c, 3)).max())
print(f"20q facade x3 runs (view-parked): max_amp_err={err:.2e}", flush=True)
assert err < 1e-5

# measurement interleave on-chip
sim.run(c)
out = sim.measure_qubit(5)
tp = sim.total_probability()
print(f"20q measure after view-run: outcome={out} total_prob={tp:.7f}",
      flush=True)
assert abs(tp - 1.0) < 1e-4

# 22q single run through the facade (cap90 default) vs oracle
n = 22
c = q.random_circuit(n, 100, seed=42)
sim = q.StateVectorSimulator(n)
sim.run(c)
err = float(np.abs(sim.get_state() - oracle(c)).max())
print(f"22q facade run: max_amp_err={err:.2e}", flush=True)
assert err < 1e-5

# 24q new cap80 default vs oracle
n = 24
c = q.random_circuit(n, 100, seed=42)
sim = q.StateVectorSimulator(n)
sim.run(c)
err = float(np.abs(sim.get_state() - oracle(c)).max())
print(f"24q facade run (cap80): max_amp_err={err:.2e}", flush=True)
assert err < 1e-5
print("facade drive ok", flush=True)
