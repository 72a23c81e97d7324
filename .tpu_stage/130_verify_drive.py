"""/verify real-TPU drive after the geometry-policy + view-form changes:
user-facing simulator at 20q (new grid dispatch) and 22q (rb8/a5) vs the
cached oracle."""
import hashlib
import os

import numpy as np
import jax
import tpu_qsim as q

for n in (20, 22):
    c = q.random_circuit(n, 100, seed=42)
    sim = q.StateVectorSimulator(n)
    sim.run(c)
    tp = float(sim.total_probability())
    key = hashlib.sha1(repr(c.signature()).encode()).hexdigest()[:16]
    path = f"/root/repo/.oracle_cache/{n}q_{key}.npy"
    ora = np.load(path, mmap_mode="r")
    ours = np.asarray(sim.get_state())
    err = float(np.abs(ours - ora).max())
    print(f"{n}q facade: total_prob={tp:.7f} max_amp_err={err:.2e}", flush=True)

sim = q.StateVectorSimulator(2)
sim.run(q.bell_circuit())
print("bell probs:", np.round(np.asarray(sim.get_probabilities()), 4), flush=True)
