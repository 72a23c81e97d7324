"""Long-lived TPU experiment worker (dev tool, not part of the library).

Polls .tpu_jobs/*.py; executes each in-process (shared jax runtime, so the
device is claimed once and compile caches stay warm); writes stdout/err to
<job>.out and renames the job to <job>.done. Keep ONE instance alive.
"""
import io
import os
import sys
import time
import traceback

os.chdir("/root/repo")
sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

# claim the device / warm the tunnel
print("devices:", jax.devices(), flush=True)
print("warmup:", float(jnp.sum(jnp.ones((8,), jnp.float32))), flush=True)

JOBS = "/root/repo/.tpu_jobs"
os.makedirs(JOBS, exist_ok=True)
print("worker ready", flush=True)

# Auto-exit when idle: the round driver runs bench.py in its own process,
# which needs the (single-claim) device this worker would otherwise hold.
IDLE_EXIT_S = 2400
last_job = time.time()

while True:
    if time.time() - last_job > IDLE_EXIT_S:
        print("idle too long; releasing the device", flush=True)
        break
    for name in sorted(os.listdir(JOBS)):
        if not name.endswith(".py"):
            continue
        path = os.path.join(JOBS, name)
        # fresh library code each job (the jax runtime + caches stay warm)
        for m in list(sys.modules):
            if m.startswith("tpu_qsim"):
                del sys.modules[m]
        t0 = time.time()
        live = open(path + ".live", "w", buffering=1)
        try:
            src = open(path).read()
            old = sys.stdout
            sys.stdout = live
            try:
                exec(compile(src, path, "exec"), {"__name__": "__job__"})
            finally:
                sys.stdout = old
            status = "ok"
        except Exception:
            live.write("\n" + traceback.format_exc())
            status = "err"
        live.close()
        dt = time.time() - t0
        with open(path + ".out", "w") as f:
            f.write(f"# status={status} wall={dt:.1f}s\n")
            f.write(open(path + ".live").read())
        os.remove(path + ".live")
        os.rename(path, path + ".done")
        last_job = time.time()
        print(f"job {name}: {status} ({dt:.1f}s)", flush=True)
    time.sleep(2)
