"""Full bench.py rerun with a FRESH bench module (the worker only purges
tpu_qsim* between jobs; job 140 got a stale pre-view-form bench import and
timed the old flat-form chains). Validates the committed bench end-to-end
and pre-warms the 24q + H@20q view-chain compiles for the driver."""
import sys

sys.path.insert(0, "/root/repo")
for m in list(sys.modules):
    if m == "bench" or m.startswith("bench."):
        del sys.modules[m]
import bench

rc = bench.main()
print(f"\nbench rc: {rc}", flush=True)
