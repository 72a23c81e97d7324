"""Full bench.py run in-process: validates the round-3 bench end-to-end on
chip and pre-warms every program the driver's round-end bench will compile
(view-form chains at the new caps, 29-30q rows, H@20q grid chain)."""
import sys

sys.path.insert(0, "/root/repo")
import bench

rc = bench.main()
print(f"\nbench rc: {rc}", flush=True)
