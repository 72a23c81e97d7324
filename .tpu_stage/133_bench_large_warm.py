"""Warm the compile cache for the new 29/30q bench rows (exact signatures)
and preview their numbers by running bench._bench_row_large directly."""
import json
import sys
sys.path.insert(0, "/root/repo")
import importlib
import bench
importlib.reload(bench)

for n in (29, 30):
    try:
        row = bench._bench_row_large(n)
        print(f"{n}q row: {json.dumps(row)}", flush=True)
    except Exception as e:
        print(f"{n}q row FAILED: {type(e).__name__} {str(e)[:300]}", flush=True)
