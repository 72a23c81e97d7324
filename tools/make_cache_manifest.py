#!/usr/bin/env python
"""Record the source manifest for the committed compile-cache seed.

The committed ``.jax_cache`` warm seed is only warm while the sources it
was compiled from are byte-identical: XLA compile-cache keys embed source
locations from every module in the trace, so ANY edit to ``tpu_qsim/*.py``
or ``bench.py`` silently invalidates all committed entries (the round-3
rc=124 failure mode; docs/PERF_NOTES.md §19).

Workflow (in this order, before a round ends):

1. freeze sources;
2. rewarm: ``python bench.py`` on the chip (populates ``.jax_cache``);
3. ``python tools/make_cache_manifest.py`` (records this manifest);
4. ``git add -f .jax_cache && git commit``.

``bench.py`` compares the manifest at startup and stamps
``cache_seed: stale (...)`` into its JSON when sources drifted.

``--check`` exits 1 if the recorded manifest no longer matches the working
tree (for use at round end / in release checklists; it is NOT a CI test —
mid-round source edits legitimately precede the final rewarm).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import MANIFEST_PATH, manifest_digests, seed_manifest_status


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="exit 1 if the recorded manifest is stale")
    args = ap.parse_args()

    if args.check:
        status, changed = seed_manifest_status()
        print(f"cache seed manifest: {status}")
        for f in changed:
            print(f"  drifted: {f}")
        return 0 if status == "ok" else 1

    os.makedirs(os.path.dirname(MANIFEST_PATH), exist_ok=True)
    payload = {
        "recorded_unix": int(time.time()),
        "files": manifest_digests(),
    }
    with open(MANIFEST_PATH, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    print(f"wrote {MANIFEST_PATH}: {len(payload['files'])} sources")
    return 0


if __name__ == "__main__":
    sys.exit(main())
