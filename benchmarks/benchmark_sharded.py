#!/usr/bin/env python
"""Sharded-engine A/B: gspmd vs collective vs sweeps over whatever mesh exists.

The three distributed state-vector engines differ only in WHO schedules the
communication (see tpu_qsim/parallel.py):

* ``gspmd``       — sharding annotations; XLA GSPMD inserts collectives.
* ``collective``  — explicit shard_map schedule: one ``all_to_all`` block
                    swap per segment boundary that needs nonlocal qubits
                    (plus <= 2 for the final restore), device-local gates
                    via the einsum path.
* ``sweeps``      — same schedule, device-local gates through the
                    single-chip kernel tier (VMEM kernel / grid sweeps).

This harness runs on ANY mesh unchanged:

* On the 8-virtual-CPU mesh (JAX_PLATFORMS=cpu,
  XLA_FLAGS=--xla_force_host_platform_device_count=8) it is the
  CORRECTNESS + COMM-SCHEDULE mode: every engine's amplitudes are checked
  against the complex128 oracle, and the compiled HLO's collective-op
  counts are compared against the planner's predicted counts
  (docs/PERF_NOTES.md §15 records the table).
* On real multi-chip hardware it additionally reports wall-clock
  (fori-chained two-point timing) per engine — the A/B the first >1-chip
  session should run at 27q+ (single-chip timings of a sharded program are
  labeled as such, not comparable to the unsharded engines).

Usage: python benchmarks/benchmark_sharded.py [--size 18] [--gates 100]
       [--engines gspmd,collective,sweeps] [--time]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from common import setup_jax, time_chained

COLLECTIVE_OPS = (
    "all-to-all", "collective-permute", "all-gather", "all-reduce",
    "reduce-scatter",
)


def count_collectives(hlo: str) -> dict[str, int]:
    """Instruction counts by mnemonic: match ' <op>(' application sites.
    Instruction NAMES also contain the mnemonic ('%all-to-all.5 = ...')
    but are %-prefixed or referenced inside parens, and wide tuple-typed
    instructions wrap across lines — so match the mnemonic immediately
    followed by its operand paren, not preceded by % or word chars."""
    import re

    return {
        op: len(re.findall(rf"(?<![%.\w-]){re.escape(op)}(?:-start)?\(", hlo))
        for op in COLLECTIVE_OPS
    }


def predicted_all_to_alls(circuit, n: int, n_dev: int) -> int:
    """The collective/sweeps engines' planned all_to_all count: one per
    victim-carrying segment plus the final restore's (<= 2)."""
    from tpu_qsim.schedule import plan_blockswap_segments
    from tpu_qsim.shardmap_engine import plan_restore_ops

    g_bits = int(np.log2(n_dev))
    segments, place = plan_blockswap_segments(circuit, g_bits)
    swaps = sum(1 for s in segments if s.victims is not None)
    restore = sum(1 for op in plan_restore_ops(place, n, g_bits)
                  if op[0] == "swap")
    return swaps + restore


def main() -> int:
    ap_ = argparse.ArgumentParser()
    ap_.add_argument("--size", type=int, default=18)
    ap_.add_argument("--gates", type=int, default=100)
    ap_.add_argument("--engines", default="gspmd,collective,sweeps")
    ap_.add_argument("--reps", type=int, default=8)
    ap_.add_argument("--time", action="store_true",
                     help="also wall-clock each engine (meaningful on real "
                          "multi-chip hardware)")
    ap_.add_argument("--seed", type=int, default=11)
    args = ap_.parse_args()

    jax = setup_jax()
    import jax.numpy as jnp

    import tpu_qsim as q
    from tpu_qsim.kernels.gridsweeps import GridParams
    from tpu_qsim.parallel import ShardedStateVectorSimulator, make_mesh

    n_dev = len(jax.devices())
    on_cpu = jax.default_backend() == "cpu"
    n = args.size
    mesh = make_mesh(("tp",), (n_dev,))
    circuit = q.random_circuit(n, args.gates, seed=args.seed)
    print(f"devices={n_dev} backend={jax.default_backend()} "
          f"size={n}q gates={args.gates}")

    expected = None
    if n <= 22:
        oracle = q.CPUReferenceSimulator(n)
        oracle.run(circuit)
        expected = oracle.get_state()

    pred = predicted_all_to_alls(circuit, n, n_dev) if n_dev > 1 else 0
    print(f"planner-predicted all_to_alls (collective/sweeps): {pred}")

    cfg = q.SimConfig(
        dtype="complex64", use_pallas=not on_cpu, donate_state=False,
        pallas_interpret=on_cpu,
    )
    grid_params = GridParams(rb_bits=3, a_max=2) if on_cpu else None

    for engine in args.engines.split(","):
        engine = engine.strip()
        try:
            sim = ShardedStateVectorSimulator(
                n, mesh=mesh, engine=engine, config=cfg,
                grid_params=grid_params,
            )
            fn = sim._dispatch_backend(circuit)
            hlo = jax.jit(fn).lower(sim.state_planes).compile().as_text()
            counts = count_collectives(hlo)
            shown = {k: v for k, v in counts.items() if v}
            sim.run(circuit)
            if expected is not None:
                err = float(np.max(np.abs(sim.get_state() - expected)))
                ok = f"max_amp_err={err:.2e}" + (" OK" if err < 1e-5 else " FAIL")
            else:
                tot = float(jnp.sum(sim.state_planes * sim.state_planes))
                ok = f"total_prob={tot:.6f}"
            line = f"{engine:11s} {ok}  collectives={shown or '{}'}"
            if args.time:
                t = time_chained(fn, sim.state_planes, reps=args.reps)
                tag = "" if n_dev > 1 else " [single-device: not a perf A/B]"
                line += f"  t={t*1e3:.3f} ms{tag}"
            print(line, flush=True)
        except Exception as e:
            print(f"{engine:11s} FAILED {type(e).__name__}: {str(e)[:160]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
