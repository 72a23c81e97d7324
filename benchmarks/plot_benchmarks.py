#!/usr/bin/env python
"""Plot benchmark results (analog of reference benchmarks/plot_benchmarks.py
— but reading *measured* data instead of hard-coded arrays).

Feed it the stdout of benchmark_scaling.py / benchmark_gates.py saved to
files:

    python benchmarks/benchmark_scaling.py | tee scaling.txt
    python benchmarks/benchmark_gates.py   | tee gates.txt
    python benchmarks/plot_benchmarks.py --scaling scaling.txt --gates gates.txt

Writes PNGs next to the input files. Skips gracefully if matplotlib is
unavailable.
"""

from __future__ import annotations

import argparse
import os
import re
import sys


def parse_scaling(path: str):
    rows = []
    for line in open(path):
        m = re.match(r"\s*(\d+)\s+([\d,]+)\s+([\d.]+)\s+([\d.]+)\s+(\d+)"
                     r"\s+([\d.na]+)\s+([\d.na]+)", line)
        if m:
            rows.append({
                "qubits": int(m.group(1)),
                "init_ms": float(m.group(3)),
                "circuit_ms": float(m.group(4)),
                "gates_per_s": int(m.group(5)),
                "cpu_ms": None if "na" in m.group(6) else float(m.group(6)),
            })
    return rows


def parse_gates(path: str):
    rows = []
    for line in open(path):
        m = re.match(r"\s*(\w+)\s+(\d+)\s+([\w-]+)\s+([\d.]+)\s+(\d+)", line)
        if m and m.group(1) in ("h", "x", "rz", "cnot"):
            rows.append({
                "gate": m.group(1),
                "qubits": int(m.group(2)),
                "gates_per_s": int(m.group(5)),
            })
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling")
    ap.add_argument("--gates")
    ap.add_argument("--outdir", default=".")
    args = ap.parse_args()

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib not installed; skipping plots")
        return 0

    if args.scaling and os.path.exists(args.scaling):
        rows = parse_scaling(args.scaling)
        if rows:
            qs = [r["qubits"] for r in rows]
            fig, ax = plt.subplots(figsize=(7, 4.5))
            ax.semilogy(qs, [r["circuit_ms"] for r in rows], "o-",
                        label="TPU (100-gate circuit)")
            cpu = [(r["qubits"], r["cpu_ms"]) for r in rows if r["cpu_ms"]]
            if cpu:
                ax.semilogy([c[0] for c in cpu], [c[1] for c in cpu], "s--",
                            label="NumPy oracle (1 thread)")
            ax.set_xlabel("qubits")
            ax.set_ylabel("wall-clock (ms)")
            ax.set_title("100-gate random circuit: TPU vs CPU oracle")
            ax.grid(True, alpha=0.3)
            ax.legend()
            out = os.path.join(args.outdir, "scaling.png")
            fig.savefig(out, dpi=120, bbox_inches="tight")
            print("wrote", out)

    if args.gates and os.path.exists(args.gates):
        rows = parse_gates(args.gates)
        if rows:
            sizes = sorted({r["qubits"] for r in rows})
            fig, ax = plt.subplots(figsize=(7, 4.5))
            for gname in ("h", "x", "rz", "cnot"):
                ys = [next((r["gates_per_s"] for r in rows
                            if r["gate"] == gname and r["qubits"] == n), None)
                      for n in sizes]
                ax.semilogy(sizes, ys, "o-", label=gname)
            ax.set_xlabel("qubits")
            ax.set_ylabel("gates / second")
            ax.set_title("Gate throughput by type")
            ax.grid(True, alpha=0.3)
            ax.legend()
            out = os.path.join(args.outdir, "gate_throughput.png")
            fig.savefig(out, dpi=120, bbox_inches="tight")
            print("wrote", out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
