"""ctypes bindings for the native (C++) planner.

Loads ``libqsimnative.so`` if present (build with ``make -C tpu_qsim/native``
or ``python -m tpu_qsim.native.build``); every entry point has a pure-Python
fallback, so the library is optional. The native planner is used by default
for large circuits where Python-side planning becomes measurable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libqsimnative.so")
_lib: ctypes.CDLL | None = None


def _try_load() -> ctypes.CDLL | None:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.qsim_plan_groups.restype = ctypes.c_int
    lib.qsim_plan_groups.argtypes = [
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
    ]
    lib.qsim_circuit_depth.restype = ctypes.c_int
    lib.qsim_circuit_depth.argtypes = [
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.qsim_histogram.restype = None
    lib.qsim_histogram.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    _lib = lib
    return lib


def build(verbose: bool = False) -> bool:
    """Compile the shared library in-tree (g++ -O2 -shared -fPIC)."""
    src = os.path.join(os.path.dirname(__file__), "fusion.cpp")
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src, "-o", _LIB_PATH]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return False
    if res.returncode != 0:
        if verbose:
            print(res.stderr, file=sys.stderr)
        return False
    return _try_load() is not None


def available() -> bool:
    return _try_load() is not None


def _flatten(gate_qubit_lists: list[tuple[int, ...]]) -> tuple[np.ndarray, np.ndarray]:
    offsets = np.zeros(len(gate_qubit_lists) + 1, dtype=np.int32)
    flat = []
    for i, qs in enumerate(gate_qubit_lists):
        flat.extend(qs)
        offsets[i + 1] = len(flat)
    return np.asarray(flat, dtype=np.int32), offsets


def plan_groups_native(
    num_qubits: int, gate_qubit_lists: list[tuple[int, ...]], max_fused: int
) -> list[list[int]] | None:
    """Native fusion planning; returns None if the library is unavailable."""
    lib = _try_load()
    if lib is None:
        return None
    flat, offsets = _flatten(gate_qubit_lists)
    n = len(gate_qubit_lists)
    out = np.zeros(n, dtype=np.int32)
    flat_c = flat if flat.size else np.zeros(1, dtype=np.int32)
    ngroups = lib.qsim_plan_groups(
        num_qubits, n,
        flat_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        max_fused,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if ngroups < 0:
        raise ValueError("native planner rejected the circuit")
    members: list[list[int]] = [[] for _ in range(ngroups)]
    for gi, grp in enumerate(out):
        members[int(grp)].append(gi)
    return members


def circuit_depth_native(
    num_qubits: int, gate_qubit_lists: list[tuple[int, ...]]
) -> int | None:
    lib = _try_load()
    if lib is None:
        return None
    flat, offsets = _flatten(gate_qubit_lists)
    flat_c = flat if flat.size else np.zeros(1, dtype=np.int32)
    d = lib.qsim_circuit_depth(
        num_qubits, len(gate_qubit_lists),
        flat_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if d < 0:
        raise ValueError("native depth computation rejected the circuit")
    return d


def histogram_native(samples: np.ndarray, num_bins: int) -> np.ndarray | None:
    lib = _try_load()
    if lib is None:
        return None
    samples = np.ascontiguousarray(samples, dtype=np.int32).ravel()
    counts = np.zeros(num_bins, dtype=np.int64)
    lib.qsim_histogram(
        samples.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        samples.size, num_bins,
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return counts
