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
    try:  # absent from pre-round-3 builds of the library
        lib.qsim_plan_grid_sweeps.restype = ctypes.c_int
        lib.qsim_plan_grid_sweeps.argtypes = [
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib._has_grid_planner = True
    except AttributeError:
        lib._has_grid_planner = False
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


def plan_grid_sweeps_native(
    gate_qubit_lists: list[tuple[int, ...]],
    gate_class_lists: list[tuple[int, ...]],
    moving_masks: list[int],
    a_max: int,
    max_gates: int,
) -> list[list[int]] | None:
    """Native grid-sweep partitioning; returns ``None`` if unavailable.

    Returns one list of gate indices per sweep, in emission order (the
    frontier scheduler may pull a later gate forward past non-commuting
    indices, so within-sweep order is NOT ascending). Bit-identical to
    ``tpu_qsim.kernels.gridsweeps.plan_grid_sweeps``'s pure-Python path
    (differentially tested in tests/test_native.py).
    """
    lib = _try_load()
    if lib is None or not getattr(lib, "_has_grid_planner", False):
        return None
    flat, offsets = _flatten(gate_qubit_lists)
    classes = np.asarray(
        [c for cs in gate_class_lists for c in cs], dtype=np.int8
    )
    if classes.size != flat.size:
        raise ValueError("gate_class_lists must align with gate_qubit_lists")
    masks = np.asarray(moving_masks, dtype=np.uint64)
    n = len(gate_qubit_lists)
    sweep_ids = np.zeros(n, dtype=np.int32)
    emit_order = np.zeros(n, dtype=np.int32)
    flat_c = flat if flat.size else np.zeros(1, dtype=np.int32)
    classes_c = classes if classes.size else np.zeros(1, dtype=np.int8)
    masks_c = masks if masks.size else np.zeros(1, dtype=np.uint64)
    ids_c = sweep_ids if n else np.zeros(1, dtype=np.int32)
    order_c = emit_order if n else np.zeros(1, dtype=np.int32)
    nsweeps = lib.qsim_plan_grid_sweeps(
        n,
        flat_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        classes_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        masks_c.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        a_max, max_gates,
        ids_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        order_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if nsweeps < 0:
        raise ValueError("native grid planner rejected the gate list")
    members: list[list[int]] = [[] for _ in range(nsweeps)]
    for gi in emit_order[:n]:
        members[int(sweep_ids[gi])].append(int(gi))
    return members


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
