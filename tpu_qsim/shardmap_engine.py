"""Explicit-collective distributed executor (shard_map + all_to_all).

The GSPMD path (:mod:`tpu_qsim.parallel`) lets XLA choose collectives. This
engine instead *states* the communication schedule — the TPU-native
equivalent of the hand-written NCCL pair exchanges in distributed
state-vector simulators (Haner & Steiger style), expressed as:

* **device-local gate application** on each shard's (2, 2^local) block
  (device d holds the amplitudes whose top G index bits equal d);
* **block swaps**: one ``jax.lax.all_to_all`` exchanges the G device-index
  bits with the top-G local bits; sandwiched between local tile-dense
  permutations it relocates any set of G qubits onto the device axis
  (schedule planned by :func:`tpu_qsim.schedule.plan_blockswap_segments`).

Communication per circuit = one all_to_all per segment boundary that needs
nonlocal qubits, plus at most two for the final restore-to-canonical. Every
byte rides ICI.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:  # jax >= 0.4.35 top-level API; the experimental home is deprecated
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from . import apply as ap
from .circuit import Circuit
from .schedule import SWAP_MIN, plan_blockswap_segments


# ---------------------------------------------------------------------------
# Permutation planning (pure host logic, unit-tested in tests/test_shardmap)
# ---------------------------------------------------------------------------

def _identity(k: int) -> tuple[int, ...]:
    return tuple(range(k))


def _invert(src: tuple[int, ...]) -> tuple[int, ...]:
    inv = [0] * len(src)
    for i, s in enumerate(src):
        inv[s] = i
    return tuple(inv)


def _local_src_for_targets(
    pos: list[int], targets: dict[int, int], local_bits: int
) -> tuple[int, ...]:
    """Local permutation (src[i] = old bit feeding new bit i) sending each
    qubit q in ``targets`` to bit targets[q]; everything else stays put when
    possible. Bits outside [0, local_bits) are untouched by construction."""
    src = [-1] * local_bits
    used_old = set()
    for q, newbit in targets.items():
        src[newbit] = pos[q]
        used_old.add(pos[q])
    # two passes: prefer identity, then fill
    free_old = [b for b in range(local_bits) if b not in used_old]
    free_old_set = set(free_old)
    for i in range(local_bits):
        if src[i] == -1 and i in free_old_set:
            src[i] = i
            free_old_set.remove(i)
    rest = sorted(free_old_set)
    for i in range(local_bits):
        if src[i] == -1:
            src[i] = rest.pop(0)
    return tuple(src)


class _Sim:
    """Placement simulator mirroring what the device ops do to index bits."""

    def __init__(self, pos: tuple[int, ...], n: int, g_bits: int):
        self.n = n
        self.local_bits = n - g_bits
        self.g = g_bits
        self.stage = list(range(self.local_bits - g_bits, self.local_bits))
        self.pos = list(pos)
        self.at = [0] * n
        for q, b in enumerate(self.pos):
            self.at[b] = q

    def local(self, src: tuple[int, ...]) -> None:
        new_at = list(self.at)
        for i, s in enumerate(src):
            new_at[i] = self.at[s]
        self.at = new_at
        for b, q in enumerate(self.at):
            self.pos[q] = b

    def swap(self) -> None:
        for j in range(self.g):
            a, b = self.stage[j], self.local_bits + j
            qa, qb = self.at[a], self.at[b]
            self.at[a], self.at[b] = qb, qa
            self.pos[qa], self.pos[qb] = b, a


def plan_restore_ops(
    pos: tuple[int, ...], n: int, g_bits: int, swap_min: int = SWAP_MIN
) -> list[tuple]:
    """Return ("local", src) / ("swap",) ops mapping ``pos`` to identity.

    Algorithm: (1) if the device block holds any device-destined qubit but
    is not entirely correct, flush it down with a courier swap; (2) stage
    every device-destined qubit at its stage slot and swap up; (3) one local
    cleanup. At most 2 all_to_alls.
    """
    sim = _Sim(pos, n, g_bits)
    L, G = sim.local_bits, g_bits
    ops: list[tuple] = []

    def emit_local(src: tuple[int, ...]) -> None:
        if src != _identity(L):
            sim.local(src)
            ops.append(("local", src))

    def emit_swap() -> None:
        sim.swap()
        ops.append(("swap",))

    dev_destined = list(range(L, n))
    device_correct = all(sim.pos[q] == q for q in dev_destined)
    if not device_correct:
        if any(sim.pos[q] >= L for q in dev_destined):
            # flush: stage couriers (local-destined qubits currently at
            # movable local bits — never bits < swap_min)
            couriers = [
                q for q in range(L) if swap_min <= sim.pos[q] < L
            ][:G]
            assert len(couriers) == G, "not enough courier slots"
            emit_local(
                _local_src_for_targets(
                    sim.pos, {q: sim.stage[j] for j, q in enumerate(couriers)}, L
                )
            )
            emit_swap()
        # now every device-destined qubit is local: stage and swap up
        emit_local(
            _local_src_for_targets(
                sim.pos, {q: sim.stage[j] for j, q in enumerate(dev_destined)}, L
            )
        )
        emit_swap()
    # local cleanup
    if any(sim.pos[q] != q for q in range(L)):
        emit_local(tuple(sim.pos[i] for i in range(L)))
    assert all(sim.pos[q] == q for q in range(n)), f"restore failed: {sim.pos}"
    return ops


def plan_victim_sandwich(
    victims: tuple[int, ...], local_bits: int, g_bits: int
) -> tuple[tuple[int, ...], tuple[int, ...]]:
    """(lam, lam_inv) local permutations realizing the planner's relabeling
    sigma = {victim_j <-> device bit L+j} as lam_inv . all_to_all . lam:
    lam sends victim_j's content to stage_j; lam_inv returns everything the
    sandwich displaced. Correct for arbitrary victim/stage overlap."""
    stage = list(range(local_bits - g_bits, local_bits))
    src = [-1] * local_bits
    used = set()
    for v, s in zip(victims, stage):
        src[s] = v
        used.add(v)
    free_old = [b for b in range(local_bits) if b not in used]
    free_set = set(free_old)
    for i in range(local_bits):
        if src[i] == -1 and i in free_set:
            src[i] = i
            free_set.remove(i)
    rest = sorted(free_set)
    for i in range(local_bits):
        if src[i] == -1:
            src[i] = rest.pop(0)
    lam = tuple(src)
    return lam, _invert(lam)


# ---------------------------------------------------------------------------
# Executor
# ---------------------------------------------------------------------------

def _build_local_kernel(
    seg_gates, local_bits: int, interpret: bool, grid_params
) -> Callable | None:
    """Compile one segment's (matrix, phys-qubits) gates into the kernel
    tier for a (2, 2^local) shard block: the grid-sweep engine when the
    block exceeds VMEM, the whole-block VMEM kernel when it fits, or None
    to fall back to the per-gate XLA apply loop."""
    from .kernels.fused_circuit import (
        MAX_PALLAS_QUBITS,
        MIN_PALLAS_QUBITS,
        build_pallas_run_gates,
    )
    from .kernels.gridsweeps import (
        MAX_GRID_QUBITS,
        MIN_GRID_QUBITS,
        build_grid_sweep_run,
    )

    pairs = [(mat, phys) for mat, phys in seg_gates]
    try:
        if grid_params is not None:
            if local_bits > grid_params.blk_bits + 1:
                return build_grid_sweep_run(
                    pairs,
                    np.float32,
                    interpret=interpret,
                    params=grid_params,
                    num_qubits=local_bits,
                ).run_state
        elif MIN_GRID_QUBITS + 1 <= local_bits <= MAX_GRID_QUBITS:
            return build_grid_sweep_run(
                pairs, np.float32, interpret=interpret, num_qubits=local_bits
            ).run_state
        if MIN_PALLAS_QUBITS <= local_bits <= MAX_PALLAS_QUBITS:
            return build_pallas_run_gates(
                pairs, local_bits, np.float32, interpret=interpret
            )
    except ValueError:
        pass
    return None


def build_shardmap_run(
    circuit: Circuit,
    mesh: Mesh,
    axis: str,
    rdtype: np.dtype,
    *,
    local_engine: str = "apply",
    kernel_interpret: bool = False,
    grid_params=None,
) -> Callable[[jax.Array], jax.Array]:
    """Compile ``circuit`` into a shard_map program over ``mesh[axis]``.

    Input/output: (2, 2^n) planes state sharded P(None, axis).

    ``local_engine="apply"`` runs each segment's device-local gates as a
    per-gate XLA loop; ``"kernels"`` compiles each segment through the
    single-chip kernel tier (whole-block VMEM kernel, or the grid-sweep
    engine when the shard exceeds VMEM) — the sweep x sharding composition:
    block swaps ride ICI between segments, kernels own the HBM inside one.
    ``grid_params`` (tests/dryrun) shrinks the grid-engine geometry.
    """
    n = circuit.num_qubits
    n_dev = mesh.shape[axis]
    g_bits = int(np.log2(n_dev))
    if (1 << g_bits) != n_dev:
        raise ValueError(f"device count {n_dev} must be a power of 2")
    local_bits = n - g_bits
    if local_bits < SWAP_MIN + 2 * g_bits:
        raise ValueError("too few local bits for block-swap relabeling")
    if local_engine not in ("apply", "kernels"):
        raise ValueError(f"unknown local_engine {local_engine!r}")
    segments, final_pos = plan_blockswap_segments(circuit, g_bits)
    restore_ops = plan_restore_ops(final_pos, n, g_bits)

    seg_consts = []
    for seg in segments:
        gates = []
        for mat, phys in seg.gates:
            ur, ui = ap.split_matrix(mat, rdtype)
            gates.append((phys, ur, ui))
        sandwich = (
            plan_victim_sandwich(seg.victims, local_bits, g_bits)
            if seg.victims is not None
            else None
        )
        kfn = (
            _build_local_kernel(
                seg.gates, local_bits, kernel_interpret, grid_params
            )
            if local_engine == "kernels"
            else None
        )
        seg_consts.append((sandwich, gates, kfn))

    def block_swap(block: jax.Array) -> jax.Array:
        # exchange the top-G local bits with the device axis
        l_dim = 1 << local_bits
        x = block.reshape(2, 1 << g_bits, l_dim >> g_bits)
        x = jax.lax.all_to_all(x, axis, split_axis=1, concat_axis=1, tiled=True)
        return x.reshape(2, l_dim)

    ident = _identity(local_bits)

    def step_local(block: jax.Array) -> jax.Array:
        for sandwich, gates, kfn in seg_consts:
            if sandwich is not None:
                lam, lam_inv = sandwich
                if lam != ident:
                    block = ap.permute_qubits(block, lam)
                block = block_swap(block)
                if lam_inv != ident:
                    block = ap.permute_qubits(block, lam_inv)
            if kfn is not None:
                block = kfn(block)
            else:
                for phys, ur, ui in gates:
                    block = ap.apply_unitary(block, ur, ui, phys)
        for op in restore_ops:
            if op[0] == "swap":
                block = block_swap(block)
            else:
                block = ap.permute_qubits(block, op[1])
        return block

    sharding = NamedSharding(mesh, P(None, axis))
    # check_vma=False: pallas_call outputs inside shard_map carry no
    # varying-mesh-axes annotation; the specs above fully pin the layout
    mapped = shard_map(
        step_local,
        mesh=mesh,
        in_specs=P(None, axis),
        out_specs=P(None, axis),
        check_vma=False,
    )
    return jax.jit(mapped, in_shardings=sharding, out_shardings=sharding)
