"""Multi-chip execution: qubit-sharded states and data-parallel trajectories.

The reference had **no** distributed execution of any kind — "Multi-GPU
support" was an unchecked future-work box (reference README.md:363-367). This
module is the TPU-native version of that missing tier, built the SPMD way:

* **Amplitude (qubit) sharding — the TP analog.** The flat 2^n amplitude
  axis is sharded over an ICI mesh axis: device d holds the amplitudes whose
  top log2(D) index bits equal d. Gates on the low n - log2(D) qubits are
  embarrassingly local; gates touching the sharded top qubits become
  cross-chip exchanges. We annotate shardings with
  ``jax.sharding.NamedSharding`` and let XLA GSPMD insert the collectives
  (all-to-all / collective-permute over ICI) — the idiomatic TPU replacement
  for the NCCL point-to-point the CUDA literature uses for distributed
  state vectors (Haner & Steiger style pair exchanges).
* **Trajectory batching — the DP analog.** ``ShardedBatchedSimulator``
  shards the (batch, 2, 2^n) trajectory array over a ``dp`` mesh axis; the
  vmapped trajectory step contains no cross-trajectory communication, so it
  scales linearly with zero collectives.

Both compose: a 2D ('dp', 'tp') mesh shards trajectories over 'dp' and each
trajectory's amplitudes over 'tp' (see ``__graft_entry__.dryrun_multichip``).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from . import apply as ap
from .circuit import Circuit
from .config import DEFAULT_CONFIG, SimConfig
from .fusion import fuse_circuit, unfused_circuit
from .noise import NoiseModel
from .noisy import BatchedSimulator, build_trajectory_step
from .statevector import StateVectorSimulator


def make_mesh(
    axis_names: Sequence[str] = ("tp",),
    shape: Sequence[int] | None = None,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a device mesh. Default: all devices on one axis."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = [len(devices)] + [1] * (len(axis_names) - 1)
    arr = np.array(devices).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


# Measured on the 8-virtual-device mesh (docs/PERF_NOTES.md §15): the GSPMD
# engine's partitioned program ALL-GATHERS the full state to every device
# and runs gates replicated — correct, but its per-device footprint is the
# FULL state, which defeats the purpose of sharding exactly in the regime
# (27q+, > 1 GiB of planes) where sharding exists. Above this limit the
# "auto" default resolves to the explicit-collective engine (true 1/D
# per-device footprint), and an EXPLICIT engine="gspmd" request raises
# unless ``allow_replication=True``.
GSPMD_REPLICATION_LIMIT_BYTES = 1 << 30


class ShardedStateVectorSimulator(StateVectorSimulator):
    """State-vector simulator with the amplitude axis sharded over a mesh.

    The state keeps its (2, 2^n) planes layout; sharding spec is
    ``P(None, axis)`` — planes replicated, amplitudes split. Requires
    2^n >= shard count.
    """

    def __init__(
        self,
        num_qubits: int,
        mesh: Mesh | None = None,
        axis: str = "tp",
        config: SimConfig = DEFAULT_CONFIG,
        *,
        engine: str = "auto",
        seed: int = 0,
        grid_params=None,
        allow_replication: bool = False,
    ):
        """``engine``: "auto" (default) picks "gspmd" for states small
        enough that its measured full-state replication (PERF_NOTES §15) is
        harmless and "collective" beyond ``GSPMD_REPLICATION_LIMIT_BYTES``;
        "gspmd" lets XLA insert collectives from sharding annotations
        (hard-guarded above the limit — pass ``allow_replication=True`` to
        accept the full-state-per-device footprint); "collective" uses the
        explicit shard_map + all_to_all schedule
        (:mod:`tpu_qsim.shardmap_engine`); "sweeps" is the same schedule
        with each segment's device-local gates compiled through the
        single-chip kernel tier (whole-block VMEM kernel or the grid-sweep
        engine for shards beyond VMEM) — the sweep x sharding composition.
        ``grid_params`` shrinks the sweep geometry for tests/dryruns."""
        if engine not in ("auto", "gspmd", "collective", "sweeps"):
            raise ValueError(f"unknown engine {engine!r}")
        planes_bytes = (1 << num_qubits) * np.dtype(config.dtype).itemsize
        if engine == "auto":
            engine = (
                "gspmd"
                if planes_bytes <= GSPMD_REPLICATION_LIMIT_BYTES
                else "collective"
            )
        elif (
            engine == "gspmd"
            and planes_bytes > GSPMD_REPLICATION_LIMIT_BYTES
            and not allow_replication
        ):
            raise ValueError(
                f"engine='gspmd' at {num_qubits} qubits: the GSPMD "
                f"partitioned program replicates the FULL "
                f"{planes_bytes / 2**30:.1f} GiB state onto every device "
                "(measured: it all-gathers instead of exchanging, "
                "docs/PERF_NOTES.md §15), so per-device memory does NOT "
                "shrink with the mesh. Use engine='collective' or "
                "engine='sweeps' (true 1/D per-device footprint), or pass "
                "allow_replication=True to accept the footprint."
            )
        self.engine = engine
        self.grid_params = grid_params
        self.mesh = mesh if mesh is not None else make_mesh((axis,))
        self.axis = axis
        n_shards = int(np.prod([self.mesh.shape[a] for a in (axis,)]))
        if (1 << num_qubits) % n_shards != 0:
            raise ValueError(
                f"2^{num_qubits} amplitudes not divisible by {n_shards} shards"
            )
        self._sharding = NamedSharding(self.mesh, P(None, axis))
        super().__init__(num_qubits, config, seed=seed)
        # re-place the initial state under the sharding
        self._state = self._place(self._state)

    def _place(self, state: jax.Array) -> jax.Array:
        return jax.device_put(state, self._sharding)

    def reset(self, basis_index: int = 0) -> None:
        super().reset(basis_index)
        self._state = self._place(self._state)

    def set_state(self, amplitudes: Any) -> None:
        super().set_state(amplitudes)
        self._state = self._place(self._state)

    def _dispatch_backend(self, circuit: Circuit) -> Callable:
        if self.engine in ("collective", "sweeps"):
            from .shardmap_engine import build_shardmap_run

            return build_shardmap_run(
                circuit,
                self.mesh,
                self.axis,
                self._rdtype,
                local_engine="kernels" if self.engine == "sweeps" else "apply",
                kernel_interpret=bool(
                    getattr(self.config, "pallas_interpret", False)
                ),
                grid_params=self.grid_params,
            )
        # GSPMD engine: the Pallas single-chip kernel does not apply; build
        # the XLA program and pin input/output shardings so XLA partitions it.
        if self.config.fuse:
            groups = fuse_circuit(circuit, self.config.max_fused_qubits)
        else:
            groups = unfused_circuit(circuit)
        consts = []
        for g in groups:
            mat = g.diag if g.diagonal else g.matrix
            ur, ui = ap.split_matrix(mat, self._rdtype)
            consts.append((g.qubits, g.diagonal, ur, ui))

        def step(state: jax.Array) -> jax.Array:
            for qubits, diagonal, ur, ui in consts:
                if diagonal:
                    state = ap.apply_diagonal(state, ur, ui, qubits)
                else:
                    state = ap.apply_unitary(state, ur, ui, qubits)
            return state

        return jax.jit(
            step,
            in_shardings=self._sharding,
            out_shardings=self._sharding,
            donate_argnums=(0,) if self.config.donate_state else (),
        )


class ShardedBatchedSimulator(BatchedSimulator):
    """Trajectory batch sharded over a 'dp' mesh axis (optionally with the
    amplitude axis sharded over 'tp' as well for very large states)."""

    def __init__(
        self,
        num_qubits: int,
        batch_size: int,
        noise_model: NoiseModel | None = None,
        mesh: Mesh | None = None,
        dp_axis: str = "dp",
        tp_axis: str | None = None,
        config: SimConfig = DEFAULT_CONFIG,
        *,
        seed: int = 0,
    ):
        self.mesh = mesh if mesh is not None else make_mesh((dp_axis,))
        self.dp_axis = dp_axis
        self.tp_axis = tp_axis
        dp = self.mesh.shape[dp_axis]
        if batch_size % dp != 0:
            raise ValueError(
                f"batch_size {batch_size} not divisible by dp={dp} shards"
            )
        if tp_axis is not None and (1 << num_qubits) % self.mesh.shape[tp_axis]:
            raise ValueError("2^n amplitudes not divisible by tp shards")
        spec = P(dp_axis, None, tp_axis)
        self._sharding = None  # set before super().__init__ touches state
        super().__init__(num_qubits, batch_size, noise_model, config, seed=seed)
        self._sharding = NamedSharding(self.mesh, spec)
        self._key_sharding = NamedSharding(self.mesh, P(dp_axis, None))
        self._states = jax.device_put(self._states, self._sharding)

    def reset(self, basis_index: int = 0) -> None:
        super().reset(basis_index)
        if self._sharding is not None:
            self._states = jax.device_put(self._states, self._sharding)

    def set_state(self, amplitudes) -> None:
        super().set_state(amplitudes)
        if self._sharding is not None:
            self._states = jax.device_put(self._states, self._sharding)

    def _compiled_run(self, circuit: Circuit) -> Callable:
        cache_key = (circuit.signature(), self.noise_model.signature(), "sharded")
        fn = self._run_cache.get(cache_key)
        if fn is None:
            step, _ = build_trajectory_step(
                circuit, self.noise_model, self._rdtype,
                getattr(self, "insertion", "all"),
            )
            fn = jax.jit(
                jax.vmap(step),
                in_shardings=(self._sharding, self._key_sharding),
                out_shardings=self._sharding,
                donate_argnums=(0,) if self.config.donate_state else (),
            )
            self._run_cache[cache_key] = fn
        return fn

    def run(self, circuit: Circuit, key: jax.Array | None = None):
        if circuit.num_qubits != self.num_qubits:
            raise ValueError(
                f"circuit has {circuit.num_qubits} qubits, simulator has "
                f"{self.num_qubits}"
            )
        keys = jax.random.split(self._next_key(key), self.batch_size)
        keys = jax.device_put(keys, self._key_sharding)
        self._states = self._compiled_run(circuit)(self._states, keys)
        return self
