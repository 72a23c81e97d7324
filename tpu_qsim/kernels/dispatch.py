"""Auto-dispatch between the Pallas kernel tier and the XLA engine.

The analog of the reference's shared-memory-vs-coalesced dispatcher
(reference src/OptimizedGates.cu:388-413): pick the hand-tuned kernel when
its preconditions hold, fall back to the always-correct general path
otherwise. Preconditions for the VMEM-resident whole-circuit kernel:

* float32 state (the TPU-native dtype),
* enough qubits that rows exist (n >= 10) and few enough that the state
  fits in VMEM with headroom (n <= 20),
* running on a real TPU backend (or interpret=True for tests).
"""

from __future__ import annotations

from typing import Callable

import numpy as np

import jax

from ..circuit import Circuit
from ..config import SimConfig
from .fused_circuit import (
    HARD_MAX_PALLAS_QUBITS,
    MAX_PALLAS_QUBITS,
    MIN_PALLAS_QUBITS,
    build_pallas_run,
)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False


def pallas_supported(num_qubits: int, rdtype, config: SimConfig) -> bool:
    ceiling = min(
        getattr(config, "pallas_whole_circuit_max", MAX_PALLAS_QUBITS),
        HARD_MAX_PALLAS_QUBITS,
    )
    return (
        config.use_pallas
        and np.dtype(rdtype) == np.float32
        and MIN_PALLAS_QUBITS <= num_qubits <= ceiling
        and (_on_tpu() or config_interpret(config))
    )


def config_interpret(config: SimConfig) -> bool:
    return bool(getattr(config, "pallas_interpret", False))


def maybe_build_pallas_circuit_run(
    circuit: Circuit, rdtype, config: SimConfig
) -> Callable | None:
    """Build the best Pallas path for this circuit, or None to fall back.

    n in [10, 20]  -> whole-circuit VMEM-resident kernel
    n in (20, 21]  -> segmented kernel with relocations folded into I/O
    n in [22, 30]  -> active-bit grid sweep pipeline (donating at 29q+)
    """
    n = circuit.num_qubits
    if pallas_supported(n, rdtype, config):
        return build_pallas_run(
            circuit, np.float32, interpret=config_interpret(config)
        )
    if (
        config.use_pallas
        and np.dtype(rdtype) == np.float32
        and n > MIN_PALLAS_QUBITS
        and (_on_tpu() or config_interpret(config))
    ):
        from .gridsweeps import MAX_GRID_QUBITS, build_grid_sweep_run
        from .segmented import MAX_SEGMENTED_QUBITS, build_segmented_run
        from .sweeps import MIN_SWEEP_QUBITS, MAX_SWEEP_QUBITS, build_sweep_run

        if 20 <= n <= MAX_GRID_QUBITS:
            # overlapped-streaming grid engine: measured faster than the
            # staged map engine at every 22q+ bench size (grid pipeline
            # hides kernel compute under the block streams) and than the
            # segmented engine at 20q (whole-state 1-sweep program)
            try:
                return build_grid_sweep_run(
                    circuit, np.float32, interpret=config_interpret(config)
                )
            except ValueError:
                pass  # e.g. a dense gate wider than the active budget
        if MIN_SWEEP_QUBITS <= n <= MAX_SWEEP_QUBITS:
            try:
                return build_sweep_run(
                    circuit, np.float32, interpret=config_interpret(config)
                )
            except ValueError:
                pass  # e.g. a gate the sweep planner cannot place
        if n <= MAX_SEGMENTED_QUBITS:
            return build_segmented_run(
                circuit, np.float32, interpret=config_interpret(config)
            )
    return None

