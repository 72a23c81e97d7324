"""Runtime configuration.

The analog of the reference's compile-time knob surface (reference
include/Constants.hpp:56-75, include/OptimizedGates.cuh:65-68) — but as a
frozen dataclass threaded through simulator constructors, since XLA owns the
launch geometry that the reference's block-size constants controlled.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Configuration shared by the simulator backends.

    Attributes:
      dtype: complex dtype name for the state ("complex64" or "complex128").
        complex64 is the TPU-native choice; complex128 works on CPU (tests)
        and is emulated (slowly) elsewhere.
      fuse: run the gate-fusion pass before compiling circuits. Fusion is the
        TPU replacement for the reference's hand-written fused kernels
        (reference src/OptimizedGates.cu:344-382) — it lowers HBM passes per
        circuit, which is the dominant cost.
      max_fused_qubits: cap on the qubit count of one fused gate group
        (2^k x 2^k matrices; 5 -> 32x32, still cheap on the MXU).
      use_pallas: dispatch to the Pallas fused-circuit kernel when the state
        fits in VMEM; falls back to the XLA einsum path otherwise. The analog
        of the reference's smem-vs-coalesced auto-dispatch
        (reference src/OptimizedGates.cu:388-413).
      donate_state: donate the input state buffer to jit calls so XLA updates
        amplitudes in place (the functional replacement for the reference's
        mutate-one-buffer semantics).
    """

    dtype: str = "complex64"
    fuse: bool = True
    max_fused_qubits: int = 5
    use_pallas: bool = True
    pallas_interpret: bool = False  # run Pallas kernels interpreted (tests/CPU)
    # Largest state the whole-circuit VMEM-resident kernel handles; above it
    # the segmented grid path takes over. The default is set by Mosaic
    # compile time (not VMEM) — raise it if minutes-long one-time compiles
    # are acceptable for your circuit shapes (they cache persistently).
    pallas_whole_circuit_max: int = 18
    donate_state: bool = True
    # Deep-circuit precision mitigation: renormalize the state every N gate
    # groups on the XLA path (0 = never). f32-planes error grows ~sqrt(depth)
    # and is dominated by norm drift (measured: drift 6.4e-6 / max-amp-err
    # 1.6e-7 at 2000 gates, 1.3e-5 / 3.0e-7 at 4000; docs/PERF_NOTES.md);
    # periodic renormalization removes the scale component at the cost of
    # one reduction per N groups. The reference had no mitigation (complex128
    # everywhere, reference include/StateVector.cuh:66).
    renorm_every: int = 0

    @property
    def np_dtype(self) -> np.dtype:
        return np.dtype(self.dtype)

    @property
    def real_dtype(self) -> np.dtype:
        return np.dtype("float32" if self.dtype == "complex64" else "float64")

    def replace(self, **kw: Any) -> "SimConfig":
        return dataclasses.replace(self, **kw)


DEFAULT_CONFIG = SimConfig()
