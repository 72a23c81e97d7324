"""Pallas (Mosaic) TPU kernels — the hand-tuned performance tier.

The XLA path in :mod:`tpu_qsim.apply` streams the state through HBM once per
fused gate group. These kernels instead keep the whole state resident in
VMEM across the *entire circuit* (one ``pallas_call``, two HBM passes
total) — the TPU analog of the reference's shared-memory tiled kernels
(reference src/OptimizedGates.cu:41-114), except the "tile" is the full
state and the fusion window is the whole program.
"""

from .dispatch import maybe_build_pallas_circuit_run  # noqa: F401
