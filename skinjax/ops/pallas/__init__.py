"""Pallas TPU kernels: fused seq-1 fusion-stage ops and the (opt-in) fused
color-augmentation kernel."""

from skinjax.ops.pallas import fusion_kernels

__all__ = ["fusion_kernels"]
