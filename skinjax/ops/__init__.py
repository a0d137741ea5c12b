"""Core compute ops: torch-parity attention, losses-adjacent math, Pallas kernels."""

from skinjax.ops.attention import MultiHeadAttention

__all__ = ["MultiHeadAttention"]
