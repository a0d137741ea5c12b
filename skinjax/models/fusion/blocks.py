"""Fusion building blocks (TPU-first re-designs of the reference's block zoo).

Numerical contracts match the reference modules so checkpoints/metrics are
comparable (reference pointers in each docstring), but layout is batch-first
``(B, S, D)`` / pooled ``(B, D)`` and everything is jit-static.

All blocks take ``deterministic`` to gate dropout and accept a compute
``dtype`` (bf16 on TPU) with fp32 params.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from skinjax.ops.attention import MultiHeadAttention

# torch nn.LayerNorm uses eps=1e-5 (flax default is 1e-6) — keep torch parity.
LN_EPS = 1e-5


def _ln(name: str, dtype, param_dtype=jnp.float32) -> nn.LayerNorm:
    return nn.LayerNorm(epsilon=LN_EPS, dtype=dtype, param_dtype=param_dtype, name=name)


class GatedAlteredResidualBlock(nn.Module):
    """Gated residual attention: ``LN(g*attn(q,k,v) + (1-g)*q)``.

    Re-design of reference gatedResidualBlock.py:4-17 (GatedAlteredResidualBlock):
    MHA (8 heads) + dropout, sigmoid gate from a linear on q, convex blend,
    post-LayerNorm. At seq-1 the MHA collapses to two fused matmuls (see
    skinjax.ops.attention), so this whole block is 4 matmuls + pointwise —
    one VMEM-resident Pallas region in the fused path.
    """

    dim: int
    num_heads: int = 8
    dropout_rate: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, q, k, v, *, deterministic: bool = True):
        attn = MultiHeadAttention(
            self.dim, self.num_heads, dtype=self.dtype, name="attn"
        )(q, k, v, deterministic=deterministic)
        attn = nn.Dropout(self.dropout_rate)(attn, deterministic=deterministic)
        gate = jax.nn.sigmoid(
            nn.Dense(self.dim, dtype=self.dtype, name="gate_linear")(q)
        )
        out = gate * attn + (1.0 - gate) * q
        return _ln("norm", self.dtype)(out)


class StackedGatedResidualBlock(nn.Module):
    """Depth-N stack of GatedAlteredResidualBlock (gatedResidualBlock.py:20-42).

    q is threaded through the stack; k/v stay fixed (defaults to q).
    """

    dim: int
    depth: int = 4
    num_heads: int = 8
    dropout_rate: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, q, k=None, v=None, *, deterministic: bool = True):
        k = q if k is None else k
        v = q if v is None else v
        for i in range(self.depth):
            q = GatedAlteredResidualBlock(
                self.dim,
                self.num_heads,
                self.dropout_rate,
                dtype=self.dtype,
                name=f"block_{i}",
            )(q, k, v, deterministic=deterministic)
        return q


class ResidualBlock(nn.Module):
    """Post-norm residual MHA: ``LN(attn(q,k,v) + q)`` (residualBlock.py:4-17).

    The reference hardcodes num_heads=512 (head_dim 1 at D=512) — kept as the
    default for parity, configurable for sanity.
    """

    dim: int
    num_heads: int = 512
    dropout_rate: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, q, k, v, *, deterministic: bool = True):
        attn = MultiHeadAttention(
            self.dim, self.num_heads, dtype=self.dtype, name="attn"
        )(q, k, v, deterministic=deterministic)
        attn = nn.Dropout(self.dropout_rate)(attn, deterministic=deterministic)
        return _ln("norm", self.dtype)(attn + q)


class AlteredResidualBlock(nn.Module):
    """Pre-norm MHA + FFN with learned-alpha residual (alteredResidualBlock.py:4-39).

    out1 = q + alpha * dropout(attn(LN(q), k, v));
    out  = LN(out1 + FFN(out1)), FFN = Dense(4D) -> GELU -> Dense(D).
    """

    dim: int
    num_heads: int = 8
    dropout_rate: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, q, k, v, *, deterministic: bool = True):
        qn = _ln("norm1", self.dtype)(q)
        attn = MultiHeadAttention(
            self.dim, self.num_heads, dtype=self.dtype, name="attn"
        )(qn, k, v, deterministic=deterministic)
        attn = nn.Dropout(self.dropout_rate)(attn, deterministic=deterministic)
        alpha = self.param("alpha", nn.initializers.ones, ())
        out1 = q + alpha.astype(attn.dtype) * attn

        h = nn.Dense(self.dim * 4, dtype=self.dtype, name="ffn_in")(out1)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        h = nn.Dense(self.dim, dtype=self.dtype, name="ffn_out")(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return _ln("norm2", self.dtype)(out1 + h)


class TransformerAttentionBlock(nn.Module):
    """Standard post-norm transformer block (attentionBlock.py:3-27)."""

    dim: int
    num_heads: int
    dropout_rate: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        attn = MultiHeadAttention(
            self.dim,
            self.num_heads,
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
            name="attention",
        )(x, x, x, deterministic=deterministic)
        x = _ln("norm1", self.dtype)(
            x + nn.Dropout(self.dropout_rate)(attn, deterministic=deterministic)
        )
        h = nn.Dense(4 * self.dim, dtype=self.dtype, name="ff_in")(x)
        h = nn.relu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="ff_out")(h)
        return _ln("norm2", self.dtype)(
            x + nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        )


class SimpleAttentionBlock(nn.Module):
    """Bare MHA + dropout (simplestAttentionBlock.py:4-26)."""

    dim: int
    num_heads: int
    dropout_rate: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        attn = MultiHeadAttention(
            self.dim,
            self.num_heads,
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
            name="attention",
        )(x, x, x, deterministic=deterministic)
        return nn.Dropout(self.dropout_rate)(attn, deterministic=deterministic)


class MetaBlock(nn.Module):
    """MetaBlock FiLM modulation (metablock.py:5-32, Pacheco et al.).

    ``out = sigmoid(tanh(V * fb(U)) + gb(U))`` with fb/gb = Dense + LayerNorm.
    Works on latent vectors (B, V_dim) with metadata (B, U_dim); for spatial
    inputs (B, H, W, V_dim) the modulators broadcast over H, W (MD-Net's
    spatial variant, multimodalMDNet.py:33-57).
    """

    v_dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, visual, metadata):
        t1 = _ln("fb_norm", self.dtype)(
            nn.Dense(self.v_dim, dtype=self.dtype, name="fb")(metadata)
        )
        t2 = _ln("gb_norm", self.dtype)(
            nn.Dense(self.v_dim, dtype=self.dtype, name="gb")(metadata)
        )
        if visual.ndim == 4:  # NHWC spatial features: broadcast over H, W
            t1 = t1[:, None, None, :]
            t2 = t2[:, None, None, :]
        return jax.nn.sigmoid(jnp.tanh(visual * t1) + t2)


class MetaNet(nn.Module):
    """Metadata-driven channel attention / GCell (metanet.py:26-50).

    metadata (B, meta_dim) -> two 1x1 "convs" (pointwise Dense on a 1x1 map)
    -> sigmoid channel gates (B, C) -> gate NHWC feature maps.
    """

    middle_channels: int
    out_channels: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, feat_maps, metadata):
        # A 1x1 conv over a (B, 1, 1, meta) map IS a dense layer — use the MXU
        # directly instead of pretending there is a spatial conv.
        h = nn.Dense(self.middle_channels, dtype=self.dtype, name="fc1")(metadata)
        h = nn.relu(h)
        gates = jax.nn.sigmoid(
            nn.Dense(self.out_channels, dtype=self.dtype, name="fc2")(h)
        )
        if feat_maps.ndim == 4:  # NHWC
            gates = gates[:, None, None, :]
        return feat_maps * gates


class FeatureModulation(nn.Module):
    """FiLM scale/shift from metadata (featureWiseResidualBlock.py:4-17)."""

    dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, visual_feats, metadata):
        scale = nn.Dense(self.dim, dtype=self.dtype, name="scale")(metadata)
        shift = nn.Dense(self.dim, dtype=self.dtype, name="shift")(metadata)
        if visual_feats.ndim == 3:  # (B, S, D): broadcast over sequence
            scale = scale[:, None, :]
            shift = shift[:, None, :]
        return visual_feats * scale + shift


class MLPHead(nn.Module):
    """The reference's fusion MLP head (multimodalIntraInterModal.py:134-160).

    Dense(D) -> LN -> ReLU -> Dropout -> Dense(D/2) -> LN -> ReLU -> Dropout
    -> Dense(num_classes). ``hidden`` is the reference's ``common_dim``.
    """

    hidden: int
    num_classes: int
    dropout_rate: float = 0.5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = _ln("norm1", self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        x = nn.Dense(self.hidden // 2, dtype=self.dtype, name="fc2")(x)
        x = _ln("norm2", self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc_out")(x)


class MLP(nn.Module):
    """Generic ReLU MLP (e.g. the one-hot text tower,
    multimodalIntraInterModal.py:57-64: vocab -> 256 -> 512 -> out)."""

    features: Sequence[int]
    dropout_rate: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        for i, f in enumerate(self.features):
            x = nn.Dense(f, dtype=self.dtype, name=f"fc{i}")(x)
            if i < len(self.features) - 1:
                x = nn.relu(x)
                if self.dropout_rate > 0:
                    x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return x
