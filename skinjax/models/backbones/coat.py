"""CoaT-lite — timm ``coat.py`` layout (Flax).

``coat_lite_small`` (BACC 0.7919 in the reference's published table,
frugality_bacc_by_models.py:5-17) loads through the generic timm path
(loadImageModelClassifier.py:115-150). The previous sketch ran plain global
MHA; this module implements the real CoaT serial block:

- per-stage patch embed (conv 4×4/4 then 2×2/2) + LayerNorm on tokens,
- per-stage cls token inserted before the serial blocks,
- shared-per-stage ConvPosEnc (depthwise 3×3 on the image tokens, residual),
- factorized attention: softmax(K over tokens)ᵀV aggregated once, then Q
  against the (Ch×Ch) factor — linear in sequence length,
- shared-per-stage ConvRelPosEnc: multi-window depthwise convs over V
  (heads split across window sizes), gated by Q,
- final LayerNorm on stage-4 tokens; the cls token is the feature the
  reference's ``reset_classifier(0)`` model returns.

TPU notes: factorized attention is two small MXU matmuls per head (N×Ch and
Ch×Ch) instead of an N×N score matrix; softmax accumulates fp32; the crpe
depthwise convs are grouped convs over an NHWC map (no gathers).
"""

from __future__ import annotations

import os as _os
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.linen import dtypes as _dtypes


class _DenseParams(nn.Module):
    """Owns a Dense-shaped (kernel, bias) pair WITHOUT running the matmul —
    same param tree, names, and initializers as ``nn.Dense`` so checkpoints
    and the timm importer (torch_import.import_coat) are layout-identical,
    while the caller is free to route the compute through the fused MLP
    kernel (ops/pallas/fused_mlp.py) or the XLA chain."""

    in_dim: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.in_dim, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


def coat_mlp_mode() -> str:
    """SKINJAX_COAT_MLP resolution: 'fused' (default) = Pallas fused
    fc1->GELU->fc2 (ops/pallas/fused_mlp.py) on blocks whose bf16 hidden
    intermediate is >=48 MB — the stage-1/2 HBM-roofline chains DESIGN §5o
    profiled; measured same-run on the v5e (bench/ab_coat_mlp.py, DESIGN
    §5p): 946.3/946.8 img/s fused vs 879.4/875.7 XLA at B=64 (+7.7-8.1%),
    no compile-helper crash, both passes. '' = XLA two-Dense chain,
    'all' = every serial block. Export tracing always '' (the native ONNX
    emitter cannot express pallas_call)."""
    if _os.environ.get("SKINJAX_EXPORT_COMPAT", "") == "1":
        return ""
    return _os.environ.get("SKINJAX_COAT_MLP", "fused")


_FUSED_MLP_MIN_BYTES = 48 * 1024 * 1024


class ConvPosEnc(nn.Module):
    """Depthwise 3×3 over the image tokens, residual; cls token passes
    through (coat ConvPosEnc)."""

    dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, hw: Tuple[int, int]):
        H, W = hw
        B, N, C = x.shape
        cls, img = x[:, :1], x[:, 1:]
        feat = img.reshape(B, H, W, C)
        feat = feat + nn.Conv(C, (3, 3), padding=[(1, 1)] * 2,
                              feature_group_count=C, dtype=self.dtype,
                              name="proj")(feat)
        return jnp.concatenate([cls, feat.reshape(B, H * W, C)], axis=1)


class ConvRelPosEnc(nn.Module):
    """Multi-window depthwise convs over V, gated by Q (coat ConvRelPosEnc).
    ``windows``: ((kernel, num_heads), ...) — head splits must sum to the
    attention's head count."""

    head_dim: int
    windows: Tuple[Tuple[int, int], ...] = ((3, 2), (5, 3), (7, 3))
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, q, v, hw: Tuple[int, int]):
        H, W = hw
        B, h, N, Ch = q.shape
        q_img, v_img = q[:, :, 1:], v[:, :, 1:]
        # (B, h, HW, Ch) -> (B, H, W, h*Ch), head-major channel order like
        # torch's rearrange "b h (H W) c -> b (h c) H W"
        v_map = v_img.transpose(0, 2, 1, 3).reshape(B, H, W, h * Ch)
        outs = []
        c0 = 0
        for i, (k, heads) in enumerate(self.windows):
            ch = heads * self.head_dim
            seg = v_map[..., c0:c0 + ch]
            outs.append(nn.Conv(ch, (k, k), padding=[(k // 2, k // 2)] * 2,
                                feature_group_count=ch, dtype=self.dtype,
                                name=f"conv{i}")(seg))
            c0 += ch
        conv_v = jnp.concatenate(outs, axis=-1)
        conv_v = conv_v.reshape(B, H * W, h, Ch).transpose(0, 2, 1, 3)
        ev = q_img * conv_v
        zero = jnp.zeros((B, h, 1, Ch), ev.dtype)
        return jnp.concatenate([zero, ev], axis=2)


class CoaTLite(nn.Module):
    """timm coat-lite topology (serial blocks only). Returns the normed
    stage-4 cls token (B, dims[-1]) — the ``reset_classifier(0)`` output."""

    dims: Sequence[int] = (64, 128, 320, 512)
    depths: Sequence[int] = (3, 4, 6, 3)
    heads: int = 8
    mlp_ratios: Sequence[float] = (8.0, 8.0, 4.0, 4.0)
    crpe_windows: Tuple[Tuple[int, int], ...] = ((3, 2), (5, 3), (7, 3))
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False,
                 capture: bool = False, feature_delta=None):
        """``capture``/``feature_delta``: CAM injection on the (B, 7, 7, D)
        image-token grid ENTERING the final stage-4 serial block — CoaT-lite
        pools the stage-4 CLS token, so the delta must precede the last
        token mixing to be visible to the read-out (xai/cam.py)."""
        B = x.shape[0]
        fmap = None
        last_stage = len(self.dims) - 1
        for si, (dim, depth, ratio) in enumerate(
            zip(self.dims, self.depths, self.mlp_ratios)
        ):
            k = 4 if si == 0 else 2
            x = nn.Conv(dim, (k, k), strides=(k, k), dtype=self.dtype,
                        name=f"patch_embed{si + 1}_proj")(x)
            H, W = x.shape[1:3]
            x = x.reshape(B, H * W, dim)
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             name=f"patch_embed{si + 1}_norm")(x)
            cls = self.param(f"cls_token{si + 1}",
                             nn.initializers.normal(0.02), (1, 1, dim))
            x = jnp.concatenate(
                [jnp.broadcast_to(cls.astype(x.dtype), (B, 1, dim)), x], axis=1
            )
            # cpe/crpe are shared across the stage's blocks (timm coat keeps
            # one copy per stage in the state dict); the serial block is
            # inlined at this scope so flax binds the shared modules once
            cpe = ConvPosEnc(dim, dtype=self.dtype, name=f"cpe{si + 1}")
            crpe = ConvRelPosEnc(dim // self.heads, self.crpe_windows,
                                 dtype=self.dtype, name=f"crpe{si + 1}")
            h = self.heads
            Ch = dim // h
            for bi in range(depth):
                if (si == last_stage and bi == depth - 1
                        and (capture or feature_delta is not None)):
                    grid = x[:, 1:].reshape(B, H, W, dim)
                    if feature_delta is not None:
                        grid = grid + feature_delta.astype(grid.dtype)
                    fmap = grid
                    x = jnp.concatenate(
                        [x[:, :1], grid.reshape(B, H * W, dim)], axis=1
                    )
                blk = f"serial{si + 1}_{bi}"
                x = cpe(x, (H, W))
                N = x.shape[1]
                y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 name=f"{blk}_norm1")(x)
                qkv = nn.Dense(3 * dim, dtype=self.dtype,
                               name=f"{blk}_qkv")(y)
                # minor-axis slices (timm unit order [q|k|v][h][hd]) — cheaper
                # than the 5-D split+transpose relayout (one 4-D transpose)
                q, k, v = (
                    qkv[..., i * dim:(i + 1) * dim]
                    .reshape(B, N, h, Ch).transpose(0, 2, 1, 3)
                    for i in range(3)
                )
                # factorized attention: softmax(K over tokens)^T V, then Q
                k_soft = jax.nn.softmax(k.astype(jnp.float32), axis=2)
                k_soft = k_soft.astype(y.dtype)
                factor = jnp.einsum(
                    "bhnc,bhnd->bhcd", k_soft, v,
                    preferred_element_type=jnp.float32,
                ).astype(y.dtype)
                fa = jnp.einsum("bhnc,bhcd->bhnd", q, factor)
                out = (Ch ** -0.5) * fa + crpe(q, v, (H, W))
                out = out.transpose(0, 2, 1, 3).reshape(B, N, dim)
                y = nn.Dense(dim, dtype=self.dtype, name=f"{blk}_proj")(out)
                x = x + y
                y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 name=f"{blk}_norm2")(x)
                hid = int(dim * ratio)
                w1, b1 = _DenseParams(dim, hid, name=f"{blk}_fc1")()
                w2, b2 = _DenseParams(hid, dim, name=f"{blk}_fc2")()
                mode = coat_mlp_mode()
                inter_bytes = B * N * hid * y.dtype.itemsize
                fuse_mlp = (not self.is_initializing()
                            and (mode == "all"
                                 or (mode == "fused"
                                     and inter_bytes >= _FUSED_MLP_MIN_BYTES)))
                if fuse_mlp:
                    # fused fc1->exact-GELU->fc2: the (N, hid) hidden plane
                    # stays in VMEM per token tile; the backward recomputes
                    # it from y instead of saving the (bf16, bf16)
                    # pre/post-activation pair DESIGN §5o measured at the
                    # HBM roofline (~0.8 GB/instance at stage 1)
                    from skinjax.ops.pallas.fused_mlp import mlp_gelu
                    yc, k1, a1, k2, a2 = _dtypes.promote_dtype(
                        y, w1, b1, w2, b2, dtype=self.dtype)
                    y = mlp_gelu(yc, k1, a1, k2, a2)
                else:
                    yc, k1, a1 = _dtypes.promote_dtype(
                        y, w1, b1, dtype=self.dtype)
                    y = jnp.dot(yc, k1) + a1
                    y = nn.gelu(y, approximate=False)
                    yc, k2, a2 = _dtypes.promote_dtype(
                        y, w2, b2, dtype=self.dtype)
                    y = jnp.dot(yc, k2) + a2
                x = x + y
            if si < len(self.dims) - 1:
                x = x[:, 1:].reshape(B, H, W, dim)  # drop cls for next stage
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm4")(x)
        if capture:
            return x[:, 0], fmap
        return x[:, 0]


coat_lite_small = partial(CoaTLite, dims=(64, 128, 320, 512),
                          depths=(3, 4, 6, 3))
coat_lite_tiny = partial(CoaTLite, dims=(64, 128, 256, 320),
                         depths=(2, 2, 2, 2))
