"""CAFormer / MViTv2 / NextViT / CoaT-lite style backbones (Flax, NHWC).

The remaining timm-class encoders the reference sweeps
(loadImageModelClassifier.py:115-150; BACC table frugality_bacc_by_models.py:
caformer_b36 0.8062, mvitv2_small 0.8137, nextvit_small 0.8067,
coat_lite_small 0.7919). These follow each paper's block structure re-derived
for TPU (NHWC, bf16, fp32 softmax, no gathers):

  CAFormer   MetaFormer with [SepConv, SepConv, Attention, Attention] mixers
  MViTv2     pooled-attention transformer (stride-pooled K/V, residual Q pool)
  NextViT    conv blocks (NCB) + transformer blocks (NTB) hybrid stages
  CoaT-lite  serial conv-position-encoded attention stages
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from skinjax.models.backbones.cnn_zoo import _bn


class SepConvMixer(nn.Module):
    """CAFormer conv token mixer: pw -> act -> dw 7x7 -> pw."""

    dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        mid = int(self.dim * 2)
        y = nn.Dense(mid, dtype=self.dtype, name="pw1")(x)
        y = nn.gelu(y, approximate=False)
        y = nn.Conv(
            mid, (7, 7), padding=[(3, 3)] * 2, feature_group_count=mid,
            dtype=self.dtype, name="dw",
        )(y)
        return nn.Dense(self.dim, dtype=self.dtype, name="pw2")(y)


class AttentionMixer(nn.Module):
    """Global MHA over the (H·W) token grid (late CAFormer stages: 14²/7²)."""

    dim: int
    num_heads: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        t = x.reshape(B, H * W, C)
        h = self.num_heads
        hd = C // h
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(t)
        q, k, v = jnp.split(qkv.reshape(B, -1, 3, h, hd), 3, axis=2)
        q, k, v = (a[:, :, 0].transpose(0, 2, 1, 3) for a in (q, k, v))
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32) / jnp.sqrt(hd)
        attn = jax.nn.softmax(attn, axis=-1).astype(t.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v).transpose(0, 2, 1, 3)
        out = out.reshape(B, H * W, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out).reshape(B, H, W, C)


class MetaFormerBlock(nn.Module):
    dim: int
    mixer: str  # "conv" | "attention"
    num_heads: int = 8
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        if self.mixer == "conv":
            y = SepConvMixer(self.dim, dtype=self.dtype, name="mixer")(y)
        else:
            y = AttentionMixer(self.dim, self.num_heads, dtype=self.dtype,
                               name="mixer")(y)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(4 * self.dim, dtype=self.dtype, name="mlp_in")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_out")(y)
        return x + y


class CAFormer(nn.Module):
    dims: Sequence[int] = (64, 128, 320, 512)
    depths: Sequence[int] = (3, 3, 9, 3)
    mixers: Sequence[str] = ("conv", "conv", "attention", "attention")
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        for si, (dim, depth, mixer) in enumerate(
            zip(self.dims, self.depths, self.mixers)
        ):
            k, s = (7, 4) if si == 0 else (3, 2)
            x = nn.Conv(dim, (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2,
                        dtype=self.dtype, name=f"down{si}")(x)
            for bi in range(depth):
                x = MetaFormerBlock(dim, mixer, dtype=self.dtype,
                                    name=f"stage{si}_block{bi}")(x)
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)


class PooledAttention(nn.Module):
    """MViTv2 pooling attention: K/V stride-pooled (dw conv), residual Q."""

    dim: int
    num_heads: int
    kv_stride: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = self.num_heads
        hd = C // h
        q = nn.Dense(C, dtype=self.dtype, name="q")(x)
        kv_in = x
        if self.kv_stride > 1:
            kv_in = nn.Conv(
                C, (3, 3), strides=(self.kv_stride,) * 2, padding=[(1, 1)] * 2,
                feature_group_count=C, dtype=self.dtype, name="kv_pool",
            )(x)
        k = nn.Dense(C, dtype=self.dtype, name="k")(kv_in)
        v = nn.Dense(C, dtype=self.dtype, name="v")(kv_in)

        def heads(t):
            b, hh, ww, _ = t.shape
            return t.reshape(b, hh * ww, h, hd).transpose(0, 2, 1, 3)

        qh, kh, vh = heads(q), heads(k), heads(v)
        attn = jnp.einsum("bhnd,bhmd->bhnm", qh, kh,
                          preferred_element_type=jnp.float32) / jnp.sqrt(hd)
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(B, H, W, C)
        out = out + q  # MViTv2 residual pooled query
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class MViTBlock(nn.Module):
    dim: int
    num_heads: int
    kv_stride: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        x = x + PooledAttention(self.dim, self.num_heads, self.kv_stride,
                                dtype=self.dtype, name="attn")(y)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(4 * self.dim, dtype=self.dtype, name="mlp_in")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_out")(y)
        return x + y


class MViTv2(nn.Module):
    dims: Sequence[int] = (96, 192, 384, 768)
    depths: Sequence[int] = (1, 2, 11, 2)
    heads: Sequence[int] = (1, 2, 4, 8)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Conv(self.dims[0], (7, 7), strides=(4, 4), padding=[(3, 3)] * 2,
                    dtype=self.dtype, name="patch_embed")(x)
        for si, (dim, depth, h) in enumerate(zip(self.dims, self.depths, self.heads)):
            if si > 0:
                x = nn.Conv(dim, (2, 2), strides=(2, 2), dtype=self.dtype,
                            name=f"down{si}")(x)
            for bi in range(depth):
                x = MViTBlock(dim, h, kv_stride=2 if min(x.shape[1:3]) > 7 else 1,
                              dtype=self.dtype, name=f"stage{si}_block{bi}")(x)
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)


class NCB(nn.Module):
    """NextViT conv block: dw 3x3 + BN + pw MLP, residual."""

    dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        y = nn.Conv(self.dim, (3, 3), padding=[(1, 1)] * 2,
                    feature_group_count=self.dim, use_bias=False,
                    dtype=self.dtype, name="dw")(x)
        y = _bn(train, self.dtype, "bn")(y)
        x = x + y
        y = nn.Dense(3 * self.dim, dtype=self.dtype, name="mlp_in")(x)
        y = nn.relu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_out")(y)
        return x + y


class NextViT(nn.Module):
    """Conv-transformer hybrid: NCB stages then NTB (attention) stages."""

    dims: Sequence[int] = (96, 192, 384, 768)
    depths: Sequence[int] = (2, 2, 6, 2)
    attn_stages: Sequence[bool] = (False, False, True, True)
    heads: Sequence[int] = (3, 6, 12, 24)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Conv(self.dims[0], (7, 7), strides=(4, 4), padding=[(3, 3)] * 2,
                    use_bias=False, dtype=self.dtype, name="stem")(x)
        x = _bn(train, self.dtype, "stem_bn")(x)
        x = nn.relu(x)
        for si, (dim, depth, use_attn, h) in enumerate(
            zip(self.dims, self.depths, self.attn_stages, self.heads)
        ):
            if si > 0:
                x = nn.Conv(dim, (2, 2), strides=(2, 2), dtype=self.dtype,
                            name=f"down{si}")(x)
            for bi in range(depth):
                if use_attn and bi == depth - 1:  # NTB closes each late stage
                    x = MetaFormerBlock(dim, "attention", num_heads=h,
                                        dtype=self.dtype,
                                        name=f"stage{si}_ntb{bi}")(x)
                else:
                    x = NCB(dim, dtype=self.dtype, name=f"stage{si}_ncb{bi}")(
                        x, train=train
                    )
        return x


class CoaTLite(nn.Module):
    """CoaT-lite serial blocks: conv positional encoding + factorized attention."""

    dims: Sequence[int] = (64, 128, 320, 512)
    depths: Sequence[int] = (3, 4, 6, 3)
    heads: Sequence[int] = (8, 8, 8, 8)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        for si, (dim, depth, h) in enumerate(zip(self.dims, self.depths, self.heads)):
            k, s = (7, 4) if si == 0 else (3, 2)
            x = nn.Conv(dim, (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2,
                        dtype=self.dtype, name=f"embed{si}")(x)
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=f"embed_norm{si}")(x)
            for bi in range(depth):
                # conv positional encoding (depthwise) + attention block
                pe = nn.Conv(dim, (3, 3), padding=[(1, 1)] * 2,
                             feature_group_count=dim, dtype=self.dtype,
                             name=f"stage{si}_cpe{bi}")(x)
                x = x + pe
                x = MetaFormerBlock(dim, "attention", num_heads=h,
                                    dtype=self.dtype,
                                    name=f"stage{si}_block{bi}")(x)
        return x


caformer_b36 = partial(CAFormer, dims=(128, 256, 512, 768), depths=(3, 12, 18, 3))
caformer_s18 = partial(CAFormer, dims=(64, 128, 320, 512), depths=(3, 3, 9, 3))
mvitv2_small = partial(MViTv2)
nextvit_small = partial(NextViT)
coat_lite_small = partial(CoaTLite, dims=(64, 128, 320, 512), depths=(3, 4, 6, 3))
