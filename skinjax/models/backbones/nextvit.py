"""NextViT — official-layout conv/transformer hybrid (Flax, NHWC).

``nextvit_small`` (BACC 0.8067 in the reference's table,
frugality_bacc_by_models.py:5-17) loads through the generic timm path
(loadImageModelClassifier.py:115-150). The real architecture the previous
sketch approximated, implemented here exactly:

- 4-conv BN+ReLU stem (3→64/s2→32→64→64/s2),
- per-stage channel plans with widened FINAL blocks — nextvit_small ends at
  1024 features, not 768: stage plans [96×3], [192×3, 256],
  [384×4, 512]×2, [768×2, 1024],
- NCB: PatchEmbed (avgpool+1×1conv+BN on stride/width change) → MHCA
  (grouped 3×3 conv attention, groups=C/head_dim) residual → BN-normed
  1×1-conv MLP residual (hidden = make_divisible(3C)),
- NTB: E-MHSA on a make_divisible(0.75·C) channel slice (token-avg-pooled
  K/V at sr², BatchNorm1d on the pooled tokens) → MHCA on the remaining
  slice → channel concat → BN-normed MLP (hidden = make_divisible(2C)),
- final BatchNorm2d then global-avg-pool — the ``reset_classifier(0)``
  output.

The importer accepts both the official flat ``features.{k}`` and timm-style
``stages.{si}.{bi}`` outer prefixes (inner names follow the official repo,
which timm's checkpoint filter preserves).

TPU notes: NHWC; 1×1 convs are Dense matmuls on the MXU; MHCA's grouped 3×3
maps to XLA grouped convolution; E-MHSA's token pooling is a reshape-mean
(no gathers); BN statistics ride the existing batch_stats collection.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from skinjax.models.backbones.cnn_zoo import _bn


def make_divisible(v: float, divisor: int = 32) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def nextvit_plan(depths: Sequence[int] = (3, 4, 10, 3)) -> Tuple[list, list]:
    """Official nextvit stage_out_channels / block-type tables."""
    chans = [
        [96] * depths[0],
        [192] * (depths[1] - 1) + [256],
        [384, 384, 384, 384, 512] * (depths[2] // 5),
        [768] * (depths[3] - 1) + [1024],
    ]
    types = [
        ["ncb"] * depths[0],
        ["ncb"] * (depths[1] - 1) + ["ntb"],
        (["ncb"] * 4 + ["ntb"]) * (depths[2] // 5),
        ["ncb"] * (depths[3] - 1) + ["ntb"],
    ]
    return chans, types


class NextPatchEmbed(nn.Module):
    """avgpool(2) + 1×1 conv + BN when strided; 1×1 conv + BN on width
    change; identity otherwise (official nextvit PatchEmbed)."""

    out_ch: int
    stride: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        in_ch = x.shape[-1]
        if self.stride == 2:
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        elif in_ch == self.out_ch:
            return x
        x = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        return _bn(train, self.dtype, "norm")(x)


class MHCA(nn.Module):
    """Multi-head convolutional attention: grouped 3×3 → BN → ReLU → 1×1."""

    dim: int
    head_dim: int = 32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        y = nn.Conv(self.dim, (3, 3), padding=[(1, 1)] * 2,
                    feature_group_count=self.dim // self.head_dim,
                    use_bias=False, dtype=self.dtype, name="group_conv3x3")(x)
        y = _bn(train, self.dtype, "norm")(y)
        y = nn.relu(y)
        return nn.Conv(self.dim, (1, 1), use_bias=False, dtype=self.dtype,
                       name="projection")(y)


class NextMlp(nn.Module):
    """1×1 conv MLP with ReLU (official nextvit Mlp, bias=True)."""

    dim: int
    hidden: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.hidden, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(y)
        return nn.Dense(self.dim, dtype=self.dtype, name="conv2")(y)


class EMHSA(nn.Module):
    """Efficient MHSA: token-avg-pooled K/V at sr², BN over the pooled
    tokens' channels (official nextvit E_MHSA)."""

    dim: int
    head_dim: int = 32
    sr_ratio: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        B, N, C = x.shape
        h = self.dim // self.head_dim
        hd = self.head_dim
        q = nn.Dense(self.dim, dtype=self.dtype, name="q")(x)
        q = q.reshape(B, N, h, hd).transpose(0, 2, 1, 3)
        kv_in = x
        if self.sr_ratio > 1:
            k_pool = self.sr_ratio ** 2
            Np = N // k_pool
            kv_in = x[:, : Np * k_pool].reshape(B, Np, k_pool, C).mean(axis=2)
            kv_in = _bn(train, self.dtype, "norm")(kv_in)
        k = nn.Dense(self.dim, dtype=self.dtype, name="k")(kv_in)
        v = nn.Dense(self.dim, dtype=self.dtype, name="v")(kv_in)
        M = kv_in.shape[1]
        k = k.reshape(B, M, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, M, h, hd).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32)
        attn = attn * (hd ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v).transpose(0, 2, 1, 3)
        out = out.reshape(B, N, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class NCB(nn.Module):
    out_ch: int
    stride: int = 1
    head_dim: int = 32
    div: int = 32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = NextPatchEmbed(self.out_ch, self.stride, dtype=self.dtype,
                           name="patch_embed")(x, train=train)
        x = x + MHCA(self.out_ch, self.head_dim, dtype=self.dtype,
                     name="mhca")(x, train=train)
        y = _bn(train, self.dtype, "norm")(x)
        hidden = make_divisible(self.out_ch * 3, self.div)
        return x + NextMlp(self.out_ch, hidden, dtype=self.dtype,
                           name="mlp")(y)


class NTB(nn.Module):
    out_ch: int
    stride: int = 1
    sr_ratio: int = 1
    head_dim: int = 32
    div: int = 32
    mix_ratio: float = 0.75
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        mhsa_ch = make_divisible(int(self.out_ch * self.mix_ratio), self.div)
        mhca_ch = self.out_ch - mhsa_ch
        x = NextPatchEmbed(mhsa_ch, self.stride, dtype=self.dtype,
                           name="patch_embed")(x, train=train)
        B, H, W, C = x.shape
        y = _bn(train, self.dtype, "norm1")(x)
        y = EMHSA(mhsa_ch, self.head_dim, self.sr_ratio, dtype=self.dtype,
                  name="e_mhsa")(y.reshape(B, H * W, C), train=train)
        x = x + y.reshape(B, H, W, C)
        out = NextPatchEmbed(mhca_ch, 1, dtype=self.dtype,
                             name="projection")(x, train=train)
        out = out + MHCA(mhca_ch, self.head_dim, dtype=self.dtype,
                         name="mhca")(out, train=train)
        x = jnp.concatenate([x, out], axis=-1)
        y = _bn(train, self.dtype, "norm2")(x)
        hidden = make_divisible(self.out_ch * 2, self.div)
        return x + NextMlp(self.out_ch, hidden, dtype=self.dtype,
                           name="mlp")(y)


class NextViT(nn.Module):
    """Official nextvit topology. Returns BN-normed global-avg-pooled
    features (B, plan[-1][-1]) — 1024 for nextvit_small."""

    depths: Sequence[int] = (3, 4, 10, 3)
    stem_chs: Sequence[int] = (64, 32, 64)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    head_dim: int = 32
    div: int = 32
    stage_channels: Optional[Sequence[Sequence[int]]] = None
    stage_types: Optional[Sequence[Sequence[str]]] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False, features: bool = False,
                 feature_delta=None, capture: bool = False):
        chans, types = nextvit_plan(self.depths)
        if self.stage_channels is not None:
            chans = [list(c) for c in self.stage_channels]
        if self.stage_types is not None:
            types = [list(t) for t in self.stage_types]
        stem_plan = [
            (self.stem_chs[0], 2), (self.stem_chs[1], 1),
            (self.stem_chs[2], 1), (self.stem_chs[2], 2),
        ]
        for i, (ch, s) in enumerate(stem_plan):
            x = nn.Conv(ch, (3, 3), strides=(s, s), padding=[(1, 1)] * 2,
                        use_bias=False, dtype=self.dtype, name=f"stem{i}_conv")(x)
            x = _bn(train, self.dtype, f"stem{i}_norm")(x)
            x = nn.relu(x)
        idx = 0
        for si, (stage_ch, stage_ty) in enumerate(zip(chans, types)):
            for bi, (ch, ty) in enumerate(zip(stage_ch, stage_ty)):
                stride = 2 if (bi == 0 and si > 0) else 1
                if ty == "ncb":
                    x = NCB(ch, stride, self.head_dim, self.div,
                            dtype=self.dtype, name=f"b{idx}")(x, train=train)
                else:
                    x = NTB(ch, stride, self.sr_ratios[si], self.head_dim,
                            self.div, dtype=self.dtype,
                            name=f"b{idx}")(x, train=train)
                idx += 1
        x = _bn(train, self.dtype, "norm")(x)
        if feature_delta is not None:  # CAM support — see davit.py
            x = x + feature_delta
        fmap = x
        if features:
            return x
        x = x.mean(axis=(1, 2))
        return (x, fmap) if capture else x


nextvit_small = partial(NextViT, depths=(3, 4, 10, 3))
nextvit_base = partial(NextViT, depths=(3, 4, 20, 3))
