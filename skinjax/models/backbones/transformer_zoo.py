"""Swin transformer backbone + shared window-partition helpers (Flax, NHWC).

timm ``swin_tiny_patch4_window7_224`` topology, swept by the reference's
generic timm loader (loadImageModelClassifier.py:115-150). DaViT lives in
``skinjax.models.backbones.davit``.

TPU notes: window partition is pure reshape/transpose (layout ops XLA folds
into the attention einsums); window attention runs as one batched MHA over
(B·num_windows) with fp32 softmax; Swin's shifted windows use jnp.roll
(a cheap HBM-contiguous rotation) + a precomputed static attention mask.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def window_partition(x: jax.Array, w: int) -> jax.Array:
    """(B, H, W, C) -> (B*nW, w*w, C); H, W divisible by w."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // w, w, W // w, w, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B * (H // w) * (W // w), w * w, C)


def window_reverse(x: jax.Array, w: int, H: int, W: int) -> jax.Array:
    B = x.shape[0] // ((H // w) * (W // w))
    x = x.reshape(B, H // w, W // w, w, w, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, -1)


class WindowAttention(nn.Module):
    """MHA within windows with relative position bias (Swin-style).

    ``fused=True`` routes through the Pallas fused window-attention kernel
    (ops/pallas/window_attention.py) — same param tree; the rel-pos bias is
    materialized once as (h, N, N) and the shifted-window mask passes
    through as the kernel's additive (nW, N, N) mask."""

    dim: int
    num_heads: int
    window: int
    dtype: Optional[jnp.dtype] = None
    fused: bool = False
    # nhwc=True: input is the full (B, H, W, C) map and the strip-blocked
    # NHWC kernel folds window partition / 49->64 pad / reverse into its
    # block index maps; rel-pos bias and the per-window shifted mask are
    # remapped into the kernel's interleaved token layout (window_attention
    # .py _strip_remap). Param tree identical to the partitioned paths.
    nhwc: bool = False

    def _rel_bias(self, h):
        w = self.window
        table = self.param(
            "rel_bias", nn.initializers.normal(0.02), ((2 * w - 1) ** 2, h)
        )
        coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
        coords = coords.reshape(2, -1)
        rel = coords[:, :, None] - coords[:, None, :]
        rel = (rel[0] + w - 1) * (2 * w - 1) + (rel[1] + w - 1)  # (N, N) static
        return table[jnp.asarray(rel)]  # (N, N, h)

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None):
        """x: (nB, w*w, C) — or the full (B, H, W, C) map when ``nhwc``;
        mask: (nW, w*w, w*w) additive or None."""
        if self.nhwc:
            from skinjax.models.backbones.davit import DenseParams
            from skinjax.ops.pallas.window_attention import (
                window_attention_nhwc,
            )

            C = x.shape[-1]
            h = self.num_heads
            dt = self.dtype or x.dtype
            wqkv, bqkv = DenseParams(3 * C, name="qkv")(C)
            wproj, bproj = DenseParams(C, name="proj")(C)
            bias = self._rel_bias(h).transpose(2, 0, 1).astype(jnp.float32)
            m = mask.astype(jnp.float32) if mask is not None else None
            # 4-D NHWC interface: measured +7% for Swin's bias+mask path
            # (940 -> 1008 img/s, docs/DESIGN.md §5b-r3c); DaViT keeps 6d.
            # SKINJAX_WA_IFACE still overrides (A/B harness / fallback).
            return window_attention_nhwc(
                x.astype(dt), wqkv.astype(dt), bqkv.astype(dt),
                wproj.astype(dt), bproj.astype(dt), bias, m, h, self.window,
                os.environ.get("SKINJAX_WA_IFACE") or "4d",
            )
        nB, N, C = x.shape
        h = self.num_heads
        hd = C // h
        if self.fused:
            from skinjax.models.backbones.davit import DenseParams
            from skinjax.ops.pallas.window_attention import window_attention

            dt = self.dtype or x.dtype
            wqkv, bqkv = DenseParams(3 * C, name="qkv")(C)
            wproj, bproj = DenseParams(C, name="proj")(C)
            bias = self._rel_bias(h).transpose(2, 0, 1).astype(jnp.float32)
            m = mask.astype(jnp.float32) if mask is not None else None
            return window_attention(
                x.astype(dt), wqkv.astype(dt), bqkv.astype(dt),
                wproj.astype(dt), bproj.astype(dt), bias, m, h,
            )
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(x)
        # minor-axis slices, not reshape(…,3,h,hd)+split+transpose — the 5-D
        # relayout measured ~6 ms/step of copies on the v5e (timm unit order
        # is [q|k|v][h][hd], so [..., :C] IS q)
        q = qkv[..., :C].reshape(nB, N, h, hd)
        k = qkv[..., C:2 * C].reshape(nB, N, h, hd)
        v = qkv[..., 2 * C:].reshape(nB, N, h, hd)

        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                          preferred_element_type=jnp.float32)
        attn = attn / jnp.sqrt(hd).astype(attn.dtype)

        # relative position bias table, indexed by a static relative index map
        bias = self._rel_bias(h)  # (N, N, h)
        attn = attn + bias.transpose(2, 0, 1)[None].astype(attn.dtype)

        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(nB // nW, nW, h, N, N) + mask[None, :, None].astype(
                attn.dtype
            )
            attn = attn.reshape(nB, h, N, N)
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v)
        out = out.reshape(nB, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class Mlp(nn.Module):
    dim: int
    ratio: float = 4.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(int(self.dim * self.ratio), dtype=self.dtype, name="fc1")(x)
        y = nn.gelu(y, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)


def _swin_attn_mask(H: int, W: int, w: int, shift: int) -> np.ndarray:
    """Static additive mask for shifted windows."""
    img = np.zeros((1, H, W, 1))
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
        for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
            img[:, hs, ws, :] = cnt
            cnt += 1
    win = img.reshape(1, H // w, w, W // w, w, 1).transpose(0, 1, 3, 2, 4, 5)
    win = win.reshape(-1, w * w)
    diff = win[:, :, None] - win[:, None, :]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _export_compat() -> bool:
    """True while the native ONNX exporter is tracing (set by
    serve/onnx_export.export_onnx): multi-axis jnp.roll and multi-axis
    strided fancy indexing lower to 2-axis GATHERs the emitter cannot
    express, so the modules switch to Slice/Concat forms — identical math,
    but measured ~5% slower on the v5e (gather-roll 1008 vs concat-roll
    957 img/s on swin_tiny B=64), so the gather forms stay the compute
    default."""
    return os.environ.get("SKINJAX_EXPORT_COMPAT", "") == "1"


def _roll_axis(x, shift: int, axis: int):
    """np.roll semantics via split+concat (ONNX-expressible form)."""
    n = x.shape[axis]
    shift %= n
    if shift == 0:
        return x
    a, b = jnp.split(x, [n - shift], axis=axis)
    return jnp.concatenate([b, a], axis=axis)


def _roll2(x, shift: int):
    if _export_compat():
        return _roll_axis(_roll_axis(x, shift, 1), shift, 2)
    return jnp.roll(x, (shift, shift), axis=(1, 2))


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int = 7
    shift: int = 0
    dtype: Optional[jnp.dtype] = None
    fused_attn: bool = False
    strip_attn: bool = False

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        # timm parity: no shift when one window covers the whole map
        shift = self.shift if (H > self.window or W > self.window) else 0
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        if shift > 0:
            y = _roll2(y, -shift)
            mask = jnp.asarray(_swin_attn_mask(H, W, self.window, shift))
        else:
            mask = None
        if (self.strip_attn and H % self.window == 0
                and W % self.window == 0):
            # strip-blocked NHWC kernel: no partition/pad/reverse ops; the
            # rolls (cheap lane-aligned copies) stay in XLA
            y = WindowAttention(
                self.dim, self.num_heads, self.window, dtype=self.dtype,
                nhwc=True, name="attn",
            )(y, mask)
        else:
            y = window_partition(y, self.window)
            y = WindowAttention(
                self.dim, self.num_heads, self.window, dtype=self.dtype,
                fused=self.fused_attn, name="attn",
            )(y, mask)
            y = window_reverse(y, self.window, H, W)
        if shift > 0:
            y = _roll2(y, shift)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        return x + Mlp(self.dim, dtype=self.dtype, name="mlp")(y)


class SwinPatchMerge(nn.Module):
    """timm-layout patch merging: 2×2 slice-concat → LayerNorm(4C) →
    Linear(4C→2C, no bias). Import-compatible with timm Swin checkpoints."""

    out_dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        if _export_compat():
            # jnp's x[:, 0::2, 0::2] multi-axis strided indexing lowers to
            # a 2-axis GATHER the ONNX emitter cannot express; lax.slice is
            # the identical op and exports as ONNX Slice
            def s2(dh, dw):
                return jax.lax.slice(x, (0, dh, dw, 0), x.shape, (1, 2, 2, 1))

            x = jnp.concatenate(
                [s2(0, 0), s2(1, 0), s2(0, 1), s2(1, 1)], axis=-1)
        else:
            x = jnp.concatenate(
                [x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                 x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype,
                        name="reduction")(x)


class Swin(nn.Module):
    dims: Sequence[int] = (96, 192, 384, 768)
    depths: Sequence[int] = (2, 2, 6, 2)
    heads: Sequence[int] = (3, 6, 12, 24)
    window: int = 7
    dtype: Optional[jnp.dtype] = None
    # Pallas window attention (ops/pallas/window_attention.py).
    # fused_attn (padded-window kernel) measured SLOWER than XLA for Swin
    # (rel-pos bias + 64 shifted masks add f32 VMEM traffic the XLA fusion
    # handles better: 717 vs 635 img/s at B=64; docs/DESIGN.md §5b) — kept
    # as an explicit opt-in A/B control. strip_attn (the strip-blocked NHWC
    # kernel, bias/mask folded into the interleaved token layout, no
    # partition relayouts at all) measured 933 vs 715 img/s (+30%,
    # docs/DESIGN.md §5b-r3). None = auto via winattn_mode(): the strip
    # kernel on TPU, XLA elsewhere and under ONNX-export tracing;
    # SKINJAX_WINATTN overrides.
    fused_attn: bool = False
    strip_attn: Optional[bool] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        from skinjax.ops.pallas.window_attention import winattn_mode

        strip = (self.strip_attn if self.strip_attn is not None
                 else winattn_mode() == "pallas")
        x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), dtype=self.dtype,
                    name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="patch_norm")(x)
        for si, (dim, depth, h) in enumerate(zip(self.dims, self.depths, self.heads)):
            if si > 0:
                x = SwinPatchMerge(dim, dtype=self.dtype, name=f"merge{si}")(x)
            for bi in range(depth):
                shift = self.window // 2 if bi % 2 == 1 else 0
                x = SwinBlock(
                    dim, h, self.window, shift, dtype=self.dtype,
                    fused_attn=self.fused_attn,
                    strip_attn=strip,
                    name=f"stage{si}_block{bi}",
                )(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)


swin_tiny = partial(Swin)
