"""DaViT — timm-layout dual-attention vision transformer (Flax, NHWC).

The reference's best-BACC backbone (``davit_tiny`` 0.8228,
frugality_bacc_by_models.py:5-17) is loaded through timm with
``reset_classifier(0)`` (loadImageModelClassifier.py:117-121), so parity
means the FULL timm forward: stem → 4 stages of (SpatialBlock, ChannelBlock)
pairs → global-avg-pool → head LayerNorm. This module mirrors the timm
``davit.py`` layer layout exactly (ConvPosEnc residuals, window attention
without relative bias, the k-scaled (hd×hd) channel attention, norm→conv
downsampling) so published weights import via
``skinjax.models.torch_import.import_davit``.

TPU notes: runs NHWC end-to-end; window partition is reshape/transpose that
XLA folds into the attention einsums; channel attention is a (hd×hd) MXU
matmul per head; attention logits accumulate in fp32; ConvPosEnc is a
depthwise 3×3 conv the XLA fuser merges into the surrounding elementwise adds.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from skinjax.models.backbones.transformer_zoo import (
    window_partition,
    window_reverse,
)


class _DWConvParams(nn.Module):
    """Param tree of a depthwise nn.Conv (kernel (3,3,1,C) + bias, same
    names/shapes/inits) without running its convolution — see DenseParams."""

    dim: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, 1, self.dim), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.dim,), jnp.float32
        )
        return kernel, bias


def _cpe_shift_call(self, x):
    """Shift-add depthwise formulation: identical math as 9 shift-multiply-
    adds over the NHWC map — pure elementwise ops XLA fuses into one VPU
    pass, sidestepping the grouped-conv lowering. Param tree unchanged
    (proj/kernel (3,3,1,C), proj/bias)."""
    kernel, bias = _DWConvParams(self.dim, name="proj")()
    dt = self.dtype or x.dtype
    kernel = kernel.astype(dt)
    bias = bias.astype(dt)
    H, W = x.shape[1], x.shape[2]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jnp.broadcast_to(bias, x.shape)
    for dy in range(3):
        for dx in range(3):
            y = y + xp[:, dy:dy + H, dx:dx + W, :] * kernel[dy, dx, 0]
    return x + y


class ConvPosEnc(nn.Module):
    """Depthwise 3×3 conv added residually (timm davit ConvPosEnc, act=False).

    ``SKINJAX_CPE=shift`` (read at trace time; ``shift_impl`` overrides)
    routes through _cpe_shift_call — same params, shift-add elementwise math
    instead of a grouped convolution. Set the env before building jitted
    steps: flipping it mid-process requires clearing the step trace caches
    (steps._TRAIN_STEP_CACHE), as the A/B harness does."""

    dim: int
    dtype: Optional[jnp.dtype] = None
    shift_impl: Optional[bool] = None

    @nn.compact
    def __call__(self, x):
        if self.shift_impl is not None:
            impl = "shift" if self.shift_impl else "conv"
        else:
            impl = os.environ.get("SKINJAX_CPE", "") or "conv"
        if impl == "shift":
            return _cpe_shift_call(self, x)
        if impl == "identity":
            # measurement probe ONLY (not semantics-preserving): same param
            # tree, CPE math skipped — bounds the CPE bucket in A/Bs
            _DWConvParams(self.dim, name="proj")()
            return x
        y = nn.Conv(self.dim, (3, 3), padding=[(1, 1)] * 2,
                    feature_group_count=self.dim, dtype=self.dtype, name="proj")(x)
        return x + y


class DenseParams(nn.Module):
    """Declares the exact param tree of nn.Dense (kernel + bias, same names,
    shapes, inits) without running its matmul — lets fused kernels consume
    the weights directly while staying checkpoint/importer-compatible."""

    features: int

    @nn.compact
    def __call__(self, in_dim: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (in_dim, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return kernel, bias


class DaViTWindowAttention(nn.Module):
    """Window MHA without relative bias (timm davit WindowAttention).

    ``fused=True`` routes through the Pallas fused window-attention kernel
    (ops/pallas/window_attention.py) — same param tree, one HBM round trip
    per block instead of qkv/score/softmax materializations."""

    dim: int
    num_heads: int
    dtype: Optional[jnp.dtype] = None
    fused: bool = False

    @nn.compact
    def __call__(self, x):
        nB, N, C = x.shape
        h = self.num_heads
        hd = C // h
        if self.fused:
            from skinjax.ops.pallas.window_attention import window_attention

            dt = self.dtype or x.dtype
            wqkv, bqkv = DenseParams(3 * C, name="qkv")(C)
            wproj, bproj = DenseParams(C, name="proj")(C)
            return window_attention(
                x.astype(dt), wqkv.astype(dt), bqkv.astype(dt),
                wproj.astype(dt), bproj.astype(dt), None, None, h,
            )
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(x)
        # minor-axis slices instead of reshape(…,3,h,hd)+split+transpose: the
        # 5-D relayout cost ~6 ms/step of pure copies in the v5e trace (timm
        # unit order is [q|k|v][h][hd], so [..., :C] IS q — identical math)
        q = qkv[..., :C].reshape(nB, N, h, hd)
        k = qkv[..., C:2 * C].reshape(nB, N, h, hd)
        v = qkv[..., 2 * C:].reshape(nB, N, h, hd)
        scale = hd ** -0.5
        attn = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out.reshape(nB, N, C))


class DaViTWindowAttentionNHWC(nn.Module):
    """Window MHA on the NHWC map through the strip-blocked Pallas kernel
    (ops/pallas/window_attention.py window_attention_nhwc): window partition,
    the 49->64 pad, and window reverse are folded into the kernel's block
    index maps + in-VMEM assembly — the XLA-visible op does ONE HBM read of
    x and one write of y. Param tree identical to DaViTWindowAttention."""

    dim: int
    num_heads: int
    window: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        from skinjax.ops.pallas.window_attention import window_attention_nhwc

        C = x.shape[-1]
        dt = self.dtype or x.dtype
        wqkv, bqkv = DenseParams(3 * C, name="qkv")(C)
        wproj, bproj = DenseParams(C, name="proj")(C)
        return window_attention_nhwc(
            x.astype(dt), wqkv.astype(dt), bqkv.astype(dt),
            wproj.astype(dt), bproj.astype(dt), None, None,
            self.num_heads, self.window,
        )


class DaViTChannelAttention(nn.Module):
    """timm davit ChannelAttention: scaled keys, (hd×hd) token-aggregated
    attention, output re-expanded through the queries."""

    dim: int
    num_heads: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        h = self.num_heads
        hd = C // h
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(x)
        # minor-axis slices — see DaViTWindowAttention
        q = qkv[..., :C].reshape(B, N, h, hd)
        k = qkv[..., C:2 * C].reshape(B, N, h, hd)
        v = qkv[..., 2 * C:].reshape(B, N, h, hd)
        scale = hd ** -0.5
        # attn[c,d] = sum_n (k*scale)[n,c] v[n,d]   (timm: k^T @ v)
        attn = jnp.einsum("bnhc,bnhd->bhcd", k * scale, v,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        # out[n,c] = sum_d attn[c,d] q[n,d]         (timm: (attn @ q^T)^T)
        out = jnp.einsum("bhcd,bnhd->bnhc", attn, q)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out.reshape(B, N, C))


class DaViTChannelAttentionFused(nn.Module):
    """Channel MHA through the fused Pallas kernel
    (ops/pallas/channel_attention.py): qkv, per-head hd×hd scores, softmax,
    re-expansion, head merge and projection in one VMEM-resident kernel —
    no (B,h,N,hd) relayouts, no f32 score round-trip through HBM. Param
    tree identical to DaViTChannelAttention."""

    dim: int
    num_heads: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        from skinjax.ops.pallas.channel_attention import channel_attention

        C = x.shape[-1]
        dt = self.dtype or x.dtype
        wqkv, bqkv = DenseParams(3 * C, name="qkv")(C)
        wproj, bproj = DenseParams(C, name="proj")(C)
        return channel_attention(
            x.astype(dt), wqkv.astype(dt), bqkv.astype(dt),
            wproj.astype(dt), bproj.astype(dt), self.num_heads,
        )


def davit_mlp_mode() -> str:
    """SKINJAX_DAVIT_MLP: '' = XLA two-Dense chain (default), 'fused' =
    Pallas fused fc1->GELU->fc2 (ops/pallas/fused_mlp.mlp_gelu) on blocks
    whose bf16 hidden intermediate is >=48 MB, 'all' = every block. Export
    tracing always ''."""
    import os as _os
    if _os.environ.get("SKINJAX_EXPORT_COMPAT", "") == "1":
        return ""
    return _os.environ.get("SKINJAX_DAVIT_MLP", "")


class DaViTMlp(nn.Module):
    dim: int
    ratio: float = 4.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        mode = davit_mlp_mode()
        hid = int(self.dim * self.ratio)
        tokens = 1
        for d in x.shape[:-1]:
            tokens *= d
        fuse = (not self.is_initializing()
                and (mode == "all"
                     or (mode == "fused"
                         and tokens * hid * x.dtype.itemsize
                         >= 48 * 1024 * 1024)))
        if fuse:
            from flax.linen import dtypes as _dtypes

            from skinjax.ops.pallas.fused_mlp import mlp_gelu
            w1, b1 = DenseParams(hid, name="fc1")(self.dim)
            w2, b2 = DenseParams(self.dim, name="fc2")(hid)
            xc, k1, a1, k2, a2 = _dtypes.promote_dtype(
                x, w1, b1, w2, b2, dtype=self.dtype)
            return mlp_gelu(xc, k1, a1, k2, a2)
        y = nn.Dense(hid, dtype=self.dtype, name="fc1")(x)
        y = nn.gelu(y, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)


class DaViTWindowAttentionEinsum(nn.Module):
    """Window MHA computed on the 6-D (B, nH, w, nW, w, C) VIEW of the map —
    a pure reshape, no transpose. The window grouping lives in the einsum
    index structure instead of a materialized (B·nW, w², C) relayout, so XLA
    chooses the layouts. Same param tree as DaViTWindowAttention.

    **Measured REFUTED as a default** (davit_tiny B=64 full step, v5e):
    387.8 img/s vs 924 for the partition path — the 8-D score tensor's
    size-7 trailing dims underfill the 8×128 vector lanes, costing far more
    than the partition transposes it avoids (~22%/step, docs/DESIGN.md §5b).
    Kept opt-in (``SKINJAX_WINATTN=einsum``) as the documented negative
    result: the copies are the price of lane-aligned (w², C) layouts."""

    dim: int
    num_heads: int
    window: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        w = self.window
        h = self.num_heads
        hd = C // h
        y = x.reshape(B, H // w, w, W // w, w, C)  # free: split adjacent dims
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(y)
        shp = (B, H // w, w, W // w, w, h, hd)
        q = qkv[..., :C].reshape(shp)
        k = qkv[..., C:2 * C].reshape(shp)
        v = qkv[..., 2 * C:].reshape(shp)
        scale = hd ** -0.5
        # scores between tokens (i,j) and (k,l) of window (a,c)
        s = jnp.einsum("baicjhd,bakclhd->bachijkl", q * scale, k,
                       preferred_element_type=jnp.float32)
        s = s - s.max(axis=(-2, -1), keepdims=True)
        e = jnp.exp(s)
        attn = (e / e.sum(axis=(-2, -1), keepdims=True)).astype(x.dtype)
        out = jnp.einsum("bachijkl,bakclhd->baicjhd", attn, v)
        out = out.reshape(B, H // w, w, W // w, w, C).reshape(B, H, W, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class SpatialBlock(nn.Module):
    """cpe1 → LN → window attention → +res → cpe2 → LN → MLP → +res."""

    dim: int
    num_heads: int
    window: int = 7
    dtype: Optional[jnp.dtype] = None
    fused_attn: bool = False
    einsum_attn: bool = False
    strip_attn: bool = False

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = ConvPosEnc(self.dim, dtype=self.dtype, name="cpe1")(x)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        if self.strip_attn and H % self.window == 0 and W % self.window == 0:
            # strip-blocked NHWC kernel: no partition/pad/reverse ops at all
            y = DaViTWindowAttentionNHWC(
                self.dim, self.num_heads, self.window, dtype=self.dtype,
                name="attn")(y)
        elif self.einsum_attn and not self.fused_attn:
            y = DaViTWindowAttentionEinsum(
                self.dim, self.num_heads, self.window, dtype=self.dtype,
                name="attn")(y)
        else:
            y = window_partition(y, self.window)
            y = DaViTWindowAttention(self.dim, self.num_heads,
                                     dtype=self.dtype,
                                     fused=self.fused_attn, name="attn")(y)
            y = window_reverse(y, self.window, H, W)
        x = x + y
        x = ConvPosEnc(self.dim, dtype=self.dtype, name="cpe2")(x)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        return x + DaViTMlp(self.dim, dtype=self.dtype, name="mlp")(y)


class ChannelBlock(nn.Module):
    dim: int
    num_heads: int
    dtype: Optional[jnp.dtype] = None
    fused_attn: bool = False

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = ConvPosEnc(self.dim, dtype=self.dtype, name="cpe1")(x)
        t = x.reshape(B, H * W, C)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(t)
        if self.fused_attn:
            from skinjax.ops.pallas.channel_attention import (
                channel_attention_supported,
            )

            dt = jnp.dtype(self.dtype or t.dtype)
            use_fused = channel_attention_supported(
                H * W, C, self.num_heads, dt.itemsize
            )
        else:
            use_fused = False
        attn_cls = (DaViTChannelAttentionFused if use_fused
                    else DaViTChannelAttention)
        y = attn_cls(self.dim, self.num_heads, dtype=self.dtype,
                     name="attn")(y)
        x = (t + y).reshape(B, H, W, C)
        x = ConvPosEnc(self.dim, dtype=self.dtype, name="cpe2")(x)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        return x + DaViTMlp(self.dim, dtype=self.dtype, name="mlp")(y)


class DaViTDownsample(nn.Module):
    """timm davit Downsample: LayerNorm(in) → conv 2×2 stride 2."""

    out_dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.Conv(self.out_dim, (2, 2), strides=(2, 2), dtype=self.dtype,
                       name="conv")(x)


class DaViT(nn.Module):
    """timm ``davit_tiny`` topology. Returns the timm ``reset_classifier(0)``
    output — head-LayerNorm(global-avg-pool(features)), shape (B, dims[-1]) —
    by default; ``features=True`` returns the pre-pool NHWC map (for CAM)."""

    dims: Sequence[int] = (96, 192, 384, 768)
    depths: Sequence[int] = (1, 1, 3, 1)
    heads: Sequence[int] = (3, 6, 12, 24)
    window: int = 7
    dtype: Optional[jnp.dtype] = None
    # Pallas fused window attention (ops/pallas/window_attention.py).
    # None = auto, resolved at apply time by winattn_mode(): the strip
    # kernel on TPU (measured +14% over XLA, docs/DESIGN.md §5b-r3), XLA
    # elsewhere and under ONNX-export tracing. SKINJAX_WINATTN overrides:
    #   pallas     -> strip-blocked NHWC kernel (partition/pad/reverse folded
    #                 into kernel index maps) where H,W divide the window,
    #                 padded-window kernel elsewhere
    #   pallas-pad -> padded-window kernel everywhere (A/B control)
    #   einsum     -> 6-D einsum windows (no partition transposes)
    fused_attn: Optional[bool] = None
    einsum_attn: Optional[bool] = None
    strip_attn: Optional[bool] = None
    # SKINJAX_CHATTN=pallas: fused channel-attention kernel
    # (ops/pallas/channel_attention.py) — measured-refuted lever
    # (§5b-r3b), stays env-opt-in only; None = off unless the env asks
    ch_fused_attn: Optional[bool] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False, features: bool = False,
                 feature_delta=None, capture: bool = False):
        from skinjax.ops.pallas.window_attention import winattn_mode

        mode = winattn_mode()
        fused = (self.fused_attn if self.fused_attn is not None
                 else mode in ("pallas", "pallas-pad"))
        einsum = (self.einsum_attn if self.einsum_attn is not None
                  else mode == "einsum")
        strip = (self.strip_attn if self.strip_attn is not None
                 else mode == "pallas")
        if self.ch_fused_attn is not None:
            ch_fused = self.ch_fused_attn
        else:  # env-opt-in only; forced off while the ONNX exporter traces
            ch_fused = (os.environ.get("SKINJAX_CHATTN", "") == "pallas"
                        and os.environ.get("SKINJAX_EXPORT_COMPAT", "") != "1")
        x = nn.Conv(self.dims[0], (7, 7), strides=(4, 4), padding=[(3, 3)] * 2,
                    dtype=self.dtype, name="stem_conv")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="stem_norm")(x)
        for si, (dim, depth, h) in enumerate(zip(self.dims, self.depths, self.heads)):
            if si > 0:
                x = DaViTDownsample(dim, dtype=self.dtype, name=f"down{si}")(x)
            for bi in range(depth):
                x = SpatialBlock(dim, h, self.window, dtype=self.dtype,
                                 fused_attn=fused,
                                 einsum_attn=einsum,
                                 strip_attn=strip,
                                 name=f"stage{si}_block{bi}_spatial")(x)
                x = ChannelBlock(dim, h, dtype=self.dtype,
                                 fused_attn=ch_fused,
                                 name=f"stage{si}_block{bi}_channel")(x)
        # CAM support (xai/cam.py): perturb/capture the final spatial map
        # while the pooled head still flows from it, so jax.grad of a class
        # score w.r.t. feature_delta is d(score)/d(feature_map)
        if feature_delta is not None:
            x = x + feature_delta
        fmap = x
        if features:
            return x
        x = x.mean(axis=(1, 2))
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="head_norm")(x)
        return (x, fmap) if capture else x


davit_tiny = partial(DaViT)
