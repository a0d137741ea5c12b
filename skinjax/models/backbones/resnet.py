"""ResNet-18/50 image encoders (Flax, NHWC) — torchvision-compatible topology.

Re-design of the torchvision backbones the reference loads in
loadImageModelClassifier.py:66-76 (``resnet18/resnet50`` with ``fc`` stripped,
feature dims 512/2048). NHWC layout + bf16 compute keep convs on the MXU;
BatchNorm follows torch semantics (eps=1e-5, momentum 0.1 torch == 0.9 flax).

``__call__`` returns the **pre-pooling feature map** (B, H', W', C): the
multimodal wrapper GAPs it (multimodalIntraInterModal.py:169-170) and the XAI
suite (Grad-CAM family) needs the spatial map — returning it explicitly
replaces torch forward hooks.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

# SKINJAX_BN_SUBSAMPLE=<s>: compute BN batch statistics over a spatial
# stride-s subsample in training. The forward stat pass is the only part of
# BN whose HBM cost is removable (measured 8.7 ms of the 57 ms flagship
# step by running stats-free; the backward γ/β reductions persist either
# way — docs/DESIGN.md §5). Stats over B·H·W/s² ≥ 50k samples/channel are
# statistically equivalent for convergence; normalize math, γ/β grads and
# running-stat EMA stay exact w.r.t. the (subsampled) statistics. Opt-in,
# read at import time; 0/unset = exact full-batch stats.
_BN_SUBSAMPLE = int(os.environ.get("SKINJAX_BN_SUBSAMPLE", "0") or 0)

# SKINJAX_S2D_STEM=1: run the 7×7/s2 stem as an exact space-to-depth
# rewrite (pad → 2× space-to-depth → 4×4/s1 conv over 12 channels). The
# 3-channel stride-2 stem under-fills the MXU's input lanes; the rewrite
# quadruples input channels and removes the strided overlap at identical
# math (the kernel param keeps its (7,7,3,C) torchvision shape — the
# transform happens at trace time, so importers/checkpoints are unaffected).
_S2D_STEM = os.environ.get("SKINJAX_S2D_STEM", "") == "1"

# SKINJAX_REMAT=block: rematerialize each residual block in the backward
# pass (jax.checkpoint via nn.remat). Only block-boundary activations are
# stored; everything inside a block (conv outputs, BN normalizations,
# relus) is recomputed from the block input during the backward sweep —
# the canonical HBM-traffic-for-FLOPs trade on a bandwidth-bound trainer
# (docs/DESIGN.md §5: ~6 GB of stored activations at B=128). Param tree
# and numerics are unchanged; opt-in, read at import time.
_REMAT = os.environ.get("SKINJAX_REMAT", "")


class _SpaceToDepthConv7x7s2(nn.Module):
    """Exact rewrite of Conv(7×7, stride 2, pad 3, no bias) for even H, W:

    ``out(i,j) = Σ_{a,b<7} W[a,b]·x_pad[2i+a, 2j+b]`` regroups, with
    ``a = 2u+p``/``b = 2v+q`` (phases p, q ∈ {0,1}), into a VALID 4×4
    stride-1 conv over the 2×-space-to-depth input whose channel index is
    (p, q, c) — the zero-padded 8th kernel row/col contributes nothing.
    Param tree matches nn.Conv (``kernel``, same shape/init), so this module
    substitutes under the same name."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        import jax

        B, H, W, C = x.shape
        w = self.param(
            "kernel", nn.initializers.lecun_normal(), (7, 7, C, self.features)
        )
        dt = self.dtype or x.dtype
        w8 = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))
        w4 = (
            w8.reshape(4, 2, 4, 2, C, self.features)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(4, 4, 4 * C, self.features)
        )
        xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        Hp, Wp = H + 6, W + 6
        xs = (
            xp.reshape(B, Hp // 2, 2, Wp // 2, 2, C)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(B, Hp // 2, Wp // 2, 4 * C)
        )
        return jax.lax.conv_general_dilated(
            xs.astype(dt), w4.astype(dt), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class SubsampledStatsBatchNorm(nn.Module):
    """nn.BatchNorm-compatible (same params/batch_stats tree) with training
    statistics computed over ``x[:, ::s, ::s, :]``."""

    stride: int = 2
    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(C, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(C, jnp.float32))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xs = x[:, ::self.stride, ::self.stride, :].astype(jnp.float32)
            axes = tuple(range(xs.ndim - 1))
            mean = jnp.mean(xs, axes)
            var = jnp.mean(xs * xs, axes) - mean * mean  # fast variance
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        dt = self.dtype or x.dtype
        inv = (scale / jnp.sqrt(var + self.epsilon)).astype(dt)
        return x * inv + (bias - mean * scale
                          / jnp.sqrt(var + self.epsilon)).astype(dt)


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if (
            _S2D_STEM
            and self.kernel == 7
            and self.stride == 2
            and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0
        ):
            x = _SpaceToDepthConv7x7s2(
                self.features, dtype=self.dtype, name="conv"
            )(x)
        else:
            x = nn.Conv(
                self.features,
                (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding=[(self.kernel // 2, self.kernel // 2)] * 2,
                use_bias=False,
                dtype=self.dtype,
                name="conv",
            )(x)
        if _BN_SUBSAMPLE > 1:
            return SubsampledStatsBatchNorm(
                stride=_BN_SUBSAMPLE,
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                name="bn",
            )(x)
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn",
        )(x)


class BasicBlock(nn.Module):
    """torchvision BasicBlock: 3x3 -> 3x3 with identity/projection shortcut."""

    features: int
    stride: int = 1
    dtype: Optional[jnp.dtype] = None
    expansion: int = 1

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        residual = x
        y = ConvBN(self.features, 3, self.stride, dtype=self.dtype, name="conv1")(
            x, train=train
        )
        y = nn.relu(y)
        y = ConvBN(self.features, 3, 1, dtype=self.dtype, name="conv2")(y, train=train)
        if residual.shape != y.shape:
            residual = ConvBN(
                self.features * self.expansion,
                1,
                self.stride,
                dtype=self.dtype,
                name="downsample",
            )(x, train=train)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """torchvision Bottleneck: 1x1 -> 3x3(stride) -> 1x1(4x)."""

    features: int
    stride: int = 1
    dtype: Optional[jnp.dtype] = None
    expansion: int = 4

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        residual = x
        y = ConvBN(self.features, 1, 1, dtype=self.dtype, name="conv1")(x, train=train)
        y = nn.relu(y)
        y = ConvBN(self.features, 3, self.stride, dtype=self.dtype, name="conv2")(
            y, train=train
        )
        y = nn.relu(y)
        y = ConvBN(
            self.features * self.expansion, 1, 1, dtype=self.dtype, name="conv3"
        )(y, train=train)
        if residual.shape != y.shape:
            residual = ConvBN(
                self.features * self.expansion,
                1,
                self.stride,
                dtype=self.dtype,
                name="downsample",
            )(x, train=train)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Feature-extractor ResNet. stage_sizes/block select the variant."""

    stage_sizes: Sequence[int]
    block: str = "basic"  # "basic" | "bottleneck"
    width: int = 64
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        block_cls = BasicBlock if self.block == "basic" else Bottleneck
        x = ConvBN(self.width, 7, 2, dtype=self.dtype, name="stem")(x, train=train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        remat = _REMAT == "block" and train
        for i, n_blocks in enumerate(self.stage_sizes):
            feats = self.width * (2**i)
            for j in range(n_blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                name = f"layer{i + 1}_{j}"
                if remat:
                    # function-form nn.remat so the static `train` flag is
                    # closed over (not traced); param names are set inside,
                    # so the tree is identical to the unwrapped path.
                    # prevent_cse=False: safe under plain jit (no pmap/scan
                    # around the step) and lets XLA fuse recomputed forward
                    # chunks into the backward instead of fencing them.
                    def body(mdl, y, _f=feats, _s=stride, _n=name):
                        return block_cls(
                            _f, _s, dtype=mdl.dtype, name=_n
                        )(y, train=True)

                    x = nn.remat(body, prevent_cse=False)(self, x)
                else:
                    x = block_cls(
                        feats, stride, dtype=self.dtype, name=name
                    )(x, train=train)
        return x  # (B, 7, 7, C) for 224 inputs


resnet18 = partial(ResNet, stage_sizes=(2, 2, 2, 2), block="basic")
resnet50 = partial(ResNet, stage_sizes=(3, 4, 6, 3), block="bottleneck")

FEATURE_DIMS = {"resnet-18": 512, "resnet-50": 2048}
