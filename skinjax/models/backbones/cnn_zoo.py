"""CNN backbone zoo: custom-cnn, VGG16, DenseNet-169, MobileNet-V2,
EfficientNet-B0/B7 (Flax, NHWC).

TPU-first re-designs of the torchvision encoders loaded by the reference's
backbone factory (loadImageModelClassifier.py:50-113). Topologies and feature
dims match torchvision so (a) accuracy baselines are comparable and (b) weight
import from torch state_dicts is mechanical; layout is NHWC and compute bf16.

Contract (shared with resnet.py): ``__call__(x, train=False)`` returns the
pre-pooling feature map (B, H', W', C), except VGG16 which — like torchvision
with the last classifier layer removed (loadImageModelClassifier.py:78-82) —
returns pooled 4096-d features.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn


def _bn(train: bool, dtype, name: str, eps: float = 1e-5) -> nn.Module:
    """BatchNorm, torch semantics (eps 1e-5, momentum 0.1 torch == 0.9 flax).

    Stays on flax/XLA BatchNorm: the v5e profile shows XLA's convert+reduce
    fusions already sit near the HBM roofline for the separate-op BN
    formulation, and a measured Pallas replacement (ops/fused_bn.py,
    custom_vjp around single-pass stats kernels) LOST ~30 ms/step to the
    fusion barriers its op boundary introduces (copies/reshapes XLA could
    no longer fuse). The kernels remain available for fused conv-epilogue
    work, where the pass savings are real."""
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=eps, dtype=dtype, name=name
    )


class CustomCNN(nn.Module):
    """The reference's tiny 'custom-cnn' (loadImageModelClassifier.py:50-61):
    Conv(3->16, k3, s2) -> ReLU -> MaxPool2 -> GAP -> Dense(common_dim)."""

    common_dim: int = 512
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Conv(
            16, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)], dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.mean(axis=(1, 2))
        return nn.Dense(self.common_dim, dtype=self.dtype, name="fc")(x)


class VGG16(nn.Module):
    """torchvision VGG16 feature extractor with classifier[:-1] kept
    (loadImageModelClassifier.py:78-82): output is 4096-d pooled features."""

    dtype: Optional[jnp.dtype] = None
    cfg: Sequence = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                     512, 512, 512, "M", 512, 512, 512, "M")

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        conv_i = 0
        for v in self.cfg:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(
                    v, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                    name=f"conv{conv_i}",
                )(x)
                x = nn.relu(x)
                conv_i += 1
        # torchvision flattens NCHW (C,H,W) order -> transpose before reshape.
        x = x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)  # (B, 512*7*7)
        x = nn.Dense(4096, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5)(x, deterministic=not train)
        x = nn.Dense(4096, dtype=self.dtype, name="fc2")(x)
        x = nn.relu(x)
        return x


class DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        y = _bn(train, self.dtype, "norm1")(x)
        y = nn.relu(y)
        y = nn.Conv(
            self.bn_size * self.growth_rate, (1, 1), use_bias=False,
            dtype=self.dtype, name="conv1",
        )(y)
        y = _bn(train, self.dtype, "norm2")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.growth_rate, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
            dtype=self.dtype, name="conv2",
        )(y)
        return jnp.concatenate([x, y], axis=-1)


class DenseNet(nn.Module):
    """torchvision DenseNet; densenet169 = block_config (6,12,32,32), 1664 feats
    (loadImageModelClassifier.py:84-94)."""

    block_config: Sequence[int] = (6, 12, 32, 32)
    growth_rate: int = 32
    init_features: int = 64
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Conv(
            self.init_features, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2,
            use_bias=False, dtype=self.dtype, name="conv0",
        )(x)
        x = _bn(train, self.dtype, "norm0")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        n_feats = self.init_features
        for i, n_layers in enumerate(self.block_config):
            for j in range(n_layers):
                x = DenseLayer(
                    self.growth_rate, dtype=self.dtype, name=f"block{i}_layer{j}"
                )(x, train=train)
            n_feats += n_layers * self.growth_rate
            if i != len(self.block_config) - 1:  # transition
                n_feats //= 2
                x = _bn(train, self.dtype, f"trans{i}_norm")(x)
                x = nn.relu(x)
                x = nn.Conv(
                    n_feats, (1, 1), use_bias=False, dtype=self.dtype,
                    name=f"trans{i}_conv",
                )(x)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = _bn(train, self.dtype, "norm_final")(x)
        return nn.relu(x)  # (B, 7, 7, 1664) for densenet169 @224


class InvertedResidual(nn.Module):
    features: int
    stride: int
    expand_ratio: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        in_ch = x.shape[-1]
        hidden = in_ch * self.expand_ratio
        y = x
        if self.expand_ratio != 1:
            y = nn.Conv(hidden, (1, 1), use_bias=False, dtype=self.dtype, name="expand")(y)
            y = _bn(train, self.dtype, "expand_bn")(y)
            y = nn.relu6(y)
        y = nn.Conv(
            hidden, (3, 3), strides=(self.stride, self.stride),
            padding=[(1, 1)] * 2, feature_group_count=hidden, use_bias=False,
            dtype=self.dtype, name="dw",
        )(y)
        y = _bn(train, self.dtype, "dw_bn")(y)
        y = nn.relu6(y)
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype, name="project")(y)
        y = _bn(train, self.dtype, "project_bn")(y)
        if self.stride == 1 and in_ch == self.features:
            y = y + x
        return y


class MobileNetV2(nn.Module):
    """torchvision MobileNetV2 features, 1280-d output channels
    (loadImageModelClassifier.py:96-100)."""

    dtype: Optional[jnp.dtype] = None
    # (expand_ratio, channels, num_blocks, stride)
    cfg: Sequence = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
                     (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Conv(
            32, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2, use_bias=False,
            dtype=self.dtype, name="stem",
        )(x)
        x = _bn(train, self.dtype, "stem_bn")(x)
        x = nn.relu6(x)
        idx = 0
        for t, c, n, s in self.cfg:
            for j in range(n):
                x = InvertedResidual(
                    c, s if j == 0 else 1, t, dtype=self.dtype, name=f"block{idx}"
                )(x, train=train)
                idx += 1
        x = nn.Conv(1280, (1, 1), use_bias=False, dtype=self.dtype, name="head")(x)
        x = _bn(train, self.dtype, "head_bn")(x)
        return nn.relu6(x)


class SqueezeExcite(nn.Module):
    reduced: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        s = x.mean(axis=(1, 2))
        s = nn.Dense(self.reduced, dtype=self.dtype, name="fc1")(s)
        s = nn.silu(s)
        s = nn.Dense(x.shape[-1], dtype=self.dtype, name="fc2")(s)
        return x * nn.sigmoid(s)[:, None, None, :]


class MBConv(nn.Module):
    features: int
    kernel: int
    stride: int
    expand_ratio: int
    se_ratio: float = 0.25
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        in_ch = x.shape[-1]
        hidden = in_ch * self.expand_ratio
        y = x
        if self.expand_ratio != 1:
            y = nn.Conv(hidden, (1, 1), use_bias=False, dtype=self.dtype, name="expand")(y)
            y = _bn(train, self.dtype, "expand_bn", eps=1e-3)(y)
            y = nn.silu(y)
        pad = self.kernel // 2
        y = nn.Conv(
            hidden, (self.kernel, self.kernel), strides=(self.stride, self.stride),
            padding=[(pad, pad)] * 2, feature_group_count=hidden, use_bias=False,
            dtype=self.dtype, name="dw",
        )(y)
        y = _bn(train, self.dtype, "dw_bn", eps=1e-3)(y)
        y = nn.silu(y)
        y = SqueezeExcite(
            max(1, int(in_ch * self.se_ratio)), dtype=self.dtype, name="se"
        )(y)
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype, name="project")(y)
        y = _bn(train, self.dtype, "project_bn", eps=1e-3)(y)
        if self.stride == 1 and in_ch == self.features:
            y = y + x
        return y


def _round_filters(f: int, width: float) -> int:
    f *= width
    new_f = max(8, int(f + 4) // 8 * 8)
    if new_f < 0.9 * f:
        new_f += 8
    return int(new_f)


class EfficientNet(nn.Module):
    """EfficientNet-B0/B7 features (loadImageModelClassifier.py:102-112);
    B0: 1280 channels, B7: 2560."""

    width: float = 1.0
    depth: float = 1.0
    dtype: Optional[jnp.dtype] = None
    # (expand, channels, blocks, stride, kernel)
    cfg: Sequence = ((1, 16, 1, 1, 3), (6, 24, 2, 2, 3), (6, 40, 2, 2, 5),
                     (6, 80, 3, 2, 3), (6, 112, 3, 1, 5), (6, 192, 4, 2, 5),
                     (6, 320, 1, 1, 3))

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Conv(
            _round_filters(32, self.width), (3, 3), strides=(2, 2),
            padding=[(1, 1)] * 2, use_bias=False, dtype=self.dtype, name="stem",
        )(x)
        x = _bn(train, self.dtype, "stem_bn", eps=1e-3)(x)
        x = nn.silu(x)
        idx = 0
        for t, c, n, s, k in self.cfg:
            c = _round_filters(c, self.width)
            n = int(math.ceil(n * self.depth))
            for j in range(n):
                x = MBConv(
                    c, k, s if j == 0 else 1, t, dtype=self.dtype, name=f"block{idx}"
                )(x, train=train)
                idx += 1
        head = _round_filters(1280, self.width)
        x = nn.Conv(head, (1, 1), use_bias=False, dtype=self.dtype, name="head")(x)
        x = _bn(train, self.dtype, "head_bn", eps=1e-3)(x)
        return nn.silu(x)
