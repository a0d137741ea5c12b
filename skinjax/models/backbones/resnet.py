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

from functools import partial
from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(self.kernel // 2, self.kernel // 2)] * 2,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
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
        for i, n_blocks in enumerate(self.stage_sizes):
            feats = self.width * (2**i)
            for j in range(n_blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                x = block_cls(
                    feats, stride, dtype=self.dtype, name=f"layer{i + 1}_{j}"
                )(x, train=train)
        return x  # (B, 7, 7, C) for 224 inputs


resnet18 = partial(ResNet, stage_sizes=(2, 2, 2, 2), block="basic")
resnet50 = partial(ResNet, stage_sizes=(3, 4, 6, 3), block="bottleneck")

FEATURE_DIMS = {"resnet-18": 512, "resnet-50": 2048}
