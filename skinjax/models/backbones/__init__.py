"""Backbone registry — the reference's ``loadModels.loadModelImageEncoder``
contract (loadImageModelClassifier.py:40-157) rebuilt as a factory returning
``(flax module, feature_dim)`` for a backbone name.

Names mirror the reference's config strings so existing sweep configs port
unchanged. Every backbone returns pre-pooling features (spatial NHWC map, a
token sequence, or pooled vector — the multimodal wrapper normalizes).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from skinjax.models.backbones import (
    beit,
    caformer,
    cnn_zoo,
    coat,
    davit,
    nextvit,
    mvit,
    resnet,
    transformer_zoo,
    vit,
)

# name -> (constructor(dtype, common_dim) -> module, feature_dim or None if
# common_dim-dependent)
_REGISTRY: Dict[str, Tuple[Callable, Optional[int]]] = {}


def register(name: str, ctor: Callable, feature_dim: Optional[int]) -> None:
    _REGISTRY[name] = (ctor, feature_dim)


def create_backbone(
    name: str, common_dim: int = 512, dtype: Optional[jnp.dtype] = None
) -> Tuple[nn.Module, int]:
    """Instantiate a backbone by config string. Returns (module, feat_dim)."""
    if name not in _REGISTRY:
        raise ValueError(
            f"Backbone '{name}' not implemented. Available: {sorted(_REGISTRY)}"
        )
    ctor, dim = _REGISTRY[name]
    module = ctor(name=None, dtype=dtype, common_dim=common_dim)
    return module, (dim if dim is not None else common_dim)


def available_backbones() -> list:
    return sorted(_REGISTRY)


def _simple(cls, **kw):
    """Adapter: ignore common_dim for backbones that don't take it."""

    def ctor(name=None, dtype=None, common_dim=512):
        return cls(dtype=dtype, **kw)

    return ctor


register(
    "custom-cnn",
    lambda name=None, dtype=None, common_dim=512: cnn_zoo.CustomCNN(
        common_dim=common_dim, dtype=dtype
    ),
    None,
)
register("resnet-18", _simple(resnet.resnet18), 512)
register("resnet-50", _simple(resnet.resnet50), 2048)
register("vgg16", _simple(cnn_zoo.VGG16), 4096)
register("densenet169", _simple(cnn_zoo.DenseNet, block_config=(6, 12, 32, 32)), 1664)
register("mobilenet-v2", _simple(cnn_zoo.MobileNetV2), 1280)
register("efficientnet-b0", _simple(cnn_zoo.EfficientNet, width=1.0, depth=1.0), 1280)
register("efficientnet-b7", _simple(cnn_zoo.EfficientNet, width=2.0, depth=3.1), 2560)
register("swin_tiny_patch4_window7_224", _simple(transformer_zoo.swin_tiny), 768)
register("caformer_b36", _simple(caformer.caformer_b36), 768)
register("caformer_s18", _simple(caformer.caformer_s18), 512)
register("mvitv2_small", _simple(mvit.mvitv2_small), 768)
register("nextvit_small", _simple(nextvit.nextvit_small), 1024)
register("coat_lite_small", _simple(coat.coat_lite_small), 512)
register("davit_tiny", _simple(davit.davit_tiny), 768)
register("vit_tiny_patch16_224", _simple(vit.vit_tiny), 192)
register("vit_small_patch16_224", _simple(vit.vit_small), 384)
register("vit_base_patch16_224", _simple(vit.vit_base), 768)
register("vit_large_patch16_224", _simple(vit.vit_large), 1024)
register("beitv2_large_patch16_224", _simple(beit.beitv2_large), 1024)
