"""Baseline models: MD-Net, LiwTERM, MetaNet (TPU-first Flax rebuilds).

Reference pointers: multimodalMDNet.py:60-102 (MDNet), liwtermModel.py:6-102
(LiwTERM), metanet.py:56-147 (MetaNetModel).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from skinjax.models.backbones import create_backbone
from skinjax.models.fusion.blocks import LN_EPS, MetaBlock, MetaNet


class MDNet(nn.Module):
    """DenseNet-169 features + MetaNet channel gates + spatial MetaBlock,
    fused by elementwise sum → GAP → linear head (multimodalMDNet.py:83-102)."""

    num_classes: int = 6
    meta_dim: int = 85
    hidden_dim: int = 128
    cnn_model_name: str = "densenet169"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, image, metadata, *, train: bool = False, capture: bool = False):
        backbone, num_channels = create_backbone(
            self.cnn_model_name, dtype=self.dtype
        )
        feat = backbone(image, train=train)  # (B, H', W', C)
        gated = MetaNet(
            middle_channels=self.hidden_dim,
            out_channels=num_channels,
            dtype=self.dtype,
            name="meta_net",
        )(feat, metadata)
        modulated = MetaBlock(v_dim=num_channels, dtype=self.dtype, name="meta_block")(
            feat, metadata
        )
        fused = gated + modulated
        pooled = fused.mean(axis=(1, 2))
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="classifier")(pooled)
        if capture:
            return logits, {"feature_map": fused, "img_feat": pooled}
        return logits


class LiwTERM(nn.Module):
    """ViT features → 4096-d projection; metadata → 1024-d; concat → deep
    shallow-lightweight-model MLP (liwtermModel.py:38-102)."""

    num_classes: int
    image_encoder: str = "vit_large_patch16_224"
    dropout_rate: float = 0.3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, image, metadata, *, train: bool = False, capture: bool = False):
        det = not train
        backbone, _ = create_backbone(self.image_encoder, dtype=self.dtype)
        v = backbone(image, train=train)
        if v.ndim == 3:
            v = v[:, 0]  # CLS token
        elif v.ndim == 4:
            v = v.mean(axis=(1, 2))
        aux = {"img_feat": v}

        v = nn.Dense(4096, dtype=self.dtype, name="visual_proj")(v)
        v = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="visual_norm")(v)
        v = nn.relu(v)
        v = nn.Dropout(self.dropout_rate)(v, deterministic=det)

        m = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="meta_norm")(metadata)
        m = nn.Dense(1024, dtype=self.dtype, name="meta_fc")(m)
        m = nn.relu(m)

        x = jnp.concatenate([v, m], axis=-1)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="slm_norm0")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=det)
        for i, width in enumerate((2048, 1024, 512)):
            x = nn.Dense(width, dtype=self.dtype, name=f"slm_fc{i}")(x)
            x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name=f"slm_norm{i + 1}")(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout_rate)(x, deterministic=det)
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="slm_out")(x)
        return (logits, aux) if capture else logits


class MetaNetModel(nn.Module):
    """Backbone conv features + MetaNet channel attention + GAP + MLP head
    (metanet.py:56-147, IEEE JBHI 2020)."""

    num_classes: int = 6
    image_encoder: str = "resnet-50"
    dropout_rate: float = 0.3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, image, metadata, *, train: bool = False, capture: bool = False):
        det = not train
        backbone, feat_dim = create_backbone(self.image_encoder, dtype=self.dtype)
        feat = backbone(image, train=train)  # (B, H', W', C)
        feat = MetaNet(
            middle_channels=128, out_channels=feat_dim, dtype=self.dtype,
            name="metanet",
        )(feat, metadata)
        aux = {"feature_map": feat}
        x = feat.mean(axis=(1, 2))
        aux["img_feat"] = x
        x = nn.Dense(feat_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm1")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=det)
        x = nn.Dense(feat_dim // 2, dtype=self.dtype, name="fc2")(x)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm2")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=det)
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="fc_out")(x)
        return (logits, aux) if capture else logits
