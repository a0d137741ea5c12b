"""Sequence-aware fusion variant + bilinear pooling.

Rebuilds the notable legacy variants (SURVEY.md §2.1 'Legacy model variants'):
  * multimodalGated.py:118-250 — keeps the ViT token sequence (and/or BERT
    token sequence) instead of pooling first: self-attention over tokens,
    cross-attention between modality sequences, mean-pool after cross-attn,
    gated fusion. This is the one place the framework runs seq_len > 1
    attention, exercising the general MHA path on the MXU.
  * multimodalIntraInterModalWithResidualBlock.py:25-35 — BilinearPooling:
    z = x^T W y fused feature (low-rank factored here so the parameter count
    stays O(d·k) instead of O(d²·k)).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from skinjax.models.backbones import create_backbone
from skinjax.models.fusion.blocks import LN_EPS, MLPHead
from skinjax.models.text import OneHotMLP
from skinjax.ops.attention import MultiHeadAttention


class BilinearPooling(nn.Module):
    """Low-rank bilinear fusion: out_k = (x @ U)_k * (y @ V)_k, projected."""

    out_dim: int
    rank: int = 256
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, y):
        u = nn.Dense(self.rank, dtype=self.dtype, name="u")(x)
        v = nn.Dense(self.rank, dtype=self.dtype, name="v")(y)
        z = u * v
        z = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm")(z)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="proj")(z)


class SequenceFusionModel(nn.Module):
    """Token-sequence multimodal fusion (multimodalGated.py topology).

    Image tokens (B, T, D) from a ViT-class backbone; metadata encoded to a
    short learned 'token' sequence; self-attn per modality → cross-attn
    between sequences → mean-pool → gated concat → MLP head.
    """

    num_classes: int
    num_heads: int = 8
    cnn_model_name: str = "vit_small_patch16_224"
    common_dim: int = 512
    vocab_size: int = 91
    meta_tokens: int = 4
    dropout_rate: float = 0.5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, image, metadata, *, train: bool = False, capture: bool = False):
        det = not train
        backbone, feat_dim = create_backbone(
            self.cnn_model_name, common_dim=self.common_dim, dtype=self.dtype
        )
        tokens = backbone(image, train=train, tokens=True)  # (B, T, D_b)
        img_seq = nn.Dense(self.common_dim, dtype=self.dtype, name="img_proj")(tokens)

        txt = OneHotMLP(
            out_dim=self.common_dim * self.meta_tokens, dtype=self.dtype,
            name="text_tower",
        )(metadata, deterministic=det)
        txt_seq = txt.reshape(txt.shape[0], self.meta_tokens, self.common_dim)

        mha = lambda name: MultiHeadAttention(
            self.common_dim, self.num_heads, dtype=self.dtype, name=name
        )
        img_att = mha("img_self")(img_seq, img_seq, img_seq)
        txt_att = mha("txt_self")(txt_seq, txt_seq, txt_seq)
        img_x = mha("img_cross")(img_att, txt_att, txt_att)
        txt_x = mha("txt_cross")(txt_att, img_att, img_att)

        img_pooled = img_x.mean(axis=1)
        txt_pooled = txt_x.mean(axis=1)

        a_img = jax.nn.sigmoid(
            nn.Dense(self.common_dim, dtype=self.dtype, name="img_gate")(img_pooled)
        )
        a_txt = jax.nn.sigmoid(
            nn.Dense(self.common_dim, dtype=self.dtype, name="txt_gate")(txt_pooled)
        )
        fused = jnp.concatenate([a_img * img_pooled, a_txt * txt_pooled], axis=-1)
        logits = MLPHead(
            hidden=self.common_dim, num_classes=self.num_classes,
            dropout_rate=self.dropout_rate, dtype=self.dtype, name="head",
        )(fused, deterministic=det)
        if capture:
            return logits, {"tokens": tokens, "img_pooled": img_pooled,
                            "txt_pooled": txt_pooled}
        return logits
