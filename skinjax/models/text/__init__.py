"""Metadata/text encoder towers.

Rebuilds of the reference's text-side encoders:
  * one-hot MLP tower (multimodalIntraInterModal.py:57-64)
  * TabTransformer (tab_transformer.py:6-60)
  * static-embedding tower (PubMedBERT model2vec path,
    skinLesionDatasetsWithPubMedEmbeddings.py) — a projection over
    precomputed sentence embeddings
HF Flax BERT/GPT-2 towers plug in through the same (B, D) contract, and
``skinjax.models.text.bert.NativeBertEncoder`` / ``NativeSentenceTower``
provide the TPU-native BERT path (HF-identical param tree, bf16-capable,
fused-attention-kernel-backed).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from skinjax.models.fusion.blocks import LN_EPS, TransformerAttentionBlock
from skinjax.models.text.bert import (  # noqa: F401  (re-export)
    NativeBertEncoder,
    NativeSentenceTower,
    config_from_hf,
    import_hf_bert_params,
)
from skinjax.models.text.gpt2 import (  # noqa: F401  (re-export)
    NativeGPT2Encoder,
    config_from_hf_gpt2,
    import_hf_gpt2_params,
)


class OneHotMLP(nn.Module):
    """vocab_size -> 256 -> ReLU -> 512 -> ReLU -> out_dim
    (multimodalIntraInterModal.py:57-64)."""

    out_dim: int = 512
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = nn.Dense(256, dtype=self.dtype, name="fc0")(x)
        x = nn.relu(x)
        x = nn.Dense(512, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)


class StaticEmbeddingTower(nn.Module):
    """Projection head over precomputed sentence embeddings (PubMedBERT /
    model2vec static path). Input (B, E) -> (B, out_dim)."""

    out_dim: int = 512
    hidden: int = 512
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc0")(x)
        x = nn.relu(x)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="fc1")(x)


class TabTransformer(nn.Module):
    """TabTransformer over categorical indices + continuous features
    (tab_transformer.py:6-60).

    x_categorical: (B, n_cat) int32 indices; x_numerical: (B, n_num) float.
    Per-column embeddings -> transformer encoder -> flatten, numeric
    projection -> MLP head to out_dim.
    """

    categorical_cardinalities: Sequence[int]
    num_continuous: int
    embed_dim: int = 32
    num_heads: int = 4
    num_layers: int = 2
    hidden_dim: int = 128
    out_dim: int = 1
    dropout_rate: float = 0.3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x_categorical, x_numerical=None, *, deterministic: bool = True):
        embeds = [
            nn.Embed(card, self.embed_dim, dtype=self.dtype, name=f"embed{i}")(
                x_categorical[:, i]
            )
            for i, card in enumerate(self.categorical_cardinalities)
        ]
        x = jnp.stack(embeds, axis=1)  # (B, n_cat, E)
        for i in range(self.num_layers):
            x = TransformerAttentionBlock(
                self.embed_dim,
                self.num_heads,
                dropout_rate=self.dropout_rate,
                dtype=self.dtype,
                name=f"encoder{i}",
            )(x, deterministic=deterministic)
        feats = x.reshape(x.shape[0], -1)
        if self.num_continuous > 0 and x_numerical is not None:
            num = nn.Dense(self.embed_dim, dtype=self.dtype, name="numeric_proj")(
                x_numerical
            )
            feats = jnp.concatenate([feats, num], axis=-1)
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc_hidden")(feats)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="fc_out")(h)
