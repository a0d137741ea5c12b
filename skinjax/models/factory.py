"""Model factory — mirrors the reference's model-select switch
(train_pad_20.py:338-374): 'mdnet' | 'liwterm' | 'metanet' baselines, anything
else builds the canonical MultimodalModel with the requested backbone/fusion.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from skinjax.models.baselines import LiwTERM, MDNet, MetaNetModel
from skinjax.models.fusion import MultimodalModel


def create_model(
    *,
    num_classes: int,
    model_name: str = "multimodal",
    cnn_model_name: str = "resnet-50",
    text_model_name: str = "one-hot-encoder",
    attention_mechanism: str = "concatenation",
    num_heads: int = 8,
    common_dim: int = 512,
    vocab_size: int = 91,
    dtype: Optional[jnp.dtype] = None,
) -> nn.Module:
    name = model_name.lower()
    if name == "mdnet":
        return MDNet(
            num_classes=num_classes, meta_dim=vocab_size,
            cnn_model_name=cnn_model_name if "densenet" in cnn_model_name else "densenet169",
            dtype=dtype,
        )
    if name == "liwterm":
        return LiwTERM(
            num_classes=num_classes, image_encoder=cnn_model_name
            if cnn_model_name.startswith("vit") else "vit_large_patch16_224",
            dtype=dtype,
        )
    if name == "metanet":
        return MetaNetModel(
            num_classes=num_classes, image_encoder=cnn_model_name, dtype=dtype
        )
    if text_model_name.startswith(("bert", "gpt2")):
        # sentence datasets (train_pad_20_with_llm-generated-sentences.py):
        # native BERT/GPT-2 tower with the reference's per-family pooling;
        # metadata arrives as input_ids/attention_mask (data.TokenSource)
        from skinjax.models.text.sentence import build_sentence_tower

        tower = build_sentence_tower(text_model_name, dtype=dtype)
        return MultimodalModel(
            num_classes=num_classes,
            num_heads=num_heads,
            cnn_model_name=cnn_model_name,
            text_model_name=text_model_name,
            text_module=tower,
            text_input_mode="tokens",
            text_encoder_dim_output=int(tower.encoder.hidden_size),
            common_dim=common_dim,
            vocab_size=vocab_size,
            attention_mechanism=attention_mechanism,
            dtype=dtype,
        )
    return MultimodalModel(
        num_classes=num_classes,
        num_heads=num_heads,
        cnn_model_name=cnn_model_name,
        text_model_name=text_model_name,
        common_dim=common_dim,
        vocab_size=vocab_size,
        attention_mechanism=attention_mechanism,
        dtype=dtype,
    )
