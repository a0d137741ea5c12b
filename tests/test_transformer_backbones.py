"""Swin/DaViT backbone tests + sentence/tabular text-tower wiring."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from skinjax.models.backbones import create_backbone
from skinjax.models.backbones.davit import DaViT
from skinjax.models.backbones.transformer_zoo import (
    Swin,
    window_partition,
    window_reverse,
)


def test_window_partition_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 14, 14, 8)), jnp.float32)
    w = window_partition(x, 7)
    assert w.shape == (2 * 4, 49, 8)
    back = window_reverse(w, 7, 14, 14)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


@pytest.mark.parametrize("cls", [Swin, DaViT])
def test_tiny_transformer_forward(cls):
    # scaled-down config (window 7 needs H,W divisible: 28 -> 7 after stages)
    model = cls(dims=(16, 32), depths=(1, 1), heads=(2, 4), window=7)
    x = jnp.zeros((2, 56, 56, 3))
    variables = model.init(jax.random.key(0), x)
    out = model.apply(variables, x)
    # Swin returns the normed NHWC map; DaViT (timm reset_classifier(0)
    # parity) returns the pooled+head-normed vector
    assert out.shape[0] == 2 and out.shape[-1] == 32
    assert out.ndim == (2 if cls is DaViT else 4)
    assert np.isfinite(np.asarray(out)).all()


def test_registry_includes_transformers():
    m, dim = create_backbone("davit_tiny")
    assert dim == 768
    m, dim = create_backbone("swin_tiny_patch4_window7_224")
    assert dim == 768


def test_tabular_text_tower_wiring():
    from skinjax.models import MultimodalModel
    from skinjax.models.text import TabTransformer

    tower = TabTransformer(
        categorical_cardinalities=(5, 3, 4), num_continuous=2, embed_dim=8,
        num_heads=2, num_layers=1, hidden_dim=16, out_dim=32,
    )
    model = MultimodalModel(
        num_classes=4, num_heads=4, cnn_model_name="custom-cnn", common_dim=32,
        text_encoder_dim_output=32, text_model_name="tab-transformer",
        text_module=tower, text_input_mode="tabular",
        attention_mechanism="concatenation",
    )
    img = jnp.zeros((2, 32, 32, 3))
    meta = {
        "categorical": jnp.zeros((2, 3), jnp.int32),
        "numerical": jnp.zeros((2, 2), jnp.float32),
    }
    variables = model.init(jax.random.key(0), img, meta)
    out = model.apply(variables, img, meta)
    assert out.shape == (2, 4)


def test_hf_sentence_tower_wiring():
    transformers = pytest.importorskip("transformers")
    from transformers import BertConfig, FlaxBertModel

    from skinjax.models import MultimodalModel
    from skinjax.models.text.sentence import HFSentenceTower

    cfg = BertConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, vocab_size=100, max_position_embeddings=64,
    )
    hf = FlaxBertModel(cfg)
    tower = HFSentenceTower(hf_module=hf, out_dim=None)
    model = MultimodalModel(
        num_classes=3, num_heads=4, cnn_model_name="custom-cnn", common_dim=32,
        text_encoder_dim_output=32, text_model_name="bert-base-uncased",
        text_module=tower, text_input_mode="tokens",
        attention_mechanism="concatenation",
    )
    img = jnp.zeros((2, 32, 32, 3))
    meta = {
        "input_ids": jnp.ones((2, 16), jnp.int32),
        "attention_mask": jnp.ones((2, 16), jnp.int32),
    }
    variables = model.init(jax.random.key(0), img, meta)
    out = model.apply(variables, img, meta)
    assert out.shape == (2, 3)


def test_transformer_backbone_trains_end_to_end():
    """Swin-style windowed backbone through the standard training loop."""
    from skinjax.data import synthetic_source
    from skinjax.models import MultimodalModel
    from skinjax.train import TrainConfig, train_process
    from skinjax.train.kfold import SubsetSource

    src = synthetic_source(n=32, image_size=(56, 56), feature_dim=10, num_classes=3)
    train = SubsetSource(src, np.arange(24))
    val = SubsetSource(src, np.arange(24, 32))
    # registry entry is full-size; build a scaled-down Swin via text_module-free
    # MultimodalModel with a custom-registered backbone
    from skinjax.models.backbones import register
    from skinjax.models.backbones.transformer_zoo import Swin

    register("swin_test_tiny",
             lambda name=None, dtype=None, common_dim=512: Swin(
                 dims=(16, 32), depths=(1, 1), heads=(2, 4), window=7,
                 dtype=dtype),
             32)
    model = MultimodalModel(
        num_classes=3, num_heads=4, cnn_model_name="swin_test_tiny",
        common_dim=32, text_encoder_dim_output=32, vocab_size=10,
        attention_mechanism="crossattention",
    )
    state, metrics, history = train_process(
        model, train, val, num_classes=3,
        config=TrainConfig(num_epochs=1, batch_size=8, image_dtype="float32",
                           augment=True),
    )
    assert np.isfinite(history["train_loss"]).all()
    assert np.isfinite(metrics["balanced_accuracy"])
