"""Sentence-dataset sweep glue: create_model builds the native tower for
bert/gpt2 text-model names (was: MultimodalModel setup ValueError),
build_token_source tokenizes the 'sentence' column into a TokenSource, and
train_process grafts pretrained tower weights over the init."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from skinjax.models.factory import create_model


def test_create_model_bert_sentence():
    from skinjax.models.fusion import MultimodalModel
    from skinjax.models.text.bert import NativeSentenceTower

    m = create_model(num_classes=6, text_model_name="bert-base-uncased",
                     attention_mechanism="concatenation")
    assert isinstance(m, MultimodalModel)
    assert isinstance(m.text_module, NativeSentenceTower)
    assert m.text_input_mode == "tokens"
    assert m.text_module.pool == "cls"
    assert m.text_encoder_dim_output == 768


def test_create_model_gpt2_sentence():
    from skinjax.models.text.bert import NativeSentenceTower

    m = create_model(num_classes=6, text_model_name="gpt2",
                     attention_mechanism="concatenation")
    assert isinstance(m.text_module, NativeSentenceTower)
    assert m.text_module.pool == "last"  # multimodalIntraModalWithBert.py:91
    assert m.text_module.scope_name == "gpt2"


def _prepared_with_sentences(tmp_path, n=6):
    import pandas as pd

    from skinjax.data.featurizer import MetadataFeaturizer
    from skinjax.data.schemas import PreparedDataset

    fz = MetadataFeaturizer(categorical_cols=[], numerical_cols=[])
    fz.label_encoder.classes = ["a", "b"]
    raw = pd.DataFrame({
        "sentence": [f"the patient presents lesion on left arm {i}"
                     for i in range(n)],
    })
    return PreparedDataset(
        name="synthetic", image_files=[f"{i}.png" for i in range(n)],
        features=np.zeros((n, 1), np.float32),
        labels=(np.arange(n) % 2).astype(np.int32),
        groups=np.arange(n), class_names=["a", "b"], featurizer=fz, raw=raw,
    )


def _bert_vocab_dir(tmp_path):
    d = os.path.join(str(tmp_path), "bert-base-uncased")
    os.makedirs(d, exist_ok=True)
    specials = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    words = ["the", "patient", "presents", "lesion", "on", "left", "arm",
             "0", "1", "2", "3", "4", "5"]
    with open(os.path.join(d, "vocab.txt"), "w", encoding="utf-8") as f:
        f.write("\n".join(specials + words))
    return str(tmp_path)


def test_build_token_source(tmp_path, monkeypatch):
    from PIL import Image

    from skinjax.train.experiments import build_token_source

    prepared = _prepared_with_sentences(tmp_path)
    img_dir = os.path.join(str(tmp_path), "images")
    os.makedirs(img_dir)
    for f in prepared.image_files:
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
            os.path.join(img_dir, f))

    src = build_token_source(
        prepared, img_dir, "bert-base-uncased", max_seq_length=16,
        tokenizers_dir=_bert_vocab_dir(tmp_path), image_size=(8, 8))
    b = src.batch(np.array([0, 3]))
    assert b["metadata"]["input_ids"].shape == (2, 16)
    assert b["metadata"]["attention_mask"].shape == (2, 16)
    assert b["image"].shape == (2, 8, 8, 3)
    # CLS prefix present, padding masked out
    assert (b["metadata"]["attention_mask"][:, 0] == 1).all()
    assert (b["metadata"]["attention_mask"][:, -1] == 0).all()


def test_build_token_source_missing_column(tmp_path):
    from skinjax.train.experiments import build_token_source

    prepared = _prepared_with_sentences(tmp_path)
    prepared.raw.drop(columns=["sentence"], inplace=True)
    with pytest.raises(ValueError, match="sentence"):
        build_token_source(prepared, str(tmp_path), "bert-base-uncased")


def test_train_process_grafts_pretrained():
    """train_process swaps the tower init for build_sentence_tower's
    imported weights (loop.py graft hook)."""
    from transformers import BertConfig, FlaxBertModel

    from skinjax.models.fusion import MultimodalModel
    from skinjax.models.text.bert import (
        NativeBertEncoder, NativeSentenceTower, config_from_hf,
        import_hf_bert_params)
    from skinjax.data.pipeline import TokenSource
    from skinjax.train.loop import TrainConfig, train_process

    cfg_hf = BertConfig(vocab_size=31, hidden_size=16, num_hidden_layers=1,
                        num_attention_heads=2, intermediate_size=32,
                        max_position_embeddings=16)
    hf = FlaxBertModel(cfg_hf, seed=0)
    tower = NativeSentenceTower(
        encoder=NativeBertEncoder(**config_from_hf(cfg_hf)))
    object.__setattr__(tower, "pretrained_params",
                       import_hf_bert_params(hf.params))
    model = MultimodalModel(
        num_classes=2, num_heads=2, cnn_model_name="custom-cnn",
        common_dim=16, text_module=tower, text_input_mode="tokens",
        text_encoder_dim_output=16, attention_mechanism="concatenation")

    rng = np.random.default_rng(0)
    n = 8
    src = TokenSource(
        rng.integers(0, 255, (n, 24, 24, 3)).astype(np.uint8), None,
        rng.integers(0, 31, (n, 8)).astype(np.int32),
        np.ones((n, 8), np.int32), (np.arange(n) % 2).astype(np.int32))
    cfg = TrainConfig(num_epochs=1, batch_size=4, image_dtype="float32",
                      augment=False, text_train_mode="frozen_weights")
    state, _, _ = train_process(model, src, src, num_classes=2, config=cfg)
    got = np.asarray(jax.device_get(
        state.params["text_module"]["bert"]["embeddings"]["word_embeddings"]
        ["embedding"]))
    want = np.asarray(hf.params["embeddings"]["word_embeddings"]["embedding"])
    # tower frozen -> the grafted weights survive training verbatim
    np.testing.assert_array_equal(got, want)
