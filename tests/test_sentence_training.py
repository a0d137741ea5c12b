"""End-to-end sentence-metadata training: TokenSource + HF BERT tower through
train_process (the sentence-dataset path, train_pad_20_with_llm-generated-
sentences.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_sentence_training_end_to_end():
    transformers = pytest.importorskip("transformers")
    from transformers import BertConfig, FlaxBertModel

    from skinjax.data.pipeline import TokenSource
    from skinjax.models import MultimodalModel
    from skinjax.models.text.sentence import HFSentenceTower
    from skinjax.train import TrainConfig, train_process
    from skinjax.train.kfold import SubsetSource

    rng = np.random.default_rng(0)
    n, T, ncls = 48, 12, 3
    labels = rng.integers(0, ncls, n).astype(np.int32)
    images = rng.integers(0, 256, (n, 32, 32, 3), dtype=np.uint8)
    # class-conditional token signal
    ids = rng.integers(5, 50, (n, T)).astype(np.int32)
    ids[:, 0] = labels + 1
    mask = np.ones((n, T), np.int32)

    src = TokenSource(images, None, ids, mask, labels)

    cfg = BertConfig(hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
                     intermediate_size=64, vocab_size=64,
                     max_position_embeddings=32)
    tower = HFSentenceTower(hf_module=FlaxBertModel(cfg))
    model = MultimodalModel(
        num_classes=ncls, num_heads=4, cnn_model_name="custom-cnn",
        common_dim=32, text_encoder_dim_output=32,
        text_model_name="bert-base-uncased", text_module=tower,
        text_input_mode="tokens", attention_mechanism="concatenation",
    )
    train = SubsetSource(src, np.arange(32))
    val = SubsetSource(src, np.arange(32, 48))
    state, metrics, history = train_process(
        model, train, val, num_classes=ncls,
        config=TrainConfig(num_epochs=2, batch_size=16, learning_rate=1e-3,
                           image_dtype="float32", augment=True,
                           augment_recipe="sentence"),
    )
    assert np.isfinite(history["train_loss"]).all()
    assert history["probabilities"].shape == (16, ncls)
