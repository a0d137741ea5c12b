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


def test_sentence_tower_follows_shared_freeze_knob():
    """unfreeze_weights="frozen_weights" freezes BOTH towers for tokens
    models (the reference passes one knob to both,
    multimodalIntraInterModal.py:52,69); text_train_mode overrides."""
    transformers = pytest.importorskip("transformers")
    from transformers import BertConfig, FlaxBertModel

    from skinjax.data.pipeline import TokenSource
    from skinjax.models import MultimodalModel
    from skinjax.models.text.sentence import HFSentenceTower
    from skinjax.train import TrainConfig, train_process
    from skinjax.train.kfold import SubsetSource

    rng = np.random.default_rng(1)
    n, T, ncls = 32, 8, 3
    labels = rng.integers(0, ncls, n).astype(np.int32)
    images = rng.integers(0, 256, (n, 32, 32, 3), dtype=np.uint8)
    ids = rng.integers(5, 50, (n, T)).astype(np.int32)
    attn = np.ones((n, T), np.int32)
    src = TokenSource(images, None, ids, attn, labels)

    cfg = BertConfig(hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
                     intermediate_size=64, vocab_size=64,
                     max_position_embeddings=32)

    def run(**cfg_kw):
        tower = HFSentenceTower(hf_module=FlaxBertModel(cfg))
        model = MultimodalModel(
            num_classes=ncls, num_heads=4, cnn_model_name="custom-cnn",
            common_dim=32, text_encoder_dim_output=32,
            text_model_name="bert-base-uncased", text_module=tower,
            text_input_mode="tokens", attention_mechanism="concatenation",
        )
        state, _, _ = train_process(
            model, SubsetSource(src, np.arange(24)),
            SubsetSource(src, np.arange(24, 32)), num_classes=ncls,
            config=TrainConfig(num_epochs=1, batch_size=8, learning_rate=1e-3,
                               image_dtype="float32", augment=False,
                               early_stopping_metric="val_loss", **cfg_kw),
        )
        return state

    s_frozen = run(unfreeze_weights="frozen_weights")
    s_unfrozen = run(unfreeze_weights="frozen_weights",
                     text_train_mode="unfrozen_weights")
    # same HF init (same module config/seed path), so compare tower params:
    # frozen run keeps them; the override trains them away from the frozen
    # run's values
    f_leaves = jax.tree_util.tree_leaves(s_frozen.params["text_module"]["hf"])
    u_leaves = jax.tree_util.tree_leaves(s_unfrozen.params["text_module"]["hf"])
    diffs = [not np.array_equal(np.asarray(a), np.asarray(b))
             for a, b in zip(f_leaves, u_leaves)]
    assert any(diffs), "text_train_mode override did not unfreeze the tower"
    # image encoder frozen in both
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        s_frozen.params["image_encoder"], s_unfrozen.params["image_encoder"],
    )
