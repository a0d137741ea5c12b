"""Mid-training resume, fold parallelism assignment, and .env config loading."""

import os

import numpy as np
import pytest
import jax

from skinjax.configs import load_env_config
from skinjax.data import synthetic_source
from skinjax.models import MultimodalModel
from skinjax.parallel.folds import folds_for_this_host
from skinjax.train import TrainConfig, train_process
from skinjax.train.kfold import SubsetSource


def _model():
    return MultimodalModel(
        num_classes=3, num_heads=4, cnn_model_name="custom-cnn", common_dim=32,
        text_encoder_dim_output=32, vocab_size=12,
        attention_mechanism="concatenation",
    )


def test_mid_training_resume(tmp_path):
    src = synthetic_source(n=48, image_size=(24, 24), feature_dim=12, num_classes=3)
    train = SubsetSource(src, np.arange(32))
    val = SubsetSource(src, np.arange(32, 48))
    rd = str(tmp_path / "resume")
    cfg = TrainConfig(num_epochs=2, batch_size=16, image_dtype="float32",
                      augment=False)

    # run 2 epochs with checkpointing
    s1, m1, h1 = train_process(_model(), train, val, 3, config=cfg, resume_dir=rd)
    assert os.path.exists(os.path.join(rd, "progress.json"))

    # "crash" and resume with a higher epoch budget: must start at epoch 2
    cfg4 = TrainConfig(num_epochs=4, batch_size=16, image_dtype="float32",
                       augment=False)
    s2, m2, h2 = train_process(_model(), train, val, 3, config=cfg4, resume_dir=rd)
    # history = 2 restored epochs + 2 newly-run epochs
    assert len(h2["train_loss"]) == 4
    assert h2["train_loss"][:2] == h1["train_loss"]

    import json

    with open(os.path.join(rd, "progress.json")) as f:
        prog = json.load(f)
    assert prog["epoch"] == 3
    assert "plateau_lr" in prog and "early_counter" in prog


def test_resume_restores_best_weights(tmp_path):
    """A 'best' checkpoint is written on improvement and restored on resume,
    so load_best() after a resume returns the true pre-crash best even when
    no later epoch improves (ADVICE r1, medium)."""
    src = synthetic_source(n=48, image_size=(24, 24), feature_dim=12, num_classes=3)
    train = SubsetSource(src, np.arange(32))
    val = SubsetSource(src, np.arange(32, 48))
    rd = str(tmp_path / "resume_best")
    cfg = TrainConfig(num_epochs=2, batch_size=16, image_dtype="float32",
                      augment=False)
    s1, _, _ = train_process(_model(), train, val, 3, config=cfg, resume_dir=rd)
    assert os.path.exists(os.path.join(rd, "best"))

    # resume with zero additional epochs: the loop body never runs, so the
    # returned best state must come from the restored 'best' checkpoint
    cfg_same = TrainConfig(num_epochs=2, batch_size=16, image_dtype="float32",
                           augment=False)
    s2, _, _ = train_process(_model(), train, val, 3, config=cfg_same,
                             resume_dir=rd)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_folds_for_this_host():
    assert folds_for_this_host(5, index=0, count=2) == [1, 3, 5]
    assert folds_for_this_host(5, index=1, count=2) == [2, 4]
    all_folds = sum((folds_for_this_host(5, i, 3) for i in range(3)), [])
    assert sorted(all_folds) == [1, 2, 3, 4, 5]


def test_load_env_config(tmp_path):
    env = tmp_path / ".env"
    env.write_text(
        'NUM_EPOCHS=7\nBATCH_SIZE=16\nK_FOLDS=3\nLIST_NUM_HEADS=[4, 8]\n'
        'COMMON_DIM=256\nUNFREEZE_WEIGHTS=False\n'
        'RESULTS_FOLDER_PATH="./out"\nSEARCH_STEPS=9\n'
    )
    # ensure ambient process env doesn't override what we assert on
    for k in ("NUM_EPOCHS", "BATCH_SIZE", "K_FOLDS", "LIST_NUM_HEADS",
              "COMMON_DIM", "UNFREEZE_WEIGHTS", "SEARCH_STEPS"):
        os.environ.pop(k, None)
    cfg = load_env_config(str(env))
    assert cfg.train.num_epochs == 7
    assert cfg.train.batch_size == 16
    assert cfg.k_folds == 3
    assert cfg.list_num_heads == [4, 8]
    assert cfg.common_dim == 256
    assert cfg.train.unfreeze_weights == "frozen_weights"  # False normalized
    assert cfg.results_folder_path == "./out"
    assert cfg.search_steps == 9
