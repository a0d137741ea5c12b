"""End-to-end training tests on the synthetic fixture: the model must learn,
early stopping / plateau / freeze masks must behave, checkpoints round-trip."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from skinjax.data import synthetic_source
from skinjax.models import MultimodalModel
from skinjax.train import (
    PlateauScheduler,
    TrainConfig,
    run_kfold,
    trainable_mask,
    train_process,
)
from skinjax.train.kfold import SubsetSource


def _model(mech="concatenation", cnn="custom-cnn"):
    return MultimodalModel(
        num_classes=4, num_heads=4, cnn_model_name=cnn, common_dim=32,
        text_encoder_dim_output=32, vocab_size=16, attention_mechanism=mech,
    )


def _cfg(**kw):
    base = dict(
        num_epochs=5, batch_size=16, learning_rate=3e-3, image_dtype="float32",
        augment=False, early_stopping_patience=10,
    )
    base.update(kw)
    return TrainConfig(**base)


def test_train_learns_synthetic_signal():
    src = synthetic_source(n=128, image_size=(32, 32), feature_dim=16, num_classes=4)
    train = SubsetSource(src, np.arange(96))
    val = SubsetSource(src, np.arange(96, 128))
    state, metrics, history = train_process(
        _model(), train, val, num_classes=4, config=_cfg(num_epochs=15)
    )
    # metadata carries a strong class signal; must beat chance solidly
    assert metrics["balanced_accuracy"] > 0.6
    assert history["train_loss"][-1] < history["train_loss"][0]


def test_plateau_scheduler_matches_torch_semantics():
    s = PlateauScheduler(lr=1.0, factor=0.1, patience=2)
    lrs = [s.step(v) for v in [1.0, 0.9, 0.95, 0.96, 0.97]]
    # improvements at 1.0, 0.9; then 3 bad epochs -> cut at the 3rd
    assert lrs == [1.0, 1.0, 1.0, 1.0, 0.1]


def test_trainable_mask_modes():
    model = _model(cnn="resnet-18")
    img = jnp.zeros((1, 32, 32, 3))
    meta = jnp.zeros((1, 16))
    params = model.init(jax.random.key(0), img, meta)["params"]

    frozen = trainable_mask(params, "frozen_weights")
    leaves = jax.tree_util.tree_leaves_with_path(frozen)
    be = [v for p, v in leaves if "image_encoder" in jax.tree_util.keystr(p)]
    rest = [v for p, v in leaves if "image_encoder" not in jax.tree_util.keystr(p)]
    assert not any(be) and all(rest)

    unfrozen = trainable_mask(params, "unfrozen_weights")
    assert all(v for _, v in jax.tree_util.tree_leaves_with_path(unfrozen))

    # last_layer mode: exactly the final created backbone module (the
    # reference's params[-2:] heuristic = layer4_1's last BN scale/bias)
    last = trainable_mask(params, "last_layer_unfrozen_weights")
    unfrozen_backbone = [
        jax.tree_util.keystr(p)
        for p, v in jax.tree_util.tree_leaves_with_path(last)
        if v and "image_encoder" in jax.tree_util.keystr(p)
    ]
    assert unfrozen_backbone and all("layer4_1" in s for s in unfrozen_backbone)

    partial = trainable_mask(params, "partial")
    be_partial = [
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(partial)
        if "image_encoder" in jax.tree_util.keystr(p)
    ]
    assert any(v for _, v in be_partial) and not all(v for _, v in be_partial)
    assert all(v for s, v in be_partial if "layer4" in s)


def test_frozen_backbone_params_do_not_move():
    src = synthetic_source(n=48, image_size=(32, 32), feature_dim=16, num_classes=4)
    train = SubsetSource(src, np.arange(32))
    val = SubsetSource(src, np.arange(32, 48))
    model = _model(cnn="resnet-18")
    cfg = _cfg(num_epochs=1, unfreeze_weights="frozen_weights")
    state, _, _ = train_process(model, train, val, num_classes=4, config=cfg)

    init_rng, _ = jax.random.split(jax.random.key(42))  # train_process's split
    fresh = model.init(
        init_rng, jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 16))
    )["params"]
    # same init rng as train_process (seed=42) → frozen leaves identical
    for path, leaf in jax.tree_util.tree_leaves_with_path(state.params):
        s = jax.tree_util.keystr(path)
        ref = fresh
        # walk the same path in the fresh tree
        node = fresh
        for p in path:
            node = node[p.key]
        if "image_encoder" in s:
            np.testing.assert_array_equal(np.asarray(leaf), np.asarray(node))


def test_best_state_full_tree_usable_after_later_epochs(tmp_path):
    """Regression (ADVICE r4, high): the device-resident best snapshot must
    copy EVERY leaf it keeps — including ``step`` — because later epochs'
    jitted train steps donate the live state's buffers. A huge early-stopping
    delta pins the best epoch to 0 while training runs 3 more (donating)
    epochs; consuming the full returned tree then raised
    'Array has been deleted' before the fix."""
    src = synthetic_source(n=48, image_size=(32, 32), feature_dim=16, num_classes=4)
    train = SubsetSource(src, np.arange(32))
    val = SubsetSource(src, np.arange(32, 48))
    cfg = _cfg(num_epochs=4, early_stopping_delta=100.0)
    state, metrics, _ = train_process(_model(), train, val, num_classes=4, config=cfg)
    host = jax.device_get(state)  # full-tree consumer, step included
    assert int(host.step) > 0
    # the kfold save_checkpoints=True path is exactly this consumer
    from skinjax.train.checkpoint import save_checkpoint

    save_checkpoint(str(tmp_path / "best"), state)


def test_run_kfold_produces_artifacts(tmp_path):
    src = synthetic_source(n=60, image_size=(32, 32), feature_dim=16, num_classes=3)
    metrics = run_kfold(
        model_factory=lambda: MultimodalModel(
            num_classes=3, num_heads=4, cnn_model_name="custom-cnn", common_dim=32,
            text_encoder_dim_output=32, vocab_size=16,
            attention_mechanism="concatenation",
        ),
        source=src,
        labels=src.labels,
        groups=None,
        num_classes=3,
        class_names=["a", "b", "c"],
        config=_cfg(num_epochs=1),
        k_folds=3,
        results_dir=str(tmp_path),
        model_name="toy",
    )
    assert len(metrics) == 3
    assert (tmp_path / "model_metrics.csv").exists()
    assert (tmp_path / "toy_fold_1" / "predictions_eval_fold_1.csv").exists()
    assert (tmp_path / "toy_fold_1" / "confusion_matrix.png").exists()
    assert (tmp_path / "toy_fold_2" / "labels.npy").exists()


def test_checkpoint_roundtrip(tmp_path):
    from skinjax.train.checkpoint import restore_checkpoint, save_checkpoint
    from skinjax.train.loop import _dtype
    from skinjax.train.optimizer import make_optimizer
    from skinjax.train.steps import create_train_state

    model = _model()
    src = synthetic_source(n=16, image_size=(32, 32), feature_dim=16, num_classes=4)
    tx = make_optimizer(1e-3)
    state = create_train_state(
        model, jax.random.key(0), src.batch(np.arange(16)), tx
    )
    save_checkpoint(str(tmp_path / "ck"), state)

    state2 = create_train_state(
        model, jax.random.key(1), src.batch(np.arange(16)), tx
    )
    restored = restore_checkpoint(str(tmp_path / "ck"), state2)
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
