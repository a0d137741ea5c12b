"""Dry-run of the accuracy-parity runbook (tools/parity_runbook.py) with
synthetic weights and data: the full path — torch state_dict -> production
importer -> StratifiedGroupKFold -> per-fold evaluate -> report — must
produce exactly the BACCs the torch oracle itself earns on the same folds,
so the runbook is trustworthy the moment real PAD-UFES-20 weights arrive
(VERDICT r4 next #9)."""

import numpy as np
import torch

from skinjax.data.augment import IMAGENET_MEAN, IMAGENET_STD
from skinjax.data.pipeline import ArraySource
from skinjax.data.splits import stratified_group_kfold
from skinjax.tools.parity_runbook import PUBLISHED_BACC, run_parity
from skinjax.train.metrics import classification_metrics
from tests.test_full_model_parity import D, NCLS, VOCAB, TorchMM, _torch_state_dict

MECH = "att-intramodal+residual+cross-attention-metadados"


def test_runbook_matches_torch_oracle_fold_baccs():
    torch.manual_seed(21)
    tm = TorchMM(MECH).eval()
    sd = _torch_state_dict(tm)

    rng = np.random.default_rng(9)
    n = 60
    images = rng.integers(0, 256, size=(n, 32, 32, 3), dtype=np.uint8)
    feats = rng.normal(size=(n, VOCAB)).astype(np.float32)
    labels = rng.integers(0, NCLS, size=n).astype(np.int32)
    groups = np.arange(n) // 3  # 3 images per synthetic patient
    source = ArraySource(images, feats, labels)

    report = run_parity(
        sd, "resnet-18", MECH, source, labels, groups, NCLS,
        num_heads=4, common_dim=D, vocab_size=VOCAB, k_folds=3,
        batch_size=16, image_dtype="float32", published=0.5,
    )
    assert len(report["folds"]) == 3
    assert report["delta"] == round(report["mean_bacc"] - 0.5, 4)

    # oracle side: same folds, same normalize, argmax BACC per fold
    mean = np.asarray(IMAGENET_MEAN, np.float32).reshape(1, 1, 1, 3)
    std = np.asarray(IMAGENET_STD, np.float32).reshape(1, 1, 1, 3)
    folds = stratified_group_kfold(labels, groups, n_splits=3, seed=42)
    for fold_bacc, (_, va) in zip(report["folds"], folds):
        x = (images[va].astype(np.float32) / 255.0 - mean) / std
        with torch.no_grad():
            logits = tm(
                torch.from_numpy(np.ascontiguousarray(
                    x.transpose(0, 3, 1, 2))),
                torch.tensor(feats[va])).numpy()
        preds = logits.argmax(1)
        m = classification_metrics(labels[va], preds, None, NCLS)
        # report folds are rounded to 4 decimals
        assert abs(fold_bacc - float(m["balanced_accuracy"])) < 5e-5


def test_published_table_matches_reference():
    # frugality_bacc_by_models.py:5-17
    assert PUBLISHED_BACC["davit_tiny"] == 0.8228
    assert PUBLISHED_BACC["resnet-50"] == 0.8164
    assert len(PUBLISHED_BACC) == 10
