"""Loss parity vs torch; metric parity vs sklearn."""

import numpy as np
import torch

import jax.numpy as jnp

from skinjax.train.losses import cross_entropy, focal_loss, soft_target_cross_entropy
from skinjax.train.metrics import classification_metrics, roc_auc


def _logits_labels(n=64, c=6, seed=0):
    rng = np.random.default_rng(seed)
    return (
        rng.normal(size=(n, c)).astype(np.float32),
        rng.integers(0, c, size=n).astype(np.int64),
    )


def test_weighted_ce_matches_torch():
    logits, labels = _logits_labels()
    w = np.random.default_rng(1).uniform(0.5, 2.0, size=6).astype(np.float32)
    ref = torch.nn.CrossEntropyLoss(weight=torch.tensor(w))(
        torch.tensor(logits), torch.tensor(labels)
    ).item()
    ours = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(w)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_focal_matches_reference_formula():
    logits, labels = _logits_labels(seed=2)
    alpha = np.random.default_rng(3).uniform(0.2, 1.0, size=6).astype(np.float32)
    # reference math (focalLoss.py:13-26) done in torch inline
    tl, tt = torch.tensor(logits), torch.tensor(labels)
    bce = torch.nn.functional.cross_entropy(tl, tt, reduction="none")
    pt = torch.exp(-bce)
    at = torch.tensor(alpha).gather(0, tt)
    ref = ((1 - pt) ** 2 * (at * bce)).mean().item()
    ours = float(
        focal_loss(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(alpha), 2.0)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_soft_target_ce_matches_reference_formula():
    logits, labels = _logits_labels(seed=4)
    soft = np.random.default_rng(5).dirichlet(np.ones(6), size=64).astype(np.float32)
    w = np.random.default_rng(6).uniform(0.5, 2.0, size=6).astype(np.float32)
    tl = torch.tensor(logits)
    logp = torch.nn.functional.log_softmax(tl, dim=-1)
    ref = -(torch.tensor(soft) * logp * torch.tensor(w)[None]).sum(-1).mean().item()
    ours = float(
        soft_target_cross_entropy(jnp.asarray(logits), jnp.asarray(soft), jnp.asarray(w))
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_metrics_match_sklearn_multiclass():
    from sklearn.metrics import (
        accuracy_score, balanced_accuracy_score, f1_score, precision_score,
        recall_score, roc_auc_score,
    )
    from sklearn.preprocessing import label_binarize

    rng = np.random.default_rng(7)
    n, c = 200, 5
    y = rng.integers(0, c, size=n)
    probs = rng.dirichlet(np.ones(c), size=n)
    pred = probs.argmax(1)

    m = classification_metrics(y, pred, probs, num_classes=c)
    assert np.isclose(m["accuracy"], accuracy_score(y, pred))
    assert np.isclose(m["balanced_accuracy"], balanced_accuracy_score(y, pred))
    assert np.isclose(
        m["precision"], precision_score(y, pred, average="weighted", zero_division=0)
    )
    assert np.isclose(
        m["recall"], recall_score(y, pred, average="weighted", zero_division=0)
    )
    assert np.isclose(
        m["f1_score"], f1_score(y, pred, average="weighted", zero_division=0)
    )
    ref_auc = roc_auc_score(
        label_binarize(y, classes=np.arange(c)), probs, average="weighted",
        multi_class="ovr",
    )
    assert np.isclose(m["auc"], ref_auc, atol=1e-10)


def test_metrics_match_sklearn_binary():
    from sklearn.metrics import f1_score, precision_score, recall_score, roc_auc_score

    rng = np.random.default_rng(8)
    y = rng.integers(0, 2, size=300)
    p1 = np.clip(y * 0.3 + rng.uniform(0, 0.7, size=300), 0, 1)
    probs = np.stack([1 - p1, p1], axis=1)
    pred = (p1 > 0.5).astype(int)

    m = classification_metrics(y, pred, probs, num_classes=2)
    assert np.isclose(m["precision"], precision_score(y, pred, zero_division=0))
    assert np.isclose(m["recall"], recall_score(y, pred, zero_division=0))
    assert np.isclose(m["f1_score"], f1_score(y, pred, zero_division=0))
    assert np.isclose(m["auc"], roc_auc_score(y, p1), atol=1e-12)


def test_auc_none_when_degenerate():
    y = np.zeros(10, dtype=int)
    probs = np.random.default_rng(0).dirichlet(np.ones(3), size=10)
    assert roc_auc(y, probs) is None
