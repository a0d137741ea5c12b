"""Mesh-native fold parallelism: concurrent folds on DISJOINT submeshes of
one device mesh (parallel/folds.py fold_submeshes + run_kfold_submeshes) —
the single-slice expression of SURVEY §2's 'fold-level parallelism across
hosts'. Numerics must equal sequential run_kfold on an equal-shape mesh,
and the per-submesh artifacts must merge into the shared results dir."""

import os

import numpy as np
import pytest
import jax

from skinjax.data import synthetic_source
from skinjax.models import MultimodalModel
from skinjax.parallel.folds import fold_submeshes, run_kfold_submeshes
from skinjax.parallel.mesh import create_mesh
from skinjax.train import TrainConfig, run_kfold

NCLS = 4


def _factory():
    return lambda: MultimodalModel(
        num_classes=NCLS, num_heads=4, cnn_model_name="custom-cnn",
        common_dim=32, text_encoder_dim_output=32, vocab_size=16,
        attention_mechanism="concatenation",
    )


def _cfg():
    return TrainConfig(num_epochs=2, batch_size=16, learning_rate=3e-3,
                       image_dtype="float32", augment=False,
                       early_stopping_patience=10)


_NUM = ("balanced_accuracy", "accuracy", "epochs")


def test_submesh_folds_match_sequential(tmp_path):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    src = synthetic_source(n=64, image_size=(24, 24), feature_dim=16,
                           num_classes=NCLS)
    labels = src.labels
    common = dict(source=src, labels=labels, groups=None,
                  num_classes=NCLS, class_names=[f"c{i}" for i in range(NCLS)],
                  k_folds=2, model_name="m")

    # sequential baseline: both folds, one (2,2) submesh
    seq_mesh = create_mesh(n_data=2, n_model=2, devices=jax.devices()[:4])
    seq = run_kfold(_factory(), config=_cfg(),
                    results_dir=str(tmp_path / "seq"), mesh=seq_mesh,
                    **common)

    # concurrent: 2 folds on 2 disjoint (2,2) submeshes of the 8 devices
    subs = fold_submeshes(2, n_data=2, n_model=2)
    assert len({d.id for m in subs for d in m.devices.flat}) == 8  # disjoint
    par_dir = str(tmp_path / "par")
    par = run_kfold_submeshes(_factory(), submeshes=subs, config=_cfg(),
                              results_dir=par_dir, **common)

    assert [m["fold"] for m in par] == [m["fold"] for m in seq]
    for ms, mp in zip(seq, par):
        for k in _NUM:
            np.testing.assert_allclose(
                float(mp[k]), float(ms[k]), rtol=1e-6, atol=1e-6,
                err_msg=f"fold {ms['fold']} metric {k}")

    # artifacts merged: shared CSV has both folds, fold dirs moved up
    csv = os.path.join(par_dir, "model_metrics.csv")
    assert os.path.exists(csv)
    with open(csv) as f:
        rows = [r for r in f.read().strip().splitlines() if r]
    assert len(rows) == 3  # header + 2 folds
    for fold in (1, 2):
        assert os.path.isdir(os.path.join(par_dir, f"m_fold_{fold}"))
    assert not os.path.exists(os.path.join(par_dir, "submesh0"))
