"""Multi-cell sweep smoke: the mechanism × backbone grid through
run_experiments (driver config #5's shape at toy scale)."""

import numpy as np

from skinjax.configs import ExperimentConfig
from skinjax.data import synthetic_source
from skinjax.data.featurizer import MetadataFeaturizer
from skinjax.data.schemas import PreparedDataset
from skinjax.train.experiments import run_experiments
from skinjax.train.loop import TrainConfig


def test_backbone_mechanism_grid(tmp_path):
    src = synthetic_source(n=40, image_size=(32, 32), feature_dim=12, num_classes=3)
    fz = MetadataFeaturizer(categorical_cols=[], numerical_cols=[])
    fz.label_encoder.classes = ["a", "b", "c"]
    prepared = PreparedDataset(
        name="synthetic", image_files=[str(i) for i in range(len(src))],
        features=src.features, labels=src.labels,
        groups=np.arange(len(src)), class_names=["a", "b", "c"],
        featurizer=fz, raw=None,
    )
    cfg = ExperimentConfig(
        attention_mechanisms=["concatenation", "gfcam"],
        cnn_model_names=["custom-cnn", "resnet-18"],
        list_num_heads=[4],
        common_dim=32,
        k_folds=2,
        results_folder_path=str(tmp_path),
        save_to_disk=False,
        train=TrainConfig(num_epochs=1, batch_size=16, image_dtype="float32",
                          augment=False),
    )
    metrics = run_experiments(cfg, source=src, prepared=prepared)
    # 2 mechanisms x 2 backbones x 2 folds
    assert len(metrics) == 8
    cells = {(m["mechanism"], m["backbone"]) for m in metrics}
    assert len(cells) == 4
    assert all(np.isfinite(m["balanced_accuracy"]) for m in metrics)


def test_sweep_survives_bad_cell(tmp_path):
    src = synthetic_source(n=24, image_size=(32, 32), feature_dim=12, num_classes=3)
    fz = MetadataFeaturizer(categorical_cols=[], numerical_cols=[])
    fz.label_encoder.classes = ["a", "b", "c"]
    prepared = PreparedDataset(
        name="synthetic", image_files=[str(i) for i in range(len(src))],
        features=src.features, labels=src.labels,
        groups=np.arange(len(src)), class_names=["a", "b", "c"],
        featurizer=fz, raw=None,
    )
    cfg = ExperimentConfig(
        attention_mechanisms=["concatenation"],
        cnn_model_names=["nonexistent-backbone", "custom-cnn"],
        list_num_heads=[4],
        common_dim=32,
        k_folds=2,
        results_folder_path=str(tmp_path),
        save_to_disk=False,
        train=TrainConfig(num_epochs=1, batch_size=8, image_dtype="float32",
                          augment=False),
    )
    metrics = run_experiments(cfg, source=src, prepared=prepared)
    # the bad backbone cell is skipped, the good one completes
    assert len(metrics) == 2
    assert all(m["backbone"] == "custom-cnn" for m in metrics)
