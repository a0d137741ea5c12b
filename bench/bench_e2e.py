"""End-to-end experiment run ON CHIP: the full production loop — weighted
sampler, host prefetch, jitted train steps, per-epoch eval, plateau LR +
early stopping, best-checkpoint persistence, artifact writing — through
``run_experiments``, not an isolated train step. Measures what a user of the
reference's train_pad_20.py actually experiences per fold/epoch and
quantifies the input-pipeline + eval overhead over the bench.py step
ceiling (2232 img/s flagship).

Synthetic PAD-20-shaped dataset: n=2048, 224x224 uint8, 91 one-hot
features, 6 classes (the fake-dataset fixture, data/pipeline.py).
"""
import os as _os, sys as _sys  # repo-root import shim (scripts live in bench/)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
import os
import shutil
import time

os.environ.setdefault("SKINJAX_WINATTN", "pallas")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from skinjax.configs import ExperimentConfig
from skinjax.data import synthetic_source
from skinjax.data.featurizer import MetadataFeaturizer
from skinjax.data.schemas import PreparedDataset
from skinjax.train.experiments import run_experiments
from skinjax.train.loop import TrainConfig

OUT = "/tmp/skinjax_e2e"
shutil.rmtree(OUT, ignore_errors=True)
os.makedirs(OUT, exist_ok=True)

N, NCLS, B, EPOCHS = 2048, 6, 128, 3
src = synthetic_source(n=N, image_size=(224, 224), feature_dim=91,
                       num_classes=NCLS)
classes = [f"c{i}" for i in range(NCLS)]
fz = MetadataFeaturizer(categorical_cols=[], numerical_cols=[])
fz.label_encoder.classes = classes
prepared = PreparedDataset(
    name="synthetic", image_files=[str(i) for i in range(N)],
    features=src.features, labels=src.labels,
    groups=np.arange(N), class_names=classes, featurizer=fz, raw=None,
)
cfg = ExperimentConfig(
    attention_mechanisms=["att-intramodal+residual+cross-attention-metadados"],
    cnn_model_names=["resnet-50"],
    list_num_heads=[8],
    common_dim=512,
    k_folds=2,
    results_folder_path=OUT,
    save_to_disk=True,
    train=TrainConfig(num_epochs=EPOCHS, batch_size=B,
                      image_dtype="bfloat16", augment=True,
                      early_stopping_patience=10),
)

class _TimingTracker:
    """Timestamps each per-epoch log_dict call from train_process so the
    wall can be decomposed into compile-laden first epoch vs steady-state
    epochs (the number a reference user experiences per epoch)."""

    def __init__(self):
        self.marks = []  # (perf_counter, epoch_step)

    def log_dict(self, d, step=None):
        self.marks.append((time.perf_counter(), step))

    def log_metric(self, name, value, step=None):
        pass

    def log_param(self, name, value):
        pass


tracker = _TimingTracker()
t0 = time.perf_counter()
metrics = run_experiments(cfg, source=src, prepared=prepared, tracker=tracker)
wall = time.perf_counter() - t0

# decompose: epoch durations per fold (epoch step resets between folds)
epoch_s, first_epochs = [], []
prev_t, prev_step = t0, 0
for t, step in tracker.marks:
    d = t - prev_t
    (first_epochs if step == 1 else epoch_s).append(d)
    prev_t, prev_step = t, step

n_train_fold = int(N * (cfg.k_folds - 1) / cfg.k_folds)
train_imgs_per_fold = n_train_fold * EPOCHS
steady = float(np.mean(epoch_s)) if epoch_s else float("nan")
print(json.dumps({
    "folds": len(metrics),
    "wall_s": round(wall, 1),
    "wall_per_fold_s": round(wall / max(len(metrics), 1), 1),
    "train_images_total": train_imgs_per_fold * len(metrics),
    "e2e_train_images_per_sec": round(
        train_imgs_per_fold * len(metrics) / wall, 1),
    # steady state: every epoch after each structure's first (train pass +
    # full val pass + metrics + plateau/early-stop + host sync)
    "first_epoch_s": [round(x, 1) for x in first_epochs],
    "steady_epoch_s": round(steady, 2),
    "steady_epoch_imgs_per_sec": round(n_train_fold / steady, 1),
    "n_steady_epochs": len(epoch_s),
    "bacc": [round(float(m["balanced_accuracy"]), 4) for m in metrics],
}, indent=None))

print("\nartifacts under", OUT, ":")
for root, _dirs, files in os.walk(OUT):
    for f in sorted(files):
        p = os.path.join(root, f)
        print(f"  {os.path.relpath(p, OUT):60s} {os.path.getsize(p)}")
