"""NAS economics on TPU: sequential per-candidate training (the reference's
loop shape) vs ONE vmapped supernet program for the whole population.

Scenario: a mid-search REINFORCE distribution — shape-bucket keys
(num_blocks/use_pooling/kernel_size) converged, the other 7 search keys still
exploring — so the population lands in one envelope bucket. K=8 candidates,
2 epochs each on a synthetic 256-sample dataset.
"""
import os as _os, sys as _sys  # repo-root import shim (scripts live in bench/)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from skinjax.data import synthetic_source
from skinjax.data.splits import train_val_split
from skinjax.nas.population import PopulationTrainer
from skinjax.nas.search import _default_trainer
from skinjax.train.kfold import SubsetSource
from skinjax.train.loop import TrainConfig

NARROWED = {
    "num_blocks": [5], "initial_filters": [16, 32, 64], "kernel_size": [3],
    "layers_per_block": [1, 2], "use_pooling": [True],
    "common_dim": [64, 128, 256, 512],
    "attention_mecanism": ["concatenation", "crossattention", "metablock",
                           "gfcam"],
    "num_layers_text_fc": [1, 2, 3],
    "neurons_per_layer_size_of_text_fc": [64, 128, 256, 512],
    "num_layers_fc_module": [1, 2],
    "neurons_per_layer_size_of_fc_module": [256, 512],
}
K = 8

rng = np.random.default_rng(7)
configs = [
    {k: v[int(rng.integers(len(v)))] for k, v in NARROWED.items()}
    for _ in range(K)
]

src = synthetic_source(n=256, image_size=(64, 64), feature_dim=85,
                       num_classes=6, seed=0)
cfg = TrainConfig(num_epochs=2, batch_size=32, early_stopping_patience=5,
                  early_stopping_metric="val_bacc")

# --- sequential (reference loop shape) -------------------------------------
seq_eval = _default_trainer(src, 6, cfg, seed=42)
t0 = time.time()
seq_rewards = [seq_eval(c) for c in configs]
seq_s = time.time() - t0

# --- vmapped population -----------------------------------------------------
tr_idx, va_idx = train_val_split(src.labels, val_fraction=0.2, seed=42)
trainer = PopulationTrainer(
    SubsetSource(src, tr_idx), SubsetSource(src, va_idx), 6, config=cfg,
    vocab_size=85,
)
t0 = time.time()
pop_rewards = trainer.evaluate(configs)
pop_s = time.time() - t0

print(json.dumps({
    "k": K,
    "sequential_s": round(seq_s, 1),
    "population_s": round(pop_s, 1),
    "speedup": round(seq_s / pop_s, 2),
    "seq_rewards": [round(r, 4) for r in seq_rewards],
    "pop_rewards": [round(r, 4) for r in pop_rewards],
}))
