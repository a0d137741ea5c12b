"""Full-zoo on-chip train-step sweep: one measured number per backbone
FAMILY that does not already have one (DESIGN §5g covers the BASELINE
configs; §5b/§5h cover davit/swin/beit/vit-large).

Each row is the same full production train step as bench.py — on-device
augment + bf16 backbone + one-hot metadata tower + RG-ATT fusion + fp32
weighted-CE + backward + masked Adam — so the numbers are comparable across
the table. Reference: the published per-model BACC table sweeps exactly
these families (frugality_bacc_by_models.py; loadImageModelClassifier.py
loadModelImageEncoder names).

Usage: python _bench_zoo.py [family ...]   (default: the unmeasured set)
"""
import os as _os, sys as _sys  # repo-root import shim (scripts live in bench/)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import sys
import time

os.environ.setdefault("SKINJAX_WINATTN", "pallas")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from skinjax.models import MultimodalModel
from skinjax.train import make_loss_fn, make_optimizer, make_train_step
from skinjax.train import steps as steps_mod
from skinjax.train.steps import create_train_state

# family -> batch (smaller for the heavier towers; same harness as bench.py)
DEFAULT = [
    ("caformer_s18", 64),
    ("caformer_b36", 32),
    ("mvitv2_small", 64),
    ("coat_lite_small", 64),
    ("nextvit_small", 64),
    ("vit_small_patch16_224", 64),
    ("efficientnet-b0", 128),
    ("efficientnet-b7", 32),
    ("mobilenet-v2", 128),
    ("vgg16", 64),
    ("densenet169", 64),
    ("custom-cnn", 128),
]


def time_step(name, B, ncls=6):
    model = MultimodalModel(
        num_classes=ncls, num_heads=8, cnn_model_name=name,
        text_model_name="one-hot-encoder", common_dim=512, vocab_size=91,
        attention_mechanism="att-intramodal+residual+cross-attention-metadados",
        dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    batch = {"image": rng.integers(0, 256, (B, 224, 224, 3), dtype=np.uint8),
             "metadata": rng.normal(size=(B, 91)).astype(np.float32),
             "label": rng.integers(0, ncls, B).astype(np.int32)}
    tx = make_optimizer(5e-5, 1e-4)
    small = {k: v[:2] for k, v in batch.items()}
    try:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            state = create_train_state(model, jax.random.key(0), small, tx)
        state = jax.device_put(state, jax.devices()[0])
    except Exception:
        state = create_train_state(model, jax.random.key(0), small, tx)
    loss_fn = make_loss_fn("weighted_ce", np.ones(ncls, np.float32))
    step = make_train_step(model, tx, loss_fn, augment=True,
                           image_dtype=jnp.bfloat16)
    im = jnp.asarray(batch["image"])
    md = jnp.asarray(batch["metadata"])
    lb = jnp.asarray(batch["label"])
    key = jax.random.key(1)
    t0 = time.perf_counter()
    for _ in range(3):
        state, loss = step(state, im, md, lb, key)
    jax.block_until_ready(loss)
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(20):
        state, loss = step(state, im, md, lb, key)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / 20
    return dt * 1000, B / dt, warm


rows = ([(n, dict(DEFAULT).get(n, 64)) for n in sys.argv[1:]]
        if len(sys.argv) > 1 else DEFAULT)
for name, B in rows:
    steps_mod._TRAIN_STEP_CACHE.clear()
    try:
        ms, ips, warm = time_step(name, B)
        print(f"{name:28s} B={B:<4d} {ms:8.2f} ms/step {ips:8.1f} img/s "
              f"(warm+compile {warm:.0f}s)", flush=True)
    except Exception as e:  # keep sweeping; OOMs are findings too
        print(f"{name:28s} B={B:<4d} FAILED: {type(e).__name__}: "
              f"{str(e)[:160]}", flush=True)
