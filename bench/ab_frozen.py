"""On-chip measurements: (a) flagship train step with the backbone FROZEN —
the reference MultimodalModel's DEFAULT train mode
(multimodalIntraInterModal.py:25 unfreeze_weights="frozen_weights") — vs
unfrozen, same-run; (b) davit_tiny at B=128 (throughput mode vs the B=64
bench point).
"""
import os as _os, sys as _sys  # repo-root import shim (scripts live in bench/)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os, time

os.environ.setdefault("SKINJAX_WINATTN", "pallas")

import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from skinjax.models import MultimodalModel
from skinjax.train import make_loss_fn, make_optimizer, make_train_step, trainable_mask
from skinjax.train import steps as steps_mod
from skinjax.train.steps import create_train_state
import dataclasses


def build(backbone):
    return MultimodalModel(
        num_classes=6, num_heads=8, cnn_model_name=backbone,
        text_model_name="one-hot-encoder", common_dim=512, vocab_size=91,
        attention_mechanism="att-intramodal+residual+cross-attention-metadados",
        dtype=jnp.bfloat16)


def time_step(model, B, freeze=False):
    rng = np.random.default_rng(0)
    batch = {"image": rng.integers(0, 256, (B, 224, 224, 3), dtype=np.uint8),
             "metadata": rng.normal(size=(B, 91)).astype(np.float32),
             "label": rng.integers(0, 6, B).astype(np.int32)}
    tx = make_optimizer(5e-5, 1e-4)
    try:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            state = create_train_state(
                model, jax.random.key(0),
                {k: v[:2] for k, v in batch.items()}, tx)
        state = jax.device_put(state, jax.devices()[0])
    except Exception:
        state = create_train_state(
            model, jax.random.key(0), {k: v[:2] for k, v in batch.items()}, tx)
    mask = None
    if freeze:
        mask = trainable_mask(state.params, "frozen_weights")
        tx = make_optimizer(5e-5, 1e-4, mask=mask)
        state = dataclasses.replace(state, opt_state=tx.init(state.params))
    loss_fn = make_loss_fn("weighted_ce", np.ones(6, np.float32))
    im = jnp.asarray(batch["image"])
    md = jnp.asarray(batch["metadata"])
    lb = jnp.asarray(batch["label"])
    key = jax.random.key(1)
    step = make_train_step(model, tx, loss_fn, augment=True,
                           image_dtype=jnp.bfloat16, trainable_mask=mask)
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


runs = [
    ("flagship unfrozen B=128", "resnet-50", 128, False),
    ("flagship FROZEN   B=128", "resnet-50", 128, True),
    ("flagship unfrozen brkt2", "resnet-50", 128, False),
    ("davit_tiny        B=128", "davit_tiny", 128, False),
]
for name, bk, B, fz in runs:
    steps_mod._TRAIN_STEP_CACHE.clear()
    ms, ips, warm = time_step(build(bk), B, freeze=fz)
    print(f"{name} {ms:8.2f} ms/step  {ips:7.1f} img/s  "
          f"(warm+compile {warm:.0f}s)", flush=True)
