"""Bucket probe: what do DaViT's 24 depthwise ConvPosEnc convs cost?

Control A/B (NOT semantics-preserving — a measurement, like the BN
running-stats probe in docs/DESIGN.md §5): monkeypatch ConvPosEnc to
identity and re-time the full davit_tiny train step. The delta bounds what
any CPE optimization (shift-based depthwise, fusion into the window kernel)
could recover. Also times the shift-and-add depthwise formulation
(SKINJAX_CPE=shift) if present.
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
from skinjax.train import make_loss_fn, make_optimizer, make_train_step
from skinjax.train import steps as steps_mod
from skinjax.train.steps import create_train_state

B = int(os.environ.get("AB_B", "64"))


def build():
    return MultimodalModel(
        num_classes=6, num_heads=8, cnn_model_name="davit_tiny",
        text_model_name="one-hot-encoder", common_dim=512, vocab_size=91,
        attention_mechanism="att-intramodal+residual+cross-attention-metadados",
        dtype=jnp.bfloat16)


def time_step(model):
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
        state = create_train_state(model, jax.random.key(0), batch, tx)
    loss_fn = make_loss_fn("weighted_ce", np.ones(6, np.float32))
    im = jnp.asarray(batch["image"])
    md = jnp.asarray(batch["metadata"])
    lb = jnp.asarray(batch["label"])
    key = jax.random.key(1)
    step = make_train_step(model, tx, loss_fn, augment=True,
                           image_dtype=jnp.bfloat16)
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


def run_mode(name, env):
    prev = os.environ.pop("SKINJAX_CPE", None)
    if env:
        os.environ["SKINJAX_CPE"] = env
    steps_mod._TRAIN_STEP_CACHE.clear()
    ms, ips, warm = time_step(build())
    print(f"{name} B={B} {ms:8.2f} ms/step  {ips:7.1f} img/s  "
          f"(warm+compile {warm:.0f}s)", flush=True)
    if prev is not None:
        os.environ["SKINJAX_CPE"] = prev


run_mode("default (conv CPE)", None)
run_mode("CPE shift-add     ", "shift")
run_mode("CPE -> identity   ", "identity")
run_mode("default bracket 2 ", None)
