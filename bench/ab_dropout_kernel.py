"""Same-run A/B: in-kernel attention-prob dropout (round 3). The §5f-c
probe showed the fused global-attention kernel wins +3.9% on the unfrozen
BERT sentence step but HF's attention_probs_dropout_prob=0.1 kept it out of
the DEFAULT train step. Dropout now rides IN-KERNEL (the single broadcast
(T, T) bernoulli multiplier HF draws), so the kernel engages with stock HF
config. Measures the DEFAULT unfrozen step (dropout 0.1, native bf16
tower): XLA attention vs fused kernel, same run, B=32 T=256."""
import os as _os, sys as _sys  # repo-root import shim (scripts live in bench/)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import time

os.environ.setdefault("SKINJAX_WINATTN", "pallas")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from skinjax.models import MultimodalModel
from skinjax.models.text.bert import NativeBertEncoder, NativeSentenceTower
from skinjax.train import make_loss_fn, make_optimizer, make_train_step
from skinjax.train import steps as steps_mod
from skinjax.train.steps import create_train_state

B, T = 32, 256
out = {}


def build():
    tower = NativeSentenceTower(
        encoder=NativeBertEncoder(dtype=jnp.bfloat16), dtype=jnp.bfloat16)
    return MultimodalModel(
        num_classes=6, num_heads=8, cnn_model_name="davit_tiny",
        text_model_name="bert-base-uncased", text_module=tower,
        text_input_mode="tokens", text_encoder_dim_output=768,
        common_dim=512,
        attention_mechanism="att-intramodal+residual+cross-attention-metadados",
        dtype=jnp.bfloat16)


def time_step(tag, env):
    os.environ["SKINJAX_GLOBATTN"] = env
    steps_mod._TRAIN_STEP_CACHE.clear()
    model = build()
    rng = np.random.default_rng(0)
    batch = {"image": rng.integers(0, 256, (B, 224, 224, 3), dtype=np.uint8),
             "metadata": {
                 "input_ids": rng.integers(1, 30000, (B, T)).astype(np.int32),
                 "attention_mask": np.ones((B, T), np.int32)},
             "label": rng.integers(0, 6, B).astype(np.int32)}
    tx = make_optimizer(5e-5, 1e-4)
    small = {k: (jax.tree_util.tree_map(lambda a: a[:2], v)
                 if isinstance(v, dict) else v[:2]) for k, v in batch.items()}
    try:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            state = create_train_state(model, jax.random.key(0), small, tx)
        state = jax.device_put(state, jax.devices()[0])
    except Exception:
        state = create_train_state(model, jax.random.key(0), small, tx)
    loss_fn = make_loss_fn("weighted_ce", np.ones(6, np.float32))
    step = make_train_step(model, tx, loss_fn, augment=True,
                           image_dtype=jnp.bfloat16, recipe="sentence")
    im = jnp.asarray(batch["image"])
    md = jax.tree_util.tree_map(jnp.asarray, batch["metadata"])
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
    out[tag] = {"ms": round(dt * 1000, 2), "img_s": round(B / dt, 1),
                "warm_s": round(warm, 1)}
    print(json.dumps({tag: out[tag]}), flush=True)


time_step("xla_dropout0.1", "")
time_step("kernel_dropout0.1", "pallas")
time_step("xla_again", "")
print(json.dumps(out))
