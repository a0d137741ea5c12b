"""Same-run A/B on the sentence path (BASELINE configs[3]: DaViT-tiny +
BERT-base tokens, RG-ATT, B=32 T=256): HF-wrapped f32 tower (round-2
baseline, docs/DESIGN.md §5f) vs NativeBertEncoder — (a) f32 parity mode,
(b) bf16, (c) bf16 + fused global-attention kernel (eval-inert dropout
keeps the kernel out of the training step unless attention_dropout=0, so
(c) also sets attention_dropout=0 to expose the kernel's training effect —
noted in the output)."""
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

from transformers import BertConfig, FlaxBertModel

from skinjax.models import MultimodalModel
from skinjax.models.text.bert import (
    NativeBertEncoder, NativeSentenceTower, config_from_hf)
from skinjax.models.text.sentence import HFSentenceTower
from skinjax.train import make_loss_fn, make_optimizer, make_train_step
from skinjax.train import steps as steps_mod
from skinjax.train.steps import create_train_state

B, T = 32, 256
cfg = BertConfig()  # bert-base-uncased dims
out = {}


def build(tower):
    return MultimodalModel(
        num_classes=6, num_heads=8, cnn_model_name="davit_tiny",
        text_model_name="bert-base-uncased", text_module=tower,
        text_input_mode="tokens", text_encoder_dim_output=768,
        common_dim=512,
        attention_mechanism="att-intramodal+residual+cross-attention-metadados",
        dtype=jnp.bfloat16)


def time_step(tag, model, env):
    os.environ["SKINJAX_GLOBATTN"] = env
    steps_mod._TRAIN_STEP_CACHE.clear()
    rng = np.random.default_rng(0)
    md = {"input_ids": rng.integers(1, 30000, (B, T)).astype(np.int32),
          "attention_mask": np.ones((B, T), np.int32)}
    batch = {"image": rng.integers(0, 256, (B, 224, 224, 3), dtype=np.uint8),
             "metadata": md,
             "label": rng.integers(0, 6, B).astype(np.int32)}
    tx = make_optimizer(5e-5, 1e-4)
    state = create_train_state(
        model, jax.random.key(0),
        {k: (jax.tree_util.tree_map(lambda a: a[:2], v)
             if isinstance(v, dict) else v[:2]) for k, v in batch.items()},
        tx)
    loss_fn = make_loss_fn("weighted_ce", np.ones(6, np.float32))
    step = make_train_step(model, tx, loss_fn, augment=True,
                           image_dtype=jnp.bfloat16, recipe="sentence")
    im = jnp.asarray(batch["image"])
    mdj = jax.tree_util.tree_map(jnp.asarray, md)
    lb = jnp.asarray(batch["label"])
    key = jax.random.key(1)
    for _ in range(3):
        state, loss = step(state, im, mdj, lb, key)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(20):
        state, loss = step(state, im, mdj, lb, key)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / 20
    out[tag] = round(B / dt, 1)
    print(json.dumps({tag: out[tag]}), flush=True)
    del state


# (1) round-2 baseline: HF wrapper, f32 BERT
time_step("hf_f32", build(HFSentenceTower(
    hf_module=FlaxBertModel(cfg), dtype=jnp.bfloat16)), "")
# (2) native tower, f32 (isolates wrapper overhead at parity semantics)
time_step("native_f32", build(NativeSentenceTower(
    encoder=NativeBertEncoder(**config_from_hf(cfg)))), "")
# (3) native tower, bf16 compute
time_step("native_bf16", build(NativeSentenceTower(
    encoder=NativeBertEncoder(**config_from_hf(cfg), dtype=jnp.bfloat16),
    dtype=jnp.bfloat16)), "")
# (4) native bf16 + fused attention kernel in the TRAIN step
#     (attention_dropout=0 so the kernel engages under dropout rng;
#     hidden dropout stays active)
kw0 = dict(config_from_hf(cfg), attention_dropout=0.0)
time_step("native_bf16_kernel_attndrop0", build(NativeSentenceTower(
    encoder=NativeBertEncoder(**kw0, dtype=jnp.bfloat16),
    dtype=jnp.bfloat16)), "pallas")
# (5) control: same attention_dropout=0 without the kernel
time_step("native_bf16_attndrop0_xla", build(NativeSentenceTower(
    encoder=NativeBertEncoder(**kw0, dtype=jnp.bfloat16),
    dtype=jnp.bfloat16)), "")
# re-measure (1) to bound drift
time_step("hf_f32_2", build(HFSentenceTower(
    hf_module=FlaxBertModel(cfg), dtype=jnp.bfloat16)), "")

print(json.dumps(out))
