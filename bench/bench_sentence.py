"""On-chip bench of the sentence path (BASELINE.json configs[3]: DaViT-Tiny
+ bert-base-uncased metadata encoder, RG-ATT). VERDICT r2 weak #5: no
tokens-input train step had ever been timed on the v5e.

Times the full train step (augment + DaViT-tiny + BERT-base tokens tower +
RG-ATT + backward + Adam) and, same-run, the one-hot control (identical
image path) to attribute the tokens-tower share. BERT weights are
random-init (zero egress) — identical compute/layout to pretrained."""
import os as _os, sys as _sys  # repo-root import shim (scripts live in bench/)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os, time, sys

os.environ.setdefault("SKINJAX_WINATTN", "pallas")

import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from transformers import BertConfig, FlaxBertModel

from skinjax.models import MultimodalModel
from skinjax.models.text.sentence import HFSentenceTower
from skinjax.train import make_loss_fn, make_optimizer, make_train_step
from skinjax.train import steps as steps_mod
from skinjax.train.steps import create_train_state

B = int(os.environ.get("SENT_B", "32"))
T = int(os.environ.get("SENT_T", "256"))  # tokenizer max_len for BERT path


def build_sentence():
    cfg = BertConfig()  # bert-base-uncased: 12L, 768h, 12 heads, vocab 30522
    tower = HFSentenceTower(hf_module=FlaxBertModel(cfg), dtype=jnp.bfloat16)
    return MultimodalModel(
        num_classes=6, num_heads=8, cnn_model_name="davit_tiny",
        text_model_name="bert-base-uncased", text_module=tower,
        text_input_mode="tokens", text_encoder_dim_output=768,
        common_dim=512,
        attention_mechanism="att-intramodal+residual+cross-attention-metadados",
        dtype=jnp.bfloat16)


def build_onehot():
    return MultimodalModel(
        num_classes=6, num_heads=8, cnn_model_name="davit_tiny",
        text_model_name="one-hot-encoder", common_dim=512, vocab_size=91,
        attention_mechanism="att-intramodal+residual+cross-attention-metadados",
        dtype=jnp.bfloat16)


def time_step(model, metadata, freeze_text=False):
    rng = np.random.default_rng(0)
    batch = {"image": rng.integers(0, 256, (B, 224, 224, 3), dtype=np.uint8),
             "metadata": metadata,
             "label": rng.integers(0, 6, B).astype(np.int32)}
    tx = make_optimizer(5e-5, 1e-4)
    state = create_train_state(
        model, jax.random.key(0),
        {k: (jax.tree_util.tree_map(lambda a: a[:2], v)
             if isinstance(v, dict) else v[:2]) for k, v in batch.items()},
        tx)
    loss_fn = make_loss_fn("weighted_ce", np.ones(6, np.float32))
    im = jnp.asarray(batch["image"])
    md = jax.tree_util.tree_map(jnp.asarray, batch["metadata"])
    lb = jnp.asarray(batch["label"])
    key = jax.random.key(1)
    mask = None
    if freeze_text:
        # the reference default for BERT/GPT-2 towers
        # (loadTextModelEncoder: train_mode="frozen_weights")
        from skinjax.train import trainable_mask
        import dataclasses
        mask = trainable_mask(state.params, "frozen_weights",
                              frozen_prefixes=("text_tower", "text_module"))
        tx = make_optimizer(5e-5, 1e-4, mask=mask)
        state = dataclasses.replace(state, opt_state=tx.init(state.params))
    step = make_train_step(model, tx, loss_fn, augment=True,
                           image_dtype=jnp.bfloat16, recipe="sentence",
                           trainable_mask=mask)
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


rng = np.random.default_rng(1)
tokens_md = {
    "input_ids": rng.integers(1, 30000, (B, T)).astype(np.int32),
    "attention_mask": np.ones((B, T), np.int32),
}
onehot_md = rng.normal(size=(B, 91)).astype(np.float32)

for name, model, md, frozen in [
    (f"bert-tokens T={T}", build_sentence(), tokens_md, False),
    (f"bert FROZEN T={T}", build_sentence(), tokens_md, True),
    ("one-hot control ", build_onehot(), onehot_md, False),
]:
    steps_mod._TRAIN_STEP_CACHE.clear()
    ms, ips, warm = time_step(model, md, freeze_text=frozen)
    print(f"{name:18s} B={B} {ms:8.2f} ms/step  {ips:7.1f} img/s  "
          f"(warm+compile {warm:.0f}s)", flush=True)
