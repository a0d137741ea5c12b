"""On-chip bench of the remaining BASELINE.json driver configs.

Configs 1 (ResNet-18+concat), 4 (DaViT+BERT, _bench_sentence.py) and the
flagship (bench.py) already have measured numbers; this measures:
  config 2: DenseNet-169 + one-hot metadata, MetaBlock fusion   (B=64)
  config 3: ResNet-50 + TabTransformer (reference dims: 82 categorical
            cols cardinality 10, 4 continuous, out 85 —
            loadImageModelClassifier.py loadTextModelEncoder), cross-
            attention fusion                                      (B=128)
  config 1: ResNet-18 + one-hot, concatenation                    (B=128)
Full train step each: on-device augment + bf16 fwd + fp32 loss + bwd + Adam.
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
from skinjax.models.text import TabTransformer
from skinjax.train import make_loss_fn, make_optimizer, make_train_step
from skinjax.train import steps as steps_mod
from skinjax.train.steps import create_train_state


def time_step(model, metadata, B, nclasses=6):
    rng = np.random.default_rng(0)
    batch = {"image": rng.integers(0, 256, (B, 224, 224, 3), dtype=np.uint8),
             "metadata": metadata,
             "label": rng.integers(0, nclasses, B).astype(np.int32)}
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
    loss_fn = make_loss_fn("weighted_ce", np.ones(nclasses, np.float32))
    im = jnp.asarray(batch["image"])
    md = jax.tree_util.tree_map(jnp.asarray, batch["metadata"])
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


rng = np.random.default_rng(1)

# config 2: densenet169 + metablock
B2 = 64
m2 = MultimodalModel(
    num_classes=6, num_heads=8, cnn_model_name="densenet169",
    text_model_name="one-hot-encoder", common_dim=512, vocab_size=91,
    attention_mechanism="metablock", dtype=jnp.bfloat16)
md2 = rng.normal(size=(B2, 91)).astype(np.float32)

# config 3: resnet-50 + tab-transformer + crossattention (ISIC-2019 schema
# is 8-class; reference TabTransformer dims)
B3 = 128
tower = TabTransformer(
    categorical_cardinalities=[10] * 82, num_continuous=4, out_dim=85,
    dtype=jnp.bfloat16)
m3 = MultimodalModel(
    num_classes=8, num_heads=8, cnn_model_name="resnet-50",
    text_model_name="tab-transformer", text_module=tower,
    text_input_mode="tabular", text_encoder_dim_output=85, common_dim=512,
    attention_mechanism="crossattention", dtype=jnp.bfloat16)
md3 = {"categorical": rng.integers(0, 10, (B3, 82)).astype(np.int32),
       "numerical": rng.normal(size=(B3, 4)).astype(np.float32)}

# config 1: resnet-18 + one-hot + concatenation
B1 = 128
m1 = MultimodalModel(
    num_classes=6, num_heads=8, cnn_model_name="resnet-18",
    text_model_name="one-hot-encoder", common_dim=512, vocab_size=91,
    attention_mechanism="concatenation", dtype=jnp.bfloat16)
md1 = rng.normal(size=(B1, 91)).astype(np.float32)

for name, model, md, B, ncls in [
    ("cfg2 densenet169+metablock ", m2, md2, B2, 6),
    ("cfg3 resnet50+tabtf+crossatt", m3, md3, B3, 8),
    ("cfg1 resnet18+concat        ", m1, md1, B1, 6),
]:
    steps_mod._TRAIN_STEP_CACHE.clear()
    ms, ips, warm = time_step(model, md, B, ncls)
    print(f"{name} B={B} {ms:8.2f} ms/step  {ips:7.1f} img/s  "
          f"(warm+compile {warm:.0f}s)", flush=True)
