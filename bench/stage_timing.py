import os as _os, sys as _sys  # repo-root import shim (scripts live in bench/)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from skinjax.models import MultimodalModel
from skinjax.train import make_loss_fn, make_optimizer, make_train_step
from skinjax.train.steps import create_train_state
from skinjax.data.augment import augment_batch

B = 128
model = MultimodalModel(num_classes=6, num_heads=8, cnn_model_name="resnet-50",
    text_model_name="one-hot-encoder", common_dim=512, vocab_size=91,
    attention_mechanism="att-intramodal+residual+cross-attention-metadados",
    dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
batch = {"image": rng.integers(0, 256, (B, 224, 224, 3), dtype=np.uint8),
         "metadata": rng.normal(size=(B, 91)).astype(np.float32),
         "label": rng.integers(0, 6, B).astype(np.int32)}
tx = make_optimizer(5e-5, 1e-4)
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    state0 = create_train_state(model, jax.random.key(0), {k: v[:2] for k, v in batch.items()}, tx)
loss_fn = make_loss_fn("weighted_ce", np.ones(6, np.float32))

im = jnp.asarray(batch["image"]); md = jnp.asarray(batch["metadata"]); lb = jnp.asarray(batch["label"])
key = jax.random.key(1)

def time_step(step, image, n=20, warmup=3):
    state = jax.device_put(state0, jax.devices()[0])
    for _ in range(warmup):
        state, loss = step(state, image, md, lb, key)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(n):
        state, loss = step(state, image, md, lb, key)
    jax.block_until_ready(loss)
    return (time.perf_counter() - t0) / n * 1000

step_full = make_train_step(model, tx, loss_fn, augment=True, image_dtype=jnp.bfloat16)
t_full = time_step(step_full, im)
print(f"full step: {t_full:.2f} ms  ({B/t_full*1000:.0f} img/s)")

step_na = make_train_step(model, tx, loss_fn, augment=False, image_dtype=jnp.bfloat16)
imf = (im.astype(jnp.float32)/255.0)
t_na = time_step(step_na, imf)
print(f"step w/o augment: {t_na:.2f} ms")

aug = jax.jit(lambda i, k: augment_batch(i, k, out_dtype=jnp.bfloat16))
def time_fn(f, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000
t_aug = time_fn(aug, im, key)
print(f"augment only: {t_aug:.2f} ms")
