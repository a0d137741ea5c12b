"""efficientnet-b7 step timing + xplane trace (VERDICT r4 next #4: the
published-table slow tail — 495.7 img/s at B=32, ~4% MFU — needs a profile
and a win-or-refute verdict). Same harness as trace_mvit.py."""
import os as _os, sys as _sys  # repo-root import shim (scripts live in bench/)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from skinjax.models import MultimodalModel
from skinjax.train import make_loss_fn, make_optimizer, make_train_step
from skinjax.train.steps import create_train_state

NAME = _os.environ.get("TRACE_BACKBONE", "efficientnet-b7")
B = int(_os.environ.get("TRACE_B", "32"))
model = MultimodalModel(num_classes=6, num_heads=8, cnn_model_name=NAME,
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
    state = create_train_state(model, jax.random.key(0),
                               {k: v[:2] for k, v in batch.items()}, tx)
state = jax.device_put(state, jax.devices()[0])
loss_fn = make_loss_fn("weighted_ce", np.ones(6, np.float32))
im = jnp.asarray(batch["image"]); md = jnp.asarray(batch["metadata"])
lb = jnp.asarray(batch["label"])
key = jax.random.key(1)
step = make_train_step(model, tx, loss_fn, augment=True,
                       image_dtype=jnp.bfloat16)
for _ in range(3):
    state, loss = step(state, im, md, lb, key)
jax.block_until_ready(loss)
t0 = time.perf_counter()
for _ in range(15):
    state, loss = step(state, im, md, lb, key)
jax.block_until_ready(loss)
dt = (time.perf_counter() - t0) / 15 * 1000
print(f"{NAME} full step: {dt:.2f} ms ({B/dt*1000:.0f} img/s)", flush=True)
if "--trace" in sys.argv:
    with jax.profiler.trace(f"/tmp/skinjax-trace-{NAME}"):
        for _ in range(5):
            state, loss = step(state, im, md, lb, key)
        jax.block_until_ready(loss)
    print("trace done")
