"""Same-run A/B: vit_large EVAL path (forward only, B=32) XLA vs fused
global-attention kernel — splits the measured train-step regression into
fwd vs bwd contributions."""
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
from skinjax.train.steps import create_train_state, make_eval_step
from skinjax.train import make_optimizer

out = {}
B = 32


def measure(tag, name, env):
    os.environ["SKINJAX_GLOBATTN"] = env
    model = MultimodalModel(
        num_classes=6, num_heads=8, cnn_model_name=name,
        text_model_name="one-hot-encoder", common_dim=512, vocab_size=91,
        attention_mechanism="att-intramodal+residual+cross-attention-metadados",
        dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.integers(0, 256, (B, 224, 224, 3), dtype=np.uint8),
        "metadata": rng.normal(size=(B, 91)).astype(np.float32),
        "label": rng.integers(0, 6, B).astype(np.int32),
    }
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        state = create_train_state(
            model, jax.random.key(0), {k: v[:2] for k, v in batch.items()},
            make_optimizer(5e-5, 1e-4))
    state = jax.device_put(state, jax.devices()[0])
    step = make_eval_step(model, image_dtype=jnp.bfloat16)
    im = jnp.asarray(batch["image"])
    md = jnp.asarray(batch["metadata"])
    for _ in range(3):
        o = step(state, im, md)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(30):
        o = step(state, im, md)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / 30
    out[tag] = round(B / dt, 1)
    print(json.dumps({tag: out[tag]}), flush=True)
    del state


measure("vitl_fwd_B32_xla", "vit_large_patch16_224", "")
measure("vitl_fwd_B32_pallas", "vit_large_patch16_224", "pallas")
measure("beit_fwd_B32_xla", "beitv2_large_patch16_224", "")
measure("beit_fwd_B32_pallas", "beitv2_large_patch16_224", "pallas")
measure("vitl_fwd_B32_xla_2", "vit_large_patch16_224", "")
print(json.dumps(out))
