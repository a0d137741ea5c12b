"""Same-run A/B on the v5e: davit_tiny full train step, strip-blocked NHWC
window-attention kernel vs the padded-window kernel vs plain XLA.

One process (tunnel latency varies ~2x between runs — CLAUDE.md), three
models built with explicit SpatialBlock flags via dataclass-default
patching (the env flag is read at import time, so per-model construction
needs the patch)."""
import os as _os, sys as _sys  # repo-root import shim (scripts live in bench/)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os, time
os.environ["SKINJAX_WINATTN"] = ""  # explicit flags below

import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from skinjax.models import MultimodalModel
from skinjax.models.backbones import davit, register
from skinjax.train import make_loss_fn, make_optimizer, make_train_step
from skinjax.train.steps import create_train_state

B = 64

# explicit per-variant backbone registrations: dataclass defaults are baked
# into __init__ at class creation, so patching fields does NOT work
for _vname, _kw in [
    ("davit_xla", {}),
    ("davit_pad", dict(fused_attn=True)),
    ("davit_strip", dict(strip_attn=True)),
    ("davit_ch", dict(ch_fused_attn=True)),
    ("davit_strip_ch", dict(strip_attn=True, ch_fused_attn=True)),
]:
    register(_vname,
             (lambda kw: lambda name=None, dtype=None, common_dim=512:
              davit.DaViT(dtype=dtype, **kw))(_kw), 768)


def build(vname):
    return MultimodalModel(
        num_classes=6, num_heads=8, cnn_model_name=vname,
        text_model_name="one-hot-encoder", common_dim=512, vocab_size=91,
        attention_mechanism="att-intramodal+residual+cross-attention-metadados",
        dtype=jnp.bfloat16)


def time_step(model, cpu_init=False):
    rng = np.random.default_rng(0)
    batch = {"image": rng.integers(0, 256, (B, 224, 224, 3), dtype=np.uint8),
             "metadata": rng.normal(size=(B, 91)).astype(np.float32),
             "label": rng.integers(0, 6, B).astype(np.int32)}
    tx = make_optimizer(5e-5, 1e-4)
    if cpu_init:  # pallas_call can't lower on the CPU backend
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            state = create_train_state(
                model, jax.random.key(0),
                {k: v[:2] for k, v in batch.items()}, tx)
        state = jax.device_put(state, jax.devices()[0])
    else:
        state = create_train_state(
            model, jax.random.key(0), {k: v[:2] for k, v in batch.items()}, tx)
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


import sys

variants = sys.argv[1:] or ["davit_xla", "davit_pad", "davit_strip"]
for vname in variants:
    ms, ips, warm = time_step(build(vname))
    print(f"{vname:12s} {ms:7.2f} ms/step  {ips:7.1f} img/s  (warm+compile {warm:.0f}s)",
          flush=True)
