"""Stored-P capacity matrix (r3 verdict Weak #4 / advisor medium): the
stored-probabilities backward default was measured only at ViT/BEiT
N=197/B<=32. This measures the UNMEASURED cells on the v5e, same-run:

- native BERT tower, B=32 T=256 (P residual ~100 MB/layer-call):
  store vs recompute gradient step
- native GPT-2 tower, T=512 and T=1024 (0.4 / 1.6 GB per layer at B=32 —
  the gate territory): recompute vs the auto gate's choice
- beitv2_large full train step, B=64 under SKINJAX_REMAT=block (the §5h
  remat cell, re-measured under the stored-P default)

The unset-env default routes through _store_p_ok (256 MB/call cap);
explicit SKINJAX_GLOBATTN_BWD forces a mode.
"""
import os as _os, sys as _sys  # repo-root import shim (scripts live in bench/)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import time

os.environ.setdefault("SKINJAX_WINATTN", "pallas")
os.environ["SKINJAX_GLOBATTN"] = "pallas"

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

out = {}
cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]
rng = np.random.default_rng(0)


def timeit(fn, warmup=2, iters=10):
    for _ in range(warmup):
        r = fn()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1000


def bert_cell(tag, mode):
    """Unfrozen BERT-base tokens tower gradient step, B=32 T=256."""
    if mode is None:
        os.environ.pop("SKINJAX_GLOBATTN_BWD", None)
    else:
        os.environ["SKINJAX_GLOBATTN_BWD"] = mode
    from skinjax.models.text.bert import NativeBertEncoder

    enc = NativeBertEncoder(dtype=jnp.bfloat16)
    B, T = 32, 256
    ids = jnp.asarray(rng.integers(1, 30000, (B, T)).astype(np.int32))
    am = jnp.ones((B, T), jnp.int32)
    with jax.default_device(cpu):
        params = enc.init(jax.random.key(0), ids[:2], am[:2])["params"]
    params = jax.device_put(params, dev)

    def loss(p):
        y = enc.apply({"params": p}, ids, am)
        y = y[0] if isinstance(y, tuple) else y
        return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

    g = jax.jit(jax.grad(loss))
    try:
        ms = timeit(lambda: g(params))
        out[tag] = round(ms, 2)
    except Exception as e:
        out[tag + "_error"] = f"{type(e).__name__}: {str(e)[:160]}"
    print(json.dumps({tag: out.get(tag, out.get(tag + '_error'))}), flush=True)


def gpt2_cell(tag, mode, B, T):
    if mode is None:
        os.environ.pop("SKINJAX_GLOBATTN_BWD", None)
    else:
        os.environ["SKINJAX_GLOBATTN_BWD"] = mode
    from skinjax.models.text.gpt2 import NativeGPT2Encoder

    enc = NativeGPT2Encoder(dtype=jnp.bfloat16)
    ids = jnp.asarray(rng.integers(1, 50000, (B, T)).astype(np.int32))
    am = jnp.ones((B, T), jnp.int32)
    with jax.default_device(cpu):
        params = enc.init(jax.random.key(0), ids[:2], am[:2])["params"]
    params = jax.device_put(params, dev)

    def loss(p):
        y = enc.apply({"params": p}, ids, am)
        y = y[0] if isinstance(y, tuple) else y
        return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

    g = jax.jit(jax.grad(loss))
    try:
        ms = timeit(lambda: g(params))
        out[tag] = round(ms, 2)
    except Exception as e:
        out[tag + "_error"] = f"{type(e).__name__}: {str(e)[:160]}"
    print(json.dumps({tag: out.get(tag, out.get(tag + '_error'))}), flush=True)


def beit_cell(tag, mode):
    """beitv2_large FULL multimodal train step, B=64, remat=block."""
    if mode is None:
        os.environ.pop("SKINJAX_GLOBATTN_BWD", None)
    else:
        os.environ["SKINJAX_GLOBATTN_BWD"] = mode
    import importlib

    import skinjax.models.backbones.beit as beit_mod
    importlib.reload(beit_mod)  # _REMAT read at import time
    import bench
    from skinjax.models import MultimodalModel

    model = MultimodalModel(
        num_classes=6, num_heads=8, cnn_model_name="beitv2_large_patch16_224",
        text_model_name="one-hot-encoder", common_dim=512, vocab_size=91,
        attention_mechanism="att-intramodal+residual+cross-attention-metadados",
        dtype=jnp.bfloat16)
    try:
        ips, state = bench._train_throughput(model, 64)
        out[tag] = round(ips, 1)
        del state
    except Exception as e:
        out[tag + "_error"] = f"{type(e).__name__}: {str(e)[:160]}"
    print(json.dumps({tag: out.get(tag, out.get(tag + '_error'))}), flush=True)


bert_cell("bert_B32_T256_store_ms", "store")
bert_cell("bert_B32_T256_recompute_ms", "recompute")
bert_cell("bert_B32_T256_default_ms", None)  # gate: 100 MB < 256 -> store
gpt2_cell("gpt2_B16_T512_store_ms", "store", 16, 512)
gpt2_cell("gpt2_B16_T512_recompute_ms", "recompute", 16, 512)
gpt2_cell("gpt2_B8_T1024_recompute_ms", "recompute", 8, 1024)
gpt2_cell("gpt2_B8_T1024_store_ms", "store", 8, 1024)
gpt2_cell("gpt2_B8_T1024_default_ms", None)  # gate: 400 MB > 256 -> recompute
os.environ["SKINJAX_REMAT"] = "block"
beit_cell("beit_B64_remat_default_ips", None)   # 176 MB < 256 -> store
beit_cell("beit_B64_remat_recompute_ips", "recompute")

print(json.dumps(out))
