"""One-off: beitv2_large_patch16_224 full multimodal train step on the v5e.

The largest backbone in the reference's published BACC table (307 M params,
frugality_bacc_by_models.py:14-16). Reuses bench.py's harness: uint8 in,
on-device augment, bf16 forward, fp32 weighted-CE, backward, masked Adam.

Usage: python _bench_beit.py [remat]  — 'remat' sets SKINJAX_REMAT=block
before any skinjax import (the flag is read at import time).
"""
import os as _os, sys as _sys  # repo-root import shim (scripts live in bench/)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import gc
import json
import os
import sys

os.environ.setdefault("SKINJAX_WINATTN", "pallas")
MODE = "remat" if "remat" in sys.argv[1:] else "plain"
if MODE == "remat":
    os.environ["SKINJAX_REMAT"] = "block"

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench
from skinjax.models import MultimodalModel

model = MultimodalModel(
    num_classes=6, num_heads=8,
    cnn_model_name="beitv2_large_patch16_224",
    text_model_name="one-hot-encoder", common_dim=512, vocab_size=91,
    attention_mechanism="att-intramodal+residual+cross-attention-metadados",
    dtype=jnp.bfloat16,
)

out = {"mode": MODE}


def measure(tag, B, freeze=False):
    try:
        ips, state = bench._train_throughput(model, B, freeze=freeze)
        out[tag] = round(ips, 1)
        del state
    except Exception as e:
        out[tag + "_error"] = f"{type(e).__name__}: {str(e)[:160]}"
    gc.collect()


for B in (32, 64, 128):
    measure(f"beitv2_large_B{B}_images_per_sec", B)
measure("beitv2_large_B32_frozen_images_per_sec", 32, freeze=True)

print(json.dumps(out))
