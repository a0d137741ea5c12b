"""One-off: beitv2_large_patch16_224 full multimodal train step on the v5e.

The largest backbone in the reference's published BACC table (307 M params,
frugality_bacc_by_models.py:14-16). Reuses bench.py's harness: uint8 in,
on-device augment, bf16 forward, fp32 weighted-CE, backward, masked Adam.
Reports unfrozen and frozen (reference-default) modes at B=32/64.
"""

import json
import os

os.environ.setdefault("SKINJAX_WINATTN", "pallas")

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

out = {}
for B in (32, 64):
    try:
        ips, _ = bench._train_throughput(model, B)
        out[f"beitv2_large_B{B}_images_per_sec"] = round(ips, 1)
    except Exception as e:  # OOM at the larger batch is an acceptable result
        out[f"beitv2_large_B{B}_error"] = f"{type(e).__name__}: {str(e)[:200]}"
try:
    ips_f, _ = bench._train_throughput(model, 32, freeze=True)
    out["beitv2_large_B32_frozen_images_per_sec"] = round(ips_f, 1)
except Exception as e:
    out["beitv2_large_B32_frozen_error"] = f"{type(e).__name__}: {str(e)[:200]}"

print(json.dumps(out))
