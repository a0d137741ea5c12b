"""Same-run A/B: SKINJAX_POOLED_ATTN=auto (15/16 blocks fused, stage-0 on
XLA — the §5l default) vs "chunked" (16/16 via query-chunk folding: the
3136x196 stage-0 block as 4 grid cells of 784x196). mvitv2_small full
multimodal train step, B=64, same harness as bench.py."""
import os as _os, sys as _sys  # repo-root import shim (scripts live in bench/)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import gc
import json
import os

os.environ.setdefault("SKINJAX_WINATTN", "pallas")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench
from skinjax.models import MultimodalModel

out = {}


def measure(tag, B, scope):
    os.environ["SKINJAX_POOLED_ATTN"] = scope
    model = MultimodalModel(
        num_classes=6, num_heads=8, cnn_model_name="mvitv2_small",
        text_model_name="one-hot-encoder", common_dim=512, vocab_size=91,
        attention_mechanism="att-intramodal+residual+cross-attention-metadados",
        dtype=jnp.bfloat16,
    )
    try:
        ips, state = bench._train_throughput(model, B)
        out[tag] = round(ips, 1)
        del state
    except Exception as e:
        out[tag + "_error"] = f"{type(e).__name__}: {str(e)[:300]}"
    gc.collect()
    print(json.dumps({tag: out.get(tag, out.get(tag + "_error"))}),
          flush=True)


measure("mvit_B64_auto", 64, "auto")
measure("mvit_B64_chunked", 64, "chunked")
measure("mvit_B64_auto_2", 64, "auto")
measure("mvit_B64_chunked_2", 64, "chunked")

print(json.dumps(out))
