"""Same-run A/B: fused MLP routing for caformer_b36 (mlp_star,
SKINJAX_CAFORMER_MLP) and davit_tiny (mlp_gelu, SKINJAX_DAVIT_MLP) vs
their XLA chains — full multimodal train steps on the v5e. Follow-up to
DESIGN §5p (coat +7.7-8.1%); A/B within one process per CLAUDE.md."""
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


def measure(tag, name, B, env_var, env):
    os.environ[env_var] = env
    model = MultimodalModel(
        num_classes=6, num_heads=8, cnn_model_name=name,
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


DB = bench.DAVIT_BATCH
measure("caformer_B32_xla", "caformer_b36", 32, "SKINJAX_CAFORMER_MLP", "")
measure("caformer_B32_fused", "caformer_b36", 32, "SKINJAX_CAFORMER_MLP",
        "fused")
measure("caformer_B32_xla_2", "caformer_b36", 32, "SKINJAX_CAFORMER_MLP", "")
measure("caformer_B32_fused_2", "caformer_b36", 32, "SKINJAX_CAFORMER_MLP",
        "fused")
os.environ["SKINJAX_CAFORMER_MLP"] = ""
measure("davit_xla", "davit_tiny", DB, "SKINJAX_DAVIT_MLP", "")
measure("davit_fused", "davit_tiny", DB, "SKINJAX_DAVIT_MLP", "fused")
measure("davit_xla_2", "davit_tiny", DB, "SKINJAX_DAVIT_MLP", "")
measure("davit_fused_2", "davit_tiny", DB, "SKINJAX_DAVIT_MLP", "fused")

print(json.dumps(out))
