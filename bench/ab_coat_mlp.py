"""Same-run A/B: fused CoaT MLP (SKINJAX_COAT_MLP=fused ->
ops/pallas/fused_mlp.py, stage-1/2 serial blocks) vs the XLA two-Dense
chain, coat_lite_small full multimodal train step on the v5e. Same harness
as bench.py; A/B within one process per CLAUDE.md (tunnel latency varies
~2x across runs). DESIGN §5o bounded the win at ~7-10% of the step
(stage-1 bias+GELU pairs at the HBM roofline)."""
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


def measure(tag, B, env):
    os.environ["SKINJAX_COAT_MLP"] = env
    model = MultimodalModel(
        num_classes=6, num_heads=8, cnn_model_name="coat_lite_small",
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


measure("coat_B64_xla", 64, "")
measure("coat_B64_fused", 64, "fused")
# re-measure to bound tunnel drift
measure("coat_B64_xla_2", 64, "")
measure("coat_B64_fused_2", 64, "fused")

print(json.dumps(out))


def measure_caf(tag, B, env):
    os.environ["SKINJAX_CAFORMER_MLP"] = env
    os.environ["SKINJAX_COAT_MLP"] = ""
    model = MultimodalModel(
        num_classes=6, num_heads=8, cnn_model_name="caformer_b36",
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


if os.environ.get("AB_CAFORMER_MLP", "") == "1":
    measure_caf("caformer_B32_xla", 32, "")
    measure_caf("caformer_B32_fused", 32, "fused")
    measure_caf("caformer_B32_xla_2", 32, "")
    measure_caf("caformer_B32_fused_2", 32, "fused")
    print(json.dumps(out))
