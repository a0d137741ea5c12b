"""Per-family MFU for the §5g-b zoo table (VERDICT r4 weak #6).

FLOPs per train step come from XLA's own HLO cost analysis of the EXACT
bench train step (same model/batch as bench_zoo.py), lowered on CPU — no
hand-derived arch arithmetic. MFU = measured img/s x FLOPs/img / peak.

v5e peak: 197 TFLOP/s bf16 (394 int8). The measured img/s column is the
recorded §5g-b/§5g/§5b-r3c/§5i numbers (same harness), so this script only
needs the analysis pass — run it on CPU, no chip required.
"""
import os as _os, sys as _sys  # repo-root import shim (scripts live in bench/)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json

import jax

jax.config.update("jax_platforms", "cpu")  # sitecustomize pins axon otherwise

import numpy as np
import jax.numpy as jnp

# (family, batch, measured img/s) — DESIGN §5g-b + §5g/§5b-r3c/§5h/§5i-b,
# r4/r5 bench records where a newer same-harness number exists
MEASURED = [
    ("custom-cnn", 128, 13043.3),
    ("mobilenet-v2", 128, 4268.4),
    ("efficientnet-b0", 128, 3542.6),
    ("resnet-18", 128, 5505.9),
    ("resnet-50", 128, 2242.5),
    ("vit_small_patch16_224", 64, 2052.5),
    ("densenet169", 64, 1332.7),
    ("caformer_s18", 64, 1275.1),
    ("nextvit_small", 64, 1177.4),
    ("vgg16", 64, 965.2),
    ("coat_lite_small", 64, 877.6),
    ("davit_tiny", 64, 1061.1),
    ("swin_tiny_patch4_window7_224", 64, 1008.0),
    ("mvitv2_small", 64, 573.9),
    ("efficientnet-b7", 32, 495.7),
    ("caformer_b36", 32, 414.5),
    ("beitv2_large_patch16_224", 32, 248.1),
    ("vit_large_patch16_224", 32, 268.0),
]
PEAK_TFLOPS = 197.0  # v5e bf16


def step_flops(backbone: str, batch: int) -> float:
    """HLO-analyzed FLOPs of one full train step (fwd+bwd+Adam)."""
    from skinjax.models import MultimodalModel
    from skinjax.train import make_loss_fn, make_optimizer, make_train_step
    from skinjax.train.steps import create_train_state

    model = MultimodalModel(
        num_classes=6, num_heads=8, cnn_model_name=backbone,
        text_model_name="one-hot-encoder", common_dim=512, vocab_size=91,
        attention_mechanism="att-intramodal+residual+cross-attention-metadados",
        dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    batch_d = {
        "image": rng.integers(0, 256, (batch, 224, 224, 3), dtype=np.uint8),
        "metadata": rng.normal(size=(batch, 91)).astype(np.float32),
        "label": rng.integers(0, 6, batch).astype(np.int32),
    }
    tx = make_optimizer(5e-5, 1e-4)
    state = create_train_state(
        model, jax.random.key(0), {k: v[:2] for k, v in batch_d.items()}, tx)
    loss_fn = make_loss_fn("weighted_ce", np.ones(6, np.float32))
    step = make_train_step(model, tx, loss_fn, augment=True,
                           image_dtype=jnp.bfloat16)
    lowered = jax.jit(step).lower(
        state, jnp.asarray(batch_d["image"]),
        jnp.asarray(batch_d["metadata"]), jnp.asarray(batch_d["label"]),
        jax.random.key(1))
    ca = lowered.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca["flops"])


if __name__ == "__main__":
    rows = []
    for name, B, ips in MEASURED:
        try:
            fl = step_flops(name, B)
        except Exception as e:
            print(json.dumps({"family": name,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)
            continue
        fpi = fl / B
        mfu = ips * fpi / (PEAK_TFLOPS * 1e12)
        rows.append({"family": name, "B": B, "img_s": ips,
                     "gflops_per_img": round(fpi / 1e9, 1),
                     "mfu_pct": round(100 * mfu, 1)})
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"table": rows}))
