"""Same-run A/B: strip kernel 6-D window-view interface vs 4-D NHWC
interface (SKINJAX_WA_IFACE=4d). The 6-D view pays XLA-side repack copies
at every kernel boundary (~2.4 ms/step measured, docs/DESIGN.md §5b-r3);
the 4-D interface moves the misalignment into in-VMEM shift lowerings.
Also A/Bs swin_tiny (bias+mask path) when AB_SWIN=1.
"""
import os as _os, sys as _sys  # repo-root import shim (scripts live in bench/)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os, time

os.environ["SKINJAX_WINATTN"] = "pallas"

import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from skinjax.models import MultimodalModel
from skinjax.train import make_loss_fn, make_optimizer, make_train_step
from skinjax.train import steps as steps_mod
from skinjax.train.steps import create_train_state

B = 64


def build(backbone):
    return MultimodalModel(
        num_classes=6, num_heads=8, cnn_model_name=backbone,
        text_model_name="one-hot-encoder", common_dim=512, vocab_size=91,
        attention_mechanism="att-intramodal+residual+cross-attention-metadados",
        dtype=jnp.bfloat16)


def time_step(model):
    rng = np.random.default_rng(0)
    batch = {"image": rng.integers(0, 256, (B, 224, 224, 3), dtype=np.uint8),
             "metadata": rng.normal(size=(B, 91)).astype(np.float32),
             "label": rng.integers(0, 6, B).astype(np.int32)}
    tx = make_optimizer(5e-5, 1e-4)
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


backbones = ["davit_tiny"]
if os.environ.get("AB_SWIN") == "1":
    backbones.append("swin_tiny_patch4_window7_224")

for bk in backbones:
    for name, iface in [("6d", None), ("4d", "4d"), ("6d bracket2", None)]:
        if iface:
            os.environ["SKINJAX_WA_IFACE"] = iface
        else:
            os.environ.pop("SKINJAX_WA_IFACE", None)
        steps_mod._TRAIN_STEP_CACHE.clear()
        ms, ips, warm = time_step(build(bk))
        print(f"{bk} iface={name:12s} B={B} {ms:8.2f} ms/step  {ips:7.1f} "
              f"img/s  (warm+compile {warm:.0f}s)", flush=True)
