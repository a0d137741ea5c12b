"""Benchmark: flagship train-step throughput (images/sec/chip) on real TPU.

Prints ONE JSON line:
  {"metric": "train_images_per_sec_per_chip", "value": N,
   "unit": "images/sec/chip", "vs_baseline": N}

The measured program is the full production train step — on-device
augmentation + bf16 ResNet-50 + one-hot metadata tower + RG-ATT fusion +
fp32 weighted-CE + backward + masked Adam — at batch 128 on one chip.
``vs_baseline`` is the ratio against the PyTorch-CPU reference-equivalent
train step (measured once on this machine, cached in
``baseline_torch_cpu.json``; BASELINE.md: reference publishes no throughput).
"""

import json
import os
import time

import numpy as np

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "baseline_torch_cpu.json")
BATCH = 128
WARMUP = 3
ITERS = 20


def _torch_cpu_baseline() -> float:
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            return float(json.load(f)["torch_cpu_images_per_sec"])
    return float("nan")


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from skinjax.models import MultimodalModel
    from skinjax.train import make_loss_fn, make_optimizer, make_train_step
    from skinjax.train.steps import create_train_state

    model = MultimodalModel(
        num_classes=6, num_heads=8, cnn_model_name="resnet-50",
        text_model_name="one-hot-encoder", common_dim=512, vocab_size=91,
        attention_mechanism="att-intramodal+residual+cross-attention-metadados",
        dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.integers(0, 256, (BATCH, 224, 224, 3), dtype=np.uint8),
        "metadata": rng.normal(size=(BATCH, 91)).astype(np.float32),
        "label": rng.integers(0, 6, BATCH).astype(np.int32),
    }
    tx = make_optimizer(5e-5, 1e-4)
    # init on CPU (fast) then transfer: avoids a ~100s remote-compile of the
    # init program on the tunneled TPU
    try:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            state = create_train_state(
                model, jax.random.key(0), {k: v[:2] for k, v in batch.items()}, tx
            )
        state = jax.device_put(state, jax.devices()[0])
    except Exception:
        state = create_train_state(model, jax.random.key(0), batch, tx)

    loss_fn = make_loss_fn("weighted_ce", np.ones(6, np.float32))
    step = make_train_step(model, tx, loss_fn, augment=True, image_dtype=jnp.bfloat16)
    im = jnp.asarray(batch["image"])
    md = jnp.asarray(batch["metadata"])
    lb = jnp.asarray(batch["label"])
    key = jax.random.key(1)

    for _ in range(WARMUP):
        state, loss = step(state, im, md, lb, key)
    jax.block_until_ready(loss)

    t0 = time.time()
    for _ in range(ITERS):
        state, loss = step(state, im, md, lb, key)
    jax.block_until_ready(loss)
    dt = (time.time() - t0) / ITERS

    ips = BATCH / dt
    base = _torch_cpu_baseline()
    vs = ips / base if np.isfinite(base) and base > 0 else None
    print(json.dumps({
        "metric": "train_images_per_sec_per_chip",
        "value": round(ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": None if vs is None else round(vs, 1),
    }))


if __name__ == "__main__":
    main()
