"""Benchmark: flagship train-step throughput (images/sec/chip) on real TPU.

Prints ONE JSON line:
  {"metric": "train_images_per_sec_per_chip", "value": N,
   "unit": "images/sec/chip", "vs_baseline": N,
   "davit_tiny_images_per_sec": N, "infer_p50_ms": N}

The primary metric is the full production train step — on-device
augmentation + bf16 ResNet-50 + one-hot metadata tower + RG-ATT fusion +
fp32 weighted-CE + backward + masked Adam — at batch 128 on one chip.
``vs_baseline`` is the ratio against the PyTorch-CPU reference-equivalent
train step (measured once on this machine, cached in
``baseline_torch_cpu.json``; BASELINE.md: reference publishes no throughput).
Extra fields: the transformer-family train step (davit_tiny, the reference's
best published backbone, B=64, Pallas fused window attention) and the
single-image inference p50 on the flagship (eval path, B=1).
"""

import json
import os
import time

import numpy as np

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "baseline_torch_cpu.json")
BATCH = 128
DAVIT_BATCH = 64
WARMUP = 3
ITERS = 20

# Wall-clock budget (seconds). The driver wraps bench.py in a timeout; r3
# exceeded it (rc=124) because 6+ jitted programs cold-compile at ~60-340 s
# each over the tunnel. The primary metric always runs; each EXTRA starts
# only while we're inside the budget, and the JSON prints whatever finished.
_T0 = time.time()
_DEADLINE_S = float(os.environ.get("SKINJAX_BENCH_DEADLINE_S", 480))


def _time_left() -> float:
    return _DEADLINE_S - (time.time() - _T0)


def _torch_cpu_baseline() -> float:
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            return float(json.load(f)["torch_cpu_images_per_sec"])
    return float("nan")


def _train_throughput(model, batch_size, loss_classes=6, freeze=False):
    """Warm up + time the jitted full train step; returns images/sec.

    ``freeze=True`` runs the backbone-frozen mode — the reference
    MultimodalModel's DEFAULT (multimodalIntraInterModal.py:25
    unfreeze_weights="frozen_weights"): the frozen backward is eliminated
    (train/steps.py _stop_frozen)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from skinjax.train import (
        make_loss_fn,
        make_optimizer,
        make_train_step,
        trainable_mask,
    )
    from skinjax.train.steps import create_train_state

    rng = np.random.default_rng(0)
    batch = {
        "image": rng.integers(0, 256, (batch_size, 224, 224, 3), dtype=np.uint8),
        "metadata": rng.normal(size=(batch_size, 91)).astype(np.float32),
        "label": rng.integers(0, loss_classes, batch_size).astype(np.int32),
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

    mask = None
    if freeze:
        mask = trainable_mask(state.params, "frozen_weights")
        tx = make_optimizer(5e-5, 1e-4, mask=mask)
        state = dataclasses.replace(state, opt_state=tx.init(state.params))

    loss_fn = make_loss_fn("weighted_ce", np.ones(loss_classes, np.float32))
    step = make_train_step(model, tx, loss_fn, augment=True,
                           image_dtype=jnp.bfloat16, trainable_mask=mask)
    im = jnp.asarray(batch["image"])
    md = jnp.asarray(batch["metadata"])
    lb = jnp.asarray(batch["label"])
    key = jax.random.key(1)

    import jax as _jax

    for _ in range(WARMUP):
        state, loss = step(state, im, md, lb, key)
    _jax.block_until_ready(loss)

    t0 = time.time()
    for _ in range(ITERS):
        state, loss = step(state, im, md, lb, key)
    _jax.block_until_ready(loss)
    dt = (time.time() - t0) / ITERS
    return batch_size / dt, state


def _sentence_throughput(batch_size=32, seq_len=256):
    """BASELINE config #4: DaViT-tiny + native bf16 BERT-base tokens tower,
    RG-ATT, text tower frozen (reference default). images/sec."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from skinjax.models import MultimodalModel
    from skinjax.models.text.bert import NativeBertEncoder, NativeSentenceTower
    from skinjax.train import (
        make_loss_fn,
        make_optimizer,
        make_train_step,
        trainable_mask,
    )
    from skinjax.train.steps import create_train_state

    tower = NativeSentenceTower(
        encoder=NativeBertEncoder(dtype=jnp.bfloat16), dtype=jnp.bfloat16)
    model = MultimodalModel(
        num_classes=6, num_heads=8, cnn_model_name="davit_tiny",
        text_model_name="bert-base-uncased", text_module=tower,
        text_input_mode="tokens", text_encoder_dim_output=768,
        common_dim=512,
        attention_mechanism="att-intramodal+residual+cross-attention-metadados",
        dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.integers(0, 256, (batch_size, 224, 224, 3), dtype=np.uint8),
        "metadata": {
            "input_ids": rng.integers(1, 30000, (batch_size, seq_len)).astype(np.int32),
            "attention_mask": np.ones((batch_size, seq_len), np.int32),
        },
        "label": rng.integers(0, 6, batch_size).astype(np.int32),
    }
    tx = make_optimizer(5e-5, 1e-4)
    small = {k: (jax.tree_util.tree_map(lambda a: a[:2], v)
                 if isinstance(v, dict) else v[:2]) for k, v in batch.items()}
    try:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            state = create_train_state(model, jax.random.key(0), small, tx)
        state = jax.device_put(state, jax.devices()[0])
    except Exception:
        state = create_train_state(model, jax.random.key(0), batch, tx)
    # reference default: sentence tower frozen (text_train_mode binarized
    # off the unfreeze_weights knob — train/loop.py)
    mask = trainable_mask(state.params, "frozen_weights",
                          frozen_prefixes=("text_tower", "text_module"))
    tx = make_optimizer(5e-5, 1e-4, mask=mask)
    state = dataclasses.replace(state, opt_state=tx.init(state.params))
    loss_fn = make_loss_fn("weighted_ce", np.ones(6, np.float32))
    step = make_train_step(model, tx, loss_fn, augment=True,
                           image_dtype=jnp.bfloat16, recipe="sentence",
                           trainable_mask=mask)
    im = jnp.asarray(batch["image"])
    md = jax.tree_util.tree_map(jnp.asarray, batch["metadata"])
    lb = jnp.asarray(batch["label"])
    key = jax.random.key(1)
    for _ in range(WARMUP):
        state, loss = step(state, im, md, lb, key)
    jax.block_until_ready(loss)
    t0 = time.time()
    for _ in range(ITERS):
        state, loss = step(state, im, md, lb, key)
    jax.block_until_ready(loss)
    return batch_size / ((time.time() - t0) / ITERS)


def _infer_p50(model, state):
    """Single-image eval-path latency (p50 over 50 calls), ms."""
    import jax
    import jax.numpy as jnp

    from skinjax.train.steps import make_eval_step

    eval_step = make_eval_step(model, image_dtype=jnp.bfloat16)
    rng = np.random.default_rng(1)
    im = jnp.asarray(rng.integers(0, 256, (1, 224, 224, 3), dtype=np.uint8))
    md = jnp.asarray(rng.normal(size=(1, 91)).astype(np.float32))
    for _ in range(5):
        out = eval_step(state, im, md)
    jax.block_until_ready(out)
    times = []
    for _ in range(50):
        t0 = time.perf_counter()
        out = eval_step(state, im, md)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) * 1000)
    return float(np.percentile(times, 50))


def main():
    # must precede any skinjax import: davit/swin read the flag at import
    # time to default their window attention to the Pallas fused kernel
    os.environ.setdefault("SKINJAX_WINATTN", "pallas")

    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from skinjax.models import MultimodalModel

    flagship = MultimodalModel(
        num_classes=6, num_heads=8, cnn_model_name="resnet-50",
        text_model_name="one-hot-encoder", common_dim=512, vocab_size=91,
        attention_mechanism="att-intramodal+residual+cross-attention-metadados",
        dtype=jnp.bfloat16,
    )
    ips, state = _train_throughput(flagship, BATCH)

    extras = {}

    def _extra(key, fn, round_nd=1):
        # only START an extra with budget in hand; a cold remote compile is
        # ~60-340 s, so skipping late beats rc=124 with the JSON unprinted
        if _time_left() < 120:
            return
        try:
            extras[key] = round(fn(), round_nd)
        except Exception:
            pass

    def _mm(name, batch):
        return lambda: _train_throughput(
            MultimodalModel(
                num_classes=6, num_heads=8, cnn_model_name=name,
                text_model_name="one-hot-encoder", common_dim=512,
                vocab_size=91,
                attention_mechanism=(
                    "att-intramodal+residual+cross-attention-metadados"),
                dtype=jnp.bfloat16,
            ), batch)[0]

    # Extras run in PRIORITY order: metrics a budget-trimmed run has never
    # recorded come FIRST (BENCH_r04 dropped beitv2/swin/sentence/mvitv2
    # by running them after the already-recorded trio — VERDICT r4 weak #2).
    # With bench/warm_cache.py pre-populating .jax_cache at round end, all
    # of these are seconds each and the whole list fits the 480 s budget.
    #
    # mvitv2: the reference's #2 published-BACC backbone (frugality table;
    # fused pooled-attention kernel, DESIGN §5l). caformer_b36: the #1 BACC
    # / slowest published family (fused global core A/B, DESIGN §5n).
    # beitv2_large: the largest published backbone (307 M; B=32 is the
    # plain no-remat capacity limit on one v5e — DESIGN §5h).
    _extra("mvitv2_small_images_per_sec", _mm("mvitv2_small", DAVIT_BATCH))
    _extra("caformer_b36_images_per_sec", _mm("caformer_b36", 32))
    # coat_lite_small: fused token-MLP kernel default (DESIGN §5p,
    # +7.7-8.1% same-run over the XLA chain)
    _extra("coat_lite_small_images_per_sec", _mm("coat_lite_small", 64))
    _extra("beitv2_large_images_per_sec",
           _mm("beitv2_large_patch16_224", 32))
    _extra("swin_tiny_images_per_sec",
           _mm("swin_tiny_patch4_window7_224", DAVIT_BATCH))
    # BASELINE config #4 (skinLesionDatasetsWithBert.py): DaViT-tiny +
    # BERT-base tokens tower (native bf16, models/text/bert.py), RG-ATT,
    # T=256, B=32, text tower FROZEN (the reference default —
    # loadImageModelClassifier.py:174-179). DESIGN §5f/§5f-c.
    _extra("sentence_frozen_images_per_sec", lambda: _sentence_throughput())
    _extra("infer_p50_ms", lambda: _infer_p50(flagship, state))
    # reference-default train mode: backbone frozen
    _extra("flagship_frozen_images_per_sec",
           lambda: _train_throughput(flagship, BATCH, freeze=True)[0])
    _extra("davit_tiny_images_per_sec", _mm("davit_tiny", DAVIT_BATCH))

    base = _torch_cpu_baseline()
    vs = ips / base if np.isfinite(base) and base > 0 else None
    print(json.dumps({
        "metric": "train_images_per_sec_per_chip",
        "value": round(ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": None if vs is None else round(vs, 1),
        **extras,
    }), flush=True)
    # the tunneled-TPU client can hang in interpreter teardown after the
    # result is already out (r3: JSON printed, rc=124) — exit hard
    os._exit(0)


if __name__ == "__main__":
    main()
