"""Decompose the e2e epoch cost (bench_e2e.py: 50.7 s steady epoch vs the
0.46 s step-ceiling train pass): time each epoch component in isolation on
the real chip — H2D batch transfer over the tunnel, jitted steps on a
device-resident batch, the full evaluate() pass, the early-stopping host
snapshot (device_get of the TrainState), and a full in-loop epoch."""
import os as _os, sys as _sys  # repo-root import shim (scripts live in bench/)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from skinjax.data import synthetic_source
from skinjax.data.sampling import compute_class_weights, epoch_batches
from skinjax.data.pipeline import prefetch_batches
from skinjax.models import MultimodalModel
from skinjax.train import make_loss_fn, make_optimizer
from skinjax.train.loop import evaluate
from skinjax.train.steps import (
    create_train_state, make_eval_step, make_train_step_weighted)
from skinjax.train.kfold import SubsetSource

N, NCLS, B = 2048, 6, 128
src = synthetic_source(n=N, image_size=(224, 224), feature_dim=91,
                       num_classes=NCLS)
tr = SubsetSource(src, np.arange(1024))
va = SubsetSource(src, np.arange(1024, 2048))

model = MultimodalModel(
    num_classes=NCLS, num_heads=8, cnn_model_name="resnet-50",
    text_model_name="one-hot-encoder", common_dim=512, vocab_size=91,
    attention_mechanism="att-intramodal+residual+cross-attention-metadados",
    dtype=jnp.bfloat16)
cw = compute_class_weights(tr.labels, NCLS)
loss_fn = make_loss_fn("weighted_ce", cw)
tx = make_optimizer(5e-5, 1e-4)
cpu = jax.devices("cpu")[0]
sample = tr.batch(np.arange(B))
with jax.default_device(cpu):
    state = create_train_state(model, jax.random.key(0),
                               {k: v[:2] for k, v in sample.items()}, tx)
state = jax.device_put(state, jax.devices()[0])
step = make_train_step_weighted(model, tx, loss_name="weighted_ce",
                                augment=True, image_dtype=jnp.bfloat16)
eval_step = make_eval_step(model, image_dtype=jnp.bfloat16)
cw_dev = jnp.asarray(cw)
key = jax.random.key(1)

# warm compiles
b0 = {k: jnp.asarray(v) for k, v in sample.items()}
state, loss = step(state, b0["image"], b0["metadata"], b0["label"], key, cw_dev)
jax.block_until_ready(loss)
_ = evaluate(eval_step, state, va, B, NCLS, loss_fn)

def t(fn, n=3):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)

# 1. H2D: one uint8 train batch (19.3 MB) through the tunnel
def h2d():
    x = jax.device_put(sample["image"])
    jax.block_until_ready(x)
print(f"h2d_one_batch_s       {t(h2d):8.3f}   (x8 per train pass, x8 eval)")

# 2. host batch assembly (numpy gather) for one epoch
rows = epoch_batches(tr.labels, NCLS, B, seed=42, epoch=1, weighted=True)
print(f"assemble_epoch_s      {t(lambda: [tr.batch(r) for r in rows]):8.3f}")

# 3. train pass, device-resident batch reused (step ceiling)
def steps_only():
    global state
    for _ in range(len(rows)):
        state, l = step(state, b0["image"], b0["metadata"], b0["label"],
                        key, cw_dev)
    jax.block_until_ready(l)
print(f"train_pass_resident_s {t(steps_only):8.3f}   ({len(rows)} steps)")

# 4. train pass through the REAL pipeline (prefetch + H2D per batch)
def train_pass():
    global state
    for batch in prefetch_batches(tr, rows):
        bd = {k: jnp.asarray(v) for k, v in batch.items()}
        state, l = step(state, bd["image"], bd["metadata"], bd["label"],
                        key, cw_dev)
    jax.block_until_ready(l)
print(f"train_pass_full_s     {t(train_pass):8.3f}")

# 5. full evaluate() (the per-epoch val pass)
print(f"evaluate_s            {t(lambda: evaluate(eval_step, state, va, B, NCLS, loss_fn)):8.3f}")

# 6. early-stopping host snapshot: device_get of the full TrainState
print(f"device_get_state_s    {t(lambda: jax.device_get(state)):8.3f}")

import dataclasses
light = dataclasses.replace(state, opt_state=None)
print(f"device_get_params_s   {t(lambda: jax.device_get(light)):8.3f}   (params+stats only)")

# 7. the EXACT train_process epoch (prefetch + put_batch + weighted steps +
#    loss stack + evaluate + plateau + early host snapshot)
from skinjax.train.early_stopping import EarlyStopping
from skinjax.train.optimizer import PlateauScheduler, set_learning_rate

early = EarlyStopping(patience=10, delta=0.01, metric_name="val_loss")
plateau = PlateauScheduler(lr=5e-5, factor=0.1, patience=2)

def full_epoch(epoch):
    global state
    rows_e = epoch_batches(tr.labels, NCLS, B, seed=42, epoch=epoch,
                           weighted=True)
    losses = []
    for batch in prefetch_batches(tr, rows_e):
        bd = {k: jnp.asarray(v) for k, v in batch.items()}
        state, l = step(state, bd["image"], bd["metadata"], bd["label"],
                        key, cw_dev)
        losses.append(l)
    tl = float(jnp.mean(jnp.stack(losses)))
    metrics, _, _, _, vl = evaluate(eval_step, state, va, B, NCLS, loss_fn)
    new_lr = plateau.step(vl)
    state = dataclasses.replace(
        state, opt_state=set_learning_rate(state.opt_state, new_lr))
    early(val_loss=vl, val_bacc=float(metrics["balanced_accuracy"]),
          state=lambda s=state: jax.device_get(s))

for e in range(3):
    t0 = time.perf_counter()
    full_epoch(e)
    print(f"inloop_epoch_{e}_s     {time.perf_counter() - t0:8.3f}")

# 8. fold init as train_process does it: create_train_state on the TPU
def tpu_init():
    s = create_train_state(model, jax.random.key(0),
                           {k: v[:2] for k, v in sample.items()}, tx)
    jax.block_until_ready(s.params)
t0 = time.perf_counter(); tpu_init()
print(f"create_state_tpu_s    {time.perf_counter() - t0:8.3f}   (per fold, train_process)")
def cpu_init():
    with jax.default_device(cpu):
        s = create_train_state(model, jax.random.key(0),
                               {k: v[:2] for k, v in sample.items()}, tx)
    s = jax.device_put(s, jax.devices()[0])
    jax.block_until_ready(s.params)
t0 = time.perf_counter(); cpu_init()
print(f"create_state_cpu_s    {time.perf_counter() - t0:8.3f}   (fast-init + device_put)")
