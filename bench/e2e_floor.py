"""Measured non-transfer floor of the e2e epoch (VERDICT r4 weak #5).

DESIGN §5k ends at 23.6 s steady epoch with ~66% tunnel H2D and a
PROJECTED "~1.5-2 s on a production PCIe host". This pins that number by
measurement instead of arithmetic: every train/val batch is pre-staged on
the device, then the EXACT train_process epoch body runs — weighted steps,
the dispatch-then-collect evaluate pass (through the real evaluate() with
a staged put_batch), plateau LR update, and the device-resident best
snapshot — with zero H2D inside the timed region. Any hidden per-epoch
sync (loss stack, metric host pulls) stays inside the measurement.

Same model/shape setup as bench/decompose_e2e.py (flagship ResNet-50
B=128, 1024 train / 1024 val synthetic PAD-20-sized samples).
"""
import os as _os, sys as _sys  # repo-root import shim (scripts live in bench/)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import dataclasses
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from skinjax.data import synthetic_source
from skinjax.data.sampling import compute_class_weights, epoch_batches
from skinjax.models import MultimodalModel
from skinjax.train import make_loss_fn, make_optimizer
from skinjax.train.early_stopping import EarlyStopping
from skinjax.train.loop import evaluate
from skinjax.train.optimizer import PlateauScheduler, set_learning_rate
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

# ---- pre-stage EVERY batch on device (epochs share the seed-42 sampler
# stream the real loop uses; 3 epochs x 8 train batches x 19.3 MB + 8 val
# batches — ~620 MB HBM, fine next to the 16 GB chip) ----
EPOCHS = 3
staged_train = []  # per epoch: list of device batch dicts
for e in range(EPOCHS):
    rows_e = epoch_batches(tr.labels, NCLS, B, seed=42, epoch=e, weighted=True)
    staged_train.append([
        {k: jnp.asarray(v) for k, v in tr.batch(r).items()} for r in rows_e])
n_val_batches = -(-len(va) // B)
staged_val = []
for b in range(n_val_batches):
    idx = np.arange(b * B, (b + 1) * B) % len(va)
    staged_val.append({k: jnp.asarray(v) for k, v in va.batch(idx).items()})
for batches in staged_train + [staged_val]:
    for bd in batches:
        jax.block_until_ready(bd["image"])


class _StagedPut:
    """put_batch for evaluate(): returns the pre-staged device batch in
    call order, making the real evaluate() H2D-free."""

    def __init__(self, staged):
        self.staged = staged
        self.i = 0

    def __call__(self, _host_batch):
        bd = self.staged[self.i % len(self.staged)]
        self.i += 1
        return bd


# warm compiles
b0 = staged_train[0][0]
state, loss = step(state, b0["image"], b0["metadata"], b0["label"], key, cw_dev)
jax.block_until_ready(loss)
_ = evaluate(eval_step, state, va, B, NCLS, loss_fn,
             put_batch=_StagedPut(staged_val))

early = EarlyStopping(patience=10, delta=0.01, metric_name="val_loss")
plateau = PlateauScheduler(lr=5e-5, factor=0.1, patience=2)


def staged_epoch(e):
    """The train_process epoch body, batches already resident."""
    global state
    losses = []
    for bd in staged_train[e % EPOCHS]:
        state, l = step(state, bd["image"], bd["metadata"], bd["label"],
                        key, cw_dev)
        losses.append(l)
    tl = float(jnp.mean(jnp.stack(losses)))
    metrics, _, _, _, vl = evaluate(
        eval_step, state, va, B, NCLS, loss_fn,
        put_batch=_StagedPut(staged_val))
    new_lr = plateau.step(vl)
    state = dataclasses.replace(
        state, opt_state=set_learning_rate(state.opt_state, new_lr))
    early(val_loss=vl, val_bacc=float(metrics["balanced_accuracy"]),
          state=lambda s=state: dataclasses.replace(
              s, step=jnp.copy(s.step),
              params=jax.tree_util.tree_map(jnp.copy, s.params),
              batch_stats=jax.tree_util.tree_map(jnp.copy, s.batch_stats),
              opt_state=None))


for e in range(2 * EPOCHS):
    t0 = time.perf_counter()
    staged_epoch(e)
    print(f"staged_epoch_{e}_s    {time.perf_counter() - t0:8.3f}", flush=True)

# components for attribution
def t(fn, n=3):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def steps_only():
    global state
    l = None
    for bd in staged_train[0]:
        state, l = step(state, bd["image"], bd["metadata"], bd["label"],
                        key, cw_dev)
    jax.block_until_ready(l)


print(f"train_pass_staged_s  {t(steps_only):8.3f}   (8 steps)")
print(f"evaluate_staged_s    {t(lambda: evaluate(eval_step, state, va, B, NCLS, loss_fn, put_batch=_StagedPut(staged_val))):8.3f}")
