"""Training loop: the reference's ``train_process`` (train_pad_20.py:35-205)
rebuilt around jitted steps, static shapes, and device-resident best weights.

Per epoch: weighted-resampled static-shape batches → fused
augment+fwd+bwd+update step → full-val loss + metric pass → plateau LR step →
early stopping on val_loss (patience 10, delta 0.01). Returns the best state
(by the early-stopping metric), final metrics from a re-evaluation of the
best state, and the loss history — the same artifacts the reference persists.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from skinjax.data.pipeline import prefetch_batches
from skinjax.data.sampling import compute_class_weights, epoch_batches
from skinjax.train.early_stopping import EarlyStopping
from skinjax.train.losses import make_loss_fn
from skinjax.train.metrics import classification_metrics
from skinjax.train.optimizer import (
    PlateauScheduler,
    make_optimizer,
    set_learning_rate,
    trainable_mask,
)
from skinjax.train.steps import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step_weighted,
)


@dataclasses.dataclass
class TrainConfig:
    num_epochs: int = 100
    batch_size: int = 32
    learning_rate: float = 5e-5
    weight_decay: float = 1e-4
    loss: str = "weighted_ce"
    focal_gamma: float = 2.0
    early_stopping_patience: int = 10
    early_stopping_delta: float = 0.01
    early_stopping_metric: str = "val_loss"
    plateau_factor: float = 0.1
    plateau_patience: int = 2
    unfreeze_weights: str = "unfrozen_weights"
    # Freeze mode for the text tower. None (default) mirrors the reference:
    # one knob drives both towers — BERT/GPT-2 sentence towers follow
    # unfreeze_weights (multimodalIntraInterModal.py:67-70 passes
    # train_mode=self.unfreeze_weights; requires_grad=False skips their
    # backward in torch), while one-hot/tab-transformer/static towers stay
    # trainable (loadTextModelEncoder's tab-transformer branch never touches
    # requires_grad). An explicit mode here overrides for any tower. Frozen
    # leaves are masked in the optimizer AND stop-gradient'd in the step, so
    # the tower's backward is eliminated (tests/test_frozen_backward.py).
    text_train_mode: Optional[str] = None
    weighted_sampling: bool = True
    augment: bool = True
    # 'default' (skinLesionDatasets.py:75-112) or 'sentence' — the heavier
    # recipe the reference applies to LLM-sentence datasets
    # (skinLesionDatasetsWithBert.py:84-110)
    augment_recipe: str = "default"
    seed: int = 42
    image_dtype: str = "bfloat16"
    log_every: int = 0  # batches; 0 = epoch level only
    # mesh sharding knobs (used only when train_process gets a mesh):
    # min output dim for TP on 2-D kernels; conv-channel TP threshold
    # (0 = off); Megatron pairs on transformer attn/mlp kernels; FSDP
    # (ZeRO-3) min leaf elements (0 = off) — see parallel/mesh.py
    tp_min_dim: int = 1024
    tp_min_conv: int = 0
    tp_attn: bool = False
    fsdp_min_size: int = 0


def _dtype(cfg: TrainConfig):
    return jnp.bfloat16 if cfg.image_dtype == "bfloat16" else jnp.float32


def evaluate(
    eval_step: Callable,
    state: TrainState,
    source,
    batch_size: int,
    num_classes: int,
    loss_fn: Optional[Callable] = None,
    put_batch: Optional[Callable] = None,
) -> Tuple[Dict, np.ndarray, np.ndarray, np.ndarray, float]:
    """Single full pass; static batch shapes via wrap-padding (duplicates are
    idempotent writes into the per-sample output arrays).

    Returns (metrics, labels, preds, probs, mean_loss) — the contract of
    utils/model_metrics.evaluate_model:15-134.
    """
    n = len(source)
    n_batches = -(-n // batch_size)
    probs_out = np.zeros((n, num_classes), dtype=np.float32)
    logits_out = np.zeros((n, num_classes), dtype=np.float32)
    # dispatch-then-collect with a BOUNDED in-flight window: enqueue batches'
    # eval_steps ahead of syncing so the runtime overlaps batch b+1's H2D
    # transfer with batch b's compute (measured as part of the §5k e2e epoch
    # work) — but collect the oldest result once the window fills, so peak
    # HBM stays O(window) batches instead of the whole validation set
    # (ADVICE r4, medium: an unbounded queue keeps every batch's image
    # buffers alive until its computation drains).
    window = 4
    pending: List[Tuple[np.ndarray, Any]] = []

    def _collect(idx, logits):
        logits = np.asarray(logits, dtype=np.float32)
        logits_out[idx] = logits  # wrap-duplicates overwrite identically
        probs_out[idx] = np.asarray(
            jax.nn.softmax(jnp.asarray(logits), axis=-1), dtype=np.float32
        )

    for b in range(n_batches):
        idx = np.arange(b * batch_size, (b + 1) * batch_size) % n
        batch = source.batch(idx)
        if put_batch is not None:
            batch = put_batch(batch)
        else:
            batch = {
                k: jax.tree_util.tree_map(jnp.asarray, v) for k, v in batch.items()
            }
        pending.append((idx, eval_step(state, batch["image"], batch["metadata"])))
        if len(pending) > window:
            _collect(*pending.pop(0))
    for idx, logits in pending:
        _collect(idx, logits)
    labels = source.labels[:n]
    preds = probs_out.argmax(axis=1)
    metrics = classification_metrics(labels, preds, probs_out, num_classes)
    # exact dataset-mean loss over deduplicated logits (the reference averages
    # per-loader-batch means, train_pad_20.py:121-128 — identical up to the
    # last-batch weighting its drop_last=False loader introduces)
    mean_loss = (
        float(loss_fn(jnp.asarray(logits_out), jnp.asarray(labels)))
        if loss_fn is not None
        else float("nan")
    )
    return metrics, labels, preds, probs_out, mean_loss


def train_process(
    model,
    train_source,
    val_source,
    num_classes: int,
    config: TrainConfig = TrainConfig(),
    tracker=None,
    fold_num: int = 0,
    resume_dir: Optional[str] = None,
    mesh=None,
) -> Tuple[TrainState, Dict, Dict[str, List[float]]]:
    """``resume_dir``: if set, checkpoints (params+opt_state+step+epoch) are
    written there each epoch and training resumes from the latest one — true
    mid-training resume, which the reference lacks (SURVEY.md §5).

    ``mesh``: a jax ``Mesh`` with ("data", "model") axes — the state is
    sharded by the parallel rules (replicated + TP on wide kernels) and every
    batch shards over the data axis; GSPMD inserts the gradient collectives.
    None = single device."""
    cfg = config
    rng = jax.random.key(cfg.seed)

    if mesh is not None:
        from skinjax.parallel.distributed import shard_batch as _shard_batch

        put_batch = lambda b: _shard_batch(mesh, b)
    else:
        put_batch = lambda b: {
            k: jax.tree_util.tree_map(jnp.asarray, v) for k, v in b.items()
        }

    class_weights = compute_class_weights(train_source.labels, num_classes)
    loss_fn = make_loss_fn(cfg.loss, class_weights, cfg.focal_gamma)

    sample = train_source.batch(np.arange(min(cfg.batch_size, len(train_source))))
    # static batch shape: tile sample up to batch_size if the source is tiny
    if sample["image"].shape[0] < cfg.batch_size:
        reps = -(-cfg.batch_size // sample["image"].shape[0])
        sample = jax.tree_util.tree_map(
            lambda v: np.concatenate([v] * reps)[: cfg.batch_size], sample
        )

    init_rng, rng = jax.random.split(rng)
    # optimizer with freeze mask
    probe_tx = make_optimizer(cfg.learning_rate, cfg.weight_decay)
    # fast-init: build the state pinned to CPU, then transfer — compiling
    # the init program on a remote/tunneled accelerator costs minutes per
    # fold (measured 175 s vs 26 s for resnet-50, DESIGN §5k); weights are
    # identical (same PRNG). Mesh runs keep the default path —
    # distribute_state places the state.
    if mesh is None:
        try:
            accel = jax.devices()[0]
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                state = create_train_state(model, init_rng, sample, probe_tx)
            if accel.platform != "cpu":
                state = jax.device_put(state, accel)
        except Exception:
            state = create_train_state(model, init_rng, sample, probe_tx)
    else:
        state = create_train_state(model, init_rng, sample, probe_tx)
    tower = getattr(model, "text_module", None)
    if getattr(tower, "pretrained_params", None) is not None:
        # sentence towers built by build_sentence_tower carry imported HF
        # weights — graft them over the random init (no-op otherwise)
        from skinjax.models.text.sentence import graft_pretrained

        state = dataclasses.replace(
            state, params=graft_pretrained(state.params, tower))
    mask = trainable_mask(state.params, cfg.unfreeze_weights)
    text_mode = cfg.text_train_mode
    if text_mode is None and getattr(model, "text_input_mode", "features") == "tokens":
        # HF sentence towers follow the shared knob, BINARIZED like the
        # reference: any mode other than 'unfrozen_weights' freezes the
        # ENTIRE tower (loadImageModelClassifier.py:174-179 sets
        # requires_grad=False wholesale — 'partial'/'last_layer' modes
        # apply only to the image backbone there)
        text_mode = ("unfrozen_weights"
                     if cfg.unfreeze_weights == "unfrozen_weights"
                     else "frozen_weights")
    if text_mode and text_mode != "unfrozen_weights":
        # built-in towers land under "text_tower"; custom modules passed via
        # text_module= keep that field's auto-name in the param tree
        text_mask = trainable_mask(
            state.params, text_mode,
            frozen_prefixes=("text_tower", "text_module"),
        )
        mask = jax.tree_util.tree_map(lambda a, b: a and b, mask, text_mask)
    tx = make_optimizer(cfg.learning_rate, cfg.weight_decay, mask=mask)
    state = dataclasses.replace(state, opt_state=tx.init(state.params))
    if mesh is not None:
        from skinjax.parallel.distributed import distribute_state

        state = distribute_state(
            mesh, state, min_tp_dim=cfg.tp_min_dim,
            min_tp_conv=cfg.tp_min_conv, tp_attn=cfg.tp_attn,
            fsdp_min_size=cfg.fsdp_min_size,
        )

    # class weights ride as a call argument so the jitted step trace-caches
    # across folds (see steps.make_train_step_weighted)
    train_step = make_train_step_weighted(
        model, tx, loss_name=cfg.loss, focal_gamma=cfg.focal_gamma,
        augment=cfg.augment, image_dtype=_dtype(cfg),
        recipe=cfg.augment_recipe, trainable_mask=mask,
    )
    cw_dev = jnp.asarray(class_weights)
    eval_step = make_eval_step(model, image_dtype=_dtype(cfg))

    early = EarlyStopping(
        patience=cfg.early_stopping_patience,
        delta=cfg.early_stopping_delta,
        metric_name=cfg.early_stopping_metric,
    )
    plateau = PlateauScheduler(
        lr=cfg.learning_rate, factor=cfg.plateau_factor, patience=cfg.plateau_patience
    )
    history: Dict[str, List[float]] = {"train_loss": [], "val_loss": []}
    step_rng = jax.random.fold_in(rng, 1)

    start_epoch = 0
    if resume_dir:
        import json
        import os

        from skinjax.train.checkpoint import restore_checkpoint

        marker = os.path.join(resume_dir, "progress.json")
        legacy_marker = os.path.join(resume_dir, "epoch.txt")
        ckpt_dir = os.path.join(resume_dir, "latest")
        if os.path.exists(ckpt_dir) and (
            os.path.exists(marker) or os.path.exists(legacy_marker)
        ):
            if os.path.exists(marker):
                with open(marker) as f:
                    prog = json.load(f)
            else:
                with open(legacy_marker) as f:
                    prog = {"epoch": int(f.read().strip())}
            start_epoch = int(prog["epoch"]) + 1
            state = restore_checkpoint(ckpt_dir, state)
            # restore the best-so-far weights: without these, a resumed run
            # that never beats the pre-crash best would fall back to the
            # final-epoch state in load_best() (ADVICE r1, medium)
            best_dir = os.path.join(resume_dir, "best")
            if os.path.exists(best_dir):
                early.best_state = restore_checkpoint(best_dir, state)
            # restore scheduler/early-stopping trajectory
            plateau.lr = prog.get("plateau_lr", plateau.lr)
            plateau.best = prog.get("plateau_best", plateau.best)
            plateau.num_bad = prog.get("plateau_num_bad", plateau.num_bad)
            early.best_score = prog.get("early_best_score", early.best_score)
            early.counter = prog.get("early_counter", early.counter)
            history["train_loss"] = list(prog.get("train_loss", []))
            history["val_loss"] = list(prog.get("val_loss", []))
            print(f"[resume] continuing from epoch {start_epoch}")

    t0 = time.time()
    epoch = start_epoch
    for epoch in range(start_epoch, cfg.num_epochs):
        batches = epoch_batches(
            train_source.labels,
            num_classes,
            cfg.batch_size,
            seed=cfg.seed,
            epoch=epoch,
            weighted=cfg.weighted_sampling,
        )
        # Per-batch losses stay on device: forcing float(loss) every step
        # would block the host on the async dispatch queue and serialize
        # batch assembly with device compute. One sync per epoch instead.
        epoch_losses = []
        for bi, batch in enumerate(prefetch_batches(train_source, batches)):
            batch = put_batch(batch)
            state, loss = train_step(
                state,
                batch["image"],
                batch["metadata"],
                batch["label"],
                step_rng,
                cw_dev,
            )
            epoch_losses.append(loss)
            if tracker and cfg.log_every and (bi + 1) % cfg.log_every == 0:
                tracker.log_metric("batch_loss", float(loss), step=int(state.step))
        train_loss = (
            float(jnp.mean(jnp.stack(epoch_losses))) if epoch_losses else 0.0
        )

        metrics, _, _, _, val_loss = evaluate(
            eval_step, state, val_source, cfg.batch_size, num_classes, loss_fn,
            put_batch=put_batch,
        )
        metrics.update(
            epoch=epoch, train_loss=float(train_loss), val_loss=float(val_loss)
        )
        history["train_loss"].append(float(train_loss))
        history["val_loss"].append(float(val_loss))

        new_lr = plateau.step(val_loss)
        state = dataclasses.replace(
            state, opt_state=set_learning_rate(state.opt_state, new_lr)
        )

        if tracker:
            tracker.log_dict(
                {k: v for k, v in metrics.items() if isinstance(v, (int, float))},
                step=epoch + 1,
            )

        # Snapshot best weights as DEVICE-RESIDENT copies (jnp.copy — real
        # new buffers, so the train step's donation of the live state can't
        # invalidate them) of params + batch_stats only. The reference
        # deepcopies model.state_dict() — params+buffers, never optimizer
        # state (early_stopping.py:63) — and the old full-state host
        # device_get was the dominant e2e epoch cost on a tunneled chip
        # (~300 MB/improvement epoch; docs/DESIGN.md §5k). opt_state=None
        # here; load_best()/the resume save patch in a live opt_state.
        improved = early(
            val_loss=val_loss,
            val_bacc=float(metrics["balanced_accuracy"]),
            state=lambda s=state: dataclasses.replace(
                s,
                # step must be copied too: the live scalar is donated by the
                # next epoch's train step, and a best_state carrying a deleted
                # buffer breaks any full-tree consumer (checkpoint save,
                # device_get) after an early stop (ADVICE r4, high)
                step=jnp.copy(s.step),
                params=jax.tree_util.tree_map(jnp.copy, s.params),
                batch_stats=jax.tree_util.tree_map(jnp.copy, s.batch_stats),
                opt_state=None,
            ),
        )
        if resume_dir:
            import json
            import os

            from skinjax.train.checkpoint import save_checkpoint

            if improved:
                # the snapshot carries no opt_state (see above); persist the
                # best checkpoint with the LIVE epoch-end opt_state so the
                # on-disk tree matches the restore template
                save_checkpoint(
                    os.path.join(resume_dir, "best"),
                    dataclasses.replace(early.best_state,
                                        opt_state=state.opt_state))
            save_checkpoint(os.path.join(resume_dir, "latest"), state)
            with open(os.path.join(resume_dir, "progress.json"), "w") as f:
                json.dump({
                    "epoch": epoch,
                    "plateau_lr": plateau.lr,
                    "plateau_best": plateau.best,
                    "plateau_num_bad": plateau.num_bad,
                    "early_best_score": early.best_score,
                    "early_counter": early.counter,
                    "train_loss": history["train_loss"],
                    "val_loss": history["val_loss"],
                }, f)
        if early.early_stop:
            break

    best_state = early.load_best(state)
    if best_state is not state and best_state.opt_state is None:
        # re-attach the final live opt_state (the loop has exited, nothing
        # donates it anymore) — callers persist/restore full TrainState
        # trees, and torch-reference semantics never reload optimizer state
        best_state = dataclasses.replace(best_state, opt_state=state.opt_state)
    final_metrics, labels, preds, probs, _ = evaluate(
        eval_step, best_state, val_source, cfg.batch_size, num_classes, loss_fn,
        put_batch=put_batch,
    )
    final_metrics["fold"] = fold_num
    final_metrics["train process time"] = time.time() - t0
    final_metrics["epochs"] = epoch
    return best_state, final_metrics, {
        **history,
        "labels": labels,
        "predictions": preds,
        "probabilities": probs,
    }
