"""Jitted train/eval steps over the device mesh.

One ``train_step`` fuses, in a single XLA program per batch:
  on-device augmentation (uint8 in, so the host→HBM transfer is 4× smaller
  than shipping floats) → bf16 forward → fp32 loss → backward → Adam update.
Batches shard over the mesh's ``data`` axis; gradients are reduced by the
collectives GSPMD inserts for the replicated/TP-sharded params. There is no
hand-written pmap/psum — the sharding annotations are the parallelism.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from skinjax.data.augment import augment_batch


def _normalize_mask(trainable_mask):
    """(mask, hashable fingerprint). An all-True mask is normalized to None so
    fully-unfrozen configs trace-cache onto the maskless program."""
    if trainable_mask is None:
        return None, None
    leaves, treedef = jax.tree_util.tree_flatten(trainable_mask)
    leaves = tuple(bool(l) for l in leaves)
    if all(leaves):
        return None, None
    return trainable_mask, (str(treedef), leaves)


def _stop_frozen(params, trainable_mask):
    """stop_gradient on frozen leaves: numerically identical to the optax
    set_to_zero mask (zero updates either way), and the zeros are symbolic
    at trace time, so JAX's partial-eval drops the backward through subtrees
    whose params are all frozen — a frozen BERT tower or a frozen_weights
    backbone (loadImageModelClassifier.py:14-35) costs only its forward,
    like the reference's requires_grad=False mode. NOTE (measured,
    tests/test_frozen_backward.py): XLA's DCE already achieves the same
    elimination from the masked optimizer alone inside the fused step —
    zeros_like(updates) has no data dependence on the grads — so this is a
    trace-time *guarantee* (and a help to non-fused uses of the grads), not
    a throughput win over the mask."""
    return jax.tree_util.tree_map(
        lambda p, m: p if m else jax.lax.stop_gradient(p), params, trainable_mask
    )


def _cast_metadata(metadata, dtype):
    """Metadata may be a (B, F) float array or a pytree (token dicts, tabular
    dicts). Float leaves follow the compute dtype; integer leaves (token ids,
    categorical indices) stay integral."""

    def cast(leaf):
        leaf = jnp.asarray(leaf)
        return leaf.astype(dtype) if jnp.issubdtype(leaf.dtype, jnp.floating) else leaf

    return jax.tree_util.tree_map(cast, metadata)


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array  # scalar int32


def create_train_state(model, rng, sample_batch, tx) -> TrainState:
    variables = model.init(
        rng,
        jnp.zeros_like(sample_batch["image"], dtype=jnp.float32),
        jax.tree_util.tree_map(jnp.asarray, sample_batch["metadata"]),
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.asarray(0, jnp.int32),
    )


# Cross-fold trace cache: a k-fold sweep builds an identical (model, tx,
# loss, augment, dtype) program per fold; re-tracing it costs 10-40s each.
# Keyed on the *objects* — linen Modules hash by config fields, and
# make_optimizer memoizes tx by hyperparams — so equal configs share one
# jitted step. Falls back to uncached for unhashable pieces (e.g. HF towers).
_TRAIN_STEP_CACHE: Dict = {}
_EVAL_STEP_CACHE: Dict = {}


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_fn: Callable,
    augment: bool = True,
    image_dtype=jnp.bfloat16,
    recipe: str = "default",
    trainable_mask=None,
) -> Callable:
    """Returns jitted (state, image_u8, metadata, label, rng) -> (state, loss).

    ``recipe='sentence'`` applies the heavier sentence-dataset augmentation
    (data/augment.py SENTENCE_CFG, skinLesionDatasetsWithBert.py:84-110).
    ``trainable_mask`` (the optimizer's freeze mask) additionally
    stop-gradients frozen leaves so fully-frozen towers skip their backward
    (see _stop_frozen)."""
    trainable_mask, mask_fp = _normalize_mask(trainable_mask)
    try:
        key = (model, tx, loss_fn, augment, jnp.dtype(image_dtype).name,
               recipe, mask_fp)
        cached = _TRAIN_STEP_CACHE.get(key)
        if cached is not None:
            return cached
    except TypeError:
        key = None

    def step(state: TrainState, image_u8, metadata, label, rng):
        aug_rng, dropout_rng = jax.random.split(jax.random.fold_in(rng, state.step))
        image = augment_batch(image_u8, aug_rng, train=augment,
                              out_dtype=image_dtype, recipe=recipe)
        metadata = _cast_metadata(metadata, image_dtype)

        def loss_of(params):
            if trainable_mask is not None:
                params = _stop_frozen(params, trainable_mask)
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            out, mutated = model.apply(
                variables,
                image,
                metadata,
                train=True,
                rngs={"dropout": dropout_rng},
                mutable=["batch_stats"] if state.batch_stats else [],
            )
            loss = loss_fn(out.astype(jnp.float32), label)
            return loss, mutated.get("batch_stats", state.batch_stats)

        (loss, new_stats), grads = jax.value_and_grad(loss_of, has_aux=True)(
            state.params
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt_state,
                step=state.step + 1,
            ),
            loss,
        )

    jitted = jax.jit(step, donate_argnums=(0,))
    if key is not None:
        _TRAIN_STEP_CACHE[key] = jitted
    return jitted


def make_train_step_weighted(
    model,
    tx: optax.GradientTransformation,
    loss_name: str = "weighted_ce",
    focal_gamma: float = 2.0,
    augment: bool = True,
    image_dtype=jnp.bfloat16,
    recipe: str = "default",
    trainable_mask=None,
) -> Callable:
    """Trace-cacheable train step: class weights are a CALL argument, so folds
    with different class distributions share one compiled program.

    Returns jitted (state, image_u8, metadata, label, rng, class_weights)
    -> (state, loss). ``trainable_mask`` stop-gradients frozen leaves so
    fully-frozen towers skip their backward (see _stop_frozen)."""
    from skinjax.train.losses import weighted_loss

    wloss = weighted_loss(loss_name, focal_gamma)
    trainable_mask, mask_fp = _normalize_mask(trainable_mask)
    try:
        key = ("w", model, tx, loss_name, focal_gamma, augment,
               jnp.dtype(image_dtype).name, recipe, mask_fp)
        cached = _TRAIN_STEP_CACHE.get(key)
        if cached is not None:
            return cached
    except TypeError:
        key = None

    def step(state: TrainState, image_u8, metadata, label, rng, class_weights):
        aug_rng, dropout_rng = jax.random.split(jax.random.fold_in(rng, state.step))
        image = augment_batch(image_u8, aug_rng, train=augment,
                              out_dtype=image_dtype, recipe=recipe)
        metadata = _cast_metadata(metadata, image_dtype)

        def loss_of(params):
            if trainable_mask is not None:
                params = _stop_frozen(params, trainable_mask)
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            out, mutated = model.apply(
                variables,
                image,
                metadata,
                train=True,
                rngs={"dropout": dropout_rng},
                mutable=["batch_stats"] if state.batch_stats else [],
            )
            loss = wloss(out.astype(jnp.float32), label, class_weights)
            return loss, mutated.get("batch_stats", state.batch_stats)

        (loss, new_stats), grads = jax.value_and_grad(loss_of, has_aux=True)(
            state.params
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt_state,
                step=state.step + 1,
            ),
            loss,
        )

    jitted = jax.jit(step, donate_argnums=(0,))
    if key is not None:
        _TRAIN_STEP_CACHE[key] = jitted
    return jitted


def make_eval_step(model, image_dtype=jnp.bfloat16) -> Callable:
    """Returns jitted (state, image_u8, metadata) -> logits (fp32)."""
    try:
        key = (model, jnp.dtype(image_dtype).name)
        cached = _EVAL_STEP_CACHE.get(key)
        if cached is not None:
            return cached
    except TypeError:
        key = None

    def step(state: TrainState, image_u8, metadata):
        image = augment_batch(
            image_u8, jax.random.key(0), train=False, out_dtype=image_dtype
        )
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        logits = model.apply(variables, image, _cast_metadata(metadata, image_dtype))
        return logits.astype(jnp.float32)

    jitted = jax.jit(step)
    if key is not None:
        _EVAL_STEP_CACHE[key] = jitted
    return jitted


def make_loss_eval_step(model, loss_fn, image_dtype=jnp.bfloat16) -> Callable:
    """Returns jitted (state, image_u8, metadata, label) -> (loss, logits)."""

    def step(state: TrainState, image_u8, metadata, label):
        image = augment_batch(
            image_u8, jax.random.key(0), train=False, out_dtype=image_dtype
        )
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        logits = model.apply(variables, image, _cast_metadata(metadata, image_dtype))
        logits = logits.astype(jnp.float32)
        return loss_fn(logits, label), logits

    return jax.jit(step)
