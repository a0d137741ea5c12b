"""Loss library: weighted CE, focal, soft-target CE (jnp, fp32 accumulation).

Parity contracts:
  * weighted cross-entropy == torch ``nn.CrossEntropyLoss(weight=w)`` —
    including torch's weighted-mean reduction (sum(w_i * ce_i) / sum(w_i)),
    the loss used by the canonical trainer (train_pad_20.py:52).
  * focal loss == models/focalLoss.py:13-26 (alpha gathered per target,
    (1-pt)^gamma scaling, mean/sum/none reductions).
  * soft-target CE == models/softtargetsCrossEntropy.py:10-22.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _log_softmax(logits: jax.Array) -> jax.Array:
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)


def cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    class_weights: Optional[jax.Array] = None,
) -> jax.Array:
    """Mean CE over the batch; with class weights uses torch's weighted mean."""
    logp = _log_softmax(logits)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=-1)[:, 0]
    if class_weights is None:
        return nll.mean()
    w = class_weights.astype(jnp.float32)[labels]
    return (w * nll).sum() / jnp.maximum(w.sum(), 1e-12)


def focal_loss(
    logits: jax.Array,
    labels: jax.Array,
    alpha: Optional[jax.Array] = None,
    gamma: float = 2.0,
    reduction: str = "mean",
) -> jax.Array:
    logp = _log_softmax(logits)
    ce = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=-1)[:, 0]
    pt = jnp.exp(-ce)
    if alpha is not None:
        ce = alpha.astype(jnp.float32)[labels] * ce
    loss = (1.0 - pt) ** gamma * ce
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    return loss


def soft_target_cross_entropy(
    logits: jax.Array,
    soft_targets: jax.Array,
    class_weights: Optional[jax.Array] = None,
) -> jax.Array:
    logp = _log_softmax(logits)
    t = soft_targets.astype(jnp.float32)
    if class_weights is not None:
        logp = logp * class_weights.astype(jnp.float32)[None, :]
    return -(t * logp).sum(axis=-1).mean()


def weighted_loss(name: str, gamma: float = 2.0):
    """Loss with class weights as a CALL argument (not a closure) — lets the
    jitted train step be trace-cached across CV folds whose class weights
    differ. Returned fns are memoized so equal (name, gamma) give the same
    object (a stable jit-cache key)."""
    key = (name, gamma)
    fn = _WEIGHTED_CACHE.get(key)
    if fn is not None:
        return fn
    if name in ("cross_entropy", "ce", "weighted_ce"):
        fn = lambda logits, labels, w: cross_entropy(logits, labels, w)
    elif name in ("focal", "focal_loss"):
        fn = lambda logits, labels, w: focal_loss(logits, labels, w, gamma)
    elif name in ("soft_target", "soft_target_ce"):
        fn = lambda logits, targets, w: soft_target_cross_entropy(logits, targets, w)
    else:
        raise ValueError(f"unknown loss '{name}'")
    _WEIGHTED_CACHE[key] = fn
    return fn


_WEIGHTED_CACHE: dict = {}


def make_loss_fn(name: str, class_weights=None, gamma: float = 2.0):
    """Loss factory keyed by the reference's config strings."""
    cw = None if class_weights is None else jnp.asarray(class_weights)
    if name in ("cross_entropy", "ce", "weighted_ce"):
        return lambda logits, labels: cross_entropy(logits, labels, cw)
    if name in ("focal", "focal_loss"):
        return lambda logits, labels: focal_loss(logits, labels, cw, gamma)
    if name in ("soft_target", "soft_target_ce"):
        return lambda logits, targets: soft_target_cross_entropy(logits, targets, cw)
    raise ValueError(f"unknown loss '{name}'")
