"""Optimizer + LR schedule + freeze policy.

Rebuilds the reference's training recipe (train_pad_20.py:52-61): Adam
(lr 5e-5, torch-style L2 weight decay 1e-4) with ReduceLROnPlateau
(factor 0.1, patience 2, min mode) — the plateau logic runs host-side at
epoch boundaries exactly like torch's scheduler and writes the new LR into
the optimizer via ``optax.inject_hyperparams``.

Freeze policy mirrors loadModels.set_backbone_train_mode
(loadImageModelClassifier.py:14-35): frozen_weights / unfrozen_weights /
last_layer_unfrozen_weights / partial, implemented as an optax mask over the
param tree (frozen leaves get set_to_zero) — BatchNorm statistics still
update in train mode, matching torch's behaviour for frozen backbones.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import optax

# last-stage name markers per backbone family, used by "partial" mode
LAST_STAGE_MARKERS = (
    "layer4",      # resnet
    "block{last}", # resolved dynamically
    "trans2",      # densenet tail
    "norm_final",
    "head",        # mobilenet/efficientnet head conv
    "block11",     # vit_base last block
    "block23",     # vit_large last block
)


def trainable_mask(params, mode: str, frozen_prefixes: Sequence[str] = ("image_encoder",)):
    """Boolean pytree: True = trainable. ``mode`` applies to the prefixes
    (the backbone); everything outside them is always trainable."""

    def path_str(path):
        return "/".join(
            p.key if hasattr(p, "key") else str(p) for p in path
        )

    def insertion_order_paths(tree, prefix=""):
        """Leaf paths in dict-insertion order == module creation order (the
        torch parameter-order analogue; jax tree_flatten sorts keys, which
        would misidentify the 'last' layer)."""
        out = []
        if isinstance(tree, dict):
            for k, v in tree.items():
                out.extend(insertion_order_paths(v, f"{prefix}{k}/"))
        else:
            out.append(prefix.rstrip("/"))
        return out

    last_module = None
    if mode == "last_layer_unfrozen_weights":
        ordered = [
            p for p in insertion_order_paths(params)
            if any(p.startswith(fp) for fp in frozen_prefixes)
        ]
        if ordered:
            # the reference unfreezes params[-2:] (weight+bias of the final
            # layer, loadImageModelClassifier.py:28-33) — unfreeze the module
            # owning the last created leaf
            last_module = ordered[-1].rsplit("/", 1)[0]

    def leaf_mask(path, leaf):
        s = path_str(path)
        inside = any(s.startswith(fp) for fp in frozen_prefixes)
        if not inside:
            return True
        if mode == "unfrozen_weights":
            return True
        if mode == "frozen_weights":
            return False
        if mode == "last_layer_unfrozen_weights":
            return last_module is not None and s.startswith(last_module)
        if mode == "partial":
            return any(m in s for m in LAST_STAGE_MARKERS if "{" not in m)
        raise ValueError(f"Invalid backbone_train_mode: {mode}")

    return jax.tree_util.tree_map_with_path(leaf_mask, params)


_TX_CACHE: dict = {}


def make_optimizer(
    learning_rate: float = 5e-5,
    weight_decay: float = 1e-4,
    mask=None,
) -> optax.GradientTransformation:
    """torch-Adam-with-weight-decay (L2 added to grads before moments) with an
    injectable learning rate; optionally masked for frozen params.

    Memoized by (lr, wd, mask fingerprint): equal configs return the SAME
    transformation object, so jitted steps keyed on it trace-cache across
    CV folds/sweep cells."""
    if mask is None:
        fp = None
    else:
        leaves, treedef = jax.tree_util.tree_flatten(mask)
        fp = (str(treedef), tuple(bool(l) for l in leaves))
    cache_key = (learning_rate, weight_decay, fp)
    cached = _TX_CACHE.get(cache_key)
    if cached is not None:
        return cached

    def base(learning_rate):
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.adam(learning_rate),
        )

    tx = optax.inject_hyperparams(base)(learning_rate=learning_rate)
    if mask is not None:
        labels = jax.tree_util.tree_map(
            lambda m: "trainable" if m else "frozen", mask
        )
        tx = optax.multi_transform(
            {"trainable": tx, "frozen": optax.set_to_zero()}, labels
        )
    _TX_CACHE[cache_key] = tx
    return tx


def set_learning_rate(opt_state, lr: float):
    """Return opt_state with a new LR written into every inject_hyperparams
    node (plateau updates happen host-side at epoch boundaries)."""
    import jax.numpy as jnp

    def rewrite(s):
        if hasattr(s, "hyperparams") and "learning_rate" in s.hyperparams:
            hp = dict(s.hyperparams)
            hp["learning_rate"] = jnp.asarray(
                lr, dtype=jnp.asarray(hp["learning_rate"]).dtype
            )
            return s._replace(hyperparams=hp)
        if hasattr(s, "_fields"):  # namedtuple states (e.g. multi_transform)
            return type(s)(*(rewrite(getattr(s, f)) for f in s._fields))
        if isinstance(s, tuple):
            return tuple(rewrite(x) for x in s)
        if isinstance(s, dict):
            return {k: rewrite(v) for k, v in s.items()}
        return s

    return rewrite(opt_state)


@dataclasses.dataclass
class PlateauScheduler:
    """torch ReduceLROnPlateau(min) parity (train_pad_20.py:55-61):
    if val metric fails to improve for ``patience`` epochs, lr *= factor."""

    lr: float
    factor: float = 0.1
    patience: int = 2
    min_lr: float = 0.0
    threshold: float = 1e-4  # torch default (rel mode) — improvement margin
    best: Optional[float] = None
    num_bad: int = 0

    def step(self, value: float) -> float:
        if self.best is None or value < self.best * (1 - self.threshold):
            self.best = value
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad = 0
        return self.lr
