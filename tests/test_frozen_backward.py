"""Frozen-tower backward elimination (steps._stop_frozen).

The reference freezes towers by setting requires_grad=False
(loadImageModelClassifier.py:14-35 for the backbone; loadTextModelEncoder's
train_mode="frozen_weights" default for BERT/GPT-2 text towers), which makes
torch skip the frozen backward entirely. skinjax gets the same elimination
through TWO stacked mechanisms, pinned here:
  1. the optax set_to_zero mask alone already kills the frozen backward
     inside the fused train step — zeros_like(updates) has no data
     dependence on the grads, so XLA's DCE removes their producers
     (measured: identical HLO with and without stop_gradient);
  2. passing the mask as ``trainable_mask`` additionally stop-gradients
     frozen leaves, making the elimination a trace-time *guarantee*
     (symbolic zeros in JAX's partial eval) instead of a compiler
     optimization — with identical numerics.
"""

import numpy as np
import jax
import jax.numpy as jnp

from skinjax.data import synthetic_source
from skinjax.models import MultimodalModel
from skinjax.train import make_loss_fn, make_optimizer, trainable_mask
from skinjax.train.steps import create_train_state, make_train_step

NCLS = 4


def _setup(mode):
    model = MultimodalModel(
        num_classes=NCLS, num_heads=4, cnn_model_name="custom-cnn",
        common_dim=32, text_encoder_dim_output=32, vocab_size=16,
        attention_mechanism="concatenation",
    )
    src = synthetic_source(n=8, image_size=(32, 32), feature_dim=16,
                           num_classes=NCLS)
    batch = src.batch(np.arange(8))
    probe_tx = make_optimizer(1e-3)
    state = create_train_state(model, jax.random.key(0), batch, probe_tx)
    mask = trainable_mask(state.params, mode)
    tx = make_optimizer(1e-3, mask=mask)
    import dataclasses
    state = dataclasses.replace(state, opt_state=tx.init(state.params))
    return model, batch, tx, state, mask


def _run(step, state, batch):
    # steps donate the input state: run on a fresh copy so the caller's
    # state stays alive for the next variant
    state = jax.tree_util.tree_map(lambda a: jnp.array(a), state)
    s, loss = step(
        state,
        jnp.asarray(batch["image"]),
        jnp.asarray(batch["metadata"]),
        jnp.asarray(batch["label"]),
        jax.random.key(3),
    )
    return s, float(loss)


def test_stop_gradient_matches_masked_optimizer():
    """frozen_weights: updates identical with and without stop_gradient."""
    model, batch, tx, state, mask = _setup("frozen_weights")
    loss_fn = make_loss_fn("ce")
    step_ref = make_train_step(model, tx, loss_fn, augment=False,
                               image_dtype=jnp.float32)
    step_sg = make_train_step(model, tx, loss_fn, augment=False,
                              image_dtype=jnp.float32, trainable_mask=mask)
    s_ref, loss_ref = _run(step_ref, state, batch)
    s_sg, loss_sg = _run(step_sg, state, batch)
    assert loss_ref == loss_sg
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        s_ref.params, s_sg.params,
    )
    # frozen backbone params unchanged; heads did move
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        s_sg.params["image_encoder"], state.params["image_encoder"],
    )
    assert not np.array_equal(
        np.asarray(s_sg.params["fc_fusion"]["fc1"]["kernel"]),
        np.asarray(state.params["fc_fusion"]["fc1"]["kernel"]),
    )


def test_partial_mode_matches_masked_optimizer():
    model, batch, tx, state, mask = _setup("partial")
    loss_fn = make_loss_fn("ce")
    step_ref = make_train_step(model, tx, loss_fn, augment=False,
                               image_dtype=jnp.float32)
    step_sg = make_train_step(model, tx, loss_fn, augment=False,
                              image_dtype=jnp.float32, trainable_mask=mask)
    s_ref, loss_ref = _run(step_ref, state, batch)
    s_sg, loss_sg = _run(step_sg, state, batch)
    assert loss_ref == loss_sg
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        s_ref.params, s_sg.params,
    )


def test_all_true_mask_normalizes_to_maskless_program():
    """An unfrozen mask must hit the same trace-cache entry as mask=None."""
    model, batch, tx, state, mask = _setup("unfrozen_weights")
    loss_fn = make_loss_fn("ce")
    step_none = make_train_step(model, tx, loss_fn, augment=False,
                                image_dtype=jnp.float32)
    step_mask = make_train_step(model, tx, loss_fn, augment=False,
                                image_dtype=jnp.float32, trainable_mask=mask)
    assert step_none is step_mask


def test_frozen_backbone_drops_backward_flops():
    """Frozen-backbone programs must cost measurably fewer FLOPs than the
    unfrozen one, identically via DCE (masked tx alone) and via the
    stop_gradient guarantee."""
    model, batch, tx_frozen, state_frozen, mask = _setup("frozen_weights")
    _, _, tx_full, state_full, _ = _setup("unfrozen_weights")
    loss_fn = make_loss_fn("ce")

    def lower_flops(tx, state, trainable_mask):
        step = make_train_step(model, tx, loss_fn, augment=False,
                               image_dtype=jnp.float32,
                               trainable_mask=trainable_mask)
        lowered = step.lower(
            state,
            jnp.asarray(batch["image"]),
            jnp.asarray(batch["metadata"]),
            jnp.asarray(batch["label"]),
            jax.random.key(3),
        )
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))

    full = lower_flops(tx_full, state_full, None)
    frozen_dce = lower_flops(tx_frozen, state_frozen, None)
    frozen_sg = lower_flops(tx_frozen, state_frozen, mask)
    assert full > 0 and frozen_dce > 0
    # the backbone backward (dW + dx) disappears from both frozen programs
    assert frozen_dce < 0.9 * full, (full, frozen_dce)
    # and stop_gradient adds no cost over what DCE already removed
    assert frozen_sg == frozen_dce, (frozen_sg, frozen_dce)
