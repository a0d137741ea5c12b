"""SKINJAX_REMAT=block: the rematerialized ResNet path is numerics- and
tree-identical to the default — only the backward-pass schedule changes
(block activations recomputed instead of stored; docs/DESIGN.md §5)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from skinjax.models.backbones import resnet as resnet_mod


def _loss(model, variables, x):
    feats = model.apply(
        variables, x, train=True, mutable=["batch_stats"],
    )[0]
    return (feats.astype(jnp.float32) ** 2).mean()


def test_remat_block_matches_default(monkeypatch):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)

    monkeypatch.setattr(resnet_mod, "_REMAT", "")
    plain = resnet_mod.ResNet(stage_sizes=(2, 2, 2, 2), block="basic")
    v_plain = plain.init(jax.random.key(0), x, train=False)
    g_plain = jax.grad(lambda v: _loss(plain, v, x))(v_plain)

    monkeypatch.setattr(resnet_mod, "_REMAT", "block")
    remat = resnet_mod.ResNet(stage_sizes=(2, 2, 2, 2), block="basic")
    v_remat = remat.init(jax.random.key(0), x, train=False)

    # identical variable trees (checkpoints/importers unaffected)
    assert jax.tree_util.tree_structure(v_plain) == jax.tree_util.tree_structure(
        v_remat
    )
    chex_same = jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        v_plain,
        v_remat,
    )
    del chex_same

    # forward + gradients bit-match on CPU (remat recomputes the same ops)
    y_plain = plain.apply(v_plain, x, train=True, mutable=["batch_stats"])[0]
    y_remat = remat.apply(v_remat, x, train=True, mutable=["batch_stats"])[0]
    np.testing.assert_allclose(np.asarray(y_plain), np.asarray(y_remat), atol=1e-6)

    g_remat = jax.grad(lambda v: _loss(remat, v, x))(v_remat)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        ),
        g_plain,
        g_remat,
    )

    # eval path is untouched by the flag
    e_plain = plain.apply(v_plain, x, train=False)
    e_remat = remat.apply(v_remat, x, train=False)
    np.testing.assert_allclose(np.asarray(e_plain), np.asarray(e_remat), atol=1e-6)


def test_remat_trains(monkeypatch):
    monkeypatch.setattr(resnet_mod, "_REMAT", "block")
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 32, 32, 3)), jnp.float32)
    model = resnet_mod.ResNet(stage_sizes=(2, 2, 2, 2), block="basic")
    variables = model.init(jax.random.key(0), x, train=False)
    params = variables["params"]
    stats = variables["batch_stats"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, stats, opt_state):
        def loss_fn(p):
            feats, mut = model.apply(
                {"params": p, "batch_stats": stats}, x, train=True,
                mutable=["batch_stats"],
            )
            return (feats.astype(jnp.float32) ** 2).mean(), mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state, loss

    losses = []
    for _ in range(3):
        params, stats, opt_state, loss = step(params, stats, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
