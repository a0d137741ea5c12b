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


def test_remat_block_vit_beit_matches_default(monkeypatch):
    """The transformer families honor the same flag: tree-identical params,
    matching forward + gradients (beitv2_large OOMs above B=32 on a v5e
    without it — DESIGN §5h)."""
    from skinjax.models.backbones import beit as beit_mod
    from skinjax.models.backbones import vit as vit_mod

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)

    for mod, make in (
        (vit_mod, lambda: vit_mod.ViT(dim=32, depth=2, num_heads=4, patch=8)),
        (beit_mod, lambda: beit_mod.Beit(dim=32, depth=2, num_heads=4,
                                         patch=8, layerscale_init=1e-5)),
    ):
        monkeypatch.setattr(mod, "_REMAT", "")
        plain = make()
        v = plain.init(jax.random.key(0), x)

        monkeypatch.setattr(mod, "_REMAT", "block")
        remat = make()
        v_r = remat.init(jax.random.key(0), x)
        assert (jax.tree_util.tree_structure(v)
                == jax.tree_util.tree_structure(v_r))

        def loss(variables, m):
            return (m.apply(variables, x, train=True).astype(jnp.float32)
                    ** 2).mean()

        y_p = plain.apply(v, x, train=True)
        y_r = remat.apply(v_r, x, train=True)
        np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_r),
                                   atol=1e-6)
        g_p = jax.grad(loss)(v, plain)
        g_r = jax.grad(loss)(v_r, remat)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5),
            g_p, g_r,
        )


def test_remat_block_bert_matches_default(monkeypatch):
    """The native BERT tower honors SKINJAX_REMAT=block for unfrozen
    sentence training (T=512 / large batch): tree-identical params,
    matching forward + gradients (models/text/bert.py)."""
    from skinjax.models.text import bert as bert_mod

    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(0, 97, (2, 12)), jnp.int32)
    mask = jnp.ones((2, 12), jnp.int32).at[1, 7:].set(0)

    def make():
        return bert_mod.NativeBertEncoder(
            vocab_size=97, hidden_size=32, num_layers=2, num_heads=2,
            intermediate_size=64, max_position_embeddings=48,
            hidden_dropout=0.0, attention_dropout=0.0)

    monkeypatch.setattr(bert_mod, "_REMAT", "")
    plain = make()
    v = plain.init(jax.random.key(0), ids, mask)

    monkeypatch.setattr(bert_mod, "_REMAT", "block")
    remat = make()
    v_r = remat.init(jax.random.key(0), ids, mask)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v_r))

    def loss(variables, m):
        out = m.apply(variables, ids, mask, deterministic=False,
                      rngs={"dropout": jax.random.key(1)})
        return (out.astype(jnp.float32) ** 2).mean()

    y_p = plain.apply(v, ids, mask, deterministic=False,
                      rngs={"dropout": jax.random.key(1)})
    y_r = remat.apply(v_r, ids, mask, deterministic=False,
                      rngs={"dropout": jax.random.key(1)})
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_r), atol=1e-6)
    g_p = jax.grad(loss)(v, plain)
    g_r = jax.grad(loss)(v_r, remat)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5),
        g_p, g_r,
    )
