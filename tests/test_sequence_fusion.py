"""Sequence-aware fusion model + bilinear pooling + challenge writer."""

import csv

import numpy as np
import jax
import jax.numpy as jnp

from skinjax.models.fusion.sequence import BilinearPooling, SequenceFusionModel


def test_bilinear_pooling():
    m = BilinearPooling(out_dim=16, rank=8)
    x = jnp.ones((3, 32))
    y = jnp.ones((3, 24))
    v = m.init(jax.random.key(0), x, y)
    out = m.apply(v, x, y)
    assert out.shape == (3, 16)


def test_sequence_fusion_forward_and_grads():
    model = SequenceFusionModel(
        num_classes=4, num_heads=2, cnn_model_name="vit_tiny_patch16_224",
        common_dim=32, vocab_size=10, meta_tokens=2,
    )
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    meta = jnp.asarray(rng.normal(size=(2, 10)), jnp.float32)
    v = model.init(jax.random.key(0), img, meta)
    logits = model.apply(v, img, meta)
    assert logits.shape == (2, 4)

    def loss(p):
        out = model.apply({"params": p}, img, meta, train=True,
                          rngs={"dropout": jax.random.key(1)})
        return (out**2).mean()

    g = jax.grad(loss)(v["params"])
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(g))


def test_challenge_submission_writer(tmp_path):
    from skinjax.tools.challenge import write_challenge_submission

    rng = np.random.default_rng(0)
    n, C = 10, 3
    ids = [f"ISIC_{i:07d}" for i in range(n)]
    imgs = rng.normal(size=(n, 8, 8, 3)).astype(np.float32)
    feats = rng.normal(size=(n, 5)).astype(np.float32)

    def predict(im, ft):
        z = ft @ rng.normal(size=(5, C))
        e = np.exp(z - z.max(1, keepdims=True))
        return e / e.sum(1, keepdims=True)

    out = str(tmp_path / "submission.csv")
    write_challenge_submission(predict, ids, imgs, feats, ["MEL", "NV", "BCC"],
                               out, batch=4)
    with open(out) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["isic_id", "MEL", "NV", "BCC"]
    assert len(rows) == n + 1
    assert abs(sum(float(x) for x in rows[1][1:]) - 1.0) < 1e-4
