"""Shape/differentiability smoke tests for every fusion mechanism and baseline."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from skinjax.models import MECHANISMS, MultimodalModel, create_model

B, H, W, VOCAB, NCLS = 2, 32, 32, 11, 6


def _inputs():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(B, H, W, 3)), jnp.float32)
    meta = jnp.asarray(rng.normal(size=(B, VOCAB)), jnp.float32)
    return img, meta


@pytest.mark.parametrize("mech", MECHANISMS)
def test_all_mechanisms_forward(mech):
    model = MultimodalModel(
        num_classes=NCLS,
        num_heads=4,
        cnn_model_name="custom-cnn",
        common_dim=32,
        text_encoder_dim_output=32,
        vocab_size=VOCAB,
        attention_mechanism=mech,
    )
    img, meta = _inputs()
    variables = model.init(jax.random.key(0), img, meta)
    logits = model.apply(variables, img, meta)
    assert logits.shape == (B, NCLS)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.parametrize("mech", MECHANISMS)
def test_mechanism_grads_flow(mech):
    model = MultimodalModel(
        num_classes=NCLS, num_heads=4, cnn_model_name="custom-cnn",
        common_dim=32, text_encoder_dim_output=32, vocab_size=VOCAB,
        attention_mechanism=mech,
    )
    img, meta = _inputs()
    variables = model.init(jax.random.key(0), img, meta)

    def loss(params):
        out = model.apply(
            {**variables, "params": params}, img, meta, train=True,
            rngs={"dropout": jax.random.key(1)},
        )
        return (out**2).mean()

    grads = jax.grad(loss)(variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # the head and (when used) the metadata tower must receive gradient
    total = sum(float(jnp.abs(g).sum()) for g in flat)
    assert total > 0
    if mech not in ("no-metadata", "no-metadata-without-mlp"):
        txt_g = sum(
            float(jnp.abs(g).sum())
            for p, g in jax.tree_util.tree_leaves_with_path(grads)
            if "text_tower" in jax.tree_util.keystr(p)
        )
        assert txt_g > 0, f"metadata tower got zero gradient under {mech}"


def test_capture_returns_features():
    model = MultimodalModel(
        num_classes=NCLS, num_heads=4, cnn_model_name="resnet-18",
        common_dim=32, vocab_size=VOCAB, attention_mechanism="concatenation",
    )
    img, meta = _inputs()
    variables = model.init(jax.random.key(0), img, meta)
    logits, aux = model.apply(variables, img, meta, capture=True)
    assert "feature_map" in aux and aux["feature_map"].ndim == 4
    assert logits.shape == (B, NCLS)


@pytest.mark.parametrize("name", ["mdnet", "metanet"])
def test_baselines_forward(name):
    model = create_model(
        num_classes=NCLS, model_name=name,
        cnn_model_name="resnet-18" if name == "metanet" else "densenet169",
        vocab_size=VOCAB,
    )
    img, meta = _inputs()
    variables = model.init(jax.random.key(0), img, meta)
    logits = model.apply(variables, img, meta)
    assert logits.shape == (B, NCLS)


def test_liwterm_forward():
    model = create_model(
        num_classes=NCLS, model_name="liwterm",
        cnn_model_name="vit_tiny_patch16_224", vocab_size=VOCAB,
    )
    img, meta = _inputs()
    variables = model.init(jax.random.key(0), img, meta)
    logits = model.apply(variables, img, meta)
    assert logits.shape == (B, NCLS)
