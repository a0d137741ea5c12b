"""NativeGPT2Encoder vs transformers FlaxGPT2Model: param-tree identity,
last-hidden-state parity (XLA and Pallas-kernel attention paths), masked
inputs, the reference's last-token pooling, training-mode gradient flow,
and the build_sentence_tower factory + pretrained grafting."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from skinjax.models.text.gpt2 import (
    NativeGPT2Encoder,
    config_from_hf_gpt2,
    import_hf_gpt2_params,
)


@pytest.fixture(scope="module")
def small():
    from transformers import FlaxGPT2Model, GPT2Config

    cfg = GPT2Config(
        vocab_size=97, n_embd=32, n_layer=2, n_head=2, n_positions=48,
    )
    hf = FlaxGPT2Model(cfg, seed=0)
    native = NativeGPT2Encoder(**config_from_hf_gpt2(cfg))
    return cfg, hf, native


def _batch(B=3, T=12, vocab=97, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, vocab, (B, T)).astype(np.int32)
    mask = np.ones((B, T), np.int32)
    mask[1, 7:] = 0  # right-padded samples (GPT-2 pad = eos, tokenize.py)
    mask[2, 3:] = 0
    return jnp.asarray(ids), jnp.asarray(mask)


def test_param_tree_identity(small):
    cfg, hf, native = small
    ids, mask = _batch()
    nat_params = native.init(jax.random.key(0), ids, mask)["params"]
    nat_paths = {jax.tree_util.keystr(kp): v.shape for kp, v in
                 jax.tree_util.tree_leaves_with_path(nat_params)}
    hf_paths = {jax.tree_util.keystr(kp): v.shape for kp, v in
                jax.tree_util.tree_leaves_with_path(hf.params)}
    assert nat_paths == hf_paths


@pytest.mark.parametrize("env", ["", "pallas"])
def test_last_hidden_parity(small, monkeypatch, env):
    cfg, hf, native = small
    monkeypatch.setenv("SKINJAX_GLOBATTN", env)
    ids, mask = _batch()
    want = np.asarray(hf(input_ids=ids, attention_mask=mask)
                      .last_hidden_state)
    got = np.asarray(native.apply(
        {"params": import_hf_gpt2_params(hf.params)}, ids, mask))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_no_mask_parity(small):
    cfg, hf, native = small
    ids, _ = _batch()
    want = np.asarray(hf(input_ids=ids).last_hidden_state)
    got = np.asarray(native.apply(
        {"params": import_hf_gpt2_params(hf.params)}, ids))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_causality(small):
    """Position t's output must not depend on tokens > t (the property the
    additive causal bias encodes)."""
    cfg, hf, native = small
    ids, _ = _batch()
    params = {"params": import_hf_gpt2_params(hf.params)}
    base = np.asarray(native.apply(params, ids))
    ids2 = ids.at[:, -1].set((ids[:, -1] + 1) % 97)
    pert = np.asarray(native.apply(params, ids2))
    np.testing.assert_allclose(pert[:, :-1], base[:, :-1], atol=1e-6)
    assert np.abs(pert[:, -1] - base[:, -1]).max() > 1e-4


def test_tower_last_token_pooling(small):
    """The reference pools GPT-2 at the RAW last position
    (multimodalIntraModalWithBert.py:91: last_hidden_state[:, -1, :])."""
    from skinjax.models.text.bert import NativeSentenceTower

    cfg, hf, native = small
    ids, mask = _batch()
    tower = NativeSentenceTower(encoder=native, pool="last",
                                scope_name="gpt2")
    params = {"params": {"gpt2": import_hf_gpt2_params(hf.params)}}
    got = np.asarray(tower.apply(params, ids, mask))
    want = np.asarray(hf(input_ids=ids, attention_mask=mask)
                      .last_hidden_state)[:, -1, :]
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_training_grads_flow(small):
    cfg, hf, native = small
    ids, mask = _batch()
    params = native.init(jax.random.key(0), ids, mask)["params"]

    def loss(p, key):
        y = native.apply({"params": p}, ids, mask, deterministic=False,
                         rngs={"dropout": key})
        return jnp.mean(y ** 2)

    g = jax.grad(loss)(params, jax.random.key(1))
    norms = [float(jnp.linalg.norm(l)) for l in jax.tree_util.tree_leaves(g)]
    assert all(np.isfinite(n) for n in norms)
    assert sum(n > 0 for n in norms) > len(norms) * 0.9


def test_hf_wrapper_pool_last(small):
    """HFSentenceTower(pool='last') matches the reference GPT-2 read-out."""
    from skinjax.models.text.sentence import HFSentenceTower

    cfg, hf, native = small
    ids, mask = _batch()
    tower = HFSentenceTower(hf_module=hf, pool="last")
    v = tower.init(jax.random.key(0), ids, mask)
    got = np.asarray(tower.apply(v, ids, mask))
    want = np.asarray(hf(input_ids=ids, attention_mask=mask)
                      .last_hidden_state)[:, -1, :]
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_build_sentence_tower_factory(small, recwarn):
    """Factory: gpt2 name -> native tower, pool='last', scope 'gpt2';
    random-init fallback (zero egress) sets pretrained_params=None and
    graft_pretrained is a no-op."""
    from skinjax.models.text.bert import NativeSentenceTower
    from skinjax.models.text.sentence import (
        build_sentence_tower, graft_pretrained)

    tower = build_sentence_tower("gpt2")
    assert isinstance(tower, NativeSentenceTower)
    assert tower.pool == "last" and tower.scope_name == "gpt2"
    assert tower.encoder.vocab_size == 50257
    assert tower.pretrained_params is None  # no weights in this container
    p = {"params": {"text_module": {"gpt2": {"x": jnp.zeros((1,))}}}}
    assert graft_pretrained(p, tower) is p

    btower = build_sentence_tower("bert-base-uncased")
    assert btower.pool == "cls" and btower.scope_name == "bert"


def test_graft_pretrained_places_weights(small):
    """graft_pretrained swaps the encoder subtree of an init tree for the
    imported HF weights, leaving the rest untouched."""
    from skinjax.models.text.bert import NativeSentenceTower
    from skinjax.models.text.sentence import graft_pretrained

    cfg, hf, native = small
    ids, mask = _batch()
    tower = NativeSentenceTower(encoder=native, pool="last",
                                scope_name="gpt2", out_dim=8)
    object.__setattr__(tower, "pretrained_params",
                       import_hf_gpt2_params(hf.params))
    init = tower.init(jax.random.key(3), ids, mask)["params"]
    grafted = graft_pretrained(init, tower)
    got = np.asarray(
        grafted["gpt2"]["wte"]["embedding"])
    np.testing.assert_array_equal(got, np.asarray(hf.params["wte"]["embedding"]))
    # non-encoder leaves untouched
    np.testing.assert_array_equal(np.asarray(grafted["proj"]["kernel"]),
                                  np.asarray(init["proj"]["kernel"]))


def test_training_dropout_kernel_matches_xla(small, monkeypatch):
    """TRAIN-mode (attn_pdrop ACTIVE) forward: kernel path feeds HF's
    broadcast (1, 1, T, T) bernoulli draw in as a multiplicative operand,
    same "dropout" stream as the XLA branch — identical rngs, identical
    outputs (models/text/gpt2.py _GPT2Attention; the BERT twin is
    tests/test_native_bert.py)."""
    cfg, hf, native = small
    ids, mask = _batch()
    params = {"params": import_hf_gpt2_params(hf.params)}
    outs = {}
    for env in ["", "pallas"]:
        monkeypatch.setenv("SKINJAX_GLOBATTN", env)
        outs[env] = np.asarray(native.apply(
            params, ids, mask, deterministic=False,
            rngs={"dropout": jax.random.key(7)}))
    assert not np.allclose(
        outs["pallas"],
        np.asarray(native.apply(params, ids, mask)))  # dropout really fired
    np.testing.assert_allclose(outs["pallas"], outs[""],
                               atol=2e-5, rtol=2e-5)
