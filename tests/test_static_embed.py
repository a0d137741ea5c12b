"""model2vec static-embedding ingestion: artifact round-trip (safetensors +
tokenizer.json + config.json), mean-pool/normalize semantics, vocab.txt
fallback, and the feed into StaticEmbeddingTower.
Reference: skinLesionDatasetsWithPubMedEmbeddings.py:15,62,97-98."""

import json
import os

import numpy as np
import pytest

from skinjax.models.text.static_embed import load_model2vec


VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "skin", "lesion", "##s",
         "arm", "red", "the"]


def _write_artifact(d, normalize=True, with_tokenizer_json=True):
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(len(VOCAB), 8)).astype(np.float32)
    from safetensors.numpy import save_file

    save_file({"embeddings": emb}, os.path.join(d, "model.safetensors"))
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump({"normalize": normalize}, f)
    if with_tokenizer_json:
        from tokenizers import Tokenizer
        from tokenizers.models import WordPiece
        from tokenizers.normalizers import Lowercase
        from tokenizers.pre_tokenizers import Whitespace

        tok = Tokenizer(WordPiece({t: i for i, t in enumerate(VOCAB)},
                                  unk_token="[UNK]"))
        tok.normalizer = Lowercase()
        tok.pre_tokenizer = Whitespace()
        tok.save(os.path.join(d, "tokenizer.json"))
    else:
        with open(os.path.join(d, "vocab.txt"), "w") as f:
            f.write("\n".join(VOCAB))
    return emb


@pytest.mark.parametrize("with_tok_json", [True, False])
def test_mean_pool_and_normalize(tmp_path, with_tok_json):
    emb = _write_artifact(str(tmp_path), normalize=True,
                          with_tokenizer_json=with_tok_json)
    enc = load_model2vec(str(tmp_path))
    assert enc.dim == 8
    out = enc.encode(["skin lesion", "red arm skin"])
    want0 = emb[[4, 5]].mean(axis=0)
    want0 = want0 / np.linalg.norm(want0)
    np.testing.assert_allclose(out[0], want0, rtol=1e-6)
    want1 = emb[[8, 7, 4]].mean(axis=0)
    want1 = want1 / np.linalg.norm(want1)
    np.testing.assert_allclose(out[1], want1, rtol=1e-6)
    # L2-normalized
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-5)


def test_no_normalize_and_empty(tmp_path):
    emb = _write_artifact(str(tmp_path), normalize=False)
    enc = load_model2vec(str(tmp_path))
    out = enc.encode(["lesions", ""])
    # wordpiece: lesion + ##s
    np.testing.assert_allclose(out[0], emb[[5, 6]].mean(axis=0), rtol=1e-6)
    np.testing.assert_allclose(out[1], np.zeros(8))


def test_feeds_static_embedding_tower(tmp_path):
    import jax
    import jax.numpy as jnp

    from skinjax.models.text import StaticEmbeddingTower

    _write_artifact(str(tmp_path))
    enc = load_model2vec(str(tmp_path))
    vecs = enc.encode(["skin lesion on the arm", "red lesions"])
    tower = StaticEmbeddingTower(out_dim=16)
    params = tower.init(jax.random.key(0), jnp.asarray(vecs))
    y = tower.apply(params, jnp.asarray(vecs))
    assert y.shape == (2, 16)
    assert np.isfinite(np.asarray(y)).all()
