"""model2vec static-embedding ingestion (PubMedBERT-embeddings path).

The reference's sentence datasets encode raw text with
``model2vec.StaticModel.from_pretrained("neuml/pubmedbert-base-embeddings*")``
(``skinLesionDatasetsWithPubMedEmbeddings.py:15,62,97-98``): tokenize, look
each token id up in a static embedding table, mean-pool, and (per the model's
config) L2-normalize. This module ingests the actual model2vec artifact
layout — ``model.safetensors`` (key ``embeddings``) + ``tokenizer.json`` +
``config.json`` — with fallbacks (``embeddings.npy``, ``vocab.txt`` through
our native WordPiece) so the path also works from partial exports.

The resulting (B, E) sentence vectors feed ``StaticEmbeddingTower``
(models/text/__init__.py) exactly like the reference feeds its MLP head.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence

import numpy as np


class StaticSentenceEncoder:
    """Token-embedding mean-pooler over a static table.

    ``tokenize_ids(text)`` must return a list of int ids valid for
    ``embeddings``; rows are mean-pooled (empty → zeros) and optionally
    L2-normalized (model2vec ``config.json: {"normalize": true}``).
    """

    def __init__(self, embeddings: np.ndarray, tokenize_ids,
                 normalize: bool = False):
        self.embeddings = np.asarray(embeddings, np.float32)
        self._tokenize_ids = tokenize_ids
        self.normalize = bool(normalize)

    @property
    def dim(self) -> int:
        return int(self.embeddings.shape[1])

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), np.float32)
        for i, t in enumerate(texts):
            ids = [j for j in self._tokenize_ids(t)
                   if 0 <= j < len(self.embeddings)]
            if ids:
                v = self.embeddings[ids].mean(axis=0)
                if self.normalize:
                    n = np.linalg.norm(v)
                    if n > 0:
                        v = v / n
                out[i] = v
        return out


def _load_embeddings(path: str) -> np.ndarray:
    st = os.path.join(path, "model.safetensors")
    if os.path.exists(st):
        from safetensors.numpy import load_file

        tensors = load_file(st)
        for key in ("embeddings", "embedding", "weight"):
            if key in tensors:
                return tensors[key]
        # single-tensor files: take the one 2-D table
        mats = [v for v in tensors.values() if v.ndim == 2]
        if len(mats) == 1:
            return mats[0]
        raise ValueError(
            f"no embeddings tensor in {st} (keys: {list(tensors)})")
    npy = os.path.join(path, "embeddings.npy")
    if os.path.exists(npy):
        return np.load(npy)
    raise FileNotFoundError(
        f"no model.safetensors / embeddings.npy under {path}")


def _load_tokenize_ids(path: str):
    tj = os.path.join(path, "tokenizer.json")
    if os.path.exists(tj):
        from tokenizers import Tokenizer

        tok = Tokenizer.from_file(tj)
        return lambda text: tok.encode(text, add_special_tokens=False).ids
    vt = os.path.join(path, "vocab.txt")
    if os.path.exists(vt):
        from skinjax.data.tokenize import WordPieceTokenizer

        wp = WordPieceTokenizer.from_vocab_file(vt)
        unk = wp.unk_id
        return lambda text: [
            i for i in (wp.vocab.get(t, unk) for t in wp.tokenize(text))
        ]
    raise FileNotFoundError(f"no tokenizer.json / vocab.txt under {path}")


def load_model2vec(path: str,
                   normalize: Optional[bool] = None) -> StaticSentenceEncoder:
    """Load a model2vec artifact directory into a StaticSentenceEncoder.

    ``normalize`` defaults to the artifact's ``config.json`` (model2vec
    stores ``{"normalize": ...}``), else False.
    """
    if normalize is None:
        cfg = os.path.join(path, "config.json")
        normalize = False
        if os.path.exists(cfg):
            with open(cfg) as f:
                normalize = bool(json.load(f).get("normalize", False))
    return StaticSentenceEncoder(
        _load_embeddings(path), _load_tokenize_ids(path), normalize=normalize
    )


def encode_sentences(sentences: Sequence[str], model_dir: str) -> np.ndarray:
    """One-call helper for the data pipeline: raw sentences → (B, E) f32."""
    return load_model2vec(model_dir).encode(sentences)
