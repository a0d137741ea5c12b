"""Sentence-encoder text towers (BERT / GPT-2 class) for the LLM-generated-
sentence datasets (skinLesionDatasetsWithBert.py, train_pad_20_with_llm-
generated-sentences.py).

Wraps a HuggingFace **Flax** model (transformers is in the image; weights
load from a local path when available, or from-config random init for
offline structure-parity work). Pooling follows the reference:
``last_hidden_state[:, 0, :]`` (multimodalIntraInterModal.py:180-183).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn


def build_hf_flax_module(model_name: str, local_path: Optional[str] = None):
    """Instantiate a HF Flax encoder. Tries local path / cache first; falls
    back to from-config random init (offline).

    The fallback is LOUD: a random-init encoder trains but cannot reproduce
    published sentence-path accuracy, so degrading silently would corrupt
    experiments. ``module.skinjax_pretrained`` records which path was taken.
    """
    import warnings

    from transformers import AutoConfig

    if model_name.startswith("gpt2"):
        from transformers import FlaxGPT2Model as Cls
        from transformers import GPT2Config as Cfg
    else:
        from transformers import FlaxBertModel as Cls
        from transformers import BertConfig as Cfg

    try:
        module = Cls.from_pretrained(local_path or model_name)
        module.skinjax_pretrained = True
        return module
    except Exception as e:
        warnings.warn(
            f"Could not load pretrained weights for {model_name!r} "
            f"({type(e).__name__}: {e}); falling back to RANDOM init — "
            "sentence-tower accuracy will not match published results. "
            "Provide local_path (or an HF cache) for real weights.",
            stacklevel=2,
        )
        try:
            config = AutoConfig.from_pretrained(local_path or model_name)
        except Exception:
            config = Cfg()
        module = Cls(config)
        module.skinjax_pretrained = False
        return module


class HFSentenceTower(nn.Module):
    """Pooled HF encoder as a linen module.

    ``hf_module`` is a transformers Flax model whose params live inside this
    module's param tree under 'hf' (so checkpointing/freezing compose).
    ``pool`` follows the reference's per-family read-out
    (multimodalIntraModalWithBert.py:88-95): "cls" = ``[:, 0]`` (BERT),
    "last" = ``[:, -1]`` (GPT-2, raw final position — pad included, exactly
    as the reference indexes it).
    """

    hf_module: Any
    out_dim: Optional[int] = None  # optional projection after pooling
    pool: str = "cls"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, *, deterministic: bool = True):
        def _init_hf(rng):
            if getattr(self.hf_module, "skinjax_pretrained", True):
                # pretrained weights ARE the init (like an importer) — the
                # rng is deliberately unused
                return self.hf_module.params
            # random-init fallback: honor the linen RNG so a fresh seed
            # draws fresh weights instead of silently repeating the wrapped
            # instance's init
            return self.hf_module.init_weights(rng, (1, 8))

        hf_params = self.param("hf", _init_hf)
        # HF Flax wrappers are standalone models, not nested linen submodules:
        # they take params and dropout rng explicitly.
        dropout_rng = None if deterministic else self.make_rng("dropout")
        out = self.hf_module(
            input_ids=input_ids,
            attention_mask=attention_mask,
            params=hf_params,
            train=not deterministic,
            dropout_rng=dropout_rng,
        )
        if self.pool == "last":
            pooled = out.last_hidden_state[:, -1, :]
        else:
            pooled = out.last_hidden_state[:, 0, :]
        if self.out_dim is not None:
            pooled = nn.Dense(self.out_dim, dtype=self.dtype, name="proj")(pooled)
        return pooled

    @property
    def hidden_size(self) -> int:
        return int(self.hf_module.config.hidden_size)


def build_sentence_tower(
    model_name: str,
    local_path: Optional[str] = None,
    out_dim: Optional[int] = None,
    dtype: Optional[jnp.dtype] = None,
    native: bool = True,
):
    """Build the sentence tower for a reference text-encoder name
    ("bert-base-uncased" / "gpt2" families, loadImageModelClassifier.py:170).

    Default (``native=True``) returns the TPU-native tower
    (``NativeBertEncoder`` / ``NativeGPT2Encoder`` under
    ``NativeSentenceTower``) with the reference's per-family pooling —
    bf16-capable, TP-shardable, fused-kernel-backed — loading pretrained HF
    weights into the HF-identical param tree when available (via
    ``tower.pretrained_params``, or None on random init, with the same loud
    fallback warning as the wrapper path). ``native=False`` returns the
    HF-Flax-wrapped ``HFSentenceTower`` (f32, round-2 path).
    """
    import warnings

    from transformers import AutoConfig

    is_gpt2 = model_name.startswith("gpt2")
    pool = "last" if is_gpt2 else "cls"
    if not native:
        hf = build_hf_flax_module(model_name, local_path)
        return HFSentenceTower(hf_module=hf, out_dim=out_dim, pool=pool,
                               dtype=dtype)
    if is_gpt2:
        from transformers import FlaxGPT2Model as Cls
        from transformers import GPT2Config as Cfg
    else:
        from transformers import FlaxBertModel as Cls
        from transformers import BertConfig as Cfg
    # pretrained weights when available; otherwise config only — the native
    # path never materializes a random-init HF module
    pre_raw = config = None
    try:
        hf = Cls.from_pretrained(local_path or model_name)
        config, pre_raw = hf.config, hf.params
    except Exception as e:
        warnings.warn(
            f"Could not load pretrained weights for {model_name!r} "
            f"({type(e).__name__}: {e}); falling back to RANDOM init — "
            "sentence-tower accuracy will not match published results. "
            "Provide local_path (or an HF cache) for real weights.",
            stacklevel=2,
        )
        try:
            config = AutoConfig.from_pretrained(local_path or model_name)
        except Exception:
            config = Cfg()

    from skinjax.models.text.bert import NativeSentenceTower

    if is_gpt2:
        from skinjax.models.text.gpt2 import (
            NativeGPT2Encoder, config_from_hf_gpt2, import_hf_gpt2_params)

        enc = NativeGPT2Encoder(**config_from_hf_gpt2(config), dtype=dtype)
        tower = NativeSentenceTower(encoder=enc, out_dim=out_dim, pool=pool,
                                    scope_name="gpt2", dtype=dtype)
        pre = import_hf_gpt2_params(pre_raw) if pre_raw is not None else None
    else:
        from skinjax.models.text.bert import (
            NativeBertEncoder, config_from_hf, import_hf_bert_params)

        enc = NativeBertEncoder(**config_from_hf(config), dtype=dtype)
        tower = NativeSentenceTower(encoder=enc, out_dim=out_dim, pool=pool,
                                    scope_name="bert", dtype=dtype)
        pre = import_hf_bert_params(pre_raw) if pre_raw is not None else None
    # imported weights ride as an attribute (not a linen field) — callers
    # graft them into the init tree with ``graft_pretrained``
    object.__setattr__(tower, "pretrained_params", pre)
    return tower


def graft_pretrained(params, tower):
    """Replace the tower's encoder subtree in an init ``params`` tree with
    the pretrained weights ``build_sentence_tower`` imported (no-op for
    random-init fallback towers and the HF wrapper, whose params already ARE
    the init). Matches the encoder by its scope name ('bert'/'gpt2');
    asserts exactly one subtree was grafted and the trees are congruent."""
    import jax

    pre = getattr(tower, "pretrained_params", None)
    if pre is None:
        return params
    scope = tower.scope_name
    hits = []

    def rec(d):
        if not isinstance(d, dict):
            return d
        out = {}
        for k, v in d.items():
            if k == scope and isinstance(v, dict):
                hits.append(k)
                # always COPY: the grafted tree feeds donated train steps,
                # and aliasing would delete the caller's pretrained buffers
                out[k] = jax.tree_util.tree_map(
                    lambda a, b: jnp.array(b, dtype=a.dtype).reshape(a.shape),
                    v, pre)
            else:
                out[k] = rec(v)
        return out

    out = rec(params)
    if len(hits) != 1:
        raise ValueError(
            f"expected exactly one '{scope}' scope in the param tree, "
            f"found {len(hits)}")
    return out
