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
    """CLS-pooled HF encoder as a linen module.

    ``hf_module`` is a transformers Flax model whose params live inside this
    module's param tree under 'hf' (so checkpointing/freezing compose).
    """

    hf_module: Any
    out_dim: Optional[int] = None  # optional projection after pooling
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
        pooled = out.last_hidden_state[:, 0, :]
        if self.out_dim is not None:
            pooled = nn.Dense(self.out_dim, dtype=self.dtype, name="proj")(pooled)
        return pooled

    @property
    def hidden_size(self) -> int:
        return int(self.hf_module.config.hidden_size)
