"""Native BERT encoder — a TPU-first replacement for the HF-wrapped
sentence tower (``sentence.HFSentenceTower``).

The reference embeds ``transformers.BertModel`` directly as the sentence
encoder (textEmbbedingBlock.py:3-18; skinLesionDatasetsWithBert.py), and the
round-2 skinjax port wrapped HF's *Flax* BertModel. That wrapper has three
structural costs on TPU (measured: the BERT tower is ~75% of the sentence
train step, docs/DESIGN.md §5f):

1. it computes in float32 (the HF module's own dtype), while the rest of the
   model runs bf16;
2. its attention materializes the (B, h, T, T) probability tensor in HBM
   (no kernel injection point inside a wrapped module);
3. its params enter the tree by closure capture, invisible to TP sharding
   rules and importers (round-2 VERDICT weak #9).

``NativeBertEncoder`` re-implements the BERT-base/large topology with a
param tree IDENTICAL to HF Flax's ``FlaxBertModel.params`` (module names
mirror ``transformers.models.bert.modeling_flax_bert``), so pretrained HF
weights drop in verbatim via ``import_hf_bert_params`` — no key remapping —
and the whole tower composes with skinjax dtype policy, freeze masks, and
the fused global-attention Pallas kernel
(``skinjax.ops.pallas.global_attention``; engaged whenever the backend is
TPU — training attention-prob dropout rides in-kernel as the ONE (T, T)
broadcast mask HF's broadcast_dropout=True draws, same RNG stream as the
XLA path).

Numerical semantics match HF Flax exactly in float32 eval (parity-tested
against ``FlaxBertModel`` in tests/test_native_bert.py): exact (erf) GELU,
post-LN residuals, eps 1e-12, additive key mask with fully-underflowing
masked scores. The XLA attention path calls the same
``flax.linen.attention.dot_product_attention_weights`` HF calls, with the
same broadcast-dropout arguments, so training dropout semantics are
HF-identical too.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.linen.attention import dot_product_attention_weights

# SKINJAX_REMAT=block: rematerialize each encoder layer in the backward —
# the same capacity lever the image backbones expose (backbones/vit.py:22),
# for unfrozen sentence training at T=512 / large batch.
_REMAT = os.environ.get("SKINJAX_REMAT", "")


class _BertSelfAttention(nn.Module):
    """HF scope ``attention/self``: separate q/k/v projections."""

    hidden: int
    heads: int
    attn_dropout: float
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, add_mask, *, deterministic: bool = True):
        D = self.hidden
        q = nn.Dense(D, dtype=self.dtype, name="query")(x)
        k = nn.Dense(D, dtype=self.dtype, name="key")(x)
        v = nn.Dense(D, dtype=self.dtype, name="value")(x)

        from skinjax.ops.pallas.global_attention import (
            attention_core, globattn_ok)

        # is_initializing: init may run pinned to CPU (fast-init pattern)
        # where a compiled pallas_call cannot lower; the core is param-free.
        # globattn_ok adds the helper-tolerated sequence caps (DESIGN §5m);
        # the key mask is a (B, T) input, not a bias block, so BERT fuses
        # through T=1024.
        if globattn_ok(x.shape[1]) and not self.is_initializing():
            # fused scores->softmax->p@v on the head-major channel layout
            # the Dense outputs already have; the additive key mask rides
            # as a (B, T) kernel input. Training attention-prob dropout
            # rides IN-KERNEL as a multiplicative post-softmax mask: HF's
            # broadcast_dropout=True draws ONE (1, 1, T, T) keep mask shared
            # over batch+heads, so the exact same bernoulli draw (same
            # "dropout" RNG stream as the XLA branch below) becomes a single
            # small kernel operand — the kernel no longer drops out of the
            # default train step (docs/DESIGN.md §5f-c finding 2).
            pmult = None
            if not deterministic and self.attn_dropout > 0.0:
                T = x.shape[1]
                keep = jax.random.bernoulli(
                    self.make_rng("dropout"), 1.0 - self.attn_dropout,
                    (1, 1, T, T))
                pmult = (keep.astype(jnp.float32)
                         / jnp.asarray(1.0 - self.attn_dropout, jnp.float32)
                         )[0, 0]
            return attention_core(q, k, v, None, add_mask, pmult, self.heads)

        B, T, _ = x.shape
        hd = D // self.heads
        qh = q.reshape(B, T, self.heads, hd)
        kh = k.reshape(B, T, self.heads, hd)
        vh = v.reshape(B, T, self.heads, hd)
        bias = (add_mask[:, None, None, :].astype(jnp.float32)
                if add_mask is not None else None)
        rng = (self.make_rng("dropout")
               if (not deterministic and self.attn_dropout > 0.0) else None)
        # the exact call HF FlaxBertSelfAttention makes (softmax + dropout
        # semantics identical); weights accumulate f32 for stability even
        # under a bf16 compute dtype
        w = dot_product_attention_weights(
            qh.astype(jnp.float32), kh.astype(jnp.float32), bias=bias,
            dropout_rng=rng, dropout_rate=self.attn_dropout,
            broadcast_dropout=True, deterministic=deterministic,
            dtype=jnp.float32, precision=None,
        ).astype(qh.dtype)
        out = jnp.einsum("...hqk,...khd->...qhd", w, vh)
        return out.reshape(B, T, D)


class _DenseLnResidual(nn.Module):
    """HF scopes ``attention/output`` and ``output``: dense -> dropout ->
    LayerNorm(x + residual) (post-LN)."""

    hidden: int
    dropout: float
    ln_eps: float
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, residual, *, deterministic: bool = True):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="dense")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype,
                            name="LayerNorm")(x + residual)


class _BertAttention(nn.Module):
    hidden: int
    heads: int
    attn_dropout: float
    hidden_dropout: float
    ln_eps: float
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, add_mask, *, deterministic: bool = True):
        y = _BertSelfAttention(self.hidden, self.heads, self.attn_dropout,
                               dtype=self.dtype, name="self")(
            x, add_mask, deterministic=deterministic)
        return _DenseLnResidual(self.hidden, self.hidden_dropout,
                                self.ln_eps, dtype=self.dtype,
                                name="output")(
            y, x, deterministic=deterministic)


class _BertIntermediate(nn.Module):
    intermediate: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.intermediate, dtype=self.dtype, name="dense")(x)
        return nn.gelu(x, approximate=False)  # HF ACT2FN["gelu"]


class _BertLayer(nn.Module):
    hidden: int
    heads: int
    intermediate: int
    attn_dropout: float
    hidden_dropout: float
    ln_eps: float
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, add_mask, *, deterministic: bool = True):
        x = _BertAttention(self.hidden, self.heads, self.attn_dropout,
                           self.hidden_dropout, self.ln_eps,
                           dtype=self.dtype, name="attention")(
            x, add_mask, deterministic=deterministic)
        y = _BertIntermediate(self.intermediate, dtype=self.dtype,
                              name="intermediate")(x)
        return _DenseLnResidual(self.hidden, self.hidden_dropout,
                                self.ln_eps, dtype=self.dtype,
                                name="output")(
            y, x, deterministic=deterministic)


class _BertLayerStack(nn.Module):
    """Children named '0'..'{depth-1}' (HF scope ``encoder/layer``)."""

    depth: int
    hidden: int
    heads: int
    intermediate: int
    attn_dropout: float
    hidden_dropout: float
    ln_eps: float
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, add_mask, *, deterministic: bool = True):
        for i in range(self.depth):
            if _REMAT == "block" and not deterministic:
                def body(mdl, y, m, _i=i):
                    return _BertLayer(
                        mdl.hidden, mdl.heads, mdl.intermediate,
                        mdl.attn_dropout, mdl.hidden_dropout, mdl.ln_eps,
                        dtype=mdl.dtype, name=str(_i))(
                        y, m, deterministic=False)

                x = nn.remat(body, prevent_cse=False)(self, x, add_mask)
            else:
                x = _BertLayer(self.hidden, self.heads, self.intermediate,
                               self.attn_dropout, self.hidden_dropout,
                               self.ln_eps, dtype=self.dtype, name=str(i))(
                    x, add_mask, deterministic=deterministic)
        return x


class _BertEncoderScope(nn.Module):
    """HF scope ``encoder`` wrapping the ``layer`` stack."""

    depth: int
    hidden: int
    heads: int
    intermediate: int
    attn_dropout: float
    hidden_dropout: float
    ln_eps: float
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, add_mask, *, deterministic: bool = True):
        return _BertLayerStack(
            self.depth, self.hidden, self.heads, self.intermediate,
            self.attn_dropout, self.hidden_dropout, self.ln_eps,
            dtype=self.dtype, name="layer",
        )(x, add_mask, deterministic=deterministic)


class _BertEmbeddings(nn.Module):
    vocab: int
    hidden: int
    max_pos: int
    type_vocab: int
    hidden_dropout: float
    ln_eps: float
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, input_ids, token_type_ids, position_ids, *,
                 deterministic: bool = True):
        we = nn.Embed(self.vocab, self.hidden, dtype=self.dtype,
                      name="word_embeddings")(input_ids.astype("i4"))
        pe = nn.Embed(self.max_pos, self.hidden, dtype=self.dtype,
                      name="position_embeddings")(position_ids.astype("i4"))
        te = nn.Embed(self.type_vocab, self.hidden, dtype=self.dtype,
                      name="token_type_embeddings")(
            token_type_ids.astype("i4"))
        x = we + te + pe
        x = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype,
                         name="LayerNorm")(x)
        return nn.Dropout(self.hidden_dropout)(
            x, deterministic=deterministic)


class NativeBertEncoder(nn.Module):
    """BERT encoder with an HF-Flax-identical param tree.

    ``NativeBertEncoder().init(...)['params']`` has exactly the structure of
    ``FlaxBertModel(BertConfig()).params`` minus the (unused) ``pooler``
    scope, so pretrained HF weights import with ``import_hf_bert_params``
    (a passthrough that drops ``pooler``). Returns the last hidden state
    (B, T, hidden).
    """

    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 position_ids=None, *, deterministic: bool = True):
        B, T = input_ids.shape
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        if position_ids is None:
            position_ids = jnp.broadcast_to(
                jnp.arange(T, dtype=jnp.int32)[None], (B, T))
        x = _BertEmbeddings(
            self.vocab_size, self.hidden_size,
            self.max_position_embeddings, self.type_vocab_size,
            self.hidden_dropout, self.layer_norm_eps, dtype=self.dtype,
            name="embeddings",
        )(input_ids, token_type_ids, position_ids,
          deterministic=deterministic)
        # additive key mask: 0 keep / -1e9 drop. HF uses finfo(dtype).min;
        # both underflow masked softmax weights to exactly 0.0 in f32, so
        # outputs are bit-identical (parity-tested), and -1e9 composes with
        # the kernel's own -1e9 tail pad without overflow.
        add_mask = (jnp.where(attention_mask > 0, 0.0, -1e9)
                    .astype(jnp.float32)
                    if attention_mask is not None else None)
        return _BertEncoderScope(
            self.num_layers, self.hidden_size, self.num_heads,
            self.intermediate_size, self.attention_dropout,
            self.hidden_dropout, self.layer_norm_eps, dtype=self.dtype,
            name="encoder",
        )(x, add_mask, deterministic=deterministic)


def import_hf_bert_params(hf_params: dict) -> dict:
    """Map ``FlaxBertModel.params`` to ``NativeBertEncoder`` params.

    The trees are IDENTICAL by construction; this just validates the scopes
    and drops ``pooler`` (unused by the tower — it CLS-pools the last hidden
    state, multimodalIntraInterModal.py:180-183). Raises on unknown scopes
    so artifact-layout drift is loud.
    """
    extra = set(hf_params) - {"embeddings", "encoder", "pooler"}
    if extra:
        raise ValueError(f"unexpected top-level scope(s): {sorted(extra)}")
    enc_extra = set(hf_params["encoder"]) - {"layer"}
    if enc_extra:
        raise ValueError(f"unexpected encoder sub-scopes: {sorted(enc_extra)}")
    return {k: v for k, v in hf_params.items() if k != "pooler"}


def config_from_hf(config) -> dict:
    """NativeBertEncoder kwargs from a transformers BertConfig."""
    return dict(
        vocab_size=config.vocab_size,
        hidden_size=config.hidden_size,
        num_layers=config.num_hidden_layers,
        num_heads=config.num_attention_heads,
        intermediate_size=config.intermediate_size,
        max_position_embeddings=config.max_position_embeddings,
        type_vocab_size=config.type_vocab_size,
        layer_norm_eps=config.layer_norm_eps,
        hidden_dropout=config.hidden_dropout_prob,
        attention_dropout=config.attention_probs_dropout_prob,
    )


class NativeSentenceTower(nn.Module):
    """Pooled native sentence tower — drop-in for ``HFSentenceTower``
    (same ``(input_ids, attention_mask, deterministic)`` call signature),
    but bf16-capable, TP-shardable, and fused-kernel-backed. ``pool``
    mirrors the reference's per-family read-out
    (multimodalIntraModalWithBert.py:88-95): "cls" = ``[:, 0]`` (BERT),
    "last" = ``[:, -1]`` (GPT-2 — the raw final position, pad included,
    exactly as the reference indexes it). ``encoder`` is any encoder
    template with the (ids, mask, deterministic) -> (B, T, D) contract
    (``NativeBertEncoder`` under scope 'bert', ``NativeGPT2Encoder`` under
    scope 'gpt2' — fill from HF weights via the matching importer).
    """

    encoder: Any
    out_dim: Optional[int] = None
    pool: str = "cls"
    scope_name: str = "bert"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, *,
                 deterministic: bool = True):
        import dataclasses

        # re-construct the encoder INSIDE compact so flax adopts it as a
        # child scope (a template instance passed as an attribute stays
        # unbound)
        fields = {f.name: getattr(self.encoder, f.name)
                  for f in dataclasses.fields(self.encoder)
                  if f.init and f.name not in ("parent", "name")}
        hidden = type(self.encoder)(**fields, name=self.scope_name)(
            input_ids, attention_mask, deterministic=deterministic)
        if self.pool == "last":
            pooled = hidden[:, -1, :]
        else:
            pooled = hidden[:, 0, :]
        if self.out_dim is not None:
            pooled = nn.Dense(self.out_dim, dtype=self.dtype,
                              name="proj")(pooled)
        return pooled

    @property
    def hidden_size(self) -> int:
        return int(self.encoder.hidden_size)
