"""Native GPT-2 encoder — TPU-first replacement for the HF-wrapped GPT-2
sentence tower, completing the sentence-encoder pair the reference supports
(``loadImageModelClassifier.py:170`` accepts "bert-base-uncased" and "gpt2";
``multimodalIntraModalWithBert.py:88-95`` pools GPT-2 at the LAST token and
BERT at CLS).

Same design as ``models/text/bert.NativeBertEncoder``: the param tree is
IDENTICAL to transformers' ``FlaxGPT2Model.params`` (module names mirror
``modeling_flax_gpt2``), so pretrained HF weights drop in verbatim with no
key remapping, and the tower composes with skinjax dtype policy, freeze
masks, TP sharding rules (Conv1D stores kernels (out, in), so the Megatron
column/row split lands on dim 0/dim 1 — see ``parallel/mesh.py``), and the
fused global-attention kernel (opt-in via ``SKINJAX_GLOBATTN=pallas``; the
causal mask rides as an additive (h, T, T) bias. Unlike BEiT's learned
rel-pos bias there is no bias-chain backward for the kernel to win on, so
GPT-2 keeps the XLA default like ViT — docs/DESIGN.md §5i).

Numerics match HF Flax exactly in float32 eval (parity-tested vs
``FlaxGPT2Model`` in tests/test_native_gpt2.py): pre-LN residual blocks,
eps 1e-5, tanh-approximate GELU (``gelu_new``), causal masking combined
with the additive key-padding mask, and the same
``dot_product_attention_weights`` call HF makes (identical dropout
semantics under training).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.linen.attention import dot_product_attention_weights


class _Conv1D(nn.Module):
    """GPT-2's Conv1D: a Dense whose kernel is stored transposed,
    (features, in) — HF Flax ``FlaxConv1D`` layout, kept so pretrained
    state dicts import verbatim."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", jax.nn.initializers.normal(stddev=0.02),
            (self.features, x.shape[-1]))
        bias = self.param("bias", jax.nn.initializers.zeros, (self.features,))
        x = jnp.asarray(x, self.dtype)
        kernel = jnp.asarray(kernel.transpose(), self.dtype)
        y = jax.lax.dot_general(x, kernel, (((x.ndim - 1,), (0,)), ((), ())))
        return y + jnp.asarray(bias, self.dtype)


class _GPT2Attention(nn.Module):
    hidden: int
    heads: int
    attn_dropout: float
    resid_dropout: float
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, add_mask, *, deterministic: bool = True):
        B, T, _ = x.shape
        D = self.hidden
        hd = D // self.heads
        qkv = _Conv1D(3 * D, dtype=self.dtype, name="c_attn")(x)
        q, k, v = jnp.split(qkv, 3, axis=2)

        from skinjax.ops.pallas.global_attention import (
            attention_core, globattn_ok)

        causal = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
            <= jax.lax.broadcasted_iota(jnp.int32, (T, T), 0),
            0.0, -1e9).astype(jnp.float32)

        # has_bias: the causal mask rides as an (h, T, T) bias block, so
        # the fused path caps at T<=512 (helper crash at 640+, DESIGN §5m)
        if globattn_ok(T, has_bias=True) and not self.is_initializing():
            # causal structure as a constant per-head bias; key padding as
            # the (B, T) additive mask input. q/k/v from the packed c_attn
            # are already in the head-major channel layout the core wants.
            # Training attention-prob dropout rides in-kernel: HF's
            # broadcast_dropout=True is ONE (1, 1, T, T) keep mask shared
            # over batch+heads — the same bernoulli draw (same "dropout"
            # stream as the XLA branch) becomes a single small kernel
            # operand (models/text/bert.py has the twin path).
            pmult = None
            if not deterministic and self.attn_dropout > 0.0:
                keep = jax.random.bernoulli(
                    self.make_rng("dropout"), 1.0 - self.attn_dropout,
                    (1, 1, T, T))
                pmult = (keep.astype(jnp.float32)
                         / jnp.asarray(1.0 - self.attn_dropout, jnp.float32)
                         )[0, 0]
            bias = jnp.broadcast_to(causal[None], (self.heads, T, T))
            y = attention_core(q, k, v, jax.lax.stop_gradient(bias),
                               add_mask, pmult, self.heads)
        else:
            qh = q.reshape(B, T, self.heads, hd)
            kh = k.reshape(B, T, self.heads, hd)
            vh = v.reshape(B, T, self.heads, hd)
            bias = causal[None, None]
            if add_mask is not None:
                bias = bias + add_mask[:, None, None, :].astype(jnp.float32)
            rng = (self.make_rng("dropout")
                   if (not deterministic and self.attn_dropout > 0.0)
                   else None)
            # the exact call HF FlaxGPT2Attention makes; f32 weight
            # accumulation holds even under a bf16 compute dtype
            w = dot_product_attention_weights(
                qh.astype(jnp.float32), kh.astype(jnp.float32), bias=bias,
                dropout_rng=rng, dropout_rate=self.attn_dropout,
                broadcast_dropout=True, deterministic=deterministic,
                dtype=jnp.float32, precision=None,
            ).astype(qh.dtype)
            y = jnp.einsum("...hqk,...khd->...qhd", w, vh).reshape(B, T, D)

        y = _Conv1D(D, dtype=self.dtype, name="c_proj")(y)
        return nn.Dropout(self.resid_dropout)(y, deterministic=deterministic)


class _GPT2MLP(nn.Module):
    hidden: int
    intermediate: int
    resid_dropout: float
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = _Conv1D(self.intermediate, dtype=self.dtype, name="c_fc")(x)
        x = nn.gelu(x, approximate=True)  # HF ACT2FN["gelu_new"]
        x = _Conv1D(self.hidden, dtype=self.dtype, name="c_proj")(x)
        return nn.Dropout(self.resid_dropout)(x, deterministic=deterministic)


class _GPT2Block(nn.Module):
    """Pre-LN residual block (HF scope ``h/{i}``)."""

    hidden: int
    heads: int
    intermediate: int
    attn_dropout: float
    resid_dropout: float
    ln_eps: float
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, add_mask, *, deterministic: bool = True):
        y = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype,
                         name="ln_1")(x)
        x = x + _GPT2Attention(
            self.hidden, self.heads, self.attn_dropout, self.resid_dropout,
            dtype=self.dtype, name="attn")(
            y, add_mask, deterministic=deterministic)
        y = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype,
                         name="ln_2")(x)
        return x + _GPT2MLP(
            self.hidden, self.intermediate, self.resid_dropout,
            dtype=self.dtype, name="mlp")(y, deterministic=deterministic)


class _GPT2BlockStack(nn.Module):
    """Children named '0'..'{depth-1}' (HF scope ``h``)."""

    depth: int
    hidden: int
    heads: int
    intermediate: int
    attn_dropout: float
    resid_dropout: float
    ln_eps: float
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, add_mask, *, deterministic: bool = True):
        for i in range(self.depth):
            x = _GPT2Block(
                self.hidden, self.heads, self.intermediate,
                self.attn_dropout, self.resid_dropout, self.ln_eps,
                dtype=self.dtype, name=str(i))(
                x, add_mask, deterministic=deterministic)
        return x


class NativeGPT2Encoder(nn.Module):
    """GPT-2 decoder stack with an HF-Flax-identical param tree.

    ``init(...)['params']`` has exactly the structure of
    ``FlaxGPT2Model(GPT2Config()).params`` (scopes ``wte``/``wpe``/``h``/
    ``ln_f``), so pretrained HF weights import with
    ``import_hf_gpt2_params`` (a validating passthrough). Returns the
    last hidden state (B, T, hidden).
    """

    vocab_size: int = 50257
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072  # n_inner or 4*n_embd
    max_position_embeddings: int = 1024
    layer_norm_eps: float = 1e-5
    embd_dropout: float = 0.1
    resid_dropout: float = 0.1
    attention_dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, position_ids=None, *,
                 deterministic: bool = True):
        B, T = input_ids.shape
        if position_ids is None:
            position_ids = jnp.broadcast_to(
                jnp.arange(T, dtype=jnp.int32)[None], (B, T))
        we = nn.Embed(self.vocab_size, self.hidden_size, dtype=self.dtype,
                      name="wte")(input_ids.astype("i4"))
        pe = nn.Embed(self.max_position_embeddings, self.hidden_size,
                      dtype=self.dtype, name="wpe")(position_ids.astype("i4"))
        x = nn.Dropout(self.embd_dropout)(
            we + pe, deterministic=deterministic)
        # additive key-padding mask (0 keep / -1e9 drop): combined with the
        # causal structure inside each attention. -1e9 underflows masked
        # softmax weights to exactly 0.0 in f32, matching HF's finfo.min.
        add_mask = (jnp.where(attention_mask > 0, 0.0, -1e9)
                    .astype(jnp.float32)
                    if attention_mask is not None else None)
        x = _GPT2BlockStack(
            self.num_layers, self.hidden_size, self.num_heads,
            self.intermediate_size, self.attention_dropout,
            self.resid_dropout, self.layer_norm_eps, dtype=self.dtype,
            name="h",
        )(x, add_mask, deterministic=deterministic)
        return nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                            name="ln_f")(x)


def import_hf_gpt2_params(hf_params: dict) -> dict:
    """Map ``FlaxGPT2Model.params`` to ``NativeGPT2Encoder`` params.

    The trees are IDENTICAL by construction; this validates the top-level
    scopes so artifact-layout drift is loud."""
    extra = set(hf_params) - {"wte", "wpe", "h", "ln_f"}
    if extra:
        raise ValueError(f"unexpected top-level scope(s): {sorted(extra)}")
    return dict(hf_params)


def config_from_hf_gpt2(config) -> dict:
    """NativeGPT2Encoder kwargs from a transformers GPT2Config."""
    return dict(
        vocab_size=config.vocab_size,
        hidden_size=config.n_embd,
        num_layers=config.n_layer,
        num_heads=config.n_head,
        intermediate_size=(config.n_inner if config.n_inner is not None
                           else 4 * config.n_embd),
        max_position_embeddings=config.n_positions,
        layer_norm_eps=config.layer_norm_epsilon,
        embd_dropout=config.embd_pdrop,
        resid_dropout=config.resid_pdrop,
        attention_dropout=config.attn_pdrop,
    )
