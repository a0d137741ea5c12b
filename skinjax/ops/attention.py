"""Multi-head attention with torch ``nn.MultiheadAttention`` semantics.

The reference framework builds its entire fusion zoo out of
``nn.MultiheadAttention`` applied to *sequence-length-1* tensors
(cf. /root/reference/src/scripts/benchmark/models/multimodalIntraInterModal.py:190-197).
Softmax over a single key is identically 1, so at seq_len==1 attention
degenerates — exactly, including gradients — to

    out = W_o @ (W_v @ x_kv + b_v) + b_o

which this module exploits with a trace-time fast path: two dense layers on
the MXU, no softmax, no transpose soup. Shapes are static, so the dispatch is
resolved during jit tracing and XLA fuses the whole chain. The general path
(seq_len > 1, used by ViT-token/BERT variants) runs standard scaled-dot-product
attention in bf16 with fp32 softmax accumulation.

Layout is batch-first ``(B, S, D)`` — TPU-friendly; the reference's
seq-first ``(S, B, D)`` layout is a cuDNN-era torch quirk we do not copy.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class MultiHeadAttention(nn.Module):
    """Torch-parity multi-head attention.

    Parameters are stored as separate q/k/v/out projections (flax kernels are
    ``(in, out)``; a torch ``in_proj_weight`` imports as three transposed
    slices — see ``skinjax.models.backbones.torch_import``).

    Attributes:
      embed_dim: model dim D (query/key/value all projected from D).
      num_heads: number of heads; D % num_heads == 0.
      dropout_rate: dropout on attention weights (torch default 0.0).
      dtype: computation dtype (params stay in ``param_dtype``).
    """

    embed_dim: int
    num_heads: int
    dropout_rate: float = 0.0
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        q: jax.Array,
        k: jax.Array,
        v: jax.Array,
        *,
        deterministic: bool = True,
        mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        """q: (B, Sq, D); k, v: (B, Skv, D). Returns (B, Sq, D)."""
        if self.embed_dim % self.num_heads != 0:
            raise ValueError(
                f"embed_dim={self.embed_dim} not divisible by num_heads={self.num_heads}"
            )
        head_dim = self.embed_dim // self.num_heads
        dense = lambda name: nn.Dense(
            self.embed_dim,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            name=name,
        )

        # torch MHA with dropout>0 in training would drop/rescale even the
        # single attention weight, so the collapse is only exact when
        # attention dropout is inert (ADVICE r1)
        seq1 = (
            q.shape[1] == 1 and k.shape[1] == 1 and mask is None
            and (self.dropout_rate == 0.0 or deterministic)
        )
        if seq1:
            # Exact seq-1 collapse: softmax over one key == 1, so the output
            # is out_proj(v_proj(v)). q/k projections receive exactly-zero
            # gradient in this regime (d softmax(single logit) = 0), so we
            # still *create* their params for checkpoint compatibility but
            # never touch the data path with them.
            dense("q_proj")(q)  # params exist; XLA DCEs this dead matmul
            dense("k_proj")(k)
            vh = dense("v_proj")(v)
            return dense("out_proj")(vh)

        qh = dense("q_proj")(q)
        kh = dense("k_proj")(k)
        vh = dense("v_proj")(v)

        B, Sq, _ = qh.shape
        Skv = kh.shape[1]

        from skinjax.ops.pallas.global_attention import (
            attention_core, globattn_ok)

        # Auto-on for TPU backends (globattn_ok — backend check plus the
        # sequence-length caps the Mosaic compile helper tolerates, DESIGN
        # §5m), same evidence-based
        # defaulting as the window kernels (§5b-r3c): with the stored-P
        # backward the fused core measured +10.4% on the vit_large train
        # step same-run vs XLA's bias-free attention (docs/DESIGN.md §5i-b;
        # the round-2 -22% recompute regression no longer reproduces).
        # is_initializing: flax init often runs pinned to CPU (fast-init
        # pattern, bench.py) where a compiled pallas_call cannot lower; the
        # core has no params, so the XLA path is init-safe
        if (Sq == Skv and mask is None
                and (self.dropout_rate == 0.0 or deterministic)
                and not self.is_initializing()
                and globattn_ok(Sq)):
            # fused scores->softmax->p@v core on the head-major channel
            # layout the Dense outputs already have — no head reshape, no
            # HBM (B, h, S, S) score tensor (ops/pallas/global_attention.py)
            out = attention_core(qh, kh, vh, None, None, None, self.num_heads)
            return dense("out_proj")(out)
        shape = lambda x, S: x.reshape(B, S, self.num_heads, head_dim)
        qh, kh, vh = shape(qh, Sq), shape(kh, Skv), shape(vh, Skv)

        # (B, H, Sq, Skv), accumulate logits in fp32 for softmax stability.
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32
        )
        logits = logits / jnp.sqrt(head_dim).astype(logits.dtype)
        if mask is not None:
            logits = jnp.where(mask, logits, jnp.finfo(logits.dtype).min)
        weights = jax.nn.softmax(logits, axis=-1)
        if self.dropout_rate > 0.0 and not deterministic:
            weights = nn.Dropout(rate=self.dropout_rate)(
                weights, deterministic=False
            )
        weights = weights.astype(qh.dtype)

        out = jnp.einsum("bhqk,bkhd->bqhd", weights, vh)
        out = out.reshape(B, Sq, self.embed_dim)
        return dense("out_proj")(out)


def feature_attention(
    feat: jax.Array, mha: MultiHeadAttention
) -> jax.Array:  # pragma: no cover - thin helper
    """Self-attention over pooled features (B, D) -> (B, D) via seq-1 MHA."""
    return mha(feat[:, None, :], feat[:, None, :], feat[:, None, :])[:, 0, :]
