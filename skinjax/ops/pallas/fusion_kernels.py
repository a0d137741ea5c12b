"""Pallas TPU kernels for the seq-1 fusion stage.

The fusion zoo operates on pooled (B, D) features where every attention is
seq-len-1 and mathematically collapses to dense chains (see
skinjax/ops/attention.py). These kernels fuse whole fusion blocks into single
VMEM-resident programs — one HBM round-trip per block instead of one per op —
which is what matters for the serving path's p50 latency (north-star metric
#2): at B=1..32 the fusion stage is bandwidth-bound, not FLOP-bound.

Weight layout: flax convention, kernel (in, out), y = x @ W + b. All matmuls
accumulate fp32 on the MXU (preferred_element_type).

Kernels:
  seq1_attention_kernel   out_proj(v_proj(kv))                (2 matmuls)
  gated_residual_kernel   LN(g·attn + (1-g)·q), g=σ(q@Wg+bg)  (4 matmuls + LN)
  metablock_kernel        σ(tanh(V·LN(U@Wf+bf)) + LN(U@Wg+bg))
  mlp_head_kernel         Dense→LN→ReLU→Dense→LN→ReLU→Dense   (3 matmuls)

All are exposed through thin wrappers that fall back to ``interpret=True``
off-TPU, so tests run on CPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-5


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _vmem():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _ln(x, gamma, beta):
    mu = x.mean(axis=-1, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + LN_EPS) * gamma + beta


# ---------------------------------------------------------------------------
# seq-1 attention collapse: out = (kv @ Wv + bv) @ Wo + bo
# ---------------------------------------------------------------------------


def _seq1_attention_kernel(kv_ref, wv_ref, bv_ref, wo_ref, bo_ref, out_ref):
    v = (
        jnp.dot(kv_ref[:], wv_ref[:], preferred_element_type=jnp.float32)
        + bv_ref[:]
    )
    out_ref[:] = (
        jnp.dot(v.astype(kv_ref.dtype), wo_ref[:], preferred_element_type=jnp.float32)
        + bo_ref[:]
    ).astype(out_ref.dtype)


def seq1_attention(kv, wv, bv, wo, bo):
    """(B, D) -> (B, D): the exact seq-1 MHA output in one fused kernel."""
    return pl.pallas_call(
        _seq1_attention_kernel,
        out_shape=jax.ShapeDtypeStruct(kv.shape, kv.dtype),
        in_specs=[_vmem()] * 5,
        out_specs=_vmem(),
        interpret=_interpret(),
    )(kv, wv, bv, wo, bo)


# ---------------------------------------------------------------------------
# gated residual block (gatedResidualBlock.py:4-17 at seq-1, inference)
# ---------------------------------------------------------------------------


def _gated_residual_kernel(
    q_ref, kv_ref, wv_ref, bv_ref, wo_ref, bo_ref, wg_ref, bg_ref,
    gamma_ref, beta_ref, out_ref,
):
    q = q_ref[:].astype(jnp.float32)
    v = (
        jnp.dot(kv_ref[:], wv_ref[:], preferred_element_type=jnp.float32)
        + bv_ref[:]
    )
    attn = (
        jnp.dot(
            v.astype(kv_ref.dtype), wo_ref[:], preferred_element_type=jnp.float32
        )
        + bo_ref[:]
    )
    gate = jax.nn.sigmoid(
        jnp.dot(q_ref[:], wg_ref[:], preferred_element_type=jnp.float32)
        + bg_ref[:]
    )
    blended = gate * attn + (1.0 - gate) * q
    out_ref[:] = _ln(blended, gamma_ref[:], beta_ref[:]).astype(out_ref.dtype)


def gated_residual_seq1(q, kv, wv, bv, wo, bo, wg, bg, gamma, beta):
    """Full GatedAlteredResidualBlock at seq-1 (inference, dropout off)."""
    return pl.pallas_call(
        _gated_residual_kernel,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        in_specs=[_vmem()] * 10,
        out_specs=_vmem(),
        interpret=_interpret(),
    )(q, kv, wv, bv, wo, bo, wg, bg, gamma, beta)


# ---------------------------------------------------------------------------
# MetaBlock FiLM (metablock.py:22-32)
# ---------------------------------------------------------------------------


def _metablock_kernel(
    v_ref, u_ref, wf_ref, bf_ref, gf_ref, hf_ref, wg_ref, bg_ref, gg_ref,
    hg_ref, out_ref,
):
    t1 = _ln(
        jnp.dot(u_ref[:], wf_ref[:], preferred_element_type=jnp.float32)
        + bf_ref[:],
        gf_ref[:],
        hf_ref[:],
    )
    t2 = _ln(
        jnp.dot(u_ref[:], wg_ref[:], preferred_element_type=jnp.float32)
        + bg_ref[:],
        gg_ref[:],
        hg_ref[:],
    )
    out_ref[:] = jax.nn.sigmoid(
        jnp.tanh(v_ref[:].astype(jnp.float32) * t1) + t2
    ).astype(out_ref.dtype)


def metablock_film(v, u, wf, bf, gf, hf, wg, bg, gg, hg):
    """σ(tanh(V·LN(U@Wf+bf)) + LN(U@Wg+bg)) in one kernel."""
    return pl.pallas_call(
        _metablock_kernel,
        out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
        in_specs=[_vmem()] * 10,
        out_specs=_vmem(),
        interpret=_interpret(),
    )(v, u, wf, bf, gf, hf, wg, bg, gg, hg)


# ---------------------------------------------------------------------------
# fused MLP head (multimodalIntraInterModal.py:134-146, inference)
# ---------------------------------------------------------------------------


def _mlp_head_kernel(
    x_ref, w1_ref, b1_ref, g1_ref, h1_ref, w2_ref, b2_ref, g2_ref, h2_ref,
    w3_ref, b3_ref, out_ref,
):
    h = (
        jnp.dot(x_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
        + b1_ref[:]
    )
    h = jnp.maximum(_ln(h, g1_ref[:], h1_ref[:]), 0.0)
    h = (
        jnp.dot(h.astype(x_ref.dtype), w2_ref[:], preferred_element_type=jnp.float32)
        + b2_ref[:]
    )
    h = jnp.maximum(_ln(h, g2_ref[:], h2_ref[:]), 0.0)
    out_ref[:] = (
        jnp.dot(h.astype(x_ref.dtype), w3_ref[:], preferred_element_type=jnp.float32)
        + b3_ref[:]
    ).astype(out_ref.dtype)


def mlp_head(x, w1, b1, g1, h1, w2, b2, g2, h2, w3, b3):
    """Dense→LN→ReLU→Dense→LN→ReLU→Dense as one kernel (dropout off)."""
    out_dim = w3.shape[1]
    return pl.pallas_call(
        _mlp_head_kernel,
        out_shape=jax.ShapeDtypeStruct((x.shape[0], out_dim), x.dtype),
        in_specs=[_vmem()] * 11,
        out_specs=_vmem(),
        interpret=_interpret(),
    )(x, w1, b1, g1, h1, w2, b2, g2, h2, w3, b3)


# ---------------------------------------------------------------------------
# parameter adapters: pull kernel args out of linen param trees
# ---------------------------------------------------------------------------


def mha_args(p):
    """MultiHeadAttention params -> (wv, bv, wo, bo)."""
    return (
        p["v_proj"]["kernel"], p["v_proj"]["bias"],
        p["out_proj"]["kernel"], p["out_proj"]["bias"],
    )


def grb_args(p):
    """GatedAlteredResidualBlock params -> gated_residual_seq1 weight args."""
    return (
        *mha_args(p["attn"]),
        p["gate_linear"]["kernel"], p["gate_linear"]["bias"],
        p["norm"]["scale"], p["norm"]["bias"],
    )


def metablock_args(p):
    return (
        p["fb"]["kernel"], p["fb"]["bias"],
        p["fb_norm"]["scale"], p["fb_norm"]["bias"],
        p["gb"]["kernel"], p["gb"]["bias"],
        p["gb_norm"]["scale"], p["gb_norm"]["bias"],
    )


def mlp_head_args(p):
    return (
        p["fc1"]["kernel"], p["fc1"]["bias"],
        p["norm1"]["scale"], p["norm1"]["bias"],
        p["fc2"]["kernel"], p["fc2"]["bias"],
        p["norm2"]["scale"], p["norm2"]["bias"],
        p["fc_out"]["kernel"], p["fc_out"]["bias"],
    )
