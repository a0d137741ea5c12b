"""Fused DaViT channel-attention Pallas kernel (block-diagonal form).

timm's ChannelAttention (davit.py ChannelBlock; reference loads it inside
``davit_tiny``, loadImageModelClassifier.py:117-121) computes, per head,
an (hd x hd) token-aggregated attention: attn = softmax((k*scale)^T v),
out = q attn^T. The XLA lowering relayouts q/k/v from the (B, N, h*hd)
minor-axis slices into (B, h, N, hd) batch-major layouts for the einsums
and materializes the f32 score tensor in HBM.

This kernel keeps the chain VMEM-resident per batch chunk AND avoids
per-head tensors entirely: with hd << 128 each (N, hd) head slice pads to
128 lanes (a 4x VMEM/VPU waste at hd=32 that OOM'd the 16M scoped-vmem
limit at stage0 N=3136). Instead the scores are computed full-C —
s = (k*scale)^T v is (C, C) and contains every per-head (hd x hd) block on
its diagonal — and a block-diagonal iota mask turns the softmax into the
per-head softmax: masked entries get -inf, so cross-head probabilities are
exactly 0 and out = q @ P^T confines to the diagonal blocks. All dots are
full-C MXU matmuls; the extra FLOPs on the masked-out score entries are
~h x a (C x C)-sized dot — noise next to the N*C*3C qkv projection.

Backward mirrors ops/pallas/window_attention._strip_bwd: the core kernel
recomputes q/k/v and the masked softmax and emits dq/dk/dv and
of = q P^T in the TOKEN layout, so dwqkv/dwproj/dx downstream are flat
(B*N, C) matmuls with no relayouts. p=0 outside the blocks makes the
softmax backward block-local automatically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


_VMEM_BUDGET = 10 * 1024 * 1024


def _ch_bytes(N: int, C: int, itemsize: int, bwd: bool) -> int:
    """Per-batch-item VMEM estimate for the block-diagonal kernel: x/y
    blocks, q/k/v in compute dtype, one live f32 (N, C) dot result at a
    time, the f32 out accumulation (+ dy/do/dq/dk/dv/of for backward).
    Scores are (C, C) — negligible."""
    base = (2 * N * C * itemsize      # x, y
            + 3 * N * C * itemsize    # q, k, v
            + N * C * 4               # live f32 dot result
            + N * C * (4 + itemsize))  # out f32 + cast
    if bwd:
        base += (2 * N * C * itemsize       # dy, do
                 + 4 * N * C * itemsize     # dq, dk, dv, of outputs
                 + N * C * 4)               # extra live f32
    return base


def _pick_cb(B: int, N: int, C: int, itemsize: int, bwd: bool) -> int:
    per = _ch_bytes(N, C, itemsize, bwd)
    cb = 1
    while (cb * 2 <= B and B % (cb * 2) == 0
           and (cb * 2) * per <= _VMEM_BUDGET):
        cb *= 2
    return cb


import os

# token-count ceiling for the fused path: long-N stages keep per-grid-step
# compute small relative to launch/assembly overhead, and measured SLOWER
# than XLA (A/B in docs/DESIGN.md §5b); default lets every fitting stage in
_MAX_N = int(os.environ.get("SKINJAX_CHATTN_MAXN", "100000") or 100000)


def channel_attention_supported(N: int, C: int, num_heads: int,
                                itemsize: int = 2) -> bool:
    """True when one batch item fits the scoped-vmem budget (the backward
    is the larger kernel, so it gates)."""
    return (C % num_heads == 0
            and N <= _MAX_N
            and _ch_bytes(N, C, itemsize, bwd=True) <= _VMEM_BUDGET)


def channel_attention_reference(x, wqkv, bqkv, wproj, bproj, num_heads):
    """Einsum reference (mirrors davit.DaViTChannelAttention)."""
    B, N, C = x.shape
    h = num_heads
    hd = C // h
    qkv = x @ wqkv + bqkv
    q = qkv[..., :C].reshape(B, N, h, hd)
    k = qkv[..., C:2 * C].reshape(B, N, h, hd)
    v = qkv[..., 2 * C:].reshape(B, N, h, hd)
    scale = hd ** -0.5
    attn = jnp.einsum("bnhc,bnhd->bhcd", k * scale, v,
                      preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhcd,bnhd->bnhc", attn, q)
    return out.reshape(B, N, C) @ wproj + bproj


def _head_mask(C: int, hd: int):
    row = lax.broadcasted_iota(jnp.int32, (C, C), 0)
    col = lax.broadcasted_iota(jnp.int32, (C, C), 1)
    return (row // hd) == (col // hd)


def _proj(x2d, w_ref, b_ref, dt):
    y = jnp.dot(x2d, w_ref[:], preferred_element_type=jnp.float32)
    if b_ref is not None:
        y = y + b_ref[:].astype(jnp.float32)
    return y.astype(dt)


def _ch_fwd_kernel(x_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref,
                   wproj_ref, bproj_ref, y_ref, *, h: int):
    CB, N, C = x_ref.shape
    hd = C // h
    scale = hd ** -0.5
    dt = x_ref.dtype
    xf = x_ref[:].reshape(CB * N, C)
    q = _proj(xf, wq_ref, bq_ref, dt).reshape(CB, N, C)
    k = _proj(xf, wk_ref, bk_ref, dt).reshape(CB, N, C)
    v = _proj(xf, wv_ref, bv_ref, dt).reshape(CB, N, C)
    # s[b, c, d] = sum_n (k*scale)[b, n, c] v[b, n, d]  — full C x C; only
    # the per-head diagonal blocks survive the masked softmax
    s = lax.dot_general(
        k, v, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    p = jax.nn.softmax(
        jnp.where(_head_mask(C, hd)[None], s, -jnp.inf), axis=-1
    ).astype(dt)
    # out[b, n, i] = sum_j p[b, i, j] q[b, n, j]
    out = lax.dot_general(
        q, p, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dt)
    y_ref[:] = _proj(out.reshape(CB * N, C), wproj_ref, bproj_ref,
                     dt).reshape(CB, N, C)


def _ch_bwd_kernel(x_ref, dy_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref,
                   bv_ref, wproj_ref, dq_ref, dk_ref, dv_ref, of_ref,
                   *, h: int):
    CB, N, C = x_ref.shape
    hd = C // h
    scale = hd ** -0.5
    dt = x_ref.dtype
    xf = x_ref[:].reshape(CB * N, C)
    q = _proj(xf, wq_ref, bq_ref, dt).reshape(CB, N, C)
    k = _proj(xf, wk_ref, bk_ref, dt).reshape(CB, N, C)
    v = _proj(xf, wv_ref, bv_ref, dt).reshape(CB, N, C)
    # do = dy @ wproj^T
    do = lax.dot_general(
        dy_ref[:].reshape(CB * N, C), wproj_ref[:],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dt).reshape(CB, N, C)

    s = lax.dot_general(
        k, v, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    p = jax.nn.softmax(
        jnp.where(_head_mask(C, hd)[None], s, -jnp.inf), axis=-1
    )  # f32 for the exact softmax backward; 0 outside the blocks
    pb = p.astype(dt)
    # of[b, n, i] = sum_j p[b, i, j] q[b, n, j]
    of_ref[:] = lax.dot_general(
        q, pb, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dt)
    # dq[b, n, d] = sum_c do[b, n, c] p[b, c, d]
    dq_ref[:] = lax.dot_general(
        do, pb, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dt)
    # dP[b, c, d] = sum_n do[b, n, c] q[b, n, d]
    dp = lax.dot_general(
        do, q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    da = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
          * scale).astype(dt)
    # dk[b, n, c] = sum_d v[b, n, d] dA[b, c, d]  (scale folded into dA)
    dk_ref[:] = lax.dot_general(
        v, da, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dt)
    # dv[b, n, d] = sum_c k[b, n, c] dA[b, c, d]
    dv_ref[:] = lax.dot_general(
        k, da, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dt)


def _ch_call(x, wqkv, bqkv, wproj, bproj, *, num_heads: int, bwd: bool,
             dy=None):
    B, N, C = x.shape
    CB = _pick_cb(B, N, C, x.dtype.itemsize, bwd)
    # weight slices are cut OUTSIDE the kernel: qkv[..., C:2C] inside VMEM
    # would be a non-128-aligned lane slice (relayout); (C, C) weight
    # slices in XLA are free
    wq, wk, wv = wqkv[:, :C], wqkv[:, C:2 * C], wqkv[:, 2 * C:]
    bq, bk, bv = bqkv[:C], bqkv[C:2 * C], bqkv[2 * C:]
    blk = pl.BlockSpec((CB, N, C), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    rep2 = lambda b: (0, 0)
    rep1 = lambda b: (0,)
    w2 = pl.BlockSpec((C, C), rep2, memory_space=pltpu.VMEM)
    w1 = pl.BlockSpec((C,), rep1, memory_space=pltpu.VMEM)
    if not bwd:
        kernel = functools.partial(_ch_fwd_kernel, h=num_heads)
        return pl.pallas_call(
            kernel,
            grid=(B // CB,),
            in_specs=[blk, w2, w2, w2, w1, w1, w1, w2, w1],
            out_specs=blk,
            out_shape=jax.ShapeDtypeStruct((B, N, C), x.dtype),
            interpret=_interpret(),
        )(x, wq, wk, wv, bq, bk, bv, wproj, bproj)
    kernel = functools.partial(_ch_bwd_kernel, h=num_heads)
    return pl.pallas_call(
        kernel,
        grid=(B // CB,),
        in_specs=[blk, blk, w2, w2, w2, w1, w1, w1, w2],
        out_specs=[blk, blk, blk, blk],
        out_shape=[jax.ShapeDtypeStruct((B, N, C), x.dtype)] * 4,
        interpret=_interpret(),
    )(x, dy, wq, wk, wv, bq, bk, bv, wproj)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def channel_attention(x, wqkv, bqkv, wproj, bproj, num_heads):
    """Fused channel MHA. x (B, N, C). Differentiable in x and weights."""
    return _ch_call(x, wqkv, bqkv, wproj, bproj, num_heads=num_heads,
                    bwd=False)


def _ca_fwd(x, wqkv, bqkv, wproj, bproj, num_heads):
    y = _ch_call(x, wqkv, bqkv, wproj, bproj, num_heads=num_heads,
                 bwd=False)
    return y, (x, wqkv, bqkv, wproj)


def _ca_bwd(num_heads, res, dy):
    x, wqkv, bqkv, wproj = res
    B, N, C = x.shape
    f32 = jnp.float32
    dq, dk, dv, of = _ch_call(x, wqkv, bqkv, wproj, None,
                              num_heads=num_heads, bwd=True, dy=dy)
    xf = x.reshape(B * N, C)
    dyf = dy.reshape(B * N, C)
    dqkvf = jnp.concatenate(
        [dq.reshape(B * N, C), dk.reshape(B * N, C), dv.reshape(B * N, C)],
        axis=-1)
    off = of.reshape(B * N, C)
    dwproj = jnp.dot(off.T, dyf, preferred_element_type=f32)
    dbproj = jnp.sum(dyf.astype(f32), axis=0)
    dwqkv = jnp.dot(xf.T, dqkvf, preferred_element_type=f32)
    dbqkv = jnp.sum(dqkvf.astype(f32), axis=0)
    dx = jnp.dot(dqkvf, wqkv.astype(dqkvf.dtype).T,
                 preferred_element_type=f32).astype(x.dtype).reshape(B, N, C)
    return (
        dx,
        dwqkv.astype(wqkv.dtype),
        dbqkv.astype(bqkv.dtype),
        dwproj.astype(wproj.dtype),
        dbproj.astype(wproj.dtype),
    )


channel_attention.defvjp(_ca_fwd, _ca_bwd)
