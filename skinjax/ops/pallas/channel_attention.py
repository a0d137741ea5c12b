"""Fused DaViT channel-attention Pallas kernel.

timm's ChannelAttention (davit.py ChannelBlock; reference loads it inside
``davit_tiny``, loadImageModelClassifier.py:117-121) computes, per head,
an (hd x hd) token-aggregated attention: attn = softmax((k*scale)^T v),
out = q attn^T. The XLA lowering relayouts q/k/v from the (B, N, h*hd)
minor-axis slices into (B, h, N, hd) batch-major layouts for the einsums
and materializes the f32 score tensor in HBM. This kernel keeps the whole
chain — qkv projection, per-head hd x hd scores, softmax, re-expansion,
head merge, output projection — VMEM-resident per batch chunk: HBM sees
one read of x and one write of y.

Backward mirrors ops/pallas/window_attention._strip_bwd: the core kernel
recomputes qkv/scores and emits dqkv and of = q attn^T in the TOKEN layout,
so dwqkv/dwproj/dx downstream are flat (B*N, C) matmuls with no relayouts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


_VMEM_BUDGET = 10 * 1024 * 1024


def _ch_bytes(N: int, C: int, itemsize: int, bwd: bool) -> int:
    """Per-batch-item VMEM estimate: x/y blocks, f32 qkv matmul + cast,
    f32 out accumulation (+ dy/do/dqkv/of for the backward)."""
    base = (2 * N * C * itemsize          # x, y
            + N * 3 * C * (4 + itemsize)  # qkv f32 + cast
            + N * C * (4 + itemsize))     # outs f32 + cast
    if bwd:
        base += (2 * N * C * itemsize         # dy, of
                 + N * C * (4 + itemsize)     # do
                 + N * 3 * C * (4 + itemsize))  # dqkv f32 + cast
    return base


def _pick_cb(B: int, N: int, C: int, itemsize: int, bwd: bool) -> int:
    per = _ch_bytes(N, C, itemsize, bwd)
    cb = 1
    while (cb * 2 <= B and B % (cb * 2) == 0
           and (cb * 2) * per <= _VMEM_BUDGET
           and cb * N < 4096):
        cb *= 2
    return cb


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


def _ch_fwd_kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, y_ref,
                   *, h: int):
    CB, N, C = x_ref.shape
    hd = C // h
    scale = hd ** -0.5
    qkv = (
        jnp.dot(x_ref[:].reshape(CB * N, C), wqkv_ref[:],
                preferred_element_type=jnp.float32)
        + bqkv_ref[:].astype(jnp.float32)
    ).astype(x_ref.dtype).reshape(CB, N, 3 * C)
    outs = []
    for hi in range(h):
        q = qkv[..., hi * hd:(hi + 1) * hd]
        k = qkv[..., C + hi * hd:C + (hi + 1) * hd]
        v = qkv[..., 2 * C + hi * hd:2 * C + (hi + 1) * hd]
        # attn[c,d] = sum_n (k*scale)[n,c] v[n,d]
        s = jax.lax.dot_general(
            k, v, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        p = jax.nn.softmax(s, axis=-1).astype(x_ref.dtype)
        # out[n,c] = sum_d p[c,d] q[n,d]
        outs.append(jax.lax.dot_general(
            q, p, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ))
    of = jnp.concatenate(outs, axis=-1).astype(x_ref.dtype).reshape(
        CB * N, C)
    y_ref[:] = (
        jnp.dot(of, wproj_ref[:], preferred_element_type=jnp.float32)
        + bproj_ref[:].astype(jnp.float32)
    ).astype(x_ref.dtype).reshape(CB, N, C)


def _ch_call(x, wqkv, bqkv, wproj, bproj, *, num_heads: int, bwd: bool,
             dy=None):
    B, N, C = x.shape
    CB = _pick_cb(B, N, C, x.dtype.itemsize, bwd)
    blk = pl.BlockSpec((CB, N, C), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    blk3 = pl.BlockSpec((CB, N, 3 * C), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    rep2 = lambda b: (0, 0)
    rep1 = lambda b: (0,)
    w2 = lambda shape: pl.BlockSpec(shape, rep2, memory_space=pltpu.VMEM)
    w1 = lambda shape: pl.BlockSpec(shape, rep1, memory_space=pltpu.VMEM)
    if not bwd:
        kernel = functools.partial(_ch_fwd_kernel, h=num_heads)
        return pl.pallas_call(
            kernel,
            grid=(B // CB,),
            in_specs=[blk, w2((C, 3 * C)), w1((3 * C,)), w2((C, C)),
                      w1((C,))],
            out_specs=blk,
            out_shape=jax.ShapeDtypeStruct((B, N, C), x.dtype),
            interpret=_interpret(),
        )(x, wqkv, bqkv, wproj, bproj)
    kernel = functools.partial(_ch_bwd_kernel, h=num_heads)
    return pl.pallas_call(
        kernel,
        grid=(B // CB,),
        in_specs=[blk, blk, w2((C, 3 * C)), w1((3 * C,)), w2((C, C))],
        out_specs=[blk3, blk],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, 3 * C), x.dtype),
            jax.ShapeDtypeStruct((B, N, C), x.dtype),
        ],
        interpret=_interpret(),
    )(x, dy, wqkv, bqkv, wproj)


def _ch_bwd_kernel(x_ref, dy_ref, wqkv_ref, bqkv_ref, wproj_ref,
                   dqkv_ref, of_ref, *, h: int):
    CB, N, C = x_ref.shape
    hd = C // h
    scale = hd ** -0.5
    qkv = (
        jnp.dot(x_ref[:].reshape(CB * N, C), wqkv_ref[:],
                preferred_element_type=jnp.float32)
        + bqkv_ref[:].astype(jnp.float32)
    ).astype(x_ref.dtype).reshape(CB, N, 3 * C)
    # do = dy @ wproj^T
    do = jax.lax.dot_general(
        dy_ref[:].reshape(CB * N, C), wproj_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x_ref.dtype).reshape(CB, N, C)

    dqs, dks, dvs, ofs = [], [], [], []
    for hi in range(h):
        q = qkv[..., hi * hd:(hi + 1) * hd]
        k = qkv[..., C + hi * hd:C + (hi + 1) * hd]
        v = qkv[..., 2 * C + hi * hd:2 * C + (hi + 1) * hd]
        do_h = do[..., hi * hd:(hi + 1) * hd]
        s = jax.lax.dot_general(
            k, v, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        p = jax.nn.softmax(s, axis=-1)  # f32 for exact softmax bwd
        pb = p.astype(x_ref.dtype)
        # of = q p^T  (out[n,c] = sum_d p[c,d] q[n,d])
        ofs.append(jax.lax.dot_general(
            q, pb, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ))
        # dq[n,d] = sum_c do[n,c] p[c,d]
        dqs.append(jax.lax.dot_general(
            do_h, pb, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ))
        # dP[c,d] = sum_n do[n,c] q[n,d]
        dp = jax.lax.dot_general(
            do_h, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        da = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
              * scale).astype(x_ref.dtype)
        # dk[n,c] = sum_d v[n,d] dA[c,d] (scale folded into dA)
        dks.append(jax.lax.dot_general(
            v, da, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ))
        # dv[n,d] = sum_c k[n,c] dA[c,d] (scale folded into dA)
        dvs.append(jax.lax.dot_general(
            k, da, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ))
    dqkv_ref[:] = jnp.concatenate(
        dqs + dks + dvs, axis=-1).astype(x_ref.dtype)
    of_ref[:] = jnp.concatenate(ofs, axis=-1).astype(x_ref.dtype)


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
    dqkv, of = _ch_call(x, wqkv, bqkv, wproj, None, num_heads=num_heads,
                        bwd=True, dy=dy)
    xf = x.reshape(B * N, C)
    dyf = dy.reshape(B * N, C)
    dqkvf = dqkv.reshape(B * N, 3 * C)
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
