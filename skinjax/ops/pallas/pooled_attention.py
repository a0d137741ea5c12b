"""Fused pooled (cross-shaped) attention for MViTv2's MultiScaleAttention.

MViTv2's attention differs from the global core in two ways that kept it
on the XLA einsum path (and at 495.9 img/s — the slowest measured
published-table family, DESIGN §5g-b):

- q and k/v have DIFFERENT token counts (per-head conv pooling with
  independent strides, timm mvitv2.py MultiScaleAttention), and
- the additive bias is PER-SAMPLE and decomposed: two einsums of the
  pooled q against the rel_pos_h / rel_pos_w tables produce
  ``bias_h (B, h, Nq, Kh)`` / ``bias_w (B, h, Nq, Kw)`` which are
  broadcast-added over the key grid's rows/columns
  (timm cal_rel_pos_type).

The v5e profile of the mvitv2_small train step (bench/trace_mvit.py,
127 ms total) shows ~40% of the step in exactly this chain: the f32
(B, h, Nq, Nk) score/softmax planes (784x784 at the stage-1 transition),
their layout copies, and — worst per byte — the SIX-DIMENSIONAL f32
broadcasts (B, h, qh, qw, kh, kw) XLA materializes to add the decomposed
bias (315 MB each at stage 1).

This kernel keeps the whole chain VMEM-resident per (head, batch) grid
cell and NEVER materializes the bias at all: the decomposed terms are
expanded inside the kernel with two tiny static 0/1 matmuls

    bias = bias_h @ Eh + bias_w @ Ew,
    Eh[i, m] = [m // Kw == i],   Ew[j, m] = [m % Kw == j]

(Eh/Ew built from broadcasted_iota in VMEM — zero HBM traffic, MXU ops).
The backward is stored-probabilities (the §5i-b default): 4 dots per
cell plus d_bias_h = ds @ Eh^T and d_bias_w = ds @ Ew^T, emitted
per-sample (they chain to q and the rel-pos tables through the XLA
einsums outside).

Reference semantics: timm ``mvitv2.py`` MultiScaleAttention with
mode='conv', pool_first=False, residual pooling OUTSIDE the kernel
(models/backbones/mvit.py; loads via loadImageModelClassifier.py:115-150).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from skinjax.ops.pallas.window_attention import _interpret, _pad_n


def pooled_attention_reference(q, k, v, bias_h, bias_w, k_size):
    """Pure-XLA oracle. q: (B, h, Nq, hd); k/v: (B, h, Nk, hd);
    bias_h: (B, h, Nq, Kh); bias_w: (B, h, Nq, Kw); Nk == Kh*Kw.
    Returns (B, h, Nq, hd) in q.dtype, f32 logit accumulation — identical
    math to the einsum branch of models/backbones/mvit.py."""
    B, h, Nq, hd = q.shape
    Kh, Kw = k_size
    s = jnp.einsum("bhnd,bhmd->bhnm", q * (hd ** -0.5), k,
                   preferred_element_type=jnp.float32)
    bias = (bias_h[..., :, None] + bias_w[..., None, :]).reshape(
        B, h, Nq, Kh * Kw)
    s = s + bias.astype(s.dtype)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v)


def _expanders(Npk: int, Kh: int, Kw: int, dtype):
    """Static 0/1 expansion matrices in VMEM (from iota, no HBM input):
    Eh (Kh, Npk), Ew (Kw, Npk) with zero columns for padded keys."""
    col = jax.lax.broadcasted_iota(jnp.int32, (Kh, Npk), 1)
    rowh = jax.lax.broadcasted_iota(jnp.int32, (Kh, Npk), 0)
    eh = jnp.where((col // Kw == rowh) & (col < Kh * Kw), 1.0, 0.0)
    colw = jax.lax.broadcasted_iota(jnp.int32, (Kw, Npk), 1)
    roww = jax.lax.broadcasted_iota(jnp.int32, (Kw, Npk), 0)
    ew = jnp.where((colw % Kw == roww) & (colw < Kh * Kw), 1.0, 0.0)
    return eh.astype(dtype), ew.astype(dtype)


def _fwd_kernel(q_ref, k_ref, v_ref, bh_ref, bw_ref, o_ref, *maybe_p,
                Kh: int, Kw: int, nk_real: int, scale: float):
    p_out = maybe_p[0] if maybe_p else None
    _, Npq, hd = q_ref.shape
    Npk = k_ref.shape[1]
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (Npq, Npk)
    eh, ew = _expanders(Npk, Kh, Kw, q.dtype)
    s = s + jax.lax.dot_general(
        bh_ref[0], eh, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    s = s + jax.lax.dot_general(
        bw_ref[0], ew, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (Npq, Npk), 1)
    s = s + jnp.where(col < nk_real, 0.0, -1e9)
    p = jax.nn.softmax(s, axis=-1)
    if p_out is not None:
        p_out[0] = p
    o_ref[0] = jax.lax.dot_general(
        p.astype(q.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, p_ref,
                dq_ref, dk_ref, dv_ref, dbh_ref, dbw_ref, *,
                Kh: int, Kw: int, scale: float):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    pf = p_ref[0]  # (Npq, Npk) f32
    pb = pf.astype(q.dtype)
    # dv = P^T @ do
    dv_ref[0] = jax.lax.dot_general(
        pb, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)
    # dp = do @ v^T
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = pf * (dp - jnp.sum(dp * pf, axis=-1, keepdims=True))  # f32
    # d_bias: per-sample reductions over the key grid via the expanders
    Npk = pf.shape[-1]
    eh, ew = _expanders(Npk, Kh, Kw, jnp.float32)
    dbh_ref[0] = jax.lax.dot_general(
        ds, eh, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dbh_ref.dtype)
    dbw_ref[0] = jax.lax.dot_general(
        ds, ew, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dbw_ref.dtype)
    dsb = ds.astype(q.dtype)
    dq_ref[0] = (jax.lax.dot_general(
        dsb, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale).astype(dq_ref.dtype)
    dk_ref[0] = (jax.lax.dot_general(
        dsb, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale).astype(dk_ref.dtype)


def _pad16(n: int) -> int:
    return -(-n // 16) * 16


# Per-cell VMEM ceiling for the f32 P plane (Npq x Npk x 4 bytes must fit in
# one VMEM block alongside q/k/v/do — 4 MB = 1024x1024 f32, the same ceiling
# the §5m sequence-cap measurements found for the global core's bias path)
# and a whole-call ceiling for the stored-P residual (G x Npq x Npk f32 HBM
# bytes per fused layer), mirroring global_attention._store_p_ok.
_P_CELL_BYTES = 4 * 1024 * 1024
_P_RESIDUAL_BYTES = 256 * 1024 * 1024


def pooled_attn_ok(B: int, h: int, Nq: int, Nk: int) -> bool:
    """Capacity gate for fusing one pooled-attention block: True when the
    per-cell f32 P block fits VMEM and the stored-P residual for the call
    stays under the per-layer HBM ceiling (ADVICE r4: the equal-length case
    previously had NO upper bound — Nq=Nk>=2048, e.g. stride_kv=1 at an
    early stage or larger inputs, is Mosaic-helper-crash territory per
    DESIGN §5l/§5m)."""
    npq, npk = _pad16(Nq), _pad16(Nk)
    if npq * npk * 4 > _P_CELL_BYTES:
        return False
    return B * h * npq * npk * 4 <= _P_RESIDUAL_BYTES


def _fwd_core(q, k, v, bh, bw, *, k_size, emit_p: bool):
    B, h, Nq, hd = q.shape
    Nk = k.shape[2]
    Kh, Kw = k_size
    Npq, Npk = _pad16(Nq), _pad16(Nk)
    q = _pad_n(q, Npq, (2,))
    k, v = (_pad_n(t, Npk, (2,)) for t in (k, v))
    bh = _pad_n(bh, Npq, (2,))
    bw = _pad_n(bw, Npq, (2,))
    # collapse (B, h) into one grid axis; blocks are single (b, h) cells
    q, k, v, bh, bw = (t.reshape(-1, *t.shape[2:]) for t in (q, k, v, bh, bw))
    G = B * h

    kernel = functools.partial(_fwd_kernel, Kh=Kh, Kw=Kw, nk_real=Nk,
                               scale=hd ** -0.5)
    blk = lambda t: pl.BlockSpec((1,) + t.shape[1:], lambda g: (g, 0, 0),
                                 memory_space=pltpu.VMEM)
    out_specs = [blk(q)]
    out_shape = [jax.ShapeDtypeStruct((G, Npq, hd), q.dtype)]
    if emit_p:
        out_specs.append(pl.BlockSpec((1, Npq, Npk), lambda g: (g, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((G, Npq, Npk), jnp.float32))
    out = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[blk(q), blk(k), blk(v), blk(bh), blk(bw)],
        out_specs=out_specs if emit_p else out_specs[0],
        out_shape=out_shape if emit_p else out_shape[0],
        interpret=_interpret(),
    )(q, k, v, bh, bw)
    if emit_p:
        o, p = out
    else:
        o, p = out, None
    o = o.reshape(B, h, Npq, hd)[:, :, :Nq, :]
    return o, p


def _bwd_core(q, k, v, do, p, *, k_size):
    B, h, Nq, hd = q.shape
    Nk = k.shape[2]
    Kh, Kw = k_size
    Npq, Npk = _pad16(Nq), _pad16(Nk)
    q, do = (_pad_n(t, Npq, (2,)) for t in (q, do))
    k, v = (_pad_n(t, Npk, (2,)) for t in (k, v))
    q, k, v, do = (t.reshape(-1, *t.shape[2:]) for t in (q, k, v, do))
    G = B * h

    kernel = functools.partial(_bwd_kernel, Kh=Kh, Kw=Kw, scale=hd ** -0.5)
    blk = lambda t: pl.BlockSpec((1,) + t.shape[1:], lambda g: (g, 0, 0),
                                 memory_space=pltpu.VMEM)
    pblk = pl.BlockSpec((1, Npq, Npk), lambda g: (g, 0, 0),
                        memory_space=pltpu.VMEM)
    obl = lambda shp: pl.BlockSpec((1,) + shp[1:], lambda g: (g, 0, 0),
                                   memory_space=pltpu.VMEM)
    shapes = [
        jax.ShapeDtypeStruct((G, Npq, hd), q.dtype),   # dq
        jax.ShapeDtypeStruct((G, Npk, hd), q.dtype),   # dk
        jax.ShapeDtypeStruct((G, Npk, hd), q.dtype),   # dv
        jax.ShapeDtypeStruct((G, Npq, Kh), jnp.float32),  # dbh
        jax.ShapeDtypeStruct((G, Npq, Kw), jnp.float32),  # dbw
    ]
    dq, dk, dv, dbh, dbw = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[blk(q), blk(k), blk(v), blk(do), pblk],
        out_specs=[obl(s.shape) for s in shapes],
        out_shape=shapes,
        interpret=_interpret(),
    )(q, k, v, do, p)
    rs = lambda t, N: t.reshape(B, h, *t.shape[1:])[:, :, :N, :]
    return (rs(dq, Nq), rs(dk, Nk), rs(dv, Nk), rs(dbh, Nq), rs(dbw, Nq))


def query_chunks(Nq: int, max_rows: int = 1024):
    """Smallest chunk count C dividing Nq with Nq/C <= max_rows, or None.

    Pooled attention is EXACTLY separable along the query axis (the softmax
    normalizes over keys only, and bias_h/bias_w are per-query-row), so a
    large-Nq block can fold query chunks into the grid axis with no kernel
    change — the §5l stage-0 3136x196 block becomes 4 grid cells of the
    784x196 shape the stage-1 transition already compiles."""
    if Nq <= max_rows:
        return 1
    # c capped at 32: beyond that the per-cell work is too small to feed
    # the MXU and the k/v broadcast duplication dominates — fall back to
    # XLA instead of a degenerate grid (e.g. a prime Nq would otherwise
    # "chunk" into Nq rows of 1)
    for c in range(2, 33):
        if Nq % c == 0 and Nq // c <= max_rows:
            return c
    return None


def pooled_attention_chunked(q, k, v, bias_h, bias_w, k_size, chunks: int):
    """pooled_attention with the query axis split into ``chunks`` grid
    cells (folded into the head axis; k/v broadcast per chunk). Exact —
    same math, smaller per-cell VMEM blocks."""
    if chunks == 1:
        return pooled_attention(q, k, v, bias_h, bias_w, k_size)
    B, h, Nq, hd = q.shape
    Nk = k.shape[2]
    C = chunks
    assert Nq % C == 0, (Nq, C)
    fold_q = lambda t: t.reshape(B, h, C, Nq // C, t.shape[-1]).reshape(
        B, h * C, Nq // C, t.shape[-1])
    rep_kv = lambda t: jnp.broadcast_to(
        t[:, :, None], (B, h, C, Nk, t.shape[-1])).reshape(
        B, h * C, Nk, t.shape[-1])
    out = pooled_attention(
        fold_q(q), rep_kv(k), rep_kv(v), fold_q(bias_h), fold_q(bias_w),
        k_size)
    return out.reshape(B, h, C, Nq // C, hd).reshape(B, h, Nq, hd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def pooled_attention(q, k, v, bias_h, bias_w, k_size):
    """Fused MViT pooled attention. q: (B, h, Nq, hd); k/v: (B, h, Nk, hd);
    bias_h: (B, h, Nq, Kh); bias_w: (B, h, Nq, Kw); ``k_size=(Kh, Kw)``
    static with Nk == Kh*Kw. All five tensor args are differentiable
    (bias grads chain to q and the rel-pos tables through the caller's
    einsums). Returns (B, h, Nq, hd) in q.dtype."""
    o, _ = _fwd_core(q, k, v, bias_h, bias_w, k_size=k_size, emit_p=False)
    return o


def _pa_fwd(q, k, v, bias_h, bias_w, k_size):
    o, p = _fwd_core(q, k, v, bias_h, bias_w, k_size=k_size, emit_p=True)
    return o, (q, k, v, p)


def _pa_bwd(k_size, res, dy):
    q, k, v, p = res
    return _bwd_core(q, k, v, dy, p, k_size=k_size)


pooled_attention.defvjp(_pa_fwd, _pa_bwd)
