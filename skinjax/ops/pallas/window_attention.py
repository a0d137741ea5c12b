"""Fused windowed-attention Pallas kernel (Swin / DaViT spatial blocks).

The XLA lowering of window attention materializes, per block, the qkv tensor
in a 5-D (nB, N, 3, h, hd) layout (relayout copies measured at ~6 ms/step for
davit_tiny B=64 on v5e), the f32 (nB, h, N, N) score tensor, its softmax, and
the head-merge transpose — 6+ HBM round trips of window-local data. This
kernel runs the whole chain — qkv projection, per-head scores (+ optional
relative-position bias and shifted-window mask), softmax, attention·V,
head merge, output projection — VMEM-resident per block of WINB windows:
HBM sees one read of x and one write of y (plus the weights).

Backward is flash-style but SPLIT: the projection matmuls (qkv recompute,
dwqkv/dwproj/dx) run as plain XLA MXU matmuls, and only the attention core
(scores -> softmax -> dq/dk/dv, recomputed per block, never touching HBM
with an (nB, h, N, N) tensor) runs as a Pallas kernel gridded over
(head-groups, window-blocks). The earlier design that unrolled all heads
inside one backward kernel crashed the v5e Mosaic compiler for h >= 6
(~6 dots x h in one kernel); the core kernel has a constant op count.

Matches the einsum reference in ``window_attention_reference`` (used by the
parity tests); the module integration is ``davit.DaViTWindowAttention`` /
``transformer_zoo.WindowAttention`` with ``SKINJAX_WINATTN=pallas``.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def winattn_mode() -> str:
    """Resolve the window-attention implementation default for the zoo
    wrappers (DaViT/Swin), called at module-apply time so the backend is
    known.

    - ``SKINJAX_EXPORT_COMPAT`` (the native ONNX exporter is tracing):
      always "" — the emitter cannot express ``pallas_call``, so the XLA
      form is forced even over an explicit env override.
    - ``SKINJAX_WINATTN`` set: returned verbatim ("pallas" strip kernel,
      "pallas-pad" padded-window kernel, "einsum", anything else = XLA).
    - unset: "pallas" when the default backend is TPU (measured +14%
      davit / +30% swin over XLA, docs/DESIGN.md §5b-r3), "" elsewhere
      (interpret-mode Pallas on CPU is parity-correct but slow).
    """
    if os.environ.get("SKINJAX_EXPORT_COMPAT", "") == "1":
        return ""
    v = os.environ.get("SKINJAX_WINATTN")
    if v is not None:
        return v
    try:
        if jax.default_backend() == "tpu":
            return "pallas"
    except Exception:  # backend init can fail in exotic harnesses
        pass
    return ""


_VMEM_BUDGET = 10 * 1024 * 1024  # scoped-vmem limit is 16M; leave headroom


def _pick_winb(nB: int, n_win: int, per_window_bytes: int) -> int:
    """Windows per grid step: sized so the block's VMEM footprint stays
    under budget (the v5e scoped-vmem limit is 16M — exceeding it kills the
    compile, observed as remote-compile-helper exit 1), a divisor of nB,
    ≤ 32 (larger blocks measured no faster), and aligned with the mask
    period: either a multiple of n_win (block tiles the whole mask) or a
    divisor of it (the block maps to a contiguous mask slice selected by
    grid index — Swin stage 1 has n_win=64 distinct shifted masks, far over
    the VMEM-safe block size)."""
    target = min(32, max(1, _VMEM_BUDGET // max(per_window_bytes, 1)))
    if n_win <= target:
        w = n_win
        while w * 2 <= target and nB % (w * 2) == 0:
            w *= 2
        while nB % w != 0 and w > 1:  # safety: must divide nB
            w //= 2
        return max(1, w)
    # n_win over budget: largest divisor of n_win within target (divides nB
    # too, since n_win | nB by construction of the window batch)
    for w in range(target, 0, -1):
        if n_win % w == 0 and nB % w == 0:
            return w
    return 1


def _fwd_window_bytes(Np: int, C: int, itemsize: int) -> int:
    """Per-window VMEM estimate for the forward kernel: x/y/of blocks and
    the cast qkv in the input dtype, the f32 qkv matmul output and per-head
    outs, and one f32 score/prob pair."""
    return Np * (6 * C * itemsize + 12 * C + 4 * C + 8 * Np)


def _bwd_window_bytes(Np: int, CG: int, itemsize: int) -> int:
    """Per-window VMEM estimate for the backward core: 8 channel-group
    blocks (q/k/v/do/dq/dk/dv/of) plus f32 s/p/dp/ds transients."""
    return Np * (8 * CG * itemsize + 8 * CG + 16 * Np)


# ---------------------------------------------------------------------------
# reference (pure XLA) — also the source of truth for tests
# ---------------------------------------------------------------------------

def window_attention_reference(x, wqkv, bqkv, wproj, bproj, num_heads,
                               bias=None, mask=None):
    """x: (nB, N, C); bias: (h, N, N) additive; mask: (nW, N, N) additive."""
    nB, N, C = x.shape
    h = num_heads
    hd = C // h
    qkv = x @ wqkv.astype(x.dtype) + bqkv.astype(x.dtype)
    q = qkv[..., :C].reshape(nB, N, h, hd)
    k = qkv[..., C:2 * C].reshape(nB, N, h, hd)
    v = qkv[..., 2 * C:].reshape(nB, N, h, hd)
    attn = jnp.einsum("bnhd,bmhd->bhnm", q * (hd ** -0.5), k,
                      preferred_element_type=jnp.float32)
    if bias is not None:
        attn = attn + bias[None].astype(attn.dtype)
    if mask is not None:
        nW = mask.shape[0]
        attn = attn.reshape(nB // nW, nW, h, N, N) + mask[None, :, None].astype(
            attn.dtype)
        attn = attn.reshape(nB, h, N, N)
    attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(nB, N, C)
    return out @ wproj.astype(x.dtype) + bproj.astype(x.dtype)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, bias_ref,
                mask_ref, y_ref, *, h: int, n_win: int,
                has_bias: bool, has_mask: bool, n_real: int):
    WINB, N, C = x_ref.shape
    hd = C // h
    scale = hd ** -0.5
    # keys beyond the real window length are padding: force -inf scores
    col = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    keypad = jnp.where(col < n_real, 0.0, -1e9).astype(jnp.float32)
    xf = x_ref[:].reshape(WINB * N, C)
    qkv = (
        jnp.dot(xf, wqkv_ref[:], preferred_element_type=jnp.float32)
        + bqkv_ref[:].astype(jnp.float32)
    ).astype(x_ref.dtype)
    qkv = qkv.reshape(WINB, N, 3 * C)

    outs = []
    for hi in range(h):
        q = qkv[..., hi * hd:(hi + 1) * hd]
        k = qkv[..., C + hi * hd:C + (hi + 1) * hd]
        v = qkv[..., 2 * C + hi * hd:2 * C + (hi + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # (WINB, N, N)
        s = s + keypad[None]
        if has_bias:
            s = s + bias_ref[hi].astype(jnp.float32)[None]
        if has_mask:
            m = mask_ref[:].astype(jnp.float32)  # (min(n_win, WINB), N, N)
            reps = WINB // m.shape[0]
            if reps > 1:
                m = jnp.concatenate([m] * reps, axis=0)
            s = s + m
        p = jax.nn.softmax(s, axis=-1).astype(x_ref.dtype)
        outs.append(jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ))  # (WINB, N, hd)

    # of is NOT written to HBM: the backward core recomputes softmax anyway
    # and emits it there (saves a padded-activation write + read per block)
    of = jnp.concatenate(outs, axis=-1).astype(x_ref.dtype).reshape(
        WINB * N, C)
    y = (
        jnp.dot(of, wproj_ref[:], preferred_element_type=jnp.float32)
        + bproj_ref[:].astype(jnp.float32)
    ).astype(x_ref.dtype)
    y_ref[:] = y.reshape(WINB, N, C)


def _pad_n(t, Np, axes):
    """Zero-pad the given axes of t up to length Np."""
    pads = [(0, 0)] * t.ndim
    for a in axes:
        pads[a] = (0, Np - t.shape[a])
    return jnp.pad(t, pads) if any(p != (0, 0) for p in pads) else t


def _fwd(x, wqkv, bqkv, wproj, bproj, bias, mask, *, num_heads: int):
    """Returns y. No activation residual is saved — the backward recomputes
    qkv (one matmul) and softmax/of (inside its core kernel)."""
    nB, N, C = x.shape
    has_bias = bias is not None
    has_mask = mask is not None
    n_win = mask.shape[0] if has_mask else 1
    # Mosaic can only shape-cast across sublane-aligned dims: pad the window
    # length to a multiple of 16 (padding keys are masked to -inf in-kernel)
    Np = -(-N // 16) * 16
    WINB = _pick_winb(nB, n_win, _fwd_window_bytes(Np, C, x.dtype.itemsize))
    grid = (nB // WINB,)
    n_real, N_in = N, Np
    x_in = _pad_n(x, Np, (1,))
    bias_in = (_pad_n(bias, Np, (1, 2)) if has_bias
               else jnp.zeros((1, 16, 16), jnp.float32))
    mask_in = (_pad_n(mask, Np, (1, 2)) if has_mask
               else jnp.zeros((1, 16, 16), jnp.float32))

    kernel = functools.partial(
        _fwd_kernel, h=num_heads, n_win=n_win,
        has_bias=has_bias, has_mask=has_mask, n_real=n_real,
    )
    rep = lambda i: (0, 0)  # weights: same block every step
    rep3 = lambda i: (0, 0, 0)
    blk = pl.BlockSpec((WINB, N_in, C), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            blk,
            pl.BlockSpec((C, 3 * C), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * C,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec(bias_in.shape, rep3, memory_space=pltpu.VMEM),
            # WINB < n_win: each block sees the contiguous mask slice for
            # its windows (global window j uses mask[j % n_win])
            (pl.BlockSpec((WINB,) + mask_in.shape[1:],
                          lambda i: (i % (n_win // WINB), 0, 0),
                          memory_space=pltpu.VMEM)
             if has_mask and WINB < n_win else
             pl.BlockSpec(mask_in.shape, rep3, memory_space=pltpu.VMEM)),
        ],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((nB, N_in, C), x.dtype),
        interpret=_interpret(),
    )(x_in, wqkv, bqkv, wproj, bproj, bias_in, mask_in)
    return y[:, :N, :]


# ---------------------------------------------------------------------------
# backward kernel — recompute qkv/softmax, emit dx + f32 weight/bias grads
# ---------------------------------------------------------------------------

def _heads_per_group(h: int, hd: int) -> int:
    """Smallest divisor of h whose channel-group width is lane-aligned
    (Mosaic block last dims must be 128-divisible or span the full array);
    falls back to all heads (full-C blocks are always legal)."""
    for g in range(1, h + 1):
        if h % g == 0 and (g * hd) % 128 == 0:
            return g
    return h


def _bwd_core_kernel(q_ref, k_ref, v_ref, do_ref, bias_ref, mask_ref,
                     kmask_ref, pmult_ref, dq_ref, dk_ref, dv_ref, of_ref,
                     dbias_ref, *, hg: int, n_win: int, has_bias: bool,
                     has_mask: bool, has_kmask: bool, has_pmult: bool,
                     n_real: int, scale: float):
    """Attention-core backward for one (head-group, window-block) grid cell:
    recompute scores/softmax, emit dq/dk/dv and of = p·v (the pre-projection
    forward output, recomputed here instead of stored by the forward —
    +dbias accumulated over the inner window-block grid dim)."""
    WINB, N, CG = q_ref.shape
    hd = CG // hg
    col = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    keypad = jnp.where(col < n_real, 0.0, -1e9).astype(jnp.float32)
    i = pl.program_id(1)  # window-block (inner) — dbias accumulates over it

    if has_bias:
        @pl.when(i == 0)
        def _init():
            dbias_ref[:] = jnp.zeros_like(dbias_ref)

    if has_mask:
        m = mask_ref[:].astype(jnp.float32)  # (min(n_win, WINB), N, N)
        reps = WINB // m.shape[0]
        if reps > 1:
            m = jnp.concatenate([m] * reps, axis=0)

    for hi in range(hg):
        sl = slice(hi * hd, (hi + 1) * hd)
        q = q_ref[..., sl]
        k = k_ref[..., sl]
        v = v_ref[..., sl]
        do_h = do_ref[..., sl]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        s = s + keypad[None]
        if has_bias:
            s = s + bias_ref[hi].astype(jnp.float32)[None]
        if has_mask:
            s = s + m
        if has_kmask:
            # per-sample additive key mask (BERT padding): rank-3
            # (WINB, 1, Np), broadcasts over query rows
            s = s + kmask_ref[:].astype(jnp.float32)
        p = jax.nn.softmax(s, axis=-1)  # f32 for exact softmax bwd
        if has_pmult:
            # broadcast attention-prob dropout (flax broadcast_dropout=True:
            # ONE (N, N) keep/keep_prob multiplier shared over batch+heads);
            # out = (p*m) @ v, so dv/of use p*m and dp picks up the m factor
            # BEFORE the softmax vjp
            mlt = pmult_ref[0].astype(jnp.float32)[None]
            pb = (p * mlt).astype(q_ref.dtype)
        else:
            pb = p.astype(q_ref.dtype)
        # of = p @ v (recomputed forward output, feeds dwproj in _bwd_call)
        of_ref[..., sl] = jax.lax.dot_general(
            pb, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(of_ref.dtype)
        # dv = p^T @ do_h
        dv_ref[..., sl] = jax.lax.dot_general(
            pb, do_h, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)
        # dp = do_h @ v^T
        dp = jax.lax.dot_general(
            do_h, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        if has_pmult:
            dp = dp * mlt
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # f32
        if has_bias:
            dbias_ref[hi] += jnp.sum(ds, axis=0)
        dsb = ds.astype(q_ref.dtype)
        dq_ref[..., sl] = (jax.lax.dot_general(
            dsb, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale).astype(dq_ref.dtype)
        dk_ref[..., sl] = (jax.lax.dot_general(
            dsb, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale).astype(dk_ref.dtype)


def _bwd_core(q, k, v, do, bias_in, mask_in, *, num_heads: int,
              has_bias: bool, has_mask: bool, n_win: int, kmask=None,
              pmult=None):
    """q/k/v/do: (nB, N, C) head-major channel layout. ``kmask``: optional
    per-sample additive key mask (nB, N) f32 (global-attention padding;
    constant, no gradient). ``pmult``: optional (N, N) f32 multiplicative
    post-softmax mask — flax broadcast attention-prob dropout, shared over
    batch+heads (constant, no gradient). Returns (dq, dk, dv, of, dbias)
    with dq/dk/dv/of in q.dtype and dbias f32 (h, N, N)."""
    nB, N, C = q.shape
    hd = C // num_heads
    hg = _heads_per_group(num_heads, hd)
    n_groups = num_heads // hg
    Np = -(-N // 16) * 16
    per_win = _bwd_window_bytes(Np, hg * hd, q.dtype.itemsize)
    WINB = _pick_winb(nB, n_win, per_win)
    if pmult is not None:
        # pmult (global-attention dropout; never coexists with the windowed
        # mask) is a fixed (Np, Np) f32 block shared by every grid cell —
        # shrink the batch block until the total stays under budget (WINB is
        # a power of two dividing nB in the n_win=1 global path)
        while WINB > 1 and WINB * per_win + 4 * Np * Np > _VMEM_BUDGET:
            WINB //= 2
    n_real = N
    has_kmask = kmask is not None
    q, k, v, do = (_pad_n(t, Np, (1,)) for t in (q, k, v, do))
    if has_bias:
        bias_in = _pad_n(bias_in, Np, (1, 2))
    else:
        bias_in = jnp.zeros((n_groups * hg, 16, 16), jnp.float32)
    if has_mask:
        mask_in = _pad_n(mask_in, Np, (1, 2))
    else:
        mask_in = jnp.zeros((1, 16, 16), jnp.float32)
    if has_kmask:
        # rank-3 (nB, 1, Np): the block's last two dims (1, Np) span the
        # full array, legal for any WINB (Mosaic last-two-dims rule; WINB
        # can be < 8 for wide-channel models)
        kmask_in = _pad_n(kmask.astype(jnp.float32), Np, (1,))[:, None, :]
    else:
        kmask_in = jnp.zeros((1, 1, 16), jnp.float32)
    has_pmult = pmult is not None
    if has_pmult:
        # rank-3 (1, Np, Np), one shared block; padded rows/cols touch only
        # -inf'd scores (p = 0) or sliced-off query rows
        pmult_in = _pad_n(pmult.astype(jnp.float32)[None], Np, (1, 2))
    else:
        pmult_in = jnp.zeros((1, 16, 16), jnp.float32)

    kernel = functools.partial(
        _bwd_core_kernel, hg=hg, n_win=n_win,
        has_bias=has_bias, has_mask=has_mask, has_kmask=has_kmask,
        has_pmult=has_pmult, n_real=n_real, scale=hd ** -0.5,
    )
    # grid: head-group OUTER, window-block INNER (dbias blocks are revisited
    # consecutively across the inner dim, as Mosaic requires)
    grid = (n_groups, nB // WINB)
    CG = hg * hd
    blk = pl.BlockSpec((WINB, Np, CG), lambda g, i: (i, 0, g),
                       memory_space=pltpu.VMEM)
    bias_blk = pl.BlockSpec(
        (hg,) + bias_in.shape[1:], lambda g, i: (g, 0, 0),
        memory_space=pltpu.VMEM)
    if has_mask and WINB < n_win:
        mask_blk = pl.BlockSpec(
            (WINB,) + mask_in.shape[1:],
            lambda g, i: (i % (n_win // WINB), 0, 0),
            memory_space=pltpu.VMEM)
    else:
        mask_blk = pl.BlockSpec(mask_in.shape, lambda g, i: (0, 0, 0),
                                memory_space=pltpu.VMEM)
    kmask_blk = (pl.BlockSpec((WINB, 1, Np), lambda g, i: (i, 0, 0),
                              memory_space=pltpu.VMEM) if has_kmask else
                 pl.BlockSpec(kmask_in.shape, lambda g, i: (0, 0, 0),
                              memory_space=pltpu.VMEM))
    pmult_blk = pl.BlockSpec(pmult_in.shape, lambda g, i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    dq, dk, dv, of, dbias = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[blk, blk, blk, blk, bias_blk, mask_blk, kmask_blk,
                  pmult_blk],
        out_specs=[blk, blk, blk, blk, bias_blk],
        out_shape=[
            jax.ShapeDtypeStruct((nB, Np, C), q.dtype),
            jax.ShapeDtypeStruct((nB, Np, C), q.dtype),
            jax.ShapeDtypeStruct((nB, Np, C), q.dtype),
            jax.ShapeDtypeStruct((nB, Np, C), q.dtype),
            jax.ShapeDtypeStruct(bias_in.shape, jnp.float32),
        ],
        interpret=_interpret(),
    )(q, k, v, do, bias_in, mask_in, kmask_in, pmult_in)
    return (dq[:, :N, :], dk[:, :N, :], dv[:, :N, :], of[:, :N, :],
            dbias[:, :N, :N] if has_bias else None)


def _bwd_call(x, wqkv, bqkv, wproj, bias_in, mask_in, dy, *,
              num_heads: int, has_bias: bool, has_mask: bool, n_win: int):
    """Split backward: XLA matmuls for projections/weight grads, Pallas for
    the attention core (which also recomputes of = p·v for the projection
    weight grad). All tensors unpadded (nB, N, C)."""
    nB, N, C = x.shape
    f32 = jnp.float32
    xf = x.reshape(nB * N, C)
    dyf = dy.reshape(nB * N, C)

    dbproj = jnp.sum(dyf.astype(f32), axis=0)
    do = jnp.dot(dyf, wproj.astype(dy.dtype).T,
                 preferred_element_type=f32).astype(dy.dtype).reshape(
        nB, N, C)

    # recompute qkv (one MXU matmul), head-major channel slices
    qkv = (jnp.dot(xf, wqkv.astype(x.dtype), preferred_element_type=f32)
           + bqkv.astype(f32)).astype(x.dtype).reshape(nB, N, 3 * C)
    q, k, v = qkv[..., :C], qkv[..., C:2 * C], qkv[..., 2 * C:]

    dq, dk, dv, of, dbias = _bwd_core(
        q, k, v, do, bias_in, mask_in, num_heads=num_heads,
        has_bias=has_bias, has_mask=has_mask, n_win=n_win,
    )
    dwproj = jnp.dot(of.reshape(nB * N, C).T, dyf,
                     preferred_element_type=f32)

    dqkv = jnp.concatenate([dq, dk, dv], axis=-1).reshape(nB * N, 3 * C)
    dwqkv = jnp.dot(xf.T, dqkv, preferred_element_type=f32)
    dbqkv = jnp.sum(dqkv.astype(f32), axis=0)
    dx = jnp.dot(dqkv, wqkv.astype(dqkv.dtype).T,
                 preferred_element_type=f32).astype(x.dtype).reshape(
        nB, N, C)
    return dx, dwqkv, dbqkv, dwproj, dbproj, dbias


# ---------------------------------------------------------------------------
# custom-vjp public entry
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def window_attention(x, wqkv, bqkv, wproj, bproj, bias, mask, num_heads):
    """Fused window MHA. x (nB, N, C); bias (h, N, N) or None;
    mask (nW, N, N) or None. Differentiable in x/weights/bias."""
    return _fwd(x, wqkv, bqkv, wproj, bproj, bias, mask,
                num_heads=num_heads)


def _wa_fwd(x, wqkv, bqkv, wproj, bproj, bias, mask, num_heads):
    y = _fwd(x, wqkv, bqkv, wproj, bproj, bias, mask, num_heads=num_heads)
    return y, (x, wqkv, bqkv, wproj, bias, mask)


def _wa_bwd(num_heads, res, dy):
    x, wqkv, bqkv, wproj, bias, mask = res
    has_bias = bias is not None
    has_mask = mask is not None
    n_win = mask.shape[0] if has_mask else 1
    dx, dwqkv, dbqkv, dwproj, dbproj, dbias = _bwd_call(
        x, wqkv, bqkv, wproj, bias, mask, dy,
        num_heads=num_heads, has_bias=has_bias, has_mask=has_mask,
        n_win=n_win,
    )
    return (
        dx,
        dwqkv.astype(wqkv.dtype),
        dbqkv.astype(bqkv.dtype),
        dwproj.astype(wproj.dtype),
        dbproj.astype(wproj.dtype),
        dbias.astype(bias.dtype) if has_bias else None,
        None,
    )


window_attention.defvjp(_wa_fwd, _wa_bwd)


# ---------------------------------------------------------------------------
# strip-blocked NHWC entry: partition/pad/reverse folded into the kernel
# ---------------------------------------------------------------------------
#
# The padded-window entry above still pays, per spatial block, the XLA
# window-partition transpose, the 49->64 HBM pad, the output slice, and the
# window-reverse transpose — measured together at ~22% of the davit_tiny
# step (docs/DESIGN.md §5b). This entry removes ALL of them: the kernel
# reads the NHWC map directly through the free 6-D view
# (B, nH, w, nW, w, C) and assembles windows IN VMEM.
#
# Mosaic cannot shape-cast across a w=7-sublane dim (the reason the padded
# entry pads to 64 in HBM), so the in-kernel assembly never reshapes across
# it: each window row is copied as an aligned (w, C) plane into a flat
# (windows*Np, C) scratch at stride wr = roundup(w, 8) — token t = r*wr + c,
# i.e. an INTERLEAVED padding layout (columns c >= w of each row are dead)
# whose every store offset is 8-aligned. Np = w*wr (56 for w=7, vs 64 for
# tail padding). The attention math is then identical to the padded entry
# with the key mask (t % wr < w).

def _strip_rows(nW: int, Np: int, C: int, itemsize: int, h: int) -> int:
    """Per-strip VMEM bytes estimate: x/y blocks + xp scratch + qkv (f32
    intermediate + cast) + one f32 score/prob pair + f32 out accumulation."""
    toks = nW * Np
    return (2 * toks * C * itemsize          # x, y blocks (w*w <= Np)
            + toks * C * itemsize            # xp scratch
            + toks * 3 * C * (4 + itemsize)  # qkv f32 + cast
            + 2 * nW * Np * Np * 4           # s, p (one head live)
            + toks * C * (4 + itemsize))     # outs f32 + y cast


def _pick_sb(B: int, nW: int, Np: int, C: int, itemsize: int, h: int) -> int:
    """Batch rows per grid cell: grow SB (divisor of B) until the matmul has
    >= 512 token rows or the VMEM budget is hit."""
    per = _strip_rows(nW, Np, C, itemsize, h)
    sb = 1
    while (sb * 2 <= B and B % (sb * 2) == 0
           and (sb * 2) * per <= _VMEM_BUDGET
           and sb * nW * Np < 512):
        sb *= 2
    return sb


def _strip_remap_idx(w: int, wr: int):
    """Token map from the interleaved (r*wr + c) layout to the real
    (r*w + c) window order; dead columns point at 0 (their scores are
    keypad-masked / their grads dropped at disassembly)."""
    import numpy as np

    idx = np.zeros(w * wr, np.int32)
    for t in range(w * wr):
        r, c = divmod(t, wr)
        idx[t] = r * w + c if c < w else 0
    return idx


def _strip_fwd_kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
                      bias_ref, mask_ref, y_ref, xp_ref, *, h: int, w: int,
                      wr: int, has_bias: bool, has_mask: bool):
    SB, _, _, nW, _, C = x_ref.shape
    hd = C // h
    Np = w * wr
    NW = SB * nW
    scale = hd ** -0.5
    col = jax.lax.broadcasted_iota(jnp.int32, (Np, Np), 1)
    keypad = jnp.where(col % wr < w, 0.0, -1e9).astype(jnp.float32)

    # assemble windows: zero the scratch (dead columns must not be NaN),
    # then copy each window row as an aligned (w, C) plane
    xp_ref[:] = jnp.zeros_like(xp_ref)
    for bb in range(SB):
        for j in range(nW):
            base = (bb * nW + j) * Np
            for r in range(w):
                xp_ref[base + r * wr: base + r * wr + w, :] = x_ref[bb, 0, r, j]

    qkv = (
        jnp.dot(xp_ref[:], wqkv_ref[:], preferred_element_type=jnp.float32)
        + bqkv_ref[:].astype(jnp.float32)
    ).astype(x_ref.dtype).reshape(NW, Np, 3 * C)

    outs = []
    for hi in range(h):
        q = qkv[..., hi * hd:(hi + 1) * hd]
        k = qkv[..., C + hi * hd:C + (hi + 1) * hd]
        v = qkv[..., 2 * C + hi * hd:2 * C + (hi + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale + keypad[None]
        if has_bias:
            s = s + bias_ref[hi].astype(jnp.float32)[None]
        if has_mask:
            # per-window additive mask: window index within the cell is
            # bb*nW + j, and the (1, nW, Np, Np) block holds this window
            # row's nW masks
            s = (s.reshape(SB, nW, Np, Np)
                 + mask_ref[0].astype(jnp.float32)[None]).reshape(NW, Np, Np)
        p = jax.nn.softmax(s, axis=-1).astype(x_ref.dtype)
        outs.append(jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ))
    of = jnp.concatenate(outs, axis=-1).astype(x_ref.dtype).reshape(
        NW * Np, C)
    y = (
        jnp.dot(of, wproj_ref[:], preferred_element_type=jnp.float32)
        + bproj_ref[:].astype(jnp.float32)
    ).astype(x_ref.dtype).reshape(NW, Np, C)
    for bb in range(SB):
        for j in range(nW):
            for r in range(w):
                y_ref[bb, 0, r, j] = y[bb * nW + j, r * wr:r * wr + w, :]


def _strip_remap(t, idx):
    """Remap the last two (N, N) dims of bias/mask into the interleaved
    (Np, Np) token layout — a pair of tiny gathers in XLA, never batched."""
    return jnp.take(jnp.take(t, idx, axis=-2), idx, axis=-1)


def _strip_fwd(x, wqkv, bqkv, wproj, bproj, bias, mask, *, num_heads: int,
               window: int, iface=None):
    if (iface or os.environ.get("SKINJAX_WA_IFACE", "6d")) == "4d":
        return _strip_fwd4(x, wqkv, bqkv, wproj, bproj, bias, mask,
                           num_heads=num_heads, window=window)
    B, H, W, C = x.shape
    w = window
    nH, nW = H // w, W // w
    wr = -(-w // 8) * 8
    Np = w * wr
    SB = _pick_sb(B, nW, Np, C, x.dtype.itemsize, num_heads)
    x6 = x.reshape(B, nH, w, nW, w, C)  # free: adjacent-dim splits only
    has_bias = bias is not None
    has_mask = mask is not None
    idx = jnp.asarray(_strip_remap_idx(w, wr))
    bias_in = (_strip_remap(bias, idx).astype(jnp.float32) if has_bias
               else jnp.zeros((1, 1, 1), jnp.float32))
    # mask: (nH*nW, N, N) per-window additive -> (nH, nW, Np, Np) so the
    # grid's window-row index selects the right nW-slice
    mask_in = (_strip_remap(mask, idx).astype(jnp.float32).reshape(
        nH, nW, Np, Np) if has_mask
        else jnp.zeros((1, 1, 1, 1), jnp.float32))

    kernel = functools.partial(_strip_fwd_kernel, h=num_heads, w=w, wr=wr,
                               has_bias=has_bias, has_mask=has_mask)
    blk = pl.BlockSpec((SB, 1, w, nW, w, C),
                       lambda b, i: (b, i, 0, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    rep2 = lambda b, i: (0, 0)
    rep1 = lambda b, i: (0,)
    rep3 = lambda b, i: (0, 0, 0)
    mask_spec = (pl.BlockSpec((1, nW, Np, Np), lambda b, i: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM) if has_mask else
                 pl.BlockSpec(mask_in.shape, lambda b, i: (0, 0, 0, 0),
                              memory_space=pltpu.VMEM))
    y6 = pl.pallas_call(
        kernel,
        grid=(B // SB, nH),
        in_specs=[
            blk,
            pl.BlockSpec((C, 3 * C), rep2, memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * C,), rep1, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), rep2, memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), rep1, memory_space=pltpu.VMEM),
            pl.BlockSpec(bias_in.shape, rep3, memory_space=pltpu.VMEM),
            mask_spec,
        ],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((B, nH, w, nW, w, C), x.dtype),
        scratch_shapes=[pltpu.VMEM((SB * nW * Np, C), x.dtype)],
        interpret=_interpret(),
    )(x6, wqkv, bqkv, wproj, bproj, bias_in, mask_in)
    return y6.reshape(B, H, W, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def window_attention_nhwc(x, wqkv, bqkv, wproj, bproj, bias, mask,
                          num_heads, window, iface=None):
    """Fused window MHA straight on the NHWC map. x (B, H, W, C) with H, W
    divisible by ``window``. ``bias``: (h, N, N) additive rel-pos bias or
    None (differentiable — Swin). ``mask``: (nH*nW, N, N) PER-WINDOW
    additive mask or None (shifted windows; constant). Forward does ONE HBM
    read of x and one write of y; backward reuses the split core and
    accumulates dbias in-kernel.

    ``iface``: "6d" (window-view blocks; XLA repacks the tile-padded 7-dims
    at kernel boundaries) or "4d" (NHWC strip blocks; unaligned in-VMEM
    window assembly). Measured per family (docs/DESIGN.md §5b-r3c): a wash
    for DaViT (no bias/mask), +7% for Swin — callers pick; None reads
    SKINJAX_WA_IFACE (default 6d)."""
    return _strip_fwd(x, wqkv, bqkv, wproj, bproj, bias, mask,
                      num_heads=num_heads, window=window, iface=iface)


def _wa_nhwc_fwd(x, wqkv, bqkv, wproj, bproj, bias, mask, num_heads,
                 window, iface=None):
    y = _strip_fwd(x, wqkv, bqkv, wproj, bproj, bias, mask,
                   num_heads=num_heads, window=window, iface=iface)
    return y, (x, wqkv, bqkv, wproj, bias, mask)


def _strip_bwd_kernel(x_ref, dy_ref, wqkv_ref, bqkv_ref, wproj_ref,
                      bias_ref, mask_ref, dqkv_ref, of_ref, dbias_ref,
                      xp_ref, dyp_ref, *, h: int, w: int,
                      wr: int, has_bias: bool, has_mask: bool):
    """Attention-core backward per (batch-strip, window-row) cell, all
    window assembly in VMEM. Emits dqkv and of = p·v DISASSEMBLED back to
    NHWC, so every weight/input grad downstream is a flat (B·H·W, C) matmul
    with zero window relayouts (see _wa_nhwc_bwd)."""
    SB, _, _, nW, _, C = x_ref.shape
    hd = C // h
    Np = w * wr
    NW = SB * nW
    scale = hd ** -0.5
    col = jax.lax.broadcasted_iota(jnp.int32, (Np, Np), 1)
    keypad = jnp.where(col % wr < w, 0.0, -1e9).astype(jnp.float32)

    # assemble x and dy windows (dead rows/cols zeroed: a dead query row
    # has do = 0, so it contributes nothing to dk/dv; dead key columns get
    # p = 0 from the keypad)
    xp_ref[:] = jnp.zeros_like(xp_ref)
    dyp_ref[:] = jnp.zeros_like(dyp_ref)
    for bb in range(SB):
        for j in range(nW):
            base = (bb * nW + j) * Np
            for r in range(w):
                xp_ref[base + r * wr: base + r * wr + w, :] = x_ref[bb, 0, r, j]
                dyp_ref[base + r * wr: base + r * wr + w, :] = dy_ref[bb, 0, r, j]

    qkv = (
        jnp.dot(xp_ref[:], wqkv_ref[:], preferred_element_type=jnp.float32)
        + bqkv_ref[:].astype(jnp.float32)
    ).astype(x_ref.dtype).reshape(NW, Np, 3 * C)
    # do = dy @ wproj^T
    do = jax.lax.dot_general(
        dyp_ref[:], wproj_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x_ref.dtype).reshape(NW, Np, C)

    if has_bias:
        @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
        def _zero_dbias():
            dbias_ref[:] = jnp.zeros_like(dbias_ref)

    dqs, dks, dvs, ofs = [], [], [], []
    for hi in range(h):
        q = qkv[..., hi * hd:(hi + 1) * hd]
        k = qkv[..., C + hi * hd:C + (hi + 1) * hd]
        v = qkv[..., 2 * C + hi * hd:2 * C + (hi + 1) * hd]
        do_h = do[..., hi * hd:(hi + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale + keypad[None]
        if has_bias:
            s = s + bias_ref[hi].astype(jnp.float32)[None]
        if has_mask:
            nWm = mask_ref.shape[1]
            s = (s.reshape(NW // nWm, nWm, Np, Np)
                 + mask_ref[0].astype(jnp.float32)[None]).reshape(NW, Np, Np)
        p = jax.nn.softmax(s, axis=-1)  # f32 for exact softmax bwd
        pb = p.astype(x_ref.dtype)
        # of = p @ v (pre-projection forward output, for dwproj downstream)
        ofs.append(jax.lax.dot_general(
            pb, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ))
        # dv = p^T @ do_h
        dvs.append(jax.lax.dot_general(
            pb, do_h, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ))
        # dp = do_h @ v^T ; ds = p * (dp - rowsum(dp*p)) * scale
        dp = jax.lax.dot_general(
            do_h, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dsp = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        if has_bias:
            # grad wrt the ADDITIVE bias: pre-scale ds, summed over windows
            # (accumulated across grid cells; zeroed at the first cell)
            dbias_ref[hi] += jnp.sum(dsp, axis=0)
        ds = (dsp * scale).astype(x_ref.dtype)
        dqs.append(jax.lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ))
        dks.append(jax.lax.dot_general(
            ds, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ))
    dqkv = jnp.concatenate(
        dqs + dks + dvs, axis=-1).astype(x_ref.dtype)  # (NW, Np, 3C)
    of = jnp.concatenate(ofs, axis=-1).astype(x_ref.dtype)
    for bb in range(SB):
        for j in range(nW):
            win = bb * nW + j
            for r in range(w):
                sl = slice(r * wr, r * wr + w)
                dqkv_ref[bb, 0, r, j] = dqkv[win, sl, :]
                of_ref[bb, 0, r, j] = of[win, sl, :]


def _strip_bwd(x, dy, wqkv, bqkv, wproj, bias, mask, *, num_heads: int,
               window: int, iface=None):
    """Returns (dqkv, of, dbias) in NHWC layout: (B, H, W, 3C),
    (B, H, W, C) and (h, N, N) (or None without bias)."""
    if (iface or os.environ.get("SKINJAX_WA_IFACE", "6d")) == "4d":
        return _strip_bwd4(x, dy, wqkv, bqkv, wproj, bias, mask,
                           num_heads=num_heads, window=window)
    B, H, W, C = x.shape
    w = window
    nH, nW = H // w, W // w
    wr = -(-w // 8) * 8
    Np = w * wr
    # backward holds ~3x the forward's per-token VMEM (dy/do/dqkv/of blocks
    # + dp/ds transients): reuse the forward picker on a 3x-padded channel
    SB = _pick_sb(B, nW, Np, 3 * C, x.dtype.itemsize, num_heads)
    x6 = x.reshape(B, nH, w, nW, w, C)
    dy6 = dy.reshape(B, nH, w, nW, w, C)
    has_bias = bias is not None
    has_mask = mask is not None
    idx = jnp.asarray(_strip_remap_idx(w, wr))
    bias_in = (_strip_remap(bias, idx).astype(jnp.float32) if has_bias
               else jnp.zeros((1, 1, 1), jnp.float32))
    mask_in = (_strip_remap(mask, idx).astype(jnp.float32).reshape(
        nH, nW, Np, Np) if has_mask
        else jnp.zeros((1, 1, 1, 1), jnp.float32))

    kernel = functools.partial(_strip_bwd_kernel, h=num_heads, w=w, wr=wr,
                               has_bias=has_bias, has_mask=has_mask)
    blk = pl.BlockSpec((SB, 1, w, nW, w, C),
                       lambda b, i: (b, i, 0, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    blk3 = pl.BlockSpec((SB, 1, w, nW, w, 3 * C),
                        lambda b, i: (b, i, 0, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    rep2 = lambda b, i: (0, 0)
    rep1 = lambda b, i: (0,)
    rep3 = lambda b, i: (0, 0, 0)
    mask_spec = (pl.BlockSpec((1, nW, Np, Np), lambda b, i: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM) if has_mask else
                 pl.BlockSpec(mask_in.shape, lambda b, i: (0, 0, 0, 0),
                              memory_space=pltpu.VMEM))
    dbias_shape = (num_heads, Np, Np) if has_bias else (1, 1, 1)
    dqkv6, of6, dbias_p = pl.pallas_call(
        kernel,
        grid=(B // SB, nH),
        in_specs=[
            blk, blk,
            pl.BlockSpec((C, 3 * C), rep2, memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * C,), rep1, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), rep2, memory_space=pltpu.VMEM),
            pl.BlockSpec(bias_in.shape, rep3, memory_space=pltpu.VMEM),
            mask_spec,
        ],
        out_specs=[blk3, blk,
                   # accumulated over every grid cell (constant index map)
                   pl.BlockSpec(dbias_shape, rep3,
                                memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((B, nH, w, nW, w, 3 * C), x.dtype),
            jax.ShapeDtypeStruct((B, nH, w, nW, w, C), x.dtype),
            jax.ShapeDtypeStruct(dbias_shape, jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((SB * nW * Np, C), x.dtype),
            pltpu.VMEM((SB * nW * Np, C), x.dtype),
        ],
        interpret=_interpret(),
    )(x6, dy6, wqkv, bqkv, wproj, bias_in, mask_in)
    dbias = None
    if has_bias:
        # map the interleaved-layout grads back to real token order
        idx2 = jnp.asarray(
            [(n // w) * wr + (n % w) for n in range(w * w)], jnp.int32)
        dbias = _strip_remap(dbias_p, idx2)
    return (dqkv6.reshape(B, H, W, 3 * C), of6.reshape(B, H, W, C), dbias)


def _wa_nhwc_bwd(num_heads, window, iface, res, dy):
    """All-flat backward: the strip core emits dqkv/of in NHWC, so the
    projection/weight grads are plain (B·H·W, C) matmuls — no window
    partition/reverse, no 49->64 pads, no layout copies (the XLA path this
    replaces measured ~3 ms/step of relayouts on davit_tiny B=64)."""
    x, wqkv, bqkv, wproj, bias, mask = res
    B, H, W, C = x.shape
    f32 = jnp.float32
    dqkv6, of6, dbias = _strip_bwd(x, dy, wqkv, bqkv, wproj, bias, mask,
                                   num_heads=num_heads, window=window,
                                   iface=iface)
    xf = x.reshape(B * H * W, C)
    dyf = dy.reshape(B * H * W, C)
    dqkvf = dqkv6.reshape(B * H * W, 3 * C)
    off = of6.reshape(B * H * W, C)
    dwproj = jnp.dot(off.T, dyf, preferred_element_type=f32)
    dbproj = jnp.sum(dyf.astype(f32), axis=0)
    dwqkv = jnp.dot(xf.T, dqkvf, preferred_element_type=f32)
    dbqkv = jnp.sum(dqkvf.astype(f32), axis=0)
    dx = jnp.dot(dqkvf, wqkv.astype(dqkvf.dtype).T,
                 preferred_element_type=f32).astype(x.dtype).reshape(
        B, H, W, C)
    return (
        dx,
        dwqkv.astype(wqkv.dtype),
        dbqkv.astype(bqkv.dtype),
        dwproj.astype(wproj.dtype),
        dbproj.astype(wproj.dtype),
        dbias.astype(bias.dtype) if bias is not None else None,
        None,
    )


# ---------------------------------------------------------------------------
# 4-D NHWC kernel interface (SKINJAX_WA_IFACE=4d)
# ---------------------------------------------------------------------------
#
# The 6-D (B, nH, w, nW, w, C) interface above is mathematically a free view
# of NHWC, but PHYSICALLY the TPU's (8,128) tiling pads the w=7 sublane dims,
# so XLA must repack at every kernel boundary (x/dy input copies + dqkv/of/y
# output reshapes — measured ~2.4 ms/step on davit_tiny B=64). This variant
# blocks the kernel directly on the 4-D NHWC tensor — (SB, w, W, C) strips,
# no 7-dim ever materialized in HBM — and moves the misalignment into VMEM:
# window j's rows live at W-offset j*w, which is sublane-UNALIGNED for odd j,
# so the in-VMEM assembly loads/stores pay Mosaic shift lowerings instead of
# the HBM repack round trips.

def _strip_fwd_kernel4(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
                       bias_ref, mask_ref, y_ref, xp_ref, *, h: int, w: int,
                       wr: int, has_bias: bool, has_mask: bool):
    SB, _, Wd, C = x_ref.shape
    nW = Wd // w
    hd = C // h
    Np = w * wr
    NW = SB * nW
    scale = hd ** -0.5
    col = jax.lax.broadcasted_iota(jnp.int32, (Np, Np), 1)
    keypad = jnp.where(col % wr < w, 0.0, -1e9).astype(jnp.float32)

    xp_ref[:] = jnp.zeros_like(xp_ref)
    for bb in range(SB):
        for j in range(nW):
            base = (bb * nW + j) * Np
            for r in range(w):
                xp_ref[base + r * wr: base + r * wr + w, :] = (
                    x_ref[bb, r, j * w:(j + 1) * w, :])

    qkv = (
        jnp.dot(xp_ref[:], wqkv_ref[:], preferred_element_type=jnp.float32)
        + bqkv_ref[:].astype(jnp.float32)
    ).astype(x_ref.dtype).reshape(NW, Np, 3 * C)

    outs = []
    for hi in range(h):
        q = qkv[..., hi * hd:(hi + 1) * hd]
        k = qkv[..., C + hi * hd:C + (hi + 1) * hd]
        v = qkv[..., 2 * C + hi * hd:2 * C + (hi + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale + keypad[None]
        if has_bias:
            s = s + bias_ref[hi].astype(jnp.float32)[None]
        if has_mask:
            s = (s.reshape(SB, nW, Np, Np)
                 + mask_ref[0].astype(jnp.float32)[None]).reshape(NW, Np, Np)
        p = jax.nn.softmax(s, axis=-1).astype(x_ref.dtype)
        outs.append(jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ))
    of = jnp.concatenate(outs, axis=-1).astype(x_ref.dtype).reshape(
        NW * Np, C)
    y = (
        jnp.dot(of, wproj_ref[:], preferred_element_type=jnp.float32)
        + bproj_ref[:].astype(jnp.float32)
    ).astype(x_ref.dtype).reshape(NW, Np, C)
    for bb in range(SB):
        for j in range(nW):
            for r in range(w):
                y_ref[bb, r, j * w:(j + 1) * w, :] = (
                    y[bb * nW + j, r * wr:r * wr + w, :])


def _strip_fwd4(x, wqkv, bqkv, wproj, bproj, bias, mask, *, num_heads: int,
                window: int):
    B, H, W, C = x.shape
    w = window
    nH, nW = H // w, W // w
    wr = -(-w // 8) * 8
    Np = w * wr
    SB = _pick_sb(B, nW, Np, C, x.dtype.itemsize, num_heads)
    has_bias = bias is not None
    has_mask = mask is not None
    idx = jnp.asarray(_strip_remap_idx(w, wr))
    bias_in = (_strip_remap(bias, idx).astype(jnp.float32) if has_bias
               else jnp.zeros((1, 1, 1), jnp.float32))
    mask_in = (_strip_remap(mask, idx).astype(jnp.float32).reshape(
        nH, nW, Np, Np) if has_mask
        else jnp.zeros((1, 1, 1, 1), jnp.float32))

    kernel = functools.partial(_strip_fwd_kernel4, h=num_heads, w=w, wr=wr,
                               has_bias=has_bias, has_mask=has_mask)
    blk = pl.BlockSpec((SB, w, W, C), lambda b, i: (b, i, 0, 0),
                       memory_space=pltpu.VMEM)
    rep2 = lambda b, i: (0, 0)
    rep1 = lambda b, i: (0,)
    rep3 = lambda b, i: (0, 0, 0)
    mask_spec = (pl.BlockSpec((1, nW, Np, Np), lambda b, i: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM) if has_mask else
                 pl.BlockSpec(mask_in.shape, lambda b, i: (0, 0, 0, 0),
                              memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kernel,
        grid=(B // SB, nH),
        in_specs=[
            blk,
            pl.BlockSpec((C, 3 * C), rep2, memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * C,), rep1, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), rep2, memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), rep1, memory_space=pltpu.VMEM),
            pl.BlockSpec(bias_in.shape, rep3, memory_space=pltpu.VMEM),
            mask_spec,
        ],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        scratch_shapes=[pltpu.VMEM((SB * nW * Np, C), x.dtype)],
        interpret=_interpret(),
    )(x, wqkv, bqkv, wproj, bproj, bias_in, mask_in)


def _strip_bwd_kernel4(x_ref, dy_ref, wqkv_ref, bqkv_ref, wproj_ref,
                       bias_ref, mask_ref, dqkv_ref, of_ref, dbias_ref,
                       xp_ref, dyp_ref, *, h: int, w: int,
                       wr: int, has_bias: bool, has_mask: bool):
    SB, _, Wd, C = x_ref.shape
    nW = Wd // w
    hd = C // h
    Np = w * wr
    NW = SB * nW
    scale = hd ** -0.5
    col = jax.lax.broadcasted_iota(jnp.int32, (Np, Np), 1)
    keypad = jnp.where(col % wr < w, 0.0, -1e9).astype(jnp.float32)

    xp_ref[:] = jnp.zeros_like(xp_ref)
    dyp_ref[:] = jnp.zeros_like(dyp_ref)
    for bb in range(SB):
        for j in range(nW):
            base = (bb * nW + j) * Np
            for r in range(w):
                xp_ref[base + r * wr: base + r * wr + w, :] = (
                    x_ref[bb, r, j * w:(j + 1) * w, :])
                dyp_ref[base + r * wr: base + r * wr + w, :] = (
                    dy_ref[bb, r, j * w:(j + 1) * w, :])

    qkv = (
        jnp.dot(xp_ref[:], wqkv_ref[:], preferred_element_type=jnp.float32)
        + bqkv_ref[:].astype(jnp.float32)
    ).astype(x_ref.dtype).reshape(NW, Np, 3 * C)
    do = jax.lax.dot_general(
        dyp_ref[:], wproj_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x_ref.dtype).reshape(NW, Np, C)

    if has_bias:
        @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
        def _zero_dbias():
            dbias_ref[:] = jnp.zeros_like(dbias_ref)

    dqs, dks, dvs, ofs = [], [], [], []
    for hi in range(h):
        q = qkv[..., hi * hd:(hi + 1) * hd]
        k = qkv[..., C + hi * hd:C + (hi + 1) * hd]
        v = qkv[..., 2 * C + hi * hd:2 * C + (hi + 1) * hd]
        do_h = do[..., hi * hd:(hi + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale + keypad[None]
        if has_bias:
            s = s + bias_ref[hi].astype(jnp.float32)[None]
        if has_mask:
            nWm = mask_ref.shape[1]
            s = (s.reshape(NW // nWm, nWm, Np, Np)
                 + mask_ref[0].astype(jnp.float32)[None]).reshape(NW, Np, Np)
        p = jax.nn.softmax(s, axis=-1)
        pb = p.astype(x_ref.dtype)
        ofs.append(jax.lax.dot_general(
            pb, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ))
        dvs.append(jax.lax.dot_general(
            pb, do_h, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ))
        dp = jax.lax.dot_general(
            do_h, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dsp = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        if has_bias:
            dbias_ref[hi] += jnp.sum(dsp, axis=0)
        ds = (dsp * scale).astype(x_ref.dtype)
        dqs.append(jax.lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ))
        dks.append(jax.lax.dot_general(
            ds, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ))
    dqkv = jnp.concatenate(
        dqs + dks + dvs, axis=-1).astype(x_ref.dtype)  # (NW, Np, 3C)
    of = jnp.concatenate(ofs, axis=-1).astype(x_ref.dtype)
    for bb in range(SB):
        for j in range(nW):
            win = bb * nW + j
            for r in range(w):
                sl = slice(r * wr, r * wr + w)
                dqkv_ref[bb, r, j * w:(j + 1) * w, :] = dqkv[win, sl, :]
                of_ref[bb, r, j * w:(j + 1) * w, :] = of[win, sl, :]


def _strip_bwd4(x, dy, wqkv, bqkv, wproj, bias, mask, *, num_heads: int,
                window: int):
    """Same contract as _strip_bwd: (dqkv (B,H,W,3C), of (B,H,W,C), dbias)
    — already in 4-D NHWC, so the reshapes at the call site are free."""
    B, H, W, C = x.shape
    w = window
    nH, nW = H // w, W // w
    wr = -(-w // 8) * 8
    Np = w * wr
    SB = _pick_sb(B, nW, Np, 3 * C, x.dtype.itemsize, num_heads)
    has_bias = bias is not None
    has_mask = mask is not None
    idx = jnp.asarray(_strip_remap_idx(w, wr))
    bias_in = (_strip_remap(bias, idx).astype(jnp.float32) if has_bias
               else jnp.zeros((1, 1, 1), jnp.float32))
    mask_in = (_strip_remap(mask, idx).astype(jnp.float32).reshape(
        nH, nW, Np, Np) if has_mask
        else jnp.zeros((1, 1, 1, 1), jnp.float32))

    kernel = functools.partial(_strip_bwd_kernel4, h=num_heads, w=w, wr=wr,
                               has_bias=has_bias, has_mask=has_mask)
    blk = pl.BlockSpec((SB, w, W, C), lambda b, i: (b, i, 0, 0),
                       memory_space=pltpu.VMEM)
    blk3 = pl.BlockSpec((SB, w, W, 3 * C), lambda b, i: (b, i, 0, 0),
                        memory_space=pltpu.VMEM)
    rep2 = lambda b, i: (0, 0)
    rep1 = lambda b, i: (0,)
    rep3 = lambda b, i: (0, 0, 0)
    mask_spec = (pl.BlockSpec((1, nW, Np, Np), lambda b, i: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM) if has_mask else
                 pl.BlockSpec(mask_in.shape, lambda b, i: (0, 0, 0, 0),
                              memory_space=pltpu.VMEM))
    dbias_shape = (num_heads, Np, Np) if has_bias else (1, 1, 1)
    dqkv4, of4, dbias_p = pl.pallas_call(
        kernel,
        grid=(B // SB, nH),
        in_specs=[
            blk, blk,
            pl.BlockSpec((C, 3 * C), rep2, memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * C,), rep1, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), rep2, memory_space=pltpu.VMEM),
            pl.BlockSpec(bias_in.shape, rep3, memory_space=pltpu.VMEM),
            mask_spec,
        ],
        out_specs=[blk3, blk,
                   pl.BlockSpec(dbias_shape, rep3,
                                memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, 3 * C), x.dtype),
            jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
            jax.ShapeDtypeStruct(dbias_shape, jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((SB * nW * Np, C), x.dtype),
            pltpu.VMEM((SB * nW * Np, C), x.dtype),
        ],
        interpret=_interpret(),
    )(x, dy, wqkv, bqkv, wproj, bias_in, mask_in)
    dbias = None
    if has_bias:
        idx2 = jnp.asarray(
            [(n // w) * wr + (n % w) for n in range(w * w)], jnp.int32)
        dbias = _strip_remap(dbias_p, idx2)
    return dqkv4, of4, dbias


window_attention_nhwc.defvjp(_wa_nhwc_fwd, _wa_nhwc_bwd)
