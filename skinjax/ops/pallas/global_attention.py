"""Fused global (full-sequence) attention core for ViT/BEiT-class encoders.

The XLA lowering of full-sequence MHA materializes the f32 (B, h, N, N)
logits, the softmaxed probabilities, and the head-merge relayout in HBM —
for beitv2_large at B=32 / N=197 that is ~90 MB of score traffic per block
per direction, and the measured step sits at ~21% MFU (docs/DESIGN.md §5h).
This kernel keeps the whole scores -> (+bias) -> softmax -> p @ v chain
VMEM-resident per (head-group, batch-block) grid cell.

Deliberately CORE-ONLY: the qkv and output projections stay in XLA — they
are single large (B*N, C) x (C, 3C) MXU matmuls XLA already runs at high
efficiency, and keeping them outside avoids re-streaming multi-MB weight
blocks through VMEM per grid step (the windowed kernel fuses its projections
because its windows are tiny and its weights small; see
window_attention.py). The q/k/v tensors use the HEAD-MAJOR channel layout
(B, N, C) — channel c belongs to head c // head_dim — which is exactly what
minor-axis slicing of a packed qkv matmul produces, so integrating the
kernel removes the (B, N, h, hd) reshape/transpose relayouts too.

Backward reuses the split flash-style core from window_attention._bwd_core
(recompute scores/softmax per block; dq/dk/dv + dbias in one kernel, the
projection grads chain through XLA AD outside).

Reference semantics: scaled-dot-product attention with an optional additive
per-head bias (h, N, N) — BEiT's relative-position bias
(beit.py BeitAttention; timm beit.py Attention._get_rel_pos_bias). The bias
is differentiable (BEiT's bias is a gathered table; d_table chains through
the XLA gather outside the kernel).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from skinjax.ops.pallas.window_attention import (
    _VMEM_BUDGET,
    _bwd_core,
    _heads_per_group,
    _interpret,
    _pad_n,
    _pick_winb,
)


def globattn_bwd_mode() -> str:
    """Backward-pass strategy for the fused core:

    - ``"store"`` (default): the forward emits the f32 softmax
      probabilities as an extra output and the backward consumes them —
      4 dots per head (dv/dp/dq/dk), no score recompute, no softmax, no
      bias/mask re-application (all masking is already baked into P), and
      no unused ``of`` emission. Matches XLA's stored-probabilities AD
      residual traffic while keeping the softmax-vjp chain VMEM-resident.
    - ``"recompute"`` (``SKINJAX_GLOBATTN_BWD=recompute``): flash-style
      split recompute shared with the window kernels — trades one extra
      scores pass + softmax for not storing the (B, h, N, N) f32 P tensor;
      the capacity-saving option for long sequences.

    An explicit env value is validated (a typo silently selecting the wrong
    backward is worse than an error) and FORCES that mode; the unset default
    is "store" *gated by residual size* — see ``_store_p_ok``.
    """
    v = os.environ.get("SKINJAX_GLOBATTN_BWD")
    if v is not None:
        if v not in ("store", "recompute"):
            raise ValueError(
                f"SKINJAX_GLOBATTN_BWD={v!r}: must be 'store' or 'recompute'")
        return v
    return "store"


# Per-call ceiling for the stored-P residual (f32 B·h·Np² bytes/layer).
# Measured territory (DESIGN §5i-b): ViT/BEiT N=197 B≤64 ≤176 MB — store
# wins +10–15%. The quadratic-in-N text paths blow past this fast (GPT-2
# T=1024 B=32 → 1.6 GB/layer ⇒ ~19 GB residual across 12 layers on a 16 GB
# chip): above the ceiling the default falls back to the flash-style
# recompute backward, which needs no residual. Explicit
# SKINJAX_GLOBATTN_BWD=store overrides the gate.
_STORE_P_DEFAULT_MAX_MB = 256.0


def _store_p_ok(B: int, num_heads: int, Np: int) -> bool:
    """Residual-size gate for the unset-env stored-P default."""
    try:
        cap = float(os.environ.get("SKINJAX_GLOBATTN_STORE_MAX_MB",
                                   _STORE_P_DEFAULT_MAX_MB))
    except ValueError:
        cap = _STORE_P_DEFAULT_MAX_MB
    return B * num_heads * Np * Np * 4 <= cap * 1024 * 1024


def globattn_mode() -> str:
    """Resolve the global-attention implementation default, mirroring
    ``window_attention.winattn_mode``:

    - ``SKINJAX_EXPORT_COMPAT`` (native ONNX exporter tracing): always ""
      — the emitter cannot express ``pallas_call``.
    - ``SKINJAX_GLOBATTN`` set: returned verbatim ("pallas" = fused kernel,
      anything else = XLA einsum path).
    - unset: "pallas" when the default backend is TPU, "" elsewhere
      (interpret-mode Pallas on CPU is parity-correct but slow).
    """
    if os.environ.get("SKINJAX_EXPORT_COMPAT", "") == "1":
        return ""
    v = os.environ.get("SKINJAX_GLOBATTN")
    if v is not None:
        return v
    try:
        if jax.default_backend() == "tpu":
            return "pallas"
    except Exception:
        pass
    return ""


def globattn_ok(n: int, has_bias: bool = False) -> bool:
    """Full eligibility check for the fused core at sequence length ``n``.

    The remote-TPU Mosaic compile helper deterministically crashes (HTTP
    500, no diagnostic) when a per-cell VMEM block gets too large —
    bisected on the v5e (DESIGN §5m): the additive-bias path fails at
    Np>=640 (the (hg, Np, Np) f32 bias block), while the kmask/no-bias
    paths compile through Np=1024. Callers fall back to the XLA einsum
    path above the caps (overridable via SKINJAX_GLOBATTN_MAX_N[_BIAS]).
    """
    if globattn_mode() != "pallas":
        return False
    Np = -(-n // 16) * 16

    def _cap(env, default):
        try:
            return int(os.environ.get(env, default))
        except ValueError:
            return default

    if has_bias and Np > _cap("SKINJAX_GLOBATTN_MAX_N_BIAS", 512):
        return False
    return Np <= _cap("SKINJAX_GLOBATTN_MAX_N", 1024)


def attention_core_reference(q, k, v, num_heads, bias=None, kmask=None,
                             pmult=None):
    """Pure-XLA reference (also the parity-test oracle). q/k/v: (B, N, C)
    head-major channel layout; bias: (h, N, N) additive or None; kmask:
    (B, N) per-sample additive key mask (0 keep / -1e9 drop) or None;
    pmult: (N, N) f32 multiplicative post-softmax mask (flax broadcast
    attention-prob dropout — keep/keep_prob shared over batch+heads) or
    None. Returns (B, N, C) in q.dtype with f32 logit accumulation."""
    B, N, C = q.shape
    h = num_heads
    hd = C // h
    qh = q.reshape(B, N, h, hd)
    kh = k.reshape(B, N, h, hd)
    vh = v.reshape(B, N, h, hd)
    s = jnp.einsum("bnhd,bmhd->bhnm", qh * (hd ** -0.5), kh,
                   preferred_element_type=jnp.float32)
    if bias is not None:
        s = s + bias[None].astype(s.dtype)
    if kmask is not None:
        s = s + kmask[:, None, None, :].astype(s.dtype)
    p = jax.nn.softmax(s, axis=-1)
    if pmult is not None:
        p = p * pmult[None, None].astype(p.dtype)
    p = p.astype(q.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", p, vh).reshape(B, N, C)


def _fwd_block_bytes(Np: int, CG: int, itemsize: int,
                     hg_p: int = 0) -> int:
    """Per-batch-row VMEM estimate: q/k/v/o channel-group blocks plus one
    f32 score/prob pair and the f32 out accumulator for the live head;
    ``hg_p`` > 0 adds the emitted f32 probability block (hg heads)."""
    return Np * (4 * CG * itemsize + 4 * CG + 8 * Np + 4 * hg_p * Np)


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, kmask_ref, pmult_ref, o_ref,
                *maybe_p_ref, hg: int, has_bias: bool, has_kmask: bool,
                has_pmult: bool, n_real: int):
    p_ref = maybe_p_ref[0] if maybe_p_ref else None
    SB, Np, CG = q_ref.shape
    hd = CG // hg
    scale = hd ** -0.5
    # keys beyond the real sequence length are padding: -inf their scores
    col = jax.lax.broadcasted_iota(jnp.int32, (Np, Np), 1)
    keypad = jnp.where(col < n_real, 0.0, -1e9).astype(jnp.float32)
    for hi in range(hg):
        sl = slice(hi * hd, (hi + 1) * hd)
        q = q_ref[..., sl]
        k = k_ref[..., sl]
        v = v_ref[..., sl]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale + keypad[None]
        if has_bias:
            s = s + bias_ref[hi].astype(jnp.float32)[None]
        if has_kmask:
            # per-sample additive key mask (BERT padding), rank-3
            # (SB, 1, Np) — broadcasts over query rows
            s = s + kmask_ref[:].astype(jnp.float32)
        p = jax.nn.softmax(s, axis=-1)
        if p_ref is not None:
            # stored-P backward: emit the PRE-dropout f32 probabilities
            # (the softmax-vjp residual; the bwd kernel re-applies pmult)
            p_ref[0, :, hi] = p
        if has_pmult:
            # broadcast attention-prob dropout: ONE (N, N) f32 multiplier
            # shared over batch+heads (flax broadcast_dropout=True), applied
            # in f32 exactly as dot_product_attention_weights does
            p = p * pmult_ref[0].astype(jnp.float32)[None]
        p = p.astype(q_ref.dtype)
        o_ref[..., sl] = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _fwd_core(q, k, v, bias, kmask, pmult, *, num_heads: int,
              emit_p: bool = False):
    B, N, C = q.shape
    hd = C // num_heads
    hg = _heads_per_group(num_heads, hd)
    n_groups = num_heads // hg
    has_bias = bias is not None
    has_kmask = kmask is not None
    has_pmult = pmult is not None
    # Mosaic shape-casts need sublane-aligned dims: pad the token axis to a
    # multiple of 16 (padded keys masked to -inf in-kernel; padded query
    # rows are sliced off the output)
    Np = -(-N // 16) * 16
    CG = hg * hd
    per_row = _fwd_block_bytes(Np, CG, q.dtype.itemsize,
                               hg_p=hg if emit_p else 0)
    SB = _pick_winb(B, 1, per_row)
    if has_pmult:
        # pmult is a fixed (Np, Np) f32 block shared by every grid cell —
        # shrink the batch block until the total stays under the scoped-vmem
        # budget (SB from _pick_winb is a power of two dividing B)
        while SB > 1 and SB * per_row + 4 * Np * Np > _VMEM_BUDGET:
            SB //= 2
    q, k, v = (_pad_n(t, Np, (1,)) for t in (q, k, v))
    bias_in = (_pad_n(bias, Np, (1, 2)) if has_bias
               else jnp.zeros((n_groups * hg, 16, 16), jnp.float32))
    # kmask rides rank-3 (B, 1, Np) so its block's LAST TWO dims (1, Np)
    # always span the full array — legal for any batch block SB (Mosaic
    # requires last-two dims (8, 128)-divisible OR full-extent; SB can be
    # < 8 for wide-channel models)
    kmask_in = (_pad_n(kmask.astype(jnp.float32), Np, (1,))[:, None, :]
                if has_kmask else jnp.zeros((1, 1, 16), jnp.float32))
    # (1, Np, Np): one shared block; zero-padded rows/cols touch only
    # -inf'd scores (p = 0) or sliced-off query rows
    pmult_in = (_pad_n(pmult.astype(jnp.float32)[None], Np, (1, 2))
                if has_pmult else jnp.zeros((1, 16, 16), jnp.float32))

    kernel = functools.partial(_fwd_kernel, hg=hg, has_bias=has_bias,
                               has_kmask=has_kmask, has_pmult=has_pmult,
                               n_real=N)
    blk = pl.BlockSpec((SB, Np, CG), lambda g, b: (b, 0, g),
                       memory_space=pltpu.VMEM)
    bias_blk = pl.BlockSpec((hg,) + bias_in.shape[1:],
                            lambda g, b: (g, 0, 0),
                            memory_space=pltpu.VMEM)
    kmask_blk = (pl.BlockSpec((SB, 1, Np), lambda g, b: (b, 0, 0),
                              memory_space=pltpu.VMEM) if has_kmask else
                 pl.BlockSpec(kmask_in.shape, lambda g, b: (0, 0, 0),
                              memory_space=pltpu.VMEM))
    pmult_blk = pl.BlockSpec(pmult_in.shape, lambda g, b: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    out_specs = blk
    out_shape = jax.ShapeDtypeStruct((B, Np, C), q.dtype)
    if emit_p:
        # stored-P residual: (n_groups, B, hg, Np, Np) f32, written one
        # (1, SB, hg, Np, Np) block per grid cell (last two dims span the
        # full padded score plane — Mosaic-legal for any SB)
        p_blk = pl.BlockSpec((1, SB, hg, Np, Np),
                             lambda g, b: (g, b, 0, 0, 0),
                             memory_space=pltpu.VMEM)
        out_specs = [blk, p_blk]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((n_groups, B, hg, Np, Np),
                                          jnp.float32)]
    o = pl.pallas_call(
        kernel,
        grid=(n_groups, B // SB),
        in_specs=[blk, blk, blk, bias_blk, kmask_blk, pmult_blk],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
    )(q, k, v, bias_in, kmask_in, pmult_in)
    if emit_p:
        o, p = o
        return o[:, :N, :], p
    return o[:, :N, :]


def _bwd_p_bytes(Np: int, CG: int, hg: int, itemsize: int) -> int:
    """Per-batch-row VMEM estimate for the stored-P backward: 7
    channel-group blocks (q/k/v/do/dq/dk/dv), the f32 stored-P block for
    hg heads, and f32 dp/ds transients + bf16 casts for the live head."""
    return Np * (7 * CG * itemsize + 8 * CG + 4 * hg * Np + 16 * Np)


def _bwd_p_kernel(q_ref, k_ref, v_ref, do_ref, p_ref, pmult_ref,
                  dq_ref, dk_ref, dv_ref, dbias_ref, *, hg: int,
                  has_bias: bool, has_pmult: bool, scale: float):
    """Stored-probabilities backward for one (head-group, batch-block) grid
    cell: 4 dots per head (dv = P^T·do, dp = do·v^T, dq = ds·k,
    dk = ds^T·q), softmax-vjp from the f32 P the forward emitted. No score
    recompute, no softmax, no keypad/bias/kmask re-application — every
    masking term is already baked into P (masked columns have P = 0, so
    ds = 0 there; padded query rows have do = 0, so dp = ds = 0)."""
    i = pl.program_id(1)  # batch-block (inner) — dbias accumulates over it
    SB, Np, CG = q_ref.shape
    hd = CG // hg

    if has_bias:
        @pl.when(i == 0)
        def _init():
            dbias_ref[:] = jnp.zeros_like(dbias_ref)

    for hi in range(hg):
        sl = slice(hi * hd, (hi + 1) * hd)
        q = q_ref[..., sl]
        k = k_ref[..., sl]
        v = v_ref[..., sl]
        do_h = do_ref[..., sl]
        pf = p_ref[0, :, hi]  # (SB, Np, Np) f32, pre-dropout softmax
        if has_pmult:
            # out = (P·mlt) @ v: dv/of use P·mlt, dp picks up the mlt
            # factor BEFORE the softmax vjp
            mlt = pmult_ref[0].astype(jnp.float32)[None]
            pb = (pf * mlt).astype(q_ref.dtype)
        else:
            pb = pf.astype(q_ref.dtype)
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
        ds = pf * (dp - jnp.sum(dp * pf, axis=-1, keepdims=True))  # f32
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


def _bwd_p_core(q, k, v, do, p, pmult, *, num_heads: int, has_bias: bool):
    """Stored-P backward launcher. q/k/v/do: (B, N, C) head-major channel
    layout; p: (n_groups, B, hg, Np, Np) f32 from the forward's ``emit_p``.
    Returns (dq, dk, dv, dbias) with dbias f32 (h, N, N) or None."""
    B, N, C = q.shape
    hd = C // num_heads
    hg = _heads_per_group(num_heads, hd)
    n_groups = num_heads // hg
    Np = p.shape[-1]
    CG = hg * hd
    has_pmult = pmult is not None
    per_row = _bwd_p_bytes(Np, CG, hg, q.dtype.itemsize)
    # fixed-per-cell blocks (resident regardless of SB): the shared pmult
    # plane and — when has_bias — the f32 dbias accumulator for hg heads,
    # which lives across the whole inner (batch-block) grid dimension
    fixed = (4 * Np * Np if has_pmult else 0) + \
            (4 * hg * Np * Np if has_bias else 0)
    SB = _pick_winb(B, 1, per_row)
    while SB > 1 and SB * per_row + fixed > _VMEM_BUDGET:
        SB //= 2
    q, k, v, do = (_pad_n(t, Np, (1,)) for t in (q, k, v, do))
    pmult_in = (_pad_n(pmult.astype(jnp.float32)[None], Np, (1, 2))
                if has_pmult else jnp.zeros((1, 16, 16), jnp.float32))
    dbias_shape = ((n_groups * hg, Np, Np) if has_bias
                   else (n_groups * hg, 16, 16))

    kernel = functools.partial(_bwd_p_kernel, hg=hg, has_bias=has_bias,
                               has_pmult=has_pmult, scale=hd ** -0.5)
    blk = pl.BlockSpec((SB, Np, CG), lambda g, b: (b, 0, g),
                       memory_space=pltpu.VMEM)
    p_blk = pl.BlockSpec((1, SB, hg, Np, Np), lambda g, b: (g, b, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    pmult_blk = pl.BlockSpec(pmult_in.shape, lambda g, b: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    dbias_blk = pl.BlockSpec((hg,) + dbias_shape[1:],
                             lambda g, b: (g, 0, 0),
                             memory_space=pltpu.VMEM)
    dq, dk, dv, dbias = pl.pallas_call(
        kernel,
        grid=(n_groups, B // SB),
        in_specs=[blk, blk, blk, blk, p_blk, pmult_blk],
        out_specs=[blk, blk, blk, dbias_blk],
        out_shape=[
            jax.ShapeDtypeStruct((B, Np, C), q.dtype),
            jax.ShapeDtypeStruct((B, Np, C), q.dtype),
            jax.ShapeDtypeStruct((B, Np, C), q.dtype),
            jax.ShapeDtypeStruct(dbias_shape, jnp.float32),
        ],
        interpret=_interpret(),
    )(q, k, v, do, p, pmult_in)
    return (dq[:, :N, :], dk[:, :N, :], dv[:, :N, :],
            dbias[:, :N, :N] if has_bias else None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def attention_core(q, k, v, bias, kmask, pmult, num_heads):
    """Fused global MHA core. q/k/v: (B, N, C) head-major channel layout
    (minor-axis slices of a packed qkv projection); ``bias``: (h, N, N)
    additive per-head bias or None (differentiable); ``kmask``: (B, N)
    per-sample additive key mask (0 keep / -1e9 drop) or None (constant —
    its cotangent is zero); ``pmult``: (N, N) f32 multiplicative
    post-softmax mask or None — flax broadcast attention-prob dropout
    (keep/keep_prob, ONE draw shared over batch+heads; constant, zero
    cotangent). Returns (B, N, C). Requires equal q/k sequence lengths
    (self-attention shapes)."""
    return _fwd_core(q, k, v, bias, kmask, pmult, num_heads=num_heads)


def _ac_fwd(q, k, v, bias, kmask, pmult, num_heads):
    mode = globattn_bwd_mode()
    if mode == "store" and os.environ.get("SKINJAX_GLOBATTN_BWD") is None:
        # unset-env default: store only while (a) the f32 P residual stays
        # under the per-call ceiling — long-sequence text configs fall back
        # to the residual-free recompute backward instead of OOM — and
        # (b) the per-cell emitted-P VMEM block (hg*Np^2 f32) stays small
        # enough for the Mosaic compile helper (measured crash at ~8 MB,
        # N=1024; DESIGN §5m)
        B, N, C = q.shape
        Np = -(-N // 16) * 16
        hg = _heads_per_group(num_heads, C // num_heads)
        if (not _store_p_ok(B, num_heads, Np)
                or 4 * hg * Np * Np > 4 * 1024 * 1024
                # under block remat the forward is replayed in the backward
                # anyway, so the stored residual is pure extra HBM traffic:
                # measured beitv2_large B=64 SKINJAX_REMAT=block — recompute
                # 303.4 vs store 271.0 img/s (DESIGN §5m)
                or os.environ.get("SKINJAX_REMAT", "") == "block"):
            mode = "recompute"
    if mode == "store":
        y, p = _fwd_core(q, k, v, bias, kmask, pmult, num_heads=num_heads,
                         emit_p=True)
    else:
        y = _fwd_core(q, k, v, bias, kmask, pmult, num_heads=num_heads)
        p = None
    return y, (q, k, v, bias, kmask, pmult, p)


def _ac_bwd(num_heads, res, dy):
    q, k, v, bias, kmask, pmult, p = res
    has_bias = bias is not None
    if p is not None:
        # stored-P path: 4 dots per head, no recompute (see _bwd_p_kernel)
        dq, dk, dv, dbias = _bwd_p_core(
            q, k, v, dy, p, pmult, num_heads=num_heads, has_bias=has_bias)
    else:
        # the split core recomputes softmax per block and emits dq/dk/dv (+
        # dbias accumulated in-kernel); its `of` output feeds projection
        # grads in the windowed caller and is unused here (XLA AD already
        # holds the core output as the out-projection residual)
        dq, dk, dv, _of, dbias = _bwd_core(
            q, k, v, dy, bias if has_bias else None, None,
            num_heads=num_heads, has_bias=has_bias, has_mask=False, n_win=1,
            kmask=kmask, pmult=pmult,
        )
    return (dq, dk, dv,
            dbias.astype(bias.dtype) if has_bias else None,
            jnp.zeros_like(kmask) if kmask is not None else None,
            jnp.zeros_like(pmult) if pmult is not None else None)


attention_core.defvjp(_ac_fwd, _ac_bwd)
