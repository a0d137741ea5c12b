"""Fused token-MLP (fc1 -> exact GELU -> fc2) for CoaT-lite's serial blocks.

The v5e profile of the coat_lite_small train step (DESIGN §5o,
bench/trace_effb7.py harness) put the stage-1 MLP elementwise chains at the
top of the "other fusions" bucket: XLA's lowering materializes BOTH the
post-GELU activation and the saved-for-backward pre-activation as
``(bf16[64,3137,512], bf16[64,3137,512])`` tuples — ~0.8 GB of HBM
round-trips per instance at the ~520 GB/s roofline, x3 forward instances
plus their backward reads.

This kernel keeps the (tokens, hidden) intermediate entirely in VMEM per
token tile: one read of x, one write of y, and NOTHING saved for the
backward — the backward kernel recomputes the pre-activation from the
residual-stream x (one extra small MXU matmul per tile, paid instead of two
0.4 GB HBM round-trips). Weight/bias blocks use a constant index map so they
stay VMEM-resident across the sequential TPU grid; dW/db accumulate f32
across grid steps into single-block outputs (init at step 0 — TPU grids are
sequential so the accumulation is race-free).

Exactness: the GELU is the erf form (``approximate=False``), matching
timm's ``Mlp`` act layer that coat_lite_small trains with (reference loads
it via loadImageModelClassifier.py:115-150); padding tokens are explicit
zeros padded OUTSIDE the kernel, and zero dy rows contribute exactly zero
to every accumulated gradient, so no masking is needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from skinjax.ops.pallas.window_attention import _interpret, _pad_n

_INV_SQRT2 = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327


def _erf_f32(x):
    """erf via Abramowitz & Stegun 7.1.26 (max abs err 1.5e-7 — below every
    parity tolerance in tests/test_fused_mlp.py and far below bf16
    resolution). Mosaic TPU has NO erf lowering (measured: the lax.erf form
    fails to compile with 'Unimplemented primitive ... erf'), so the kernel
    builds it from exp/abs/sign, all supported."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _gelu_f32(pre):
    """Exact-form (erf) GELU on an f32 tile."""
    return pre * 0.5 * (1.0 + _erf_f32(pre * _INV_SQRT2))


def _dgelu_f32(pre):
    """d/dx of exact GELU: Phi(x) + x * phi(x)."""
    cdf = 0.5 * (1.0 + _erf_f32(pre * _INV_SQRT2))
    pdf = jnp.exp(-0.5 * pre * pre) * _INV_SQRT_2PI
    return cdf + pre * pdf


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref):
    x = x_ref[:]
    pre = (
        jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
        + b1_ref[:]
    )
    h = _gelu_f32(pre).astype(x.dtype)
    y_ref[:] = (
        jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
        + b2_ref[:]
    ).astype(y_ref.dtype)


def _bwd_kernel(x_ref, dy_ref, w1_ref, b1_ref, w2_ref,
                dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
    x = x_ref[:]
    dy = dy_ref[:]
    # recompute the hidden activation (never saved to HBM)
    pre = (
        jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
        + b1_ref[:]
    )
    h = _gelu_f32(pre).astype(x.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    # fc2 grads
    dw2_ref[:] += jax.lax.dot_general(
        h, dy, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    db2_ref[:] += jnp.sum(dy.astype(jnp.float32), axis=0, keepdims=True)
    # back through GELU
    dh = jax.lax.dot_general(
        dy, w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dpre = dh * _dgelu_f32(pre)
    dpre_b = dpre.astype(x.dtype)
    # fc1 grads + input grad
    dw1_ref[:] += jax.lax.dot_general(
        x, dpre_b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db1_ref[:] += jnp.sum(dpre, axis=0, keepdims=True)
    dx_ref[:] = jax.lax.dot_general(
        dpre_b, w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dx_ref.dtype)


def _token_tile(hidden: int) -> int:
    # keep the f32 (tile, hidden) pre-activation plane (and its backward
    # dh/dpre siblings) a small fraction of VMEM; 512x1024 f32 = 2 MB
    return 512 if hidden <= 1024 else 256


def _prep(x2d, tn: int):
    T = x2d.shape[0]
    Tp = -(-T // tn) * tn
    return _pad_n(x2d, Tp, (0,)), Tp


def _fwd_core(x2d, w1, b1, w2, b2):
    T, D = x2d.shape
    H, D2 = w2.shape
    tn = _token_tile(H)
    xp, Tp = _prep(x2d, tn)
    row = lambda t: pl.BlockSpec((tn, t.shape[1]), lambda g: (g, 0),
                                 memory_space=pltpu.VMEM)
    full = lambda t: pl.BlockSpec(t.shape, lambda g: (0, 0),
                                  memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        _fwd_kernel,
        grid=(Tp // tn,),
        in_specs=[row(xp), full(w1), full(b1), full(w2), full(b2)],
        out_specs=pl.BlockSpec((tn, D2), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, D2), x2d.dtype),
        interpret=_interpret(),
    )(xp, w1, b1, w2, b2)
    return y[:T]


def _bwd_core(x2d, dy2d, w1, b1, w2):
    T, D = x2d.shape
    H, D2 = w2.shape
    tn = _token_tile(H)
    xp, Tp = _prep(x2d, tn)
    dyp, _ = _prep(dy2d, tn)
    row = lambda width: pl.BlockSpec((tn, width), lambda g: (g, 0),
                                     memory_space=pltpu.VMEM)
    full = lambda t: pl.BlockSpec(t.shape, lambda g: (0, 0),
                                  memory_space=pltpu.VMEM)
    acc = lambda shp: pl.BlockSpec(shp, lambda g: (0, 0),
                                   memory_space=pltpu.VMEM)
    shapes = [
        jax.ShapeDtypeStruct((Tp, D), x2d.dtype),     # dx
        jax.ShapeDtypeStruct((D, H), jnp.float32),    # dw1
        jax.ShapeDtypeStruct((1, H), jnp.float32),    # db1
        jax.ShapeDtypeStruct((H, D2), jnp.float32),   # dw2
        jax.ShapeDtypeStruct((1, D2), jnp.float32),   # db2
    ]
    dx, dw1, db1, dw2, db2 = pl.pallas_call(
        _bwd_kernel,
        grid=(Tp // tn,),
        in_specs=[row(D), row(D2), full(w1), full(b1), full(w2)],
        out_specs=[row(D)] + [acc(s.shape) for s in shapes[1:]],
        out_shape=shapes,
        interpret=_interpret(),
    )(xp, dyp, w1, b1, w2)
    return dx[:T], dw1, db1, dw2, db2


@jax.custom_vjp
def mlp_gelu(x, w1, b1, w2, b2):
    """Fused ``x @ w1 + b1 -> gelu(exact) -> @ w2 + b2`` over the token axis.

    x: (..., D); w1: (D, H); b1: (H,); w2: (H, D2); b2: (D2,). All args are
    differentiable; grads for w/b are f32-accumulated across token tiles and
    cast back to the argument dtypes. The hidden activation never touches
    HBM; the backward recomputes it from x.
    """
    lead = x.shape[:-1]
    y = _fwd_core(x.reshape(-1, x.shape[-1]), w1, b1.reshape(1, -1),
                  w2, b2.reshape(1, -1))
    return y.reshape(*lead, w2.shape[1])


def _mlp_fwd(x, w1, b1, w2, b2):
    return mlp_gelu(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)


def _mlp_bwd(res, dy):
    x, w1, b1, w2, b2 = res
    lead = x.shape[:-1]
    dx, dw1, db1, dw2, db2 = _bwd_core(
        x.reshape(-1, x.shape[-1]), dy.reshape(-1, dy.shape[-1]),
        w1, b1.reshape(1, -1), w2)
    return (dx.reshape(*lead, x.shape[-1]), dw1.astype(w1.dtype),
            db1[0].astype(b1.dtype), dw2.astype(w2.dtype),
            db2[0].astype(b2.dtype))


mlp_gelu.defvjp(_mlp_fwd, _mlp_bwd)


# ---------------------------------------------------------------------------
# StarReLU variant for MetaFormer/CAFormer block MLPs: bias-free Denses,
# activation s*relu(x)^2 + b with learnable SCALARS (timm metaformer
# StarReLU; models/backbones/caformer.py MetaFormerMlp). Same VMEM-resident
# hidden plane + recompute backward as mlp_gelu.
# ---------------------------------------------------------------------------


def _star_fwd_kernel(x_ref, w1_ref, s_ref, b_ref, w2_ref, y_ref):
    x = x_ref[:]
    pre = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
    r = jnp.maximum(pre, 0.0)
    h = (s_ref[:] * r * r + b_ref[:]).astype(x.dtype)  # (1,1) broadcast
    y_ref[:] = jnp.dot(
        h, w2_ref[:], preferred_element_type=jnp.float32).astype(y_ref.dtype)


def _star_bwd_kernel(x_ref, dy_ref, w1_ref, s_ref, b_ref, w2_ref,
                     dx_ref, dw1_ref, ds_ref, db_ref, dw2_ref):
    x = x_ref[:]
    dy = dy_ref[:]
    pre = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
    r = jnp.maximum(pre, 0.0)
    r2 = r * r
    s = s_ref[:]  # (1,1), broadcasts — Mosaic dislikes scalar VMEM access
    h = (s * r2 + b_ref[:]).astype(x.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        ds_ref[:] = jnp.zeros_like(ds_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)

    dw2_ref[:] += jax.lax.dot_general(
        h, dy, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dh = jax.lax.dot_general(
        dy, w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    # (1,1) keepdims stores: Mosaic rejects scalar stores to VMEM (measured
    # on-chip, 'ValueError: Cannot store scalars to VMEM' — DESIGN §5p)
    ds_ref[:] += jnp.sum(dh * r2, axis=(0, 1), keepdims=True)
    db_ref[:] += jnp.sum(dh, axis=(0, 1), keepdims=True)
    dpre = dh * (2.0 * s * r)  # d(s*r^2)/dpre = 2*s*r (0 where pre <= 0)
    dpre_b = dpre.astype(x.dtype)
    dw1_ref[:] += jax.lax.dot_general(
        x, dpre_b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dx_ref[:] = jax.lax.dot_general(
        dpre_b, w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dx_ref.dtype)


def _star_fwd_core(x2d, w1, s, b, w2):
    T, D = x2d.shape
    H, D2 = w2.shape
    tn = _token_tile(H)
    xp, Tp = _prep(x2d, tn)
    row = lambda t: pl.BlockSpec((tn, t.shape[1]), lambda g: (g, 0),
                                 memory_space=pltpu.VMEM)
    full = lambda t: pl.BlockSpec(t.shape, lambda g: (0, 0),
                                  memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        _star_fwd_kernel,
        grid=(Tp // tn,),
        in_specs=[row(xp), full(w1), full(s), full(b), full(w2)],
        out_specs=pl.BlockSpec((tn, D2), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, D2), x2d.dtype),
        interpret=_interpret(),
    )(xp, w1, s, b, w2)
    return y[:T]


def _star_bwd_core(x2d, dy2d, w1, s, b, w2):
    T, D = x2d.shape
    H, D2 = w2.shape
    tn = _token_tile(H)
    xp, Tp = _prep(x2d, tn)
    dyp, _ = _prep(dy2d, tn)
    row = lambda width: pl.BlockSpec((tn, width), lambda g: (g, 0),
                                     memory_space=pltpu.VMEM)
    full = lambda t: pl.BlockSpec(t.shape, lambda g: (0, 0),
                                  memory_space=pltpu.VMEM)
    acc = lambda shp: pl.BlockSpec(shp, lambda g: (0, 0),
                                   memory_space=pltpu.VMEM)
    shapes = [
        jax.ShapeDtypeStruct((Tp, D), x2d.dtype),     # dx
        jax.ShapeDtypeStruct((D, H), jnp.float32),    # dw1
        jax.ShapeDtypeStruct((1, 1), jnp.float32),    # ds
        jax.ShapeDtypeStruct((1, 1), jnp.float32),    # db
        jax.ShapeDtypeStruct((H, D2), jnp.float32),   # dw2
    ]
    dx, dw1, ds, db, dw2 = pl.pallas_call(
        _star_bwd_kernel,
        grid=(Tp // tn,),
        in_specs=[row(D), row(D2), full(w1), full(s), full(b), full(w2)],
        out_specs=[row(D)] + [acc(t.shape) for t in shapes[1:]],
        out_shape=shapes,
        interpret=_interpret(),
    )(xp, dyp, w1, s, b, w2)
    return dx[:T], dw1, ds, db, dw2


@jax.custom_vjp
def mlp_star(x, w1, s, b, w2):
    """Fused bias-free ``x @ w1 -> s*relu^2+b -> @ w2`` (StarReLU MLP).

    x: (..., D); w1: (D, H); s, b: scalar arrays of shape (1,); w2: (H, D2).
    All args differentiable; the hidden plane never touches HBM and the
    backward recomputes it from x.
    """
    lead = x.shape[:-1]
    y = _star_fwd_core(x.reshape(-1, x.shape[-1]), w1,
                       s.reshape(1, 1).astype(jnp.float32),
                       b.reshape(1, 1).astype(jnp.float32), w2)
    return y.reshape(*lead, w2.shape[1])


def _star_vjp_fwd(x, w1, s, b, w2):
    return mlp_star(x, w1, s, b, w2), (x, w1, s, b, w2)


def _star_vjp_bwd(res, dy):
    x, w1, s, b, w2 = res
    lead = x.shape[:-1]
    dx, dw1, ds, db, dw2 = _star_bwd_core(
        x.reshape(-1, x.shape[-1]), dy.reshape(-1, dy.shape[-1]), w1,
        s.reshape(1, 1).astype(jnp.float32),
        b.reshape(1, 1).astype(jnp.float32), w2)
    return (dx.reshape(*lead, x.shape[-1]), dw1.astype(w1.dtype),
            ds.reshape(1).astype(s.dtype), db.reshape(1).astype(b.dtype),
            dw2.astype(w2.dtype))


mlp_star.defvjp(_star_vjp_fwd, _star_vjp_bwd)


def mlp_star_reference(x, w1, s, b, w2):
    """Pure-XLA oracle — identical math to Dense(bias-free) -> StarReLU ->
    Dense(bias-free) (models/backbones/caformer.py MetaFormerMlp)."""
    pre = jnp.dot(x, w1, preferred_element_type=jnp.float32)
    r = jnp.maximum(pre, 0.0)
    h = (s.reshape(()) * r * r + b.reshape(())).astype(x.dtype)
    return jnp.dot(h, w2, preferred_element_type=jnp.float32).astype(x.dtype)


def mlp_gelu_reference(x, w1, b1, w2, b2):
    """Pure-XLA oracle — identical math to the two-Dense + exact-GELU chain
    (models/backbones/coat.py serial-block MLP)."""
    h = jax.nn.gelu(
        jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1,
        approximate=False)
    return (jnp.dot(h.astype(x.dtype), w2,
                    preferred_element_type=jnp.float32) + b2).astype(x.dtype)
