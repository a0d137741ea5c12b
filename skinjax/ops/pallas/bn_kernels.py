"""Pallas BatchNorm reduction kernels — the conv+BN-statistics lever.

The v5e profile of the flagship train step (docs/DESIGN.md §5) shows ~22 ms
of ``convert_reduce_fusion`` per 65 ms step: XLA lowers the BN statistics
(forward mean/E[x²]) and the BN backward reductions (Σdy, Σdy·x) as separate
bf16→f32 convert+reduce passes over every activation tensor. These kernels
collapse each pair into ONE single-pass multi-output reduction:

- ``bn_stats(x)``        → (Σx, Σx²)   per channel, one read of x
- ``bn_grad_stats(x,dy)`` → (Σdy, Σdy·x) per channel, one read of (x, dy)

f32 accumulation happens in VMEM scratch across a 1-D grid over row blocks;
only the final (1, C) results are written to HBM. The normalize / dx
elementwise stages stay in XLA, which fuses them into neighbors.

Wired into training BatchNorm by ``skinjax.ops.fused_bn.FusedBatchNorm``.
Falls back to interpreter mode off-TPU so CPU tests exercise the same code.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_block(m: int, c: int) -> int:
    """Largest power-of-two divisor of m with block bytes ≤ ~2 MB."""
    target = max(8, (1 << 21) // max(c * 2, 1))
    blk = 1
    while blk * 2 <= target and m % (blk * 2) == 0:
        blk *= 2
    return blk


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _stats_kernel(x_ref, sum_ref, sq_ref):
    i = pl.program_id(0)
    xb = x_ref[:].astype(jnp.float32)
    s = jnp.sum(xb, axis=0, keepdims=True)
    q = jnp.sum(xb * xb, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        sum_ref[:] = s
        sq_ref[:] = q

    @pl.when(i > 0)
    def _():
        sum_ref[:] = sum_ref[:] + s
        sq_ref[:] = sq_ref[:] + q


@functools.partial(jax.jit, static_argnames=())
def bn_stats(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """x: (..., C) any dtype → (sum, sumsq) f32 of shape (C,), one pass."""
    C = x.shape[-1]
    m = x.size // C
    xm = x.reshape(m, C)
    blk = _row_block(m, C)
    grid = (m // blk,)
    s, q = pl.pallas_call(
        _stats_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((blk, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ),
        interpret=_interpret(),
    )(xm)
    return s[0], q[0]


def _grad_stats_kernel(x_ref, dy_ref, sdy_ref, sdyx_ref):
    i = pl.program_id(0)
    xb = x_ref[:].astype(jnp.float32)
    dyb = dy_ref[:].astype(jnp.float32)
    s = jnp.sum(dyb, axis=0, keepdims=True)
    p = jnp.sum(dyb * xb, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        sdy_ref[:] = s
        sdyx_ref[:] = p

    @pl.when(i > 0)
    def _():
        sdy_ref[:] = sdy_ref[:] + s
        sdyx_ref[:] = sdyx_ref[:] + p


@functools.partial(jax.jit, static_argnames=())
def bn_grad_stats(x: jax.Array, dy: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(x, dy): (..., C) → (Σdy, Σdy·x) f32 of shape (C,), one pass."""
    C = x.shape[-1]
    m = x.size // C
    blk = _row_block(m, C)
    grid = (m // blk,)
    sdy, sdyx = pl.pallas_call(
        _grad_stats_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((blk, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ),
        interpret=_interpret(),
    )(x.reshape(m, C), dy.reshape(m, C))
    return sdy[0], sdyx[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def batch_norm_train(x, scale, bias, eps: float):
    """Training-mode BN with Pallas single-pass statistics.

    Returns (y, mean, var) — mean/var are the biased batch statistics the
    caller feeds the running-average update (not differentiated, like the
    reference's torch BN)."""
    y, mean, var = _bn_fwd_impl(x, scale, bias, eps)
    return y, mean, var


def _bn_fwd_impl(x, scale, bias, eps):
    C = x.shape[-1]
    n = x.size // C
    s, q = bn_stats(x)
    mean = s / n
    var = jnp.maximum(q / n - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    mul = (rstd * scale.astype(jnp.float32)).astype(x.dtype)
    add = (bias.astype(jnp.float32) - mean * rstd * scale.astype(jnp.float32)
           ).astype(x.dtype)
    y = x * mul + add  # XLA fuses this into the consumer
    return y, mean, var


def _bn_fwd(x, scale, bias, eps):
    y, mean, var = _bn_fwd_impl(x, scale, bias, eps)
    return (y, mean, var), (x, scale, mean, var)


def _bn_bwd(eps, res, cts):
    gy, _gmean, _gvar = cts  # stats outputs feed running averages: no grad
    x, scale, mean, var = res
    C = x.shape[-1]
    n = x.size // C
    rstd = jax.lax.rsqrt(var + eps)
    sdy, sdyx = bn_grad_stats(x, gy)
    # Σ dy·xhat = (Σ dy·x − mean·Σ dy)·rstd
    dscale = (sdyx - mean * sdy) * rstd
    dbias = sdy
    # dx = scale·rstd · (dy − (dbias + xhat·dscale)/n)
    k1 = (scale.astype(jnp.float32) * rstd).astype(x.dtype)
    c_bias = (dbias / n).astype(jnp.float32)
    c_scale = (dscale / n).astype(jnp.float32)
    xhat_mul = rstd.astype(jnp.float32)
    # elementwise: XLA fuses (reads gy, x once; writes dx)
    xf = x.astype(jnp.float32)
    xhat = (xf - mean) * xhat_mul
    dx = (k1.astype(jnp.float32)
          * (gy.astype(jnp.float32) - c_bias - xhat * c_scale)).astype(x.dtype)
    return dx, dscale.astype(scale.dtype), dbias.astype(scale.dtype)


batch_norm_train.defvjp(_bn_fwd, _bn_bwd)
