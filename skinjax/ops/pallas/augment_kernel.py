"""Pallas kernel: fused per-sample color-stage augmentation.

The color stage of the augmentation pipeline (coarse dropout → HSV jitter →
brightness/contrast → ImageNet normalize → bf16 cast) is elementwise but
XLA materializes several (B, H, W, 3) fp32 intermediates across the op
chain (~10 ms at 128×224² on v5e). This kernel runs the whole chain in one
VMEM-resident pass per image: one fp32 read, one bf16 write, ~40 flops/pixel.

Geometry (rotation/flips/blur) stays in XLA where convs and batch-shared
gathers are already optimal; random draws happen outside with jax.random so
determinism matches the unfused path's RNG stream layout.

Layout: images enter as (B, 3, H, W) planar fp32 (transposed once by the
caller) so each channel is a well-tiled (H, W) plane; per-sample scalar
parameters ride in SMEM rows.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from skinjax.data.augment import IMAGENET_MEAN, IMAGENET_STD


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _color_kernel(fparams_ref, iparams_ref, img_ref, out_ref):
    """img_ref: (1, 3, H, W) fp32 in [0,1]; out_ref: (1, 3, H, W) bf16.

    fparams (B, 8) in SMEM: [do_dropout, do_hsv, hue_shift, sat_shift,
                             val_shift, do_bc, alpha, beta]
    iparams (B, 12) in SMEM: [n_holes, hole, ys0..ys4, xs0..xs4]
    (full arrays; the kernel reads its own row by program_id)
    """
    H = img_ref.shape[2]
    W = img_ref.shape[3]
    row = pl.program_id(0)
    r = img_ref[0, 0, :, :]
    g = img_ref[0, 1, :, :]
    b = img_ref[0, 2, :, :]

    # ---- coarse dropout -------------------------------------------------
    do_drop = fparams_ref[row, 0]
    n_holes = iparams_ref[row, 0]
    hole = iparams_ref[row, 1]
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    mask = jnp.ones((H, W), jnp.float32)
    for i in range(5):
        ys = iparams_ref[row, 2 + i]
        xs = iparams_ref[row, 7 + i]
        inside = (yy >= ys) & (yy < ys + hole) & (xx >= xs) & (xx < xs + hole)
        active = jnp.where(i < n_holes, 1.0, 0.0) * do_drop
        mask = mask * (1.0 - inside.astype(jnp.float32) * active)
    r, g, b = r * mask, g * mask, b * mask

    # ---- HSV jitter ------------------------------------------------------
    do_hsv = fparams_ref[row, 1]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    delta = maxc - minc
    safe = jnp.maximum(delta, 1e-12)
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        r == maxc, bc - gc, jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(delta == 0, 0.0, (h / 6.0) % 1.0)

    h = (h + fparams_ref[row, 2] * do_hsv) % 1.0
    s = jnp.clip(s + fparams_ref[row, 3] * do_hsv, 0.0, 1.0)
    v = jnp.clip(maxc + fparams_ref[row, 4] * do_hsv, 0.0, 1.0)

    i6 = jnp.floor(h * 6.0)
    f = h * 6.0 - i6
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i6 = i6.astype(jnp.int32) % 6

    def pick(c0, c1, c2, c3, c4, c5):
        # nested where instead of jnp.select (select lowers through argmax,
        # which Mosaic only supports for f32 operands)
        out = c5
        for idx, val in ((4, c4), (3, c3), (2, c2), (1, c1), (0, c0)):
            out = jnp.where(i6 == idx, val, out)
        return out

    r = pick(v, q, p, p, t, v)
    g = pick(t, v, v, q, p, p)
    b = pick(p, p, t, v, v, q)

    # ---- brightness/contrast + normalize + cast -------------------------
    do_bc = fparams_ref[row, 5]
    alpha = 1.0 + (fparams_ref[row, 6] - 1.0) * do_bc
    beta = fparams_ref[row, 7] * do_bc
    mean = (0.485, 0.456, 0.406)  # python literals: kernels can't close over
    std = (0.229, 0.224, 0.225)   # traced arrays
    out_ref[0, 0, :, :] = (
        (jnp.clip(r * alpha + beta, 0.0, 1.0) - mean[0]) / std[0]
    ).astype(out_ref.dtype)
    out_ref[0, 1, :, :] = (
        (jnp.clip(g * alpha + beta, 0.0, 1.0) - mean[1]) / std[1]
    ).astype(out_ref.dtype)
    out_ref[0, 2, :, :] = (
        (jnp.clip(b * alpha + beta, 0.0, 1.0) - mean[2]) / std[2]
    ).astype(out_ref.dtype)


def fused_color_stage(img_nhwc, fparams, iparams, out_dtype=jnp.bfloat16):
    """img_nhwc: (B, H, W, 3) fp32 in [0,1]; fparams (B, 8) fp32;
    iparams (B, 12) int32. Returns normalized (B, H, W, 3) out_dtype."""
    B, H, W, _ = img_nhwc.shape
    img = img_nhwc.transpose(0, 3, 1, 2)  # planar
    # kernel computes in fp32 (some Mosaic paths reject non-f32 stores for
    # these mixed elementwise chains); the cast to bf16 fuses into the
    # transpose-out copy
    out = pl.pallas_call(
        _color_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, H, W), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, H, W), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 3, H, W), jnp.float32),
        interpret=_interpret(),
    )(fparams, iparams, img)
    return out.transpose(0, 2, 3, 1).astype(out_dtype)


def draw_color_params(key, B, H, W, cfg, hole: int = 8):
    """Per-sample random draws for the fused color stage (host of the same
    distributions as data/augment._augment_one)."""
    ks = jax.random.split(key, 9)
    do_drop = (jax.random.uniform(ks[0], (B,)) < cfg["p_dropout"]).astype(jnp.float32)
    do_hsv = (jax.random.uniform(ks[1], (B,)) < cfg["p_hsv"]).astype(jnp.float32)
    sh = jax.random.uniform(ks[2], (B, 3), minval=-1.0, maxval=1.0)
    hue = sh[:, 0] * (10.0 / 180.0)
    sat = sh[:, 1] * (15.0 / 255.0)
    val = sh[:, 2] * (10.0 / 255.0)
    do_bc = (jax.random.uniform(ks[3], (B,)) < cfg["p_bc"]).astype(jnp.float32)
    ab = jax.random.uniform(ks[4], (B, 2), minval=-0.2, maxval=0.2)
    alpha = 1.0 + ab[:, 0]
    beta = ab[:, 1]
    fparams = jnp.stack([do_drop, do_hsv, hue, sat, val, do_bc, alpha, beta], axis=1)

    n_holes = jax.random.randint(ks[5], (B, 1), 1, 6)
    ys = jax.random.randint(ks[6], (B, 5), 0, max(H - hole, 1))
    xs = jax.random.randint(ks[7], (B, 5), 0, max(W - hole, 1))
    iparams = jnp.concatenate(
        [n_holes, jnp.full((B, 1), hole, jnp.int32), ys, xs], axis=1
    ).astype(jnp.int32)
    return fparams, iparams
