"""Fused color-stage Pallas kernel vs the reference jnp chain (interpret)."""

import numpy as np
import jax
import jax.numpy as jnp

from skinjax.data.augment import (
    DEFAULT_CFG,
    IMAGENET_MEAN,
    IMAGENET_STD,
    augment_batch,
    hsv_to_rgb,
    rgb_to_hsv,
)
from skinjax.ops.pallas.augment_kernel import draw_color_params, fused_color_stage


def _ref_chain(im, f, i, H, W):
    do_drop, do_hsv, hue, sat, val, do_bc, alpha, beta = [f[j] for j in range(8)]
    n, hole = i[0], i[1]
    ys, xs = i[2:7], i[7:12]
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    mask = jnp.ones((H, W))
    for k in range(5):
        inside = (yy >= ys[k]) & (yy < ys[k] + hole) & (xx >= xs[k]) & (xx < xs[k] + hole)
        mask = mask * (1.0 - inside.astype(jnp.float32) * jnp.where(k < n, 1.0, 0.0) * do_drop)
    im = im * mask[..., None]
    hsv = rgb_to_hsv(jnp.clip(im, 0, 1))
    h = (hsv[..., 0] + hue * do_hsv) % 1.0
    s = jnp.clip(hsv[..., 1] + sat * do_hsv, 0, 1)
    v = jnp.clip(hsv[..., 2] + val * do_hsv, 0, 1)
    im = hsv_to_rgb(jnp.stack([h, s, v], -1))
    a = 1.0 + (alpha - 1.0) * do_bc
    b2 = beta * do_bc
    im = jnp.clip(im * a + b2, 0, 1)
    return (im - IMAGENET_MEAN) / IMAGENET_STD


def test_fused_color_stage_matches_reference_chain():
    B, H, W = 3, 32, 32
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    fp, ip = draw_color_params(jax.random.key(1), B, H, W, DEFAULT_CFG)
    out = fused_color_stage(img, fp, ip, out_dtype=jnp.float32)
    ref = jnp.stack([_ref_chain(img[j], fp[j], ip[j], H, W) for j in range(B)])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_augment_batch_fused_path_runs():
    B = 4
    im = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (B, 32, 32, 3), dtype=np.uint8)
    )
    out = augment_batch(im, jax.random.key(0), train=True, fused_color=True)
    assert out.shape == (B, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()
