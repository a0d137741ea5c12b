"""On-device image augmentation (jitted JAX, vmapped per-sample).

TPU-first replacement for the reference's CPU/OpenCV albumentations pipeline
(skinLesionDatasets.py:60-120): the same augmentation *distribution* —
  Rotate(±45°, reflect, p=.5) → HFlip(.5) → VFlip(.2) → GaussianBlur(σ≤2, .25)
  → CoarseDropout(5×8×8, .15) → HueSaturationValue(10/15/10, .25)
  → RandomBrightnessContrast(±0.2, .25) → Normalize(ImageNet)
— but executed on the accelerator as one fused jit region: the host only
decodes + resizes uint8 images; everything stochastic runs on-device from a
`jax.random` key (deterministic per (seed, epoch, sample), shardable — each
device augments its own batch shard with its own fold of the key).

Everything is static-shaped and branch-free (probability gates are arithmetic
selects), so one compilation serves the whole run.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406], dtype=jnp.float32)
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225], dtype=jnp.float32)


def _reflect_index(i, n):
    """Reflect-101 border (cv2.BORDER_REFLECT_101 used by A.Rotate)."""
    period = 2 * n - 2
    i = jnp.abs(i) % period
    return (n - 1) - jnp.abs(i - (n - 1))


def _bilinear_sample(img, ys, xs):
    """img: (H, W, C); ys/xs: (H, W) float source coords; reflect border."""
    H, W = img.shape[0], img.shape[1]
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    # keep the lerp in the image dtype (bf16 stays bf16 — halves the gather
    # traffic; [0,1] pixels lose nothing vs their uint8 source precision)
    wy = (ys - y0)[..., None].astype(img.dtype)
    wx = (xs - x0)[..., None].astype(img.dtype)
    y0r, y1r = _reflect_index(y0, H), _reflect_index(y0 + 1, H)
    x0r, x1r = _reflect_index(x0, W), _reflect_index(x0 + 1, W)
    v00 = img[y0r, x0r]
    v01 = img[y0r, x1r]
    v10 = img[y1r, x0r]
    v11 = img[y1r, x1r]
    return (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )


def rotate(img, angle_rad):
    """Rotate around center, bilinear, reflect border. img: (H, W, C) float."""
    H, W = img.shape[0], img.shape[1]
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    yy = jnp.arange(H, dtype=jnp.float32)[:, None] - cy
    xx = jnp.arange(W, dtype=jnp.float32)[None, :] - cx
    cos, sin = jnp.cos(angle_rad), jnp.sin(angle_rad)
    # inverse mapping: dest(y,x) <- src(cos*y - sin*x, sin*y + cos*x)
    src_y = cos * yy - sin * xx + cy
    src_x = sin * yy + cos * xx + cx
    src_y = jnp.broadcast_to(src_y, (H, W))
    src_x = jnp.broadcast_to(src_x, (H, W))
    return _bilinear_sample(img, src_y, src_x)


def rotate_batch_rows(img, angle_rad, max_deg: float = 60.0):
    """Batch rotation via ROW gathers (TPU-shaped bilinear).

    Element gathers on TPU run ~24 GB/s (VPU, per-element); the profile
    showed the 4-corner bilinear gather dominating the augment stage. This
    variant reflect-pads once, transposes to (Hp·Wp, B·C) so each gathered
    unit is a CONTIGUOUS row of B·C elements (an embedding-style lookup the
    TPU does at near-DMA rate), does the 4 corner lookups as row gathers
    shared across the batch, and transposes back. Numerics are identical to
    ``rotate`` (reflect-101, bilinear) for |angle| ≤ max_deg.
    """
    import math

    B, H, W, C = img.shape
    # |cos|+|sin| peaks at 45°: for angle ranges crossing it, pad for the peak
    a = math.radians(max_deg)
    factor = math.sqrt(2.0) if max_deg >= 45.0 else (
        abs(math.cos(a)) + abs(math.sin(a))
    )
    pad = int(math.ceil(max(H, W) / 2.0 * (factor - 1.0))) + 2
    Hp, Wp = H + 2 * pad, W + 2 * pad
    p = jnp.pad(img, [(0, 0), (pad, pad), (pad, pad), (0, 0)], mode="reflect")
    rows = p.transpose(1, 2, 0, 3).reshape(Hp * Wp, B * C)

    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    yy = jnp.arange(H, dtype=jnp.float32)[:, None] - cy
    xx = jnp.arange(W, dtype=jnp.float32)[None, :] - cx
    cos, sin = jnp.cos(angle_rad), jnp.sin(angle_rad)
    src_y = jnp.broadcast_to(cos * yy - sin * xx + cy, (H, W)) + pad
    src_x = jnp.broadcast_to(sin * yy + cos * xx + cx, (H, W)) + pad
    y0 = jnp.floor(src_y).astype(jnp.int32)
    x0 = jnp.floor(src_x).astype(jnp.int32)
    wy = (src_y - y0).reshape(-1, 1).astype(img.dtype)
    wx = (src_x - x0).reshape(-1, 1).astype(img.dtype)
    y0 = jnp.clip(y0, 0, Hp - 2).reshape(-1)
    x0 = jnp.clip(x0, 0, Wp - 2).reshape(-1)
    base = y0 * Wp + x0
    v00 = rows[base]
    v01 = rows[base + 1]
    v10 = rows[base + Wp]
    v11 = rows[base + Wp + 1]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    out = top * (1 - wy) + bot * wy  # (H*W, B*C)
    return out.reshape(H, W, B, C).transpose(2, 0, 1, 3)


def zoom_batch_rows(img, sy, sx):
    """Batch zoom-in (A.Affine scale ≥ 1) via the same row-gather bilinear
    scheme as ``rotate_batch_rows``. Source coords stay in-bounds for
    sy, sx ≥ 1, so no border padding is needed. img: (B, H, W, C)."""
    B, H, W, C = img.shape
    rows = img.transpose(1, 2, 0, 3).reshape(H * W, B * C)
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    yy = jnp.arange(H, dtype=jnp.float32)[:, None] - cy
    xx = jnp.arange(W, dtype=jnp.float32)[None, :] - cx
    src_y = jnp.broadcast_to(yy / sy + cy, (H, W))
    src_x = jnp.broadcast_to(xx / sx + cx, (H, W))
    # clip BEFORE computing lerp weights so the last row/column (floor == H-1)
    # interpolates as (1-w)=0 on the clipped base texel, not off-by-one
    y0 = jnp.clip(jnp.floor(src_y).astype(jnp.int32), 0, H - 2)
    x0 = jnp.clip(jnp.floor(src_x).astype(jnp.int32), 0, W - 2)
    wy = (src_y - y0).reshape(-1, 1).astype(img.dtype)
    wx = (src_x - x0).reshape(-1, 1).astype(img.dtype)
    y0 = y0.reshape(-1)
    x0 = x0.reshape(-1)
    base = y0 * W + x0
    v00 = rows[base]
    v01 = rows[base + 1]
    v10 = rows[base + W]
    v11 = rows[base + W + 1]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    out = top * (1 - wy) + bot * wy
    return out.reshape(H, W, B, C).transpose(2, 0, 1, 3)


def gaussian_blur(img, sigma, ksize: int = 7):
    """Separable Gaussian blur; sigma==0 degenerates to identity.
    img: (H, W, C) single image (used by tests/visualizers)."""
    return gaussian_blur_batch(img[None], sigma, ksize)[0]


def gaussian_blur_batch(img, sigma, ksize: int = 7):
    """Batch separable blur via two depthwise convs (MXU-friendly; one
    reflect pad each). img: (B, H, W, C); sigma: traced scalar."""
    r = ksize // 2
    x = jnp.arange(-r, r + 1, dtype=jnp.float32)
    sigma = jnp.maximum(sigma, 1e-6)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = (k / k.sum()).astype(img.dtype)
    C = img.shape[-1]
    dn = jax.lax.conv_dimension_numbers(img.shape, (ksize, 1, 1, C),
                                        ("NHWC", "HWIO", "NHWC"))
    kh = jnp.tile(k.reshape(ksize, 1, 1, 1), (1, 1, 1, C))
    p = jnp.pad(img, [(0, 0), (r, r), (0, 0), (0, 0)], mode="reflect")
    img = jax.lax.conv_general_dilated(
        p, kh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=C
    )
    kw = jnp.tile(k.reshape(1, ksize, 1, 1), (1, 1, 1, C))
    dn2 = jax.lax.conv_dimension_numbers(img.shape, (1, ksize, 1, C),
                                         ("NHWC", "HWIO", "NHWC"))
    p = jnp.pad(img, [(0, 0), (0, 0), (r, r), (0, 0)], mode="reflect")
    return jax.lax.conv_general_dilated(
        p, kw, (1, 1), "VALID", dimension_numbers=dn2, feature_group_count=C
    )


def rgb_to_hsv(img):
    return jnp.stack(_rgb_to_hsv_ch(img[..., 0], img[..., 1], img[..., 2]), axis=-1)


def _rgb_to_hsv_ch(r, g, b):
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        r == maxc, bc - gc, jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = (h / 6.0) % 1.0
    h = jnp.where(delta == 0, 0.0, h)
    return h, s, v


def hsv_to_rgb(img):
    h, s, v = img[..., 0], img[..., 1], img[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def coarse_dropout(img, key, max_holes: int = 5, hole: int = 8,
                   min_holes: int = 1):
    """Zero out up to max_holes hole×hole squares (A.CoarseDropout parity)."""
    H, W = img.shape[0], img.shape[1]
    kys, kxs, kn = jax.random.split(key, 3)
    ys = jax.random.randint(kys, (max_holes,), 0, max(H - hole, 1))
    xs = jax.random.randint(kxs, (max_holes,), 0, max(W - hole, 1))
    n_holes = jax.random.randint(kn, (), min_holes, max_holes + 1)
    yy = jnp.arange(H)[None, :, None]
    xx = jnp.arange(W)[None, None, :]
    inside = (
        (yy >= ys[:, None, None]) & (yy < ys[:, None, None] + hole)
        & (xx >= xs[:, None, None]) & (xx < xs[:, None, None] + hole)
    )
    active = (jnp.arange(max_holes) < n_holes)[:, None, None]
    mask = 1.0 - jnp.any(inside & active, axis=0).astype(img.dtype)
    return img * mask[..., None]


def pixel_dropout(img, key, max_prob: float = 0.05):
    """A.PixelDropout with drop_prob ~ U(0, max_prob) (the reference draws
    the prob per transform build, skinLesionDatasetsWithBert.py:83,96)."""
    kp, kb = jax.random.split(key)
    prob = jax.random.uniform(kp, (), minval=0.0, maxval=max_prob)
    keep = (jax.random.uniform(kb, img.shape[:2]) >= prob).astype(img.dtype)
    return img * keep[..., None]


def _augment_one(img, key, cfg):
    """Per-sample ops after batch-level rotation. img: (H, W, 3) f32 in [0,1].

    TPU note: rotation is handled at batch level (``_rotate_groups``) because
    a per-sample rotation angle makes the bilinear gather indices
    batch-varying — XLA then emits a scalar per-pixel gather that costs ~250ms
    for a 128×224² batch on v5e. With a per-*group* angle the indices are
    shared across the batch dim, the gather vectorizes, and the same op costs
    <1ms (measured). Everything here is index-free and stays per-sample.
    """
    # NOTE: indices 0-1/4-5 are reserved by the retired per-sample rotate/blur
    # draws so existing RNG streams stay stable; 12 subkeys are required —
    # out-of-bounds jnp indexing CLAMPS silently (keys[11] -> keys[9]).
    keys = jax.random.split(key, 12)

    # HSV hue arithmetic needs more than bf16's 8 mantissa bits (h/6 % 1 at
    # h≈6 quantizes to ~11° of hue). Upcast for the chain: these f32
    # intermediates live inside XLA elementwise fusions, so HBM traffic
    # stays at the caller's (bf16) width.
    in_dtype = img.dtype
    img = img.astype(jnp.float32)

    # Flips
    img = jnp.where(jax.random.uniform(keys[2]) < cfg["p_hflip"], img[:, ::-1], img)
    img = jnp.where(jax.random.uniform(keys[3]) < cfg["p_vflip"], img[::-1], img)

    # Dropout stage: default = CoarseDropout p=0.15; sentence recipe = OneOf
    # [PixelDropout(U(0,.05)), CoarseDropout(62×4×4)] p=0.1
    # (skinLesionDatasetsWithBert.py:94-103)
    if cfg.get("dropout_oneof"):
        kd1, kd2, kpick = jax.random.split(keys[6], 3)
        dropped_pix = pixel_dropout(img, kd1, cfg["pixel_drop_max"])
        # reference computes floor(0.00125*H*W) holes from the ACTUAL image
        # size (skinLesionDatasetsWithBert.py:94-103); H/W are static under
        # jit so this stays a Python int
        n_holes = max(1, int(cfg["holes_frac"] * img.shape[0] * img.shape[1]))
        dropped_coa = coarse_dropout(
            img, kd2, max_holes=n_holes, hole=cfg["hole_size"],
            min_holes=n_holes,
        )
        pick = jax.random.uniform(kpick) < 0.5
        dropped = jnp.where(pick, dropped_pix, dropped_coa)
    else:
        dropped = coarse_dropout(img, keys[6])
    img = jnp.where(jax.random.uniform(keys[7]) < cfg["p_dropout"], dropped, img)

    # HSV jitter (hue ±10/360ths of cv2's 0..180 scale => ±10/180 turns? cv2
    # hue is 0..179 so shift 10 == 10/180 of a full turn), p=0.25
    hl, sl, vl = cfg.get("hsv_limits", (10.0, 15.0, 10.0))
    do_hsv = jax.random.uniform(keys[8]) < cfg["p_hsv"]
    sh = jax.random.uniform(keys[9], (3,), minval=-1.0, maxval=1.0)
    hsv = rgb_to_hsv(jnp.clip(img, 0.0, 1.0))
    h = (hsv[..., 0] + sh[0] * (hl / 180.0) * do_hsv) % 1.0
    s = jnp.clip(hsv[..., 1] + sh[1] * (sl / 255.0) * do_hsv, 0.0, 1.0)
    v = jnp.clip(hsv[..., 2] + sh[2] * (vl / 255.0) * do_hsv, 0.0, 1.0)
    hsved = hsv_to_rgb(jnp.stack([h, s, v], axis=-1))

    if cfg.get("color_oneof"):
        # Sentence recipe: OneOf[MultiplicativeNoise(.9–1.1, scalar or
        # per-channel), HSV] at p_hsv total (skinLesionDatasetsWithBert.py:
        # 104-110); the same keys[8] gate covers the OneOf, keys[10]/[11]
        # (brightness in the default recipe) drive the noise branch.
        pick_noise = jax.random.uniform(keys[10]) < 0.5
        kmode, kmul = jax.random.split(keys[11])
        per_ch = jax.random.uniform(kmode) < 0.5
        mul = jax.random.uniform(kmul, (3,), minval=cfg["noise_lo"],
                                 maxval=cfg["noise_hi"])
        mul = jnp.where(per_ch, mul, mul[0])
        noised = jnp.clip(img * mul, 0.0, 1.0)
        img = jnp.where(do_hsv & pick_noise, noised,
                        jnp.where(do_hsv, hsved, img))
        return img.astype(in_dtype)

    img = hsved
    # Brightness/contrast ±0.2, p=0.25
    do_bc = jax.random.uniform(keys[10]) < cfg["p_bc"]
    ab = jax.random.uniform(keys[11], (2,), minval=-0.2, maxval=0.2)
    alpha = 1.0 + ab[0] * do_bc
    beta = ab[1] * do_bc
    img = jnp.clip(img * alpha + beta, 0.0, 1.0)
    return img.astype(in_dtype)


DEFAULT_CFG = dict(
    rotate_deg=45.0, p_rotate=0.5, p_hflip=0.5, p_vflip=0.2,
    blur_sigma=2.0, p_blur=0.25, p_dropout=0.15, p_hsv=0.25, p_bc=0.25,
)

# The sentence-dataset (LLM-generated text) recipe is heavier
# (skinLesionDatasetsWithBert.py:84-110): Affine scale x/y ~ U(1,2) p=.25,
# rotate ±120° p=.25, blur σ≤3 p=.25, OneOf[PixelDropout U(0,.05),
# CoarseDropout(⌊.00125·H·W⌋ 4×4 holes)] p=.1,
# OneOf[MultiplicativeNoise(.9–1.1), HSV(10,10,0)] p=.25, no brightness.
SENTENCE_CFG = dict(
    rotate_deg=120.0, p_rotate=0.25, p_hflip=0.5, p_vflip=0.2,
    blur_sigma=3.0, p_blur=0.25, p_dropout=0.1, p_hsv=0.25, p_bc=0.0,
    p_scale=0.25, scale_max=2.0,
    dropout_oneof=True, pixel_drop_max=0.05,
    holes_frac=0.00125, hole_size=4,  # ⌊holes_frac·H·W⌋ holes, from img size
    color_oneof=True, noise_lo=0.9, noise_hi=1.1,
    hsv_limits=(10.0, 10.0, 0.0),
)

# Distinct rotation angles sampled per batch; each sample draws one of them
# (plus the p_rotate gate). Angle diversity across steps is unchanged; within
# a step samples share one of n angles — the TPU-shaped tradeoff that keeps
# bilinear-gather indices batch-invariant (see _augment_one docstring).
N_ROT_GROUPS = 4


def _blur_groups(img, key, cfg):
    """Batch-level blur: G shared sigmas, per-sample gate.

    When B divides by G the batch is processed in G contiguous slices, each
    blurred with its own sigma — total conv work is ONE full-batch blur
    (the sampler already shuffles the batch, so slice membership is an
    independent uniform draw across steps). The legacy path (blur the whole
    batch per group + select) did G× the work; measured on v5e at 128×224²
    it cost 3.7 ms vs ~1 ms for the sliced version."""
    B = img.shape[0]
    G = N_ROT_GROUPS
    k_sig, k_grp, k_gate = jax.random.split(key, 3)
    sigmas = jax.random.uniform(k_sig, (G,), minval=0.0, maxval=cfg["blur_sigma"])
    gate = jax.random.uniform(k_gate, (B,)) < cfg["p_blur"]
    if B % G == 0:
        S = B // G
        outs = []
        for g in range(G):
            sl = img[g * S:(g + 1) * S]
            blurred = gaussian_blur_batch(sl, sigmas[g])
            mask = gate[g * S:(g + 1) * S][:, None, None, None]
            outs.append(jnp.where(mask, blurred, sl))
        return jnp.concatenate(outs, axis=0)
    grp = jax.random.randint(k_grp, (B,), 0, G)
    out = img
    for g in range(G):
        blurred = gaussian_blur_batch(img, sigmas[g])
        mask = (gate & (grp == g))[:, None, None, None]
        out = jnp.where(mask, blurred, out)
    return out


def _scale_groups(img, key, cfg):
    """Batch-level zoom (A.Affine scale x/y ~ U(1, scale_max), p_scale) using
    the slice-per-group strategy of ``_rotate_groups`` — per-group (sy, sx),
    per-sample gate. Sentence-dataset recipe only
    (skinLesionDatasetsWithBert.py:85)."""
    B = img.shape[0]
    G = N_ROT_GROUPS
    k_s, k_grp, k_gate = jax.random.split(key, 3)
    scales = jax.random.uniform(
        k_s, (G, 2), minval=1.0, maxval=cfg["scale_max"]
    )
    gate = jax.random.uniform(k_gate, (B,)) < cfg["p_scale"]
    if B % G == 0:
        S = B // G
        outs = []
        for g in range(G):
            sl = img[g * S:(g + 1) * S]
            zoomed = zoom_batch_rows(sl, scales[g, 0], scales[g, 1])
            mask = gate[g * S:(g + 1) * S][:, None, None, None]
            outs.append(jnp.where(mask, zoomed, sl))
        return jnp.concatenate(outs, axis=0)
    grp = jax.random.randint(k_grp, (B,), 0, G)
    out = img
    for g in range(G):
        zoomed = zoom_batch_rows(img, scales[g, 0], scales[g, 1])
        mask = (gate & (grp == g))[:, None, None, None]
        out = jnp.where(mask, zoomed, out)
    return out


def _rotate_groups(img, key, cfg):
    """Batch-level rotation: img (B, H, W, 3), per-sample gate + group angle.

    Same slicing strategy as ``_blur_groups``: with B divisible by G each
    contiguous slice rotates once with its own angle — the bilinear gather
    runs over 1× the batch instead of G×. Measured on v5e at 128×224²:
    15.4 ms (legacy rotate-all+select) → ~4 ms (sliced)."""
    B = img.shape[0]
    G = N_ROT_GROUPS
    k_ang, k_grp, k_gate = jax.random.split(key, 3)
    angles = jax.random.uniform(
        k_ang, (G,), minval=-cfg["rotate_deg"], maxval=cfg["rotate_deg"]
    ) * (jnp.pi / 180.0)
    do_rot = jax.random.uniform(k_gate, (B,)) < cfg["p_rotate"]
    if B % G == 0:
        S = B // G
        outs = []
        for g in range(G):
            sl = img[g * S:(g + 1) * S]
            rot_g = rotate_batch_rows(sl, angles[g], max_deg=cfg["rotate_deg"])
            mask = do_rot[g * S:(g + 1) * S][:, None, None, None]
            outs.append(jnp.where(mask, rot_g, sl))
        return jnp.concatenate(outs, axis=0)
    grp = jax.random.randint(k_grp, (B,), 0, G)
    out = img
    for g in range(G):
        rot_g = jax.vmap(lambda im: rotate(im, angles[g]))(img)
        mask = (do_rot & (grp == g))[:, None, None, None]
        out = jnp.where(mask, rot_g, out)
    return out


@partial(jax.jit,
         static_argnames=("train", "out_dtype", "fused_color", "recipe"))
def augment_batch(
    images_u8, key, train: bool = True, out_dtype=jnp.float32,
    fused_color: bool = None, recipe: str = "default",
):
    """uint8 (B, H, W, 3) → normalized (B, H, W, 3) in out_dtype.

    Train: full stochastic pipeline; eval: normalize only
    (skinLesionDatasets.py:113-119). ``recipe='sentence'`` applies the
    heavier sentence-dataset distribution (SENTENCE_CFG, reference
    skinLesionDatasetsWithBert.py:84-110).

    ``fused_color`` routes the color stage (dropout/HSV/brightness/normalize)
    through the Pallas kernel (ops/pallas/augment_kernel.py). Measured on v5e
    at 128×224²: the Pallas path is ~22 ms vs ~18 ms for XLA's own fusion of
    the same chain — XLA already fuses this well, so the kernel stays
    opt-in (it exists as the template for future per-sample-geometry fusion).
    """
    if fused_color is None or recipe == "sentence":
        # the Pallas color kernel implements the default recipe's color chain
        fused_color = False
    # compute the pipeline in the training dtype: bf16 pixels in [0,1] carry
    # the full uint8 source precision, and every augmentation pass (gathers,
    # blur convs, color chains) moves half the HBM bytes of the old f32 path
    compute_dtype = jnp.bfloat16 if out_dtype == jnp.bfloat16 else jnp.float32
    img = images_u8.astype(compute_dtype) / jnp.asarray(255.0, compute_dtype)
    if not train:
        img = (img - IMAGENET_MEAN.astype(compute_dtype)) / IMAGENET_STD.astype(
            compute_dtype
        )
        return img.astype(out_dtype)

    cfg = SENTENCE_CFG if recipe == "sentence" else DEFAULT_CFG
    k_rot, k_blur, k_flip, k_per = jax.random.split(key, 4)
    if cfg.get("p_scale", 0.0) > 0.0:
        k_rot, k_scale = jax.random.split(k_rot)
        img = _scale_groups(img, k_scale, cfg)
    img = _rotate_groups(img, k_rot, cfg)
    img = _blur_groups(img, k_blur, cfg)

    if fused_color:
        from skinjax.ops.pallas.augment_kernel import (
            draw_color_params,
            fused_color_stage,
        )

        B, H, W, _ = img.shape
        u = jax.random.uniform(k_flip, (B, 2))
        img = jnp.where(
            (u[:, 0] < cfg["p_hflip"])[:, None, None, None],
            img[:, :, ::-1], img,
        )
        img = jnp.where(
            (u[:, 1] < cfg["p_vflip"])[:, None, None, None],
            img[:, ::-1], img,
        )
        fparams, iparams = draw_color_params(k_per, B, H, W, cfg)
        return fused_color_stage(img, fparams, iparams, out_dtype=out_dtype)

    keys = jax.random.split(k_per, img.shape[0])
    img = jax.vmap(lambda im, k: _augment_one(im, k, cfg))(img, keys)
    img = (img - IMAGENET_MEAN.astype(img.dtype)) / IMAGENET_STD.astype(img.dtype)
    return img.astype(out_dtype)
