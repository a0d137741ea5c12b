"""Statistical checks that on-device augmentation matches the reference's
probabilities (skinLesionDatasets.py:75-112): rotate p=.5, hflip p=.5,
vflip p=.2, blur p=.25, dropout p=.15 — measured over many keys."""

import numpy as np
import jax
import jax.numpy as jnp

from skinjax.data.augment import augment_batch


def _structured_batch(B=64, H=32, W=32):
    """Asymmetric gradient image so flips/rotations are detectable."""
    img = np.zeros((B, H, W, 3), np.uint8)
    ramp = np.linspace(20, 235, W).astype(np.uint8)
    img[:, :, :, :] = ramp[None, None, :, None]
    img[:, : H // 4, :, :] = 250  # bright top band
    return img


def test_flip_and_rotate_rates():
    B = 64
    img = _structured_batch(B)
    hflips = vflips = geo = total = 0
    for seed in range(6):
        out = np.asarray(
            augment_batch(jnp.asarray(img), jax.random.key(seed), train=True)
        )
        # undo normalization for geometry checks
        out = out * np.array([0.229, 0.224, 0.225]) + np.array([0.485, 0.456, 0.406])
        for i in range(B):
            total += 1
            left = out[i, 12:, :4, 0].mean()
            right = out[i, 12:, -4:, 0].mean()
            top = out[i, :4, :, 0].mean()
            bottom = out[i, -4:, :, 0].mean()
            if right < left - 0.1:
                hflips += 1
            if bottom > top + 0.2:
                vflips += 1
            # top band moved at all (rotation or vflip)
            if top < 0.75:
                geo += 1
    # hflip p=.5 (ramp reversal), vflip p=.2 (bright band at bottom);
    # wide tolerances — these are smoke-level distribution checks
    assert 0.30 < hflips / total < 0.70, hflips / total
    assert 0.08 < vflips / total < 0.40, vflips / total


def test_eval_path_is_deterministic_identity():
    img = _structured_batch(8)
    a = augment_batch(jnp.asarray(img), jax.random.key(0), train=False)
    b = augment_batch(jnp.asarray(img), jax.random.key(99), train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_train_keys_decorrelate_batches():
    img = _structured_batch(16)
    a = np.asarray(augment_batch(jnp.asarray(img), jax.random.key(1), train=True))
    b = np.asarray(augment_batch(jnp.asarray(img), jax.random.key(2), train=True))
    assert np.abs(a - b).max() > 0.1  # different keys -> different augmentations


# ---------------------------------------------------------------------------
# sentence-dataset recipe (skinLesionDatasetsWithBert.py:84-110)
# ---------------------------------------------------------------------------

def test_zoom_batch_rows_identity_and_slope():
    from skinjax.data.augment import zoom_batch_rows

    B, H, W = 4, 32, 32
    ramp = np.broadcast_to(
        np.linspace(0.0, 1.0, W, dtype=np.float32)[None, None, :, None],
        (B, H, W, 3),
    )
    img = jnp.asarray(ramp)
    ident = np.asarray(zoom_batch_rows(img, jnp.float32(1.0), jnp.float32(1.0)))
    np.testing.assert_allclose(ident, ramp, atol=1e-6)
    # zoom 2x on a linear ramp halves the horizontal slope around the center
    zoomed = np.asarray(zoom_batch_rows(img, jnp.float32(2.0), jnp.float32(2.0)))
    slope = zoomed[0, 16, 20, 0] - zoomed[0, 16, 12, 0]
    ref_slope = ramp[0, 16, 20, 0] - ramp[0, 16, 12, 0]
    np.testing.assert_allclose(slope, ref_slope / 2.0, atol=1e-3)


def test_pixel_dropout_rate_bounded():
    from skinjax.data.augment import pixel_dropout

    img = jnp.ones((64, 64, 3), jnp.float32)
    rates = []
    for seed in range(30):
        out = np.asarray(pixel_dropout(img, jax.random.key(seed)))
        rates.append((out[..., 0] == 0).mean())
    # drop_prob ~ U(0, .05): mean rate ≈ .025, never above .05 (+tolerance)
    assert max(rates) < 0.08
    assert 0.005 < np.mean(rates) < 0.045, np.mean(rates)


def test_sentence_recipe_runs_and_scales():
    B = 64
    img = _structured_batch(B)
    out = np.asarray(
        augment_batch(jnp.asarray(img), jax.random.key(0), train=True,
                      recipe="sentence")
    )
    assert out.shape == img.shape
    assert np.isfinite(out).all()
    base = np.asarray(
        augment_batch(jnp.asarray(img), jax.random.key(0), train=True)
    )
    # different recipe ⇒ different stochastic output under the same key
    assert np.abs(out - base).max() > 0.05

    # scale p=.25: zoomed samples show a flatter edge ramp (zoom-in of the
    # horizontal gradient reduces the left-right contrast)
    zoomed = 0
    total = 0
    for seed in range(8):
        o = np.asarray(
            augment_batch(jnp.asarray(img), jax.random.key(seed), train=True,
                          recipe="sentence")
        )
        o = o * np.array([0.229, 0.224, 0.225]) + np.array(
            [0.485, 0.456, 0.406])
        for i in range(B):
            total += 1
            span = abs(o[i, 16, -3:, 0].mean() - o[i, 16, :3, 0].mean())
            if span < 0.55:  # un-zoomed ramp span ≈ .84 even after color jitter
                zoomed += 1
    # geometry (scale p=.25 and |rot|>45° also shrinks the span) — loose gate
    assert 0.10 < zoomed / total < 0.75, zoomed / total
