"""CAM capture/feature_delta contract on the token-pooled backbones.

The reference hooks the last block of every backbone for Grad-CAM
(gradcam_plusplus.py:169-188); skinjax replaces hooks with explicit
``capture``/``feature_delta`` kwargs that MultimodalModel dispatches by
signature (fusion/multimodal.py:198-214).  davit/caformer/nextvit were
covered in round 2; this pins the round-3 additions: ViT (cls + mean
pool), BEiT, MViTv2, CoaT-lite.

Contract per backbone:
  1. capture=True returns (pooled, fmap) with pooled identical to the
     default forward (the capture path must not perturb inference);
  2. fmap is a 4-D (B, h, w, D) spatial grid;
  3. jax.grad w.r.t. a structural-zero feature_delta is finite and
     non-zero (the delta actually sits on the gradient path to the
     pooled read-out — the failure mode of a mis-placed injection is an
     all-zeros CAM).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skinjax.models.backbones import beit as beit_mod
from skinjax.models.backbones import coat as coat_mod
from skinjax.models.backbones import mvit as mvit_mod
from skinjax.models.backbones import vit as vit_mod

CASES = [
    ("vit-cls", lambda: vit_mod.ViT(dim=32, depth=2, num_heads=2, patch=16),
     (1, 32, 32, 3)),
    ("vit-mean", lambda: vit_mod.ViT(dim=32, depth=2, num_heads=2, patch=16,
                                     pool="mean"), (1, 32, 32, 3)),
    ("beit", lambda: beit_mod.Beit(dim=32, depth=2, num_heads=2, patch=16),
     (1, 32, 32, 3)),
    ("mvitv2", lambda: mvit_mod.MViTv2(dims=(16, 32, 48, 64),
                                       depths=(1, 1, 1, 1),
                                       heads=(1, 2, 2, 4)), (1, 64, 64, 3)),
    ("coat", lambda: coat_mod.CoaTLite(dims=(16, 32, 48, 64),
                                       depths=(1, 1, 1, 1)), (1, 64, 64, 3)),
]


@pytest.mark.parametrize("name,ctor,shape", CASES, ids=[c[0] for c in CASES])
def test_capture_contract(name, ctor, shape):
    mod = ctor()
    x = jnp.asarray(np.random.default_rng(0).normal(size=shape), jnp.float32)
    v = mod.init(jax.random.key(0), x)

    base = mod.apply(v, x)
    pooled, fmap = mod.apply(v, x, capture=True)
    assert fmap.ndim == 4 and fmap.shape[0] == shape[0]
    assert fmap.shape[1] > 1 and fmap.shape[2] > 1  # a real spatial grid
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(base),
                               rtol=2e-5, atol=2e-5)

    g = jax.grad(
        lambda d: mod.apply(v, x, feature_delta=d).sum()
    )(jnp.zeros_like(fmap))
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0


def test_vit_scan_layout_rejects_capture():
    """nn.scan stacks block params, so there is no 'final block' boundary
    to inject at — capture must fail loudly, not return a dead delta."""
    mod = vit_mod.ViT(dim=32, depth=2, num_heads=2, patch=16,
                      scan_blocks=True)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    with pytest.raises(ValueError, match="loop block layout"):
        mod.init(jax.random.key(0), x, capture=True)


def test_grad_cam_through_multimodal_vit():
    """End-to-end: MultimodalModel's signature-based capture dispatch picks
    up the ViT kwargs and grad_cam produces a non-degenerate map."""
    from skinjax.models import MultimodalModel
    from skinjax.xai.cam import grad_cam

    m = MultimodalModel(
        num_classes=4, num_heads=8, cnn_model_name="vit_tiny_patch16_224",
        text_model_name="one-hot-encoder", common_dim=64, vocab_size=7,
        attention_mechanism="concatenation")
    img = jnp.asarray(
        np.random.default_rng(1).normal(size=(1, 224, 224, 3)), jnp.float32)
    md = jnp.zeros((1, 7), jnp.float32)
    v = m.init(jax.random.key(0), img, md)
    cam = np.asarray(grad_cam(m, v, img, md, class_idx=np.array([2])))
    assert cam.shape[0] == 1 and cam.ndim == 3
    assert np.isfinite(cam).all() and cam.max() > 0
