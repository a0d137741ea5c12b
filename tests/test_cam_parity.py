"""Grad-CAM++ numerical parity vs a torch hook-based oracle (the reference's
algorithm, gradcam_plusplus.py:169-237) on identical weights."""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from skinjax.models import MultimodalModel
from skinjax.models.torch_import import (
    filter_to_template,
    import_multimodal_checkpoint,
)
from skinjax.xai import grad_cam_pp
from tests.test_full_model_parity import TorchMM, _torch_state_dict


def _torch_gradcam_pp(tm, img, meta, class_idx):
    """Hook-based Grad-CAM++ exactly as the reference computes it."""
    acts = {}

    def hook(_m, _i, out):
        acts["A"] = out
        out.retain_grad()

    # capture the backbone's final feature map (pre-GAP)
    h = tm.image_encoder.layer4.register_forward_hook(hook)
    logits = tm(img, meta)
    h.remove()
    score = logits[torch.arange(len(class_idx)), class_idx].sum()
    A = acts["A"]
    g = torch.autograd.grad(score, A, create_graph=True)[0]
    g2, g3 = g * g, g * g * g
    denom = 2 * g2 + (A * g3).sum(dim=(2, 3), keepdim=True)
    alpha = g2 / torch.where(denom.abs() < 1e-12, torch.full_like(denom, 1e-12), denom)
    w = (alpha * F.relu(g)).sum(dim=(2, 3))  # (B, C)
    cam = F.relu(torch.einsum("bchw,bc->bhw", A, w))
    lo = cam.flatten(1).min(dim=1)[0][:, None, None]
    hi = cam.flatten(1).max(dim=1)[0][:, None, None]
    cam = (cam - lo) / torch.clamp(hi - lo, min=1e-8)
    cam = F.interpolate(cam[:, None], size=img.shape[-2:], mode="bilinear",
                        align_corners=False)[:, 0]
    return cam.detach().numpy()


def test_grad_cam_pp_matches_torch():
    torch.manual_seed(5)
    tm = TorchMM("concatenation").eval()
    sd = _torch_state_dict(tm)
    params, stats = import_multimodal_checkpoint(sd, common_dim=32,
                                                 backbone="resnet-18")
    model = MultimodalModel(
        num_classes=6, num_heads=4, cnn_model_name="resnet-18", common_dim=32,
        text_encoder_dim_output=32, vocab_size=11,
        attention_mechanism="concatenation",
    )
    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    meta = rng.normal(size=(2, 11)).astype(np.float32)
    cls = np.array([1, 4])

    variables = model.init(jax.random.key(0), jnp.asarray(img), jnp.asarray(meta))
    params = filter_to_template(params, variables["params"])
    stats = filter_to_template(stats, variables.get("batch_stats", {}))

    ours = grad_cam_pp(
        model, {"params": params, "batch_stats": stats},
        jnp.asarray(img), jnp.asarray(meta), jnp.asarray(cls),
    )
    timg = torch.tensor(img.transpose(0, 3, 1, 2), requires_grad=True)
    ref = _torch_gradcam_pp(tm, timg, torch.tensor(meta), torch.tensor(cls))

    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-3)


def test_grad_cam_on_pooled_transformer_backbone():
    """CAM on davit (the reference's best-BACC backbone): pooled-output
    backbones expose their final spatial map via capture/feature_delta, so
    Grad-CAM's gradient flows map -> pooled head -> logits."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from skinjax.models import MultimodalModel
    from skinjax.xai.cam import grad_cam, grad_cam_pp

    m = MultimodalModel(
        num_classes=4, num_heads=8, cnn_model_name="davit_tiny",
        text_model_name="one-hot-encoder", common_dim=64, vocab_size=7,
        attention_mechanism="concatenation")
    img = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 224, 224, 3)), jnp.float32)
    md = jnp.zeros((1, 7), jnp.float32)
    v = m.init(jax.random.key(0), img, md)
    cls = np.array([1])
    for fn in (grad_cam, grad_cam_pp):
        cam = np.asarray(fn(m, v, img, md, class_idx=cls))
        assert cam.shape[0] == 1 and cam.ndim == 3
        assert np.isfinite(cam).all()
        assert cam.max() > 0  # non-degenerate map
