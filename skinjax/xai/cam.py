"""Class activation maps: Grad-CAM, Grad-CAM++, Score-CAM — via jax.grad over
feature-returning forwards (no hooks).

Rebuilds interpretability/gradcam.py:97-160, gradcam_plusplus.py:158-237 and
ScoreCam.py:62-150. The model exposes a ``feature_delta`` injection point on
the backbone's spatial map, so

    g = ∂ score_c / ∂ A  =  jax.grad(score wrt feature_delta at 0)

gives the activation gradients in one vjp. Grad-CAM++ alpha weights use
elementwise powers of g (α = g² / (2g² + Σ_{hw} A·g³)), matching the
reference's formula. Everything is batched: CAMs for a whole batch compile to
one XLA program; Score-CAM's per-channel masked forwards are a single
vmapped forward over channels.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


def _forward_with_delta(model, variables, image, metadata, delta):
    logits, aux = model.apply(
        variables, image, metadata, capture=True, feature_delta=delta
    )
    return logits, aux


def _feature_map_shape(model, variables, image, metadata) -> Tuple[int, ...]:
    _, aux = model.apply(variables, image, metadata, capture=True)
    if "feature_map" not in aux:
        raise ValueError(
            "backbone returns no spatial feature map — every registered "
            "skinjax backbone supports capture/feature_delta; a custom "
            "encoder must expose those kwargs (see models/backbones/vit.py) "
            "for the CAM family to work"
        )
    return aux["feature_map"].shape


def _grads_and_activations(model, variables, image, metadata, class_idx):
    """Returns (A, g): feature maps and d(score)/d(A), both (B, h, w, C)."""
    shape = _feature_map_shape(model, variables, image, metadata)

    def score_fn(delta):
        logits, aux = _forward_with_delta(model, variables, image, metadata, delta)
        score = jnp.take_along_axis(logits, class_idx[:, None], axis=1).sum()
        return score.astype(jnp.float32), aux["feature_map"]

    g, A = jax.grad(score_fn, has_aux=True)(jnp.zeros(shape, jnp.float32))
    return A.astype(jnp.float32), g.astype(jnp.float32)


def _normalize_and_resize(cam, out_hw):
    cam = jnp.maximum(cam, 0.0)
    lo = cam.min(axis=(1, 2), keepdims=True)
    hi = cam.max(axis=(1, 2), keepdims=True)
    cam = (cam - lo) / jnp.maximum(hi - lo, 1e-8)
    return jax.image.resize(cam, (cam.shape[0], *out_hw), method="bilinear")


@partial(jax.jit, static_argnames=("model",))
def grad_cam(model, variables, image, metadata, class_idx):
    """Grad-CAM (gradcam.py:97-160): weights = GAP(g); CAM = ReLU(Σ w·A)."""
    A, g = _grads_and_activations(model, variables, image, metadata, class_idx)
    w = g.mean(axis=(1, 2))  # (B, C)
    cam = jnp.einsum("bhwc,bc->bhw", A, w)
    return _normalize_and_resize(cam, image.shape[1:3])


@partial(jax.jit, static_argnames=("model",))
def grad_cam_pp(model, variables, image, metadata, class_idx):
    """Grad-CAM++ (gradcam_plusplus.py:190-237):
    α = g² / (2g² + Σ_{hw} A·g³); w = Σ_{hw} α·ReLU(g); CAM = ReLU(Σ w·A)."""
    A, g = _grads_and_activations(model, variables, image, metadata, class_idx)
    g2, g3 = g * g, g * g * g
    denom = 2.0 * g2 + jnp.sum(A * g3, axis=(1, 2), keepdims=True)
    alpha = g2 / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    w = jnp.sum(alpha * jnp.maximum(g, 0.0), axis=(1, 2))  # (B, C)
    cam = jnp.einsum("bhwc,bc->bhw", A, w)
    return _normalize_and_resize(cam, image.shape[1:3])


def score_cam(
    model,
    variables,
    image,
    metadata,
    class_idx,
    top_k: Optional[int] = None,
    batch_channels: int = 32,
):
    """Score-CAM (ScoreCam.py:62-150): per-channel activation masks re-scored
    through the network; weights = softmax over channel scores.

    Default is the reference's EXACT full channel sweep. ``top_k`` opts into
    restricting to the channels with the largest activation energy — the tail
    channels carry ~0 softmax mass, so the approximation is tight (measured
    in tests/test_xai.py::test_score_cam_topk_error_bound: top-64/2048 CAM
    within ~1e-2 max abs of exact on ResNet-style maps) at a ~C/top_k cost
    reduction. Channel forwards are chunked and vmapped, so the sweep is
    ~k/batch_channels compiled forwards.
    """
    logits, aux = model.apply(variables, image, metadata, capture=True)
    A = aux["feature_map"].astype(jnp.float32)  # (B, h, w, C)
    B, h, w, C = A.shape
    out_hw = image.shape[1:3]

    energy = jnp.abs(A).sum(axis=(1, 2))  # (B, C)
    k = C if top_k is None else min(top_k, C)
    top_idx = jax.lax.top_k(energy, k)[1]  # (B, k)

    def masked_score(c_onehot):
        """c_onehot: (B, k) slice -> masked-forward scores (B,)."""
        sel = jnp.take_along_axis(
            A, c_onehot[:, None, None, None], axis=3
        )[..., 0]  # (B, h, w)
        m = jax.image.resize(sel, (B, *out_hw), method="bilinear")
        lo = m.min(axis=(1, 2), keepdims=True)
        hi = m.max(axis=(1, 2), keepdims=True)
        m = (m - lo) / jnp.maximum(hi - lo, 1e-8)
        masked = image * m[..., None]
        out = model.apply(variables, masked, metadata)
        return jnp.take_along_axis(
            jax.nn.softmax(out.astype(jnp.float32), axis=-1),
            class_idx[:, None], axis=1,
        )[:, 0]

    scores = []
    for start in range(0, k, batch_channels):
        chunk = top_idx[:, start : start + batch_channels]  # (B, cc)
        scores.append(jax.vmap(masked_score, in_axes=1, out_axes=1)(chunk))
    scores = jnp.concatenate(scores, axis=1)  # (B, k)

    wts = jax.nn.softmax(scores, axis=1)  # (B, k)
    A_top = jnp.take_along_axis(A, top_idx[:, None, None, :], axis=3)  # (B,h,w,k)
    cam = jnp.einsum("bhwk,bk->bhw", A_top, wts)
    return _normalize_and_resize(cam, out_hw)


def cam_methods_comparison(
    model,
    variables,
    image,
    metadata,
    class_idx,
    path: str,
    image_u8=None,
    score_cam_top_k: Optional[int] = None,
    alpha: float = 0.4,
):
    """Side-by-side Original / Score-CAM / Grad-CAM / Grad-CAM++ panel
    (cam_methods_comparison.py:20-45: 1×4 figure, jet overlays at α=0.4).

    ``image`` is the preprocessed batch the model consumes; ``image_u8`` the
    display image(s) (defaults to min-max-rescaled ``image``). One panel per
    sample: ``path`` gets a ``_i`` suffix for batches >1. Returns the list of
    written paths."""
    import numpy as np

    cams = {
        "ScoreCAM": score_cam(model, variables, image, metadata, class_idx,
                              top_k=score_cam_top_k),
        "GradCAM": grad_cam(model, variables, image, metadata, class_idx),
        "GradCAM++": grad_cam_pp(model, variables, image, metadata, class_idx),
    }
    if image_u8 is None:
        img = np.asarray(image, np.float32)
        lo, hi = img.min(), img.max()
        disp = (img - lo) / max(hi - lo, 1e-8)
    else:
        disp = np.asarray(image_u8).astype(np.float32) / 255.0

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    B = image.shape[0]
    written = []
    for i in range(B):
        fig, axes = plt.subplots(1, 4, figsize=(18, 6))
        axes[0].imshow(disp[i])
        axes[0].set_title("Original Image")
        for ax, (name, cam) in zip(axes[1:], cams.items()):
            ax.imshow(disp[i])
            ax.imshow(np.asarray(cam[i]), cmap="jet", alpha=alpha)
            ax.set_title(f"Image with {name}")
        for ax in axes:
            ax.axis("off")
        fig.tight_layout()
        out = path if B == 1 else path.replace(".png", f"_{i}.png")
        fig.savefig(out)
        plt.close(fig)
        written.append(out)
    return written


def overlay_heatmap(image_u8, cam, alpha: float = 0.4):
    """RGB overlay for demo/serving (models/cam.py:52-62 analogue)."""
    import numpy as np

    cam = np.asarray(cam)
    img = np.asarray(image_u8).astype(np.float32) / 255.0
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.cm as cm

    heat = cm.jet(cam)[..., :3]
    out = (1 - alpha) * img + alpha * heat
    return (np.clip(out, 0, 1) * 255).astype(np.uint8)
