"""Inference engine: jitted end-to-end predict with a Pallas-fused fusion
stage for the serving path.

Rebuilds the reference's serving stack core (api.py:103-143,
src/services/XAI/models/inference.py:29-64): load a checkpointed model +
persisted featurizer, preprocess an image + raw metadata CSV line into the
training feature space, run one compiled forward, return class + probs.

The fused path replaces the fusion stage with the skinjax.ops.pallas kernels
(one VMEM-resident program per block instead of ~10 XLA ops each) for the
mechanisms that dominate the zoo; other mechanisms fall back to the standard
model.apply — both paths are inside the same jit so the choice is free at
trace time.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from skinjax.data.augment import IMAGENET_MEAN, IMAGENET_STD
from skinjax.data.featurizer import MetadataFeaturizer
from skinjax.models.fusion.multimodal import _RGATT, MultimodalModel
from skinjax.ops.pallas import fusion_kernels as fk

FUSED_MECHANISMS = (
    "concatenation", "crossattention", "weighted", "gfcam",
    "cross-weights-after-crossattention", "metablock", "rg-att",
    "cross-attention-only", _RGATT, _RGATT + "+metablock",
)


def preprocess_image(image_u8: np.ndarray, size=(224, 224)) -> np.ndarray:
    """uint8 HWC (any size) -> normalized float32 (1, H, W, 3)."""
    import cv2

    if image_u8.shape[:2] != tuple(size):
        image_u8 = cv2.resize(image_u8, size[::-1], interpolation=cv2.INTER_LINEAR)
    img = image_u8.astype(np.float32) / 255.0
    img = (img - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    return img[None]


def preprocess_image_u8(image_u8: np.ndarray, size=(224, 224)) -> np.ndarray:
    """uint8 HWC (any size) -> resized uint8 (1, H, W, 3). Normalization
    happens on-device inside the jitted forward — the host→device transfer
    (and, over a tunneled TPU, the network hop) ships 4× fewer bytes than
    the float pipeline. The training path already works this way
    (train/steps.py ships uint8 into the fused augment+forward)."""
    import cv2

    if image_u8.shape[:2] != tuple(size):
        image_u8 = cv2.resize(image_u8, size[::-1], interpolation=cv2.INTER_LINEAR)
    return np.ascontiguousarray(image_u8)[None]


class InferenceEngine:
    def __init__(
        self,
        model: MultimodalModel,
        variables: Dict,
        featurizer: Optional[MetadataFeaturizer] = None,
        class_names: Optional[Sequence[str]] = None,
        use_fused: bool = True,
    ):
        self.model = model
        self.variables = variables
        self.featurizer = featurizer
        self.class_names = list(
            class_names
            or (featurizer.label_encoder.classes if featurizer else [])
        )
        mech = model.attention_mechanism
        self.fused = use_fused and mech in FUSED_MECHANISMS
        fwd = self._fused_forward if self.fused else self._plain_forward
        self._predict = jax.jit(fwd)

        def fwd_u8(image_u8, metadata):
            img = image_u8.astype(jnp.float32) / 255.0
            img = (img - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
            dt = getattr(model, "dtype", None)
            return fwd(img.astype(dt) if dt is not None else img, metadata)

        self._predict_u8 = jax.jit(fwd_u8)

    # -- forwards -----------------------------------------------------------
    def _plain_forward(self, image, metadata):
        logits = self.model.apply(self.variables, image, metadata)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    def _towers(self, image, metadata, project: bool = True):
        bound = self.model.bind(self.variables)
        img_feat = bound.image_encoder(image)
        if img_feat.ndim == 4:
            img_feat = img_feat.mean(axis=(1, 2))
        elif img_feat.ndim == 3:
            img_feat = img_feat[:, 0]
        txt_feat = bound.text_tower(metadata)
        if not project:  # metablock fuses raw tower features; the projector
            return img_feat, txt_feat, None, None  # params don't exist there
        proj_img = bound.image_projector(img_feat)
        proj_txt = bound.text_projector(txt_feat)
        return img_feat, txt_feat, proj_img, proj_txt

    def _fused_forward(self, image, metadata):
        p = self.variables["params"]
        mech = self.model.attention_mechanism
        img_feat, txt_feat, proj_img, proj_txt = self._towers(
            image, metadata, project=mech != "metablock"
        )

        def gate(x, name):
            return jax.nn.sigmoid(x @ p[name]["kernel"] + p[name]["bias"])

        self_att = lambda: (
            fk.seq1_attention(proj_img, *fk.mha_args(p["image_self_attention"])),
            fk.seq1_attention(proj_txt, *fk.mha_args(p["text_self_attention"])),
        )

        if mech == "metablock":
            fused = fk.metablock_film(img_feat, txt_feat,
                                      *fk.metablock_args(p["meta_block"]))
            logits = fk.mlp_head(fused, *fk.mlp_head_args(p["fc_after_metablock"]))
            return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

        if mech == "concatenation":
            fused = jnp.concatenate([proj_img, proj_txt], axis=-1)
        elif mech == "weighted":
            fused = jnp.concatenate(
                [gate(proj_img, "img_gate") * proj_img,
                 gate(proj_txt, "txt_gate") * proj_txt], axis=-1,
            )
        elif mech == "cross-attention-only":
            img_x = fk.seq1_attention(proj_txt, *fk.mha_args(p["image_cross_attention"]))
            txt_x = fk.seq1_attention(proj_img, *fk.mha_args(p["text_cross_attention"]))
            fused = jnp.concatenate([img_x, txt_x], axis=-1)
        elif mech == "rg-att":
            img_r = fk.gated_residual_seq1(
                proj_img, proj_txt, *fk.grb_args(p["image_residual"]))
            txt_r = fk.gated_residual_seq1(
                proj_txt, proj_img, *fk.grb_args(p["text_residual"]))
            fused = jnp.concatenate([img_r, txt_r], axis=-1)
        elif mech in ("crossattention", "gfcam", "cross-weights-after-crossattention"):
            img_att, txt_att = self_att()
            img_x = fk.seq1_attention(txt_att, *fk.mha_args(p["image_cross_attention"]))
            txt_x = fk.seq1_attention(img_att, *fk.mha_args(p["text_cross_attention"]))
            if mech == "crossattention":
                fused = jnp.concatenate([img_x, txt_x], axis=-1)
            else:
                a_i = gate(img_x, "img_gate")
                a_t = gate(txt_x, "txt_gate")
                if mech == "gfcam":
                    fused = jnp.concatenate([a_i * img_x, a_t * txt_x], axis=-1)
                else:  # swapped gates
                    fused = jnp.concatenate([a_t * img_x, a_i * txt_x], axis=-1)
        else:  # RG-ATT family
            img_att, txt_att = self_att()
            img_r = fk.gated_residual_seq1(
                proj_img, img_att, *fk.grb_args(p["image_residual"]))
            txt_r = fk.gated_residual_seq1(
                proj_txt, txt_att, *fk.grb_args(p["text_residual"]))
            img_x = fk.seq1_attention(txt_r, *fk.mha_args(p["image_cross_attention"]))
            txt_x = fk.seq1_attention(img_r, *fk.mha_args(p["text_cross_attention"]))
            if mech.endswith("+metablock"):
                fused = fk.metablock_film(img_x, txt_x,
                                          *fk.metablock_args(p["meta_block"]))
                logits = (
                    fused @ p["fc_fusion_proj_feat2output"]["kernel"]
                    + p["fc_fusion_proj_feat2output"]["bias"]
                )
                return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            fused = jnp.concatenate([img_x, txt_x], axis=-1)

        logits = fk.mlp_head(fused, *fk.mlp_head_args(p["fc_fusion"]))
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    # -- public API ---------------------------------------------------------
    def predict_probs(self, image: np.ndarray, metadata: np.ndarray) -> np.ndarray:
        """image: normalized float (B, H, W, 3) OR uint8 (B, H, W, 3) — a
        uint8 batch normalizes on-device (4× smaller transfer); metadata:
        featurized (B, F)."""
        image = np.asarray(image)
        fn = self._predict_u8 if image.dtype == np.uint8 else self._predict
        return np.asarray(fn(jnp.asarray(image), jnp.asarray(metadata)))

    def predict(self, image_u8: np.ndarray, metadata_csv_line: str) -> Dict:
        """Raw-image + raw-CSV-line entry (api.py:165-203 response schema)."""
        if self.featurizer is None:
            raise ValueError("predict() on raw inputs requires a featurizer")
        image = preprocess_image_u8(image_u8)
        feats = self._featurize_csv_line(metadata_csv_line)
        probs = self.predict_probs(image, feats)[0]
        idx = int(probs.argmax())
        return {
            "predicted_label_index": idx,
            "predicted_classname": (
                self.class_names[idx] if self.class_names else str(idx)
            ),
            "probabilities": probs.tolist(),
        }

    def _featurize_csv_line(self, line: str) -> np.ndarray:
        fz = self.featurizer
        cols = fz.categorical_cols + fz.numerical_cols
        vals = [v.strip() for v in line.split(",")]
        if len(vals) != len(cols):
            raise ValueError(
                f"expected {len(cols)} metadata values ({cols}), got {len(vals)}"
            )
        table = {}
        for c, v in zip(cols, vals):
            if c in fz.numerical_cols:
                try:
                    table[c] = np.asarray([float(v) if v not in ("", "EMPTY") else -1.0])
                except ValueError:
                    table[c] = np.asarray([-1.0])
            else:
                table[c] = np.asarray([v if v else "EMPTY"], dtype=object)
        return fz.transform(table)

    def measure_latency(
        self, n: int = 50, batch: int = 1, image_size=(224, 224)
    ) -> Dict[str, float]:
        """p50/p95 end-to-end device latency (north-star metric #2)."""
        rng = np.random.default_rng(0)
        img = jnp.asarray(
            rng.normal(size=(batch, *image_size, 3)).astype(np.float32)
        )
        vocab = getattr(self.model, "vocab_size", None) or (
            self.featurizer.dim if self.featurizer else 91
        )
        meta = jnp.asarray(rng.normal(size=(batch, vocab)).astype(np.float32))
        self._predict(img, meta).block_until_ready()
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            self._predict(img, meta).block_until_ready()
            times.append(time.perf_counter() - t0)
        times = np.sort(times)
        return {
            "p50_ms": float(np.percentile(times, 50) * 1e3),
            "p95_ms": float(np.percentile(times, 95) * 1e3),
            "mean_ms": float(times.mean() * 1e3),
        }
