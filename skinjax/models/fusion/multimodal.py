"""The canonical multimodal model: image tower + metadata tower + fusion zoo.

TPU-first re-design of the reference's production model
(multimodalIntraInterModal.py:13-416). Same config strings, same math per
mechanism, but:

  * fusion dispatch is resolved at **trace time** (the mechanism is a static
    module attribute), so XLA compiles exactly one branch — the reference
    computes the full self+cross attention chain even for branches that
    ignore it (multimodalIntraInterModal.py:190-197); we compute only what
    the selected mechanism consumes;
  * all attention runs at seq-1 where softmax degenerates — the MHA op
    collapses it to fused matmuls (see skinjax/ops/attention.py);
  * layout is batch-first, compute dtype bf16, params fp32;
  * intermediate features (pre-GAP map, projections, pooled attn outputs)
    can be returned explicitly (``capture=True``) — this replaces torch
    forward hooks for the Grad-CAM family (gradcam_plusplus.py:169-188).

Mechanism strings (multimodalIntraInterModal.py:205-416):
  no-metadata, no-metadata-without-mlp, concatenation, crossattention,
  weighted, gfcam, cross-weights-after-crossattention, metablock,
  rg-att2fusefeatures, rg-att, att-intramodal, att-intramodal+residual,
  cross-attention-only, residual+cross-attention-metadados,
  att-intramodal+residual+cross-attention-metadados (RG-ATT),
  att-intramodal+residual+cross-attention-metadados+rg-att2fusefeatures,
  att-intramodal+residual+cross-attention-metadados+metablock,
  att-intramodal+residual+cross-attention-metadados+att-intramodal+residual
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from skinjax.models.backbones import create_backbone
from skinjax.models.fusion.blocks import (
    GatedAlteredResidualBlock,
    MetaBlock,
    MLPHead,
)
from skinjax.models.text import OneHotMLP, StaticEmbeddingTower
from skinjax.ops.attention import MultiHeadAttention

MECHANISMS = (
    "no-metadata",
    "no-metadata-without-mlp",
    "concatenation",
    "crossattention",
    "weighted",
    "gfcam",
    "cross-weights-after-crossattention",
    "metablock",
    "rg-att2fusefeatures",
    "rg-att",
    "att-intramodal",
    "att-intramodal+residual",
    "cross-attention-only",
    "residual+cross-attention-metadados",
    "att-intramodal+residual+cross-attention-metadados",
    "att-intramodal+residual+cross-attention-metadados+rg-att2fusefeatures",
    "att-intramodal+residual+cross-attention-metadados+metablock",
    "att-intramodal+residual+cross-attention-metadados+att-intramodal+residual",
)

_RGATT = "att-intramodal+residual+cross-attention-metadados"


class MultimodalModel(nn.Module):
    """Image + clinical-metadata classifier with a configurable fusion stage."""

    num_classes: int
    num_heads: int = 8
    cnn_model_name: str = "resnet-50"
    text_model_name: str = "one-hot-encoder"
    common_dim: int = 512
    text_encoder_dim_output: int = 512
    vocab_size: int = 91
    attention_mechanism: str = "concatenation"
    n: int = 2  # width multiplier of the fusion MLP input (2 = concat pair)
    dropout_rate: float = 0.5
    dtype: Optional[jnp.dtype] = None
    # Custom text tower (overrides text_model_name): any module mapping the
    # metadata input to (B, text_encoder_dim_output) — HFSentenceTower for
    # BERT/GPT-2 sentence datasets, TabTransformer for tabular encoding.
    text_module: Optional[Any] = None
    # "features": metadata is (B, F) floats; "tokens": dict with
    # input_ids/attention_mask; "tabular": dict with categorical/numerical.
    text_input_mode: str = "features"

    def setup(self):
        if self.attention_mechanism not in MECHANISMS:
            raise ValueError(
                f"Attention mechanism '{self.attention_mechanism}' not implemented."
                f" Known: {MECHANISMS}"
            )
        self.image_encoder, self.cnn_dim_output = create_backbone(
            self.cnn_model_name, common_dim=self.common_dim, dtype=self.dtype
        )
        self.image_projector = nn.Dense(
            self.common_dim, dtype=self.dtype, name="image_projector"
        )

        if self.text_module is not None:
            self.text_tower = self.text_module
        elif self.text_model_name == "one-hot-encoder":
            self.text_tower = OneHotMLP(
                out_dim=self.text_encoder_dim_output, dtype=self.dtype
            )
        elif self.text_model_name == "static-embedding":
            self.text_tower = StaticEmbeddingTower(
                out_dim=self.text_encoder_dim_output, dtype=self.dtype
            )
        else:
            raise ValueError(
                f"Text tower '{self.text_model_name}' not wired into "
                "MultimodalModel; use one-hot-encoder / static-embedding, or "
                "pass text_module= (HFSentenceTower / TabTransformer)."
            )
        self.text_projector = nn.Dense(
            self.common_dim, dtype=self.dtype, name="text_projector"
        )

        mha = lambda name: MultiHeadAttention(
            self.common_dim, self.num_heads, dtype=self.dtype, name=name
        )
        self.image_self_attention = mha("image_self_attention")
        self.text_self_attention = mha("text_self_attention")
        self.image_cross_attention = mha("image_cross_attention")
        self.text_cross_attention = mha("text_cross_attention")

        self.img_gate = nn.Dense(self.common_dim, dtype=self.dtype, name="img_gate")
        self.txt_gate = nn.Dense(self.common_dim, dtype=self.dtype, name="txt_gate")

        # MetaBlock dims follow the reference quirk
        # (multimodalIntraInterModal.py:112-115): V/U dims depend on whether
        # the metablock runs on raw tower features or the common space.
        mb_common = self.attention_mechanism == _RGATT + "+metablock"
        self.meta_block = MetaBlock(
            v_dim=self.common_dim if mb_common else self.cnn_dim_output,
            dtype=self.dtype,
        )

        self.image_residual = GatedAlteredResidualBlock(
            self.common_dim, dtype=self.dtype, name="image_residual"
        )
        self.text_residual = GatedAlteredResidualBlock(
            self.common_dim, dtype=self.dtype, name="text_residual"
        )

        self.fc_fusion = MLPHead(
            hidden=self.common_dim,
            num_classes=self.num_classes,
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
            name="fc_fusion",
        )
        self.fc_visual_only = nn.Dense(
            self.num_classes, dtype=self.dtype, name="fc_visual_only"
        )
        self.fc_fusion_proj_feat2output = nn.Dense(
            self.num_classes, dtype=self.dtype, name="fc_fusion_proj_feat2output"
        )
        self.fc_after_metablock = MLPHead(
            hidden=self.common_dim,
            num_classes=self.num_classes,
            dropout_rate=0.3,
            dtype=self.dtype,
            name="fc_after_metablock",
        )

    def __call__(
        self,
        image: jax.Array,
        metadata: jax.Array,
        *,
        train: bool = False,
        capture: bool = False,
        feature_delta: Optional[jax.Array] = None,
    ):
        """image: (B, H, W, 3) NHWC; metadata: (B, vocab_size) featurized.

        Returns logits (B, num_classes), or (logits, aux-dict) if capture.

        ``feature_delta`` is a structural-zero perturbation added to the
        backbone's spatial feature map: ``jax.grad`` of a class score w.r.t.
        it yields d(score)/d(feature_map) — the JAX-native replacement for
        the reference's forward hooks (gradcam_plusplus.py:169-188).
        """
        det = not train
        aux: Dict[str, Any] = {}
        mech = self.attention_mechanism

        # ---- Image tower → (B, D_img) -------------------------------------
        img_feat = None
        if capture or feature_delta is not None:
            # pooled-output backbones (davit/caformer/nextvit) expose their
            # final spatial map through capture/feature_delta kwargs so the
            # CAM gradient flows map → pooled head → logits. Capability is
            # detected by SIGNATURE, not try/except — a TypeError raised
            # inside the encoder must propagate, not silently drop the delta
            # (which would make jax.grad w.r.t. it all-zeros).
            import inspect

            params = inspect.signature(
                type(self.image_encoder).__call__
            ).parameters
            if "capture" in params and "feature_delta" in params:
                img_feat, aux["feature_map"] = self.image_encoder(
                    image, train=train, capture=True,
                    feature_delta=feature_delta,
                )
        if img_feat is None:
            img_feat = self.image_encoder(image, train=train)
        if img_feat.ndim == 4:  # NHWC spatial map → GAP
            if feature_delta is not None:
                img_feat = img_feat + feature_delta
            aux["feature_map"] = img_feat
            img_feat = img_feat.mean(axis=(1, 2))
        elif img_feat.ndim == 3:  # token sequence → CLS
            aux["tokens"] = img_feat
            img_feat = img_feat[:, 0]
        aux["img_feat"] = img_feat

        if mech == "no-metadata-without-mlp":
            logits = self.fc_visual_only(img_feat)
            return (logits, aux) if capture else logits

        proj_img = self.image_projector(img_feat)
        aux["proj_img"] = proj_img

        if mech == "no-metadata":
            logits = self.fc_fusion(proj_img, deterministic=det)
            return (logits, aux) if capture else logits

        # ---- Metadata tower → (B, D_txt) ----------------------------------
        if self.text_input_mode == "tokens":
            txt_feat = self.text_tower(
                metadata["input_ids"],
                metadata.get("attention_mask"),
                deterministic=det,
            )
        elif self.text_input_mode == "tabular":
            txt_feat = self.text_tower(
                metadata["categorical"], metadata.get("numerical"),
                deterministic=det,
            )
        else:
            txt_feat = self.text_tower(metadata, deterministic=det)
        aux["txt_feat"] = txt_feat

        if mech == "metablock":
            fused = self.meta_block(img_feat, txt_feat)
            logits = self.fc_after_metablock(fused, deterministic=det)
            return (logits, aux) if capture else logits

        proj_txt = self.text_projector(txt_feat)
        aux["proj_txt"] = proj_txt

        if mech == "concatenation":
            fused = jnp.concatenate([proj_img, proj_txt], axis=-1)
            logits = self.fc_fusion(fused, deterministic=det)
            return (logits, aux) if capture else logits

        if mech == "weighted":
            a_img = jax.nn.sigmoid(self.img_gate(proj_img))
            a_txt = jax.nn.sigmoid(self.txt_gate(proj_txt))
            fused = jnp.concatenate([a_img * proj_img, a_txt * proj_txt], axis=-1)
            logits = self.fc_fusion(fused, deterministic=det)
            return (logits, aux) if capture else logits

        # ---- Attention stage (seq-1; MHA collapses to fused matmuls) ------
        img_seq = proj_img[:, None, :]
        txt_seq = proj_txt[:, None, :]

        if mech == "cross-attention-only":
            img_x = self.image_cross_attention(img_seq, txt_seq, txt_seq)[:, 0]
            txt_x = self.text_cross_attention(txt_seq, img_seq, img_seq)[:, 0]
            fused = jnp.concatenate([img_x, txt_x], axis=-1)
            logits = self.fc_fusion(fused, deterministic=det)
            return (logits, aux) if capture else logits

        if mech == "rg-att2fusefeatures":
            fused = self.image_residual(
                txt_seq, img_seq, img_seq, deterministic=det
            )[:, 0]
            logits = self.fc_fusion_proj_feat2output(fused)
            return (logits, aux) if capture else logits

        if mech == "rg-att":
            img_r = self.image_residual(img_seq, txt_seq, txt_seq, deterministic=det)
            txt_r = self.text_residual(txt_seq, img_seq, img_seq, deterministic=det)
            fused = jnp.concatenate([img_r[:, 0], txt_r[:, 0]], axis=-1)
            logits = self.fc_fusion(fused, deterministic=det)
            return (logits, aux) if capture else logits

        if mech == "residual+cross-attention-metadados":
            img_r = self.image_residual(img_seq, img_seq, img_seq, deterministic=det)
            txt_r = self.text_residual(txt_seq, txt_seq, txt_seq, deterministic=det)
            img_x = self.image_cross_attention(img_r, txt_r, txt_r)[:, 0]
            txt_x = self.text_cross_attention(txt_r, img_r, img_r)[:, 0]
            fused = jnp.concatenate([img_x, txt_x], axis=-1)
            logits = self.fc_fusion(fused, deterministic=det)
            return (logits, aux) if capture else logits

        # Mechanisms below all start with intra-modal self-attention.
        img_att = self.image_self_attention(img_seq, img_seq, img_seq)
        txt_att = self.text_self_attention(txt_seq, txt_seq, txt_seq)

        if mech == "att-intramodal":
            fused = jnp.concatenate([img_att[:, 0], txt_att[:, 0]], axis=-1)
            logits = self.fc_fusion(fused, deterministic=det)
            return (logits, aux) if capture else logits

        if mech == "att-intramodal+residual":
            img_r = self.image_residual(img_seq, img_att, img_att, deterministic=det)
            txt_r = self.text_residual(txt_seq, txt_att, txt_att, deterministic=det)
            fused = jnp.concatenate([img_r[:, 0], txt_r[:, 0]], axis=-1)
            logits = self.fc_fusion(fused, deterministic=det)
            return (logits, aux) if capture else logits

        if mech in ("crossattention", "gfcam", "cross-weights-after-crossattention"):
            img_x = self.image_cross_attention(img_att, txt_att, txt_att)[:, 0]
            txt_x = self.text_cross_attention(txt_att, img_att, img_att)[:, 0]
            aux["img_pooled"], aux["txt_pooled"] = img_x, txt_x
            if mech == "crossattention":
                fused = jnp.concatenate([img_x, txt_x], axis=-1)
            else:
                a_img = jax.nn.sigmoid(self.img_gate(img_x))
                a_txt = jax.nn.sigmoid(self.txt_gate(txt_x))
                if mech == "gfcam":
                    fused = jnp.concatenate([a_img * img_x, a_txt * txt_x], axis=-1)
                else:  # swapped gates (multimodalIntraInterModal.py:231-235)
                    fused = jnp.concatenate([a_txt * img_x, a_img * txt_x], axis=-1)
            logits = self.fc_fusion(fused, deterministic=det)
            return (logits, aux) if capture else logits

        # RG-ATT family: self-att → gated residual → cross-attention.
        img_r = self.image_residual(img_seq, img_att, img_att, deterministic=det)
        txt_r = self.text_residual(txt_seq, txt_att, txt_att, deterministic=det)
        img_x2 = self.image_cross_attention(img_r, txt_r, txt_r)
        txt_x2 = self.text_cross_attention(txt_r, img_r, img_r)

        if mech == _RGATT:
            fused = jnp.concatenate([img_x2[:, 0], txt_x2[:, 0]], axis=-1)
            logits = self.fc_fusion(fused, deterministic=det)
            return (logits, aux) if capture else logits

        if mech == _RGATT + "+rg-att2fusefeatures":
            fused = self.image_residual(
                txt_x2, img_x2, img_x2, deterministic=det
            )[:, 0]
            logits = self.fc_fusion_proj_feat2output(fused)
            return (logits, aux) if capture else logits

        if mech == _RGATT + "+metablock":
            fused = self.meta_block(img_x2[:, 0], txt_x2[:, 0])
            logits = self.fc_fusion_proj_feat2output(fused)
            return (logits, aux) if capture else logits

        if mech == _RGATT + "+att-intramodal+residual":
            img_a2 = self.image_self_attention(img_x2, img_x2, img_x2)
            txt_a2 = self.text_self_attention(txt_x2, txt_x2, txt_x2)
            img_r2 = self.image_residual(img_x2, img_a2, img_a2, deterministic=det)
            txt_r2 = self.text_residual(txt_x2, txt_a2, txt_a2, deterministic=det)
            fused = jnp.concatenate([img_r2[:, 0], txt_r2[:, 0]], axis=-1)
            logits = self.fc_fusion(fused, deterministic=det)
            return (logits, aux) if capture else logits

        raise AssertionError(f"unreachable mechanism {mech}")  # pragma: no cover
