"""DynamicCNN — the NAS search-space model (dynamicMultimodalmodel.py:6-219).

Config-built conv stack (GroupNorm(8) + ReLU, optional MaxPool per block),
configurable one-hot text MLP, and 4 fusion modes (concatenation,
crossattention, metablock, gfcam). Every config is a distinct static
architecture, so each candidate compiles once and runs at full MXU speed —
the NAS loop's inner training reuses the standard train_process.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from skinjax.models.fusion.blocks import MetaBlock, MLPHead
from skinjax.nas.search_space import filters_from_config
from skinjax.ops.attention import MultiHeadAttention


class DynamicCNN(nn.Module):
    config: Any  # dict (hashable via tuple items at construction)
    num_classes: int = 6
    vocab_size: int = 85
    num_heads: int = 8
    text_encoder_dim_output: int = 512
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, image, metadata, *, train: bool = False, capture: bool = False):
        cfg = dict(self.config)
        det = not train
        k = int(cfg.get("kernel_size", 3))
        mech = cfg.get("attention_mecanism", "concatenation")
        common_dim = int(cfg.get("common_dim", 512))

        # ---- conv stack ----------------------------------------------------
        x = image
        for bi, out_ch in enumerate(filters_from_config(cfg)):
            for li in range(int(cfg.get("layers_per_block", 2))):
                x = nn.Conv(
                    out_ch, (k, k), padding=[(k // 2, k // 2)] * 2, use_bias=False,
                    dtype=self.dtype, name=f"conv{bi}_{li}",
                )(x)
                x = nn.GroupNorm(
                    num_groups=min(8, out_ch), dtype=self.dtype,
                    name=f"gn{bi}_{li}",
                )(x)
                x = nn.relu(x)
            if cfg.get("use_pooling", True) and min(x.shape[1], x.shape[2]) >= 2:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        feature_map = x
        img_feat = x.mean(axis=(1, 2))  # (B, C)

        # ---- text tower ----------------------------------------------------
        n_text = int(cfg.get("neurons_per_layer_size_of_text_fc", 512))
        t = nn.Dense(n_text, dtype=self.dtype, name="text_in")(metadata)
        t = nn.relu(t)
        for i in range(int(cfg.get("num_layers_text_fc", 2))):
            t = nn.Dense(n_text, dtype=self.dtype, name=f"text_h{i}")(t)
            t = nn.relu(t)
        txt_feat = nn.Dense(
            self.text_encoder_dim_output, dtype=self.dtype, name="text_out"
        )(t)

        # ---- fusion ----------------------------------------------------------
        if mech == "metablock":
            fused = MetaBlock(v_dim=img_feat.shape[-1], dtype=self.dtype,
                              name="meta_block")(img_feat, txt_feat)
        else:
            proj_img = nn.Dense(common_dim, dtype=self.dtype, name="img_proj")(img_feat)
            proj_txt = nn.Dense(common_dim, dtype=self.dtype, name="txt_proj")(txt_feat)
            if mech == "concatenation":
                fused = jnp.concatenate([proj_img, proj_txt], axis=-1)
            elif mech in ("crossattention", "gfcam"):
                i_seq, t_seq = proj_img[:, None], proj_txt[:, None]
                heads = self.num_heads if common_dim % self.num_heads == 0 else 1
                i_x = MultiHeadAttention(common_dim, heads, dtype=self.dtype,
                                         name="img_cross")(i_seq, t_seq, t_seq)[:, 0]
                t_x = MultiHeadAttention(common_dim, heads, dtype=self.dtype,
                                         name="txt_cross")(t_seq, i_seq, i_seq)[:, 0]
                if mech == "gfcam":
                    a_i = jax.nn.sigmoid(
                        nn.Dense(common_dim, dtype=self.dtype, name="img_gate")(i_x))
                    a_t = jax.nn.sigmoid(
                        nn.Dense(common_dim, dtype=self.dtype, name="txt_gate")(t_x))
                    i_x, t_x = a_i * i_x, a_t * t_x
                fused = jnp.concatenate([i_x, t_x], axis=-1)
            else:
                raise ValueError(f"unknown fusion '{mech}' for DynamicCNN")

        # ---- classifier MLP --------------------------------------------------
        n_fc = int(cfg.get("neurons_per_layer_size_of_fc_module", 512))
        h = fused
        for i in range(int(cfg.get("num_layers_fc_module", 2))):
            h = nn.Dense(n_fc, dtype=self.dtype, name=f"fc{i}")(h)
            h = nn.relu(h)
            h = nn.Dropout(0.3)(h, deterministic=det)
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="fc_out")(h)
        if capture:
            return logits, {"feature_map": feature_map, "img_feat": img_feat}
        return logits


def make_dynamic_model(config: Dict, num_classes: int, vocab_size: int,
                       dtype=None) -> DynamicCNN:
    return DynamicCNN(
        config=tuple(sorted(config.items())),
        num_classes=num_classes, vocab_size=vocab_size, dtype=dtype,
    )
