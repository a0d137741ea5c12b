"""Shape-static masked supernet: vmap NAS candidates into ONE XLA program.

SURVEY §7 names the hard part — "NAS loop economics: each controller step
trains a full model; on TPU, vmap/pjit across *candidate configs* is the
idiomatic win but requires shape-static DynamicCNN variants." This module is
that variant. Every candidate architecture in the reference search space
(/root/reference/src/scripts/benchmark/nas/optimization_train_process_pad_20.py:462-474)
embeds EXACTLY — same forward numerics and same gradients on its live
parameters — into one static-shape "envelope" program, with the architecture
choices carried as *data* (mask arrays) instead of Python structure.
``jax.vmap`` over (params, masks) then trains K candidates in one compiled
step: one trace, one compile, K architectures sharing each batch's augmented
images on the MXU.

Exactness recipe (tested in tests/test_supernet.py against DynamicCNN):

- **channels** embed *group-aligned*: DynamicCNN's GroupNorm uses
  ``min(8, C)`` groups of contiguous channels, so candidate group ``g``
  occupies the prefix of supernet group ``g``; masked GroupNorm then computes
  statistics over active channels only and matches the candidate's grouping.
- **kernel_size 3** embeds as the centre taps of a 5×5 kernel: zero border
  weights + SAME padding ≡ a padding-1 3×3 conv, exactly, gradients included
  (border taps receive zero gradient through the mask).
- **optional depth** (``layers_per_block``, text/fc layer counts) skips via
  ``out = m·f(x) + (1−m)·x`` identity bypass; the skipped layer's params get
  zero gradient.
- **block count** selects the candidate's GAP feature from a stacked
  per-block feature pyramid (deeper blocks still run but are dead code for
  that candidate — zero gradient, no effect on its reward).
- **fusion**: the seq-1 MHA of the crossattention/gfcam branches collapses
  exactly to ``out_proj(v_proj(v))`` (see ops/attention.py), so the fusion
  stage masks as plain prefix masks — no head alignment or 1/√d correction
  is needed.  MetaBlock's LayerNorms become masked LayerNorms over the
  (group-aligned) active image channels.

``embed_params`` maps a candidate DynamicCNN param tree into the supernet
layout — used by the parity tests and by ``exact_init`` population training
(so even the *initialization distribution* matches per-candidate training).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from skinjax.models.fusion.blocks import LN_EPS
from skinjax.nas.search_space import filters_from_config

GN_EPS = 1e-6  # flax nn.GroupNorm default (DynamicCNN uses the default)
FEAT_PAD = 512  # == the filter cap in search_space.filters_from_config
GN_GROUPS = 8  # min(8, C) == 8 for every C in the space (all C >= 8)


def _filters(num_blocks: int, initial_filters: int) -> List[int]:
    return filters_from_config(
        {"num_blocks": num_blocks, "initial_filters": initial_filters}
    )


@dataclasses.dataclass(frozen=True)
class Envelope:
    """Static shape envelope of a candidate population (one compile unit).

    ``use_pooling`` must be uniform across the population (pooling changes
    spatial shapes and cannot be emulated by masking); the population
    scheduler buckets on it.
    """

    num_blocks: int
    initial_filters: int
    kernel_size: int
    layers_per_block: int
    use_pooling: bool
    text_width: int
    text_layers: int
    common_dim: int
    fc_width: int
    fc_layers: int
    mechanisms: Tuple[str, ...]


def envelope_of(configs: Sequence[Dict]) -> Envelope:
    cs = [dict(c) for c in configs]
    pooling = {bool(c.get("use_pooling", True)) for c in cs}
    if len(pooling) != 1:
        raise ValueError(
            "population mixes use_pooling True/False — bucket by pooling first"
        )
    mx = lambda k: max(int(c[k]) for c in cs)
    return Envelope(
        num_blocks=mx("num_blocks"),
        initial_filters=mx("initial_filters"),
        kernel_size=mx("kernel_size"),
        layers_per_block=mx("layers_per_block"),
        use_pooling=pooling.pop(),
        text_width=mx("neurons_per_layer_size_of_text_fc"),
        text_layers=mx("num_layers_text_fc"),
        common_dim=mx("common_dim"),
        fc_width=mx("neurons_per_layer_size_of_fc_module"),
        fc_layers=mx("num_layers_fc_module"),
        mechanisms=tuple(sorted({c["attention_mecanism"] for c in cs})),
    )


def _prefix(n_total: int, n_active: int) -> np.ndarray:
    m = np.zeros(n_total, np.float32)
    m[:n_active] = 1.0
    return m


def _group_aligned(c_sup: int, c_cand: int) -> np.ndarray:
    """Channel mask where candidate group g fills the prefix of supernet
    group g (GroupNorm groups are contiguous channel slices)."""
    m = np.zeros(c_sup, np.float32)
    gs, ge = c_sup // GN_GROUPS, c_cand // GN_GROUPS
    for g in range(GN_GROUPS):
        m[g * gs : g * gs + ge] = 1.0
    return m


def candidate_masks(config: Dict, env: Envelope) -> Dict[str, np.ndarray]:
    """Compile a candidate config into the mask pytree for ``env``."""
    cfg = dict(config)
    nb = int(cfg["num_blocks"])
    f0 = int(cfg["initial_filters"])
    k = int(cfg["kernel_size"])
    if bool(cfg.get("use_pooling", True)) != env.use_pooling:
        raise ValueError("candidate use_pooling does not match envelope")
    sup_f = _filters(env.num_blocks, env.initial_filters)
    cand_f = _filters(nb, f0)

    m: Dict[str, np.ndarray] = {}
    for bi in range(env.num_blocks):
        m[f"conv_ch_{bi}"] = (
            _group_aligned(sup_f[bi], cand_f[bi])
            if bi < nb
            else np.zeros(sup_f[bi], np.float32)
        )
    km = np.zeros((env.kernel_size, env.kernel_size), np.float32)
    o = (env.kernel_size - k) // 2
    km[o : o + k, o : o + k] = 1.0
    m["kernel"] = km
    m["layer2"] = np.float32(1.0 if int(cfg["layers_per_block"]) >= 2 else 0.0)
    sel = np.zeros(env.num_blocks, np.float32)
    sel[nb - 1] = 1.0
    m["block_sel"] = sel
    imf = np.zeros(FEAT_PAD, np.float32)
    imf[: sup_f[nb - 1]] = m[f"conv_ch_{nb - 1}"]
    m["img_feat"] = imf
    m["text_w"] = _prefix(
        env.text_width, int(cfg["neurons_per_layer_size_of_text_fc"])
    )
    m["text_layer"] = np.array(
        [1.0 if i < int(cfg["num_layers_text_fc"]) else 0.0
         for i in range(env.text_layers)],
        np.float32,
    )
    m["common"] = _prefix(env.common_dim, int(cfg["common_dim"]))
    mech = np.zeros(len(env.mechanisms), np.float32)
    mech[env.mechanisms.index(cfg["attention_mecanism"])] = 1.0
    m["mech"] = mech
    m["fc_w"] = _prefix(
        env.fc_width, int(cfg["neurons_per_layer_size_of_fc_module"])
    )
    m["fc_layer2"] = np.float32(
        1.0 if int(cfg["num_layers_fc_module"]) >= 2 else 0.0
    )
    return m


class SuperNet(nn.Module):
    """Masked shape-static DynamicCNN (nas/dynamic_model.py) — architecture
    choices arrive as the ``masks`` argument, so one compiled program serves
    every candidate inside its :class:`Envelope` and ``jax.vmap`` batches
    candidates."""

    env: Envelope
    num_classes: int = 6
    vocab_size: int = 85
    text_encoder_dim_output: int = 512
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, image, metadata, masks, *, train: bool = False):
        env = self.env
        det = not train
        ks = env.kernel_size
        kmask = masks["kernel"][:, :, None, None]
        sup_f = _filters(env.num_blocks, env.initial_filters)

        def masked_gn(name, x, mask):
            # GroupNorm(min(8,C)) with statistics over ACTIVE channels only
            # (group-aligned masks make the supernet grouping coincide with
            # the candidate's). All-zero masks (blocks past the candidate's
            # depth) are guarded against 0/0 — their output is masked anyway.
            C = x.shape[-1]
            scale = self.param(f"{name}_scale", nn.initializers.ones, (C,))
            bias = self.param(f"{name}_bias", nn.initializers.zeros, (C,))
            B, H, W = x.shape[0], x.shape[1], x.shape[2]
            xg = x.reshape(B, H, W, GN_GROUPS, C // GN_GROUPS).astype(jnp.float32)
            mg = mask.reshape(GN_GROUPS, C // GN_GROUPS)
            cnt = jnp.maximum(mg.sum(-1) * H * W, 1.0)  # (G,)
            mean = (xg * mg).sum(axis=(1, 2, 4)) / cnt  # (B, G)
            d = (xg - mean[:, None, None, :, None]) * mg
            var = (d * d).sum(axis=(1, 2, 4)) / cnt
            y = (xg - mean[:, None, None, :, None]) * jax.lax.rsqrt(
                var + GN_EPS
            )[:, None, None, :, None]
            y = y.reshape(B, H, W, C).astype(x.dtype)
            return (y * scale + bias) * mask

        def masked_ln(name, x, mask):
            # LayerNorm(LN_EPS) over active positions of the last axis
            C = x.shape[-1]
            scale = self.param(f"{name}_scale", nn.initializers.ones, (C,))
            bias = self.param(f"{name}_bias", nn.initializers.zeros, (C,))
            cnt = jnp.maximum(mask.sum(), 1.0)
            xm = x.astype(jnp.float32) * mask
            mean = xm.sum(-1, keepdims=True) / cnt
            d = (x.astype(jnp.float32) - mean) * mask
            var = (d * d).sum(-1, keepdims=True) / cnt
            y = (d * jax.lax.rsqrt(var + LN_EPS)).astype(x.dtype)
            return (y * scale + bias) * mask

        def conv_gn_relu(bi, li, x):
            w = self.param(
                f"conv{bi}_{li}",
                nn.initializers.lecun_normal(),
                (ks, ks, x.shape[-1], sup_f[bi]),
            )
            # promote like nn.Conv(dtype=None): bf16 image x f32 kernel runs
            # in f32 — casting the kernel DOWN to the image dtype instead
            # would silently break the forward/gradient exactness vs
            # DynamicCNN under the default bfloat16 input pipeline
            ct = jnp.promote_types(x.dtype, w.dtype)
            y = jax.lax.conv_general_dilated(
                x.astype(ct),
                (w * kmask).astype(ct),
                (1, 1),
                [(ks // 2, ks // 2)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return nn.relu(masked_gn(f"gn{bi}_{li}", y, masks[f"conv_ch_{bi}"]))

        dense = lambda name, n: nn.Dense(n, dtype=self.dtype, name=name)

        # ---- conv pyramid (dynamic_model.py:40-55) --------------------------
        x = image
        feats = []
        for bi in range(env.num_blocks):
            x = conv_gn_relu(bi, 0, x)
            if env.layers_per_block >= 2:
                a = masks["layer2"]
                x = a * conv_gn_relu(bi, 1, x) + (1.0 - a) * x
            if env.use_pooling and min(x.shape[1], x.shape[2]) >= 2:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            g = x.mean(axis=(1, 2))
            feats.append(jnp.pad(g, ((0, 0), (0, FEAT_PAD - g.shape[-1]))))
        img_feat = jnp.einsum("n,nbc->bc", masks["block_sel"], jnp.stack(feats))
        imf_mask = masks["img_feat"]

        # ---- text tower (dynamic_model.py:57-66) ----------------------------
        tw = masks["text_w"]
        t = nn.relu(dense("text_in", env.text_width)(metadata) * tw)
        for i in range(env.text_layers):
            a = masks["text_layer"][i]
            t = a * nn.relu(dense(f"text_h{i}", env.text_width)(t) * tw) + (
                1.0 - a
            ) * t
        txt_feat = dense("text_out", self.text_encoder_dim_output)(t)

        # ---- fusion branches (dynamic_model.py:68-92) -----------------------
        cm = masks["common"]
        branch_dim = max(
            FEAT_PAD if b == "metablock" else 2 * env.common_dim
            for b in env.mechanisms
        )
        if any(b != "metablock" for b in env.mechanisms):
            pi = dense("img_proj", env.common_dim)(img_feat) * cm
            pt = dense("txt_proj", env.common_dim)(txt_feat) * cm
        if {"crossattention", "gfcam"} & set(env.mechanisms):
            # seq-1 MHA collapse: out_proj(v_proj(kv)) — ops/attention.py
            i_x0 = dense("img_cross_out", env.common_dim)(
                dense("img_cross_v", env.common_dim)(pt)
            ) * cm
            t_x0 = dense("txt_cross_out", env.common_dim)(
                dense("txt_cross_v", env.common_dim)(pi)
            ) * cm
        branches = []
        for b in env.mechanisms:
            if b == "concatenation":
                f = jnp.concatenate([pi, pt], axis=-1)
            elif b == "crossattention":
                f = jnp.concatenate([i_x0, t_x0], axis=-1)
            elif b == "gfcam":
                a_i = jax.nn.sigmoid(dense("img_gate", env.common_dim)(i_x0))
                a_t = jax.nn.sigmoid(dense("txt_gate", env.common_dim)(t_x0))
                f = jnp.concatenate([a_i * i_x0, a_t * t_x0], axis=-1)
            elif b == "metablock":
                t1 = masked_ln(
                    "mb_fb_norm", dense("mb_fb", FEAT_PAD)(txt_feat), imf_mask
                )
                t2 = masked_ln(
                    "mb_gb_norm", dense("mb_gb", FEAT_PAD)(txt_feat), imf_mask
                )
                f = jax.nn.sigmoid(jnp.tanh(img_feat * t1) + t2) * imf_mask
            else:
                raise ValueError(f"unknown fusion '{b}' for SuperNet")
            branches.append(jnp.pad(f, ((0, 0), (0, branch_dim - f.shape[-1]))))
        onehot = masks["mech"]
        fused = sum(onehot[j] * branches[j] for j in range(len(branches)))

        # ---- classifier MLP (dynamic_model.py:94-104) -----------------------
        fw = masks["fc_w"]
        h = nn.Dropout(0.3)(
            nn.relu(dense("fc0", env.fc_width)(fused) * fw), deterministic=det
        )
        if env.fc_layers >= 2:
            a = masks["fc_layer2"]
            y = nn.Dropout(0.3)(
                nn.relu(dense("fc1", env.fc_width)(h) * fw), deterministic=det
            )
            h = a * y + (1.0 - a) * h
        return dense("fc_out", self.num_classes)(h)


# ---------------------------------------------------------------------------
# Candidate -> supernet parameter embedding (parity tests + exact_init)
# ---------------------------------------------------------------------------


def embed_params(cand_params: Dict, sup_params: Dict, config: Dict,
                 env: Envelope) -> Dict:
    """Scatter a candidate DynamicCNN param tree into the supernet layout.

    The returned tree, run through the masked supernet with this candidate's
    masks, reproduces the candidate's forward and (active-param) gradients
    exactly. Inactive entries keep the supernet's values — they are dead by
    construction.
    """
    cfg = dict(config)
    nb = int(cfg["num_blocks"])
    f0 = int(cfg["initial_filters"])
    k = int(cfg["kernel_size"])
    lpb = int(cfg["layers_per_block"])
    cd = int(cfg["common_dim"])
    ntext = int(cfg["neurons_per_layer_size_of_text_fc"])
    ltext = int(cfg["num_layers_text_fc"])
    nfc = int(cfg["neurons_per_layer_size_of_fc_module"])
    lfc = int(cfg["num_layers_fc_module"])
    mech = cfg["attention_mecanism"]

    sup = jax.tree_util.tree_map(np.array, sup_params)
    cand = jax.tree_util.tree_map(np.asarray, cand_params)
    sup_f = _filters(env.num_blocks, env.initial_filters)
    cand_f = _filters(nb, f0)
    ko = (env.kernel_size - k) // 2
    ksl = list(range(ko, ko + k))

    act = {
        bi: np.where(_group_aligned(sup_f[bi], cand_f[bi]) > 0)[0]
        for bi in range(nb)
    }

    prev = np.arange(3)  # RGB input channels
    for bi in range(nb):
        for li in range(lpb):
            in_act = prev if li == 0 else act[bi]
            sup[f"conv{bi}_{li}"][np.ix_(ksl, ksl, in_act, act[bi])] = cand[
                f"conv{bi}_{li}"
            ]["kernel"]
            sup[f"gn{bi}_{li}_scale"][act[bi]] = cand[f"gn{bi}_{li}"]["scale"]
            sup[f"gn{bi}_{li}_bias"][act[bi]] = cand[f"gn{bi}_{li}"]["bias"]
        prev = act[bi]

    def put(cand_leaf, sname, in_act, out_act):
        sup[sname]["kernel"][np.ix_(in_act, out_act)] = cand_leaf["kernel"]
        sup[sname]["bias"][out_act] = cand_leaf["bias"]

    full = lambda n: np.arange(n)
    tw_act = full(ntext)
    put(cand["text_in"], "text_in", full(int(np.asarray(
        cand["text_in"]["kernel"]).shape[0])), tw_act)
    for i in range(ltext):
        put(cand[f"text_h{i}"], f"text_h{i}", tw_act, tw_act)
    put(cand["text_out"], "text_out", tw_act, full(512))

    imf_act = np.where(
        np.concatenate([
            _group_aligned(sup_f[nb - 1], cand_f[nb - 1]),
            np.zeros(FEAT_PAD - sup_f[nb - 1], np.float32),
        ]) > 0
    )[0]
    cd_act = full(cd)

    if mech == "metablock":
        put(cand["meta_block"]["fb"], "mb_fb", full(512), imf_act)
        put(cand["meta_block"]["gb"], "mb_gb", full(512), imf_act)
        for cn, sn in (("fb_norm", "mb_fb_norm"), ("gb_norm", "mb_gb_norm")):
            sup[f"{sn}_scale"][imf_act] = cand["meta_block"][cn]["scale"]
            sup[f"{sn}_bias"][imf_act] = cand["meta_block"][cn]["bias"]
        fc_in_act = imf_act
    else:
        put(cand["img_proj"], "img_proj", imf_act, cd_act)
        put(cand["txt_proj"], "txt_proj", full(512), cd_act)
        if mech in ("crossattention", "gfcam"):
            put(cand["img_cross"]["v_proj"], "img_cross_v", cd_act, cd_act)
            put(cand["img_cross"]["out_proj"], "img_cross_out", cd_act, cd_act)
            put(cand["txt_cross"]["v_proj"], "txt_cross_v", cd_act, cd_act)
            put(cand["txt_cross"]["out_proj"], "txt_cross_out", cd_act, cd_act)
            if mech == "gfcam":
                put(cand["img_gate"], "img_gate", cd_act, cd_act)
                put(cand["txt_gate"], "txt_gate", cd_act, cd_act)
        # candidate fc0 input layout: [img(cd) | txt(cd)]; supernet layout:
        # [img(common_dim_env) | txt(common_dim_env)]
        fc_in_act = np.concatenate([cd_act, env.common_dim + cd_act])

    fw_act = full(nfc)
    put(cand["fc0"], "fc0", fc_in_act, fw_act)
    if lfc >= 2:
        put(cand["fc1"], "fc1", fw_act, fw_act)
    put(cand["fc_out"], "fc_out", fw_act, full(int(np.asarray(
        cand["fc_out"]["kernel"]).shape[1])))
    return jax.tree_util.tree_map(jnp.asarray, sup)
