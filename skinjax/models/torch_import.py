"""torch → flax weight importers.

Converts reference / torchvision state_dicts into skinjax param trees so (a)
pretrained backbones can be ingested when weight files are available and (b)
reference checkpoints can be loaded for accuracy-parity checks (SURVEY.md §7
'hard parts': BN statistics, packed MHA in_proj, NCHW→NHWC kernel layout).

Tensors are plain numpy (pass ``{k: v.numpy() for k, v in sd.items()}`` or let
``load_torch_state_dict`` do it via torch).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    # tolerate DataParallel 'module.' prefixes (inference_all_folds.py:50-51)
    return {k.removeprefix("module."): v.numpy() for k, v in sd.items()}


# -- primitive converters (torch layout -> flax layout) ----------------------


def t2f_linear(sd: Dict, prefix: str) -> Dict:
    out = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def t2f_conv(sd: Dict, prefix: str) -> Dict:
    # torch OIHW -> flax HWIO
    out = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].transpose(2, 3, 1, 0))}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def t2f_bn(sd: Dict, prefix: str) -> Tuple[Dict, Dict]:
    """Returns (params, batch_stats)."""
    params = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    stats = {"mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]}
    return params, stats


def t2f_ln(sd: Dict, prefix: str) -> Dict:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def t2f_mha(sd: Dict, prefix: str, dim: int) -> Dict:
    """Packed in_proj (3D, D) -> separate q/k/v + out_proj flax Dense trees."""
    w = sd[f"{prefix}.in_proj_weight"]
    b = sd[f"{prefix}.in_proj_bias"]
    mk = lambda W, bb: {"kernel": np.ascontiguousarray(W.T), "bias": bb}
    return {
        "q_proj": mk(w[:dim], b[:dim]),
        "k_proj": mk(w[dim : 2 * dim], b[dim : 2 * dim]),
        "v_proj": mk(w[2 * dim :], b[2 * dim :]),
        "out_proj": mk(sd[f"{prefix}.out_proj.weight"], sd[f"{prefix}.out_proj.bias"]),
    }


# -- ResNet (torchvision naming) ---------------------------------------------


def import_resnet(
    sd: Dict[str, np.ndarray],
    stage_sizes: Sequence[int] = (3, 4, 6, 3),
    block: str = "bottleneck",
    prefix: str = "",
) -> Tuple[Dict, Dict]:
    """torchvision resnet18/50 state_dict -> (params, batch_stats) for
    skinjax.models.backbones.resnet.ResNet."""
    P = lambda s: f"{prefix}{s}"
    params: Dict = {}
    stats: Dict = {}

    def put_convbn(name: str, conv_key: str, bn_key: str):
        conv = t2f_conv(sd, P(conv_key))
        bnp, bns = t2f_bn(sd, P(bn_key))
        params[name] = {"conv": conv, "bn": bnp}
        stats[name] = {"bn": bns}

    put_convbn("stem", "conv1", "bn1")
    n_convs = 3 if block == "bottleneck" else 2
    for li, n_blocks in enumerate(stage_sizes, start=1):
        for bi in range(n_blocks):
            blk = f"layer{li}_{bi}"
            params[blk] = {}
            stats[blk] = {}
            for ci in range(1, n_convs + 1):
                conv = t2f_conv(sd, P(f"layer{li}.{bi}.conv{ci}"))
                bnp, bns = t2f_bn(sd, P(f"layer{li}.{bi}.bn{ci}"))
                params[blk][f"conv{ci}"] = {"conv": conv, "bn": bnp}
                stats[blk][f"conv{ci}"] = {"bn": bns}
            dkey = P(f"layer{li}.{bi}.downsample.0.weight")
            if dkey in sd:
                conv = t2f_conv(sd, P(f"layer{li}.{bi}.downsample.0"))
                bnp, bns = t2f_bn(sd, P(f"layer{li}.{bi}.downsample.1"))
                params[blk]["downsample"] = {"conv": conv, "bn": bnp}
                stats[blk]["downsample"] = {"bn": bns}
    return params, stats


# -- the reference MultimodalModel checkpoint ---------------------------------


def import_backbone(
    sd: Dict[str, np.ndarray],
    backbone: str,
    prefix: str = "",
) -> Tuple[Dict, Dict]:
    """Dispatch a backbone state_dict to its family importer by skinjax
    registry name (models/backbones). The reference stores the raw
    torchvision/timm model at ``self.image_encoder``
    (multimodalIntraInterModal.py:49, loadImageModelClassifier.py:115-150),
    so a full-checkpoint import passes ``prefix="image_encoder."``.
    Returns (params, batch_stats); pure-transformer families have no BN and
    return empty stats."""
    dispatch = {
        "resnet-50": lambda: import_resnet(sd, (3, 4, 6, 3), "bottleneck", prefix),
        "resnet-18": lambda: import_resnet(sd, (2, 2, 2, 2), "basic", prefix),
        "vgg16": lambda: import_vgg16(sd, prefix),
        "densenet169": lambda: import_densenet(sd, prefix=prefix),
        "mobilenet-v2": lambda: import_mobilenet_v2(sd, prefix=prefix),
        "efficientnet-b0": lambda: import_efficientnet(sd, prefix=prefix),
        "efficientnet-b7": lambda: import_efficientnet(sd, depth=3.1, prefix=prefix),
        "swin_tiny_patch4_window7_224": lambda: import_swin(sd, prefix=prefix),
        "davit_tiny": lambda: import_davit(sd, prefix=prefix),
        "caformer_s18": lambda: import_caformer(sd, prefix=prefix),
        "caformer_b36": lambda: import_caformer(sd, (3, 12, 18, 3), prefix=prefix),
        "mvitv2_small": lambda: import_mvit(sd, (1, 2, 11, 2), prefix=prefix),
        "nextvit_small": lambda: import_nextvit(sd, prefix=prefix),
        "coat_lite_small": lambda: import_coat(
            sd, (3, 4, 6, 3), n_windows=3, prefix=prefix),
        "beitv2_large_patch16_224": lambda: import_beit(sd, 24, prefix=prefix),
        "vit_tiny_patch16_224": lambda: import_vit(sd, 12, 192, prefix=prefix),
        "vit_small_patch16_224": lambda: import_vit(sd, 12, 384, prefix=prefix),
        "vit_base_patch16_224": lambda: import_vit(sd, 12, 768, prefix=prefix),
        "vit_large_patch16_224": lambda: import_vit(sd, 24, 1024, prefix=prefix),
    }
    if backbone not in dispatch:
        raise NotImplementedError(f"importer for backbone '{backbone}'")
    out = dispatch[backbone]()
    if isinstance(out, tuple):
        return out
    return out, {}


def import_multimodal_checkpoint(
    sd: Dict[str, np.ndarray],
    common_dim: int = 512,
    backbone: str = "resnet-50",
) -> Tuple[Dict, Dict]:
    """Reference MultimodalModel state_dict (multimodalIntraInterModal.py) ->
    (params, batch_stats) for skinjax MultimodalModel. The backbone subtree
    routes through :func:`import_backbone`, covering every registry family."""
    enc_p, enc_s = import_backbone(sd, backbone, "image_encoder.")

    params: Dict = {"image_encoder": enc_p}
    stats: Dict = {"image_encoder": enc_s}

    params["image_projector"] = t2f_linear(sd, "image_projector")
    params["text_projector"] = t2f_linear(sd, "text_projector")
    if "text_fc.0.weight" in sd:
        params["text_tower"] = {
            "fc0": t2f_linear(sd, "text_fc.0"),
            "fc1": t2f_linear(sd, "text_fc.2"),
            "fc2": t2f_linear(sd, "text_fc.4"),
        }
    elif any(k.startswith("text_encoder.") for k in sd):
        # sentence model: HF BERT/GPT-2 tower at self.text_encoder
        # (multimodalIntraInterModal.py:66) -> NativeSentenceTower scope.
        # Tokens-mode models pass the tower as the ``text_module`` field,
        # which is the flax scope name it gets (fusion/multimodal.py:106).
        enc_params, scope = import_text_encoder(sd)
        params["text_module"] = {scope: enc_params}
    for name in ("image_self_attention", "text_self_attention",
                 "image_cross_attention", "text_cross_attention"):
        if f"{name}.in_proj_weight" in sd:
            params[name] = t2f_mha(sd, name, common_dim)
    for name in ("img_gate", "txt_gate", "fc_visual_only",
                 "fc_fusion_proj_feat2output"):
        if f"{name}.weight" in sd:
            params[name] = t2f_linear(sd, name)
    if "meta_block.fb.0.weight" in sd:
        params["meta_block"] = {
            "fb": t2f_linear(sd, "meta_block.fb.0"),
            "fb_norm": t2f_ln(sd, "meta_block.fb.1"),
            "gb": t2f_linear(sd, "meta_block.gb.0"),
            "gb_norm": t2f_ln(sd, "meta_block.gb.1"),
        }
    for res in ("image_residual", "text_residual"):
        if f"{res}.attn.in_proj_weight" in sd:
            params[res] = {
                "attn": t2f_mha(sd, f"{res}.attn", common_dim),
                "gate_linear": t2f_linear(sd, f"{res}.gate_linear"),
                "norm": t2f_ln(sd, f"{res}.norm"),
            }

    def mlp_head(prefix: str) -> Dict:
        return {
            "fc1": t2f_linear(sd, f"{prefix}.0"),
            "norm1": t2f_ln(sd, f"{prefix}.1"),
            "fc2": t2f_linear(sd, f"{prefix}.4"),
            "norm2": t2f_ln(sd, f"{prefix}.5"),
            "fc_out": t2f_linear(sd, f"{prefix}.8"),
        }

    if "fc_fusion.0.weight" in sd:
        params["fc_fusion"] = mlp_head("fc_fusion")
    if "fc_mlp_module_after_metablock_fusion_module.0.weight" in sd:
        params["fc_after_metablock"] = mlp_head(
            "fc_mlp_module_after_metablock_fusion_module"
        )
    return params, stats


def import_densenet(
    sd: Dict[str, np.ndarray],
    block_config: Sequence[int] = (6, 12, 32, 32),
    prefix: str = "",
    features_key: str = "features.",
) -> Tuple[Dict, Dict]:
    """torchvision DenseNet (features.conv0/norm0, denseblock{k}.denselayer{j},
    transition{k}, norm5) -> skinjax cnn_zoo.DenseNet (params, batch_stats).

    ``features_key=""`` handles checkpoints where ``densenet.features`` was
    re-assigned directly (the reference MDNet's ``feature_extractor``,
    multimodalMDNet.py:72)."""
    P = lambda s: f"{prefix}{features_key}{s}"
    params: Dict = {}
    stats: Dict = {}
    params["conv0"] = t2f_conv(sd, P("conv0"))
    bnp, bns = t2f_bn(sd, P("norm0"))
    params["norm0"], stats["norm0"] = bnp, bns
    for bi, n_layers in enumerate(block_config):
        for li in range(n_layers):
            src = f"denseblock{bi + 1}.denselayer{li + 1}"
            dst = f"block{bi}_layer{li}"
            n1p, n1s = t2f_bn(sd, P(f"{src}.norm1"))
            n2p, n2s = t2f_bn(sd, P(f"{src}.norm2"))
            params[dst] = {
                "norm1": n1p, "conv1": t2f_conv(sd, P(f"{src}.conv1")),
                "norm2": n2p, "conv2": t2f_conv(sd, P(f"{src}.conv2")),
            }
            stats[dst] = {"norm1": n1s, "norm2": n2s}
        if bi != len(block_config) - 1:
            tp, ts = t2f_bn(sd, P(f"transition{bi + 1}.norm"))
            params[f"trans{bi}_norm"], stats[f"trans{bi}_norm"] = tp, ts
            params[f"trans{bi}_conv"] = t2f_conv(sd, P(f"transition{bi + 1}.conv"))
    fp, fs = t2f_bn(sd, P("norm5"))
    params["norm_final"], stats["norm_final"] = fp, fs
    return params, stats


def import_mobilenet_v2(
    sd: Dict[str, np.ndarray],
    cfg: Sequence = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
                     (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)),
    prefix: str = "",
) -> Tuple[Dict, Dict]:
    """torchvision MobileNetV2 (features.0 stem ConvBNReLU, features.1..17
    InvertedResidual with conv.{0.0,0.1,1.0,1.1,2,3} — expand_ratio-1 blocks
    shift to conv.{0.0,0.1,1,2} — features.18 head) -> skinjax
    cnn_zoo.MobileNetV2 (params, batch_stats)."""
    P = lambda s: f"{prefix}features.{s}"
    params: Dict = {}
    stats: Dict = {}

    def put_bn(name: str, src: str):
        bnp, bns = t2f_bn(sd, P(src))
        params[name], stats[name] = bnp, bns

    params["stem"] = t2f_conv(sd, P("0.0"))
    put_bn("stem_bn", "0.1")

    idx = 0
    feat_i = 1
    for t, c, n, s in cfg:
        for j in range(n):
            blk = f"block{idx}"
            params[blk] = {}
            stats[blk] = {}
            if t != 1:
                params[blk]["expand"] = t2f_conv(sd, P(f"{feat_i}.conv.0.0"))
                bnp, bns = t2f_bn(sd, P(f"{feat_i}.conv.0.1"))
                params[blk]["expand_bn"], stats[blk]["expand_bn"] = bnp, bns
                dw_conv, dw_bn = f"{feat_i}.conv.1.0", f"{feat_i}.conv.1.1"
                pj_conv, pj_bn = f"{feat_i}.conv.2", f"{feat_i}.conv.3"
            else:
                dw_conv, dw_bn = f"{feat_i}.conv.0.0", f"{feat_i}.conv.0.1"
                pj_conv, pj_bn = f"{feat_i}.conv.1", f"{feat_i}.conv.2"
            # torch depthwise kernels are (C,1,kh,kw); flax grouped convs use
            # HWIO with I=1: (kh,kw,1,C)
            dw = sd[P(f"{dw_conv}.weight")]
            params[blk]["dw"] = {
                "kernel": np.ascontiguousarray(dw.transpose(2, 3, 1, 0))
            }
            bnp, bns = t2f_bn(sd, P(dw_bn))
            params[blk]["dw_bn"], stats[blk]["dw_bn"] = bnp, bns
            params[blk]["project"] = t2f_conv(sd, P(pj_conv))
            bnp, bns = t2f_bn(sd, P(pj_bn))
            params[blk]["project_bn"], stats[blk]["project_bn"] = bnp, bns
            idx += 1
            feat_i += 1

    params["head"] = t2f_conv(sd, P(f"{feat_i}.0"))
    put_bn("head_bn", f"{feat_i}.1")
    return params, stats


def import_efficientnet(
    sd: Dict[str, np.ndarray],
    cfg: Sequence = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 40, 2, 2), (6, 80, 3, 2),
                     (6, 112, 3, 1), (6, 192, 4, 2), (6, 320, 1, 1)),
    depth: float = 1.0,
    prefix: str = "",
) -> Tuple[Dict, Dict]:
    """torchvision EfficientNet (features.0 stem, features.{s}.{b}.block.{...}
    MBConv with optional expand stage + SqueezeExcitation convs, features.N
    head) -> skinjax cnn_zoo.EfficientNet (params, batch_stats)."""
    import math

    P = lambda s: f"{prefix}features.{s}"
    params: Dict = {}
    stats: Dict = {}

    def put_bn(name: str, src: str):
        bnp, bns = t2f_bn(sd, P(src))
        params[name], stats[name] = bnp, bns

    def dw_conv(src: str) -> Dict:
        w = sd[P(f"{src}.weight")]  # (C,1,kh,kw) -> (kh,kw,1,C)
        return {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0))}

    def se_dense(src: str) -> Dict:
        # 1x1 conv (out,in,1,1) -> dense kernel (in,out)
        w = sd[P(f"{src}.weight")][:, :, 0, 0]
        return {"kernel": np.ascontiguousarray(w.T), "bias": sd[P(f"{src}.bias")]}

    params["stem"] = t2f_conv(sd, P("0.0"))
    put_bn("stem_bn", "0.1")

    idx = 0
    for si, (t, c, n, s) in enumerate(cfg, start=1):
        n = int(math.ceil(n * depth))
        for b in range(n):
            blk = f"block{idx}"
            B = f"{si}.{b}.block"
            params[blk] = {}
            stats[blk] = {}
            if t != 1:
                params[blk]["expand"] = t2f_conv(sd, P(f"{B}.0.0"))
                bnp, bns = t2f_bn(sd, P(f"{B}.0.1"))
                params[blk]["expand_bn"], stats[blk]["expand_bn"] = bnp, bns
                dw, se, pj = f"{B}.1", f"{B}.2", f"{B}.3"
            else:
                dw, se, pj = f"{B}.0", f"{B}.1", f"{B}.2"
            params[blk]["dw"] = dw_conv(f"{dw}.0")
            bnp, bns = t2f_bn(sd, P(f"{dw}.1"))
            params[blk]["dw_bn"], stats[blk]["dw_bn"] = bnp, bns
            params[blk]["se"] = {
                "fc1": se_dense(f"{se}.fc1"), "fc2": se_dense(f"{se}.fc2"),
            }
            params[blk]["project"] = t2f_conv(sd, P(f"{pj}.0"))
            bnp, bns = t2f_bn(sd, P(f"{pj}.1"))
            params[blk]["project_bn"], stats[blk]["project_bn"] = bnp, bns
            idx += 1

    head_i = len(cfg) + 1
    params["head"] = t2f_conv(sd, P(f"{head_i}.0"))
    put_bn("head_bn", f"{head_i}.1")
    return params, stats


def import_mdnet(
    sd: Dict[str, np.ndarray],
    block_config: Sequence[int] = (6, 12, 32, 32),
) -> Tuple[Dict, Dict]:
    """Reference MDNet checkpoint (multimodalMDNet.py:60-102:
    feature_extractor densenet features, meta_net 1x1 convs, meta_block
    fb/gb Linear+LN, classifier) -> skinjax baselines.MDNet (params, stats).

    Note: the reference feeds the head from the features' final norm without
    the classification ReLU (a quirk); skinjax's DenseNet applies the
    torchvision-forward ReLU — identical gradients almost everywhere, small
    activation difference at exactly-zero pre-activations."""
    enc_p, enc_s = import_densenet(
        sd, block_config, prefix="feature_extractor.", features_key=""
    )
    # compact-created backbone gets linen's auto name
    params: Dict = {"DenseNet_0": enc_p}
    stats: Dict = {"DenseNet_0": enc_s}

    def conv1x1_to_dense(key: str) -> Dict:
        w = sd[f"{key}.weight"][:, :, 0, 0]  # (out, in, 1, 1)
        return {"kernel": np.ascontiguousarray(w.T), "bias": sd[f"{key}.bias"]}

    params["meta_net"] = {
        "fc1": conv1x1_to_dense("meta_net.metanet.0"),
        "fc2": conv1x1_to_dense("meta_net.metanet.2"),
    }
    params["meta_block"] = {
        "fb": t2f_linear(sd, "meta_block.fb.0"),
        "fb_norm": t2f_ln(sd, "meta_block.fb.1"),
        "gb": t2f_linear(sd, "meta_block.gb.0"),
        "gb_norm": t2f_ln(sd, "meta_block.gb.1"),
    }
    params["classifier"] = t2f_linear(sd, "classifier")
    return params, stats


def import_swin(
    sd: Dict[str, np.ndarray],
    dims: Sequence[int] = (96, 192, 384, 768),
    depths: Sequence[int] = (2, 2, 6, 2),
    prefix: str = "",
) -> Dict:
    """timm Swin (patch_embed.proj/norm, layers.{i}.blocks.{j}.{norm1,
    attn.{qkv,proj,relative_position_bias_table},norm2,mlp.{fc1,fc2}},
    layers.{i}.downsample.{norm,reduction}, norm) -> skinjax
    transformer_zoo.Swin. The relative-position index map is recomputed
    statically with timm's formula, so only the bias table transfers."""
    P = lambda s: f"{prefix}{s}"
    params: Dict = {
        "patch_embed": {
            "kernel": np.ascontiguousarray(
                sd[P("patch_embed.proj.weight")].transpose(2, 3, 1, 0)
            ),
            "bias": sd[P("patch_embed.proj.bias")],
        },
        "patch_norm": t2f_ln(sd, P("patch_embed.norm")),
        "norm": t2f_ln(sd, P("norm")),
    }
    for si, depth in enumerate(depths):
        if si > 0:
            # timm names the merge on the stage it downsamples INTO or OUT OF
            # depending on version; accept both layers.{si}.downsample and
            # layers.{si-1}.downsample
            for cand in (f"layers.{si}.downsample", f"layers.{si - 1}.downsample"):
                if P(f"{cand}.reduction.weight") in sd:
                    params[f"merge{si}"] = {
                        "norm": t2f_ln(sd, P(f"{cand}.norm")),
                        "reduction": {
                            "kernel": np.ascontiguousarray(
                                sd[P(f"{cand}.reduction.weight")].T
                            )
                        },
                    }
                    break
        for bi in range(depth):
            B = f"layers.{si}.blocks.{bi}"
            params[f"stage{si}_block{bi}"] = {
                "norm1": t2f_ln(sd, P(f"{B}.norm1")),
                "attn": {
                    "qkv": t2f_linear(sd, P(f"{B}.attn.qkv")),
                    "proj": t2f_linear(sd, P(f"{B}.attn.proj")),
                    "rel_bias": sd[P(f"{B}.attn.relative_position_bias_table")],
                },
                "norm2": t2f_ln(sd, P(f"{B}.norm2")),
                "mlp": {
                    "fc1": t2f_linear(sd, P(f"{B}.mlp.fc1")),
                    "fc2": t2f_linear(sd, P(f"{B}.mlp.fc2")),
                },
            }
    return params


def _t2f_dwconv(sd: Dict, prefix: str) -> Dict:
    """torch depthwise conv (C,1,kh,kw) -> flax grouped-conv HWIO (kh,kw,1,C)."""
    out = {"kernel": np.ascontiguousarray(
        sd[f"{prefix}.weight"].transpose(2, 3, 1, 0))}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def import_davit(
    sd: Dict[str, np.ndarray],
    depths: Sequence[int] = (1, 1, 3, 1),
    prefix: str = "",
) -> Dict:
    """timm DaViT (stem.{conv,norm}, stages.{i}.downsample.{norm,conv},
    stages.{i}.blocks.{j}.{0,1}.{cpe1.proj,norm1,attn.{qkv,proj},cpe2.proj,
    norm2,mlp.{fc1,fc2}}, head.norm) -> skinjax davit.DaViT params.

    Matches the reference's generic timm loading of ``davit_tiny``
    (loadImageModelClassifier.py:117-121, reset_classifier(0) keeps
    head.norm)."""
    P = lambda s: f"{prefix}{s}"
    params: Dict = {
        "stem_conv": t2f_conv(sd, P("stem.conv")),
        "stem_norm": t2f_ln(sd, P("stem.norm")),
        "head_norm": t2f_ln(sd, P("head.norm")),
    }

    def block(B: str) -> Dict:
        return {
            "cpe1": {"proj": _t2f_dwconv(sd, P(f"{B}.cpe1.proj"))},
            "norm1": t2f_ln(sd, P(f"{B}.norm1")),
            "attn": {
                "qkv": t2f_linear(sd, P(f"{B}.attn.qkv")),
                "proj": t2f_linear(sd, P(f"{B}.attn.proj")),
            },
            "cpe2": {"proj": _t2f_dwconv(sd, P(f"{B}.cpe2.proj"))},
            "norm2": t2f_ln(sd, P(f"{B}.norm2")),
            "mlp": {
                "fc1": t2f_linear(sd, P(f"{B}.mlp.fc1")),
                "fc2": t2f_linear(sd, P(f"{B}.mlp.fc2")),
            },
        }

    for si, depth in enumerate(depths):
        if si > 0:
            params[f"down{si}"] = {
                "norm": t2f_ln(sd, P(f"stages.{si}.downsample.norm")),
                "conv": t2f_conv(sd, P(f"stages.{si}.downsample.conv")),
            }
        for bi in range(depth):
            B = f"stages.{si}.blocks.{bi}"
            params[f"stage{si}_block{bi}_spatial"] = block(f"{B}.0")
            params[f"stage{si}_block{bi}_channel"] = block(f"{B}.1")
    return params


def _t2f_lin_any(sd: Dict, prefix: str) -> Dict:
    """Linear or 1x1-Conv2d weight -> flax Dense (timm metaformer ships both
    depending on the stage's tensor format)."""
    w = sd[f"{prefix}.weight"]
    if w.ndim == 4:
        w = w[:, :, 0, 0]
    out = {"kernel": np.ascontiguousarray(w.T)}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def import_caformer(
    sd: Dict[str, np.ndarray],
    depths: Sequence[int] = (3, 3, 9, 3),
    mixers: Sequence[str] = ("conv", "conv", "attention", "attention"),
    res_scale_stages: Sequence[bool] = (False, False, True, True),
    prefix: str = "",
) -> Dict:
    """timm MetaFormer/CAFormer (stem.{conv,norm}, stages.{i}.downsample.
    {norm,conv}, stages.{i}.blocks.{j}.{norm1,token_mixer.*,norm2,mlp.*,
    res_scale{1,2}.scale}, head.norm) -> skinjax caformer.CAFormer params.
    Block norms are bias-free (LayerNormNoBias); pwconv/mlp weights may be
    Linear or 1x1 Conv2d — both accepted. Matches the reference's generic
    timm loading (loadImageModelClassifier.py:117-121)."""
    P = lambda s: f"{prefix}{s}"
    ln_nb = lambda key: {"scale": sd[P(f"{key}.weight")]}
    star = lambda key: {"scale": sd[P(f"{key}.scale")].reshape(1),
                        "bias": sd[P(f"{key}.bias")].reshape(1)}
    params: Dict = {
        "stem_conv": t2f_conv(sd, P("stem.conv")),
        "stem_norm": ln_nb("stem.norm"),
        "head_norm": t2f_ln(sd, P("head.norm")),
    }
    for si, depth in enumerate(depths):
        if si > 0:
            params[f"down{si}_norm"] = ln_nb(f"stages.{si}.downsample.norm")
            params[f"down{si}_conv"] = t2f_conv(
                sd, P(f"stages.{si}.downsample.conv")
            )
        for bi in range(depth):
            B = f"stages.{si}.blocks.{bi}"
            if mixers[si] == "conv":
                mixer = {
                    "pwconv1": _t2f_lin_any(sd, P(f"{B}.token_mixer.pwconv1")),
                    "act1": star(f"{B}.token_mixer.act1"),
                    "dwconv": _t2f_dwconv(sd, P(f"{B}.token_mixer.dwconv")),
                    "pwconv2": _t2f_lin_any(sd, P(f"{B}.token_mixer.pwconv2")),
                }
            else:
                mixer = {
                    "qkv": _t2f_lin_any(sd, P(f"{B}.token_mixer.qkv")),
                    "proj": _t2f_lin_any(sd, P(f"{B}.token_mixer.proj")),
                }
            blk = {
                "norm1": ln_nb(f"{B}.norm1"),
                "token_mixer": mixer,
                "norm2": ln_nb(f"{B}.norm2"),
                "mlp": {
                    "fc1": _t2f_lin_any(sd, P(f"{B}.mlp.fc1")),
                    "act": star(f"{B}.mlp.act"),
                    "fc2": _t2f_lin_any(sd, P(f"{B}.mlp.fc2")),
                },
            }
            if res_scale_stages[si]:
                blk["res_scale1"] = sd[P(f"{B}.res_scale1.scale")]
                blk["res_scale2"] = sd[P(f"{B}.res_scale2.scale")]
            params[f"stage{si}_block{bi}"] = blk
    return params


def import_nextvit(
    sd: Dict[str, np.ndarray],
    depths: Sequence[int] = (3, 4, 10, 3),
    stage_channels=None,
    stage_types=None,
    prefix: str = "",
) -> Tuple[Dict, Dict]:
    """NextViT checkpoint -> skinjax nextvit.NextViT (params, batch_stats).
    Accepts both the official flat ``features.{k}`` outer layout and
    timm-style ``stages.{si}.{bi}``; inner module names follow the official
    repo (patch_embed/mhca/e_mhsa/projection/norm/mlp.conv{1,2}). Matches
    loadImageModelClassifier.py:115-150 (``nextvit_small``,
    reset_classifier(0) keeps the final BatchNorm)."""
    from skinjax.models.backbones.nextvit import nextvit_plan

    chans, types = nextvit_plan(depths)
    if stage_channels is not None:
        chans = [list(c) for c in stage_channels]
    if stage_types is not None:
        types = [list(t) for t in stage_types]

    P = lambda s: f"{prefix}{s}"
    params: Dict = {}
    stats: Dict = {}

    def put_bn(ptree, stree, name, src):
        bnp, bns = t2f_bn(sd, P(src))
        ptree[name], stree[name] = bnp, bns

    for i in range(4):
        params[f"stem{i}_conv"] = t2f_conv(sd, P(f"stem.{i}.conv"))
        put_bn(params, stats, f"stem{i}_norm", f"stem.{i}.norm")

    def patch_embed(base):
        p, s = {}, {}
        if P(f"{base}.conv.weight") in sd:
            p["conv"] = t2f_conv(sd, P(f"{base}.conv"))
            put_bn(p, s, "norm", f"{base}.norm")
        return p, s

    def mhca(base):
        p, s = {"group_conv3x3": t2f_conv(sd, P(f"{base}.group_conv3x3")),
                "projection": t2f_conv(sd, P(f"{base}.projection"))}, {}
        put_bn(p, s, "norm", f"{base}.norm")
        return p, s

    def mlp(base):
        return {"conv1": _t2f_lin_any(sd, P(f"{base}.conv1")),
                "conv2": _t2f_lin_any(sd, P(f"{base}.conv2"))}

    idx = 0
    for si, stage_ty in enumerate(types):
        for bi, ty in enumerate(stage_ty):
            base = None
            for cand in (f"features.{idx}", f"stages.{si}.{bi}"):
                if P(f"{cand}.mlp.conv1.weight") in sd:
                    base = cand
                    break
            if base is None:
                raise KeyError(f"nextvit block {idx} not found in state_dict")
            bp: Dict = {}
            bs: Dict = {}
            pe_p, pe_s = patch_embed(f"{base}.patch_embed")
            if pe_p:
                bp["patch_embed"], bs["patch_embed"] = pe_p, pe_s
            if ty == "ncb":
                bp["mhca"], bs["mhca"] = mhca(f"{base}.mhca")
                put_bn(bp, bs, "norm", f"{base}.norm")
            else:
                put_bn(bp, bs, "norm1", f"{base}.norm1")
                e: Dict = {}
                es: Dict = {}
                for nm in ("q", "k", "v", "proj"):
                    e[nm] = t2f_linear(sd, P(f"{base}.e_mhsa.{nm}"))
                if P(f"{base}.e_mhsa.norm.weight") in sd:
                    put_bn(e, es, "norm", f"{base}.e_mhsa.norm")
                bp["e_mhsa"], bs["e_mhsa"] = e, es
                pj_p, pj_s = patch_embed(f"{base}.projection")
                bp["projection"], bs["projection"] = pj_p, pj_s
                bp["mhca"], bs["mhca"] = mhca(f"{base}.mhca")
                put_bn(bp, bs, "norm2", f"{base}.norm2")
            bp["mlp"] = mlp(f"{base}.mlp")
            params[f"b{idx}"] = bp
            stats[f"b{idx}"] = {k: v for k, v in bs.items() if v}
            idx += 1

    put_bn(params, stats, "norm", "norm")
    return params, stats


def import_mvit(
    sd: Dict[str, np.ndarray],
    depths: Sequence[int] = (1, 2, 11, 2),
    prefix: str = "",
) -> Dict:
    """timm MViTv2 (patch_embed.proj, stages.{i}.blocks.{j}.{norm1,
    shortcut_proj_attn,attn.{qkv,pool_q,norm_q,pool_k,norm_k,pool_v,norm_v,
    rel_pos_h,rel_pos_w,proj},norm2,mlp.{fc1,fc2}}, norm) -> skinjax
    mvit.MViTv2 params. Matches loadImageModelClassifier.py:115-150
    (``mvitv2_small``, reset_classifier(0))."""
    P = lambda s: f"{prefix}{s}"
    params: Dict = {
        "patch_embed": t2f_conv(sd, P("patch_embed.proj")),
        "norm": t2f_ln(sd, P("norm")),
    }
    for si, depth in enumerate(depths):
        for bi in range(depth):
            B = f"stages.{si}.blocks.{bi}"
            attn = {
                "qkv": t2f_linear(sd, P(f"{B}.attn.qkv")),
                "proj": t2f_linear(sd, P(f"{B}.attn.proj")),
                "rel_pos_h": sd[P(f"{B}.attn.rel_pos_h")],
                "rel_pos_w": sd[P(f"{B}.attn.rel_pos_w")],
            }
            for t in ("q", "k", "v"):
                attn[f"pool_{t}"] = _t2f_dwconv(sd, P(f"{B}.attn.pool_{t}"))
                attn[f"norm_{t}"] = t2f_ln(sd, P(f"{B}.attn.norm_{t}"))
            blk = {
                "norm1": t2f_ln(sd, P(f"{B}.norm1")),
                "attn": attn,
                "norm2": t2f_ln(sd, P(f"{B}.norm2")),
                "mlp_fc1": t2f_linear(sd, P(f"{B}.mlp.fc1")),
                "mlp_fc2": t2f_linear(sd, P(f"{B}.mlp.fc2")),
            }
            if P(f"{B}.shortcut_proj_attn.weight") in sd:
                blk["shortcut_proj"] = t2f_linear(
                    sd, P(f"{B}.shortcut_proj_attn")
                )
            params[f"stage{si}_block{bi}"] = blk
    return params


def import_coat(
    sd: Dict[str, np.ndarray],
    depths: Sequence[int] = (3, 4, 6, 3),
    n_windows: int = 3,
    prefix: str = "",
) -> Dict:
    """timm CoaT-lite (patch_embed{k}.{proj,norm}, cls_token{k},
    cpe{k}.proj, crpe{k}.conv_list.{i}, serial_blocks{k}.{j}.{norm1,
    factoratt_crpe.{qkv,proj},norm2,mlp.{fc1,fc2}}, norm4) -> skinjax
    coat.CoaTLite params. Shared cpe/crpe are read from their model-level
    keys (the duplicated per-block references torch state_dicts also carry
    are ignored). Matches loadImageModelClassifier.py:115-150."""
    P = lambda s: f"{prefix}{s}"
    params: Dict = {"norm4": t2f_ln(sd, P("norm4"))}
    for si, depth in enumerate(depths):
        k = si + 1
        params[f"patch_embed{k}_proj"] = t2f_conv(sd, P(f"patch_embed{k}.proj"))
        params[f"patch_embed{k}_norm"] = t2f_ln(sd, P(f"patch_embed{k}.norm"))
        params[f"cls_token{k}"] = sd[P(f"cls_token{k}")]
        params[f"cpe{k}"] = {"proj": _t2f_dwconv(sd, P(f"cpe{k}.proj"))}
        params[f"crpe{k}"] = {
            f"conv{i}": _t2f_dwconv(sd, P(f"crpe{k}.conv_list.{i}"))
            for i in range(n_windows)
        }
        for bi in range(depth):
            B = f"serial_blocks{k}.{bi}"
            params[f"serial{k}_{bi}_norm1"] = t2f_ln(sd, P(f"{B}.norm1"))
            params[f"serial{k}_{bi}_qkv"] = t2f_linear(
                sd, P(f"{B}.factoratt_crpe.qkv")
            )
            params[f"serial{k}_{bi}_proj"] = t2f_linear(
                sd, P(f"{B}.factoratt_crpe.proj")
            )
            params[f"serial{k}_{bi}_norm2"] = t2f_ln(sd, P(f"{B}.norm2"))
            params[f"serial{k}_{bi}_fc1"] = t2f_linear(sd, P(f"{B}.mlp.fc1"))
            params[f"serial{k}_{bi}_fc2"] = t2f_linear(sd, P(f"{B}.mlp.fc2"))
    return params


def import_beit(sd: Dict[str, np.ndarray], depth: int, prefix: str = "") -> Dict:
    """timm BEiT/BEiT-v2 (patch_embed.proj, cls_token, blocks.{i}.{norm1,
    attn.{qkv.weight,q_bias,v_bias,proj,relative_position_bias_table},
    gamma_1,gamma_2,norm2,mlp.{fc1,fc2}}, fc_norm) -> skinjax beit.Beit.
    The relative_position_index buffers are recomputed statically; only the
    bias tables transfer. Matches loadImageModelClassifier.py:117-121
    (``beitv2_large_patch16_224``, reset_classifier(0) keeps fc_norm)."""
    P = lambda s: f"{prefix}{s}"
    params: Dict = {
        "patch_embed": {
            "kernel": np.ascontiguousarray(
                sd[P("patch_embed.proj.weight")].transpose(2, 3, 1, 0)
            ),
            "bias": sd[P("patch_embed.proj.bias")],
        },
        "cls_token": sd[P("cls_token")],
        "fc_norm": t2f_ln(sd, P("fc_norm")),
    }
    for i in range(depth):
        b = f"blocks.{i}"
        params[f"block{i}"] = {
            "norm1": t2f_ln(sd, P(f"{b}.norm1")),
            "attn": {
                "qkv_kernel": np.ascontiguousarray(
                    sd[P(f"{b}.attn.qkv.weight")].T
                ),
                "q_bias": sd[P(f"{b}.attn.q_bias")],
                "v_bias": sd[P(f"{b}.attn.v_bias")],
                "rel_bias_table": sd[
                    P(f"{b}.attn.relative_position_bias_table")
                ],
                "proj": t2f_linear(sd, P(f"{b}.attn.proj")),
            },
            "gamma_1": sd[P(f"{b}.gamma_1")],
            "gamma_2": sd[P(f"{b}.gamma_2")],
            "norm2": t2f_ln(sd, P(f"{b}.norm2")),
            "mlp_fc1": t2f_linear(sd, P(f"{b}.mlp.fc1")),
            "mlp_fc2": t2f_linear(sd, P(f"{b}.mlp.fc2")),
        }
    return params


def import_vgg16(sd: Dict[str, np.ndarray], prefix: str = "") -> Dict:
    """torchvision VGG16 (features.{0,2,5,7,10,12,14,17,19,21,24,26,28} convs,
    classifier.{0,3} kept after the reference strips classifier[-1],
    loadImageModelClassifier.py:78-82) -> skinjax cnn_zoo.VGG16 params."""
    conv_layers = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
    P = lambda s: f"{prefix}{s}"
    params: Dict = {}
    for i, li in enumerate(conv_layers):
        params[f"conv{i}"] = t2f_conv(sd, P(f"features.{li}"))
    params["fc1"] = t2f_linear(sd, P("classifier.0"))
    params["fc2"] = t2f_linear(sd, P("classifier.3"))
    return params


def import_vit(sd: Dict[str, np.ndarray], depth: int, dim: int,
               prefix: str = "") -> Dict:
    """timm ViT (patch_embed.proj, cls_token, pos_embed, blocks.N.{norm1,
    attn.qkv,attn.proj,norm2,mlp.fc1,mlp.fc2}, norm) -> skinjax vit.ViT."""
    P = lambda s: f"{prefix}{s}"
    params: Dict = {
        "patch_embed": {
            "kernel": np.ascontiguousarray(
                sd[P("patch_embed.proj.weight")].transpose(2, 3, 1, 0)
            ),
            "bias": sd[P("patch_embed.proj.bias")],
        },
        "cls_token": sd[P("cls_token")],
        "pos_embed": sd[P("pos_embed")],
        "norm": t2f_ln(sd, P("norm")),
    }
    for i in range(depth):
        b = f"blocks.{i}"
        qkv_w = sd[P(f"{b}.attn.qkv.weight")]
        qkv_b = sd[P(f"{b}.attn.qkv.bias")]
        mk = lambda W, bb: {"kernel": np.ascontiguousarray(W.T), "bias": bb}
        params[f"block{i}"] = {
            "norm1": t2f_ln(sd, P(f"{b}.norm1")),
            "attn": {
                "q_proj": mk(qkv_w[:dim], qkv_b[:dim]),
                "k_proj": mk(qkv_w[dim : 2 * dim], qkv_b[dim : 2 * dim]),
                "v_proj": mk(qkv_w[2 * dim :], qkv_b[2 * dim :]),
                "out_proj": t2f_linear(sd, P(f"{b}.attn.proj")),
            },
            "norm2": t2f_ln(sd, P(f"{b}.norm2")),
            "mlp_in": t2f_linear(sd, P(f"{b}.mlp.fc1")),
            "mlp_out": t2f_linear(sd, P(f"{b}.mlp.fc2")),
        }
    return params


# -- HF text encoders (torch layout) ------------------------------------------


def import_torch_bert(sd: Dict[str, np.ndarray], prefix: str = "") -> Dict:
    """HF torch ``BertModel`` state_dict -> ``NativeBertEncoder`` params (the
    HF-Flax-identical tree, models/text/bert.py). The reference saves the
    sentence tower at ``self.text_encoder``
    (multimodalIntraInterModal.py:66), so a full-checkpoint import passes
    ``prefix="text_encoder."``. The pooler (unused — the tower CLS-pools the
    last hidden state) and the ``position_ids`` buffer are skipped; depth is
    inferred from the keys."""
    P = lambda s: f"{prefix}{s}"
    emb = {
        "word_embeddings": {
            "embedding": sd[P("embeddings.word_embeddings.weight")]},
        "position_embeddings": {
            "embedding": sd[P("embeddings.position_embeddings.weight")]},
        "token_type_embeddings": {
            "embedding": sd[P("embeddings.token_type_embeddings.weight")]},
        "LayerNorm": t2f_ln(sd, P("embeddings.LayerNorm")),
    }
    depth = 0
    while P(f"encoder.layer.{depth}.attention.self.query.weight") in sd:
        depth += 1
    layers = {}
    for i in range(depth):
        b = P(f"encoder.layer.{i}")
        layers[str(i)] = {
            "attention": {
                "self": {
                    "query": t2f_linear(sd, f"{b}.attention.self.query"),
                    "key": t2f_linear(sd, f"{b}.attention.self.key"),
                    "value": t2f_linear(sd, f"{b}.attention.self.value"),
                },
                "output": {
                    "dense": t2f_linear(sd, f"{b}.attention.output.dense"),
                    "LayerNorm": t2f_ln(sd, f"{b}.attention.output.LayerNorm"),
                },
            },
            "intermediate": {
                "dense": t2f_linear(sd, f"{b}.intermediate.dense")},
            "output": {
                "dense": t2f_linear(sd, f"{b}.output.dense"),
                "LayerNorm": t2f_ln(sd, f"{b}.output.LayerNorm"),
            },
        }
    return {"embeddings": emb, "encoder": {"layer": layers}}


def import_torch_gpt2(sd: Dict[str, np.ndarray], prefix: str = "") -> Dict:
    """HF torch ``GPT2Model`` state_dict -> ``NativeGPT2Encoder`` params.

    torch Conv1D stores weights (in, out); the Flax tree stores kernels
    (out, in) (models/text/gpt2._Conv1D), so every Conv1D kernel transposes.
    The causal-mask buffers (``attn.bias``/``attn.masked_bias``) are
    skipped; depth is inferred from the keys."""
    P = lambda s: f"{prefix}{s}"

    def conv1d(name):
        out = {"kernel": np.ascontiguousarray(sd[f"{name}.weight"].T)}
        if f"{name}.bias" in sd:
            out["bias"] = sd[f"{name}.bias"]
        return out

    depth = 0
    while P(f"h.{depth}.ln_1.weight") in sd:
        depth += 1
    h = {}
    for i in range(depth):
        b = P(f"h.{i}")
        h[str(i)] = {
            "ln_1": t2f_ln(sd, f"{b}.ln_1"),
            "attn": {"c_attn": conv1d(f"{b}.attn.c_attn"),
                     "c_proj": conv1d(f"{b}.attn.c_proj")},
            "ln_2": t2f_ln(sd, f"{b}.ln_2"),
            "mlp": {"c_fc": conv1d(f"{b}.mlp.c_fc"),
                    "c_proj": conv1d(f"{b}.mlp.c_proj")},
        }
    return {
        "wte": {"embedding": sd[P("wte.weight")]},
        "wpe": {"embedding": sd[P("wpe.weight")]},
        "h": h,
        "ln_f": t2f_ln(sd, P("ln_f")),
    }


def import_text_encoder(sd: Dict[str, np.ndarray],
                        prefix: str = "text_encoder.") -> Tuple[Dict, str]:
    """Detect and import the HF text encoder inside a reference sentence-
    model checkpoint. Returns (encoder_params, scope_name) where scope_name
    is the ``NativeSentenceTower`` child scope ('bert'/'gpt2')."""
    if f"{prefix}wte.weight" in sd:
        return import_torch_gpt2(sd, prefix), "gpt2"
    if f"{prefix}embeddings.word_embeddings.weight" in sd:
        return import_torch_bert(sd, prefix), "bert"
    raise NotImplementedError(
        f"no recognizable HF text encoder under '{prefix}'")


def filter_to_template(tree: Dict, template: Dict) -> Dict:
    """Prune an imported tree to the keys a model actually initializes (the
    reference instantiates every fusion submodule but each mechanism only
    uses a subset; skinjax creates only the used ones)."""
    if not isinstance(template, dict):
        return tree
    return {
        k: filter_to_template(tree[k], template[k]) for k in template if k in tree
    }
