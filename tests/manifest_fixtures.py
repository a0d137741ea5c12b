"""State-dict KEY+SHAPE manifests of the published checkpoint artifacts.

VERDICT r2 missing #2: every importer parity test builds its torch oracle
from the same mental model the importer encodes — if that model drifts from
the real timm/torchvision artifact layout, oracle and importer share the
mistake. These manifests are written from the PUBLIC state_dict metadata of
the published checkpoints (torchvision model zoo .pth files after library
load, timm hub safetensors) — key names and tensor shapes only — and are
deliberately independent of ``skinjax.models.torch_import`` and of the
test oracles: nothing here imports from skinjax.

Each ``manifest_*`` returns ``(manifest, unconsumed)``:

* ``manifest``: key -> shape for every tensor in the published artifact;
* ``unconsumed``: the subset an importer legitimately skips — classifier
  heads (the reference loads backbones with ``reset_classifier(0)`` /
  strips ``classifier[-1]``, loadImageModelClassifier.py:78-150), BN
  ``num_batches_tracked`` counters, and persistent index buffers that are
  recomputed statically.

tests/test_state_dict_manifests.py asserts each importer consumes EXACTLY
``manifest - unconsumed`` (no missing keys, no unconsumed leftovers) and
that the imported tree's shapes match the flax module's init template.
"""

from __future__ import annotations

import math
from typing import Dict, Set, Tuple

Manifest = Dict[str, Tuple[int, ...]]


def _bn(m: Manifest, u: Set[str], key: str, c: int) -> None:
    m[f"{key}.weight"] = (c,)
    m[f"{key}.bias"] = (c,)
    m[f"{key}.running_mean"] = (c,)
    m[f"{key}.running_var"] = (c,)
    m[f"{key}.num_batches_tracked"] = ()
    u.add(f"{key}.num_batches_tracked")


def _ln(m: Manifest, key: str, c: int) -> None:
    m[f"{key}.weight"] = (c,)
    m[f"{key}.bias"] = (c,)


def _conv(m: Manifest, key: str, cout: int, cin: int, k: int,
          bias: bool = False) -> None:
    m[f"{key}.weight"] = (cout, cin, k, k)
    if bias:
        m[f"{key}.bias"] = (cout,)


def _linear(m: Manifest, key: str, cout: int, cin: int,
            bias: bool = True) -> None:
    m[f"{key}.weight"] = (cout, cin)
    if bias:
        m[f"{key}.bias"] = (cout,)


# -- torchvision CNNs ---------------------------------------------------------


def manifest_resnet(depth: int = 50) -> Tuple[Manifest, Set[str]]:
    """torchvision resnet18/resnet50 (IMAGENET1K_V1 .pth layout)."""
    m: Manifest = {}
    u: Set[str] = set()
    _conv(m, "conv1", 64, 3, 7)  # no bias
    _bn(m, u, "bn1", 64)
    widths = (64, 128, 256, 512)
    if depth == 18:
        blocks, expansion, n_convs = (2, 2, 2, 2), 1, 2
    else:
        blocks, expansion, n_convs = (3, 4, 6, 3), 4, 3
    cin = 64
    for li, (w, nb) in enumerate(zip(widths, blocks), start=1):
        for bi in range(nb):
            pre = f"layer{li}.{bi}"
            if n_convs == 2:  # BasicBlock
                _conv(m, f"{pre}.conv1", w, cin if bi == 0 else w, 3)
                _bn(m, u, f"{pre}.bn1", w)
                _conv(m, f"{pre}.conv2", w, w, 3)
                _bn(m, u, f"{pre}.bn2", w)
                out = w
            else:  # Bottleneck
                inb = cin if bi == 0 else w * expansion
                _conv(m, f"{pre}.conv1", w, inb, 1)
                _bn(m, u, f"{pre}.bn1", w)
                _conv(m, f"{pre}.conv2", w, w, 3)
                _bn(m, u, f"{pre}.bn2", w)
                _conv(m, f"{pre}.conv3", w * expansion, w, 1)
                _bn(m, u, f"{pre}.bn3", w * expansion)
                out = w * expansion
            if bi == 0 and (cin != out or li > 1 or expansion > 1):
                _conv(m, f"{pre}.downsample.0", out, cin, 1)
                _bn(m, u, f"{pre}.downsample.1", out)
        cin = out
    _linear(m, "fc", 1000, cin)
    u |= {"fc.weight", "fc.bias"}
    return m, u


def manifest_vgg16() -> Tuple[Manifest, Set[str]]:
    """torchvision vgg16 (features conv indices of the D configuration)."""
    m: Manifest = {}
    u: Set[str] = set()
    chans = (64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512)
    idxs = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
    cin = 3
    for i, c in zip(idxs, chans):
        _conv(m, f"features.{i}", c, cin, 3, bias=True)
        cin = c
    _linear(m, "classifier.0", 4096, 512 * 7 * 7)
    _linear(m, "classifier.3", 4096, 4096)
    _linear(m, "classifier.6", 1000, 4096)
    # reference keeps classifier[0]/[3], strips only classifier[-1]
    # (loadImageModelClassifier.py:78-82)
    u |= {"classifier.6.weight", "classifier.6.bias"}
    return m, u


def _densenet_features(m: Manifest, u: Set[str], prefix: str,
                       block_config=(6, 12, 32, 32), growth: int = 32,
                       init_ch: int = 64) -> int:
    """Keys of torchvision densenet .features (modern naming, i.e. after
    torchvision's regex remap of the legacy 'norm.1' checkpoint keys —
    what model.state_dict() and the reference's saved models contain)."""
    _conv(m, f"{prefix}conv0", init_ch, 3, 7)
    _bn(m, u, f"{prefix}norm0", init_ch)
    c = init_ch
    for bi, n_layers in enumerate(block_config, start=1):
        for li in range(1, n_layers + 1):
            cin = c + growth * (li - 1)
            pre = f"{prefix}denseblock{bi}.denselayer{li}"
            _bn(m, u, f"{pre}.norm1", cin)
            _conv(m, f"{pre}.conv1", 4 * growth, cin, 1)
            _bn(m, u, f"{pre}.norm2", 4 * growth)
            _conv(m, f"{pre}.conv2", growth, 4 * growth, 3)
        c = c + growth * n_layers
        if bi != len(block_config):
            _bn(m, u, f"{prefix}transition{bi}.norm", c)
            _conv(m, f"{prefix}transition{bi}.conv", c // 2, c, 1)
            c //= 2
    _bn(m, u, f"{prefix}norm5", c)
    return c


def manifest_densenet169() -> Tuple[Manifest, Set[str]]:
    m: Manifest = {}
    u: Set[str] = set()
    c = _densenet_features(m, u, "features.")
    assert c == 1664
    _linear(m, "classifier", 1000, c)
    u |= {"classifier.weight", "classifier.bias"}
    return m, u


MOBILENET_V2_CFG = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2),
                    (6, 64, 4, 2), (6, 96, 3, 1), (6, 160, 3, 2),
                    (6, 320, 1, 1))


def manifest_mobilenet_v2() -> Tuple[Manifest, Set[str]]:
    """torchvision mobilenet_v2: features.0 ConvBNReLU stem, features.1-17
    InvertedResidual (expand_ratio-1 block drops the expand stage and shifts
    the conv indices), features.18 head ConvBNReLU."""
    m: Manifest = {}
    u: Set[str] = set()
    _conv(m, "features.0.0", 32, 3, 3)
    _bn(m, u, "features.0.1", 32)
    cin = 32
    fi = 1
    for t, c, n, s in MOBILENET_V2_CFG:
        for _ in range(n):
            hid = cin * t
            if t != 1:
                _conv(m, f"features.{fi}.conv.0.0", hid, cin, 1)
                _bn(m, u, f"features.{fi}.conv.0.1", hid)
                m[f"features.{fi}.conv.1.0.weight"] = (hid, 1, 3, 3)
                _bn(m, u, f"features.{fi}.conv.1.1", hid)
                _conv(m, f"features.{fi}.conv.2", c, hid, 1)
                _bn(m, u, f"features.{fi}.conv.3", c)
            else:
                m[f"features.{fi}.conv.0.0.weight"] = (hid, 1, 3, 3)
                _bn(m, u, f"features.{fi}.conv.0.1", hid)
                _conv(m, f"features.{fi}.conv.1", c, hid, 1)
                _bn(m, u, f"features.{fi}.conv.2", c)
            cin = c
            fi += 1
    _conv(m, f"features.{fi}.0", 1280, cin, 1)
    _bn(m, u, f"features.{fi}.1", 1280)
    _linear(m, "classifier.1", 1000, 1280)
    u |= {"classifier.1.weight", "classifier.1.bias"}
    return m, u


EFFNET_BASE = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 40, 2, 2), (6, 80, 3, 2),
               (6, 112, 3, 1), (6, 192, 4, 2), (6, 320, 1, 1))
EFFNET_KERNELS = (3, 3, 5, 3, 5, 5, 3)


def _divisible8(v: float) -> int:
    """torchvision _make_divisible(v, 8)."""
    new_v = max(8, int(v + 4) // 8 * 8)
    if new_v < 0.9 * v:
        new_v += 8
    return new_v


def manifest_efficientnet(width: float = 1.0, depth: float = 1.0
                          ) -> Tuple[Manifest, Set[str]]:
    """torchvision efficientnet_b0/b7: features.0 stem, features.{s}.{b}
    MBConv (optional expand Conv2dNormActivation + dw + SqueezeExcitation
    fc1/fc2 1x1 convs + project), features.8 head. SE squeeze channels =
    max(1, block_input // 4) computed on the width-scaled input."""
    m: Manifest = {}
    u: Set[str] = set()
    stem = _divisible8(32 * width)
    _conv(m, "features.0.0", stem, 3, 3)
    _bn(m, u, "features.0.1", stem)
    cin = stem
    for si, ((t, c, n, s), k) in enumerate(
            zip(EFFNET_BASE, EFFNET_KERNELS), start=1):
        c = _divisible8(c * width)
        n = int(math.ceil(n * depth))
        for b in range(n):
            B = f"features.{si}.{b}.block"
            hid = cin * t
            sq = max(1, cin // 4)
            if t != 1:
                _conv(m, f"{B}.0.0", hid, cin, 1)
                _bn(m, u, f"{B}.0.1", hid)
                dw, se, pj = f"{B}.1", f"{B}.2", f"{B}.3"
            else:
                dw, se, pj = f"{B}.0", f"{B}.1", f"{B}.2"
            m[f"{dw}.0.weight"] = (hid, 1, k, k)
            _bn(m, u, f"{dw}.1", hid)
            m[f"{se}.fc1.weight"] = (sq, hid, 1, 1)
            m[f"{se}.fc1.bias"] = (sq,)
            m[f"{se}.fc2.weight"] = (hid, sq, 1, 1)
            m[f"{se}.fc2.bias"] = (hid,)
            _conv(m, f"{pj}.0", c, hid, 1)
            _bn(m, u, f"{pj}.1", c)
            cin = c
    head = 4 * cin
    _conv(m, f"features.{len(EFFNET_BASE) + 1}.0", head, cin, 1)
    _bn(m, u, f"features.{len(EFFNET_BASE) + 1}.1", head)
    _linear(m, "classifier.1", 1000, head)
    u |= {"classifier.1.weight", "classifier.1.bias"}
    return m, u


def manifest_mdnet(meta_dim: int = 85, hidden: int = 128,
                   num_classes: int = 6) -> Tuple[Manifest, Set[str]]:
    """Reference MDNet checkpoint (multimodalMDNet.py:59-81): densenet169
    .features re-assigned as ``feature_extractor`` (no 'features.' infix),
    MetaNet 1x1 convs, MetaBlock Linear+LayerNorm pairs, classifier."""
    m: Manifest = {}
    u: Set[str] = set()
    ch = _densenet_features(m, u, "feature_extractor.")
    m["meta_net.metanet.0.weight"] = (hidden, meta_dim, 1, 1)
    m["meta_net.metanet.0.bias"] = (hidden,)
    m["meta_net.metanet.2.weight"] = (ch, hidden, 1, 1)
    m["meta_net.metanet.2.bias"] = (ch,)
    _linear(m, "meta_block.fb.0", ch, meta_dim)
    _ln(m, "meta_block.fb.1", ch)
    _linear(m, "meta_block.gb.0", ch, meta_dim)
    _ln(m, "meta_block.gb.1", ch)
    _linear(m, "classifier", num_classes, ch)
    return m, u


# -- timm transformer backbones ----------------------------------------------


def manifest_swin_tiny() -> Tuple[Manifest, Set[str]]:
    """timm swin_tiny_patch4_window7_224 (hub safetensors layout, timm>=0.9:
    downsample lives at the START of stages 1-3). relative_position_index /
    attn_mask are non-persistent buffers — absent from the artifact."""
    m: Manifest = {}
    u: Set[str] = set()
    dims = (96, 192, 384, 768)
    depths = (2, 2, 6, 2)
    heads = (3, 6, 12, 24)
    m["patch_embed.proj.weight"] = (96, 3, 4, 4)
    m["patch_embed.proj.bias"] = (96,)
    _ln(m, "patch_embed.norm", 96)
    for si, (c, d, h) in enumerate(zip(dims, depths, heads)):
        if si > 0:
            cp = dims[si - 1]
            _ln(m, f"layers.{si}.downsample.norm", 4 * cp)
            _linear(m, f"layers.{si}.downsample.reduction", 2 * cp, 4 * cp,
                    bias=False)
        for bi in range(d):
            B = f"layers.{si}.blocks.{bi}"
            _ln(m, f"{B}.norm1", c)
            m[f"{B}.attn.relative_position_bias_table"] = (169, h)
            _linear(m, f"{B}.attn.qkv", 3 * c, c)
            _linear(m, f"{B}.attn.proj", c, c)
            _ln(m, f"{B}.norm2", c)
            _linear(m, f"{B}.mlp.fc1", 4 * c, c)
            _linear(m, f"{B}.mlp.fc2", c, 4 * c)
    _ln(m, "norm", 768)
    _linear(m, "head.fc", 1000, 768)
    u |= {"head.fc.weight", "head.fc.bias"}
    return m, u


def manifest_davit_tiny() -> Tuple[Manifest, Set[str]]:
    """timm davit_tiny (hub safetensors: stem conv+LayerNorm2d, stages with
    norm->conv 2x2 downsample, (SpatialBlock, ChannelBlock) pairs with
    ConvPosEnc depthwise convs, NormMlpClassifierHead head.norm + head.fc)."""
    m: Manifest = {}
    u: Set[str] = set()
    dims = (96, 192, 384, 768)
    depths = (1, 1, 3, 1)
    m["stem.conv.weight"] = (96, 3, 7, 7)
    m["stem.conv.bias"] = (96,)
    _ln(m, "stem.norm", 96)

    def block(B: str, c: int) -> None:
        for cpe in ("cpe1", "cpe2"):
            m[f"{B}.{cpe}.proj.weight"] = (c, 1, 3, 3)
            m[f"{B}.{cpe}.proj.bias"] = (c,)
        _ln(m, f"{B}.norm1", c)
        _linear(m, f"{B}.attn.qkv", 3 * c, c)
        _linear(m, f"{B}.attn.proj", c, c)
        _ln(m, f"{B}.norm2", c)
        _linear(m, f"{B}.mlp.fc1", 4 * c, c)
        _linear(m, f"{B}.mlp.fc2", c, 4 * c)

    for si, (c, d) in enumerate(zip(dims, depths)):
        if si > 0:
            _ln(m, f"stages.{si}.downsample.norm", dims[si - 1])
            m[f"stages.{si}.downsample.conv.weight"] = (c, dims[si - 1], 2, 2)
            m[f"stages.{si}.downsample.conv.bias"] = (c,)
        for bi in range(d):
            block(f"stages.{si}.blocks.{bi}.0", c)
            block(f"stages.{si}.blocks.{bi}.1", c)
    _ln(m, "head.norm", 768)
    _linear(m, "head.fc", 1000, 768)
    u |= {"head.fc.weight", "head.fc.bias"}
    return m, u


def manifest_caformer(dims=(64, 128, 320, 512), depths=(3, 3, 9, 3)
                      ) -> Tuple[Manifest, Set[str]]:
    """timm caformer_s18/b36 (MetaFormer): LayerNormNoBias block norms (the
    *NoBias norms carry only .weight), SepConv token mixers in stages 1-2
    (bias-free pwconv/dwconv + StarReLU scale/bias), head_dim-32 attention
    in stages 3-4 (bias-free qkv/proj), bias-free MLP with StarReLU, Scale
    res_scale1/2 in stages 3-4, Sequential head (norm + fc)."""
    m: Manifest = {}
    u: Set[str] = set()
    m["stem.conv.weight"] = (dims[0], 3, 7, 7)
    m["stem.conv.bias"] = (dims[0],)
    m["stem.norm.weight"] = (dims[0],)
    for si, (c, d) in enumerate(zip(dims, depths)):
        if si > 0:
            m[f"stages.{si}.downsample.norm.weight"] = (dims[si - 1],)
            m[f"stages.{si}.downsample.conv.weight"] = (c, dims[si - 1], 3, 3)
            m[f"stages.{si}.downsample.conv.bias"] = (c,)
        for bi in range(d):
            B = f"stages.{si}.blocks.{bi}"
            m[f"{B}.norm1.weight"] = (c,)
            if si < 2:  # SepConv mixer
                mid = 2 * c
                m[f"{B}.token_mixer.pwconv1.weight"] = (mid, c)
                m[f"{B}.token_mixer.act1.scale"] = (1,)
                m[f"{B}.token_mixer.act1.bias"] = (1,)
                m[f"{B}.token_mixer.dwconv.weight"] = (mid, 1, 7, 7)
                m[f"{B}.token_mixer.pwconv2.weight"] = (c, mid)
            else:  # Attention mixer (head_dim 32)
                m[f"{B}.token_mixer.qkv.weight"] = (3 * c, c)
                m[f"{B}.token_mixer.proj.weight"] = (c, c)
            m[f"{B}.norm2.weight"] = (c,)
            m[f"{B}.mlp.fc1.weight"] = (4 * c, c)
            m[f"{B}.mlp.act.scale"] = (1,)
            m[f"{B}.mlp.act.bias"] = (1,)
            m[f"{B}.mlp.fc2.weight"] = (c, 4 * c)
            if si >= 2:
                m[f"{B}.res_scale1.scale"] = (c,)
                m[f"{B}.res_scale2.scale"] = (c,)
    _ln(m, "head.norm", dims[-1])
    _linear(m, "head.fc", 1000, dims[-1])
    u |= {"head.fc.weight", "head.fc.bias"}
    return m, u


def manifest_beitv2_large() -> Tuple[Manifest, Set[str]]:
    """timm beitv2_large_patch16_224: qkv bias-free with separate
    q_bias/v_bias Parameters (k_bias is a non-persistent zeros buffer),
    per-block relative_position_bias_table (+ persistent index buffer),
    gamma_1/gamma_2 layer scale, fc_norm (avg-pool head, no final 'norm')."""
    m: Manifest = {}
    u: Set[str] = set()
    D, depth, heads = 1024, 24, 16
    m["patch_embed.proj.weight"] = (D, 3, 16, 16)
    m["patch_embed.proj.bias"] = (D,)
    m["cls_token"] = (1, 1, D)
    table = (2 * 14 - 1) ** 2 + 3  # 732: 27x27 relative offsets + 3 specials
    for i in range(depth):
        B = f"blocks.{i}"
        _ln(m, f"{B}.norm1", D)
        m[f"{B}.attn.qkv.weight"] = (3 * D, D)
        m[f"{B}.attn.q_bias"] = (D,)
        m[f"{B}.attn.v_bias"] = (D,)
        m[f"{B}.attn.relative_position_bias_table"] = (table, heads)
        m[f"{B}.attn.relative_position_index"] = (197, 197)
        u.add(f"{B}.attn.relative_position_index")  # recomputed statically
        _linear(m, f"{B}.attn.proj", D, D)
        m[f"{B}.gamma_1"] = (D,)
        m[f"{B}.gamma_2"] = (D,)
        _ln(m, f"{B}.norm2", D)
        _linear(m, f"{B}.mlp.fc1", 4 * D, D)
        _linear(m, f"{B}.mlp.fc2", D, 4 * D)
    _ln(m, "fc_norm", D)
    _linear(m, "head", 1000, D)
    u |= {"head.weight", "head.bias"}
    return m, u


def manifest_vit_large() -> Tuple[Manifest, Set[str]]:
    """timm vit_large_patch16_224."""
    m: Manifest = {}
    u: Set[str] = set()
    D, depth = 1024, 24
    m["patch_embed.proj.weight"] = (D, 3, 16, 16)
    m["patch_embed.proj.bias"] = (D,)
    m["cls_token"] = (1, 1, D)
    m["pos_embed"] = (1, 197, D)
    for i in range(depth):
        B = f"blocks.{i}"
        _ln(m, f"{B}.norm1", D)
        _linear(m, f"{B}.attn.qkv", 3 * D, D)
        _linear(m, f"{B}.attn.proj", D, D)
        _ln(m, f"{B}.norm2", D)
        _linear(m, f"{B}.mlp.fc1", 4 * D, D)
        _linear(m, f"{B}.mlp.fc2", D, 4 * D)
    _ln(m, "norm", D)
    _linear(m, "head", 1000, D)
    u |= {"head.weight", "head.bias"}
    return m, u


def manifest_coat_lite_small() -> Tuple[Manifest, Set[str]]:
    """timm coat_lite_small: per-stage patch_embed/cls_token/shared cpe+crpe
    (crpe conv_list split 2/3/3 heads over kernels 3/5/7 at head_dim
    C/8), serial blocks with factoratt_crpe qkv/proj (qkv_bias=True),
    final norm4 only (lite variants classify from the stage-4 cls token)."""
    m: Manifest = {}
    u: Set[str] = set()
    dims = (64, 128, 320, 512)
    depths = (3, 4, 6, 3)
    mlp_ratios = (8, 8, 4, 4)
    heads = 8
    splits = (2, 3, 3)
    kernels = (3, 5, 7)
    cin = 3
    for si, (c, d) in enumerate(zip(dims, depths)):
        k = si + 1
        patch = 4 if si == 0 else 2
        m[f"patch_embed{k}.proj.weight"] = (c, cin, patch, patch)
        m[f"patch_embed{k}.proj.bias"] = (c,)
        _ln(m, f"patch_embed{k}.norm", c)
        m[f"cls_token{k}"] = (1, 1, c)
        m[f"cpe{k}.proj.weight"] = (c, 1, 3, 3)
        m[f"cpe{k}.proj.bias"] = (c,)
        hd = c // heads
        for wi, (ker, hs) in enumerate(zip(kernels, splits)):
            m[f"crpe{k}.conv_list.{wi}.weight"] = (hs * hd, 1, ker, ker)
            m[f"crpe{k}.conv_list.{wi}.bias"] = (hs * hd,)
        for bi in range(d):
            B = f"serial_blocks{k}.{bi}"
            _ln(m, f"{B}.norm1", c)
            _linear(m, f"{B}.factoratt_crpe.qkv", 3 * c, c)
            _linear(m, f"{B}.factoratt_crpe.proj", c, c)
            _ln(m, f"{B}.norm2", c)
            hidden = mlp_ratios[si] * c
            _linear(m, f"{B}.mlp.fc1", hidden, c)
            _linear(m, f"{B}.mlp.fc2", c, hidden)
        cin = c
    _ln(m, "norm4", dims[-1])
    _linear(m, "head", 1000, dims[-1])
    u |= {"head.weight", "head.bias"}
    return m, u


def manifest_mvitv2_small() -> Tuple[Manifest, Set[str]]:
    """timm mvitv2_small: expand_attn qkv (3*dim_out, dim_in), per-head
    depthwise pool convs at constant dim_conv = dim_out//heads = 96 with
    LayerNorms, decomposed rel_pos_h/w sized 2*max(q,kv)-1 per block, and a
    shortcut_proj_attn Linear at every dim transition. Block q/kv sizes are
    simulated with the model's stride plan (stride_q 2 at stage starts,
    adaptive kv stride 4->2->1->1) at 224 input."""
    m: Manifest = {}
    u: Set[str] = set()
    dims = (96, 192, 384, 768)
    depths = (1, 2, 11, 2)
    m["patch_embed.proj.weight"] = (96, 3, 7, 7)
    m["patch_embed.proj.bias"] = (96,)
    feat = 56
    dim_in = 96
    kv_stride = 4
    for si, (dim, depth) in enumerate(zip(dims, depths)):
        if si > 0:
            kv_stride = max(kv_stride // 2, 1)
        for bi in range(depth):
            B = f"stages.{si}.blocks.{bi}"
            sq = 2 if (si > 0 and bi == 0) else 1
            q_size = feat // sq
            k_size = max(feat // kv_stride, 1)
            rel_dim = 2 * max(q_size, k_size) - 1
            hd = 96  # dim_out // num_heads is 96 at every stage
            _ln(m, f"{B}.norm1", dim_in)
            _linear(m, f"{B}.attn.qkv", 3 * dim, dim_in)
            _linear(m, f"{B}.attn.proj", dim, dim)
            for t in ("q", "k", "v"):
                m[f"{B}.attn.pool_{t}.weight"] = (hd, 1, 3, 3)
                _ln(m, f"{B}.attn.norm_{t}", hd)
            m[f"{B}.attn.rel_pos_h"] = (rel_dim, hd)
            m[f"{B}.attn.rel_pos_w"] = (rel_dim, hd)
            if dim_in != dim:
                _linear(m, f"{B}.shortcut_proj_attn", dim, dim_in)
            _ln(m, f"{B}.norm2", dim)
            _linear(m, f"{B}.mlp.fc1", 4 * dim, dim)
            _linear(m, f"{B}.mlp.fc2", dim, 4 * dim)
            feat = q_size
            dim_in = dim
    _ln(m, "norm", 768)
    _linear(m, "head.fc", 1000, 768)
    u |= {"head.fc.weight", "head.fc.bias"}
    return m, u


def _nextvit_divisible(v: float, divisor: int = 32) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def manifest_nextvit_small() -> Tuple[Manifest, Set[str]]:
    """Official-layout nextvit_small (features.{k} flat blocks, 4-conv stem,
    NCB/NTB inner names; timm's checkpoint filter preserves them)."""
    m: Manifest = {}
    u: Set[str] = set()
    depths = (3, 4, 10, 3)
    chans = [
        [96] * 3,
        [192] * 3 + [256],
        ([384] * 4 + [512]) * 2,
        [768] * 2 + [1024],
    ]
    types = [
        ["ncb"] * 3,
        ["ncb"] * 3 + ["ntb"],
        (["ncb"] * 4 + ["ntb"]) * 2,
        ["ncb"] * 2 + ["ntb"],
    ]
    sr_ratios = (8, 4, 2, 1)
    stem_plan = ((64, 3), (32, 64), (64, 32), (64, 64))
    for i, (c, cin) in enumerate(stem_plan):
        _conv(m, f"stem.{i}.conv", c, cin, 3)
        _bn(m, u, f"stem.{i}.norm", c)

    def patch_embed(base: str, cout: int, cin: int, strided: bool) -> None:
        if strided or cin != cout:
            _conv(m, f"{base}.conv", cout, cin, 1)
            _bn(m, u, f"{base}.norm", cout)

    def mhca(base: str, c: int) -> None:
        # grouped 3x3: groups = C/32 -> torch weight (C, 32, 3, 3)
        m[f"{base}.group_conv3x3.weight"] = (c, 32, 3, 3)
        _bn(m, u, f"{base}.norm", c)
        _conv(m, f"{base}.projection", c, c, 1)

    def mlp(base: str, c: int, hidden: int) -> None:
        m[f"{base}.conv1.weight"] = (hidden, c, 1, 1)
        m[f"{base}.conv1.bias"] = (hidden,)
        m[f"{base}.conv2.weight"] = (c, hidden, 1, 1)
        m[f"{base}.conv2.bias"] = (c,)

    cin = 64
    idx = 0
    for si in range(4):
        for bi, (c, ty) in enumerate(zip(chans[si], types[si])):
            base = f"features.{idx}"
            strided = bi == 0 and si > 0
            if ty == "ncb":
                patch_embed(f"{base}.patch_embed", c, cin, strided)
                mhca(f"{base}.mhca", c)
                _bn(m, u, f"{base}.norm", c)
                mlp(f"{base}.mlp", c, _nextvit_divisible(c * 3))
            else:
                mhsa_ch = _nextvit_divisible(int(c * 0.75))
                mhca_ch = c - mhsa_ch
                patch_embed(f"{base}.patch_embed", mhsa_ch, cin, strided)
                _bn(m, u, f"{base}.norm1", mhsa_ch)
                for nm in ("q", "k", "v", "proj"):
                    _linear(m, f"{base}.e_mhsa.{nm}", mhsa_ch, mhsa_ch)
                if sr_ratios[si] > 1:
                    _bn(m, u, f"{base}.e_mhsa.norm", mhsa_ch)
                patch_embed(f"{base}.projection", mhca_ch, mhsa_ch, False)
                mhca(f"{base}.mhca", mhca_ch)
                _bn(m, u, f"{base}.norm2", c)
                mlp(f"{base}.mlp", c, _nextvit_divisible(c * 2))
            cin = c
            idx += 1
    _bn(m, u, "norm", 1024)
    _linear(m, "head.fc", 1000, 1024)
    u |= {"head.fc.weight", "head.fc.bias"}
    return m, u
