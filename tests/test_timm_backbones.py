"""timm-layout backbone importer parity tests.

Each test builds an inline torch oracle with the exact timm module/key layout
(the layout `timm.create_model(name, pretrained=True)` +
``reset_classifier(0)`` produces — the reference's generic loader,
loadImageModelClassifier.py:115-150), exports its state_dict, imports it with
the skinjax importer, and asserts output parity of the full forward
(including head norms / pooling). timm itself is not installed in this image;
the oracles re-derive the published architectures with timm's naming so real
checkpoints load unchanged the moment weights are available.
"""

import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# DaViT
# ---------------------------------------------------------------------------

class TConvPosEnc(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.proj = nn.Conv2d(dim, dim, 3, 1, 1, groups=dim)

    def forward(self, x):
        return x + self.proj(x)


class TDaViTMlp(nn.Module):
    def __init__(self, dim, ratio=4.0):
        super().__init__()
        self.fc1 = nn.Linear(dim, int(dim * ratio))
        self.fc2 = nn.Linear(int(dim * ratio), dim)

    def forward(self, x):
        return self.fc2(torch.nn.functional.gelu(self.fc1(x)))


class TDaViTWindowAttention(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):  # (nB, N, C)
        nB, N, C = x.shape
        h, hd = self.heads, C // self.heads
        qkv = self.qkv(x).reshape(nB, N, 3, h, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * hd ** -0.5) @ k.transpose(-2, -1)
        attn = attn.softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(nB, N, C)
        return self.proj(out)


class TDaViTChannelAttention(nn.Module):
    """timm davit ChannelAttention math: k-scaled, (hd, hd) attention."""

    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):  # (B, N, C)
        B, N, C = x.shape
        h, hd = self.heads, C // self.heads
        qkv = self.qkv(x).reshape(B, N, 3, h, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        k = k * hd ** -0.5
        attn = k.transpose(-1, -2) @ v        # (B, h, hd, hd)
        attn = attn.softmax(-1)
        x = (attn @ q.transpose(-1, -2)).transpose(-1, -2)
        x = x.transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


def _t_window_partition(x, w):  # (B, H, W, C) -> (nB, w*w, C)
    B, H, W, C = x.shape
    x = x.view(B, H // w, w, W // w, w, C).permute(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, w * w, C)


def _t_window_reverse(x, w, H, W):
    B = x.shape[0] // ((H // w) * (W // w))
    x = x.view(B, H // w, W // w, w, w, -1).permute(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, -1)


class TSpatialBlock(nn.Module):
    def __init__(self, dim, heads, window):
        super().__init__()
        self.window = window
        self.cpe1 = TConvPosEnc(dim)
        self.norm1 = nn.LayerNorm(dim)
        self.attn = TDaViTWindowAttention(dim, heads)
        self.cpe2 = TConvPosEnc(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = TDaViTMlp(dim)

    def forward(self, x):  # NCHW
        B, C, H, W = x.shape
        x = self.cpe1(x)
        t = x.permute(0, 2, 3, 1)  # NHWC
        y = self.norm1(t)
        y = _t_window_partition(y, self.window)
        y = self.attn(y)
        y = _t_window_reverse(y, self.window, H, W)
        t = t + y
        x = self.cpe2(t.permute(0, 3, 1, 2))
        t = x.permute(0, 2, 3, 1)
        t = t + self.mlp(self.norm2(t))
        return t.permute(0, 3, 1, 2)


class TChannelBlock(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.cpe1 = TConvPosEnc(dim)
        self.norm1 = nn.LayerNorm(dim)
        self.attn = TDaViTChannelAttention(dim, heads)
        self.cpe2 = TConvPosEnc(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = TDaViTMlp(dim)

    def forward(self, x):  # NCHW
        B, C, H, W = x.shape
        x = self.cpe1(x)
        t = x.flatten(2).transpose(1, 2)  # (B, N, C)
        t = t + self.attn(self.norm1(t))
        x = self.cpe2(t.transpose(1, 2).reshape(B, C, H, W))
        t = x.permute(0, 2, 3, 1)
        t = t + self.mlp(self.norm2(t))
        return t.permute(0, 3, 1, 2)


class TDaViTDownsample(nn.Module):
    def __init__(self, in_dim, out_dim):
        super().__init__()
        self.norm = nn.LayerNorm(in_dim)
        self.conv = nn.Conv2d(in_dim, out_dim, 2, 2)

    def forward(self, x):  # NCHW
        t = self.norm(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        return self.conv(t)


class TDaViT(nn.Module):
    """timm davit key layout: stem.{conv,norm}, stages.{i}.downsample,
    stages.{i}.blocks.{j}.{0,1}, head.norm (fc stripped)."""

    def __init__(self, dims, depths, heads, window=7):
        super().__init__()
        stem = nn.Module()
        stem.conv = nn.Conv2d(3, dims[0], 7, 4, 3)
        stem.norm = nn.LayerNorm(dims[0])
        self.stem = stem
        stages = []
        for si, (dim, depth, h) in enumerate(zip(dims, depths, heads)):
            stage = nn.Module()
            stage.downsample = (
                TDaViTDownsample(dims[si - 1], dim) if si > 0 else nn.Identity()
            )
            stage.blocks = nn.ModuleList([
                nn.Sequential(TSpatialBlock(dim, h, window), TChannelBlock(dim, h))
                for _ in range(depth)
            ])
            stages.append(stage)
        self.stages = nn.ModuleList(stages)
        head = nn.Module()
        head.norm = nn.LayerNorm(dims[-1])
        self.head = head

    def forward(self, x):
        x = self.stem.conv(x)
        x = self.stem.norm(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        for stage in self.stages:
            if not isinstance(stage.downsample, nn.Identity):
                x = stage.downsample(x)
            for blk in stage.blocks:
                x = blk(x)
        x = x.mean(dim=(2, 3))
        return self.head.norm(x)


# ---------------------------------------------------------------------------
# CAFormer (timm metaformer layout)
# ---------------------------------------------------------------------------

class TStarReLU(nn.Module):
    def __init__(self):
        super().__init__()
        self.scale = nn.Parameter(torch.ones(1))
        self.bias = nn.Parameter(torch.zeros(1))

    def forward(self, x):
        r = torch.relu(x)
        return self.scale * r * r + self.bias


class TLayerNormNoBias(nn.Module):
    """LN over channel dim (last), weight only, eps 1e-6."""

    def __init__(self, dim):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))

    def forward(self, x):  # channels-last
        mu = x.mean(-1, keepdim=True)
        var = x.var(-1, unbiased=False, keepdim=True)
        return (x - mu) / torch.sqrt(var + 1e-6) * self.weight


class TSepConv(nn.Module):
    def __init__(self, dim):
        super().__init__()
        mid = 2 * dim
        self.pwconv1 = nn.Linear(dim, mid, bias=False)
        self.act1 = TStarReLU()
        self.dwconv = nn.Conv2d(mid, mid, 7, padding=3, groups=mid, bias=False)
        self.pwconv2 = nn.Linear(mid, dim, bias=False)

    def forward(self, x):  # channels-last (B,H,W,C)
        y = self.act1(self.pwconv1(x))
        y = self.dwconv(y.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
        return self.pwconv2(y)


class TMetaAttention(nn.Module):
    def __init__(self, dim, head_dim=32):
        super().__init__()
        self.heads = max(1, dim // head_dim)
        self.hd = head_dim
        att = self.heads * head_dim
        self.qkv = nn.Linear(dim, 3 * att, bias=False)
        self.proj = nn.Linear(att, dim, bias=False)

    def forward(self, x):  # (B,H,W,C)
        B, H, W, C = x.shape
        t = x.reshape(B, H * W, C)
        qkv = self.qkv(t).reshape(B, -1, 3, self.heads, self.hd)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = ((q * self.hd ** -0.5) @ k.transpose(-2, -1)).softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(B, H * W, -1)
        return self.proj(out).reshape(B, H, W, C)


class TScale(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.scale = nn.Parameter(torch.ones(dim))

    def forward(self, x):
        return x * self.scale


class TMetaFormerBlock(nn.Module):
    def __init__(self, dim, mixer, res_scale):
        super().__init__()
        self.norm1 = TLayerNormNoBias(dim)
        self.token_mixer = TSepConv(dim) if mixer == "conv" else TMetaAttention(dim)
        self.norm2 = TLayerNormNoBias(dim)
        mlp = nn.Module()
        mlp.fc1 = nn.Linear(dim, 4 * dim, bias=False)
        mlp.act = TStarReLU()
        mlp.fc2 = nn.Linear(4 * dim, dim, bias=False)
        self.mlp = mlp
        self.res_scale1 = TScale(dim) if res_scale else nn.Identity()
        self.res_scale2 = TScale(dim) if res_scale else nn.Identity()

    def forward(self, x):  # channels-last
        x = self.res_scale1(x) + self.token_mixer(self.norm1(x))
        y = self.mlp.fc2(self.mlp.act(self.mlp.fc1(self.norm2(x))))
        return self.res_scale2(x) + y


class TCAFormer(nn.Module):
    def __init__(self, dims, depths, mixers, res_stages):
        super().__init__()
        stem = nn.Module()
        stem.conv = nn.Conv2d(3, dims[0], 7, 4, 2)
        stem.norm = TLayerNormNoBias(dims[0])
        self.stem = stem
        stages = []
        for si, (dim, depth, mixer, rs) in enumerate(
            zip(dims, depths, mixers, res_stages)
        ):
            stage = nn.Module()
            if si > 0:
                down = nn.Module()
                down.norm = TLayerNormNoBias(dims[si - 1])
                down.conv = nn.Conv2d(dims[si - 1], dim, 3, 2, 1)
                stage.downsample = down
            else:
                stage.downsample = nn.Identity()
            stage.blocks = nn.ModuleList(
                [TMetaFormerBlock(dim, mixer, rs) for _ in range(depth)]
            )
            stages.append(stage)
        self.stages = nn.ModuleList(stages)
        head = nn.Module()
        head.norm = nn.LayerNorm(dims[-1], eps=1e-6)
        self.head = head

    def forward(self, x):  # NCHW in, channels-last internally
        x = self.stem.conv(x).permute(0, 2, 3, 1)
        x = self.stem.norm(x)
        for stage in self.stages:
            if not isinstance(stage.downsample, nn.Identity):
                x = stage.downsample.norm(x)
                x = stage.downsample.conv(x.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
            for blk in stage.blocks:
                x = blk(x)
        x = x.mean(dim=(1, 2))
        return self.head.norm(x)


def test_caformer_import_matches_torch():
    from skinjax.models.backbones.caformer import CAFormer
    from skinjax.models.torch_import import import_caformer

    DIMS, DEPTHS = (16, 32), (1, 2)
    MIXERS, RS = ("conv", "attention"), (False, True)
    torch.manual_seed(7)
    tm = TCAFormer(DIMS, DEPTHS, MIXERS, RS).eval()
    # perturb StarReLU + res_scale params so they transfer nontrivially
    with torch.no_grad():
        for name, p in tm.named_parameters():
            if "act" in name or "res_scale" in name:
                p.add_(torch.randn_like(p) * 0.3)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = import_caformer(sd, DEPTHS, MIXERS, RS)

    fm = CAFormer(dims=DIMS, depths=DEPTHS, mixers=MIXERS, res_scale_stages=RS)
    x = np.random.default_rng(7).normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    out = fm.apply({"params": params}, jnp.asarray(x))
    assert out.shape == ref.shape == (2, 32)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=5e-4)


def test_caformer_import_accepts_conv1x1_pwconvs():
    """timm ships conv-stage pwconv/mlp weights as 1x1 Conv2d in some
    versions — the importer must accept (out,in,1,1) weights too."""
    from skinjax.models.torch_import import _t2f_lin_any

    w = np.arange(12, dtype=np.float32).reshape(3, 4)
    sd = {"m.weight": w[:, :, None, None], "m.bias": np.zeros(3, np.float32)}
    got = _t2f_lin_any(sd, "m")
    np.testing.assert_allclose(got["kernel"], w.T)


# ---------------------------------------------------------------------------
# BEiT-v2
# ---------------------------------------------------------------------------

class TBeitAttention(nn.Module):
    def __init__(self, dim, heads, grid):
        super().__init__()
        self.heads = heads
        self.qkv = nn.Linear(dim, 3 * dim, bias=False)
        self.q_bias = nn.Parameter(torch.randn(dim) * 0.02)
        self.v_bias = nn.Parameter(torch.randn(dim) * 0.02)
        self.register_buffer("k_bias", torch.zeros(dim), persistent=False)
        gh, gw = grid
        self.relative_position_bias_table = nn.Parameter(
            torch.randn((2 * gh - 1) * (2 * gw - 1) + 3, heads) * 0.02
        )
        from skinjax.models.backbones.beit import beit_relative_position_index

        self.register_buffer(
            "rpi", torch.tensor(beit_relative_position_index(gh, gw)),
            persistent=False,
        )
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        B, N, C = x.shape
        h, hd = self.heads, C // self.heads
        bias = torch.cat((self.q_bias, self.k_bias, self.v_bias))
        qkv = torch.nn.functional.linear(x, self.qkv.weight, bias)
        qkv = qkv.reshape(B, N, 3, h, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * hd ** -0.5) @ k.transpose(-2, -1)
        attn = attn + self.relative_position_bias_table[self.rpi].permute(
            2, 0, 1
        )[None]
        attn = attn.softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(out)


class TBeitBlock(nn.Module):
    def __init__(self, dim, heads, grid):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = TBeitAttention(dim, heads, grid)
        self.gamma_1 = nn.Parameter(torch.full((dim,), 1e-5))
        self.gamma_2 = nn.Parameter(torch.full((dim,), 1e-5))
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        mlp = nn.Module()
        mlp.fc1 = nn.Linear(dim, 4 * dim)
        mlp.fc2 = nn.Linear(4 * dim, dim)
        self.mlp = mlp

    def forward(self, x):
        x = x + self.gamma_1 * self.attn(self.norm1(x))
        y = self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(self.norm2(x))))
        return x + self.gamma_2 * y


class TBeit(nn.Module):
    def __init__(self, dim, depth, heads, patch, img):
        super().__init__()
        pe = nn.Module()
        pe.proj = nn.Conv2d(3, dim, patch, patch)
        self.patch_embed = pe
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        grid = (img // patch, img // patch)
        self.blocks = nn.ModuleList(
            [TBeitBlock(dim, heads, grid) for _ in range(depth)]
        )
        self.fc_norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(x.shape[0], -1, -1), x], 1)
        for blk in self.blocks:
            x = blk(x)
        return self.fc_norm(x[:, 1:].mean(1))


def test_beit_import_matches_torch():
    from skinjax.models.backbones.beit import Beit
    from skinjax.models.torch_import import import_beit

    DIM, DEPTH, HEADS, PATCH, IMG = 32, 2, 4, 8, 48
    torch.manual_seed(5)
    tm = TBeit(DIM, DEPTH, HEADS, PATCH, IMG).eval()
    # mess with gammas so layer scale actually transfers something nontrivial
    with torch.no_grad():
        for blk in tm.blocks:
            blk.gamma_1.mul_(torch.randn_like(blk.gamma_1) * 10)
            blk.gamma_2.mul_(torch.randn_like(blk.gamma_2) * 10)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = import_beit(sd, DEPTH)

    fm = Beit(dim=DIM, depth=DEPTH, num_heads=HEADS, patch=PATCH)
    x = np.random.default_rng(5).normal(size=(2, IMG, IMG, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    out = fm.apply({"params": params}, jnp.asarray(x))
    assert out.shape == ref.shape == (2, DIM)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=5e-4)


# ---------------------------------------------------------------------------
# NextViT (official layout)
# ---------------------------------------------------------------------------

class TNextPatchEmbed(nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.stride, self.has = stride, stride == 2 or cin != cout
        if self.has:
            self.conv = nn.Conv2d(cin, cout, 1, bias=False)
            self.norm = nn.BatchNorm2d(cout, eps=1e-5)

    def forward(self, x):
        if self.stride == 2:
            x = torch.nn.functional.avg_pool2d(x, 2, 2)
        if self.has:
            x = self.norm(self.conv(x))
        return x


class TMHCA(nn.Module):
    def __init__(self, dim, head_dim):
        super().__init__()
        self.group_conv3x3 = nn.Conv2d(dim, dim, 3, 1, 1,
                                       groups=dim // head_dim, bias=False)
        self.norm = nn.BatchNorm2d(dim, eps=1e-5)
        self.projection = nn.Conv2d(dim, dim, 1, bias=False)

    def forward(self, x):
        return self.projection(torch.relu(self.norm(self.group_conv3x3(x))))


class TNextMlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.conv1 = nn.Conv2d(dim, hidden, 1)
        self.conv2 = nn.Conv2d(hidden, dim, 1)

    def forward(self, x):
        return self.conv2(torch.relu(self.conv1(x)))


class TEMHSA(nn.Module):
    def __init__(self, dim, head_dim, sr_ratio):
        super().__init__()
        self.heads, self.hd, self.sr = dim // head_dim, head_dim, sr_ratio
        self.q = nn.Linear(dim, dim)
        self.k = nn.Linear(dim, dim)
        self.v = nn.Linear(dim, dim)
        self.proj = nn.Linear(dim, dim)
        if sr_ratio > 1:
            self.norm = nn.BatchNorm1d(dim, eps=1e-5)

    def forward(self, x):  # (B, N, C)
        B, N, C = x.shape
        q = self.q(x).reshape(B, N, self.heads, self.hd).permute(0, 2, 1, 3)
        kv = x
        if self.sr > 1:
            k_pool = self.sr ** 2
            kv = torch.nn.functional.avg_pool1d(
                x.transpose(1, 2), k_pool, k_pool
            )
            kv = self.norm(kv).transpose(1, 2)
        M = kv.shape[1]
        k = self.k(kv).reshape(B, M, self.heads, self.hd).permute(0, 2, 1, 3)
        v = self.v(kv).reshape(B, M, self.heads, self.hd).permute(0, 2, 1, 3)
        attn = ((q @ k.transpose(-2, -1)) * self.hd ** -0.5).softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(out)


class TNCB(nn.Module):
    def __init__(self, cin, cout, stride, head_dim, div):
        super().__init__()
        self.patch_embed = TNextPatchEmbed(cin, cout, stride)
        self.mhca = TMHCA(cout, head_dim)
        self.norm = nn.BatchNorm2d(cout, eps=1e-5)
        from skinjax.models.backbones.nextvit import make_divisible

        self.mlp = TNextMlp(cout, make_divisible(cout * 3, div))

    def forward(self, x):
        x = self.patch_embed(x)
        x = x + self.mhca(x)
        return x + self.mlp(self.norm(x))


class TNTB(nn.Module):
    def __init__(self, cin, cout, stride, sr, head_dim, div):
        super().__init__()
        from skinjax.models.backbones.nextvit import make_divisible

        mhsa_ch = make_divisible(int(cout * 0.75), div)
        mhca_ch = cout - mhsa_ch
        self.patch_embed = TNextPatchEmbed(cin, mhsa_ch, stride)
        self.norm1 = nn.BatchNorm2d(mhsa_ch, eps=1e-5)
        self.e_mhsa = TEMHSA(mhsa_ch, head_dim, sr)
        self.projection = TNextPatchEmbed(mhsa_ch, mhca_ch, 1)
        self.mhca = TMHCA(mhca_ch, head_dim)
        self.norm2 = nn.BatchNorm2d(cout, eps=1e-5)
        self.mlp = TNextMlp(cout, make_divisible(cout * 2, div))

    def forward(self, x):
        x = self.patch_embed(x)
        B, C, H, W = x.shape
        y = self.norm1(x).flatten(2).transpose(1, 2)
        y = self.e_mhsa(y)
        x = x + y.transpose(1, 2).reshape(B, C, H, W)
        out = self.projection(x)
        out = out + self.mhca(out)
        x = torch.cat([x, out], dim=1)
        return x + self.mlp(self.norm2(x))


class TNextViT(nn.Module):
    """Official nextvit layout: stem.{i}.{conv,norm}, flat features.{k},
    final norm."""

    def __init__(self, stem_chs, chans, types, srs, head_dim, div):
        super().__init__()
        stem = []
        prev = 3
        for ch, s in [(stem_chs[0], 2), (stem_chs[1], 1), (stem_chs[2], 1),
                      (stem_chs[2], 2)]:
            m = nn.Module()
            m.conv = nn.Conv2d(prev, ch, 3, s, 1, bias=False)
            m.norm = nn.BatchNorm2d(ch, eps=1e-5)
            stem.append(m)
            prev = ch
        self.stem = nn.ModuleList(stem)
        feats = []
        for si, (cs, ts) in enumerate(zip(chans, types)):
            for bi, (c, t) in enumerate(zip(cs, ts)):
                stride = 2 if (bi == 0 and si > 0) else 1
                if t == "ncb":
                    feats.append(TNCB(prev, c, stride, head_dim, div))
                else:
                    feats.append(TNTB(prev, c, stride, srs[si], head_dim, div))
                prev = c
        self.features = nn.ModuleList(feats)
        self.norm = nn.BatchNorm2d(prev, eps=1e-5)

    def forward(self, x):
        for m in self.stem:
            x = torch.relu(m.norm(m.conv(x)))
        for blk in self.features:
            x = blk(x)
        return self.norm(x).mean(dim=(2, 3))


def test_nextvit_import_matches_torch():
    from skinjax.models.backbones.nextvit import NextViT
    from skinjax.models.torch_import import import_nextvit

    STEM = (16, 8, 16)
    CHANS = [[16, 16], [32, 48]]
    TYPES = [["ncb", "ncb"], ["ncb", "ntb"]]
    SRS = (2, 2)
    HD, DIV = 8, 8
    torch.manual_seed(19)
    tm = TNextViT(STEM, CHANS, TYPES, SRS, HD, DIV).eval()
    # randomize BN running stats so eval-mode stats transfer is exercised
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, (nn.BatchNorm2d, nn.BatchNorm1d)):
                m.running_mean.add_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.mul_(
                    (1 + torch.rand_like(m.running_var)).clamp(0.5, 2.0)
                )
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()
          if "num_batches" not in k}
    params, stats = import_nextvit(sd, stage_channels=CHANS, stage_types=TYPES)

    fm = NextViT(stem_chs=STEM, sr_ratios=SRS, head_dim=HD, div=DIV,
                 stage_channels=CHANS, stage_types=TYPES)
    x = np.random.default_rng(19).normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    out = fm.apply({"params": params, "batch_stats": stats}, jnp.asarray(x))
    assert out.shape == ref.shape == (2, 48)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=5e-4)


def test_nextvit_small_feature_dim_is_1024():
    """nextvit_small ends at 1024 channels (official stage plan), not 768."""
    from skinjax.models.backbones.nextvit import nextvit_plan

    chans, types = nextvit_plan((3, 4, 10, 3))
    assert chans[-1][-1] == 1024
    assert [t[-1] for t in types] == ["ncb", "ntb", "ntb", "ntb"]
    assert sum(len(c) for c in chans) == 20


# ---------------------------------------------------------------------------
# MViTv2
# ---------------------------------------------------------------------------

class TMViTAttention(nn.Module):
    def __init__(self, dim_in, dim_out, heads, stride_q, stride_kv, feat):
        super().__init__()
        self.heads, self.dim_out = heads, dim_out
        self.hd = dim_out // heads
        self.feat = feat
        self.qkv = nn.Linear(dim_in, 3 * dim_out)
        self.pool_q = nn.Conv2d(self.hd, self.hd, 3, stride_q, 1,
                                groups=self.hd, bias=False)
        self.norm_q = nn.LayerNorm(self.hd, eps=1e-6)
        self.pool_k = nn.Conv2d(self.hd, self.hd, 3, stride_kv, 1,
                                groups=self.hd, bias=False)
        self.norm_k = nn.LayerNorm(self.hd, eps=1e-6)
        self.pool_v = nn.Conv2d(self.hd, self.hd, 3, stride_kv, 1,
                                groups=self.hd, bias=False)
        self.norm_v = nn.LayerNorm(self.hd, eps=1e-6)
        q_size = feat[0] // stride_q
        kv_size = feat[0] // stride_kv
        rel_dim = 2 * max(q_size, kv_size) - 1
        self.rel_pos_h = nn.Parameter(torch.randn(rel_dim, self.hd) * 0.05)
        self.rel_pos_w = nn.Parameter(torch.randn(rel_dim, self.hd) * 0.05)
        self.proj = nn.Linear(dim_out, dim_out)

    def _pool(self, t, pool, norm, B):
        H, W = self.feat
        # (B, h, N, hd) -> (B*h, hd, H, W)
        m = t.transpose(2, 3).reshape(B * self.heads, self.hd, H, W)
        m = pool(m)
        Hs, Ws = m.shape[2:]
        m = m.reshape(B, self.heads, self.hd, Hs * Ws).transpose(2, 3)
        return norm(m), (Hs, Ws)

    def forward(self, x):
        from skinjax.models.backbones.mvit import _rel_pos_dists

        B, N, _ = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.heads, self.hd)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        q, q_size = self._pool(q, self.pool_q, self.norm_q, B)
        k, k_size = self._pool(k, self.pool_k, self.norm_k, B)
        v, _ = self._pool(v, self.pool_v, self.norm_v, B)
        attn = (q * self.hd ** -0.5) @ k.transpose(-2, -1)
        Rh = self.rel_pos_h[torch.tensor(_rel_pos_dists(q_size[0], k_size[0]))]
        Rw = self.rel_pos_w[torch.tensor(_rel_pos_dists(q_size[1], k_size[1]))]
        r_q = q.reshape(B, self.heads, q_size[0], q_size[1], self.hd)
        rel_h = torch.einsum("byhwc,hkc->byhwk", r_q, Rh)
        rel_w = torch.einsum("byhwc,wkc->byhwk", r_q, Rw)
        attn = attn.view(B, self.heads, *q_size, *k_size)
        attn = attn + rel_h[..., :, None] + rel_w[..., None, :]
        attn = attn.view(B, self.heads, q_size[0] * q_size[1],
                         k_size[0] * k_size[1]).softmax(-1)
        out = attn @ v + q  # residual pooling
        out = out.transpose(1, 2).reshape(B, -1, self.dim_out)
        return self.proj(out), q_size


class TMViTBlock(nn.Module):
    def __init__(self, dim_in, dim_out, heads, stride_q, stride_kv, feat):
        super().__init__()
        self.feat, self.stride_q, self.dim_out = feat, stride_q, dim_out
        self.norm1 = nn.LayerNorm(dim_in, eps=1e-6)
        if dim_in != dim_out:
            self.shortcut_proj_attn = nn.Linear(dim_in, dim_out)
        else:
            self.shortcut_proj_attn = None
        self.attn = TMViTAttention(dim_in, dim_out, heads, stride_q,
                                   stride_kv, feat)
        self.norm2 = nn.LayerNorm(dim_out, eps=1e-6)
        mlp = nn.Module()
        mlp.fc1 = nn.Linear(dim_out, 4 * dim_out)
        mlp.fc2 = nn.Linear(4 * dim_out, dim_out)
        self.mlp = mlp

    def forward(self, x):
        B, N, _ = x.shape
        H, W = self.feat
        y = self.norm1(x)
        shortcut = x if self.shortcut_proj_attn is None \
            else self.shortcut_proj_attn(y)
        if self.stride_q > 1:
            m = shortcut.transpose(1, 2).reshape(B, self.dim_out, H, W)
            m = torch.nn.functional.max_pool2d(m, 3, self.stride_q, 1)
            shortcut = m.reshape(B, self.dim_out, -1).transpose(1, 2)
        y, q_size = self.attn(y)
        x = shortcut + y
        y = self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(self.norm2(x))))
        return x + y, q_size


class TMViTv2(nn.Module):
    def __init__(self, dims, depths, heads, img):
        super().__init__()
        pe = nn.Module()
        pe.proj = nn.Conv2d(3, dims[0], 7, 4, 3)
        self.patch_embed = pe
        feat = (img // 4, img // 4)
        dim_in = dims[0]
        kv_stride = 4
        stages = []
        for si, (dim, depth, h) in enumerate(zip(dims, depths, heads)):
            ssq = 2 if si > 0 else 1
            if ssq > 1:
                kv_stride = max(kv_stride // ssq, 1)
            stage = nn.Module()
            blocks = []
            for bi in range(depth):
                sq = ssq if bi == 0 else 1
                blocks.append(TMViTBlock(dim_in, dim, h, sq, kv_stride, feat))
                feat = (feat[0] // sq, feat[1] // sq)
                dim_in = dim
            stage.blocks = nn.ModuleList(blocks)
            stages.append(stage)
        self.stages = nn.ModuleList(stages)
        self.norm = nn.LayerNorm(dims[-1], eps=1e-6)

    def forward(self, x):
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        for stage in self.stages:
            for blk in stage.blocks:
                x, _ = blk(x)
        return self.norm(x).mean(1)


def test_mvitv2_import_matches_torch():
    from skinjax.models.backbones.mvit import MViTv2
    from skinjax.models.torch_import import import_mvit

    DIMS, DEPTHS, HEADS, IMG = (16, 32), (1, 2), (2, 4), 32
    torch.manual_seed(17)
    tm = TMViTv2(DIMS, DEPTHS, HEADS, IMG).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = import_mvit(sd, DEPTHS)

    fm = MViTv2(dims=DIMS, depths=DEPTHS, heads=HEADS)
    x = np.random.default_rng(17).normal(size=(2, IMG, IMG, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    out = fm.apply({"params": params}, jnp.asarray(x))
    assert out.shape == ref.shape == (2, 32)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=5e-4)


# ---------------------------------------------------------------------------
# CoaT-lite
# ---------------------------------------------------------------------------

class TCoaTConvPosEnc(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.proj = nn.Conv2d(dim, dim, 3, 1, 1, groups=dim)

    def forward(self, x, size):
        H, W = size
        B, N, C = x.shape
        cls, img = x[:, :1], x[:, 1:]
        feat = img.transpose(1, 2).view(B, C, H, W)
        feat = self.proj(feat) + feat
        feat = feat.flatten(2).transpose(1, 2)
        return torch.cat((cls, feat), dim=1)


class TCoaTConvRelPosEnc(nn.Module):
    def __init__(self, ch, heads, window):
        super().__init__()
        self.ch = ch
        self.conv_list = nn.ModuleList()
        self.head_splits = []
        for w, h_split in window:
            self.conv_list.append(
                nn.Conv2d(h_split * ch, h_split * ch, w, padding=w // 2,
                          groups=h_split * ch)
            )
            self.head_splits.append(h_split)
        self.channel_splits = [h * ch for h in self.head_splits]

    def forward(self, q, v, size):
        H, W = size
        B, h, N, Ch = q.shape
        q_img, v_img = q[:, :, 1:], v[:, :, 1:]
        v_map = v_img.transpose(2, 3).reshape(B, h * Ch, H, W)
        segs = torch.split(v_map, self.channel_splits, dim=1)
        conv_v = torch.cat(
            [conv(s) for conv, s in zip(self.conv_list, segs)], dim=1
        )
        conv_v = conv_v.reshape(B, h, Ch, H * W).transpose(2, 3)
        ev = q_img * conv_v
        zero = torch.zeros((B, h, 1, Ch), dtype=q.dtype)
        return torch.cat((zero, ev), dim=2)


class TFactorAtt(nn.Module):
    def __init__(self, dim, heads, crpe):
        super().__init__()
        self.heads = heads
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)
        self.crpe = crpe

    def forward(self, x, size):
        B, N, C = x.shape
        h, Ch = self.heads, C // self.heads
        qkv = self.qkv(x).reshape(B, N, 3, h, Ch).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        k_soft = k.softmax(dim=2)
        factor = k_soft.transpose(-1, -2) @ v
        fa = q @ factor
        out = Ch ** -0.5 * fa + self.crpe(q, v, size)
        out = out.transpose(1, 2).reshape(B, N, C)
        return self.proj(out)


class TCoaTSerialBlock(nn.Module):
    def __init__(self, dim, heads, ratio, cpe, crpe):
        super().__init__()
        self.cpe = cpe  # shared (duplicated in state_dict; importer ignores)
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.factoratt_crpe = TFactorAtt(dim, heads, crpe)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        mlp = nn.Module()
        mlp.fc1 = nn.Linear(dim, int(dim * ratio))
        mlp.fc2 = nn.Linear(int(dim * ratio), dim)
        self.mlp = mlp

    def forward(self, x, size):
        x = self.cpe(x, size)
        x = x + self.factoratt_crpe(self.norm1(x), size)
        y = self.mlp.fc2(
            torch.nn.functional.gelu(self.mlp.fc1(self.norm2(x)))
        )
        return x + y


class TCoaTLite(nn.Module):
    def __init__(self, dims, depths, heads, ratios, window):
        super().__init__()
        self.dims, self.depths, self.heads = dims, depths, heads
        prev = 3
        for si, dim in enumerate(dims):
            k = si + 1
            pe = nn.Module()
            pe.proj = nn.Conv2d(prev, dim, 4 if si == 0 else 2,
                                4 if si == 0 else 2)
            pe.norm = nn.LayerNorm(dim, eps=1e-6)
            setattr(self, f"patch_embed{k}", pe)
            setattr(self, f"cls_token{k}",
                    nn.Parameter(torch.randn(1, 1, dim) * 0.02))
            cpe = TCoaTConvPosEnc(dim)
            crpe = TCoaTConvRelPosEnc(dim // heads, heads, window)
            setattr(self, f"cpe{k}", cpe)
            setattr(self, f"crpe{k}", crpe)
            setattr(self, f"serial_blocks{k}", nn.ModuleList([
                TCoaTSerialBlock(dim, heads, ratios[si], cpe, crpe)
                for _ in range(depths[si])
            ]))
            prev = dim
        self.norm4 = nn.LayerNorm(dims[-1], eps=1e-6)

    def forward(self, x):
        B = x.shape[0]
        for si, dim in enumerate(self.dims):
            k = si + 1
            pe = getattr(self, f"patch_embed{k}")
            x = pe.proj(x)
            H, W = x.shape[2:]
            x = pe.norm(x.flatten(2).transpose(1, 2))
            cls = getattr(self, f"cls_token{k}").expand(B, -1, -1)
            x = torch.cat((cls, x), dim=1)
            for blk in getattr(self, f"serial_blocks{k}"):
                x = blk(x, (H, W))
            if si < len(self.dims) - 1:
                x = x[:, 1:].transpose(1, 2).reshape(B, dim, H, W)
        x = self.norm4(x)
        return x[:, 0]


def test_coat_import_matches_torch():
    from skinjax.models.backbones.coat import CoaTLite
    from skinjax.models.torch_import import import_coat

    DIMS, DEPTHS, HEADS = (8, 16), (1, 2), 4
    RATIOS = (2.0, 2.0)
    WINDOW = ((3, 1), (5, 3))  # head splits sum to HEADS
    torch.manual_seed(13)
    tm = TCoaTLite(DIMS, DEPTHS, HEADS, RATIOS, WINDOW).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = import_coat(sd, DEPTHS, n_windows=len(WINDOW))

    fm = CoaTLite(dims=DIMS, depths=DEPTHS, heads=HEADS, mlp_ratios=RATIOS,
                  crpe_windows=WINDOW)
    x = np.random.default_rng(13).normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    out = fm.apply({"params": params}, jnp.asarray(x))
    assert out.shape == ref.shape == (2, 16)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=5e-4)


def test_davit_import_matches_torch():
    from skinjax.models.backbones.davit import DaViT
    from skinjax.models.torch_import import import_davit

    DIMS, DEPTHS, HEADS = (16, 32), (1, 2), (2, 4)
    torch.manual_seed(3)
    tm = TDaViT(DIMS, DEPTHS, HEADS).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = import_davit(sd, DEPTHS)

    fm = DaViT(dims=DIMS, depths=DEPTHS, heads=HEADS, window=7)
    x = np.random.default_rng(3).normal(size=(2, 56, 56, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    out = fm.apply({"params": params}, jnp.asarray(x))
    assert out.shape == ref.shape == (2, 32)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=5e-4)


def test_davit_einsum_window_attention_parity():
    """SKINJAX_WINATTN=einsum path == partition path (same param tree)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from skinjax.models.backbones.davit import DaViT

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 224, 224, 3)), jnp.float32)
    a = DaViT(dims=(16, 32, 64, 128), heads=(2, 2, 2, 2),
              fused_attn=False, einsum_attn=False)
    b = DaViT(dims=(16, 32, 64, 128), heads=(2, 2, 2, 2),
              fused_attn=False, einsum_attn=True)
    p = a.init(jax.random.key(0), x)
    np.testing.assert_allclose(
        np.asarray(b.apply(p, x)), np.asarray(a.apply(p, x)),
        atol=3e-5, rtol=3e-5)
