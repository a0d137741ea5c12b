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
