"""timm-layout Swin importer parity vs an inline torch oracle (windowed
attention with relative position bias, shifted windows + masks, timm
PatchMerging)."""

import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from skinjax.models.backbones.transformer_zoo import Swin, _swin_attn_mask
from skinjax.models.torch_import import import_swin

DIMS, DEPTHS, HEADS, WIN = (16, 32), (1, 2), (2, 4), 7


class TWindowAttention(nn.Module):
    def __init__(self, dim, heads, window):
        super().__init__()
        self.heads, self.window = heads, window
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)
        self.relative_position_bias_table = nn.Parameter(
            torch.randn((2 * window - 1) ** 2, heads) * 0.02
        )
        coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                      indexing="ij")).reshape(2, -1)
        rel = coords[:, :, None] - coords[:, None, :]
        idx = (rel[0] + window - 1) * (2 * window - 1) + (rel[1] + window - 1)
        self.register_buffer("rpi", torch.tensor(idx, dtype=torch.long))

    def forward(self, x, mask=None):
        nB, N, C = x.shape
        h, hd = self.heads, C // self.heads
        qkv = self.qkv(x).reshape(nB, N, 3, h, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) / hd**0.5
        bias = self.relative_position_bias_table[self.rpi].permute(2, 0, 1)
        attn = attn + bias[None]
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.view(nB // nW, nW, h, N, N) + mask[None, :, None]
            attn = attn.view(nB, h, N, N)
        attn = attn.softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(nB, N, C)
        return self.proj(out)


class TMlp(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.fc1 = nn.Linear(dim, 4 * dim)
        self.fc2 = nn.Linear(4 * dim, dim)

    def forward(self, x):
        return self.fc2(torch.nn.functional.gelu(self.fc1(x)))


def _part(x, w):
    B, H, W, C = x.shape
    x = x.view(B, H // w, w, W // w, w, C).permute(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, w * w, C)


def _rev(x, w, H, W):
    B = x.shape[0] // ((H // w) * (W // w))
    x = x.view(B, H // w, W // w, w, w, -1).permute(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, -1)


class TSwinBlock(nn.Module):
    def __init__(self, dim, heads, window, shift):
        super().__init__()
        self.window, self.shift = window, shift
        self.norm1 = nn.LayerNorm(dim)
        self.attn = TWindowAttention(dim, heads, window)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = TMlp(dim)

    def forward(self, x):
        B, H, W, C = x.shape
        shift = self.shift if (H > self.window or W > self.window) else 0
        y = self.norm1(x)
        mask = None
        if shift > 0:
            y = torch.roll(y, (-shift, -shift), dims=(1, 2))
            mask = torch.tensor(_swin_attn_mask(H, W, self.window, shift))
        y = _part(y, self.window)
        y = self.attn(y, mask)
        y = _rev(y, self.window, H, W)
        if shift > 0:
            y = torch.roll(y, (shift, shift), dims=(1, 2))
        x = x + y
        return x + self.mlp(self.norm2(x))


class TPatchMerging(nn.Module):
    def __init__(self, in_dim, out_dim):
        super().__init__()
        self.norm = nn.LayerNorm(4 * in_dim)
        self.reduction = nn.Linear(4 * in_dim, out_dim, bias=False)

    def forward(self, x):
        x0, x1 = x[:, 0::2, 0::2], x[:, 1::2, 0::2]
        x2, x3 = x[:, 0::2, 1::2], x[:, 1::2, 1::2]
        x = torch.cat([x0, x1, x2, x3], -1)
        return self.reduction(self.norm(x))


class TSwin(nn.Module):
    def __init__(self):
        super().__init__()
        pe = nn.Module()
        pe.proj = nn.Conv2d(3, DIMS[0], 4, 4)
        pe.norm = nn.LayerNorm(DIMS[0])
        self.patch_embed = pe
        layers = []
        for si, (dim, depth, h) in enumerate(zip(DIMS, DEPTHS, HEADS)):
            stage = nn.Module()
            stage.downsample = (
                TPatchMerging(DIMS[si - 1], dim) if si > 0 else nn.Identity()
            )
            stage.blocks = nn.ModuleList([
                TSwinBlock(dim, h, WIN, WIN // 2 if bi % 2 == 1 else 0)
                for bi in range(depth)
            ])
            layers.append(stage)
        self.layers = nn.ModuleList(layers)
        self.norm = nn.LayerNorm(DIMS[-1])

    def forward(self, x):
        x = self.patch_embed.proj(x).permute(0, 2, 3, 1)
        x = self.patch_embed.norm(x)
        for si, stage in enumerate(self.layers):
            if si > 0:
                x = stage.downsample(x)
            for blk in stage.blocks:
                x = blk(x)
        return self.norm(x)


def test_swin_import_matches_torch():
    torch.manual_seed(9)
    tm = TSwin().eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()
          if "rpi" not in k}
    params = import_swin(sd, DIMS, DEPTHS)

    fm = Swin(dims=DIMS, depths=DEPTHS, heads=HEADS, window=WIN)
    x = np.random.default_rng(9).normal(size=(2, 56, 56, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    out = fm.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=5e-4)


def test_mdnet_import_matches_torch():
    """Reference-layout MDNet checkpoint -> skinjax MDNet output parity
    (the final-ReLU quirk aside — the oracle here applies the torchvision
    forward ReLU like skinjax does)."""
    import torch.nn.functional as F

    from skinjax.models.baselines import MDNet
    from skinjax.models.torch_import import import_mdnet
    from tests.test_more_importers import (  # reuse the densenet oracle
        test_densenet_import_matches_torch as _,
    )

    block_config = (2, 3)
    growth, init_f = 8, 16
    META, NCLS = 5, 3

    # inline torch MDNet with reference naming
    from tests.torch_ref import TorchResNet  # noqa: F401 (import side check)

    class TDenseLayer(nn.Module):
        def __init__(self, cin):
            super().__init__()
            self.norm1 = nn.BatchNorm2d(cin)
            self.conv1 = nn.Conv2d(cin, 4 * growth, 1, bias=False)
            self.norm2 = nn.BatchNorm2d(4 * growth)
            self.conv2 = nn.Conv2d(4 * growth, growth, 3, padding=1, bias=False)

        def forward(self, x):
            y = self.conv1(torch.relu(self.norm1(x)))
            y = self.conv2(torch.relu(self.norm2(y)))
            return torch.cat([x, y], 1)

    class TFeatures(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv0 = nn.Conv2d(3, init_f, 7, 2, 3, bias=False)
            self.norm0 = nn.BatchNorm2d(init_f)
            cin = init_f
            for bi, n in enumerate(block_config, start=1):
                blk = nn.Module()
                for li in range(1, n + 1):
                    setattr(blk, f"denselayer{li}", TDenseLayer(cin))
                    cin += growth
                setattr(self, f"denseblock{bi}", blk)
                if bi != len(block_config):
                    tr = nn.Module()
                    tr.norm = nn.BatchNorm2d(cin)
                    cin //= 2
                    tr.conv = nn.Conv2d(tr.norm.num_features, cin, 1, bias=False)
                    setattr(self, f"transition{bi}", tr)
            self.norm5 = nn.BatchNorm2d(cin)
            self.out_ch = cin

        def forward(self, x):
            x = torch.max_pool2d(torch.relu(self.norm0(self.conv0(x))), 3, 2, 1)
            for bi in range(1, len(block_config) + 1):
                blk = getattr(self, f"denseblock{bi}")
                for li in range(1, block_config[bi - 1] + 1):
                    x = getattr(blk, f"denselayer{li}")(x)
                if bi != len(block_config):
                    tr = getattr(self, f"transition{bi}")
                    x = F.avg_pool2d(tr.conv(torch.relu(tr.norm(x))), 2, 2)
            return torch.relu(self.norm5(x))

    class TMDNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.feature_extractor = TFeatures()
            C = self.feature_extractor.out_ch
            mn = nn.Module()
            mn.metanet = nn.Sequential(
                nn.Conv2d(META, 64, 1), nn.ReLU(), nn.Conv2d(64, C, 1),
                nn.Sigmoid(),
            )
            self.meta_net = mn
            mb = nn.Module()
            mb.fb = nn.Sequential(nn.Linear(META, C), nn.LayerNorm(C))
            mb.gb = nn.Sequential(nn.Linear(META, C), nn.LayerNorm(C))
            self.meta_block = mb
            self.classifier = nn.Linear(C, NCLS)

        def forward(self, img, meta):
            f = self.feature_extractor(img)
            gates = self.meta_net.metanet(meta[:, :, None, None])
            gated = f * gates
            t1 = self.meta_block.fb(meta)[:, :, None, None]
            t2 = self.meta_block.gb(meta)[:, :, None, None]
            modulated = torch.sigmoid(torch.tanh(f * t1) + t2)
            fused = gated + modulated
            pooled = fused.mean(dim=(2, 3))
            return self.classifier(pooled)

    torch.manual_seed(11)
    tm = TMDNet().eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, stats = import_mdnet(sd, block_config)

    # scaled-down skinjax MDNet over a matching mini-densenet backbone
    from skinjax.models.backbones import register
    from skinjax.models.backbones.cnn_zoo import DenseNet

    register("densenet_mini_test",
             lambda name=None, dtype=None, common_dim=512: DenseNet(
                 block_config=block_config, growth_rate=growth,
                 init_features=init_f, dtype=dtype),
             tm.feature_extractor.out_ch)
    fm = MDNet(num_classes=NCLS, meta_dim=META, hidden_dim=64,
               cnn_model_name="densenet_mini_test")
    x = np.random.default_rng(11).normal(size=(2, 64, 64, 3)).astype(np.float32)
    meta = np.random.default_rng(12).normal(size=(2, META)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(meta)).numpy()
    out = fm.apply({"params": params, "batch_stats": stats},
                   jnp.asarray(x), jnp.asarray(meta))
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=5e-4)
