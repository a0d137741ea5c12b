"""VGG16 and ViT importer parity vs inline torch oracles."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp


def test_vgg16_import_matches_torch():
    from skinjax.models.backbones.cnn_zoo import VGG16
    from skinjax.models.torch_import import import_vgg16

    torch.manual_seed(0)
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers = []
    cin = 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(cin, v, 3, padding=1), nn.ReLU()]
            cin = v
    tm = nn.Module()
    tm.features = nn.Sequential(*layers)
    tm.classifier = nn.Sequential(
        nn.Linear(512 * 7 * 7, 4096), nn.ReLU(), nn.Dropout(),
        nn.Linear(4096, 4096), nn.ReLU(),
    )
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = import_vgg16(sd)

    fm = VGG16()
    x = np.random.default_rng(0).normal(size=(1, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        t = torch.tensor(x.transpose(0, 3, 1, 2))
        feat = tm.features(t).flatten(1)
        ref = tm.classifier(feat).numpy()
    out = fm.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3, rtol=2e-3)


def test_vit_import_matches_torch():
    from skinjax.models.backbones.vit import ViT
    from skinjax.models.torch_import import import_vit

    D, depth, heads, patch = 32, 2, 4, 8

    class TBlock(nn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = nn.LayerNorm(D, eps=1e-6)
            self.attn = nn.Module()
            self.attn.qkv = nn.Linear(D, 3 * D)
            self.attn.proj = nn.Linear(D, D)
            self.norm2 = nn.LayerNorm(D, eps=1e-6)
            self.mlp = nn.Module()
            self.mlp.fc1 = nn.Linear(D, 4 * D)
            self.mlp.fc2 = nn.Linear(4 * D, D)

        def forward(self, x):
            y = self.norm1(x)
            B, T, _ = y.shape
            qkv = self.attn.qkv(y).reshape(B, T, 3, heads, D // heads)
            q, k, v = qkv.unbind(2)
            q, k, v = (a.transpose(1, 2) for a in (q, k, v))
            a = torch.softmax(q @ k.transpose(-2, -1) / (D // heads) ** 0.5, -1)
            y = (a @ v).transpose(1, 2).reshape(B, T, D)
            x = x + self.attn.proj(y)
            y = self.norm2(x)
            return x + self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(y)))

    class TViT(nn.Module):
        def __init__(self):
            super().__init__()
            self.patch_embed = nn.Module()
            self.patch_embed.proj = nn.Conv2d(3, D, patch, patch)
            self.cls_token = nn.Parameter(torch.randn(1, 1, D) * 0.02)
            self.pos_embed = nn.Parameter(torch.randn(1, 17, D) * 0.02)
            self.blocks = nn.ModuleList([TBlock() for _ in range(depth)])
            self.norm = nn.LayerNorm(D, eps=1e-6)

        def forward(self, x):
            B = x.shape[0]
            x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
            x = torch.cat([self.cls_token.expand(B, -1, -1), x], 1)
            x = x + self.pos_embed
            for b in self.blocks:
                x = b(x)
            return self.norm(x)[:, 0]

    torch.manual_seed(1)
    tm = TViT().eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = import_vit(sd, depth=depth, dim=D)

    fm = ViT(dim=D, depth=depth, num_heads=heads, patch=patch)
    x = np.random.default_rng(1).normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    out = fm.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=2e-4)


def test_densenet_import_matches_torch():
    from skinjax.models.backbones.cnn_zoo import DenseNet
    from skinjax.models.torch_import import import_densenet

    torch.manual_seed(2)
    block_config = (2, 3)
    growth, init_f = 8, 16

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

    class TDenseNet(nn.Module):
        def __init__(self):
            super().__init__()
            f = nn.Module()
            f.conv0 = nn.Conv2d(3, init_f, 7, 2, 3, bias=False)
            f.norm0 = nn.BatchNorm2d(init_f)
            cin = init_f
            for bi, n in enumerate(block_config, start=1):
                blk = nn.Module()
                for li in range(1, n + 1):
                    setattr(blk, f"denselayer{li}", TDenseLayer(cin))
                    cin += growth
                setattr(f, f"denseblock{bi}", blk)
                if bi != len(block_config):
                    tr = nn.Module()
                    tr.norm = nn.BatchNorm2d(cin)
                    cin //= 2
                    tr.conv = nn.Conv2d(tr.norm.num_features, cin, 1, bias=False)
                    setattr(f, f"transition{bi}", tr)
            f.norm5 = nn.BatchNorm2d(cin)
            self.features = f
            self.block_config = block_config

        def forward(self, x):
            f = self.features
            x = torch.max_pool2d(torch.relu(f.norm0(f.conv0(x))), 3, 2, 1)
            for bi in range(1, len(self.block_config) + 1):
                blk = getattr(f, f"denseblock{bi}")
                for li in range(1, self.block_config[bi - 1] + 1):
                    x = getattr(blk, f"denselayer{li}")(x)
                if bi != len(self.block_config):
                    tr = getattr(f, f"transition{bi}")
                    x = torch.nn.functional.avg_pool2d(
                        tr.conv(torch.relu(tr.norm(x))), 2, 2
                    )
            return torch.relu(f.norm5(x))

    tm = TDenseNet().eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, stats = import_densenet(sd, block_config)

    fm = DenseNet(block_config=block_config, growth_rate=growth, init_features=init_f)
    x = np.random.default_rng(2).normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    out = fm.apply({"params": params, "batch_stats": stats}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=2e-4)


def test_mobilenet_v2_import_matches_torch():
    from skinjax.models.backbones.cnn_zoo import MobileNetV2
    from skinjax.models.torch_import import import_mobilenet_v2

    torch.manual_seed(3)
    cfg = ((1, 8, 1, 1), (6, 12, 2, 2))

    class ConvBNReLU(nn.Sequential):
        def __init__(self, cin, cout, k=3, s=1, groups=1):
            super().__init__(
                nn.Conv2d(cin, cout, k, s, k // 2, groups=groups, bias=False),
                nn.BatchNorm2d(cout),
                nn.ReLU6(),
            )

    class InvRes(nn.Module):
        def __init__(self, cin, cout, stride, expand):
            super().__init__()
            hidden = cin * expand
            layers = []
            if expand != 1:
                layers.append(ConvBNReLU(cin, hidden, k=1))
            layers += [
                ConvBNReLU(hidden, hidden, k=3, s=stride, groups=hidden),
                nn.Conv2d(hidden, cout, 1, bias=False),
                nn.BatchNorm2d(cout),
            ]
            self.conv = nn.Sequential(*layers)
            self.use_res = stride == 1 and cin == cout

        def forward(self, x):
            return x + self.conv(x) if self.use_res else self.conv(x)

    class TMobileNet(nn.Module):
        def __init__(self):
            super().__init__()
            feats = [ConvBNReLU(3, 32, s=2)]
            cin = 32
            for t, c, n, s in cfg:
                for j in range(n):
                    feats.append(InvRes(cin, c, s if j == 0 else 1, t))
                    cin = c
            feats.append(ConvBNReLU(cin, 1280, k=1))
            self.features = nn.Sequential(*feats)

        def forward(self, x):
            return self.features(x)

    tm = TMobileNet().eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, stats = import_mobilenet_v2(sd, cfg)

    fm = MobileNetV2(cfg=cfg)
    x = np.random.default_rng(3).normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    out = fm.apply({"params": params, "batch_stats": stats}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=2e-4)


def test_efficientnet_import_matches_torch():
    from skinjax.models.backbones.cnn_zoo import EfficientNet
    from skinjax.models.torch_import import import_efficientnet

    torch.manual_seed(4)
    cfg = ((1, 8, 1, 1), (6, 16, 2, 2))

    class ConvNormAct(nn.Sequential):
        def __init__(self, cin, cout, k=3, s=1, groups=1, act=True):
            mods = [
                nn.Conv2d(cin, cout, k, s, k // 2, groups=groups, bias=False),
                nn.BatchNorm2d(cout, eps=1e-3),
            ]
            if act:
                mods.append(nn.SiLU())
            super().__init__(*mods)

    class SE(nn.Module):
        def __init__(self, cin, squeeze):
            super().__init__()
            self.fc1 = nn.Conv2d(cin, squeeze, 1)
            self.fc2 = nn.Conv2d(squeeze, cin, 1)

        def forward(self, x):
            s = x.mean((2, 3), keepdim=True)
            s = torch.sigmoid(self.fc2(torch.nn.functional.silu(self.fc1(s))))
            return x * s

    class MBConv(nn.Module):
        def __init__(self, cin, cout, stride, expand):
            super().__init__()
            hidden = cin * expand
            mods = []
            if expand != 1:
                mods.append(ConvNormAct(cin, hidden, k=1))
            mods += [
                ConvNormAct(hidden, hidden, k=3, s=stride, groups=hidden),
                SE(hidden, max(1, cin // 4)),
                ConvNormAct(hidden, cout, k=1, act=False),
            ]
            self.block = nn.Sequential(*mods)
            self.use_res = stride == 1 and cin == cout

        def forward(self, x):
            return x + self.block(x) if self.use_res else self.block(x)

    class TEffNet(nn.Module):
        def __init__(self):
            super().__init__()
            feats = [ConvNormAct(3, 32, s=2)]
            cin = 32
            for t, c, n, s in cfg:
                stage = []
                for j in range(n):
                    stage.append(MBConv(cin, c, s if j == 0 else 1, t))
                    cin = c
                feats.append(nn.Sequential(*stage))
            feats.append(ConvNormAct(cin, 1280, k=1))
            self.features = nn.Sequential(*feats)

        def forward(self, x):
            return self.features(x)

    tm = TEffNet().eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, stats = import_efficientnet(sd, cfg, depth=1.0)

    # match the scaled-down config on the flax side (no width rounding at
    # these sizes because _round_filters(32,1)=32 etc.)
    fm = EfficientNet(width=1.0, depth=1.0, cfg=tuple((t, c, n, s, 3) for t, c, n, s in cfg))
    x = np.random.default_rng(4).normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    out = fm.apply({"params": params, "batch_stats": stats}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-4, rtol=3e-4)
