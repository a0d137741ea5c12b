"""Inline torch reference models with torchvision-compatible state_dict names
(torchvision isn't installed; these replicate the public architectures purely
as numerical oracles for importer/parity tests)."""

import torch
import torch.nn as nn


class BasicBlock(nn.Module):
    def __init__(self, cin, planes, stride=1, down=False):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU()
        self.downsample = (
            nn.Sequential(
                nn.Conv2d(cin, planes, 1, stride, bias=False), nn.BatchNorm2d(planes)
            )
            if down
            else None
        )

    def forward(self, x):
        idt = x
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        if self.downsample is not None:
            idt = self.downsample(x)
        return self.relu(y + idt)


class Bottleneck(nn.Module):
    def __init__(self, cin, planes, stride=1, down=False):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU()
        self.downsample = (
            nn.Sequential(
                nn.Conv2d(cin, planes * 4, 1, stride, bias=False),
                nn.BatchNorm2d(planes * 4),
            )
            if down
            else None
        )

    def forward(self, x):
        idt = x
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        if self.downsample is not None:
            idt = self.downsample(x)
        return self.relu(y + idt)


class TorchResNet(nn.Module):
    """Feature extractor with torchvision state_dict names (conv1, bn1,
    layer1..4, no fc)."""

    def __init__(self, stage_sizes=(2, 2, 2, 2), block="basic", width=64):
        super().__init__()
        Block = BasicBlock if block == "basic" else Bottleneck
        exp = 1 if block == "basic" else 4
        self.conv1 = nn.Conv2d(3, width, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        cin = width
        for li, n in enumerate(stage_sizes, start=1):
            planes = width * (2 ** (li - 1))
            blocks = []
            for bi in range(n):
                stride = 2 if (li > 1 and bi == 0) else 1
                down = stride != 1 or cin != planes * exp
                blocks.append(Block(cin, planes, stride, down))
                cin = planes * exp
            setattr(self, f"layer{li}", nn.Sequential(*blocks))
        self.stage_sizes = stage_sizes

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for li in range(1, len(self.stage_sizes) + 1):
            x = getattr(self, f"layer{li}")(x)
        return x
