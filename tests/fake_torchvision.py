"""Minimal torch ResNet-50 with torchvision's module structure.

Lets the parity tests instantiate the reference AdapNet (which does
``from torchvision.models import resnet50`` and performs module surgery on
layer2/3/4 -- reference modules/adapnet.py:101-130) in an environment
without torchvision. Only the attributes the reference touches are needed:
conv1 / bn1 / relu / maxpool / layer1..4, Bottleneck blocks exposing
conv1/bn1/conv2/bn2/conv3/bn3/downsample, and torchvision's registration
order (which fixes state_dict key order).
"""

from __future__ import annotations

import sys
import types

import torch
import torch.nn as nn


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class ResNet50(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, 64, 3, stride=1)
        self.layer2 = self._make_layer(256, 128, 4, stride=2)
        self.layer3 = self._make_layer(512, 256, 6, stride=2)
        self.layer4 = self._make_layer(1024, 512, 3, stride=2)
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(2048, 1000)

    @staticmethod
    def _make_layer(inplanes, planes, blocks, stride):
        downsample = nn.Sequential(
            nn.Conv2d(inplanes, planes * 4, 1, stride=stride, bias=False),
            nn.BatchNorm2d(planes * 4))
        layers = [Bottleneck(inplanes, planes, stride, downsample)]
        for _ in range(1, blocks):
            layers.append(Bottleneck(planes * 4, planes))
        return nn.Sequential(*layers)


def resnet50(pretrained=False, **kw):
    return ResNet50()


def install():
    """Register a fake ``torchvision`` exposing models.resnet50."""
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    models = types.ModuleType("torchvision.models")
    models.resnet50 = resnet50
    tv.models = models
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models
