"""Minimal torchvision-compatible MobileNetV2 (torch), test oracle only.

torchvision is absent in this image, but the reference's ``Pip_mbnetv2``
(``lib/networks.py:320-363``) wraps ``torchvision.models.mobilenet_v2().
features``.  This stub reproduces torchvision's MobileNetV2 feature-extractor
structure and state-dict naming exactly (``features.{i}.conv.{j}...`` with
Conv2dNormActivation = [Conv2d, BatchNorm2d, ReLU6] sub-sequences) so the
PIPNet mbnetv2 golden parity test can run without torchvision.  Structure
cross-checked against torchvision/models/mobilenetv2.py (BSD); written from
the published architecture, not copied.
"""
import torch.nn as nn

# torchvision inverted_residual_setting: (expand t, channels c, repeats n, stride s)
SETTINGS = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
            (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]


def _conv_bn_act(inp, oup, kernel=3, stride=1, groups=1):
    return nn.Sequential(
        nn.Conv2d(inp, oup, kernel, stride, (kernel - 1) // 2, groups=groups,
                  bias=False),
        nn.BatchNorm2d(oup),
        nn.ReLU6(inplace=True))


class InvertedResidual(nn.Module):
    def __init__(self, inp, oup, stride, expand_ratio):
        super().__init__()
        hidden = inp * expand_ratio
        self.use_res_connect = stride == 1 and inp == oup
        layers = []
        if expand_ratio != 1:
            layers.append(_conv_bn_act(inp, hidden, kernel=1))
        layers.extend([
            _conv_bn_act(hidden, hidden, stride=stride, groups=hidden),
            nn.Conv2d(hidden, oup, 1, bias=False),
            nn.BatchNorm2d(oup)])
        self.conv = nn.Sequential(*layers)

    def forward(self, x):
        return x + self.conv(x) if self.use_res_connect else self.conv(x)


class MobileNetV2(nn.Module):
    """``features`` only (no classifier — Pip_mbnetv2 ignores it)."""

    def __init__(self):
        super().__init__()
        features = [_conv_bn_act(3, 32, stride=2)]
        c_in = 32
        for t, c, n, s in SETTINGS:
            for i in range(n):
                features.append(InvertedResidual(c_in, c, s if i == 0 else 1,
                                                 t))
                c_in = c
        features.append(_conv_bn_act(c_in, 1280, kernel=1))
        self.features = nn.Sequential(*features)

    def forward(self, x):
        return self.features(x)


def mobilenet_v2(*a, **k):
    return MobileNetV2()
