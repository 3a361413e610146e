"""Torch -> Flax bridges for the alignment nets (FaceBoxes, PIPNet, sphere20).

Source layouts: the reference's ``FaceBoxesV2.pth`` (utils/faceboxes.py
module names), PIPNet ``epoch59.pth`` (torchvision resnet101 + 1x1 heads,
lib/networks.py), and the CosFace ``sphere20`` eval net
(evaluation/face_align/cosface/net.py).
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from celebbasis_tpu.align.pipnet import PIPNetConfig
from celebbasis_tpu.utils.bridge import KeyMap, unflatten, _conv, _lin


def _strip_module(state: Dict) -> Dict:
    return {k[7:] if k.startswith("module.") else k: v
            for k, v in state.items()}


def _basic_conv(km: KeyMap, dst: str, src: str):
    km.conv(f"{dst}/conv", f"{src}.conv")
    km.bn(f"{dst}/bn", f"{src}.bn")


def convert_faceboxes(state: Dict, version: int = 2) -> Dict:
    state = _strip_module({k: np.asarray(v) for k, v in state.items()
                           if hasattr(v, "shape")})
    km = KeyMap(state)
    if version == 2:
        for i in range(1, 6):
            _basic_conv(km, f"conv{i}", f"conv{i}")
        extra = (("conv6_1", "conv6_1"), ("conv6_2", "conv6_2"),
                 ("conv7_1", "conv7_1"), ("conv7_2", "conv7_2"))
    else:
        for i in (1, 2):
            _basic_conv(km, f"conv{i}", f"conv{i}")
        extra = (("conv3_1", "conv3_1"), ("conv3_2", "conv3_2"),
                 ("conv4_1", "conv4_1"), ("conv4_2", "conv4_2"))
    for i in (1, 2, 3):
        for b in ("branch1x1", "branch1x1_2", "branch3x3_reduce", "branch3x3",
                  "branch3x3_reduce_2", "branch3x3_2", "branch3x3_3"):
            _basic_conv(km, f"inception{i}/{b}", f"inception{i}.{b}")
    for dst, src in extra:
        _basic_conv(km, dst, src)
    for i in range(3):
        km.conv(f"head{i}/loc", f"loc.{i}")
        km.conv(f"head{i}/conf", f"conf.{i}")
    return {"params": unflatten(km.out)}


def _resnet_bottleneck(km: KeyMap, dst: str, src: str):
    for n in (1, 2, 3):
        km.conv(f"{dst}/conv{n}", f"{src}.conv{n}")
        km.bn(f"{dst}/bn{n}", f"{src}.bn{n}")
    if km.has(f"{src}.downsample.0.weight"):
        km.conv(f"{dst}/down_conv", f"{src}.downsample.0")
        km.bn(f"{dst}/down_bn", f"{src}.downsample.1")


def _resnet_basic(km: KeyMap, dst: str, src: str):
    for n in (1, 2):
        km.conv(f"{dst}/conv{n}", f"{src}.conv{n}")
        km.bn(f"{dst}/bn{n}", f"{src}.bn{n}")
    if km.has(f"{src}.downsample.0.weight"):
        km.conv(f"{dst}/down_conv", f"{src}.downsample.0")
        km.bn(f"{dst}/down_bn", f"{src}.downsample.1")


def _map_pipnet_resnet(km: KeyMap, cfg: PIPNetConfig):
    km.conv("backbone/conv1", "conv1")
    km.bn("backbone/bn1", "bn1")
    block = _resnet_bottleneck if cfg.block == "bottleneck" else _resnet_basic
    for li, n_blocks in enumerate(cfg.layers):
        for bi in range(n_blocks):
            block(km, f"backbone/layer{li + 1}_block{bi}",
                  f"layer{li + 1}.{bi}")
    # net_stride extras (networks.py:27-57, 229-267)
    if cfg.net_stride in (64, 128):
        km.conv("layer5", "layer5")
        km.bn("bn5", "bn5")
    if cfg.net_stride == 128:
        km.conv("layer6", "layer6")
        km.bn("bn6", "bn6")
    if cfg.net_stride == 16:
        # ConvTranspose2d weight (in, out, kh, kw) -> flax transpose_kernel
        # layout (kh, kw, out, in)
        km.put("deconv1/kernel",
               km.take("deconv1.weight").transpose(2, 3, 1, 0))
        km.bn("bn_deconv1", "bn_deconv1")


def _map_pipnet_mbnetv2(km: KeyMap):
    from celebbasis_tpu.align.pipnet import MBV2_SETTINGS
    km.conv("backbone/stem/conv", "features.0.0")
    km.bn("backbone/stem/bn", "features.0.1")
    fi = 1
    for t, c, n, s in MBV2_SETTINGS:
        for _ in range(n):
            dst, src = f"backbone/block{fi}", f"features.{fi}.conv"
            if t == 1:
                km.conv(f"{dst}_dw/conv", f"{src}.0.0")
                km.bn(f"{dst}_dw/bn", f"{src}.0.1")
                km.conv(f"{dst}_pw/conv", f"{src}.1")
                km.bn(f"{dst}_pw/bn", f"{src}.2")
            else:
                km.conv(f"{dst}_expand/conv", f"{src}.0.0")
                km.bn(f"{dst}_expand/bn", f"{src}.0.1")
                km.conv(f"{dst}_dw/conv", f"{src}.1.0")
                km.bn(f"{dst}_dw/bn", f"{src}.1.1")
                km.conv(f"{dst}_pw/conv", f"{src}.2")
                km.bn(f"{dst}_pw/bn", f"{src}.3")
            fi += 1
    km.conv("backbone/last/conv", "features.18.0")
    km.bn("backbone/last/bn", "features.18.1")


def _map_pipnet_mbnetv3(km: KeyMap):
    from celebbasis_tpu.align.pipnet import MBV3_LARGE_CFGS
    km.conv("backbone/stem/conv", "features.0.0")
    km.bn("backbone/stem/bn", "features.0.1")
    for fi, (k, t, c, use_se, use_hs, s) in enumerate(MBV3_LARGE_CFGS,
                                                      start=1):
        dst, src = f"backbone/block{fi}", f"features.{fi}.conv"
        expanded = km.has(f"{src}.7.weight")   # inp != hidden layout
        if expanded:
            km.conv(f"{dst}_expand/conv", f"{src}.0")
            km.bn(f"{dst}_expand/bn", f"{src}.1")
            km.conv(f"{dst}_dw/conv", f"{src}.3")
            km.bn(f"{dst}_dw/bn", f"{src}.4")
            if use_se:
                km.linear(f"{dst}_se/fc1", f"{src}.5.fc.0")
                km.linear(f"{dst}_se/fc2", f"{src}.5.fc.2")
            km.conv(f"{dst}_pw/conv", f"{src}.7")
            km.bn(f"{dst}_pw/bn", f"{src}.8")
        else:
            km.conv(f"{dst}_dw/conv", f"{src}.0")
            km.bn(f"{dst}_dw/bn", f"{src}.1")
            if use_se:
                km.linear(f"{dst}_se/fc1", f"{src}.3.fc.0")
                km.linear(f"{dst}_se/fc2", f"{src}.3.fc.2")
            km.conv(f"{dst}_pw/conv", f"{src}.4")
            km.bn(f"{dst}_pw/bn", f"{src}.5")
    km.conv("backbone/last/conv", "conv.0")
    km.bn("backbone/last/bn", "conv.1")


def convert_pipnet(state: Dict, cfg: PIPNetConfig) -> Dict:
    state = _strip_module({k: np.asarray(v) for k, v in state.items()
                           if hasattr(v, "shape")})
    km = KeyMap(state)
    if cfg.arch == "resnet":
        _map_pipnet_resnet(km, cfg)
    elif cfg.arch == "mbnetv2":
        _map_pipnet_mbnetv2(km)
    elif cfg.arch == "mbnetv3":
        _map_pipnet_mbnetv3(km)
    else:
        raise ValueError(f"unknown PIPNet arch: {cfg.arch!r}")
    for dst, src in (("cls", "cls_layer"), ("x", "x_layer"), ("y", "y_layer"),
                     ("nb_x", "nb_x_layer"), ("nb_y", "nb_y_layer")):
        km.conv(dst, src)
    return {"params": unflatten(km.out)}


# sphere20/64 conversion lives in celebbasis_tpu.eval.sphere.convert_sphere
