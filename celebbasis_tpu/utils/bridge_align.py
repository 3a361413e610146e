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


def convert_pipnet(state: Dict, cfg: PIPNetConfig) -> Dict:
    state = _strip_module({k: np.asarray(v) for k, v in state.items()
                           if hasattr(v, "shape")})
    km = KeyMap(state)
    km.conv("backbone/conv1", "conv1")
    km.bn("backbone/bn1", "bn1")
    for li, n_blocks in enumerate(cfg.layers):
        for bi in range(n_blocks):
            _resnet_bottleneck(km, f"backbone/layer{li + 1}_block{bi}",
                               f"layer{li + 1}.{bi}")
    for dst, src in (("cls", "cls_layer"), ("x", "x_layer"), ("y", "y_layer"),
                     ("nb_x", "nb_x_layer"), ("nb_y", "nb_y_layer")):
        km.conv(dst, src)
    return {"params": unflatten(km.out)}


# sphere20/64 conversion lives in celebbasis_tpu.eval.sphere.convert_sphere
