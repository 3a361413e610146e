"""FaceBoxesV2 face detector — Flax net + anchors + decode + driver (W0).

Parity target: `/root/reference/evaluation/face_align/PIPNet/FaceBoxesV2/`
(utils/faceboxes.py nets, utils/prior_box.py anchors, utils/box_utils.py
decode, faceboxes_detector.py driver).  V2 backbone: 5 stride-2 BasicConv
stem, 3 Inception blocks, two extra stride-2 stages; multibox heads with
21 anchors at stride 32 (dense 32-anchors) and 1 anchor at strides 64/128;
SSD-style decode with variances (0.1, 0.2).  V1 (CRelu stem + maxpools) is
also provided for checkpoint compatibility.

The net + decode run jitted (NHWC, fused); candidate filtering + NMS run on
host through the native C++ kernels (``celebbasis_tpu.align.nms``).
Input follows the reference contract: BGR uint8-style values, means
(104, 117, 123) subtracted (faceboxes_detector.py:58-63).
"""
from __future__ import annotations

import itertools
import math
from dataclasses import dataclass
from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from celebbasis_tpu.align import nms as nms_mod

CFG = {
    "min_sizes": [[32, 64, 128], [256], [512]],
    "steps": [32, 64, 128],
    "variance": (0.1, 0.2),
    "clip": False,
}


class BasicConv(nn.Module):
    """conv(no bias) + BN(eps 1e-5) + relu (utils/faceboxes.py:6-16)."""
    features: int
    kernel: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv")(x)
        from celebbasis_tpu.models.iresnet import FrozenBN
        x = FrozenBN(name="bn")(x)
        return nn.relu(x).astype(self.dtype)


class CRelu(nn.Module):
    """conv + BN + concat(x, -x) + relu (V1 stem, utils/faceboxes.py:49-61)."""
    features: int
    kernel: int
    stride: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv")(x)
        from celebbasis_tpu.models.iresnet import FrozenBN
        x = FrozenBN(name="bn")(x)
        x = jnp.concatenate([x, -x], axis=-1)
        return nn.relu(x).astype(self.dtype)


class Inception(nn.Module):
    """4-branch inception with avg-pool branch (utils/faceboxes.py:19-46)."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(32, 1, dtype=self.dtype, name="branch1x1")(x)
        # torch F.avg_pool2d counts padded zeros (count_include_pad=True)
        pooled = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                             count_include_pad=True)
        b2 = BasicConv(32, 1, dtype=self.dtype, name="branch1x1_2")(pooled)
        b3 = BasicConv(24, 1, dtype=self.dtype, name="branch3x3_reduce")(x)
        b3 = BasicConv(32, 3, dtype=self.dtype, name="branch3x3")(b3)
        b4 = BasicConv(24, 1, dtype=self.dtype, name="branch3x3_reduce_2")(x)
        b4 = BasicConv(32, 3, dtype=self.dtype, name="branch3x3_2")(b4)
        b4 = BasicConv(32, 3, dtype=self.dtype, name="branch3x3_3")(b4)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class _MultiboxHead(nn.Module):
    n_anchors: int
    num_classes: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        loc = nn.Conv(self.n_anchors * 4, (3, 3), padding="SAME",
                      dtype=self.dtype, param_dtype=jnp.float32,
                      name="loc")(x)
        conf = nn.Conv(self.n_anchors * self.num_classes, (3, 3),
                       padding="SAME", dtype=self.dtype,
                       param_dtype=jnp.float32, name="conf")(x)
        B = x.shape[0]
        return (loc.reshape(B, -1, 4),
                conf.reshape(B, -1, self.num_classes))


class FaceBoxesV2(nn.Module):
    num_classes: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        for i, ch in enumerate((8, 16, 32, 64, 128), start=1):
            x = BasicConv(ch, 3, stride=2, dtype=dt, name=f"conv{i}")(x)
        for i in (1, 2, 3):
            x = Inception(dtype=dt, name=f"inception{i}")(x)
        src1 = x
        x = BasicConv(128, 1, dtype=dt, name="conv6_1")(x)
        x = BasicConv(256, 3, stride=2, dtype=dt, name="conv6_2")(x)
        src2 = x
        x = BasicConv(128, 1, dtype=dt, name="conv7_1")(x)
        x = BasicConv(256, 3, stride=2, dtype=dt, name="conv7_2")(x)
        src3 = x
        locs, confs = [], []
        for i, (src, na) in enumerate(zip((src1, src2, src3), (21, 1, 1))):
            l, c = _MultiboxHead(na, self.num_classes, dt,
                                 name=f"head{i}")(src)
            locs.append(l)
            confs.append(c)
        loc = jnp.concatenate(locs, axis=1)
        conf = jax.nn.softmax(jnp.concatenate(confs, axis=1).astype(
            jnp.float32), axis=-1)
        return loc.astype(jnp.float32), conf


class FaceBoxesV1(nn.Module):
    """The original FaceBoxes (CRelu stem + maxpools), stride 32/64/128."""
    num_classes: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        x = CRelu(24, 7, 4, dtype=dt, name="conv1")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x = CRelu(64, 5, 2, dtype=dt, name="conv2")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i in (1, 2, 3):
            x = Inception(dtype=dt, name=f"inception{i}")(x)
        src1 = x
        x = BasicConv(128, 1, dtype=dt, name="conv3_1")(x)
        x = BasicConv(256, 3, stride=2, dtype=dt, name="conv3_2")(x)
        src2 = x
        x = BasicConv(128, 1, dtype=dt, name="conv4_1")(x)
        x = BasicConv(256, 3, stride=2, dtype=dt, name="conv4_2")(x)
        src3 = x
        locs, confs = [], []
        for i, (src, na) in enumerate(zip((src1, src2, src3), (21, 1, 1))):
            l, c = _MultiboxHead(na, self.num_classes, dt,
                                 name=f"head{i}")(src)
            locs.append(l)
            confs.append(c)
        loc = jnp.concatenate(locs, axis=1)
        conf = jax.nn.softmax(jnp.concatenate(confs, axis=1).astype(
            jnp.float32), axis=-1)
        return loc.astype(jnp.float32), conf


def prior_boxes(image_size: Tuple[int, int], cfg: dict = CFG) -> np.ndarray:
    """SSD anchor grid in normalized cxcywh (utils/prior_box.py:7-44)."""
    anchors: List[float] = []
    h, w = image_size
    feature_maps = [(math.ceil(h / s), math.ceil(w / s)) for s in cfg["steps"]]
    for k, (fh, fw) in enumerate(feature_maps):
        step = cfg["steps"][k]
        for i, j in itertools.product(range(fh), range(fw)):
            for min_size in cfg["min_sizes"][k]:
                s_kx = min_size / w
                s_ky = min_size / h
                if min_size == 32:
                    offs = (0, 0.25, 0.5, 0.75)
                elif min_size == 64:
                    offs = (0, 0.5)
                else:
                    offs = (0.5,)
                for oy, ox in itertools.product(offs, offs):
                    anchors += [(j + ox) * step / w, (i + oy) * step / h,
                                s_kx, s_ky]
    out = np.asarray(anchors, np.float32).reshape(-1, 4)
    if cfg["clip"]:
        out = np.clip(out, 0, 1)
    return out


def decode_boxes(loc: jnp.ndarray, priors: jnp.ndarray,
                 variances=(0.1, 0.2)) -> jnp.ndarray:
    """SSD offset decode to xyxy (utils/box_utils.py:175-195)."""
    cxcy = priors[:, :2] + loc[:, :2] * variances[0] * priors[:, 2:]
    wh = priors[:, 2:] * jnp.exp(loc[:, 2:] * variances[1])
    tl = cxcy - wh / 2
    br = tl + wh
    return jnp.concatenate([tl, br], axis=1)


def _resize_scale(img: np.ndarray, scale: float) -> np.ndarray:
    """cv2.resize(img, None, fx=scale, fy=scale) INTER_LINEAR — the exact
    auto-rescale of faceboxes_detector.py:45-47 (output dims round(d*scale)).
    PIL fallback when cv2 is absent."""
    try:
        import cv2
        return cv2.resize(img, None, None, fx=scale, fy=scale,
                          interpolation=cv2.INTER_LINEAR)
    except ImportError:                               # pragma: no cover
        from PIL import Image
        h, w = img.shape[:2]
        return np.asarray(Image.fromarray(img).resize(
            (int(round(w * scale)), int(round(h * scale))), Image.BILINEAR),
            np.uint8)


@dataclass
class Detection:
    score: float
    xmin: int
    ymin: int
    width: int
    height: int


class FaceBoxesDetector:
    """detect(image_bgr) -> list[Detection] (faceboxes_detector.py:37-118)."""

    def __init__(self, params, version: int = 2, thresh: float = 0.6,
                 nms_thresh: float = 0.3, max_pre_nms: int = 5000,
                 max_post_nms: int = 750):
        self.net = FaceBoxesV2() if version == 2 else FaceBoxesV1()
        self.params = params
        self.thresh = thresh
        self.nms_thresh = nms_thresh
        self.max_pre = max_pre_nms
        self.max_post = max_post_nms
        self._jit_fwd = jax.jit(
            lambda p, im, pri: self._forward(p, im, pri))
        self._prior_cache: dict = {}

    def _forward(self, params, image_u8, priors):
        # uint8 on the wire: the host->device image transfer is the W0
        # bottleneck on tunneled hosts (PERF.md) — convert + mean-subtract
        # on device (exact: uint8->fp32 is lossless, same arithmetic)
        image = image_u8.astype(jnp.float32) - jnp.asarray(
            [104.0, 117.0, 123.0], jnp.float32)
        loc, conf = self.net.apply(params, image)
        boxes = decode_boxes(loc[0], priors, CFG["variance"])
        scores = conf[0, :, 1]
        # pre-NMS top-k on device: only max_pre boxes cross the wire
        # instead of every anchor.  Equivalent to the host-side
        # threshold+sort: any anchor above thresh outranks every anchor
        # below it, so thresholding the overall top-k keeps the same set.
        k = min(self.max_pre, scores.shape[0])
        top_scores, top_idx = jax.lax.top_k(scores, k)
        return boxes[top_idx], top_scores

    def detect(self, image: np.ndarray, im_scale: float | None = None):
        """``image`` is the array as the reference driver holds it — BGR in
        the cv2 demos, raw RGB on the start_align product path (the
        reference feeds both through unchanged; every shipped driver pins
        im_scale=1).  im_scale=None auto-rescales >600px images, the
        faceboxes_detector.py:39-44 capability no shipped driver uses."""
        h, w = image.shape[:2]
        if im_scale is None:
            im_scale = 600.0 / min(h, w) if min(h, w) > 600 else 1.0
        if im_scale != 1.0:
            img = _resize_scale(image.astype(np.uint8), im_scale)
        else:
            img = image.astype(np.uint8)
        sh, sw = img.shape[:2]
        if (sh, sw) not in self._prior_cache:
            self._prior_cache[(sh, sw)] = jnp.asarray(prior_boxes((sh, sw)))
        priors = self._prior_cache[(sh, sw)]
        boxes, scores = self._jit_fwd(self.params, jnp.asarray(img[None]),
                                      priors)
        boxes = np.asarray(boxes) * np.asarray([sw, sh, sw, sh], np.float32)
        scores = np.asarray(scores)
        inds = scores > self.thresh
        boxes, scores = boxes[inds], scores[inds]
        order = scores.argsort()[::-1]
        dets = np.hstack([boxes[order], scores[order, None]]).astype(np.float32)
        keep = nms_mod.greedy_nms(dets, self.nms_thresh)
        dets = dets[keep][: self.max_post]
        out = []
        for x1, y1, x2, y2, s in dets:
            xmin = int(x1 / im_scale)
            ymin = int(y1 / im_scale)
            out.append(Detection(float(s), xmin, ymin,
                                 int(x2 / im_scale) - xmin,
                                 int(y2 / im_scale) - ymin))
        return out
