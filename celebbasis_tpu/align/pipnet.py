"""PIPNet landmark detector — Flax ResNet-101 + PIP heads + jitted decode.

Parity target: `/root/reference/evaluation/face_align/PIPNet/lib/`
(networks.py Pip_resnet101, functions.py forward_pip, tools.py demo_image).

Design deltas for TPU:
* the 3,338-line hardcoded ``reverse_index.py`` lookup table is replaced by
  ``meanface_indices`` — the exact derivation the table was generated with
  (functions.py get_meanface: per-landmark nearest neighbors, reversed map
  padded to max_len) computed at load time from a meanface file or array;
* argmax + offset + neighbor-merge decode is one jitted function of the five
  head outputs (batch, static shapes) instead of a per-face torch loop;
* backbone BN is frozen-parameter BN (inference only, like the face nets).

Heads: 1x1 convs over the stride-32 2048-ch map: cls (L), x (L), y (L),
nb_x (L*num_nb), nb_y (L*num_nb); L=98 for WFLW.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from celebbasis_tpu.models.iresnet import FrozenBN

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def _resize_linear(img: np.ndarray, size: int) -> np.ndarray:
    """cv2.resize(img, (size, size)) INTER_LINEAR — the exact box-crop
    resample of the reference chain (tools.py:123).  PIL-BILINEAR fallback
    when cv2 is absent (PIL area-averages on downscale, so crops can differ
    from the reference by a few grey levels — cv2 ships in this image)."""
    try:
        import cv2
        return cv2.resize(img, (size, size))
    except ImportError:                               # pragma: no cover
        from PIL import Image
        return np.asarray(Image.fromarray(img).resize(
            (size, size), Image.BILINEAR), np.uint8)


@dataclass(frozen=True)
class PIPNetConfig:
    num_lms: int = 98
    num_nb: int = 10
    input_size: int = 256
    net_stride: int = 32
    arch: str = "resnet"                        # resnet | mbnetv2 | mbnetv3
    block: str = "bottleneck"                   # bottleneck | basic (resnet)
    layers: Tuple[int, ...] = (3, 4, 23, 3)     # resnet101
    width: int = 64

    @staticmethod
    def tiny() -> "PIPNetConfig":
        return PIPNetConfig(num_lms=12, num_nb=3, input_size=64,
                            layers=(1, 1, 1, 1), width=8)

    # the reference's five Pip_* wrappers (lib/networks.py)
    @staticmethod
    def resnet101(**kw) -> "PIPNetConfig":
        return PIPNetConfig(layers=(3, 4, 23, 3), **kw)

    @staticmethod
    def resnet50(**kw) -> "PIPNetConfig":
        return PIPNetConfig(layers=(3, 4, 6, 3), **kw)

    @staticmethod
    def resnet18(**kw) -> "PIPNetConfig":
        return PIPNetConfig(block="basic", layers=(2, 2, 2, 2), **kw)

    @staticmethod
    def mbnetv2(**kw) -> "PIPNetConfig":
        return PIPNetConfig(arch="mbnetv2", **kw)

    @staticmethod
    def mbnetv3(**kw) -> "PIPNetConfig":
        return PIPNetConfig(arch="mbnetv3", **kw)


class Bottleneck(nn.Module):
    planes: int
    stride: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * 4
        conv = lambda f, k, s, name: nn.Conv(
            f, (k, k), strides=(s, s), padding=((k // 2,) * 2,) * 2,
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            name=name)
        h = nn.relu(FrozenBN(name="bn1")(conv(self.planes, 1, 1, "conv1")(x))
                    ).astype(self.dtype)
        h = nn.relu(FrozenBN(name="bn2")(
            conv(self.planes, 3, self.stride, "conv2")(h))).astype(self.dtype)
        h = FrozenBN(name="bn3")(conv(out_ch, 1, 1, "conv3")(h))
        if self.stride != 1 or x.shape[-1] != out_ch:
            sc = FrozenBN(name="down_bn")(
                conv(out_ch, 1, self.stride, "down_conv")(x))
        else:
            sc = x
        return nn.relu(h + sc).astype(self.dtype)


class BasicBlock(nn.Module):
    """torchvision BasicBlock (resnet18/34): stride on conv1, expansion 1."""
    planes: int
    stride: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        conv = lambda f, k, s, name: nn.Conv(
            f, (k, k), strides=(s, s), padding=((k // 2,) * 2,) * 2,
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            name=name)
        h = nn.relu(FrozenBN(name="bn1")(
            conv(self.planes, 3, self.stride, "conv1")(x))).astype(self.dtype)
        h = FrozenBN(name="bn2")(conv(self.planes, 3, 1, "conv2")(h))
        if self.stride != 1 or x.shape[-1] != self.planes:
            sc = FrozenBN(name="down_bn")(
                conv(self.planes, 1, self.stride, "down_conv")(x))
        else:
            sc = x
        return nn.relu(h + sc).astype(self.dtype)


class ResNetBackbone(nn.Module):
    cfg: PIPNetConfig
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = nn.Conv(cfg.width, (7, 7), strides=(2, 2),
                    padding=((3, 3), (3, 3)), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv1")(x)
        h = nn.relu(FrozenBN(name="bn1")(h)).astype(self.dtype)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        block = Bottleneck if cfg.block == "bottleneck" else BasicBlock
        for li, n_blocks in enumerate(cfg.layers):
            planes = cfg.width * (2 ** li)
            for bi in range(n_blocks):
                stride = 2 if (bi == 0 and li > 0) else 1
                h = block(planes, stride, self.dtype,
                          name=f"layer{li + 1}_block{bi}")(h)
        return h


def _hsigmoid(x):
    # reference mobilenetv3.py h_sigmoid: relu6(x + 3) / 6
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def _make_divisible(v, divisor=8, min_value=None):
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class _ConvBN(nn.Module):
    """conv + frozen BN + activation ('relu6' | 'hswish' | 'relu' | None)."""
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: str | None = "relu6"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        h = nn.Conv(self.features, (k, k), strides=(self.stride,) * 2,
                    padding=(((k - 1) // 2,) * 2,) * 2, use_bias=False,
                    feature_group_count=self.groups, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(x)
        h = FrozenBN(name="bn")(h)
        if self.act == "relu6":
            h = jnp.clip(h, 0.0, 6.0)
        elif self.act == "relu":
            h = nn.relu(h)
        elif self.act == "hswish":
            h = h * _hsigmoid(h)
        return h.astype(self.dtype)


class SELayer(nn.Module):
    """reference mobilenetv3.py SELayer: pool -> fc -> relu -> fc -> hsigmoid."""
    channel: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = x.astype(jnp.float32).mean(axis=(1, 2))           # (B, C)
        y = nn.relu(nn.Dense(_make_divisible(self.channel // 4),
                             param_dtype=jnp.float32, name="fc1")(y))
        y = _hsigmoid(nn.Dense(self.channel, param_dtype=jnp.float32,
                               name="fc2")(y))
        return (x * y[:, None, None, :]).astype(self.dtype)


# torchvision MobileNetV2 inverted-residual settings (t, c, n, s)
MBV2_SETTINGS = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
                 (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))

# reference mobilenetv3.py mobilenetv3_large cfgs (k, t, c, SE, HS, s)
MBV3_LARGE_CFGS = (
    (3, 1, 16, 0, 0, 1), (3, 4, 24, 0, 0, 2), (3, 3, 24, 0, 0, 1),
    (5, 3, 40, 1, 0, 2), (5, 3, 40, 1, 0, 1), (5, 3, 40, 1, 0, 1),
    (3, 6, 80, 0, 1, 2), (3, 2.5, 80, 0, 1, 1), (3, 2.3, 80, 0, 1, 1),
    (3, 2.3, 80, 0, 1, 1), (3, 6, 112, 1, 1, 1), (3, 6, 112, 1, 1, 1),
    (5, 6, 160, 1, 1, 2), (5, 6, 160, 1, 1, 1), (5, 6, 160, 1, 1, 1))


class MobileNetV2Backbone(nn.Module):
    """torchvision mobilenet_v2 ``features`` (Pip_mbnetv2 wraps exactly this,
    networks.py:320-363): stem conv32/s2, 17 inverted residuals, 1x1 to 1280,
    ReLU6 throughout, residual add when stride==1 and in==out."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = _ConvBN(32, 3, 2, name="stem", dtype=self.dtype)(x)
        c_in, bi = 32, 1
        for t, c, n, s in MBV2_SETTINGS:
            for i in range(n):
                stride = s if i == 0 else 1
                hidden = c_in * t
                r = h
                name = f"block{bi}"
                if t != 1:
                    h = _ConvBN(hidden, 1, 1, name=f"{name}_expand",
                                dtype=self.dtype)(h)
                h = _ConvBN(hidden, 3, stride, groups=hidden,
                            name=f"{name}_dw", dtype=self.dtype)(h)
                h = _ConvBN(c, 1, 1, act=None, name=f"{name}_pw",
                            dtype=self.dtype)(h)
                if stride == 1 and c_in == c:
                    h = (h + r).astype(self.dtype)
                c_in, bi = c, bi + 1
        return _ConvBN(1280, 1, 1, name="last", dtype=self.dtype)(h)


class MobileNetV3Backbone(nn.Module):
    """The reference's own mobilenetv3_large ``features`` + final 1x1 ``conv``
    (mobilenetv3.py:131-208; Pip_mbnetv3 uses both, networks.py:365-410)."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = _ConvBN(16, 3, 2, act="hswish", name="stem", dtype=self.dtype)(x)
        c_in = 16
        for bi, (k, t, c, use_se, use_hs, s) in enumerate(MBV3_LARGE_CFGS,
                                                          start=1):
            c_out = _make_divisible(c)
            hidden = _make_divisible(c_in * t)
            act = "hswish" if use_hs else "relu"
            r, name = h, f"block{bi}"
            if c_in != hidden:
                h = _ConvBN(hidden, 1, 1, act=act, name=f"{name}_expand",
                            dtype=self.dtype)(h)
                # pw -> dw -> SE -> act -> pw-linear (mobilenetv3.py:108-122:
                # the activation comes AFTER the SE block in the expand path)
                h = _ConvBN(hidden, k, s, groups=hidden, act=None,
                            name=f"{name}_dw", dtype=self.dtype)(h)
                if use_se:
                    h = SELayer(hidden, name=f"{name}_se",
                                dtype=self.dtype)(h)
                h = h * _hsigmoid(h) if use_hs else nn.relu(h)
            else:
                # dw -> act -> SE -> pw-linear (mobilenetv3.py:96-106)
                h = _ConvBN(hidden, k, s, groups=hidden, act=act,
                            name=f"{name}_dw", dtype=self.dtype)(h)
                if use_se:
                    h = SELayer(hidden, name=f"{name}_se",
                                dtype=self.dtype)(h)
            h = _ConvBN(c_out, 1, 1, act=None, name=f"{name}_pw",
                        dtype=self.dtype)(h.astype(self.dtype))
            if s == 1 and c_in == c_out:
                h = (h + r).astype(self.dtype)
            c_in = c_out
        return _ConvBN(_make_divisible(c_in * 6), 1, 1, act="hswish",
                       name="last", dtype=self.dtype)(h)


def apply_backbone(cfg: PIPNetConfig, dtype, x):
    """Backbone + net_stride extras, shared by PIPNet and PIPNetGSSL.

    Must be called from inside a parent module's ``@nn.compact`` ``__call__``
    (submodule names land on the caller's scope, so the param tree — and the
    torch bridge key map — is identical for both heads).
    """
    if cfg.arch == "resnet":
        h = ResNetBackbone(cfg, dtype, name="backbone")(x)
    elif cfg.arch == "mbnetv2":
        h = MobileNetV2Backbone(dtype, name="backbone")(x)
    elif cfg.arch == "mbnetv3":
        h = MobileNetV3Backbone(dtype, name="backbone")(x)
    else:
        raise ValueError(f"unknown PIPNet arch: {cfg.arch!r}")

    # net_stride != 32 extras — resnet wrappers only (networks.py:27-57,
    # 229-267; the mbnet wrappers ignore net_stride)
    if cfg.arch == "resnet" and cfg.net_stride != 32:
        conv_s2 = lambda name: nn.Conv(
            512, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
            dtype=dtype, param_dtype=jnp.float32, name=name)
        if cfg.net_stride == 128:
            h = nn.relu(FrozenBN(name="bn5")(conv_s2("layer5")(h))
                        ).astype(dtype)
            h = nn.relu(FrozenBN(name="bn6")(conv_s2("layer6")(h))
                        ).astype(dtype)
        elif cfg.net_stride == 64:
            h = nn.relu(FrozenBN(name="bn5")(conv_s2("layer5")(h))
                        ).astype(dtype)
        elif cfg.net_stride == 16 and cfg.block == "basic":
            # Pip_resnet18's ConvTranspose2d(512, 512, 4, 2, 1,
            # bias=False) upsample (networks.py:257-264)
            h = nn.ConvTranspose(
                512, (4, 4), strides=(2, 2), padding=((2, 2), (2, 2)),
                use_bias=False, transpose_kernel=True, dtype=dtype,
                param_dtype=jnp.float32, name="deconv1")(h)
            h = nn.relu(FrozenBN(name="bn_deconv1")(h)).astype(dtype)
        else:
            raise ValueError(
                f"net_stride {cfg.net_stride} unsupported for "
                f"block={cfg.block!r} (reference networks.py:265-267)")
    return h


class PIPNet(nn.Module):
    cfg: PIPNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = apply_backbone(cfg, self.dtype, x)
        head = lambda f, name: nn.Conv(f, (1, 1), dtype=self.dtype,
                                       param_dtype=jnp.float32, name=name)(h)
        # (B, g, g, C) heads, returned channel-last
        return (head(cfg.num_lms, "cls"),
                head(cfg.num_lms, "x"),
                head(cfg.num_lms, "y"),
                head(cfg.num_lms * cfg.num_nb, "nb_x"),
                head(cfg.num_lms * cfg.num_nb, "nb_y"))


# -- meanface neighbor machinery (replaces reverse_index.py) ---------------

def meanface_indices(meanface: np.ndarray, num_nb: int
                     ) -> Tuple[np.ndarray, np.ndarray, int]:
    """(L,2) meanface -> (reverse_index1, reverse_index2, max_len).

    The derivation the reference hardcodes (functions.py:31-75): landmark i
    predicts its num_nb nearest meanface neighbors; reversing gives, per
    landmark, the (source-landmark, neighbor-slot) pairs that predict it,
    cyclically padded to the max count (the reference repeats each list 11x
    and truncates, functions.py:62-68 — equivalent for any non-empty list).
    A landmark predicted by *no* neighbor (possible for exotic meanface
    configs; the reference would crash) gets masked slots: ri1 = -1, which
    ``decode_landmarks`` excludes from the merge average.
    """
    L = meanface.shape[0]
    dists = ((meanface[:, None] - meanface[None]) ** 2).sum(-1)
    nb = np.argsort(dists, axis=1)[:, 1: 1 + num_nb]  # (L, num_nb)
    rev = {i: ([], []) for i in range(L)}
    for i in range(L):
        for j in range(num_nb):
            rev[int(nb[i, j])][0].append(i)
            rev[int(nb[i, j])][1].append(j)
    max_len = max(len(rev[i][0]) for i in range(L))
    ri1 = np.full((L, max_len), -1, np.int32)
    ri2 = np.zeros((L, max_len), np.int32)
    for i in range(L):
        src, slot = rev[i]
        if not src:
            continue  # masked row
        reps = -(-max_len // len(src))  # ceil: cyclic pad to max_len
        ri1[i] = (src * reps)[:max_len]
        ri2[i] = (slot * reps)[:max_len]
    return ri1, ri2, max_len


def load_meanface(path: str, num_nb: int):
    with open(path) as f:
        vals = [float(v) for v in f.readlines()[0].strip().split()]
    return meanface_indices(np.asarray(vals).reshape(-1, 2), num_nb)


def decode_landmarks(outputs, cfg: PIPNetConfig, ri1: jnp.ndarray,
                     ri2: jnp.ndarray) -> jnp.ndarray:
    """Five head maps (B,g,g,·) -> (B, L, 2) normalized landmarks.

    The forward_pip + neighbor-merge decode (functions.py:157-213,
    tools.py:136-141), batched and jittable.
    """
    cls, ox, oy, nbx, nby = outputs
    B, g, _, L = cls.shape
    num_nb = cfg.num_nb
    grid = cfg.input_size / cfg.net_stride

    cls_f = cls.transpose(0, 3, 1, 2).reshape(B, L, g * g)
    max_ids = jnp.argmax(cls_f, axis=-1)                       # (B, L)
    ox_f = ox.transpose(0, 3, 1, 2).reshape(B, L, g * g)
    oy_f = oy.transpose(0, 3, 1, 2).reshape(B, L, g * g)
    sel = lambda a: jnp.take_along_axis(a, max_ids[..., None], axis=-1)[..., 0]
    gx = (max_ids % g).astype(jnp.float32)
    gy = (max_ids // g).astype(jnp.float32)
    lx = (gx + sel(ox_f)) / grid                               # (B, L)
    ly = (gy + sel(oy_f)) / grid

    nbx_f = nbx.transpose(0, 3, 1, 2).reshape(B, L, num_nb, g * g)
    nby_f = nby.transpose(0, 3, 1, 2).reshape(B, L, num_nb, g * g)
    seln = lambda a: jnp.take_along_axis(
        a, max_ids[:, :, None, None], axis=-1)[..., 0]         # (B, L, nb)
    nlx = (gx[..., None] + seln(nbx_f)) / grid
    nly = (gy[..., None] + seln(nby_f)) / grid

    # reverse-neighbor merge: landmark i averaged with every (src, slot)
    # prediction that points at it; ri1 == -1 marks masked (padding) slots
    max_len = ri1.shape[1]
    valid = (ri1 >= 0).reshape(-1)                             # (L*max_len,)
    src = jnp.maximum(ri1.reshape(-1), 0)
    rx = jnp.where(valid, nlx[:, src, ri2.reshape(-1)], 0.0)
    ry = jnp.where(valid, nly[:, src, ri2.reshape(-1)], 0.0)
    rx = rx.reshape(B, L, max_len)
    ry = ry.reshape(B, L, max_len)
    denom = 1.0 + valid.reshape(L, max_len).sum(-1)            # own + valid nb
    mx = (lx + rx.sum(-1)) / denom
    my = (ly + ry.sum(-1)) / denom
    return jnp.stack([mx, my], axis=-1)


class PIPNetLandmarker:
    """Detector-box -> 98 landmarks driver (tools.py demo_image parity)."""

    def __init__(self, params, cfg: PIPNetConfig, meanface: np.ndarray,
                 det_box_scale: float = 1.2, ri=None):
        """``ri=(ri1, ri2)`` (L, max_len) int arrays overrides the
        meanface-derived reverse index — e.g. a shipped LUT like the
        reference's reverse_index.py when no meanface file exists."""
        self.cfg = cfg
        self.net = PIPNet(cfg)
        self.params = params
        self.det_box_scale = det_box_scale
        if ri is None:
            ri1, ri2, _ = meanface_indices(meanface, cfg.num_nb)
        else:
            ri1, ri2 = (np.asarray(r, np.int32) for r in ri)
        self._ri1, self._ri2 = jnp.asarray(ri1), jnp.asarray(ri2)
        self._jit = jax.jit(self._forward)

    def _forward(self, params, x_u8):
        # uint8 crop on the wire (4x fewer bytes than fp32 — the transfer,
        # not the net, bounds W0 on tunneled hosts); normalize on device
        x = (x_u8.astype(jnp.float32) / 255.0
             - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        return decode_landmarks(self.net.apply(params, x), self.cfg,
                                self._ri1, self._ri2)

    def landmarks_for_box(self, image: np.ndarray, box) -> np.ndarray:
        """image (H,W,3) uint8, box = Detection -> (L, 2) int pixel coords.

        Exact demo_image contract (tools.py:100-157): the image is whatever
        array the driver holds (cv2-BGR in the demos, PIL-RGB in the
        start_align product path — the reference feeds both through
        unchanged); the 1.2x box crop is cv2-resized to input_size and
        CHANNEL-FLIPPED before the net (tools.py:123-124), so PIPNet always
        consumes the flip of the driver's array.  Replicated verbatim —
        including on the RGB product path, where the reference therefore
        runs the net on BGR — because the crops this produces are the W2
        training inputs."""
        H, W = image.shape[:2]
        s = self.det_box_scale
        xmin, ymin = box.xmin, box.ymin
        xmax = xmin + box.width - 1
        ymax = ymin + box.height - 1
        xmin -= int(box.width * (s - 1) / 2)
        # the top margin is shifted down, not up (alignment trick, tools.py:110)
        ymin += int(box.height * (s - 1) / 2)
        xmax += int(box.width * (s - 1) / 2)
        ymax += int(box.height * (s - 1) / 2)
        xmin, ymin = max(xmin, 0), max(ymin, 0)
        xmax, ymax = min(xmax, W - 1), min(ymax, H - 1)
        w, h = xmax - xmin + 1, ymax - ymin + 1
        crop = image[ymin:ymax, xmin:xmax].astype(np.uint8)
        crop = _resize_linear(crop, self.cfg.input_size)
        crop = crop[:, :, ::-1]  # tools.py:124 — net sees the flipped crop
        lms = np.asarray(self._jit(self.params,
                                   jnp.asarray(np.ascontiguousarray(crop))[None]))[0]
        # int64 like the reference's int() landmark list (tools.py:156):
        # downstream get_5_from_98 divides by 3, and a float32 carrier
        # would round those thirds differently than the reference
        out = np.empty((lms.shape[0], 2), np.int64)
        out[:, 0] = (lms[:, 0] * w).astype(np.int64) + xmin
        out[:, 1] = (lms[:, 1] * h).astype(np.int64) + ymin
        return out
