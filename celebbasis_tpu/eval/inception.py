"""InceptionV3-pool3 feature extractor for FID — Flax/NHWC, torch bridge.

The reference's FID contract is torch-fidelity's InceptionV3 pool3 features
(`/root/reference/evaluation/fid/copy_together.py` flattens folders, the
README eval recipe shells out to ``fidelity --fid``).  This is the same
"FID Inception" network popularized by mseitzer/pytorch-fid: torchvision's
InceptionV3 graph with the TF-port quirks —

* BasicConv2d = conv(bias=False) + BatchNorm(eps=1e-3) + ReLU;
* the InceptionA/C and first InceptionE blocks use
  ``avg_pool(count_include_pad=False)`` in their pool branch;
* the last InceptionE block (Mixed_7c) uses a stride-1 **max** pool there
  (a TF-inception artifact the FID weights were trained with);
* input pipeline: resize to 299x299 bilinear (half-pixel centers,
  ``align_corners=False``) then map [0,1] -> [-1,1].

Module/parameter names mirror the torch state-dict
(``Mixed_5b.branch1x1.conv.weight`` ...) so the weight bridge is a pure
transpose; ``convert_inception`` consumes either pytorch-fid's
``pt_inception-2015-12-05`` weights or a torchvision ``inception_v3``
state-dict (FID-relevant keys are identical; aux-logit/fc keys are ignored).
All compute is NHWC; pooling/stem convs are VALID like torch's default.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

POOL3_DIM = 2048


def _pad2(p: Tuple[int, int]) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    return ((p[0], p[0]), (p[1], p[1]))


class BasicConv2d(nn.Module):
    out: int
    kernel: Tuple[int, int] = (1, 1)
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out, self.kernel, self.stride,
                    padding=_pad2(self.padding), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         dtype=jnp.float32, name="bn")(x)
        return nn.relu(x)


def _avg_pool_3(x):
    """3x3 stride-1 pad-1 average pool, count_include_pad=False (the FID
    variant's divergence from stock torchvision)."""
    return nn.avg_pool(x, (3, 3), (1, 1), padding=((1, 1), (1, 1)),
                       count_include_pad=False)


def _max_pool(x, k: int, s: int, p: int = 0):
    return nn.max_pool(x, (k, k), (s, s), padding=((p, p), (p, p)))


class InceptionA(nn.Module):
    pool_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b1 = BasicConv2d(64, dtype=d, name="branch1x1")(x)
        b5 = BasicConv2d(48, dtype=d, name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), dtype=d,
                         name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, dtype=d, name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=d,
                         name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=d,
                         name="branch3x3dbl_3")(b3)
        bp = BasicConv2d(self.pool_features, dtype=d,
                         name="branch_pool")(_avg_pool_3(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b3 = BasicConv2d(384, (3, 3), (2, 2), dtype=d, name="branch3x3")(x)
        bd = BasicConv2d(64, dtype=d, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=d,
                         name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), (2, 2), dtype=d,
                         name="branch3x3dbl_3")(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d, c7 = self.dtype, self.channels_7x7
        b1 = BasicConv2d(192, dtype=d, name="branch1x1")(x)
        b7 = BasicConv2d(c7, dtype=d, name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=d,
                         name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=d,
                         name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, dtype=d, name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=d,
                         name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=d,
                         name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=d,
                         name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=d,
                         name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, dtype=d, name="branch_pool")(_avg_pool_3(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b3 = BasicConv2d(192, dtype=d, name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), (2, 2), dtype=d, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, dtype=d, name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=d,
                         name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=d,
                         name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), (2, 2), dtype=d, name="branch7x7x3_4")(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_kind: str = "avg"   # 'avg' (Mixed_7b) | 'max' (Mixed_7c, TF quirk)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b1 = BasicConv2d(320, dtype=d, name="branch1x1")(x)
        b3 = BasicConv2d(384, dtype=d, name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), dtype=d,
                        name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=(1, 0), dtype=d,
                        name="branch3x3_2b")(b3)], axis=-1)
        bd = BasicConv2d(448, dtype=d, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), dtype=d,
                         name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), dtype=d,
                        name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=(1, 0), dtype=d,
                        name="branch3x3dbl_3b")(bd)], axis=-1)
        pooled = (_max_pool(x, 3, 1, 1) if self.pool_kind == "max"
                  else _avg_pool_3(x))
        bp = BasicConv2d(192, dtype=d, name="branch_pool")(pooled)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """Pool3 feature extractor: (N, 299, 299, 3) in [-1,1] -> (N, 2048)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        x = x.astype(d)
        x = BasicConv2d(32, (3, 3), (2, 2), dtype=d, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), dtype=d, name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), dtype=d,
                        name="Conv2d_2b_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = BasicConv2d(80, dtype=d, name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), dtype=d, name="Conv2d_4a_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = InceptionA(32, dtype=d, name="Mixed_5b")(x)
        x = InceptionA(64, dtype=d, name="Mixed_5c")(x)
        x = InceptionA(64, dtype=d, name="Mixed_5d")(x)
        x = InceptionB(dtype=d, name="Mixed_6a")(x)
        x = InceptionC(128, dtype=d, name="Mixed_6b")(x)
        x = InceptionC(160, dtype=d, name="Mixed_6c")(x)
        x = InceptionC(160, dtype=d, name="Mixed_6d")(x)
        x = InceptionC(192, dtype=d, name="Mixed_6e")(x)
        x = InceptionD(dtype=d, name="Mixed_7a")(x)
        x = InceptionE("avg", dtype=d, name="Mixed_7b")(x)
        x = InceptionE("max", dtype=d, name="Mixed_7c")(x)
        return x.mean(axis=(1, 2)).astype(jnp.float32)  # adaptive avg pool


# -- input pipeline -----------------------------------------------------------

def resize_bilinear_torch(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """(B,H,W,C) bilinear resize with torch ``interpolate(align_corners=
    False)`` semantics: half-pixel centers, **no antialiasing** (unlike
    jax.image.resize, which low-pass filters on downsample — a different
    result from what pytorch-fid feeds the network)."""
    B, H, W, C = x.shape
    h, w = size

    def coords(n_out: int, n_in: int):
        i = jnp.arange(n_out, dtype=jnp.float32)
        return jnp.clip((i + 0.5) * (n_in / n_out) - 0.5, 0.0, n_in - 1.0)

    fy, fx = coords(h, H), coords(w, W)
    y0 = jnp.floor(fy).astype(jnp.int32)
    x0 = jnp.floor(fx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wy = (fy - y0)[None, :, None, None]
    wx = (fx - x0)[None, None, :, None]
    rows0, rows1 = x[:, y0], x[:, y1]            # (B,h,W,C)
    top = rows0[:, :, x0] * (1 - wx) + rows0[:, :, x1] * wx
    bot = rows1[:, :, x0] * (1 - wx) + rows1[:, :, x1] * wx
    return top * (1 - wy) + bot * wy


def preprocess(batch_uint8: np.ndarray, size: int = 299) -> jnp.ndarray:
    """uint8 RGB (B,H,W,3) -> (B,299,299,3) float in [-1,1].

    Bilinear resize with half-pixel centers and no antialias (torch
    ``align_corners=False`` — what pytorch-fid's ``resize_input`` does),
    then the [0,1] -> [-1,1] normalization."""
    x = jnp.asarray(batch_uint8, jnp.float32) / 255.0
    if x.shape[1] != size or x.shape[2] != size:
        x = resize_bilinear_torch(x, (size, size))
    return x * 2.0 - 1.0


# -- torch weight bridge ------------------------------------------------------

def convert_inception(state: Dict[str, np.ndarray]) -> Dict:
    """torch InceptionV3 state-dict -> flax variables {params, batch_stats}.

    Accepts pytorch-fid's pt_inception weights or torchvision inception_v3;
    AuxLogits/fc keys are skipped (not part of pool3).
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, path: Sequence[str], leaf):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf

    for key, val in state.items():
        if key.startswith(("AuxLogits", "fc.")) or key.endswith(
                "num_batches_tracked"):
            continue
        parts = key.split(".")
        arr = np.asarray(val, np.float32)
        mod, leaf = parts[-2], parts[-1]
        scope = parts[:-2]
        if mod == "conv" and leaf == "weight":
            put(params, scope + ["conv", "kernel"], arr.transpose(2, 3, 1, 0))
        elif mod == "bn" and leaf == "weight":
            put(params, scope + ["bn", "scale"], arr)
        elif mod == "bn" and leaf == "bias":
            put(params, scope + ["bn", "bias"], arr)
        elif mod == "bn" and leaf == "running_mean":
            put(stats, scope + ["bn", "mean"], arr)
        elif mod == "bn" and leaf == "running_var":
            put(stats, scope + ["bn", "var"], arr)
        else:
            raise ValueError(f"unexpected inception key {key!r}")
    return {"params": params, "batch_stats": stats}


def load_inception(weights_path: str | None = None, dtype=jnp.float32):
    """-> (feature_fn: uint8 batch -> (B, 2048) np features, variables).

    Without weights (absent in this image) the net is randomly initialized —
    useful for shape/contract tests only; FID numbers need the pt_inception
    checkpoint.
    """
    net = InceptionV3(dtype=dtype)
    if weights_path:
        from celebbasis_tpu.utils.pt_io import load_pt
        state = load_pt(weights_path)
        if isinstance(state, dict) and "state_dict" in state:
            state = state["state_dict"]
        variables = convert_inception(
            {k: np.asarray(v) for k, v in state.items()})
    else:
        variables = net.init(jax.random.key(0),
                             jnp.zeros((1, 299, 299, 3), jnp.float32))

    @jax.jit
    def _fwd(vs, x):
        return net.apply(vs, x)

    def feature_fn(batch_uint8: np.ndarray) -> np.ndarray:
        return np.asarray(_fwd(variables, preprocess(batch_uint8)))

    return feature_fn, variables
