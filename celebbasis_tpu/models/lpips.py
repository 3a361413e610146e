"""LPIPS perceptual loss (VGG16 variant) — Flax, NHWC, torch-free runtime.

Parity target: taming's ``LPIPS`` as consumed by the reference autoencoder
loss (`/root/reference/ldm/modules/losses/contperceptual.py:7-27`,
``self.perceptual_loss = LPIPS().eval()``): a frozen VGG16 feature stack at
the five relu{1_2,2_2,3_3,4_3,5_3} taps, channel-normalized feature diffs,
learned non-negative 1x1 heads, spatial averaging, summed over taps.
taming is not vendored in the reference; the algorithm is the public LPIPS
(Zhang et al. 2018, arXiv:1801.03924) construction.

Weights: the VGG16 backbone follows torchvision's layout (bridged via
``utils.bridge.convert_vgg16``); the linear heads load from a taming/LPIPS
checkpoint when available.  Without pretrained files everything runs
random-init (this image ships no weights) — the *graph* is what the loss
needs for training-step parity, and the bridge makes real weights a drop-in.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

# torchvision vgg16.features conv channel plan; 'M' = 2x2 maxpool.
_VGG16_PLAN: Tuple = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                      512, 512, 512, "M", 512, 512, 512)
# relu taps used by LPIPS (count of convs applied before each tap)
_TAPS = (2, 4, 7, 10, 13)
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


class VGG16Features(nn.Module):
    """VGG16 conv trunk returning the five LPIPS relu taps (NHWC)."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Sequence[jax.Array]:
        taps = []
        conv_i = 0
        h = x.astype(self.dtype)
        for item in _VGG16_PLAN:
            if item == "M":
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
                continue
            h = nn.Conv(item, (3, 3), padding="SAME", dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"conv_{conv_i}")(h)
            h = nn.relu(h)
            conv_i += 1
            if conv_i in _TAPS:
                taps.append(h)
        return taps


def _norm_channels(x: jax.Array) -> jax.Array:
    """unit_normalize along channels (LPIPS/taming normalize_tensor:
    x / (sqrt(sum(x^2)) + eps), eps OUTSIDE the sqrt — taming
    modules/losses/lpips.py semantics)."""
    return x / (jnp.sqrt(jnp.sum(x ** 2, axis=-1, keepdims=True)) + 1e-10)


class LPIPS(nn.Module):
    """lpips(x, y): (B,H,W,3) in [-1,1] -> (B,1,1,1) perceptual distance."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        shift = jnp.asarray(_SHIFT, self.dtype)
        scale = jnp.asarray(_SCALE, self.dtype)
        vgg = VGG16Features(self.dtype, name="vgg")
        fx = vgg((x.astype(self.dtype) - shift) / scale)
        fy = vgg((y.astype(self.dtype) - shift) / scale)
        total = None
        for i, (a, b) in enumerate(zip(fx, fy)):
            d = (_norm_channels(a) - _norm_channels(b)) ** 2
            w = self.param(f"lin_{i}", nn.initializers.uniform(0.1),
                           (d.shape[-1],), jnp.float32)
            # taming's NetLinLayer is a 1x1 conv with non-negative learned
            # weights; elementwise channel weights are the same contraction
            contrib = jnp.mean(jnp.sum(d * jnp.abs(w), axis=-1,
                                       keepdims=True),
                               axis=(1, 2), keepdims=True)
            total = contrib if total is None else total + contrib
        return total.astype(jnp.float32)
