"""Nearest-neighbor 2x upsampling as broadcast+reshape.

``jax.image.resize(method='nearest')`` lowers to a gather on TPU; the
equivalent broadcast/reshape compiles to pure data movement XLA fuses with
the following conv. Used by the UNet and VAE decoders' Upsample stages.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def upsample2x_nearest(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, 2H, 2W, C), exact nearest-neighbor x2."""
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, 2 * H, 2 * W, C)
