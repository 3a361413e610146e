"""Shared numerical building blocks (TPU-first, NHWC, bf16-compute/fp32-norm).

Numerics match the reference where it matters for weight compatibility:
* sinusoidal timestep embedding is ``concat([cos, sin])``
  (`/root/reference/ldm/modules/diffusionmodules/util.py:151-171`);
* GroupNorm is 32 groups, eps 1e-6
  (`/root/reference/ldm/modules/attention.py:76-77`);
* CLIP's activation is quick-GELU ``x * sigmoid(1.702 x)``.

Normalizations and softmax always compute in float32 regardless of the
module compute dtype — on TPU the VPU cost is negligible and it removes the
bf16 variance-collapse failure mode.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


def timestep_embedding(t: jax.Array, dim: int, max_period: float = 10000.0) -> jax.Array:
    """(N,) fractional timesteps -> (N, dim) sinusoidal embedding, cos-first."""
    half = dim // 2
    freqs = jnp.exp(-jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


class GroupNorm(nn.Module):
    """float32 GroupNorm(32, eps=1e-6) over the trailing channel axis (NHWC)."""
    num_groups: int = 32
    epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        orig_dtype = x.dtype
        y = nn.GroupNorm(num_groups=self.num_groups, epsilon=self.epsilon,
                         dtype=jnp.float32, param_dtype=jnp.float32)(
                             x.astype(jnp.float32))
        return y.astype(orig_dtype)


class LayerNorm(nn.Module):
    """float32 LayerNorm with torch's eps=1e-5 default."""
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        orig_dtype = x.dtype
        y = nn.LayerNorm(epsilon=self.epsilon, dtype=jnp.float32,
                         param_dtype=jnp.float32)(x.astype(jnp.float32))
        return y.astype(orig_dtype)


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """torch F.normalize(p=2) semantics: x / max(||x||, eps).

    Grad-safe at ``x == 0``: jnp.linalg.norm's gradient at zero is NaN
    (0/0 inside sqrt's chain rule), whereas torch assigns the norm a zero
    subgradient there — the double-where keeps the zero-vector branch's
    gradient finite and torch-like (output x/eps, d/dx = 1/eps).
    """
    sq = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    norm = jnp.where(sq > 0, jnp.sqrt(jnp.where(sq > 0, sq, 1.0)), 0.0)
    return x / jnp.maximum(norm, eps)


class ZeroConv(nn.Module):
    """3x3 conv initialized to zero — the reference's zero_module(conv_nd) output
    layers (`openaimodel.py:163-277`)."""
    features: int
    kernel: int = 3
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (self.kernel, self.kernel), padding="SAME",
                       kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros,
                       dtype=self.dtype, param_dtype=jnp.float32)(x)
