"""IResNet face-recognition backbones (ArcFace/CosFace family) in Flax.

Parity target: `/root/reference/ldm/modules/id_embedding/iresnet.py` —
the frozen CosFace IResNet-100 (Glint360K) used as the training-path face
encoder (112x112 in, 512-d id vector out) and its smaller siblings.

Structure per IBasicBlock: BN - conv3x3 - BN - PReLU - conv3x3(stride) - BN,
plus a conv1x1+BN downsample shortcut; stem conv3x3/BN/PReLU; head
BN - flatten - Dense(512) - BN1d.  Always run frozen/inference here
(the reference wraps it in no_grad, meta_net.py:253-264), so BatchNorm uses
stored running statistics as parameters — no mutable state under jit.

NHWC, bf16-friendly; the whole net is conv+BN chains XLA fuses aggressively.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


@dataclass(frozen=True)
class IResNetConfig:
    layers: Tuple[int, int, int, int] = (3, 13, 30, 3)  # r100
    feat_dim: int = 512
    base: int = 64          # stem width; levels are base * (1,2,4,8)
    input_size: int = 112

    @staticmethod
    def r100() -> "IResNetConfig":
        return IResNetConfig((3, 13, 30, 3))

    @staticmethod
    def r50() -> "IResNetConfig":
        return IResNetConfig((3, 4, 14, 3))

    @staticmethod
    def r18() -> "IResNetConfig":
        return IResNetConfig((2, 2, 2, 2))

    @staticmethod
    def tiny() -> "IResNetConfig":
        return IResNetConfig((1, 1, 1, 1), feat_dim=64, base=8, input_size=32)


class FrozenBN(nn.Module):
    """Inference-mode BatchNorm: (x - mean) / sqrt(var + eps) * scale + bias.

    Running statistics are ordinary parameters (the backbone is always frozen), so
    there is no Flax mutable-state plumbing in the jitted step.
    """
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (dim,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (dim,), jnp.float32)
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        return (x.astype(jnp.float32) - mean) * inv + bias


class PReLU(nn.Module):
    """Per-channel parametric ReLU (torch nn.PReLU(num_parameters=C))."""

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        alpha = self.param("alpha", nn.initializers.constant(0.25), (dim,),
                           jnp.float32)
        return jnp.where(x >= 0, x, alpha * x)


class IBasicBlock(nn.Module):
    planes: int
    stride: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        conv = lambda s, name: nn.Conv(self.planes, (3, 3), strides=(s, s),
                                       padding=((1, 1), (1, 1)), use_bias=False,
                                       dtype=self.dtype, param_dtype=jnp.float32,
                                       name=name)
        h = FrozenBN(name="bn1")(x).astype(self.dtype)
        h = conv(1, "conv1")(h)
        h = FrozenBN(name="bn2")(h)
        h = PReLU(name="prelu")(h).astype(self.dtype)
        h = conv(self.stride, "conv2")(h)
        h = FrozenBN(name="bn3")(h)
        if self.stride != 1 or x.shape[-1] != self.planes:
            sc = nn.Conv(self.planes, (1, 1), strides=(self.stride,) * 2,
                         use_bias=False, dtype=self.dtype,
                         param_dtype=jnp.float32, name="down_conv")(x)
            sc = FrozenBN(name="down_bn")(sc)
        else:
            sc = x
        return (h + sc).astype(self.dtype)


class IResNet(nn.Module):
    cfg: IResNetConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, S, S, 3) in [-1, 1] -> (B, feat_dim) float32 id features."""
        cfg = self.cfg
        base = cfg.base
        h = nn.Conv(base, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="stem_conv")(x.astype(self.dtype))
        h = FrozenBN(name="stem_bn")(h)
        h = PReLU(name="stem_prelu")(h).astype(self.dtype)
        planes = base
        for li, n_blocks in enumerate(cfg.layers):
            planes = base * (2 ** li)
            for bi in range(n_blocks):
                stride = 2 if bi == 0 else 1
                h = IBasicBlock(planes, stride, self.dtype,
                                name=f"layer{li + 1}_block{bi}")(h)
        h = FrozenBN(name="head_bn")(h)
        h = h.reshape(h.shape[0], -1)
        h = nn.Dense(cfg.feat_dim, dtype=jnp.float32, param_dtype=jnp.float32,
                     name="fc")(h.astype(jnp.float32))
        h = FrozenBN(name="features")(h)
        return h
