"""AutoencoderKL (f=8 KL VAE) in Flax — NHWC, bf16 compute.

Parity target: the reference AutoencoderKL
(`/root/reference/ldm/models/autoencoder.py:285-443`) with the ldm
Encoder/Decoder (`/root/reference/ldm/modules/diffusionmodules/model.py:368-545`)
and the aigc_id config (`aigc_id.yaml:56-77`): ch 128, ch_mult [1,2,4,4],
2 res blocks, no attention except mid, double_z, embed_dim 4,
scale_factor 0.18215 applied by the caller (ddpm.py get_input).

TPU notes: encoder downsample uses the reference's asymmetric (0,1,0,1) pad +
stride-2 valid conv; decoder upsample is nearest-2x + conv.  The mid-block
single-head full attention runs as one (B, HW, C) matmul pair — at 64x64
latents that is a 4096-token attention, MXU-friendly.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from celebbasis_tpu.ops.attention import attention
from celebbasis_tpu.ops.basic import GroupNorm
from celebbasis_tpu.ops.resize import upsample2x_nearest


@dataclass(frozen=True)
class VAEConfig:
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    embed_dim: int = 4
    in_ch: int = 3
    out_ch: int = 3
    scale_factor: float = 0.18215
    # Legacy-LDM first-stage knobs (reference model.py:368-545): in-level
    # self-attention at the listed *spatial resolutions* (not downsample
    # rates — `resolution` anchors the per-level resolution ladder), and
    # single-moment encoders for VQ stages (double_z=False).
    attn_resolutions: Tuple[int, ...] = ()
    double_z: bool = True
    resolution: int = 256
    # reference make_attn (model.py:276-285): 'vanilla' full attention or
    # 'none' (nn.Identity everywhere — vq-f4-noattn, inpainting_big)
    attn_type: str = "vanilla"

    def level_res(self, level: int) -> int:
        """Spatial resolution at `level` (reference curr_res ladder)."""
        return self.resolution >> level

    @staticmethod
    def sd_v1() -> "VAEConfig":
        return VAEConfig()

    @staticmethod
    def tiny() -> "VAEConfig":
        return VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1)


class VAEResBlock(nn.Module):
    out_ch: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        h = GroupNorm(name="norm1")(x)
        h = nn.swish(h)
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(h)
        h = GroupNorm(name="norm2")(h)
        h = nn.swish(h)
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name="nin_shortcut")(x)
        return x + h


class VAEAttnBlock(nn.Module):
    """Single-head full self-attention over spatial tokens (model.py:120-155)."""
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = GroupNorm(name="norm")(x)
        conv1 = lambda name: nn.Conv(C, (1, 1), dtype=self.dtype,
                                     param_dtype=jnp.float32, name=name)
        q = conv1("q")(h).reshape(B, H * W, C)
        k = conv1("k")(h).reshape(B, H * W, C)
        v = conv1("v")(h).reshape(B, H * W, C)
        out = attention(q, k, v, num_heads=1).reshape(B, H, W, C)
        return x + conv1("proj_out")(out)


class Encoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = nn.Conv(cfg.ch, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_in")(x.astype(self.dtype))
        for level, mult in enumerate(cfg.ch_mult):
            ch = cfg.ch * mult
            for j in range(cfg.num_res_blocks):
                h = VAEResBlock(ch, self.dtype, name=f"down_{level}_res_{j}")(h)
                if (cfg.level_res(level) in cfg.attn_resolutions
                        and cfg.attn_type != "none"):
                    h = VAEAttnBlock(self.dtype,
                                     name=f"down_{level}_attn_{j}")(h)
            if level != len(cfg.ch_mult) - 1:
                # reference Downsample: pad (0,1,0,1), stride-2 VALID conv
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding="VALID",
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=f"down_{level}_downsample")(h)
        ch = cfg.ch * cfg.ch_mult[-1]
        h = VAEResBlock(ch, self.dtype, name="mid_res_0")(h)
        if cfg.attn_type != "none":
            h = VAEAttnBlock(self.dtype, name="mid_attn")(h)
        h = VAEResBlock(ch, self.dtype, name="mid_res_1")(h)
        h = GroupNorm(name="norm_out")(h)
        h = nn.swish(h)
        out_ch = (2 if cfg.double_z else 1) * cfg.z_channels
        h = nn.Conv(out_ch, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_out")(h)
        return h


class Decoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        ch = cfg.ch * cfg.ch_mult[-1]
        h = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_in")(z.astype(self.dtype))
        h = VAEResBlock(ch, self.dtype, name="mid_res_0")(h)
        if cfg.attn_type != "none":
            h = VAEAttnBlock(self.dtype, name="mid_attn")(h)
        h = VAEResBlock(ch, self.dtype, name="mid_res_1")(h)
        for level, mult in reversed(list(enumerate(cfg.ch_mult))):
            ch = cfg.ch * mult
            for j in range(cfg.num_res_blocks + 1):
                h = VAEResBlock(ch, self.dtype, name=f"up_{level}_res_{j}")(h)
                if (cfg.level_res(level) in cfg.attn_resolutions
                        and cfg.attn_type != "none"):
                    h = VAEAttnBlock(self.dtype, name=f"up_{level}_attn_{j}")(h)
            if level != 0:
                h = upsample2x_nearest(h)
                h = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                            param_dtype=jnp.float32,
                            name=f"up_{level}_upsample")(h)
        h = GroupNorm(name="norm_out")(h)
        h = nn.swish(h)
        h = nn.Conv(cfg.out_ch, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_out")(h)
        return h.astype(jnp.float32)


class AutoencoderKL(nn.Module):
    """encode -> (mean, logvar); decode(z) -> image. Caller applies 0.18215."""
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.encoder = Encoder(self.cfg, self.dtype)
        self.decoder = Decoder(self.cfg, self.dtype)
        self.quant_conv = nn.Conv(2 * self.cfg.embed_dim, (1, 1),
                                  dtype=self.dtype, param_dtype=jnp.float32)
        self.post_quant_conv = nn.Conv(self.cfg.z_channels, (1, 1),
                                       dtype=self.dtype, param_dtype=jnp.float32)

    def encode(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """x: (B,H,W,3) in [-1,1] -> posterior (mean, logvar), each (B,H/8,W/8,4)."""
        moments = self.quant_conv(self.encoder(x)).astype(jnp.float32)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z: jax.Array) -> jax.Array:
        return self.decoder(self.post_quant_conv(z.astype(self.dtype)))

    def __call__(self, x, rng):
        mean, logvar = self.encode(x)
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape)
        return self.decode(z), mean, logvar


def sample_posterior(rng, mean, logvar):
    """DiagonalGaussianDistribution.sample (distributions.py:24-64)."""
    return mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape)
