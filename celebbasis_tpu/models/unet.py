"""Stable Diffusion v1 UNet in Flax — NHWC, bf16 compute, MXU-friendly.

Structural parity with the reference UNetModel
(`/root/reference/ldm/modules/diffusionmodules/openaimodel.py:413-742`) and its
SD v1.4 config (`configs/stable-diffusion/aigc_id.yaml:39-54`):
model_channels 320, channel_mult [1,2,4,4], 2 res blocks/level, spatial
transformers (depth 1, context 768) at downsample rates {1,2,4}, 8 heads,
middle block Res+Attn+Res, skip-concat decoder with 3 blocks/level.

TPU-first design deltas (not a port):
* NHWC layout end to end (TPU conv native layout; torch weights are
  transposed once at bridge time, see ``celebbasis_tpu.utils.bridge``);
* bf16 compute / fp32 params + fp32 GroupNorm & softmax;
* attention through the shared backend-switchable core
  (``celebbasis_tpu.ops.attention``) so the Pallas flash kernel drops in;
* optional ``remat`` per transformer/res block instead of the reference's
  autograd checkpoint Function (`diffusionmodules/util.py:102-148`);
* no data-dependent Python control flow — the module tree is static, jit
  traces once.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from celebbasis_tpu.ops.attention import attention
from celebbasis_tpu.ops.basic import GroupNorm, LayerNorm, ZeroConv, timestep_embedding
from celebbasis_tpu.ops.geglu import geglu_block, geglu_ffn
from celebbasis_tpu.ops.resize import upsample2x_nearest


@dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    model_channels: int = 320
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (4, 2, 1)
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_heads: int = 8
    transformer_depth: int = 1
    context_dim: int = 768
    dropout: float = 0.0
    remat: bool = False
    # Legacy-LDM knobs (openaimodel.py:413-560; used by the shipped
    # latent-diffusion configs): plain spatial self-attention instead of the
    # cross-attention transformer, per-head channel width, FiLM-style
    # time conditioning, and residual up/downsampling blocks.
    use_spatial_transformer: bool = True
    num_head_channels: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False

    def heads_for(self, ch: int) -> int:
        """Reference head resolution (openaimodel.py:539-546, legacy=True):
        a fixed head count unless num_head_channels pins the head width."""
        if self.num_head_channels == -1:
            return self.num_heads
        assert ch % self.num_head_channels == 0, (ch, self.num_head_channels)
        return ch // self.num_head_channels

    @staticmethod
    def sd_v1() -> "UNetConfig":
        return UNetConfig()

    @staticmethod
    def tiny(context_dim: int = 64) -> "UNetConfig":
        return UNetConfig(model_channels=32, channel_mult=(1, 2), num_heads=4,
                          context_dim=context_dim, num_res_blocks=1,
                          attention_resolutions=(1, 2))


def _avg_pool2(x):
    """Downsample(use_conv=False): 2x2 average pool, stride 2."""
    return jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 2, 2, 1),
                                 (1, 2, 2, 1), "VALID") * 0.25


class ResBlock(nn.Module):
    """GN→SiLU→conv, +time-emb, GN→SiLU→zero-conv, residual
    (openaimodel.py:163-277).  ``scale_shift`` is the FiLM-style
    use_scale_shift_norm conditioning; ``up``/``down`` fold a parameter-free
    resample into both branches (resblock_updown)."""
    out_ch: int
    dtype: jnp.dtype
    dropout: float = 0.0
    scale_shift: bool = False
    up: bool = False
    down: bool = False

    @nn.compact
    def __call__(self, x, emb, deterministic=True):
        h = GroupNorm(name="norm1")(x)
        h = nn.silu(h)
        if self.up:
            h, x = upsample2x_nearest(h), upsample2x_nearest(x)
        elif self.down:
            h, x = _avg_pool2(h), _avg_pool2(x)
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(h)
        emb_ch = 2 * self.out_ch if self.scale_shift else self.out_ch
        emb_out = nn.Dense(emb_ch, dtype=self.dtype, param_dtype=jnp.float32,
                           name="emb_proj")(nn.silu(emb))
        if self.scale_shift:
            scale, shift = jnp.split(emb_out[:, None, None, :], 2, axis=-1)
            h = GroupNorm(name="norm2")(h) * (1 + scale) + shift
        else:
            h = h + emb_out[:, None, None, :]
            h = GroupNorm(name="norm2")(h)
        h = nn.silu(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = ZeroConv(self.out_ch, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name="skip")(x)
        return x + h


class AttentionBlock(nn.Module):
    """Plain spatial self-attention (openaimodel.py:278-324 + QKVAttention-
    Legacy :347-376): GN → fused qkv projection with *per-head interleaved*
    [q|k|v] channel layout → softmax(QK^T/sqrt(d)) V → zero out-projection,
    residual.  The 1x1 conv1d of the reference is a Dense over (B, HW, C)
    tokens here (identical math, MXU-shaped)."""
    heads: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, context=None):   # context ignored (self-attn only)
        B, H, W, C = x.shape
        dh = C // self.heads
        h = GroupNorm(name="norm")(x).reshape(B, H * W, C)
        qkv = nn.Dense(3 * C, dtype=self.dtype, param_dtype=jnp.float32,
                       name="qkv")(h)
        # torch reshape(bs*heads, 3*dh, t): channels run [head][q|k|v][dh]
        qkv = qkv.reshape(B, H * W, self.heads, 3, dh)
        q, k, v = (qkv[:, :, :, i, :].reshape(B, H * W, C) for i in range(3))
        out = attention(q, k, v, num_heads=self.heads)
        out = nn.Dense(C, kernel_init=nn.initializers.zeros,
                       dtype=self.dtype, param_dtype=jnp.float32,
                       name="proj_out")(out)
        return x + out.reshape(B, H, W, C)


class CrossAttention(nn.Module):
    """QKV projections (no bias) + out projection (attention.py:152-193)."""
    heads: int
    dim_head: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, context=None):
        context = x if context is None else context
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="to_v")(context)
        out = attention(q, k, v, num_heads=self.heads)
        return nn.Dense(x.shape[-1], dtype=self.dtype, param_dtype=jnp.float32,
                        name="to_out")(out)


class _DenseParams(nn.Module):
    """Declares an nn.Dense-shaped (kernel, bias) pair without running the
    matmul — same names/shapes/init as nn.Dense so checkpoints and the
    torch bridge are unchanged while the compute goes through the fused
    GEGLU kernel."""
    features: int

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (in_features, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return k, b


class _LNLeaf(nn.Module):
    features: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.features,),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return s, b


class _LNParams(nn.Module):
    """Mirror of ops.basic.LayerNorm's param tree (<name>/LayerNorm_0/...)
    for kernels that consume the scale/bias directly."""
    features: int

    @nn.compact
    def __call__(self):
        return _LNLeaf(self.features, name="LayerNorm_0")()


class FeedForwardGEGLU(nn.Module):
    """GEGLU MLP: proj to 2*4d, x*gelu(gate), back to d (attention.py:196-215).

    With ``ln`` (the norm3 scale/bias), computes the whole residual
    sub-block ``x + GEGLU(LN(x))`` through the fused Pallas kernel on TPU
    (ops/geglu.py — the gated intermediate, the norm pass, and the
    residual all stay in VMEM); XLA reference path elsewhere."""
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, ln=None):
        d = x.shape[-1]
        w1, b1 = _DenseParams(d * 8, name="proj_in")(d)
        w2, b2 = _DenseParams(d, name="proj_out")(d * 4)
        if ln is None:
            return geglu_ffn(x.astype(self.dtype), w1, b1, w2, b2)
        return geglu_block(x.astype(self.dtype), ln[0], ln[1], w1, b1, w2, b2)


class BasicTransformerBlock(nn.Module):
    heads: int
    dim_head: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, context):
        x = x + CrossAttention(self.heads, self.dim_head, self.dtype,
                               name="attn1")(LayerNorm(name="norm1")(x))
        x = x + CrossAttention(self.heads, self.dim_head, self.dtype,
                               name="attn2")(LayerNorm(name="norm2")(x), context)
        ln3 = _LNParams(x.shape[-1], name="norm3")()
        x = FeedForwardGEGLU(self.dtype, name="ff")(x, ln=ln3)
        return x


class SpatialTransformer(nn.Module):
    """GN → 1x1 in → transformer blocks on (B,HW,C) tokens → zero 1x1 out + res
    (attention.py:218-261)."""
    heads: int
    depth: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, context):
        B, H, W, C = x.shape
        h = GroupNorm(name="norm")(x)
        h = nn.Conv(C, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name="proj_in")(h)
        h = h.reshape(B, H * W, C)
        for i in range(self.depth):
            h = BasicTransformerBlock(self.heads, C // self.heads, self.dtype,
                                      name=f"block_{i}")(h, context)
        h = h.reshape(B, H, W, C)
        h = nn.Conv(C, (1, 1), kernel_init=nn.initializers.zeros,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="proj_out")(h)
        return x + h


class UNetModel(nn.Module):
    cfg: UNetConfig
    dtype: jnp.dtype = jnp.bfloat16

    def _res(self, out_ch, name):
        block = ResBlock(out_ch, self.dtype, self.cfg.dropout, name=name)
        return block

    @nn.compact
    def __call__(self, x: jax.Array, timesteps: jax.Array,
                 context: jax.Array | None = None) -> jax.Array:
        """x: (B, H, W, C) latents; timesteps: (B,); context: (B, T, D)
        cross-attention tokens (None for the legacy unconditional configs,
        whose AttentionBlock is self-attention only).

        Returns eps prediction (B, H, W, out_channels) in float32.
        """
        cfg = self.cfg
        ch0 = cfg.model_channels
        Res = nn.remat(ResBlock) if cfg.remat else ResBlock
        attn_cls = SpatialTransformer if cfg.use_spatial_transformer \
            else AttentionBlock
        Attn = nn.remat(attn_cls, static_argnums=()) if cfg.remat else attn_cls

        def mk_attn(ch: int, name: str):
            heads = cfg.heads_for(ch)
            if cfg.use_spatial_transformer:
                return Attn(heads, cfg.transformer_depth, self.dtype,
                            name=name)
            return Attn(heads, self.dtype, name=name)

        t_emb = timestep_embedding(timesteps, ch0)
        emb = nn.Dense(ch0 * 4, dtype=self.dtype, param_dtype=jnp.float32,
                       name="time_fc1")(t_emb.astype(self.dtype))
        emb = nn.Dense(ch0 * 4, dtype=self.dtype, param_dtype=jnp.float32,
                       name="time_fc2")(nn.silu(emb))

        x = x.astype(self.dtype)
        if context is not None:
            context = context.astype(self.dtype)

        h = nn.Conv(ch0, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_in")(x)
        skips = [h]
        ds = 1
        # --- encoder ---
        for level, mult in enumerate(cfg.channel_mult):
            ch = ch0 * mult
            for j in range(cfg.num_res_blocks):
                h = Res(ch, self.dtype, cfg.dropout,
                        cfg.use_scale_shift_norm,
                        name=f"down_{level}_res_{j}")(h, emb)
                if ds in cfg.attention_resolutions:
                    h = mk_attn(ch, f"down_{level}_attn_{j}")(h, context)
                skips.append(h)
            if level != len(cfg.channel_mult) - 1:
                if cfg.resblock_updown:
                    h = Res(ch, self.dtype, cfg.dropout,
                            cfg.use_scale_shift_norm, down=True,
                            name=f"down_{level}_downsample")(h, emb)
                else:
                    h = nn.Conv(ch, (3, 3), strides=(2, 2),
                                padding=((1, 1), (1, 1)),
                                dtype=self.dtype, param_dtype=jnp.float32,
                                name=f"down_{level}_downsample")(h)
                skips.append(h)
                ds *= 2
        # --- middle ---
        ch = ch0 * cfg.channel_mult[-1]
        h = Res(ch, self.dtype, cfg.dropout, cfg.use_scale_shift_norm,
                name="mid_res_0")(h, emb)
        h = mk_attn(ch, "mid_attn")(h, context)
        h = Res(ch, self.dtype, cfg.dropout, cfg.use_scale_shift_norm,
                name="mid_res_1")(h, emb)
        # --- decoder ---
        for level, mult in reversed(list(enumerate(cfg.channel_mult))):
            ch = ch0 * mult
            for j in range(cfg.num_res_blocks + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = Res(ch, self.dtype, cfg.dropout,
                        cfg.use_scale_shift_norm,
                        name=f"up_{level}_res_{j}")(h, emb)
                if ds in cfg.attention_resolutions:
                    h = mk_attn(ch, f"up_{level}_attn_{j}")(h, context)
            if level != 0:
                if cfg.resblock_updown:
                    h = Res(ch, self.dtype, cfg.dropout,
                            cfg.use_scale_shift_norm, up=True,
                            name=f"up_{level}_upsample")(h, emb)
                else:
                    h = upsample2x_nearest(h)
                    h = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                                param_dtype=jnp.float32,
                                name=f"up_{level}_upsample")(h)
                ds //= 2
        assert not skips
        h = GroupNorm(name="norm_out")(h)
        h = nn.silu(h)
        h = ZeroConv(cfg.out_channels, dtype=self.dtype, name="conv_out")(h)
        return h.astype(jnp.float32)


class AttentionPool2d(nn.Module):
    """CLIP-style attention pooling (openaimodel.py:32-59): prepend the
    spatial mean as a query token, learned positional embedding, one
    multi-head attention round, return the pooled token.  The reference's
    1x1 conv1d projections are Dense layers over tokens; its QKVAttention
    (new order) chunks q|k|v along channels *before* splitting heads —
    matched here by slicing the fused projection in thirds."""
    num_head_channels: int
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        t = x.reshape(B, H * W, C)
        t = jnp.concatenate([jnp.mean(t, axis=1, keepdims=True), t], axis=1)
        pos = self.param("pos_emb",
                         nn.initializers.normal(stddev=1.0 / C ** 0.5),
                         (H * W + 1, C), jnp.float32)
        t = t + pos[None]
        qkv = nn.Dense(3 * C, dtype=self.dtype, param_dtype=jnp.float32,
                       name="qkv")(t)
        q, k, v = jnp.split(qkv, 3, axis=-1)   # channel-chunk (new order)
        out = attention(q, k, v, num_heads=C // self.num_head_channels)
        out = nn.Dense(self.out_channels, dtype=self.dtype,
                       param_dtype=jnp.float32, name="c_proj")(out)
        return out[:, 0].astype(jnp.float32)


class EncoderUNetModel(nn.Module):
    """The half-UNet classifier trunk (openaimodel.py:745-958): the encoder
    levels + middle block of :class:`UNetModel`, then a pooling head —
    'adaptive' (GN→SiLU→global-avg→zero 1x1), 'attention' (AttentionPool2d),
    or 'spatial'/'spatial_v2' (concatenated per-block spatial means → MLP).
    Used by the noise-level classifier (ldm/models/diffusion/classifier.py).

    ``cfg.out_channels`` is the number of classes; ``image_size`` (latent
    resolution) sizes the attention pool's positional table."""
    cfg: UNetConfig
    image_size: int = 64
    pool: str = "adaptive"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, timesteps: jax.Array) -> jax.Array:
        cfg = self.cfg
        ch0 = cfg.model_channels
        spatial = self.pool.startswith("spatial")

        t_emb = timestep_embedding(timesteps, ch0)
        emb = nn.Dense(ch0 * 4, dtype=self.dtype, param_dtype=jnp.float32,
                       name="time_fc1")(t_emb.astype(self.dtype))
        emb = nn.Dense(ch0 * 4, dtype=self.dtype, param_dtype=jnp.float32,
                       name="time_fc2")(nn.silu(emb))

        x = x.astype(self.dtype)
        h = nn.Conv(ch0, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_in")(x)
        means = [jnp.mean(h.astype(jnp.float32), axis=(1, 2))]
        ds = 1
        for level, mult in enumerate(cfg.channel_mult):
            ch = ch0 * mult
            for j in range(cfg.num_res_blocks):
                h = ResBlock(ch, self.dtype, cfg.dropout,
                             cfg.use_scale_shift_norm,
                             name=f"down_{level}_res_{j}")(h, emb)
                if ds in cfg.attention_resolutions:
                    h = AttentionBlock(cfg.heads_for(ch), self.dtype,
                                       name=f"down_{level}_attn_{j}")(h)
                means.append(jnp.mean(h.astype(jnp.float32), axis=(1, 2)))
            if level != len(cfg.channel_mult) - 1:
                if cfg.resblock_updown:
                    h = ResBlock(ch, self.dtype, cfg.dropout,
                                 cfg.use_scale_shift_norm, down=True,
                                 name=f"down_{level}_downsample")(h, emb)
                else:
                    h = nn.Conv(ch, (3, 3), strides=(2, 2),
                                padding=((1, 1), (1, 1)), dtype=self.dtype,
                                param_dtype=jnp.float32,
                                name=f"down_{level}_downsample")(h)
                means.append(jnp.mean(h.astype(jnp.float32), axis=(1, 2)))
                ds *= 2
        ch = ch0 * cfg.channel_mult[-1]
        h = ResBlock(ch, self.dtype, cfg.dropout, cfg.use_scale_shift_norm,
                     name="mid_res_0")(h, emb)
        h = AttentionBlock(cfg.heads_for(ch), self.dtype,
                           name="mid_attn")(h)
        h = ResBlock(ch, self.dtype, cfg.dropout, cfg.use_scale_shift_norm,
                     name="mid_res_1")(h, emb)

        if spatial:
            means.append(jnp.mean(h.astype(jnp.float32), axis=(1, 2)))
            feats = jnp.concatenate(means, axis=-1)
            hid = nn.Dense(2048, param_dtype=jnp.float32, name="fc1")(feats)
            if self.pool == "spatial_v2":
                # torch GroupNorm default eps (1e-5) — the head normalizes
                # raw MLP features where the 1e-6-vs-1e-5 gap is visible
                hid = nn.silu(GroupNorm(epsilon=1e-5, name="fc_norm")(hid))
            else:
                hid = nn.relu(hid)
            return nn.Dense(cfg.out_channels, param_dtype=jnp.float32,
                            name="fc2")(hid).astype(jnp.float32)

        h = nn.silu(GroupNorm(name="norm_out")(h))
        if self.pool == "adaptive":
            h = jnp.mean(h, axis=(1, 2), keepdims=True)
            h = ZeroConv(cfg.out_channels, kernel=1, dtype=self.dtype,
                         name="conv_out")(h)
            return h.reshape(h.shape[0], -1).astype(jnp.float32)
        if self.pool == "attention":
            assert cfg.num_head_channels != -1
            return AttentionPool2d(cfg.num_head_channels, cfg.out_channels,
                                   self.dtype, name="attn_pool")(h)
        raise NotImplementedError(f"Unexpected {self.pool} pooling")
