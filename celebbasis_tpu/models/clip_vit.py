"""OpenAI CLIP ViT image tower + projected text tower (eval scorer models).

The reference's evaluation uses ``clip.load("ViT-B/32")`` for image-image and
text-image similarity (`/root/reference/evaluation/clip_eval.py:20-77`).
This module provides the two towers natively:

* ``CLIPVisionEncoder`` — ViT-B/32: 32x32 patch conv (no bias), class token,
  learned positions, pre-LN transformer (12x768, quick-GELU), ``ln_post`` on
  the class token, linear projection to the shared 512-d space;
* ``CLIPTextTower`` — wraps ``CLIPTextEncoder`` (width 512 for B/32) with the
  EOT-token pooling + text projection CLIP scoring needs.

Bridging from an OpenAI CLIP state dict (``visual.*`` /
``transformer.resblocks.*`` keys, fused ``in_proj_weight``) is included.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from celebbasis_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
from celebbasis_tpu.ops.attention import attention
from celebbasis_tpu.ops.basic import LayerNorm, quick_gelu

CLIP_IMAGE_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    proj_dim: int = 512

    @staticmethod
    def vit_b32() -> "CLIPVisionConfig":
        return CLIPVisionConfig()

    @staticmethod
    def tiny() -> "CLIPVisionConfig":
        return CLIPVisionConfig(image_size=32, patch_size=8, width=64,
                                layers=2, heads=4, proj_dim=32)


class _VitBlock(nn.Module):
    cfg: CLIPVisionConfig
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dense = lambda f, name: nn.Dense(f, dtype=self.dtype,
                                         param_dtype=jnp.float32, name=name)
        h = LayerNorm(name="ln1")(x)
        q = dense(cfg.width, "q_proj")(h)
        k = dense(cfg.width, "k_proj")(h)
        v = dense(cfg.width, "v_proj")(h)
        x = x + dense(cfg.width, "out_proj")(
            attention(q, k, v, num_heads=cfg.heads))
        h = LayerNorm(name="ln2")(x)
        h = quick_gelu(dense(cfg.width * 4, "fc1")(h))
        return x + dense(cfg.width, "fc2")(h)


class CLIPVisionEncoder(nn.Module):
    cfg: CLIPVisionConfig = CLIPVisionConfig.vit_b32()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        """images: (B, S, S, 3) already CLIP-normalized -> (B, proj_dim)."""
        cfg = self.cfg
        B = images.shape[0]
        x = nn.Conv(cfg.width, (cfg.patch_size,) * 2,
                    strides=(cfg.patch_size,) * 2, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="patch_embed")(images.astype(self.dtype))
        x = x.reshape(B, -1, cfg.width)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.width,), jnp.float32)
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, cfg.width)
                                              ).astype(self.dtype), x], axis=1)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (x.shape[1], cfg.width), jnp.float32)
        x = x + pos[None].astype(self.dtype)
        x = LayerNorm(name="ln_pre")(x)
        for i in range(cfg.layers):
            x = _VitBlock(cfg, self.dtype, name=f"layer_{i}")(x)
        pooled = LayerNorm(name="ln_post")(x[:, 0])
        proj = self.param("proj", nn.initializers.normal(0.02),
                          (cfg.width, cfg.proj_dim), jnp.float32)
        return pooled.astype(jnp.float32) @ proj


class CLIPTextTower(nn.Module):
    """Text encoder + EOT pooling + projection (CLIP scoring head)."""
    cfg: CLIPTextConfig
    proj_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> jax.Array:
        enc = CLIPTextEncoder(self.cfg, self.dtype, name="encoder")
        hidden = enc(input_ids)  # (B, L, width)
        # CLIP pools at the EOT token == argmax of token ids
        eot = jnp.argmax(input_ids, axis=-1)
        pooled = jnp.take_along_axis(hidden, eot[:, None, None], axis=1)[:, 0]
        proj = self.param("proj", nn.initializers.normal(0.02),
                          (self.cfg.width, self.proj_dim), jnp.float32)
        return pooled @ proj


def _bicubic_weight_matrix(n_out: int, n_in: int) -> np.ndarray:
    """(n_out, n_in) row-stochastic weights of torch's
    F.interpolate(mode='bicubic', antialias=False, align_corners=False):
    half-pixel source centers, Keys cubic A=-0.75, border-clamped taps."""
    # fp32 scale/index arithmetic — torch keeps width_scale in scalar_t, so
    # the fractional offsets (and hence the weights) carry fp32 rounding
    A = np.float32(-0.75)
    one, half = np.float32(1), np.float32(0.5)
    scale = np.float32(n_in) / np.float32(n_out)
    src = (np.arange(n_out, dtype=np.float32) + half) * scale - half
    f = np.floor(src)
    t = src - f

    def cub1(x):  # |x| <= 1
        return ((A + np.float32(2)) * x - (A + np.float32(3))) * x * x + one

    def cub2(x):  # 1 < |x| < 2
        return (((x - np.float32(5)) * x + np.float32(8)) * x
                - np.float32(4)) * A

    w = np.stack([cub2(one + t), cub1(t), cub1(one - t), cub2(
        np.float32(2) - t)], axis=1)
    idx = np.clip(f[:, None] + np.arange(-1, 3)[None], 0,
                  n_in - 1).astype(int)
    W = np.zeros((n_out, n_in))
    np.add.at(W, (np.arange(n_out)[:, None], idx), w)
    return W


def bicubic_resize_torch(x: np.ndarray, out_hw) -> np.ndarray:
    """torch tensor-bicubic resize (no antialias) for (B,H,W,C) float
    arrays — the torchvision Resize kernel the reference's eval
    preprocessing applies to [-1,1] image tensors.  Separable weight
    matmuls; fp32 out."""
    oh, ow = out_hw
    B, H, W, C = x.shape
    wh = _bicubic_weight_matrix(oh, H)
    ww = _bicubic_weight_matrix(ow, W)
    y = np.einsum("oh,bhwc->bowc", wh, x.astype(np.float64))
    y = np.einsum("ow,bhwc->bhoc", ww, y)
    return y.astype(np.float32)


def preprocess_images(images_minus1_1: np.ndarray, size: int = 224
                      ) -> np.ndarray:
    """[-1,1] NHWC float images -> CLIP-normalized (B,size,size,3).

    The eval path's exact arithmetic (clip_eval.py:27-29: un-normalize to
    [0,1] as FLOAT — no uint8 round-trip — then clip's preprocess minus
    ToTensor, i.e. torchvision tensor Resize(size) short-side bicubic
    without antialias + CenterCrop(size) + Normalize(mean/std))."""
    x = (np.asarray(images_minus1_1, np.float32) + 1.0) / 2.0
    B, H, W, C = x.shape
    if min(H, W) != size:
        if H <= W:
            nh, nw = size, int(size * W / H)
        else:
            nh, nw = int(size * H / W), size
        x = bicubic_resize_torch(x, (nh, nw))
        H, W = nh, nw
    top = int(round((H - size) / 2.0))
    left = int(round((W - size) / 2.0))
    x = x[:, top:top + size, left:left + size]
    return ((x - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD).astype(np.float32)


# -- OpenAI CLIP state-dict bridge ------------------------------------------

def convert_openai_clip(state, vision_cfg: CLIPVisionConfig,
                        text_cfg: CLIPTextConfig):
    """OpenAI CLIP .pt state dict -> (vision_params, text_tower_params)."""
    from celebbasis_tpu.utils.bridge import KeyMap, _lin, unflatten

    state = {k: np.asarray(v, np.float32) for k, v in state.items()
             if hasattr(v, "shape")}
    kv = KeyMap(state)
    w = kv.take("visual.conv1.weight")          # (width, 3, p, p)
    kv.put("patch_embed/kernel", w.transpose(2, 3, 1, 0))
    kv.put("class_embedding", kv.take("visual.class_embedding"))
    kv.put("position_embedding", kv.take("visual.positional_embedding"))
    kv.norm("ln_pre/LayerNorm_0", "visual.ln_pre")
    for i in range(vision_cfg.layers):
        s = f"visual.transformer.resblocks.{i}"
        d = f"layer_{i}"
        kv.norm(f"{d}/ln1/LayerNorm_0", f"{s}.ln_1")
        kv.norm(f"{d}/ln2/LayerNorm_0", f"{s}.ln_2")
        _split_in_proj(kv, s, d, vision_cfg.width)
        kv.linear(f"{d}/out_proj", f"{s}.attn.out_proj")
        kv.linear(f"{d}/fc1", f"{s}.mlp.c_fc")
        kv.linear(f"{d}/fc2", f"{s}.mlp.c_proj")
    kv.norm("ln_post/LayerNorm_0", "visual.ln_post")
    kv.put("proj", kv.take("visual.proj"))
    vision_params = {"params": unflatten(kv.out)}

    kt = KeyMap(state)
    kt.put("encoder/token_embedding/embedding",
           kt.take("token_embedding.weight"))
    kt.put("encoder/position_embedding", kt.take("positional_embedding"))
    for i in range(text_cfg.layers):
        s = f"transformer.resblocks.{i}"
        d = f"encoder/layer_{i}"
        kt.norm(f"{d}/ln1/LayerNorm_0", f"{s}.ln_1")
        kt.norm(f"{d}/ln2/LayerNorm_0", f"{s}.ln_2")
        _split_in_proj(kt, s, d, text_cfg.width)
        kt.linear(f"{d}/out_proj", f"{s}.attn.out_proj")
        kt.linear(f"{d}/fc1", f"{s}.mlp.c_fc")
        kt.linear(f"{d}/fc2", f"{s}.mlp.c_proj")
    kt.norm("encoder/final_ln/LayerNorm_0", "ln_final")
    kt.put("proj", kt.take("text_projection"))
    text_params = {"params": unflatten(kt.out)}
    return vision_params, text_params


def convert_hf_clip(state, vision_cfg: CLIPVisionConfig,
                    text_cfg: CLIPTextConfig):
    """HuggingFace CLIPModel state dict -> (vision_params, text_tower_params).

    HF layout: ``vision_model.*`` (pre_layrnorm/post_layernorm, separate
    q/k/v projections), ``text_model.*``, ``visual_projection`` /
    ``text_projection`` Linear weights (transposed vs OpenAI's matrices).
    """
    from celebbasis_tpu.utils.bridge import KeyMap, _lin, unflatten

    state = {k: np.asarray(v, np.float32) for k, v in state.items()
             if hasattr(v, "shape")}
    kv = KeyMap(state)
    w = kv.take("vision_model.embeddings.patch_embedding.weight")
    kv.put("patch_embed/kernel", w.transpose(2, 3, 1, 0))
    kv.put("class_embedding",
           kv.take("vision_model.embeddings.class_embedding"))
    kv.put("position_embedding",
           kv.take("vision_model.embeddings.position_embedding.weight"))
    kv.norm("ln_pre/LayerNorm_0", "vision_model.pre_layrnorm")
    for i in range(vision_cfg.layers):
        s = f"vision_model.encoder.layers.{i}"
        d = f"layer_{i}"
        kv.norm(f"{d}/ln1/LayerNorm_0", f"{s}.layer_norm1")
        kv.norm(f"{d}/ln2/LayerNorm_0", f"{s}.layer_norm2")
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            kv.linear(f"{d}/{proj}", f"{s}.self_attn.{proj}")
        kv.linear(f"{d}/fc1", f"{s}.mlp.fc1")
        kv.linear(f"{d}/fc2", f"{s}.mlp.fc2")
    kv.norm("ln_post/LayerNorm_0", "vision_model.post_layernorm")
    kv.put("proj", _lin(kv.take("visual_projection.weight")))
    vision_params = {"params": unflatten(kv.out)}

    from celebbasis_tpu.utils.bridge import convert_clip_text
    text_enc = convert_clip_text(
        {f"x.{k}": v for k, v in state.items()
         if k.startswith("text_model.")}, layers=text_cfg.layers,
        prefix="x.")
    kt = KeyMap(state)
    text_params = {"params": {"encoder": text_enc["params"],
                              "proj": _lin(kt.take("text_projection.weight"))}}
    return vision_params, text_params


def _split_in_proj(km, src: str, dst: str, width: int):
    from celebbasis_tpu.utils.bridge import _lin
    w = km.take(f"{src}.attn.in_proj_weight")   # (3w, w)
    b = km.take(f"{src}.attn.in_proj_bias")
    for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
        km.put(f"{dst}/{name}/kernel", _lin(w[i * width:(i + 1) * width]))
        km.put(f"{dst}/{name}/bias", b[i * width:(i + 1) * width])
