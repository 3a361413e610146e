"""CLIP ViT-L/14 text encoder in Flax, with a native embedding-injection hook.

The reference monkey-patches four forwards of the HF CLIP text model to thread
``embedding_manager / only_embedding / celeb_embeddings`` kwargs down to the
token-embedding layer (`/root/reference/ldm/modules/encoders/modules.py:176-436`).
TPU-native redesign: the model exposes the two stages the reference hacks apart
as first-class methods —

* ``token_embed(input_ids)`` — the raw token-table lookup (the
  ``only_embedding=True`` short-circuit at ``modules.py:237-239``, used by the
  celeb-basis builder W1 and by the injection path);
* ``encode(inputs_embeds)`` — position embeddings + causal transformer +
  final LayerNorm (``modules.py:290-340``).

The personalization layer is then a *pure function* between the two (see
``celebbasis_tpu.core.injection``) instead of a stateful hook.  ``__call__``
composes both for the plain text path.

Architecture (openai/clip-vit-large-patch14 text tower): vocab 49408, width
768, 12 layers, 12 heads, MLP 3072, quick-GELU, pre-LN, causal mask, eps 1e-5.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import flax.linen as nn

from celebbasis_tpu.ops.attention import attention, causal_mask
from celebbasis_tpu.ops.basic import LayerNorm, quick_gelu


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    width: int = 768
    layers: int = 12
    heads: int = 12
    mlp_dim: int = 3072
    max_length: int = 77

    @staticmethod
    def sd_v1() -> "CLIPTextConfig":
        return CLIPTextConfig()

    @staticmethod
    def tiny() -> "CLIPTextConfig":
        """Small config for tests: same structure, toy sizes."""
        return CLIPTextConfig(vocab_size=1024, width=64, layers=2, heads=4,
                              mlp_dim=128, max_length=77)


class _EncoderLayer(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, mask):
        cfg, dt = self.cfg, self.dtype
        dense = lambda feats, name: nn.Dense(feats, dtype=dt,
                                             param_dtype=jnp.float32, name=name)
        h = LayerNorm(name="ln1")(x)
        q = dense(cfg.width, "q_proj")(h)
        k = dense(cfg.width, "k_proj")(h)
        v = dense(cfg.width, "v_proj")(h)
        a = attention(q, k, v, num_heads=cfg.heads, mask=mask)
        x = x + dense(cfg.width, "out_proj")(a)
        h = LayerNorm(name="ln2")(x)
        h = dense(cfg.mlp_dim, "fc1")(h)
        h = quick_gelu(h)
        x = x + dense(cfg.width, "fc2")(h)
        return x


class CLIPTextEncoder(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.token_embedding = nn.Embed(cfg.vocab_size, cfg.width,
                                        param_dtype=jnp.float32,
                                        name="token_embedding")
        self.position_embedding = self.param(
            "position_embedding", nn.initializers.normal(0.01),
            (cfg.max_length, cfg.width), jnp.float32)
        self.blocks = [_EncoderLayer(cfg, self.dtype, name=f"layer_{i}")
                       for i in range(cfg.layers)]
        self.final_ln = LayerNorm(name="final_ln")

    def token_embed(self, input_ids: jax.Array) -> jax.Array:
        """(B, L) ids -> (B, L, width) raw token-table embeddings (float32)."""
        return self.token_embedding(input_ids)

    def encode(self, inputs_embeds: jax.Array) -> jax.Array:
        """(B, L, width) token embeddings -> (B, L, width) final hidden states.

        Adds position embeddings, runs the causal encoder stack and the final
        LayerNorm — the `text_encoder_forward` path (modules.py:345-404).
        """
        L = inputs_embeds.shape[1]
        x = (inputs_embeds + self.position_embedding[None, :L]).astype(self.dtype)
        mask = causal_mask(L)
        for block in self.blocks:
            x = block(x, mask)
        return self.final_ln(x).astype(jnp.float32)

    def __call__(self, input_ids: jax.Array,
                 inputs_embeds: jax.Array | None = None) -> jax.Array:
        if inputs_embeds is None:
            inputs_embeds = self.token_embed(input_ids)
        return self.encode(inputs_embeds)
