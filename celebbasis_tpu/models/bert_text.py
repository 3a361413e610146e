"""BERT-path text encoder for the legacy txt2img-1p4B configs — Flax.

Parity target: the reference ``BERTEmbedder``
(`/root/reference/ldm/modules/encoders/modules.py:101-124`), which wraps an
x_transformer ``TransformerWrapper`` + ``Encoder``
(`/root/reference/ldm/modules/x_transformer.py:370-650`) in its default
configuration: pre-LN blocks of [LayerNorm → Attention(8 heads, d_head 64,
biasless qkv) → residual; LayerNorm → FeedForward(GELU, mult 4) → residual],
learned absolute position embeddings, final LayerNorm, embeddings returned
(``return_embeddings=True`` — no logits head).

Notes kept faithful to the reference:
* no padding mask — BERTEmbedder never passes one, so padded positions
  attend like real tokens;
* the textual-inversion hook runs right after the token-embedding lookup
  (x_transformer.py:619-623), before position embeddings are added.

TPU-first: one jitted forward over (B, 77) ids; fp32 LayerNorm/softmax with
bf16 matmuls; the 77-token attention goes through the shared backend-
switchable attention core (Pallas flash kernel on TPU).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from celebbasis_tpu.ops.attention import attention
from celebbasis_tpu.ops.basic import LayerNorm


@dataclass(frozen=True)
class BERTTextConfig:
    vocab_size: int = 30522
    max_seq_len: int = 77
    dim: int = 1280
    depth: int = 32
    heads: int = 8
    dim_head: int = 64

    @staticmethod
    def ldm_1p4b() -> "BERTTextConfig":
        """txt2img-1p4B-*.yaml: n_embed 1280, n_layer 32."""
        return BERTTextConfig()

    @staticmethod
    def tiny() -> "BERTTextConfig":
        return BERTTextConfig(vocab_size=211, dim=64, depth=2, heads=4,
                              dim_head=16)


class _XAttention(nn.Module):
    """x_transformer Attention (x_transformer.py:215-367): separate biasless
    q/k/v projections to heads*dim_head, biased out projection."""
    heads: int
    dim_head: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="to_k")(x)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="to_v")(x)
        out = attention(q, k, v, num_heads=self.heads)
        return nn.Dense(x.shape[-1], dtype=self.dtype,
                        param_dtype=jnp.float32, name="to_out")(out)


class _XFeedForward(nn.Module):
    """x_transformer FeedForward (x_transformer.py:194-211): Linear → GELU
    (exact, like torch's default) → Linear."""
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        h = nn.Dense(d * 4, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc1")(x)
        h = nn.gelu(h, approximate=False)
        return nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32,
                        name="fc2")(h)


class BERTTextEncoder(nn.Module):
    """TransformerWrapper(return_embeddings=True) equivalent."""
    cfg: BERTTextConfig
    dtype: jnp.dtype = jnp.bfloat16

    def token_embed(self, ids: jax.Array) -> jax.Array:
        """Token-table lookup only (the TI hook point)."""
        table = self.get_embedding_table()
        return jnp.take(table, ids, axis=0)

    def get_embedding_table(self) -> jax.Array:
        return self.param(
            "token_emb",
            nn.initializers.normal(stddev=0.02),   # wrapper init_ (std 0.02)
            (self.cfg.vocab_size, self.cfg.dim), jnp.float32)

    @nn.compact
    def __call__(self, ids: jax.Array,
                 inject: Optional[Callable[[jax.Array, jax.Array],
                                           jax.Array]] = None) -> jax.Array:
        """ids: (B, L) int32 -> (B, L, dim) float32 embeddings.

        ``inject(ids, embedded)`` mirrors the reference's
        ``embedding_manager(x, embedded_x)`` hook (x_transformer.py:619-623).
        """
        cfg = self.cfg
        x = self.token_embed(ids)
        if inject is not None:
            x = inject(ids, x)
        pos = self.param("pos_emb", nn.initializers.normal(stddev=0.02),
                         (cfg.max_seq_len, cfg.dim), jnp.float32)
        x = (x + pos[None, :ids.shape[1], :]).astype(self.dtype)
        for i in range(cfg.depth):
            h = LayerNorm(name=f"attn_ln_{i}")(x)
            x = x + _XAttention(cfg.heads, cfg.dim_head, self.dtype,
                                name=f"attn_{i}")(h)
            h = LayerNorm(name=f"ff_ln_{i}")(x)
            x = x + _XFeedForward(self.dtype, name=f"ff_{i}")(h)
        return LayerNorm(name="norm_out")(x).astype(jnp.float32)


class ClassEmbedder(nn.Module):
    """Class-conditional embedder (modules.py:42-54): an embedding table;
    (B,) int labels -> (B, 1, embed_dim) cross-attention context."""
    n_classes: int
    embed_dim: int

    @nn.compact
    def __call__(self, labels: jax.Array) -> jax.Array:
        table = self.param("embedding", nn.initializers.normal(stddev=1.0),
                           (self.n_classes, self.embed_dim), jnp.float32)
        return jnp.take(table, labels, axis=0)[:, None, :]
