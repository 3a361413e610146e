"""Multi-head attention core with switchable backends (XLA fused / Pallas).

The reference's CrossAttention (`/root/reference/ldm/modules/attention.py:152-193`)
is einsum(QK)·scale → softmax → einsum(·V) with ``scale = dim_head**-0.5``.
Here the core is a pure function over already-projected tensors so both the
UNet's SpatialTransformer and the CLIP encoders share one hot path, and so the
backend can be swapped (``impl='pallas'`` routes to the fused flash kernel in
``celebbasis_tpu.ops.flash_attention`` on TPU; ``'xla'`` is the reference
implementation XLA fuses on its own).

Softmax statistics are computed in float32 even under bf16 inputs.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from einops import rearrange

import os

# None -> decide lazily: pallas on TPU (2.3x faster than the XLA path on the
# SD UNet shapes, measured on v5e), xla elsewhere/interpreted.
_DEFAULT_IMPL = os.environ.get("CELEBBASIS_ATTN")


def set_default_impl(impl: str) -> None:
    global _DEFAULT_IMPL
    assert impl in ("xla", "pallas")
    _DEFAULT_IMPL = impl


def _resolve_impl() -> str:
    global _DEFAULT_IMPL
    if _DEFAULT_IMPL is None:
        _DEFAULT_IMPL = ("pallas" if jax.default_backend() in ("tpu", "axon")
                         else "xla")
    return _DEFAULT_IMPL


def attention(q: jax.Array, k: jax.Array, v: jax.Array, *, num_heads: int,
              mask: jax.Array | None = None, impl: str | None = None) -> jax.Array:
    """Multi-head attention over projected tensors.

    q: (B, N, C); k, v: (B, M, C) with C = num_heads * head_dim.
    mask: optional additive mask broadcastable to (B, heads, N, M).
    Returns (B, N, C).
    """
    impl = impl or _resolve_impl()
    B, N, C = q.shape
    M = k.shape[1]
    H = num_heads
    # the pallas flash kernel is mask-free; masked attention (CLIP causal)
    # always takes the XLA path.  It also keeps whole K/V resident in VMEM
    # per program, so huge M*head_dim (the VAE's 1-head 4096-token d=512
    # mid attention: 8MB K+V, 16.5MB double-buffered — measured scoped-VMEM
    # OOM) routes to XLA, where the materialized-logits cost is trivial
    # (~0.16 ms) next to the surrounding 512² convs.
    head_dim_p = -(-(C // H) // 128) * 128
    use_pallas = impl == "pallas" and mask is None and M * head_dim_p <= 2 ** 20
    if use_pallas and os.environ.get("CELEBBASIS_FLASH_LAYOUT") != "bhnd":
        # default: transpose-free packed layout — the q/k/v/o head
        # transposes were 'data formatting' in the r5 device trace and
        # dropping them measured +3.2% on the DDIM bench (51.36 -> 52.98
        # steps/s); training (under grad) falls back to the (B,H,N,D)
        # kernels inside the custom_vjp.  CELEBBASIS_FLASH_LAYOUT=bhnd
        # reverts to the always-transpose path for A/B.
        from celebbasis_tpu.ops.flash_attention import flash_attention_nhd
        return flash_attention_nhd(q, k, v, H)
    qh = rearrange(q, "b n (h d) -> b h n d", h=H)
    kh = rearrange(k, "b m (h d) -> b h m d", h=H)
    vh = rearrange(v, "b m (h d) -> b h m d", h=H)
    if use_pallas:
        from celebbasis_tpu.ops.flash_attention import flash_attention
        out = flash_attention(qh, kh, vh)
    else:
        out = _xla_attention(qh, kh, vh, mask)
    return rearrange(out, "b h n d -> b n (h d)")


def _xla_attention(q, k, v, mask):
    d = q.shape[-1]
    scale = d ** -0.5
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = logits + mask.astype(logits.dtype)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def causal_mask(seq_len: int, dtype=jnp.float32) -> jax.Array:
    """CLIP-style additive causal mask (1, 1, N, N) with -inf above diagonal."""
    mask = jnp.triu(jnp.full((seq_len, seq_len), -jnp.inf, dtype=jnp.float32), k=1)
    return mask[None, None].astype(dtype)
