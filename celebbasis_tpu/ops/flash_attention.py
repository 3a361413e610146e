"""Fused flash attention for TPU (Pallas) — the UNet's hot kernel.

Targets the SD v1 spatial-transformer shapes (SURVEY §7.1): self-attention
over 64²=4096 / 32²=1024 / 16²=256 tokens with head dims 40/80/160, and
cross-attention with a fixed 77-token text context.  Blockwise online-softmax
(flash) over K/V tiles keeps the (BQ, M) score matrix out of HBM entirely;
softmax statistics run in fp32 on the VPU while the two matmuls hit the MXU
in bf16.

Head dims are zero-padded to the 128-lane width outside the kernel (padding
keys contribute exp(0-score)=0 via the length mask; padded value lanes are
sliced off afterwards).

``flash_attention(q, k, v)`` takes (B, H, N, D) / (B, H, M, D) and is the
``impl='pallas'`` backend of ``celebbasis_tpu.ops.attention.attention``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_NEG_INF = -1e30


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, m_real: int,
            block_k: int):
    """One (b·h, q-block) program: online softmax over K/V tiles.

    q_ref: (BQ, Dp); k_ref/v_ref: (Mp, Dp); o_ref: (BQ, Dp).
    """
    bq, dp = q_ref.shape
    mp = k_ref.shape[0]
    n_kb = mp // block_k

    q = q_ref[:].astype(jnp.float32) * scale

    def body(kb, carry):
        acc, m_i, l_i = carry
        k = k_ref[pl.ds(kb * block_k, block_k), :]
        v = v_ref[pl.ds(kb * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (BQ, BK)
        # mask out padded keys beyond the true context length
        key_idx = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (bq, block_k), 1)
        s = jnp.where(key_idx < m_real, s, _NEG_INF)

        m_new = jnp.maximum(m_i, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_i - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc0 = jnp.zeros((bq, dp), jnp.float32)
    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, _, l_i = jax.lax.fori_loop(0, n_kb, body, (acc0, m0, l0))
    o_ref[:] = (acc / l_i).astype(o_ref.dtype)


def _forward(q: jax.Array, k: jax.Array, v: jax.Array,
             block_q: int, block_k: int) -> jax.Array:
    B, H, N, D = q.shape
    M = k.shape[2]
    scale = D ** -0.5

    dp = _ceil_to(D, _LANE)
    bq = min(block_q, _ceil_to(N, 8))
    mp = _ceil_to(M, min(block_k, _ceil_to(M, _LANE)))
    bk = min(block_k, mp)
    mp = _ceil_to(M, bk)
    np_ = _ceil_to(N, bq)

    def pad(x, n_to, d_to):
        return jnp.pad(x, ((0, 0), (0, 0), (0, n_to - x.shape[2]),
                           (0, d_to - x.shape[3])))

    qp = pad(q, np_, dp).reshape(B * H, np_, dp)
    kp = pad(k, mp, dp).reshape(B * H, mp, dp)
    vp = pad(v, mp, dp).reshape(B * H, mp, dp)

    grid = (B * H, np_ // bq)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, m_real=M, block_k=bk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, bq, dp), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, mp, dp), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, mp, dp), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, bq, dp), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, np_, dp), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(qp, kp, vp)
    return out.reshape(B, H, np_, dp)[:, :, :N, :D]


# -- custom VJP: pallas forward, exact-recompute XLA backward ----------------
# pallas_call has no autodiff rule; training paths (coefficient backprop
# through the frozen UNet) differentiate attention w.r.t. its *inputs*.  The
# backward recomputes softmax with XLA ops (memory O(N·M) per head — fine at
# the personalization batch sizes) and applies the standard attention VJP.

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_with_vjp(q, k, v, block_q, block_k):
    return _forward(q, k, v, block_q, block_k)


def _fwd_rule(q, k, v, block_q, block_k):
    return _forward(q, k, v, block_q, block_k), (q, k, v)


def _bwd_rule(block_q, block_k, res, g):
    q, k, v = res
    D = q.shape[-1]
    scale = D ** -0.5
    qf = q.astype(jnp.float32) * scale
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    s = jnp.einsum("bhnd,bhmd->bhnm", qf, kf)
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bhnm,bhnd->bhmd", p, gf)
    dp = jnp.einsum("bhnd,bhmd->bhnm", gf, vf)
    ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
    dq = jnp.einsum("bhnm,bhmd->bhnd", ds, kf) * scale
    dk = jnp.einsum("bhnm,bhnd->bhmd", ds, qf)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_flash_with_vjp.defvjp(_fwd_rule, _bwd_rule)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    mask=None, block_q: int = 256,
                    block_k: int = 512) -> jax.Array:
    """q: (B, H, N, D); k, v: (B, H, M, D) -> (B, H, N, D).

    Differentiable w.r.t. q/k/v via the custom VJP above. ``mask`` is
    unsupported (the UNet paths are mask-free); masked cases take the XLA
    core in ``ops.attention``.
    """
    assert mask is None, "pallas path is mask-free; use impl='xla'"
    return _flash_with_vjp(q, k, v, block_q, block_k)
