"""Fused flash attention for TPU (Pallas) — forward + backward kernels.

Targets the SD v1 spatial-transformer shapes (SURVEY §7.1): self-attention
over 64²=4096 / 32²=1024 / 16²=256 tokens with head dims 40/80/160, and
cross-attention with the fixed 77-token text context.  Blockwise
online-softmax keeps the (N, M) score matrix out of HBM in both directions;
softmax statistics run fp32 on the VPU, matmuls hit the MXU in the input
dtype.

Backward is the standard flash decomposition with saved per-row logsumexp:
one kernel accumulates dQ over K/V tiles, a second accumulates dK/dV over Q
tiles; ``D = rowsum(dO·O)`` is computed outside (cheap elementwise).
Head dims stay unpadded in HBM when sublane-aligned (see ``_d_pack``);
Mosaic masks the vreg lanes.  Key/query padding is masked with -inf scores.

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


def _env_int(name: str, default: int) -> int:
    """Sweep knob: read an int override from the environment at trace time.

    Used by ``scripts/sweep_flash_bwd.py`` to A/B backward block caps on the
    real train step without code edits; unset → the measured defaults.
    """
    import os
    v = os.environ.get(name)
    return int(v) if v else default


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, l_ref, *, scale: float,
                m_real: int, block_k: int):
    """One (b·h, q-block) program: online softmax over K/V tiles.

    q_ref: (BQ, Dp); k_ref/v_ref: (Mp, Dp); o_ref: (BQ, Dp);
    l_ref: (BQ, LANE) — per-row logsumexp broadcast over lanes.
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
        if m_real < mp:        # static: no mask VPU work for aligned seqs
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
    acc, m_i, l_i = jax.lax.fori_loop(0, n_kb, body, (acc0, m0, l0))
    o_ref[:] = (acc / l_i).astype(o_ref.dtype)
    if l_ref is not None:   # inference path skips the logsumexp output
        l_ref[:] = jnp.broadcast_to(m_i + jnp.log(l_i), (bq, _LANE))


def _fwd_kernel_infer(q_ref, k_ref, v_ref, o_ref, *, scale, m_real, block_k):
    _fwd_kernel(q_ref, k_ref, v_ref, o_ref, None, scale=scale,
                m_real=m_real, block_k=block_k)


def _pad_nd(x, n_to, d_to):
    return jnp.pad(x, ((0, 0), (0, 0), (0, n_to - x.shape[2]),
                       (0, d_to - x.shape[3])))


def _d_pack(D: int) -> int:
    """On-HBM head-dim layout.

    SD v1's d=40 heads pad to the 128-lane vreg width *in registers* no
    matter what; materializing that padding in HBM (round 1/2 did) tripled
    the attention q/k/v/o HBM traffic — and the UNet forward is at the HBM
    roofline (PERF.md), so traffic is what costs.  Keep D unpadded in HBM
    when it is sublane-aligned (multiple of 8); Mosaic masks the lanes.
    """
    return D if D % 8 == 0 else _ceil_to(D, 8)


def _geometry(N, M, D, block_q, block_k):
    dp = _d_pack(D)
    bq = min(block_q, _ceil_to(N, 8))
    mp = _ceil_to(M, min(block_k, _ceil_to(M, _LANE)))
    bk = min(block_k, mp)
    mp = _ceil_to(M, bk)
    np_ = _ceil_to(N, bq)
    return dp, bq, bk, mp, np_


def _forward(q, k, v, block_q, block_k, with_stats):
    B, H, N, D = q.shape
    M = k.shape[2]
    scale = D ** -0.5
    dp, bq, bk, mp, np_ = _geometry(N, M, D, block_q, block_k)
    qp = _pad_nd(q, np_, dp).reshape(B * H, np_, dp)
    kp = _pad_nd(k, mp, dp).reshape(B * H, mp, dp)
    vp = _pad_nd(v, mp, dp).reshape(B * H, mp, dp)

    in_specs = [
        pl.BlockSpec((None, bq, dp), lambda b, i: (b, i, 0)),
        pl.BlockSpec((None, mp, dp), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((None, mp, dp), lambda b, i: (b, 0, 0)),
    ]
    o_spec = pl.BlockSpec((None, bq, dp), lambda b, i: (b, i, 0))
    o_shape = jax.ShapeDtypeStruct((B * H, np_, dp), q.dtype)
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary"))
    if with_stats:
        out, lse = pl.pallas_call(
            functools.partial(_fwd_kernel, scale=scale, m_real=M, block_k=bk),
            grid=(B * H, np_ // bq),
            in_specs=in_specs,
            out_specs=(o_spec,
                       pl.BlockSpec((None, bq, _LANE), lambda b, i: (b, i, 0))),
            out_shape=(o_shape,
                       jax.ShapeDtypeStruct((B * H, np_, _LANE), jnp.float32)),
            compiler_params=params,
        )(qp, kp, vp)
        return out.reshape(B, H, np_, dp)[:, :, :N, :D], (qp, kp, vp, lse)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_infer, scale=scale, m_real=M,
                          block_k=bk),
        grid=(B * H, np_ // bq),
        in_specs=in_specs,
        out_specs=o_spec,
        out_shape=o_shape,
        compiler_params=params,
    )(qp, kp, vp)
    return out.reshape(B, H, np_, dp)[:, :, :N, :D]


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _dq_kernel(q_ref, k_ref, v_ref, l_ref, d_ref, do_ref, dq_ref, *,
               scale: float, m_real: int, block_k: int):
    bq, dp = q_ref.shape
    mp = k_ref.shape[0]
    q = q_ref[:].astype(jnp.float32) * scale
    do = do_ref[:].astype(jnp.float32)
    lse = l_ref[:, :1]
    dvec = d_ref[:, :1]

    def body(kb, dq):
        k = k_ref[pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if m_real < mp:        # static skip for aligned seqs
            key_idx = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_k), 1)
            s = jnp.where(key_idx < m_real, s, _NEG_INF)
        p = jnp.exp(s - lse)
        dp_ = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        ds = p * (dp_ - dvec)
        return dq + jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, mp // block_k, body,
                           jnp.zeros((bq, dp), jnp.float32))
    dq_ref[:] = (dq * scale).astype(dq_ref.dtype)


def _dkv_kernel(k_ref, v_ref, q_ref, l_ref, d_ref, do_ref, dk_ref, dv_ref, *,
                scale: float, m_real: int, n_real: int, block_q: int,
                m_total: int):
    bk, dp = k_ref.shape
    np_ = q_ref.shape[0]
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    kb_start = pl.program_id(1) * bk
    key_idx = kb_start + jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)

    def body(qb, carry):
        dk, dv = carry
        q = q_ref[pl.ds(qb * block_q, block_q), :].astype(jnp.float32) * scale
        do = do_ref[pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        lse = l_ref[pl.ds(qb * block_q, block_q), :1]
        dvec = d_ref[pl.ds(qb * block_q, block_q), :1]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if m_real < m_total or n_real < np_:   # static skip for aligned seqs
            row_idx = qb * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, 1), 0)
            s = jnp.where((key_idx < m_real) & (row_idx < n_real), s,
                          _NEG_INF)
        p = jnp.exp(s - lse)                              # (BQ, BK)
        dv = dv + jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dp_ = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        ds = p * (dp_ - dvec)
        dk = dk + jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        return dk, dv

    dk0 = jnp.zeros((bk, dp), jnp.float32)
    dv0 = jnp.zeros((bk, dp), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, np_ // block_q, body, (dk0, dv0))
    dk_ref[:] = dk.astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash(q, k, v, block_q, block_k):
    return _forward(q, k, v, block_q, block_k, with_stats=False)


def _flash_fwd_rule(q, k, v, block_q, block_k):
    o, (qp, kp, vp, lse) = _forward(q, k, v, block_q, block_k,
                                    with_stats=True)
    return o, (qp, kp, vp, lse, o, q.shape, k.shape[2])


def _flash_bwd_rule(block_q, block_k, res, g):
    qp, kp, vp, lse, o, q_shape, M = res
    B, H, N, D = q_shape
    scale = D ** -0.5
    # the backward kernels hold whole-sequence q/l/D/do blocks per program,
    # so the forward's large-tile tuning (bq=2048 tiny-K, bk=4096) blows the
    # 16MB scoped-VMEM budget here (measured: 19.8M at bk=4096, seq 4096).
    # Re-derive geometry with the backward's own caps; padding (mp, np_)
    # stays consistent with the saved fwd residuals because mp from
    # _geometry is ceil(M, bk) and 512 | 4096 (and bq caps only shrink
    # the q-grid tile, not np_).  Caps are env-tunable for sweeps
    # (scripts/sweep_flash_bwd.py); 512/1024 won the r4 end-to-end sweep on
    # the SD-size train step (101.21 vs 103.65 ms at the old 256/512;
    # 256/2048 OOMs VMEM — the caps are still load-bearing).
    bq_cap = _env_int("CELEBBASIS_FLASH_BWD_BQ", 512)
    bk_cap = _env_int("CELEBBASIS_FLASH_BWD_BK", 1024)
    block_q, block_k = min(block_q, bq_cap), min(block_k, bk_cap)
    dp, bq, bk, mp, np_ = _geometry(N, M, D, block_q, block_k)
    BH = B * H

    gp = _pad_nd(g, np_, dp).reshape(BH, np_, dp)
    # D_i = rowsum(dO * O) — cheap elementwise, fp32, padded rows give 0
    op = _pad_nd(o, np_, dp).reshape(BH, np_, dp)
    dvec = jnp.sum(gp.astype(jnp.float32) * op.astype(jnp.float32), axis=-1,
                   keepdims=True)
    dvec = jnp.broadcast_to(dvec, (BH, np_, _LANE))

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, m_real=M, block_k=bk),
        grid=(BH, np_ // bq),
        in_specs=[
            pl.BlockSpec((None, bq, dp), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, mp, dp), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, mp, dp), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, bq, _LANE), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, bq, _LANE), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, bq, dp), lambda b, i: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((None, bq, dp), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, np_, dp), qp.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(qp, kp, vp, lse, dvec, gp)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, m_real=M, n_real=N,
                          block_q=bq, m_total=mp),
        grid=(BH, mp // bk),
        in_specs=[
            pl.BlockSpec((None, bk, dp), lambda b, j: (b, j, 0)),
            pl.BlockSpec((None, bk, dp), lambda b, j: (b, j, 0)),
            pl.BlockSpec((None, np_, dp), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((None, np_, _LANE), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((None, np_, _LANE), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((None, np_, dp), lambda b, j: (b, 0, 0)),
        ],
        out_specs=(pl.BlockSpec((None, bk, dp), lambda b, j: (b, j, 0)),
                   pl.BlockSpec((None, bk, dp), lambda b, j: (b, j, 0))),
        out_shape=(jax.ShapeDtypeStruct((BH, mp, dp), kp.dtype),
                   jax.ShapeDtypeStruct((BH, mp, dp), vp.dtype)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(kp, vp, qp, lse, dvec, gp)

    dq = dq.reshape(B, H, np_, dp)[:, :, :N, :D]
    dk = dk.reshape(B, H, mp, dp)[:, :, :M, :D]
    dv = dv.reshape(B, H, mp, dp)[:, :, :M, :D]
    return dq, dk, dv


_flash.defvjp(_flash_fwd_rule, _flash_bwd_rule)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def _flash_jit(q, k, v, block_q, block_k):
    return _flash(q, k, v, block_q, block_k)


# ---------------------------------------------------------------------------
# transpose-free (B, N, H, D) layout — experimental forward
# ---------------------------------------------------------------------------

def _fwd_kernel_packed(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                       m_real: int, block_k: int, H: int, D: int):
    """One (b, q-block) program holding ALL heads packed along lanes.

    q_ref/o_ref: (BQ, H*D); k_ref/v_ref: (Mp, H*D).  Per head, a static
    lane slice [h*D:(h+1)*D] feeds the same online softmax as
    ``_fwd_kernel`` — the head split happens in registers instead of a
    materialized HBM transpose.
    """
    bq = q_ref.shape[0]
    mp = k_ref.shape[0]
    n_kb = mp // block_k
    for h in range(H):
        q = q_ref[:, h * D:(h + 1) * D].astype(jnp.float32) * scale

        def body(kb, carry, h=h, q=q):
            acc, m_i, l_i = carry
            k = k_ref[pl.ds(kb * block_k, block_k), h * D:(h + 1) * D]
            v = v_ref[pl.ds(kb * block_k, block_k), h * D:(h + 1) * D]
            s = jax.lax.dot_general(
                q, k.astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if m_real < mp:
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

        acc0 = jnp.zeros((bq, D), jnp.float32)
        m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
        l0 = jnp.zeros((bq, 1), jnp.float32)
        acc, m_i, l_i = jax.lax.fori_loop(0, n_kb, body, (acc0, m0, l0))
        o_ref[:, h * D:(h + 1) * D] = (acc / l_i).astype(o_ref.dtype)


def _forward_nhd(q, k, v, H, block_q, block_k):
    """q: (B, N, C) with C = H*D — the projection's output, untransposed.

    The standard path physically transposes q/k/v/o to (B, H, N, D)
    (``b n (h d) -> b h n d``); the r5 device trace attributes 8.4% of
    sampler step time to 'data formatting', half of it these transposes.
    Mosaic's (8,128) tiling forbids per-head blocking of the second-minor
    dim, so instead one program carries all heads and splits them with
    static lane slices in registers.  Forward-only (no vjp); routed by
    CELEBBASIS_FLASH_LAYOUT=nhd for bench A/B.
    """
    B, N, C = q.shape
    M = k.shape[1]
    D = C // H
    scale = D ** -0.5
    _, bq, bk, mp, np_ = _geometry(N, M, D, block_q, block_k)

    def pad_n(x, n_to):
        return jnp.pad(x, ((0, 0), (0, n_to - x.shape[1]), (0, 0)))

    qp, kp, vp = pad_n(q, np_), pad_n(k, mp), pad_n(v, mp)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_packed, scale=scale, m_real=M,
                          block_k=bk, H=H, D=D),
        grid=(B, np_ // bq),
        in_specs=[
            pl.BlockSpec((None, bq, C), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, mp, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, mp, C), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, bq, C), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, np_, C), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # all-heads-resident K/V (mp, C) blows the 16M default scoped
            # budget at 4096x320 (23.3M measured); v5e has 128M VMEM
            vmem_limit_bytes=64 * 1024 * 1024),
    )(qp, kp, vp)
    return out[:, :N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_nhd(q, k, v, H, block_q, block_k):
    return _forward_nhd(q, k, v, H, block_q, block_k)


def _split_heads(x, H):
    B, N, C = x.shape
    return x.reshape(B, N, H, C // H).transpose(0, 2, 1, 3)


def _flash_nhd_fwd_rule(q, k, v, H, block_q, block_k):
    # under differentiation (training) the packed forward has no backward
    # kernels: fall back to the proven (B,H,N,D) path — training already
    # pays the transposes, and the saved residuals feed the existing
    # flash backward unchanged
    B, N, C = q.shape
    o4, (qp, kp, vp, lse) = _forward(
        _split_heads(q, H), _split_heads(k, H), _split_heads(v, H),
        block_q, block_k, with_stats=True)
    res = (qp, kp, vp, lse, o4, (B, H, N, C // H), k.shape[1])
    return o4.transpose(0, 2, 1, 3).reshape(B, N, C), res


def _flash_nhd_bwd_rule(H, block_q, block_k, res, g):
    B, N, C = g.shape
    dq, dk, dv = _flash_bwd_rule(block_q, block_k, res, _split_heads(g, H))
    back = lambda x: x.transpose(0, 2, 1, 3).reshape(x.shape[0], -1, C)
    return back(dq), back(dk), back(dv)


_flash_nhd.defvjp(_flash_nhd_fwd_rule, _flash_nhd_bwd_rule)


@functools.partial(jax.jit, static_argnames=("H", "block_q", "block_k"))
def _flash_nhd_jit(q, k, v, H, block_q, block_k):
    return _flash_nhd(q, k, v, H, block_q, block_k)


def flash_attention_nhd(q, k, v, num_heads: int, block_q: int | None = None,
                        block_k: int | None = None):
    """q: (B, N, H*D); k, v: (B, M, H*D) -> (B, N, H*D), untransposed.

    Inference runs the packed transpose-free forward (_forward_nhd,
    +3.2% on the DDIM bench: 51.36 -> 52.98 steps/s); differentiation
    falls back to the (B,H,N,D) kernels via the custom_vjp fwd rule.
    """
    if block_k is None:
        block_k = 4096 if k.shape[1] >= 2048 else 512
    if block_q is None:
        block_q = 2048 if k.shape[1] <= 256 else 256
    return _flash_nhd_jit(q, k, v, num_heads, block_q, block_k)


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    mask=None, block_q: int | None = None,
                    block_k: int | None = None) -> jax.Array:
    """q: (B, H, N, D); k, v: (B, H, M, D) -> (B, H, N, D).

    Differentiable (flash backward kernels). ``mask`` is unsupported — masked
    cases (CLIP causal) take the XLA core in ``ops.attention``.
    """
    assert mask is None, "pallas path is mask-free; use impl='xla'"
    # Round-2 retune with latency-cancelled differential timing (the round-1
    # per-call sweep was poisoned by ~65 ms tunnel latency): for 4096-token
    # self-attention large K tiles win — (256, 2048) runs 0.95 ms vs
    # (256, 512)'s 1.30 ms (fewer online-softmax rescale passes per K sweep),
    # and single-tile bk=4096 plus the static-mask/logsumexp skips took the
    # end-to-end DDIM bench 44.8 -> 47.1 steps/s.  Short sequences are
    # insensitive (k/v fit one tile either way).
    if block_k is None:
        block_k = 4096 if k.shape[2] >= 2048 else 512
    if block_q is None:
        # tiny-K (cross-attention, 77 tokens): one K tile per program, so
        # grid size = N/bq programs of trivial work — launch overhead
        # dominates.  bq=2048 measured 0.056 ms vs bq=256's 0.195 ms at
        # 4096x77 (differential timing, v5e).
        block_q = 2048 if k.shape[2] <= 256 else 256
    return _flash_jit(q, k, v, block_q, block_k)
