"""Fused GEGLU feed-forward Pallas kernel.

The SD transformer FF (reference ``ldm/modules/attention.py:196-215``) is
``x @ W1 -> split(h, gate) -> h * gelu(gate) -> @ W2``.  XLA materialises
the ``(T, 4C)`` gated intermediate in HBM between the two matmuls (the
``(T, 8C)`` projection fuses into the first dot, the gate product becomes
its epilogue, but the second dot still round-trips its input).  At the
64²-latent level that is ~21 MB written + read per image per block.

This kernel keeps the whole ``h/gate -> gelu -> @W2`` chain in VMEM: grid
``(row_tiles, inner_tiles)``; each row tile of ``x`` stays resident while
the inner dimension is swept, accumulating ``y_j @ W2_j`` into an fp32
scratch, so HBM sees only ``x`` once in and ``out`` once out (weights are
read once per row sweep and held in VMEM across row tiles when they fit).

``W1`` is passed twice with different column index maps (h columns and
gate columns) — two views of one buffer, no copy.

Backward: ``jax.custom_vjp`` whose bwd recomputes through the XLA
reference implementation — exact same gradients as the unfused module, so
training (which differentiates *through* the frozen UNet into the injected
embeddings) works unchanged.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128

_DEFAULT_IMPL = os.environ.get("CELEBBASIS_GEGLU")


def set_default_impl(impl: str) -> None:
    global _DEFAULT_IMPL
    assert impl in ("xla", "pallas")
    _DEFAULT_IMPL = impl


def _resolve_impl() -> str:
    # Default is XLA everywhere — measured negative result on v5e: the
    # fused kernel matches XLA in isolation (0.23 vs 0.22 ms at the
    # 8192x320 level, wins at 2048x640) but regresses the full UNet
    # 47.7 -> 37.1 DDIM steps/s when embedded in the compiled graph
    # (A/B with CELEBBASIS_GEGLU on an otherwise identical HLO): XLA's
    # scheduler loses cross-op overlap around the 16 extra custom calls.
    # Kept as an opt-in (CELEBBASIS_GEGLU=pallas) for future hw/compilers.
    global _DEFAULT_IMPL
    if _DEFAULT_IMPL is None:
        _DEFAULT_IMPL = "xla"
    return _DEFAULT_IMPL


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def geglu_xla(x, w1, b1, w2, b2):
    """Reference path (what `FeedForwardGEGLU` inlined before the kernel)."""
    h = (x @ w1.astype(x.dtype)) + b1.astype(x.dtype)
    h, gate = jnp.split(h, 2, axis=-1)
    h = h * jax.nn.gelu(gate)
    return (h @ w2.astype(x.dtype)) + b2.astype(x.dtype)


def _kernel(x_ref, w1h_ref, w1g_ref, b1_ref, w2_ref, b2_ref, o_ref, acc_ref,
            *, n_j: int):
    j = pl.program_id(1)
    x = x_ref[:]
    h = jax.lax.dot_general(x, w1h_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    g = jax.lax.dot_general(x, w1g_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + b1_ref[0, :][None, :]
    g = g + b1_ref[1, :][None, :]
    y = (h * jax.nn.gelu(g)).astype(x.dtype)
    part = jax.lax.dot_general(y, w2_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = part

    @pl.when(j > 0)
    def _acc():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(j == n_j - 1)
    def _out():
        o_ref[:] = (acc_ref[:] + b2_ref[0, :][None, :]).astype(o_ref.dtype)


def _pick_tiles(rows: int, C: int, inner: int):
    # VMEM budget must cover double-buffered in/out blocks + fp32 scratch;
    # measured: bt=512 at C=1280 with a 5MB weight budget OOMs (17.7MB
    # scoped) — wide-C levels take smaller row tiles and a ~3.5MB weight
    # working set.
    bt = min(512 if C < 1024 else 128, _ceil_to(rows, 8))
    bi = inner
    while (C * bi * 2 * 3 > 3_500_000 and bi % 2 == 0
           and (bi // 2) % _LANE == 0):
        bi //= 2
    return bt, bi


@functools.partial(jax.jit, static_argnames=())
def _geglu_pallas(x2d, w1, b1, w2, b2):
    rows, C = x2d.shape
    inner = w2.shape[0]
    bt, bi = _pick_tiles(rows, C, inner)
    rp = _ceil_to(rows, bt)
    n_j = inner // bi
    xp = jnp.pad(x2d, ((0, rp - rows), (0, 0)))
    dt = x2d.dtype
    w1c = w1.astype(dt)
    # biases stacked (2, inner): row 0 = h half, row 1 = gate half
    b1c = jnp.stack([b1[:inner], b1[inner:]]).astype(jnp.float32)
    w2c = w2.astype(dt)
    b2c = b2.astype(jnp.float32)[None, :]

    out = pl.pallas_call(
        functools.partial(_kernel, n_j=n_j),
        grid=(rp // bt, n_j),
        in_specs=[
            pl.BlockSpec((bt, C), lambda r, j: (r, 0)),
            pl.BlockSpec((C, bi), lambda r, j: (0, j)),            # h cols
            pl.BlockSpec((C, bi), lambda r, j, _n=n_j: (0, _n + j)),  # gate
            pl.BlockSpec((2, bi), lambda r, j: (0, j)),
            pl.BlockSpec((bi, C), lambda r, j: (j, 0)),
            pl.BlockSpec((1, C), lambda r, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bt, C), lambda r, j: (r, 0)),
        out_shape=jax.ShapeDtypeStruct((rp, C), dt),
        scratch_shapes=[pltpu.VMEM((bt, C), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(xp, w1c, w1c, b1c, w2c, b2c)
    return out[:rows]


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _geglu_fused(x2d, w1, b1, w2, b2):
    return _geglu_pallas(x2d, w1, b1, w2, b2)


def _fwd(x2d, w1, b1, w2, b2):
    return _geglu_pallas(x2d, w1, b1, w2, b2), (x2d, w1, b1, w2, b2)


def _bwd(res, g):
    # exact grads via the XLA reference path (recompute-in-backward)
    _, vjp = jax.vjp(geglu_xla, *res)
    return vjp(g)


_geglu_fused.defvjp(_fwd, _bwd)


def ln_xla(x, scale, bias, eps=1e-5):
    """fp32 LayerNorm matching flax nn.LayerNorm (fast variance), bf16 out."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (xn * scale + bias).astype(x.dtype)


def geglu_block_xla(x, ln_scale, ln_bias, w1, b1, w2, b2):
    """Reference path for the whole FF sub-block: x + GEGLU(LN(x))."""
    return x + geglu_xla(ln_xla(x, ln_scale, ln_bias), w1, b1, w2, b2)


def _kernel_block(x_ref, lns_ref, lnb_ref, w1h_ref, w1g_ref, b1_ref, w2_ref,
                  b2_ref, o_ref, acc_ref, xn_ref, *, n_j: int, eps: float):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _ln():
        xf = x_ref[:].astype(jnp.float32)
        mu = jnp.mean(xf, axis=1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(xf * xf, axis=1, keepdims=True) - mu * mu, 0.0)
        xn = (xf - mu) * jax.lax.rsqrt(var + eps)
        xn_ref[:] = (xn * lns_ref[0, :][None, :]
                     + lnb_ref[0, :][None, :]).astype(xn_ref.dtype)

    xn = xn_ref[:]
    h = jax.lax.dot_general(xn, w1h_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    g = jax.lax.dot_general(xn, w1g_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + b1_ref[0, :][None, :]
    g = g + b1_ref[1, :][None, :]
    y = (h * jax.nn.gelu(g)).astype(xn.dtype)
    part = jax.lax.dot_general(y, w2_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = part

    @pl.when(j > 0)
    def _acc():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(j == n_j - 1)
    def _out():
        o_ref[:] = (x_ref[:].astype(jnp.float32) + acc_ref[:]
                    + b2_ref[0, :][None, :]).astype(o_ref.dtype)


def _geglu_block_pallas(x2d, ln_scale, ln_bias, w1, b1, w2, b2,
                        eps: float = 1e-5):
    rows, C = x2d.shape
    inner = w2.shape[0]
    bt, bi = _pick_tiles(rows, C, inner)
    rp = _ceil_to(rows, bt)
    n_j = inner // bi
    xp = jnp.pad(x2d, ((0, rp - rows), (0, 0)))
    dt = x2d.dtype
    w1c = w1.astype(dt)
    b1c = jnp.stack([b1[:inner], b1[inner:]]).astype(jnp.float32)
    w2c = w2.astype(dt)
    b2c = b2.astype(jnp.float32)[None, :]
    lns = ln_scale.astype(jnp.float32)[None, :]
    lnb = ln_bias.astype(jnp.float32)[None, :]

    out = pl.pallas_call(
        functools.partial(_kernel_block, n_j=n_j, eps=eps),
        grid=(rp // bt, n_j),
        in_specs=[
            pl.BlockSpec((bt, C), lambda r, j: (r, 0)),
            pl.BlockSpec((1, C), lambda r, j: (0, 0)),
            pl.BlockSpec((1, C), lambda r, j: (0, 0)),
            pl.BlockSpec((C, bi), lambda r, j: (0, j)),            # h cols
            pl.BlockSpec((C, bi), lambda r, j, _n=n_j: (0, _n + j)),  # gate
            pl.BlockSpec((2, bi), lambda r, j: (0, j)),
            pl.BlockSpec((bi, C), lambda r, j: (j, 0)),
            pl.BlockSpec((1, C), lambda r, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bt, C), lambda r, j: (r, 0)),
        out_shape=jax.ShapeDtypeStruct((rp, C), dt),
        scratch_shapes=[pltpu.VMEM((bt, C), jnp.float32),
                        pltpu.VMEM((bt, C), dt)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(xp, lns, lnb, w1c, w1c, b1c, w2c, b2c)
    return out[:rows]


@jax.custom_vjp
def _geglu_block_fused(x2d, ln_scale, ln_bias, w1, b1, w2, b2):
    return _geglu_block_pallas(x2d, ln_scale, ln_bias, w1, b1, w2, b2)


def _block_fwd(x2d, ln_scale, ln_bias, w1, b1, w2, b2):
    return (_geglu_block_pallas(x2d, ln_scale, ln_bias, w1, b1, w2, b2),
            (x2d, ln_scale, ln_bias, w1, b1, w2, b2))


def _block_bwd(res, g):
    _, vjp = jax.vjp(geglu_block_xla, *res)
    return vjp(g)


_geglu_block_fused.defvjp(_block_fwd, _block_bwd)


def geglu_block(x, ln_scale, ln_bias, w1, b1, w2, b2,
                impl: str | None = None):
    """Whole transformer-FF sub-block ``x + GEGLU(LN(x))`` in one kernel.

    Fusing the LayerNorm and the residual into the GEGLU sweep removes
    their separate HBM passes AND the XLA fusion boundaries a bare pallas
    FF would introduce around them.
    """
    impl = impl or _resolve_impl()
    if impl != "pallas":
        return geglu_block_xla(x, ln_scale, ln_bias, w1, b1, w2, b2)
    shape = x.shape
    out = _geglu_block_fused(x.reshape(-1, shape[-1]), ln_scale, ln_bias,
                             w1, b1, w2, b2)
    return out.reshape(shape)


def geglu_ffn(x, w1, b1, w2, b2, impl: str | None = None):
    """GEGLU feed-forward.  x: (..., C); w1: (C, 2*inner); w2: (inner, C).

    ``impl='pallas'`` (default on TPU) runs the fused VMEM-resident kernel;
    ``'xla'`` is the reference path (used on CPU and as the grad oracle).
    """
    impl = impl or _resolve_impl()
    if impl != "pallas":
        return geglu_xla(x, w1, b1, w2, b2)
    shape = x.shape
    out = _geglu_fused(x.reshape(-1, shape[-1]), w1, b1, w2, b2)
    return out.reshape(shape)
