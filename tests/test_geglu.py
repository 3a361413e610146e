"""Fused GEGLU Pallas kernel vs the XLA reference path (interpret mode)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from celebbasis_tpu.ops import geglu


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(geglu.pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))


def _mats(rng, rows, C, inner, dtype=jnp.bfloat16):
    x = jnp.asarray(rng.standard_normal((2, rows, C)) * 0.2, dtype)
    w1 = jnp.asarray(rng.standard_normal((C, 2 * inner)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((2 * inner,)) * 0.01, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((inner, C)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((C,)) * 0.01, jnp.float32)
    return x, w1, b1, w2, b2


@pytest.mark.parametrize("rows,C,inner", [
    (64, 128, 512),      # single inner tile
    (40, 128, 1024),     # row padding + inner sweep (forced below)
])
def test_fused_matches_xla(rows, C, inner):
    rng = np.random.default_rng(0)
    x, w1, b1, w2, b2 = _mats(rng, rows, C, inner)
    ref = geglu.geglu_xla(x, w1, b1, w2, b2)
    out = geglu.geglu_ffn(x, w1, b1, w2, b2, impl="pallas")
    assert out.dtype == ref.dtype and out.shape == ref.shape
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
    scale = np.abs(np.asarray(ref, np.float32)).mean() + 1e-6
    assert err.mean() / scale < 0.02


def test_inner_tiling_path(monkeypatch):
    # force multiple inner tiles regardless of the VMEM heuristic
    monkeypatch.setattr(geglu, "_pick_tiles",
                        lambda rows, C, inner: (64, inner // 4))
    rng = np.random.default_rng(1)
    x, w1, b1, w2, b2 = _mats(rng, 96, 128, 512)
    ref = geglu.geglu_xla(x, w1, b1, w2, b2)
    out = geglu.geglu_ffn(x, w1, b1, w2, b2, impl="pallas")
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
    scale = np.abs(np.asarray(ref, np.float32)).mean() + 1e-6
    assert err.mean() / scale < 0.02


def test_gradients_match_xla():
    rng = np.random.default_rng(2)
    x, w1, b1, w2, b2 = _mats(rng, 32, 128, 256, dtype=jnp.float32)

    def loss_fused(*a):
        return jnp.sum(geglu.geglu_ffn(*a, impl="pallas") ** 2)

    def loss_xla(*a):
        return jnp.sum(geglu.geglu_xla(*a) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def _ln_mats(rng, rows, C, inner, dtype=jnp.bfloat16):
    x, w1, b1, w2, b2 = _mats(rng, rows, C, inner, dtype)
    s = jnp.asarray(1.0 + 0.1 * rng.standard_normal((C,)), jnp.float32)
    b = jnp.asarray(0.05 * rng.standard_normal((C,)), jnp.float32)
    return x, s, b, w1, b1, w2, b2


@pytest.mark.parametrize("rows,C,inner", [(64, 128, 512), (40, 128, 1024)])
def test_block_matches_xla(rows, C, inner):
    rng = np.random.default_rng(3)
    args = _ln_mats(rng, rows, C, inner)
    ref = geglu.geglu_block_xla(*args)
    out = geglu.geglu_block(*args, impl="pallas")
    assert out.dtype == ref.dtype and out.shape == ref.shape
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
    scale = np.abs(np.asarray(ref, np.float32)).mean() + 1e-6
    assert err.mean() / scale < 0.02


def test_block_matches_module_path():
    """x + GEGLU(LN(x)) via ops must equal the pre-fusion module composition
    (ops.basic.LayerNorm + the original Dense/split/gelu chain)."""
    import flax.linen as nn
    from celebbasis_tpu.ops.basic import LayerNorm
    rng = np.random.default_rng(4)
    C, inner = 64, 256
    x, s, b, w1, b1, w2, b2 = _ln_mats(rng, 32, C, inner, dtype=jnp.float32)

    ln = LayerNorm()
    p = ln.init(jax.random.key(0), x)
    p = jax.tree.map(lambda a: a, p)
    p["params"]["LayerNorm_0"]["scale"] = s
    p["params"]["LayerNorm_0"]["bias"] = b
    xn = ln.apply(p, x)
    h = xn @ w1 + b1
    h, gate = jnp.split(h, 2, axis=-1)
    ref = x + ((h * nn.gelu(gate)) @ w2 + b2)

    out = geglu.geglu_block_xla(x, s, b, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_block_gradients_match_xla():
    rng = np.random.default_rng(5)
    args = _ln_mats(rng, 32, 128, 256, dtype=jnp.float32)

    gf = jax.grad(lambda *a: jnp.sum(geglu.geglu_block(*a, impl="pallas")**2),
                  argnums=tuple(range(7)))(*args)
    gx = jax.grad(lambda *a: jnp.sum(geglu.geglu_block_xla(*a)**2),
                  argnums=tuple(range(7)))(*args)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
