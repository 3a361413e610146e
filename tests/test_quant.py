"""Int8 quantized matmul kernel tests (interpret mode on CPU)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from celebbasis_tpu.ops import quant


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))
    yield


def test_quantize_per_channel_roundtrip():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((64, 32)), jnp.float32)
    q, s = quant.quantize_per_channel(w)
    assert q.dtype == jnp.int8 and s.shape == (32,)
    deq = np.asarray(q, np.float32) * np.asarray(s)
    rel = np.abs(deq - np.asarray(w)).max() / np.abs(np.asarray(w)).max()
    assert rel < 0.01  # half an int8 step


@pytest.mark.parametrize("shape", [(128, 256, 128), (100, 300, 77)])
def test_int8_matmul_close_to_fp32(shape):
    M, K, N = shape
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, N)) * 0.05, jnp.float32)
    ref = np.asarray(x @ w)
    q, s = quant.quantize_per_channel(w)
    got = np.asarray(quant.int8_matmul(x, q, s, block_m=128, block_n=128,
                                       block_k=128))
    assert got.shape == (M, N)
    scale = np.abs(ref).max()
    rel = np.abs(got - ref).max() / scale
    assert rel < 0.03, rel  # two int8 quantizers in series


def test_quantize_dense_tree():
    params = {"params": {"attn1": {"to_q": {"kernel": jnp.ones((8, 16))}},
                         "norm": {"scale": jnp.ones((8,))}}}
    out, n = quant.quantize_dense_tree(params,
                                       path_filter=lambda p: "to_q" in p)
    assert n == 1
    q = out["params"]["attn1"]["to_q"]
    assert "kernel_q" in q and "kernel_scale" in q
    assert out["params"]["norm"]["scale"].shape == (8,)
