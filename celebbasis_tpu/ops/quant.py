"""Int8 quantized matmul (Pallas) — opt-in serving acceleration.

v5e's MXU runs int8 at 2x the bf16 rate (394 vs 197 TOPS). This module
provides the building blocks for weight+activation int8 inference on the
UNet's matmul-heavy paths (attention projections, GEGLU FF):

* ``quantize_per_channel`` — symmetric per-output-channel int8 weights;
* ``int8_matmul`` — Pallas kernel: per-row dynamic activation quantization
  fused with an int8xint8->int32 MXU matmul and fp32 dequantization
  (pallas guide "Quantization Kernels" pattern, without stochastic rounding —
  inference only);
* ``quantize_dense_tree`` — rewrite a param pytree's Dense kernels into
  (int8, scale) pairs for serving.

Accuracy: per-row activation scales keep relative error ~1e-2 on unit-scale
activations — acceptable for diffusion sampling, not for training.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_per_channel(w: jax.Array, axis: int = 1
                         ) -> Tuple[jax.Array, jax.Array]:
    """w (K, N) -> (int8 (K, N), scales (N,)) symmetric per-out-channel."""
    absmax = jnp.max(jnp.abs(w), axis=1 - axis, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale.reshape(-1).astype(jnp.float32)


def _kernel(x_ref, w_ref, ws_ref, o_ref, *, block_k: int):
    """x (BM, K) bf16/f32; w (K, BN) int8; ws (1, BN) f32 -> o (BM, BN)."""
    bm, K = x_ref.shape
    bn = w_ref.shape[1]
    x = x_ref[:].astype(jnp.float32)
    # per-row dynamic activation quantization (scales over the full row)
    absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    xs = jnp.maximum(absmax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)

    # statically unrolled K loop (Mosaic has no dynamic_slice on values)
    acc = jnp.zeros((bm, bn), jnp.int32)
    for kb in range(K // block_k):
        xk = jax.lax.slice(xq, (0, kb * block_k), (bm, (kb + 1) * block_k))
        wk = w_ref[pl.ds(kb * block_k, block_k), :]
        acc = acc + jax.lax.dot_general(
            xk, wk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
    o_ref[:] = (acc.astype(jnp.float32) * xs * ws_ref[0, :]
                ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k"))
def int8_matmul(x: jax.Array, w_q: jax.Array, w_scale: jax.Array,
                block_m: int = 256, block_n: int = 256,
                block_k: int = 512) -> jax.Array:
    """x (M, K) float -> x @ dequant(w_q) (M, N), int8 MXU path.

    Shapes must be multiples of the block sizes' constraints after padding
    (handled internally).
    """
    M, K = x.shape
    N = w_q.shape[1]

    def pad_to(a, m0, m1):
        return jnp.pad(a, ((0, -a.shape[0] % m0), (0, -a.shape[1] % m1)))

    bk = min(block_k, max(128, K))
    xp = pad_to(x, block_m, bk)
    wp = pad_to(w_q, bk, block_n)
    Mp, Kp = xp.shape
    Np = wp.shape[1]
    wsp = jnp.pad(w_scale, (0, Np - N)).reshape(1, Np)

    out = pl.pallas_call(
        functools.partial(_kernel, block_k=bk),
        grid=(Mp // block_m, Np // block_n),
        in_specs=[
            pl.BlockSpec((block_m, Kp), lambda i, j: (i, 0)),
            pl.BlockSpec((Kp, block_n), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(xp, wp, wsp)
    return out[:M, :N]


def quantize_dense_tree(params, path_filter=lambda p: True):
    """Rewrite matching '.../kernel' leaves into {'kernel_q','kernel_scale'}.

    Returns (new_params, n_quantized). Biases and non-matching leaves pass
    through. Consumers look up the quantized pair explicitly.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    n = 0

    def put(container, parts, value):
        node = container
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    for path, leaf in flat:
        parts = [getattr(k, "key", str(k)) for k in path]
        name = "/".join(parts)
        if parts[-1] == "kernel" and leaf.ndim == 2 and path_filter(name):
            q, s = quantize_per_channel(leaf)
            put(out, parts[:-1] + ["kernel_q"], q)
            put(out, parts[:-1] + ["kernel_scale"], s)
            n += 1
        else:
            put(out, parts, leaf)
    return out, n
