#!/usr/bin/env python
"""UNet forward component costs on the real TPU (ablation timing).

Times the SD v1.4 UNet CFG forward (bs 2, 64² latents, bf16) with individual
component families stubbed to identity — the time delta attributes the
HBM-roofline-bound 23 ms (PERF.md) to GroupNorm passes, attention, GEGLU FF,
or the conv backbone, to target the next kernel (VERDICT r1 next #7).

Stubbing changes numerics, never shapes; this is a *timing* tool only.
"""
import json
import os
import time

os.makedirs("/root/repo/.cache/jax", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

import celebbasis_tpu.models.unet as unet_mod
from celebbasis_tpu.models.unet import UNetConfig


class _IdentityGN(nn.Module):
    num_groups: int = 32
    epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return x


class _IdentityFF(nn.Module):
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        return x


class _IdentityST(nn.Module):
    heads: int = 8
    depth: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, ctx):
        return x


def timed_forward(label, results):
    cfg = UNetConfig.sd_v1()
    model = unet_mod.UNetModel(cfg, dtype=jnp.bfloat16)
    B, H = 2, 64
    x = jnp.zeros((B, H, H, 4), jnp.float32)
    t = jnp.zeros((B,), jnp.int32)
    ctx = jnp.zeros((B, 77, cfg.context_dim), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), x, t, ctx)
    fwd = jax.jit(lambda p, a, b, c: model.apply(p, a, b, c))
    out = fwd(params, x, t, ctx)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    N = 20
    for _ in range(N):
        out = fwd(params, x, t, ctx)
    jax.block_until_ready(out)
    np.asarray(out[0, 0, 0])
    ms = (time.perf_counter() - t0) / N * 1000.0
    ca = fwd.lower(params, x, t, ctx).compile().cost_analysis()
    gb = (ca.get("bytes accessed", 0.0)) / 1e9
    fl = ca.get("flops", 0.0) / 1e12
    results[label] = {"ms": round(ms, 2), "hlo_GB": round(gb, 2),
                      "hlo_TFLOP": round(fl, 3)}
    print(json.dumps({label: results[label]}), flush=True)
    del params
    return ms


def main():
    results = {}
    orig_gn = unet_mod.GroupNorm
    orig_ff = unet_mod.FeedForwardGEGLU
    orig_st = unet_mod.SpatialTransformer

    timed_forward("baseline", results)

    unet_mod.GroupNorm = _IdentityGN
    timed_forward("no_groupnorm", results)
    unet_mod.GroupNorm = orig_gn

    unet_mod.FeedForwardGEGLU = _IdentityFF
    timed_forward("no_geglu_ff", results)
    unet_mod.FeedForwardGEGLU = orig_ff

    unet_mod.SpatialTransformer = _IdentityST
    timed_forward("no_spatial_transformer", results)
    unet_mod.SpatialTransformer = orig_st

    base = results["baseline"]["ms"]
    for k, v in results.items():
        if k != "baseline":
            v["delta_ms"] = round(base - v["ms"], 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
