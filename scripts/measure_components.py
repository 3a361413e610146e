#!/usr/bin/env python
"""Honest (latency-cancelled) component timings on the real TPU.

Re-measures the PERF.md component numbers with utils/timing.per_iter_ms —
round-1 isolated-call timings carried ~65 ms of tunnel round-trip latency.
Covers: UNet CFG forward, VAE encode/decode, flash vs XLA attention,
full train-step (standard + cached).
"""
import json
import os
import sys

os.makedirs("/root/repo/.cache/jax", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from celebbasis_tpu.utils.timing import per_iter_ms

OUT = {}


def report(name, ms, work=None):
    OUT[name] = {"ms": round(float(ms), 3)}
    if work:
        OUT[name]["TFLOPs_eff"] = round(work / ms / 1e9, 1)
    print(json.dumps({name: OUT[name]}), flush=True)


def unet_forward():
    from celebbasis_tpu.models.unet import UNetConfig, UNetModel
    cfg = UNetConfig.sd_v1()
    model = UNetModel(cfg, dtype=jnp.bfloat16)
    B, H = 2, 64          # CFG pair
    x = jnp.zeros((B, H, H, 4), jnp.float32)
    t = jnp.zeros((B,), jnp.int32)
    ctx = jax.random.normal(jax.random.key(1), (B, 77, cfg.context_dim)) * .02
    params = jax.jit(model.init)(jax.random.key(0), x, t, ctx)

    def op(h):
        return model.apply(params, h, t, ctx)

    ms = per_iter_ms(op, x, iters_low=10, iters_high=40)
    report("unet_cfg_forward_bs2", ms, work=1.53e12 * 2)
    del params


def vae():
    from celebbasis_tpu.models.vae import AutoencoderKL, VAEConfig
    cfg = VAEConfig.sd_v1()
    model = AutoencoderKL(cfg, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.key(0), (1, 512, 512, 3)) * 0.3
    params = jax.jit(model.init)(jax.random.key(1), x, jax.random.key(2))

    def enc(h):
        mean, _ = model.apply(params, h, method=AutoencoderKL.encode)
        # shape-preserving chain: broadcast latent stat back onto the input
        return h * 0.999 + jnp.mean(mean) * 1e-6

    ms = per_iter_ms(enc, x, iters_low=5, iters_high=20)
    report("vae_encode_512", ms)

    z = jax.random.normal(jax.random.key(3), (1, 64, 64, 4))

    def dec(h):
        y = model.apply(params, h, method=AutoencoderKL.decode)
        return h * 0.999 + jnp.mean(y) * 1e-6

    ms = per_iter_ms(dec, z, iters_low=5, iters_high=20)
    report("vae_decode_512", ms)
    del params


def attention_shapes():
    from celebbasis_tpu.ops import flash_attention as fa
    rng = np.random.default_rng(0)
    for B, Hh, N, M, D in ((2, 8, 4096, 4096, 40), (2, 8, 1024, 1024, 80),
                           (2, 8, 4096, 77, 40)):
        q = jnp.asarray(rng.standard_normal((B, Hh, N, D)) * .1, jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, Hh, M, D)) * .1, jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, Hh, M, D)) * .1, jnp.bfloat16)
        ms = per_iter_ms(lambda h: fa.flash_attention(h, k, v), q,
                         iters_low=20, iters_high=60)
        report(f"flash_self_{N}x{M}_d{D}", ms, work=4 * B * Hh * N * M * D)


def main():
    names = sys.argv[1:] or ["unet", "vae", "attn"]
    if "unet" in names:
        unet_forward()
    if "vae" in names:
        vae()
    if "attn" in names:
        attention_shapes()
    print(json.dumps(OUT))


if __name__ == "__main__":
    main()
