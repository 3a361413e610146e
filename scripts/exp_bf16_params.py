#!/usr/bin/env python
"""Measure bf16 vs fp32 param *storage* for the UNet forward (honest timing).

Round-1 recorded "bf16 param storage: -2%" from naive per-call timing, which
carries the ~65 ms tunnel latency. The fp32 param tree is 3.4 GB of the
19.2 GB HLO traffic per CFG forward; storing bf16 should cut ~1.7 GB (~2 ms).
This differential-times both at pipeline depth (async dispatch chain).
"""
import json
import os
import time

os.makedirs("/root/repo/.cache/jax", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

from celebbasis_tpu.models.unet import UNetConfig, UNetModel


def time_fwd(params, model, x, t, ctx, n=40):
    fwd = jax.jit(lambda p, a, b, c: model.apply(p, a, b, c))
    out = fwd(params, x, t, ctx)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fwd(params, x, t, ctx)
        jax.block_until_ready(out)
        np.asarray(out[0, 0, 0])
        best = min(best, (time.perf_counter() - t0) / n * 1000.0)
    return best


def main():
    cfg = UNetConfig.sd_v1()
    model = UNetModel(cfg, dtype=jnp.bfloat16)
    B, H = 2, 64
    x = jnp.zeros((B, H, H, 4), jnp.float32)
    t = jnp.zeros((B,), jnp.int32)
    ctx = jnp.zeros((B, 77, cfg.context_dim), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), x, t, ctx)

    ms32 = time_fwd(params, model, x, t, ctx)
    ms32 = time_fwd(params, model, x, t, ctx)  # first loop in a process is polluted
    p16 = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params)
    ms16 = time_fwd(p16, model, x, t, ctx)
    print(json.dumps({"fp32_params_ms": round(ms32, 2),
                      "bf16_params_ms": round(ms16, 2),
                      "speedup": round(ms32 / ms16, 3)}))


if __name__ == "__main__":
    main()
