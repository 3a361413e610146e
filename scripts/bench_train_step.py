#!/usr/bin/env python
"""Full-size personalization train-step timing (honest, pipelined chain).

Builds the real SD-size assembly (random init), synthesizes one batch at
512², and times the donated jit train step by chaining N steps before a
single device sync — the ~65 ms tunnel round-trip amortizes over N.

Usage: python scripts/bench_train_step.py [fp32|bf16]
(bf16 = frozen-weight bf16 storage, the --frozen_bf16 trainer flag)
"""
import json
import os
import sys
import time

os.makedirs("/root/repo/.cache/jax", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from celebbasis_tpu.loader import assemble
from celebbasis_tpu.train import step as tstep
from celebbasis_tpu.utils.config import load_run_spec
from celebbasis_tpu.utils.precision import cast_float_params


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "fp32"  # fp32|bf16|cached|cached_bf16
    spec = load_run_spec(["configs/aigc_id.yaml"])
    asm = assemble(spec, image_size=512, seed=0)

    trainable, meta_frozen = tstep.split_meta_params(asm.meta_params)
    frozen = {"unet": asm.params["unet"], "vae": asm.params["vae"],
              "clip": asm.params["clip"], "meta_frozen": meta_frozen}
    if "bf16" in mode:
        frozen = cast_float_params(frozen)
    optimizer = tstep.make_optimizer(5e-3)
    state = tstep.init_train_state(jax.random.key(0), trainable, optimizer,
                                   asm.manager_state)
    rng = np.random.default_rng(0)
    B, k = 2, 2
    if mode.startswith("cached"):
        step_fn = jax.jit(
            tstep.make_cached_train_step(asm.pipeline, asm.meta_net,
                                         optimizer),
            donate_argnums=(0,))
        fr_dim = 512
        batch = {
            "latent_mean": jnp.asarray(
                rng.standard_normal((B, 64, 64, 4)), jnp.float32),
            "latent_logvar": jnp.zeros((B, 64, 64, 4), jnp.float32),
            "fr_feats": jnp.asarray(
                rng.standard_normal((B, k, fr_dim)), jnp.float32),
            "tokens": jnp.asarray(
                rng.integers(0, spec.clip.vocab_size, (B, 77)), jnp.int32),
            "ids": jnp.zeros((B, k), jnp.int32),
            "num_ids": jnp.ones((B,), jnp.int32),
        }
    else:
        step_fn = jax.jit(
            tstep.make_train_step(asm.pipeline, asm.meta_net, optimizer),
            donate_argnums=(0,))
        batch = {
            "image": jnp.asarray(rng.standard_normal((B, 512, 512, 3)) * 0.3,
                                 jnp.float32),
            "tokens": jnp.asarray(
                rng.integers(0, spec.clip.vocab_size, (B, 77)), jnp.int32),
            "faces": jnp.asarray(
                rng.standard_normal((B, k, 112, 112, 3)) * 0.3, jnp.float32),
            "ids": jnp.zeros((B, k), jnp.int32),
            "num_ids": jnp.ones((B,), jnp.int32),
        }

    state, logs = step_fn(state, frozen, asm.basis, batch)
    jax.block_until_ready(logs["loss"])
    for trial in range(3):
        N = 30
        t0 = time.perf_counter()
        for _ in range(N):
            state, logs = step_fn(state, frozen, asm.basis, batch)
        jax.block_until_ready(logs["loss"])
        np.asarray(logs["loss"])
        ms = (time.perf_counter() - t0) / N * 1000.0
        print(json.dumps({"mode": mode, "trial": trial,
                          "ms_per_step": round(ms, 2)}), flush=True)


if __name__ == "__main__":
    main()
