"""End-to-end prompt->pixels benchmark (PERF.md "End-to-end txt2img").

Drives the exact `make_txt2img_fn` graph the CLI jits — tokens in, pixels
out, one device call for the whole 50-step DDIM chain + VAE decode — at full
SD v1 size on the real chip, then times warm calls *including the host
fetch* (the serving-relevant latency).  ``--output uint8`` quantizes on
device so the tunnel download is 4x smaller than fp32.

Usage:  python scripts/bench_e2e_txt2img.py [--output uint8|float]
                                            [--batch 2] [--iters 4]
"""
from __future__ import annotations

import argparse
import os
import time

import jax

os.makedirs("/root/repo/.cache/jax", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--output", choices=["float", "uint8"], default="uint8")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    from celebbasis_tpu.core import manager as mgr
    from celebbasis_tpu.pipeline import CelebBasisPipeline, PipelineConfig
    from celebbasis_tpu.text.tokenizer import default_tokenizer
    from celebbasis_tpu.utils.precision import cast_float_params

    tok = default_tokenizer()
    pipe = CelebBasisPipeline(PipelineConfig.sd_v1(), tok)
    print("[bench] init params...", flush=True)
    params = pipe.init_params(jax.random.key(0), image_size=512)
    params = cast_float_params(params)          # CLI bf16 storage default
    mstate = mgr.init_state(pipe.manager_cfg, jax.random.key(1))
    basis = jnp.zeros((pipe.cfg.basis.num_embeds_per_token,
                       1 + pipe.cfg.basis.n_components, pipe.cfg.clip.width))

    B = args.batch
    fn = pipe.make_txt2img_fn(num_steps=args.steps, guidance_scale=10.0,
                              image_size=512, output=args.output)
    tokens = jnp.asarray(tok(["a photo of a sks person"] * B))
    uncond = jnp.asarray(tok([""] * B))
    k = len(pipe.manager_cfg.placeholder_token_ids)
    ids = jnp.zeros((B, k), jnp.int32)
    num_ids = jnp.ones((B,), jnp.int32)

    print("[bench] compiling + warm call...", flush=True)
    t0 = time.perf_counter()
    np.asarray(fn(params, mstate, basis, tokens, uncond, ids, num_ids,
                  jax.random.key(2)))
    print(f"[bench] warm in {time.perf_counter() - t0:.1f}s", flush=True)

    times = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        out = np.asarray(fn(params, mstate, basis, tokens, uncond, ids,
                            num_ids, jax.random.key(3 + i)))
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    print(f"[bench] output={args.output} dtype={out.dtype} batch={B} "
          f"steps={args.steps}: median {med:.3f}s "
          f"({B / med:.3f} img/s; times: "
          f"{', '.join(f'{t:.3f}' for t in times)})")


if __name__ == "__main__":
    main()
