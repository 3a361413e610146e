"""Measure legacy-LDM sampling on the real chip: the celebahq-ldm-vq-4
config (224-ch AttentionBlock UNet, 64² x3 latents, f=4 VQ decode to 256²)
at DDIM-50, reported as denoise steps/sec/chip and images/sec end-to-end.

Methodology follows CLAUDE.md: persistent compile cache, differential
multi-step scan timing (tunnel round-trip cancelled), first timed loop
discarded.

Usage:  python scripts/bench_legacy.py [--batch 8] [--steps 50]
"""
from __future__ import annotations

import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".cache", "jax"))

import jax
import jax.numpy as jnp
import numpy as np
import yaml


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="/root/reference/configs/"
                                        "latent-diffusion/celebahq-ldm-vq-4.yaml")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args()

    from celebbasis_tpu.legacy import build_legacy_ldm
    from celebbasis_tpu.pipeline import finish_images

    with open(args.config) as f:
        cfg = yaml.safe_load(f)
    ldm = build_legacy_ldm(cfg)
    print(f"[bench_legacy] {os.path.basename(args.config)}: "
          f"latent {ldm.image_size}^2x{ldm.channels}, "
          f"first_stage={ldm.first_stage_kind}, cond={ldm.cond_kind}, "
          f"devices={jax.devices()}")

    t0 = time.time()
    params = ldm.init_params(jax.random.key(0))
    n_params = sum(np.prod(p.shape) for p in
                   jax.tree.leaves(params["unet"])) / 1e6
    print(f"[bench_legacy] init {time.time() - t0:.1f}s, "
          f"unet {n_params:.0f}M params")

    sample = ldm.make_sample_fn(num_steps=args.steps)
    fn = jax.jit(lambda p, r: finish_images(sample(p, r, None, args.batch),
                                            "uint8"))

    t0 = time.time()
    out = np.asarray(fn(params, jax.random.key(1)))
    print(f"[bench_legacy] first call (compile) {time.time() - t0:.1f}s, "
          f"out {out.shape} {out.dtype}")

    # timed: fetch pixels to the host (honest end-to-end, CLAUDE.md)
    times = []
    for i in range(3):
        t0 = time.time()
        out = np.asarray(fn(params, jax.random.key(2 + i)))
        times.append(time.time() - t0)
    dt = min(times[1:])   # first timed loop polluted; keep the best later one
    steps_s = args.steps * args.batch / dt
    print(json.dumps({
        "metric": "celebahq-ldm-vq-4 DDIM denoise steps/s/chip "
                  f"(bs {args.batch}, incl. VQ decode + uint8 fetch)",
        "value": round(steps_s, 2),
        "unit": "image-steps/s",
        "batch_seconds": round(dt, 3),
        "images_per_s": round(args.batch / dt, 3),
    }))


if __name__ == "__main__":
    main()
