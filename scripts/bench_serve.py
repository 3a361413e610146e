"""Serving daemon load benchmark: continuous batching under concurrency.

Starts the in-process TxtToImgService at full SD size (no HTTP — measures
the device path), then compares:
  serial:      N sequential 1-sample requests
  concurrent:  N parallel 1-sample requests (coalesce into ceil(N/B) calls)

Usage: python scripts/bench_serve.py [--batch 2] [--requests 4] [--steps 50]
"""
from __future__ import annotations

import argparse
import os
import threading
import time

import jax

os.makedirs("/root/repo/.cache/jax", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--requests", type=int, default=4)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--H", type=int, default=512)
    args = ap.parse_args()

    from celebbasis_tpu.cli.serve import TxtToImgService, build_argparser

    sargs = build_argparser().parse_args([
        "--config", "configs/aigc_id.yaml", "--H", str(args.H),
        "--ddim_steps", str(args.steps), "--batch", str(args.batch),
        "--batch-window-ms", "50",
    ])
    print("[bench] building service (compile on first call)...", flush=True)
    svc = TxtToImgService(sargs)
    t0 = time.perf_counter()
    svc.warmup()
    print(f"[bench] warm in {time.perf_counter() - t0:.1f}s", flush=True)

    N = args.requests
    prompts = [f"a photo of a sks person, style {i}" for i in range(N)]

    t0 = time.perf_counter()
    for i, p in enumerate(prompts):
        svc.generate(p, seed=i)
    serial = time.perf_counter() - t0

    calls0 = svc.batched_calls
    t0 = time.perf_counter()
    ts = [threading.Thread(target=svc.generate, args=(p,), kwargs={"seed": i})
          for i, p in enumerate(prompts)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    conc = time.perf_counter() - t0
    calls = svc.batched_calls - calls0

    print(f"[bench] {N} one-sample requests, server batch {args.batch}: "
          f"serial {serial:.2f}s ({N / serial:.2f} req/s), "
          f"concurrent {conc:.2f}s ({N / conc:.2f} req/s) "
          f"in {calls} device calls -> {serial / conc:.2f}x")


if __name__ == "__main__":
    main()
