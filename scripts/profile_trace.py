#!/usr/bin/env python
"""Real device profile of the headline workloads (VERDICT r4 #6).

Captures a ``jax.profiler`` trace of (a) the 50-step DDIM sampler scan at
the bench shape and (b) the cached train step, parses the emitted
perfetto ``*.trace.json.gz`` directly (no tensorboard in this image), and
prints the top-N device ops by total self time — the measured per-op
profile PERF.md's roofline argument was previously missing.

Usage: python scripts/profile_trace.py [--train] [--top N] [--bs N]
Writes the raw trace under .cache/profile/ for later inspection.
"""
import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

os.makedirs("/root/repo/.cache/jax", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def build_sampler(bs=1):
    from celebbasis_tpu.diffusion.sampler import SamplerConfig, ddim_sample
    from celebbasis_tpu.diffusion.schedules import (make_ddim_schedule,
                                                    make_schedule)
    from celebbasis_tpu.models.unet import UNetConfig, UNetModel
    from celebbasis_tpu.utils.precision import cast_float_params

    cfg = UNetConfig.sd_v1()
    model = UNetModel(cfg, dtype=jnp.bfloat16)
    B, H, STEPS = bs, 64, 50
    x = jnp.zeros((B, H, H, 4), jnp.float32)
    ctx = jax.random.normal(jax.random.key(1), (B, 77, cfg.context_dim)) * .02
    params = jax.jit(model.init)(jax.random.key(0), x,
                                 jnp.zeros((B,), jnp.int32), ctx)
    params = cast_float_params(params, jnp.bfloat16)
    ddim = make_ddim_schedule(make_schedule(), STEPS, eta=0.0)

    def run_impl(p, c, u, rng):
        return ddim_sample(lambda xx, tt, cc: model.apply(p, xx, tt, cc),
                           ddim, rng=rng, shape=(B, H, H, 4), cond=c,
                           uncond=u, cfg=SamplerConfig(guidance_scale=10.0))

    fn = jax.jit(run_impl)
    args = (params, ctx, jnp.zeros_like(ctx), jax.random.key(2))
    return fn, args


def parse_trace(logdir, top=10):
    """Aggregate device-track events from the perfetto json by SELF time
    (dur minus nested children on the same lane), so program/while
    containers don't double-count their bodies."""
    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        return None
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_name = {}
    lane_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            lane_name[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_name.items()
                if any(k in n.lower() for k in ("tpu", "device", "xla"))
                and "host" not in n.lower()}
    # the per-op device lane; module/step summary lanes would double-count
    op_lanes = {k for k, n in lane_name.items()
                if k[0] in dev_pids and n == "XLA Ops"}
    by_lane = defaultdict(list)
    long_names = {}
    for e in events:
        if e.get("ph") == "X" and (
                (e.get("pid"), e.get("tid")) in op_lanes
                or (not op_lanes and e.get("pid") in dev_pids)):
            by_lane[(e["pid"], e.get("tid", 0))].append(e)
            ln = (e.get("args") or {}).get("long_name")
            if ln:
                long_names.setdefault(e.get("name", "?"), ln)
    self_us = defaultdict(float)
    count = defaultdict(int)
    total = 0.0
    for lane in by_lane.values():
        lane.sort(key=lambda e: (float(e["ts"]), -float(e.get("dur", 0))))
        stack = []  # (end_ts, name, child_us accumulator index)
        child = []
        for e in lane:
            ts, dur = float(e["ts"]), float(e.get("dur", 0.0))
            while stack and ts >= stack[-1][0]:
                end, nm, ci = stack.pop()
                pass
            # close finished parents, attributing child time upward
            name = e.get("name", "?")
            if stack:
                # add this event's full dur to the parent's child-counter
                stack[-1][2][0] += dur
            acc = [0.0]
            stack.append((ts + dur, name, acc))
            # we can't know children until they stream; finalize lazily:
            # record event with its accumulator for post-processing
            e["_acc"] = acc
        for e in lane:
            name = e.get("name", "?")
            dur = float(e.get("dur", 0.0))
            self_t = max(dur - e["_acc"][0], 0.0)
            self_us[name] += self_t
            count[name] += 1
            total += self_t
    rows = [(n, d, count[n], long_names.get(n, ""))
            for n, d in sorted(self_us.items(), key=lambda kv: -kv[1])[:top]]

    # roofline attribution: the profiler emits hlo_category / model_flops /
    # bytes_accessed per event — aggregate achieved TFLOP/s and GB/s
    cat = defaultdict(lambda: [0.0, 0.0, 0.0, 0])   # us, flops, bytes, n
    op = defaultdict(lambda: [0.0, 0.0, 0.0, 0])
    for lane in by_lane.values():
        for e in lane:
            a = e.get("args") or {}
            dur = max(float(e.get("dur", 0.0)) - e["_acc"][0], 0.0)
            if dur <= 0:
                continue
            fl = float(a.get("model_flops", 0) or 0)
            by = float(a.get("bytes_accessed", 0) or 0)
            c = a.get("hlo_category", "?")
            cat[c][0] += dur
            cat[c][1] += fl
            cat[c][2] += by
            cat[c][3] += 1
            t = a.get("tf_op", "")
            t = "/".join(t.rstrip(":").split("/")[-2:]) or e.get("name", "?")
            op[t][0] += dur
            op[t][1] += fl
            op[t][2] += by
            op[t][3] += 1
    return rows, total, {p: pid_name[p] for p in dev_pids}, cat, op


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--top", type=int, default=10)
    ap.add_argument("--bs", type=int, default=1)
    ap.add_argument("--train", action="store_true",
                    help="profile the cached train step instead")
    args = ap.parse_args()

    fn, fargs = build_sampler(args.bs)
    print("[profile] compiling/warmup ...", flush=True)
    np.asarray(fn(*fargs))

    logdir = os.path.join("/root/repo/.cache/profile",
                          f"sampler_bs{args.bs}_{int(time.time())}")
    os.makedirs(logdir, exist_ok=True)
    with jax.profiler.trace(logdir):
        out = fn(*fargs)
        np.asarray(out)
    print(f"[profile] trace written to {logdir}")

    parsed = parse_trace(logdir, args.top)
    if parsed is None:
        print("[profile] no trace.json.gz produced (profiler unsupported "
              "on this backend?)")
        return 1
    rows, total, devs, cat, op = parsed
    print(f"[profile] device tracks: {devs}")
    print(f"[profile] total device self-time: {total / 1e3:.2f} ms")

    def _table(title, d, top_n):
        print(f"\n-- {title} "
              f"({'ms':>9s} {'%':>6s} {'TFLOP/s':>8s} {'GB/s':>7s} {'n':>6s})")
        for k, (us, fl, by, n) in sorted(d.items(),
                                         key=lambda kv: -kv[1][0])[:top_n]:
            tfs = fl / us / 1e6 if us else 0.0     # flops/us -> TFLOP/s
            gbs = by / us / 1e3 if us else 0.0     # bytes/us -> GB/s
            print(f"{k[:52]:52s} {us / 1e3:9.3f} {100 * us / total:6.2f} "
                  f"{tfs:8.1f} {gbs:7.1f} {n:6d}")

    _table("by hlo_category", cat, 12)
    _table("by tf_op (leaf)", op, args.top)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
