"""End-to-end MXU-utilization audit of the headline bench workload.

Measures the CFG denoise step (batch-2 SD v1.4 UNet forward at 64² latents,
bf16 — exactly bench.py's per-step work) with differential fori_loop timing
(utils/timing.per_iter_ms, tunnel-latency-free), pulls the compiled step's
FLOP count from XLA's own cost analysis, and reports achieved TFLOP/s
against the chip's measured dense-matmul peak (utils/timing docstring:
204 TFLOP/s bf16 on this box's 4096³ probe).

Answers "how far from speed-of-light is the whole step?" — the per-kernel
levers (flash blocks, d-packing, head-packing) are individually closed in
PERF.md; this is the honest aggregate number.

Usage: python scripts/roofline_sampler.py   (real chip; compile cached)
"""
from __future__ import annotations

import json
import os

import jax

os.makedirs("/root/repo/.cache/jax", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402

MEASURED_PEAK_TFLOPS = 204.0     # 4096³ bf16 matmul on this chip (timing.py)


def main():
    from celebbasis_tpu.diffusion.sampler import guided_eps
    from celebbasis_tpu.models.unet import UNetConfig, UNetModel
    from celebbasis_tpu.utils.precision import cast_float_params
    from celebbasis_tpu.utils.timing import per_iter_ms

    cfg = UNetConfig.sd_v1()
    model = UNetModel(cfg, dtype=jnp.bfloat16)
    B, H = 1, 64
    x = jnp.zeros((B, H, H, 4), jnp.float32)
    t = jnp.zeros((B,), jnp.int32)
    ctx = jax.random.normal(jax.random.key(1), (2 * B, 77, cfg.context_dim))
    params = jax.jit(model.init)(jax.random.key(0), x, t, ctx[:B])
    params = cast_float_params(params, jnp.bfloat16)

    def step(params, x, t, ctx):
        eps = guided_eps(lambda a, b, c: model.apply(params, a, b, c),
                         x, t, ctx[B:], ctx[:B], 10.0)
        # shape-preserving combine so the step chains under fori_loop
        return x - 0.01 * eps

    # ---- XLA's own FLOP count for one step --------------------------------
    lowered = jax.jit(step).lower(params, x, t, ctx)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", float("nan")))

    # ---- measured per-step time (differential, tunnel-free) ---------------
    op = lambda h: step(params, h, t, ctx)
    ms = per_iter_ms(op, x)          # first loop in a process is polluted
    ms = per_iter_ms(op, x)          # measure twice, keep the second
    tflops = flops / (ms * 1e-3) / 1e12
    out = {
        "per_step_ms": round(ms, 3),
        "xla_flops_per_step": flops,
        "achieved_tflops": round(tflops, 2),
        "measured_chip_peak_tflops": MEASURED_PEAK_TFLOPS,
        "mxu_utilization_pct": round(100 * tflops / MEASURED_PEAK_TFLOPS, 1),
        "steps_per_sec_equiv": round(1e3 / ms, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
