"""Compile-cache warmup CLI.

XLA compiles of the SD-size graphs take minutes over this environment's
tunneled TPU; with the persistent compilation cache they are one-time.
This command pre-compiles the standard graphs (txt2img sampler and/or the
personalization train step) so interactive runs start hot.
"""
from __future__ import annotations

import argparse
import os
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, nargs="+",
                   default=["configs/aigc_id.yaml"])
    p.add_argument("--cache_dir", type=str, default=".cache/jax")
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--ddim_steps", type=int, default=50)
    p.add_argument("--n_samples", type=int, default=8)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--skip_train", action="store_true")
    p.add_argument("--skip_sample", action="store_true")
    p.add_argument("--precision", choices=["bf16", "fp32"], default="bf16",
                   help="match the inference CLIs' weight-storage precision "
                        "so the warmed graph is the one they run")
    args = p.parse_args(argv)

    os.makedirs(args.cache_dir, exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(args.cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    import numpy as np

    from celebbasis_tpu.loader import assemble
    from celebbasis_tpu.utils.config import load_run_spec

    spec = load_run_spec(args.config)
    asm = assemble(spec, image_size=args.image_size)

    if not args.skip_sample:
        t0 = time.time()
        # sampling CLIs default to bf16 weight storage — warm that graph
        # (training below stays fp32, its parity default)
        sample_params = asm.params
        if args.precision == "bf16":
            from celebbasis_tpu.utils.precision import cast_float_params
            sample_params = cast_float_params(asm.params)
        fn = asm.pipeline.make_txt2img_fn(num_steps=args.ddim_steps,
                                          guidance_scale=10.0,
                                          image_size=args.image_size,
                                          output="uint8")
        B = args.n_samples
        tokens = jnp.asarray(asm.tokenizer(["a photo of a sks person"] * B))
        uncond = jnp.asarray(asm.tokenizer([""] * B))
        k = len(asm.pipeline.manager_cfg.placeholder_token_ids)
        np.asarray(fn(sample_params, asm.manager_state, asm.basis, tokens,
                      uncond, jnp.zeros((B, k), jnp.int32),
                      jnp.ones((B,), jnp.int32), jax.random.key(0)))
        print(f"[warmup] txt2img graph compiled in {time.time() - t0:.0f}s")

    if not args.skip_train:
        from celebbasis_tpu.train import step as tstep
        t0 = time.time()
        trainable, meta_frozen = tstep.split_meta_params(asm.meta_params)
        frozen = {"unet": asm.params["unet"], "vae": asm.params["vae"],
                  "clip": asm.params["clip"], "meta_frozen": meta_frozen}
        opt = tstep.make_optimizer(1e-2)
        step_fn = jax.jit(tstep.make_train_step(asm.pipeline, asm.meta_net,
                                                opt))
        state = tstep.init_train_state(jax.random.key(0), trainable, opt,
                                       asm.manager_state)
        B, k, s = args.batch_size, 2, args.image_size
        batch = {
            "image": jnp.zeros((B, s, s, 3)),
            "tokens": jnp.asarray(asm.tokenizer(["a face of sks person"] * B)),
            "faces": jnp.zeros((B, k, s, s, 3)),
            "ids": jnp.zeros((B, k), jnp.int32),
            "num_ids": jnp.ones((B,), jnp.int32),
        }
        _, logs = step_fn(state, frozen, asm.basis, batch)
        float(logs["loss"])
        print(f"[warmup] train step compiled in {time.time() - t0:.0f}s")
    print(f"[warmup] cache at {os.path.abspath(args.cache_dir)}")


if __name__ == "__main__":
    main()
