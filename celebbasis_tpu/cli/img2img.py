"""img2img / inpaint CLI — the reference's DDIM stochastic encode/decode and
mask-blend paths (`/root/reference/ldm/models/diffusion/ddim.py:206-241`,
``ddim_sampling`` mask branch :144-147, legacy ``scripts/inpaint.py``).

Pipeline (jitted end to end): VAE-encode the init image, noise it to
``strength`` of the DDIM chain, denoise with CFG; with ``--mask`` each step
re-blends the known region of the forward-noised original (white mask pixels
= regenerate).
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from celebbasis_tpu.diffusion.sampler import SamplerConfig, ddim_step, guided_eps
from celebbasis_tpu.diffusion.schedules import make_ddim_schedule
from celebbasis_tpu.loader import assemble
from celebbasis_tpu.models.vae import AutoencoderKL, sample_posterior
from celebbasis_tpu.pipeline import finish_images
from celebbasis_tpu.utils.config import load_run_spec


def make_img2img_fn(pipe, num_steps: int, strength: float,
                    guidance_scale: float, image_size: int,
                    output: str = "float"):
    ddim = make_ddim_schedule(pipe.schedule, num_steps, eta=0.0)
    t_enc = max(1, min(int(strength * num_steps), num_steps))
    order = slice(None, None, -1)
    ts = jnp.asarray(ddim.timesteps[:t_enc][order].copy(), jnp.int32)
    alphas = jnp.asarray(ddim.alphas[:t_enc][order].copy(), jnp.float32)
    alphas_prev = jnp.asarray(ddim.alphas_prev[:t_enc][order].copy(),
                              jnp.float32)
    sqrt_omas = jnp.asarray(ddim.sqrt_one_minus_alphas[:t_enc][order].copy(),
                            jnp.float32)
    # stochastic_encode gathers ddim_alphas[t_enc] — one level ABOVE the
    # first decode step's alpha (ddim.py:207-220; scripts-style
    # t_enc = int(strength * steps)).  At strength 1.0 the reference indexes
    # out of bounds and crashes; we define that case as pure noise
    # (alpha -> 0), i.e. full regeneration.
    a_enc = float(ddim.alphas[t_enc]) if t_enc < num_steps else 0.0
    scale_f = pipe.cfg.scale_factor

    def fn(params, mstate, basis, init_image, mask, tokens, uncond_tokens,
           ids, num_ids, rng, override_z0=None, override_noise=None):
        # override_z0 / override_noise: oracle hooks (like txt2img's x_T) —
        # bypass the posterior draw / encode-noise draw with explicit values
        B = tokens.shape[0]
        cond = pipe.conditioning(params, tokens, mstate, basis, ids, num_ids)
        uncond = pipe.conditioning(params, uncond_tokens)
        rng, r_enc, r_noise = jax.random.split(rng, 3)
        if override_z0 is None:
            mean, logvar = pipe.vae.apply(params["vae"], init_image,
                                          method=AutoencoderKL.encode)
            z0 = sample_posterior(r_enc, mean, logvar) * scale_f
        else:
            z0 = override_z0
        noise = (jax.random.normal(r_noise, z0.shape)
                 if override_noise is None else override_noise)
        x = jnp.sqrt(a_enc) * z0 + jnp.sqrt(1 - a_enc) * noise
        eps_model = pipe.eps_model(params)

        def body(x, per):
            t, a_t, a_prev, soma = per
            tb = jnp.full((B,), t, jnp.int32)
            # inpainting: re-impose the known region at x_t's noise level
            if mask is not None:
                z_known = jnp.sqrt(a_t) * z0 + jnp.sqrt(1 - a_t) * noise
                x = z_known * (1 - mask) + x * mask
            e = guided_eps(eps_model, x, tb, cond, uncond, guidance_scale)
            x, _ = ddim_step(x, e, a_t, a_prev, soma, 0.0, 0.0)
            return x, None

        x, _ = jax.lax.scan(body, x, (ts, alphas, alphas_prev, sqrt_omas))
        if mask is not None:
            x = z0 * (1 - mask) + x * mask
        img = pipe.vae.apply(params["vae"], x / scale_f,
                             method=AutoencoderKL.decode)
        return finish_images(img, output)

    return jax.jit(fn, static_argnames=())


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--init-img", required=True)
    p.add_argument("--mask", default=None,
                   help="grayscale mask; white = regenerate")
    p.add_argument("--prompt", default="a photo of a sks person")
    p.add_argument("--config", type=str, nargs="+",
                   default=["configs/aigc_id.yaml"])
    p.add_argument("--ckpt", default=None)
    p.add_argument("--embedding_path", default=None)
    p.add_argument("--outdir", default="outputs/img2img")
    p.add_argument("--strength", type=float, default=0.75)
    p.add_argument("--ddim_steps", type=int, default=50)
    p.add_argument("--scale", type=float, default=10.0)
    p.add_argument("--n_samples", type=int, default=4)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--ids", type=int, nargs="+", default=[0])
    p.add_argument("--vocab", default=None)
    p.add_argument("--precision", choices=["bf16", "fp32"], default="bf16")
    args = p.parse_args(argv)

    from PIL import Image
    init = Image.open(args.init_img).convert("RGB")
    size = (init.size[0] // 64) * 64 or 64
    init = init.resize((size, size), Image.LANCZOS)
    init_arr = np.asarray(init, np.float32) / 127.5 - 1.0

    spec = load_run_spec(args.config)
    asm = assemble(spec, sd_ckpt=args.ckpt, vocab_path=args.vocab,
                   embedding_ckpt=args.embedding_path, image_size=size,
                   seed=args.seed,
                   param_dtype=jnp.bfloat16 if args.precision == "bf16"
                   else None)
    f = asm.pipeline.latent_factor
    mask = None
    if args.mask:
        m = Image.open(args.mask).convert("L").resize(
            (size // f, size // f), Image.NEAREST)
        mask = jnp.asarray((np.asarray(m) > 127).astype(np.float32)
                           )[None, :, :, None]

    B = args.n_samples
    fn = make_img2img_fn(asm.pipeline, args.ddim_steps, args.strength,
                         args.scale, size, output="uint8")
    tokens = jnp.asarray(asm.tokenizer([args.prompt] * B))
    uncond = jnp.asarray(asm.tokenizer([""] * B))
    k = len(asm.pipeline.manager_cfg.placeholder_token_ids)
    ids = jnp.asarray(np.tile((list(args.ids) + [0] * k)[:k], (B, 1)),
                      jnp.int32)
    num_ids = jnp.full((B,), len(args.ids), jnp.int32)
    init_b = jnp.asarray(np.tile(init_arr[None], (B, 1, 1, 1)))
    imgs = np.asarray(fn(asm.params, asm.manager_state, asm.basis, init_b,
                         mask, tokens, uncond, ids, num_ids,
                         jax.random.key(args.seed)))
    os.makedirs(args.outdir, exist_ok=True)
    for i, u8 in enumerate(imgs):
        Image.fromarray(u8).save(os.path.join(args.outdir, f"{i:05d}.jpg"))
    print(f"[img2img] wrote {B} images to {args.outdir}")


if __name__ == "__main__":
    main()
