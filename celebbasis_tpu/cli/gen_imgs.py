"""Batch generation for evaluation — ``evaluation/gen_imgs.py`` (W4 stage 1).

Generates the prompts x identity-pairs grid with the reference's file naming
contract ``<out>/<prompt_idx:03d>_<prompt_slug>/<i:05d>_id<j>_#<k>.jpg``
(base_class.py:82-110, resumable), using the jitted txt2img pipeline.
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from celebbasis_tpu.eval.prompt_templates import get_pos_neg_temps
from celebbasis_tpu.loader import assemble
from celebbasis_tpu.utils.config import load_run_spec


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, nargs="+",
                   default=["configs/aigc_id.yaml"])
    p.add_argument("--embedding_path", type=str, required=True)
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--from-file", dest="from_file", type=str, required=True)
    p.add_argument("--outdir", type=str, default="outputs/eval_gen")
    p.add_argument("--ids", type=int, nargs="+", default=list(range(10)))
    p.add_argument("--pair_shift", type=int, default=1,
                   help="second identity = (id + shift) %% n_ids for "
                        "two-person prompts (base_class.py shift_id)")
    p.add_argument("--n_samples", type=int, default=4)
    p.add_argument("--ddim_steps", type=int, default=50)
    p.add_argument("--scale", type=float, default=10.0)
    p.add_argument("--H", type=int, default=512)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--vocab", type=str, default=None)
    p.add_argument("--precision", choices=["bf16", "fp32"], default="bf16")
    p.add_argument("--use_pos_temp", action="store_true",
                   help="wrap prompts in the positive template (the "
                        "reference ships this line commented out, "
                        "gen_imgs.py:86; default matches: raw prompt)")
    args = p.parse_args(argv)

    spec = load_run_spec(args.config)
    asm = assemble(spec, sd_ckpt=args.ckpt, vocab_path=args.vocab,
                   embedding_ckpt=args.embedding_path, image_size=args.H,
                   seed=args.seed,
                   param_dtype=jnp.bfloat16 if args.precision == "bf16"
                   else None)
    with open(args.from_file) as f:
        prompts = [l.strip() for l in f if l.strip()]
    # the negative template is the unconditional prompt under CFG
    # (reference gen_imgs.py:92-95); the positive template is opt-in
    pos_t, neg_t = get_pos_neg_temps(os.path.basename(args.from_file))

    fn = asm.pipeline.make_txt2img_fn(num_steps=args.ddim_steps,
                                      guidance_scale=args.scale,
                                      image_size=args.H, output="uint8")
    from PIL import Image
    B = args.n_samples
    rng = jax.random.key(args.seed)
    k = len(asm.pipeline.manager_cfg.placeholder_token_ids)
    n_ids = len(args.ids)
    for pi, prompt in enumerate(prompts):
        two_person = "ks person" in prompt.replace("sks person", "")
        slug = "".join(c if c.isalnum() else "-" for c in prompt[:50])
        outdir = os.path.join(args.outdir, f"{pi:03d}_{slug}")
        os.makedirs(outdir, exist_ok=True)
        text = pos_t.format(prompt) if args.use_pos_temp else prompt
        for id_idx in args.ids:
            pair = (id_idx + args.pair_shift) % n_ids
            name0 = os.path.join(outdir, f"{pi:05d}_id{id_idx}_#0.jpg")
            if os.path.exists(name0):
                continue  # resumable
            tokens = jnp.asarray(asm.tokenizer([text] * B))
            uncond = jnp.asarray(asm.tokenizer([neg_t] * B))
            ids_row = ([id_idx, pair] + [0] * k)[:k]
            ids = jnp.asarray(np.tile(ids_row, (B, 1)).astype(np.int32))
            num_ids = jnp.full((B,), 2 if two_person else 1, jnp.int32)
            rng, sub = jax.random.split(rng)
            imgs = np.asarray(fn(asm.params, asm.manager_state, asm.basis,
                                 tokens, uncond, ids, num_ids, sub))
            for bi, u8 in enumerate(imgs):
                Image.fromarray(u8).save(
                    os.path.join(outdir, f"{pi:05d}_id{id_idx}_#{bi}.jpg"))
        print(f"[gen_imgs] prompt {pi}: done")


if __name__ == "__main__":
    main()
