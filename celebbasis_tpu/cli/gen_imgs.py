"""Batch generation for evaluation — ``evaluation/gen_imgs.py`` (W4 stage 1).

Writes the reference's generated-eval folder contract
(base_class.py:84-111 start_infer + :142-222 EvalDatasetBase):

    <outdir>/prompts.txt            one line per item (N id-pairs x L prompts,
    <outdir>/in_image_paths.txt      prompt fastest), str(list) formatting
    <outdir>/in_image_ids.txt
    <outdir>/imgs/{i:05d}_id{id0:05d}_{prompt}/{cnt:05d}.jpg

which ``cli/eval_imgs.py`` (the reference's IDCLIPScoreCalculator loop)
consumes directly.  Generation runs the jitted txt2img pipeline.
"""
from __future__ import annotations

import argparse
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from celebbasis_tpu.eval.prompt_templates import get_pos_neg_temps
from celebbasis_tpu.loader import assemble
from celebbasis_tpu.utils.config import load_run_spec


def _save_list(items, path):
    """base_class.py:77-81: '{}\n'.format(x) — lists serialize as
    str(list), which the eval-side regex parses back."""
    with open(path, "w") as f:
        f.writelines("{}\n".format(x) for x in items)


def _src_paths_by_id(folder, ids):
    """id -> source image path; accepts the reference dataset naming
    (*_id<j>_#*.jpg) or any name containing _id<j>."""
    out = {}
    if not folder:
        return {j: f"src_id{j}.jpg" for j in ids}
    for f in sorted(os.listdir(folder)):
        if not f.lower().endswith((".jpg", ".jpeg", ".png")):
            continue
        for part in os.path.splitext(f)[0].split("_"):
            if part.startswith("id") and part[2:].isdigit():
                out.setdefault(int(part[2:]), os.path.join(folder, f))
    missing = [j for j in ids if j not in out]
    if missing:
        raise FileNotFoundError(
            f"--src_folder {folder}: no *_id<j>_* image for ids {missing}")
    return out


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
    p.add_argument("--src_folder", type=str, default=None,
                   help="aligned source crops (*_id<j>_* naming) for "
                        "in_image_paths.txt; placeholders + warning if unset")
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

    n_ids = len(args.ids)
    src_of = _src_paths_by_id(args.src_folder, args.ids)
    if not args.src_folder:
        print("[gen_imgs] WARNING: no --src_folder — in_image_paths.txt "
              "gets placeholders; eval_imgs needs real source crops")
    # flat eval grid: id-pairs outer, prompts inner (base_class.py:208-218)
    items = []
    for id_idx in args.ids:
        pair = [id_idx, args.ids[(args.ids.index(id_idx) + args.pair_shift)
                                 % n_ids]]
        for prompt in prompts:
            items.append((prompt, pair))
    os.makedirs(args.outdir, exist_ok=True)
    _save_list([it[0] for it in items],
               os.path.join(args.outdir, "prompts.txt"))
    _save_list([[src_of[j] for j in it[1]] for it in items],
               os.path.join(args.outdir, "in_image_paths.txt"))
    _save_list([it[1] for it in items],
               os.path.join(args.outdir, "in_image_ids.txt"))

    fn = asm.pipeline.make_txt2img_fn(num_steps=args.ddim_steps,
                                      guidance_scale=args.scale,
                                      image_size=args.H, output="uint8")
    from PIL import Image
    B = args.n_samples
    rng = jax.random.key(args.seed)
    k = len(asm.pipeline.manager_cfg.placeholder_token_ids)
    for i, (prompt, pair) in enumerate(items):
        sub = os.path.join(args.outdir,
                           f"imgs/{i:05d}_id{pair[0]:05d}_{prompt}")
        os.makedirs(sub, exist_ok=True)
        cnt = len(os.listdir(sub))  # base_class.py:68: resumable numbering
        if cnt >= B:
            continue
        two_person = "ks person" in prompt.replace("sks person", "")
        text = pos_t.format(prompt) if args.use_pos_temp else prompt
        tokens = jnp.asarray(asm.tokenizer([text] * B))
        uncond = jnp.asarray(asm.tokenizer([neg_t] * B))
        ids_row = (list(pair) + [0] * k)[:k]
        ids = jnp.asarray(np.tile(ids_row, (B, 1)).astype(np.int32))
        num_ids = jnp.full((B,), 2 if two_person else 1, jnp.int32)
        rng, sub_rng = jax.random.split(rng)
        imgs = np.asarray(fn(asm.params, asm.manager_state, asm.basis,
                             tokens, uncond, ids, num_ids, sub_rng))
        for u8 in imgs:
            Image.fromarray(u8).save(os.path.join(sub, f"{cnt:05d}.jpg"))
            cnt += 1
        print(f"[gen_imgs] item {i}/{len(items)}: done")


if __name__ == "__main__":
    main()
