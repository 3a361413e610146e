"""TI-model evaluation CLI — the reference's ``scripts/evaluate_model.py``:
load the txt2img-1p4B eval config (BERT-path legacy LDM), optionally a
textual-inversion embedding checkpoint, sample N images from a prompt with
CFG 5.0, and score CLIP image-image / text-image similarity against the
training images (`LDMCLIPEvaluator.evaluate`, evaluation/clip_eval.py:80-119).

No pretrained weights ship in this image: without --ckpt / --clip-ckpt the
pipeline runs random-init (structure verification; bridges make real
weights drop-ins).
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from celebbasis_tpu.cli.eval_imgs import build_scorers
from celebbasis_tpu.legacy import build_legacy_ldm
from celebbasis_tpu.pipeline import finish_images

_DEFAULT_CFG = ("/root/reference/configs/latent-diffusion/"
                "txt2img-1p4B-eval_with_tokens.yaml")


def make_ti_inject(ldm, embedding_path: str):
    """TI embedding .pt -> inject(ids, embedded) hook for the BERT/CLIP
    token-embedding layer (embedding_manager.py:97-146 lookup semantics:
    rows whose token id is a placeholder get the learned vector)."""
    from celebbasis_tpu.core.textual_inversion import load_ti_checkpoint
    table = load_ti_checkpoint(embedding_path)   # {placeholder: (V, D)}
    pairs = []
    for string, vecs in table.items():
        ids = ldm.tokenizer.tokenize(string)
        # single-token placeholder contract; first vector row replaces it
        pairs.append((ids[0], jnp.asarray(np.asarray(vecs)[0])))

    def inject(ids, embedded):
        for tok, vec in pairs:
            if vec.shape[-1] != embedded.shape[-1]:
                raise ValueError(
                    f"TI vector dim {vec.shape[-1]} != text width "
                    f"{embedded.shape[-1]}")
            mask = (ids == tok)[..., None]
            embedded = jnp.where(mask, vec, embedded)
        return embedded
    return inject


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--prompt", default="a painting of a * monster "
                                        "playing guitar")
    ap.add_argument("--config", default=_DEFAULT_CFG)
    ap.add_argument("--ckpt-path", default=None,
                    help="pretrained LDM .ckpt to bridge")
    ap.add_argument("--embedding-path", default=None,
                    help="TI embedding manager .pt")
    ap.add_argument("--data-dir", required=True,
                    help="folder of training images to compare against")
    ap.add_argument("--out-dir", default="./eval_out")
    ap.add_argument("--n-samples", type=int, default=64)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--scale", type=float, default=5.0)
    ap.add_argument("--clip-ckpt", default=None)
    ap.add_argument("--tiny-scorers", action="store_true",
                    help="toy CLIP scorers (functional verification)")
    ap.add_argument("--seed", type=int, default=17)
    args = ap.parse_args(argv)

    with open(args.config) as f:
        cfg = yaml.safe_load(f)
    ldm = build_legacy_ldm(cfg)
    rng = jax.random.key(args.seed)
    rng, k_init = jax.random.split(rng)
    params = ldm.init_params(k_init)
    if args.ckpt_path:
        from celebbasis_tpu.utils import bridge
        from celebbasis_tpu.utils.pt_io import load_pt
        state = load_pt(args.ckpt_path)
        state = state.get("state_dict", state)
        params["unet"] = bridge.convert_unet(state, ldm.unet.cfg)
        dd = cfg["model"]["params"]["first_stage_config"]["params"]["ddconfig"]
        params["first_stage"] = bridge.convert_vae(
            state, tuple(dd["ch_mult"]), dd["num_res_blocks"],
            attn_resolutions=tuple(dd.get("attn_resolutions", ()) or ()),
            resolution=dd.get("resolution", 256))
        params["cond_stage"] = bridge.convert_bert_text(
            state, depth=ldm.cond_stage.cfg.depth)

    inject = make_ti_inject(ldm, args.embedding_path) \
        if args.embedding_path else None
    sample = ldm.make_sample_fn(num_steps=args.steps,
                                guidance_scale=args.scale, inject=inject)

    # source images (PersonalizedBase at 256, flip_p=0 — evaluate_model.py:79)
    from celebbasis_tpu.data.personalized import (PersonalizedBase,
                                                  PersonalizedConfig)
    ds = PersonalizedBase(PersonalizedConfig(data_root=args.data_dir,
                                             image_size=256, flip_p=0.0,
                                             repeats=1))
    src = np.stack([ds[i]["image"] for i in range(len(ds))])

    gen = []
    n_done = 0
    while n_done < args.n_samples:
        n = min(args.batch_size, args.n_samples - n_done)
        rng, k = jax.random.split(rng)
        imgs = sample(params, k, [args.prompt] * n, n)
        gen.append(np.clip(np.asarray(imgs), -1.0, 1.0))
        n_done += n
        print(f"[evaluate_model] sampled {n_done}/{args.n_samples}")
    gen = np.concatenate(gen)

    _, clip_eval = build_scorers(clip_ckpt=args.clip_ckpt,
                                 tiny=args.tiny_scorers)
    sim_img = clip_eval.img_to_img_similarity(src, gen)
    sim_text = clip_eval.txt_to_img_similarity(
        args.prompt.replace("*", ""), gen)

    out_dir = os.path.join(args.out_dir, args.prompt.replace(" ", "-"))
    os.makedirs(out_dir, exist_ok=True)
    pixels = np.asarray(finish_images(jnp.asarray(gen), "uint8"))
    from PIL import Image
    for i in range(min(8, len(pixels))):
        Image.fromarray(pixels[i]).save(os.path.join(out_dir, f"{i:03}.png"))
    scores = {"sim_img": float(sim_img), "sim_text": float(sim_text),
              "n_samples": int(len(gen)), "prompt": args.prompt}
    with open(os.path.join(out_dir, "scores.json"), "w") as f:
        json.dump(scores, f, indent=2)
    print("Image similarity: ", scores["sim_img"])
    print("Text similarity: ", scores["sim_text"])


if __name__ == "__main__":
    main()
