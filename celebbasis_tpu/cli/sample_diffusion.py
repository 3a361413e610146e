"""Legacy LDM sampling CLI — mirrors the reference's
``scripts/sample_diffusion.py``: load a `configs/latent-diffusion/*.yaml`,
DDIM- or DDPM-sample N images (unconditional, class-conditional, or
BERT-text-conditional per the config), write PNGs + a .npz batch.

Usage:
    python -m celebbasis_tpu.cli.sample_diffusion \
        --config /root/reference/configs/latent-diffusion/celebahq-ldm-vq-4.yaml \
        --n-samples 4 --custom-steps 50 --logdir out/

No pretrained weights ship in this image; without ``--ckpt`` the model runs
random-init (shape/determinism verification — the reference CLI's structure,
wired for real weights via utils.bridge when available).
"""
from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from celebbasis_tpu.pipeline import finish_images
from celebbasis_tpu.legacy import build_legacy_ldm


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--logdir", default="./samples")
    ap.add_argument("-n", "--n-samples", type=int, default=4)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--custom-steps", type=int, default=50,
                    help="DDIM steps (reference custom_steps)")
    ap.add_argument("--eta", type=float, default=0.0)
    ap.add_argument("--vanilla", action="store_true",
                    help="full-chain DDPM instead of DDIM "
                         "(reference vanilla_sample)")
    ap.add_argument("--classes", type=int, nargs="*", default=None,
                    help="class labels for class-conditional configs")
    ap.add_argument("--scale", type=float, default=1.0,
                    help="CFG guidance scale (>1 guides against the empty "
                         "prompt, or the learned uncond class for "
                         "class-conditional configs)")
    ap.add_argument("--uncond-label", type=int, default=None,
                    help="class label used as the CFG 'unconditional' "
                         "(default n_classes-1, e.g. 1000 for cin256-v2)")
    ap.add_argument("--per-class", type=int, default=0,
                    help="render each --classes label this many times and "
                         "write a classes x per-class grid "
                         "(the latent_imagenet_diffusion.ipynb demo flow)")
    ap.add_argument("--prompt", default="a photograph",
                    help="prompt for text-conditional configs")
    ap.add_argument("--ckpt", default=None,
                    help="optional torch .ckpt to bridge weights from")
    ap.add_argument("--sr-input", default=None,
                    help="LR image for super-resolution concat configs "
                         "(bsr_sr: resized to latent resolution, N samples)")
    ap.add_argument("--seg-input", default=None,
                    help="segmentation map (PNG of class indices) for "
                         "semantic-synthesis configs; one-hot encoded to "
                         "the SpatialRescaler's in_channels")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args(argv)

    with open(args.config) as f:
        cfg = yaml.safe_load(f)
    ldm = build_legacy_ldm(cfg)
    print(f"[sample_diffusion] first_stage={ldm.first_stage_kind} "
          f"cond={ldm.cond_kind} latent={ldm.image_size}^2x{ldm.channels}")

    sr_cond = None
    if ldm.cond_mode == "concat":
        from PIL import Image
        if args.sr_input and ldm.cond_kind == "identity":
            # bsr_sr flow: the LR image (at latent resolution) rides as
            # concat channels; N samples of the same LR input
            lr = Image.open(args.sr_input).convert("RGB").resize(
                (ldm.image_size, ldm.image_size), Image.BICUBIC)
            sr_cond = np.asarray(lr, np.float32)[None] / 127.5 - 1.0
        elif args.seg_input and ldm.cond_kind == "rescaler":
            # semantic synthesis: class-index PNG -> one-hot (B,H,W,182)
            # at 2^n_stages x latent resolution, rescaler+concat-fed
            n_up = 2 ** ldm.cond_stage.n_stages
            res = ldm.image_size * n_up
            seg = Image.open(args.seg_input).convert("L").resize(
                (res, res), Image.NEAREST)
            n_cls = ldm.cond_stage_params.get("in_channels", 182)
            idx = np.minimum(np.asarray(seg, np.int64), n_cls - 1)
            sr_cond = np.eye(n_cls, dtype=np.float32)[idx][None]
        else:
            raise SystemExit(
                "concat-conditioned config: use `python -m "
                "celebbasis_tpu.cli.inpaint` for inpainting, pass "
                "--sr-input (SR) or --seg-input (semantic synthesis), or "
                "drive LegacyLDM.make_sample_fn with conditioning arrays")

    rng = jax.random.key(args.seed)
    rng, k_init = jax.random.split(rng)
    params = ldm.init_params(k_init)
    if args.ckpt:
        from celebbasis_tpu.utils import bridge
        from celebbasis_tpu.utils.pt_io import load_pt
        state = load_pt(args.ckpt)
        state = state.get("state_dict", state)
        params["unet"] = bridge.convert_unet(state, ldm.unet.cfg)
        fsp = cfg["model"]["params"]["first_stage_config"]["params"]
        dd = fsp["ddconfig"]
        kw = dict(ch_mult=tuple(dd["ch_mult"]),
                  num_res_blocks=dd["num_res_blocks"],
                  attn_resolutions=tuple(dd.get("attn_resolutions", ()) or ()),
                  resolution=dd.get("resolution", 256))
        if ldm.first_stage_kind == "vq":
            params["first_stage"] = bridge.convert_vq(state, **kw)
        else:
            params["first_stage"] = bridge.convert_vae(state, **kw)
        if ldm.cond_kind == "bert":
            params["cond_stage"] = bridge.convert_bert_text(
                state, depth=ldm.cond_stage.cfg.depth)
        print(f"[sample_diffusion] bridged weights from {args.ckpt}")

    sample = ldm.make_sample_fn(num_steps=args.custom_steps, eta=args.eta,
                                ddim=not args.vanilla,
                                guidance_scale=args.scale,
                                uncond_label=args.uncond_label)
    os.makedirs(args.logdir, exist_ok=True)
    from PIL import Image

    if args.per_class > 0:
        # latent_imagenet_diffusion.ipynb flow: one batch per class label,
        # CFG vs the learned uncond class, stacked into a grid
        if ldm.cond_kind != "class":
            raise SystemExit("--per-class needs a class-conditional config")
        labels = args.classes or [0]
        n = args.per_class
        rows = []
        for lbl in labels:
            rng, k = jax.random.split(rng)
            imgs = sample(params, k, np.full((n,), lbl, np.int64), n)
            row = np.asarray(finish_images(imgs, "uint8"))
            rows.append(row)
            for j in range(n):
                Image.fromarray(row[j]).save(os.path.join(
                    args.logdir, f"class{lbl:04d}_{j:02d}.png"))
            print(f"[sample_diffusion] class {lbl}: {n} samples "
                  f"(scale {args.scale})")
        grid = np.concatenate([np.concatenate(list(r), axis=1)
                               for r in rows], axis=0)
        Image.fromarray(grid).save(os.path.join(args.logdir, "grid.png"))
        print(f"[sample_diffusion] wrote {grid.shape} grid.png to "
              f"{args.logdir}")
        return

    cond_batch = None
    n_done, all_imgs = 0, []
    t0 = time.time()
    while n_done < args.n_samples:
        n = min(args.batch_size, args.n_samples - n_done)
        rng, k = jax.random.split(rng)
        if sr_cond is not None:
            cond_batch = np.repeat(sr_cond, n, axis=0)
        elif ldm.cond_kind == "class":
            labels = (args.classes or list(range(n)))[:n]
            cond_batch = np.asarray(labels + [0] * (n - len(labels)))
        elif ldm.cond_kind in ("bert", "clip"):
            cond_batch = [args.prompt] * n
        imgs = sample(params, k, cond_batch, n)
        pixels = np.asarray(finish_images(imgs, "uint8"))
        all_imgs.append(pixels)
        for j in range(n):
            Image.fromarray(pixels[j]).save(
                os.path.join(args.logdir, f"{n_done + j:06}.png"))
        n_done += n
        print(f"[sample_diffusion] {n_done}/{args.n_samples} "
              f"({time.time() - t0:.1f}s)")

    batch = np.concatenate(all_imgs)
    np.savez(os.path.join(args.logdir, "samples.npz"), samples=batch)
    with open(os.path.join(args.logdir, "sampling_config.json"), "w") as f:
        json.dump({"config": args.config, "n_samples": args.n_samples,
                   "steps": args.custom_steps, "eta": args.eta,
                   "vanilla": args.vanilla, "seed": args.seed}, f, indent=2)
    print(f"[sample_diffusion] wrote {batch.shape} to {args.logdir}")


if __name__ == "__main__":
    main()
