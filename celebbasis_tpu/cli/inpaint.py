"""Latent-diffusion inpainting CLI — the reference's ``scripts/inpaint.py``.

Drives a concat-conditioned inpainting model (``models/ldm/inpainting_big/
config.yaml``): for each ``example.png`` + ``example_mask.png`` pair in
``--indir``, the conditioning is the VQ-encoded masked image concatenated
with the mask downsampled to latent resolution (scripts/inpaint.py:76-84),
DDIM-sampled and composited back over the unmasked pixels (:88-98).

TPU-first: the whole encode -> DDIM scan -> decode -> composite -> uint8
path is ONE jitted function, reused across images (fixed shapes); pixels
leave the device already quantized (pipeline.finish_images).

No pretrained weights ship in this image; without ``--ckpt`` the model runs
random-init (shape/determinism verification).
"""
from __future__ import annotations

import argparse
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from celebbasis_tpu.legacy import build_legacy_ldm
from celebbasis_tpu.pipeline import finish_images


def make_batch(image_path: str, mask_path: str, size: int | None = None):
    """image/mask files -> dict of float32 NHWC arrays in [-1, 1]
    (scripts/inpaint.py:11-30: binarize mask at 0.5, masked_image =
    (1-mask)*image in [0,1], then everything *2-1)."""
    from PIL import Image
    img = Image.open(image_path).convert("RGB")
    msk = Image.open(mask_path).convert("L")
    if size is not None:
        img = img.resize((size, size), Image.BICUBIC)
        msk = msk.resize((size, size), Image.NEAREST)
    image = np.asarray(img, np.float32)[None] / 255.0
    mask = np.asarray(msk, np.float32)[None, ..., None] / 255.0
    mask = (mask >= 0.5).astype(np.float32)
    masked = (1.0 - mask) * image
    return {"image": image * 2 - 1, "mask": mask * 2 - 1,
            "masked_image": masked * 2 - 1}


def make_inpaint_fn(ldm, steps: int = 50):
    """(params, rng, image, mask, masked_image) -> uint8 pixels, jittable.

    All inputs in [-1, 1] NHWC; output composited like the reference
    (inpainted = (1-mask)*image + mask*predicted, in [0,1] space)."""
    sample = ldm.make_sample_fn(num_steps=steps, raw_cond=True)

    def fn(params, rng, image, mask, masked_image):
        c = ldm.get_learned_conditioning(params, masked_image)
        f = mask.shape[1] // c.shape[1]
        cc = mask[:, ::f, ::f, :]          # F.interpolate nearest to latent
        ctx = jnp.concatenate([c, cc.astype(c.dtype)], axis=-1)
        pred = sample(params, rng, ctx, image.shape[0])
        img01 = jnp.clip((image + 1.0) / 2.0, 0.0, 1.0)
        msk01 = jnp.clip((mask + 1.0) / 2.0, 0.0, 1.0)
        pred01 = jnp.clip((pred + 1.0) / 2.0, 0.0, 1.0)
        out = (1.0 - msk01) * img01 + msk01 * pred01
        return finish_images(out * 2.0 - 1.0, "uint8")
    return fn


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--indir", required=True,
                    help="dir with image-mask pairs "
                         "(example.png + example_mask.png)")
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--config",
                    default="models/ldm/inpainting_big/config.yaml")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--size", type=int, default=None,
                    help="resize inputs to this square size "
                         "(default: use file sizes, must be /8)")
    ap.add_argument("--ckpt", default=None,
                    help="optional torch .ckpt to bridge weights from")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args(argv)

    masks = sorted(glob.glob(os.path.join(args.indir, "*_mask.png")))
    images = [x.replace("_mask.png", ".png") for x in masks]
    print(f"[inpaint] Found {len(masks)} inputs.")

    with open(args.config) as f:
        cfg = yaml.safe_load(f)
    ldm = build_legacy_ldm(cfg)
    assert ldm.cond_mode == "concat", "inpaint needs a concat-mode config"
    rng = jax.random.key(args.seed)
    rng, k_init = jax.random.split(rng)
    params = ldm.init_params(k_init)
    if args.ckpt:
        from celebbasis_tpu.utils import bridge
        from celebbasis_tpu.utils.pt_io import load_pt
        state = load_pt(args.ckpt)
        state = state.get("state_dict", state)
        params["unet"] = bridge.convert_unet(state, ldm.unet.cfg)
        dd = cfg["model"]["params"]["first_stage_config"]["params"]["ddconfig"]
        params["first_stage"] = bridge.convert_vq(
            state, ch_mult=tuple(dd["ch_mult"]),
            num_res_blocks=dd["num_res_blocks"],
            attn_resolutions=tuple(dd.get("attn_resolutions", ()) or ()),
            resolution=dd.get("resolution", 256),
            attn_type=dd.get("attn_type", "vanilla"))
        print(f"[inpaint] bridged weights from {args.ckpt}")

    os.makedirs(args.outdir, exist_ok=True)
    run = jax.jit(make_inpaint_fn(ldm, steps=args.steps))
    from PIL import Image
    for image_path, mask_path in zip(images, masks):
        batch = make_batch(image_path, mask_path, args.size)
        rng, k = jax.random.split(rng)
        pixels = np.asarray(run(params, k,
                                jnp.asarray(batch["image"]),
                                jnp.asarray(batch["mask"]),
                                jnp.asarray(batch["masked_image"])))
        outpath = os.path.join(args.outdir, os.path.basename(image_path))
        Image.fromarray(pixels[0]).save(outpath)
        print(f"[inpaint] {outpath}")


if __name__ == "__main__":
    main()
