"""txt2img CLI — the reference's ``scripts/stable_txt2img.py`` for TPU.

Same knobs and defaults as ``02_start_test.sh:36-49``: prompt file or single
prompt, DDIM 50 steps, CFG scale 10, eta 0, 512x512, n_samples per prompt,
seed 42, ``--embedding_path`` for the trained coefficients, two-pseudo-word
prompts (``sks``/``ks``) selecting saved identities via ``--ids``.

The whole prompt -> image path is one jitted function; prompts are batched
through it with a fixed shape so the compile is reused.
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from celebbasis_tpu.loader import assemble
from celebbasis_tpu.utils.config import load_run_spec


def save_images(arr: np.ndarray, outdir: str, start_idx: int, grid: bool):
    from PIL import Image
    os.makedirs(outdir, exist_ok=True)
    if arr.dtype == np.uint8:       # quantized on device (finish_images)
        imgs = arr
    else:
        imgs = ((arr + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
    paths = []
    for i, im in enumerate(imgs):
        p = os.path.join(outdir, f"{start_idx + i:05d}.jpg")
        Image.fromarray(im).save(p)
        paths.append(p)
    if grid and len(imgs) > 1:
        n = len(imgs)
        cols = int(np.ceil(np.sqrt(n)))
        rows = int(np.ceil(n / cols))
        h, w = imgs.shape[1:3]
        canvas = np.zeros((rows * h, cols * w, 3), np.uint8)
        for i, im in enumerate(imgs):
            r, c = divmod(i, cols)
            canvas[r * h:(r + 1) * h, c * w:(c + 1) * w] = im
        Image.fromarray(canvas).save(os.path.join(outdir, "grid.jpg"))
    return paths


def load_face_crops(paths, size: int) -> np.ndarray:
    """Aligned face photos -> (k, size, size, 3) float32 in [-1, 1].

    The reference's test_mode='image' preprocessing (stable_txt2img.py:297-308:
    Resize(512) + Normalize(0.5, 0.5)); crops are expected pre-aligned (the
    W0 align CLI produces them — `python -m celebbasis_tpu.cli.align`).
    """
    from PIL import Image
    out = []
    for p in paths:
        img = Image.open(p).convert("RGB").resize((size, size),
                                                  Image.BILINEAR)
        out.append(np.asarray(img, np.float32) / 127.5 - 1.0)
    return np.stack(out)


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--prompt", type=str, default=None)
    p.add_argument("--from-file", dest="from_file", type=str, default=None)
    p.add_argument("--outdir", type=str, default="outputs/txt2img-samples")
    p.add_argument("--config", type=str, nargs="+",
                   default=["configs/aigc_id.yaml"])
    p.add_argument("--ckpt", type=str, default=None,
                   help="sd-v1-4 torch checkpoint to bridge")
    p.add_argument("--embedding_path", type=str, default=None,
                   help="embeddings_gs-*.pt with trained id coefficients")
    p.add_argument("--ti_embedding", type=str, default=None,
                   help="textual-inversion checkpoint (string_to_param .pt); "
                        "placeholders in the prompt are replaced by its "
                        "learned vectors")
    p.add_argument("--vocab", type=str, default=None)
    p.add_argument("--ddim_steps", type=int, default=50)
    p.add_argument("--plms", action="store_true")
    p.add_argument("--ddim_eta", type=float, default=0.0)
    p.add_argument("--scale", type=float, default=10.0)
    p.add_argument("--n_samples", type=int, default=8)
    p.add_argument("--H", type=int, default=512)
    p.add_argument("--W", type=int, default=512)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--ids", type=int, nargs="+", default=[0, 1],
                   help="identity indices bound to placeholders sks, ks, ...")
    p.add_argument("--faces", type=str, nargs="+", default=None,
                   help="1-2 aligned face photos: live-face conditioning "
                        "(test_mode='image') — identity embeddings come from "
                        "a fresh MetaIdNet forward instead of saved "
                        "coefficients (stable_txt2img.py:271-318)")
    p.add_argument("--fr_ckpt", type=str, default=None,
                   help="CosFace IResNet-100 backbone.pth for --faces")
    p.add_argument("--no-grid", action="store_true")
    p.add_argument("--precision", choices=["bf16", "fp32"], default="bf16",
                   help="frozen-weight storage; bf16 halves their HBM "
                        "traffic (inference default), fp32 for exact "
                        "parity runs")
    p.add_argument("--mesh", type=int, default=None,
                   help="shard the sample batch over N devices (data-parallel"
                        " sampling; n_samples must divide by N)")
    p.add_argument("--tp", type=int, default=None,
                   help="tensor-parallel sampling over N devices (Megatron "
                        "attention/MLP sharding of the frozen UNet/CLIP; "
                        "cuts single-image latency instead of batching — "
                        "composes with --mesh as a (data, model) mesh). "
                        "On a v5e-8 prefer --mesh 8 when batch >= 8 and "
                        "--mesh 4 --tp 2 when latency-bound; see PERF.md "
                        "'TP sampling audit' for the measured collective/"
                        "HBM table behind this")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    assert args.H == args.W, "square outputs only"
    spec = load_run_spec(args.config)
    asm = assemble(spec, sd_ckpt=args.ckpt, vocab_path=args.vocab,
                   fr_ckpt=args.fr_ckpt,
                   embedding_ckpt=args.embedding_path, image_size=args.H,
                   seed=args.seed,
                   param_dtype=jnp.bfloat16 if args.precision == "bf16"
                   else None)

    if args.from_file:
        with open(args.from_file) as f:
            prompts = [l.strip() for l in f if l.strip()]
    else:
        prompts = [args.prompt or "a photo of a sks person"]

    pipe = asm.pipeline
    sampler = "plms" if args.plms else "ddim"
    faces_arr = None
    if args.faces:
        faces_arr = load_face_crops(args.faces, args.H)  # (k, H, H, 3)
        faces_fn = pipe.make_txt2img_faces_fn(
            asm.meta_net, num_steps=args.ddim_steps,
            guidance_scale=args.scale, eta=args.ddim_eta, image_size=args.H,
            sampler=sampler, output="uint8")

        def fn(params, _state, basis, tokens, uncond, ids, num_ids, rng):
            B = tokens.shape[0]
            faces = jnp.broadcast_to(jnp.asarray(faces_arr)[None],
                                     (B,) + faces_arr.shape)
            return faces_fn(params, asm.meta_params, basis, tokens, uncond,
                            faces, ids, num_ids, rng)
    elif args.ti_embedding:
        from celebbasis_tpu.core import textual_inversion as ti
        vectors = ti.load_ti_checkpoint(args.ti_embedding)
        names = sorted(vectors)
        V = vectors[names[0]].shape[0]
        ti_cfg = ti.TIConfig(placeholder_strings=tuple(names),
                             num_vectors_per_token=V,
                             token_dim=spec.clip.width)
        ti_params = jnp.asarray(np.stack([vectors[n] for n in names]))
        ph_ids = ti.placeholder_token_ids(ti_cfg, asm.tokenizer)
        ti_fn = pipe.make_txt2img_ti_fn(
            ti_cfg, ph_ids, num_steps=args.ddim_steps,
            guidance_scale=args.scale, eta=args.ddim_eta, image_size=args.H,
            sampler=sampler, output="uint8")

        def fn(params, _state, _basis, tokens, uncond, _ids, _num_ids, rng):
            return ti_fn(params, ti_params, tokens, uncond, rng)
    else:
        fn = pipe.make_txt2img_fn(
            num_steps=args.ddim_steps, guidance_scale=args.scale,
            eta=args.ddim_eta, image_size=args.H, sampler=sampler,
            output="uint8")

    B = args.n_samples
    # in faces mode the id axis follows the supplied photos (one face slot
    # per pseudo-word); otherwise it follows the placeholder list
    k = (len(args.faces) if args.faces
         else len(asm.pipeline.manager_cfg.placeholder_token_ids))
    ids_row = (list(args.ids) + [0] * k)[:k]
    n_active = len(args.faces) if args.faces else len(args.ids)
    rng = jax.random.key(args.seed)
    mesh = None
    if args.mesh or args.tp:
        from celebbasis_tpu.parallel import mesh as pmesh
        n_data, n_model = args.mesh or 1, args.tp or 1
        assert B % n_data == 0, "--mesh must divide --n_samples"
        mesh = pmesh.make_mesh(n_data=n_data, n_model=n_model)
        asm.params = pmesh.shard_params(asm.params, mesh,
                                        use_tp=(n_model > 1))
        print(f"[txt2img] sampling over a {n_data}x{n_model} "
              f"data x model mesh")

    import contextlib
    # same partitioning context the TP numerics pin runs under
    # (tests/test_tp_sampling.py) — GSPMD sees the mesh either way via
    # NamedSharding, but keeping the shipped path identical to the tested
    # one removes any doubt.
    mesh_ctx = jax.set_mesh(mesh) if mesh is not None else contextlib.nullcontext()
    idx = 0
    with mesh_ctx:
        for pi, prompt in enumerate(prompts):
            tokens = jnp.asarray(asm.tokenizer([prompt] * B))
            uncond = jnp.asarray(asm.tokenizer([""] * B))
            ids = jnp.asarray(np.tile(ids_row, (B, 1)).astype(np.int32))
            num_ids = jnp.full((B,), n_active, jnp.int32)
            if mesh is not None:
                from celebbasis_tpu.parallel import mesh as pmesh
                tokens, uncond, ids, num_ids = (
                    pmesh.shard_batch((tokens, uncond, ids, num_ids), mesh))
            rng, sub = jax.random.split(rng)
            imgs = fn(asm.params, asm.manager_state, asm.basis, tokens,
                      uncond, ids, num_ids, sub)
            outdir = os.path.join(args.outdir, f"{pi:03d}_" +
                                  "".join(c if c.isalnum() else "-"
                                          for c in prompt[:60]))
            paths = save_images(np.asarray(imgs), outdir, idx,
                                grid=not args.no_grid)
            idx += B
            print(f"[txt2img] {prompt!r} -> {len(paths)} images in {outdir}")


if __name__ == "__main__":
    main()
