"""Training CLI — the reference's ``main_id_embed.py`` driver for TPU.

Mirrors ``01_start_train.sh``: ``--base`` config(s), ``--actual_resume`` (SD
checkpoint to bridge), ``--name``/``--logdir``, ``key=value`` overrides,
``--data_root`` (rewrites the dataset pickle path like the shell script's
sed), plus TPU-specific ``--mesh`` (data[,model] shard counts).
"""
from __future__ import annotations

import argparse
import os
import shutil

import jax
import jax.numpy as jnp
import yaml

from celebbasis_tpu.core import manager as mgr
from celebbasis_tpu.data.face_id import FaceIdDataset, PrefetchLoader
from celebbasis_tpu.loader import assemble
from celebbasis_tpu.parallel import mesh as pmesh
from celebbasis_tpu.train import step as tstep
from celebbasis_tpu.train.trainer import Trainer, TrainerConfig, make_run_dir
from celebbasis_tpu.utils.config import load_run_spec, load_yaml_configs


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--base", type=str, nargs="+",
                   default=["configs/aigc_id.yaml"])
    p.add_argument("--name", type=str, default="aigc_id")
    p.add_argument("--logdir", type=str, default="logs")
    p.add_argument("--actual_resume", type=str, default=None,
                   help="sd-v1-4 torch checkpoint to bridge")
    p.add_argument("--fr_ckpt", type=str, default=None,
                   help="CosFace R100 backbone.pth to bridge")
    p.add_argument("--vocab", type=str, default=None)
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--seed", type=int, default=23)
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--face_size", type=int, default=512)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--mesh", type=int, nargs="+", default=None,
                   help="data [model] shard counts, e.g. --mesh 8 or 4 2")
    p.add_argument("--cache_latents", type=int, default=0,
                   help="fast mode: precompute N augmented batches of frozen "
                        "VAE posteriors + FR features and cycle them (exact "
                        "per-sample semantics; aug variety limited to N*bs)")
    p.add_argument("--fsdp", action="store_true",
                   help="shard large frozen weights over the mesh 'data' "
                        "axis (GSPMD all-gathers at use): ~Nx less frozen "
                        "HBM per chip on an N-way mesh")
    p.add_argument("--frozen_bf16", action="store_true",
                   help="store the frozen UNet/VAE/CLIP/FR weights in bf16 "
                        "(halves their HBM reads per step; fp32 is the "
                        "parity default)")
    p.add_argument("-r", "--resume", type=str, default=None,
                   help="resume from a run dir (loads the latest "
                        "embeddings_gs-*.pt; reference main_id_embed -r)")
    p.add_argument("overrides", nargs="*", default=[],
                   help="config dot-list overrides key=value")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    spec = load_run_spec(args.base, args.overrides)
    if args.data_root and spec.train_data:
        inside = os.path.join(args.data_root, "ffhq.pickle")
        # cli/align.py writes <out_folder>.pickle (start_align.py:66-67);
        # an ffhq.pickle inside the folder (older layout) still wins
        beside = args.data_root.rstrip("/\\") + ".pickle"
        spec.train_data.pickle_path = (
            inside if os.path.exists(inside) else beside)
    if args.max_steps:
        spec.trainer.max_steps = args.max_steps
    if spec.train_data:
        spec.train_data.image_size = args.image_size
    spec.trainer.cache_latents = args.cache_latents
    spec.trainer.frozen_bf16 = args.frozen_bf16
    spec.trainer.fsdp = args.fsdp
    spec.trainer.name = args.name
    spec.trainer.logdir = args.logdir
    spec.trainer.seed = args.seed

    mesh = None
    if args.mesh:
        n_model = args.mesh[1] if len(args.mesh) > 1 else 1
        mesh = pmesh.make_mesh(n_data=args.mesh[0], n_model=n_model)
        spec.trainer.n_data_shards = args.mesh[0]

    resume_ckpt = None
    if args.resume:
        import glob as _glob
        cands = sorted(
            _glob.glob(os.path.join(args.resume, "checkpoints",
                                    "embeddings_gs-*.pt")),
            key=lambda p: int(p.rsplit("-", 1)[1].split(".")[0]))
        if cands:
            resume_ckpt = cands[-1]
            print(f"[train] resuming embeddings from {resume_ckpt}")

    asm = assemble(spec, sd_ckpt=args.actual_resume, fr_ckpt=args.fr_ckpt,
                   vocab_path=args.vocab, image_size=args.image_size,
                   seed=args.seed, embedding_ckpt=resume_ckpt)

    run_dir = args.resume or make_run_dir(spec.trainer)
    # config dump contract (main_id_embed.py:322-330)
    for base in args.base:
        shutil.copy(base, os.path.join(run_dir, "configs",
                                       os.path.basename(base)))
    with open(os.path.join(run_dir, "configs", "resolved.yaml"), "w") as f:
        yaml.safe_dump({"name": args.name, "seed": args.seed,
                        "max_steps": spec.trainer.max_steps,
                        "lr": spec.trainer.base_lr}, f)

    ds = FaceIdDataset(spec.train_data)
    loader = PrefetchLoader(ds, asm.tokenizer, spec.trainer.batch_size,
                            face_size=args.face_size, seed=args.seed)
    val_loader = None
    if spec.val_data and spec.val_data.pickle_path:
        spec.val_data.image_size = args.image_size
        if args.data_root:
            spec.val_data.pickle_path = spec.train_data.pickle_path
        try:
            val_loader = PrefetchLoader(
                FaceIdDataset(spec.val_data), asm.tokenizer,
                spec.trainer.batch_size, face_size=args.face_size,
                shuffle=False, seed=args.seed + 1)
        except (ValueError, FileNotFoundError) as e:
            print(f"[train] no validation data ({e})")

    meta_trainable, meta_frozen = tstep.split_meta_params(asm.meta_params)
    spec.trainer.unfreeze_model = spec.unfreeze_model
    spec.trainer.model_lr = spec.model_lr
    if spec.unfreeze_model:
        print(f"[train] UNet unfrozen (model_lr={spec.model_lr})")
    gnet_params = None
    if spec.trainer.loss_type == "contra":
        # the contra g-net trains alongside the MLP (embedding_manager.py:432-436)
        gnet_params = tstep.init_gnet_params(asm.pipeline,
                                             jax.random.key(args.seed + 7))
    trainable = tstep.build_trainable(
        meta_trainable,
        unet_params=asm.params["unet"] if spec.unfreeze_model else None,
        gnet_params=gnet_params)
    frozen = {"unet": asm.params["unet"], "vae": asm.params["vae"],
              "clip": asm.params["clip"], "meta_frozen": meta_frozen}

    trainer = Trainer(asm.pipeline, asm.meta_net, frozen, asm.basis, loader,
                      spec.trainer, mesh=mesh, run_dir=run_dir,
                      val_loader=val_loader)
    state = tstep.init_train_state(jax.random.key(args.seed), trainable,
                                   trainer.optimizer, asm.manager_state)
    print(f"[train] run dir: {run_dir}; lr="
          f"{trainer.optimizer and spec.trainer.base_lr}")
    final_state = trainer.fit(state)
    print(f"[train] done at step {int(final_state.step)}; checkpoints in "
          f"{os.path.join(run_dir, 'checkpoints')}")
    return run_dir


if __name__ == "__main__":
    main()
