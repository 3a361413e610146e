"""First-stage autoencoder training CLI — drives the reference's
``configs/autoencoder/*.yaml`` (and the first_stage_config of any legacy
LDM yaml) through the TPU GAN trainer.

Reference equivalent: ``main.py`` fitting ``AutoencoderKL`` / ``VQModel``
with ``LPIPSWithDiscriminator`` losses
(`/root/reference/ldm/models/autoencoder.py:142-196,284-380`).

Data: the config's dataset targets (ImageNetSR etc.) resolve through the
registry; ``--fake-data N`` substitutes N random images for smoke runs in
environments without the datasets on disk (this image ships none).
"""
from __future__ import annotations

import argparse
import json
import os
import time

import jax
import numpy as np
import yaml

from celebbasis_tpu.models.vae import AutoencoderKL, VAEConfig
from celebbasis_tpu.models.vq import VQModel
from celebbasis_tpu.train.ae_trainer import AETrainer
from celebbasis_tpu.utils.config import get
from celebbasis_tpu.utils.registry import instantiate_from_config


def build_first_stage_trainer(cfg: dict, dtype=None):
    """autoencoder yaml -> (AETrainer, image_size)."""
    import jax.numpy as jnp
    dtype = dtype or jnp.bfloat16
    mp = get(cfg, "model.params", {}) or {}
    target = get(cfg, "model.target", "")
    dd = mp.get("ddconfig", {})
    vcfg = VAEConfig(
        ch=dd.get("ch", 128), ch_mult=tuple(dd.get("ch_mult", (1, 2, 4, 4))),
        num_res_blocks=dd.get("num_res_blocks", 2),
        z_channels=dd.get("z_channels", 4),
        embed_dim=mp.get("embed_dim", 4), in_ch=dd.get("in_channels", 3),
        out_ch=dd.get("out_ch", 3),
        attn_resolutions=tuple(dd.get("attn_resolutions", ()) or ()),
        double_z=dd.get("double_z", True),
        resolution=dd.get("resolution", 256),
        attn_type=dd.get("attn_type", "vanilla"))
    if target.endswith("VQModel") or target.endswith("VQModelInterface"):
        model = VQModel(vcfg, n_embed=mp["n_embed"], dtype=dtype)
    elif target.endswith("AutoencoderKL"):
        model = AutoencoderKL(vcfg, dtype=dtype)
    else:
        raise ValueError(f"unsupported autoencoder target {target!r}")
    loss = instantiate_from_config(mp["lossconfig"])
    lr = get(cfg, "model.base_learning_rate", 4.5e-6)
    bs = get(cfg, "data.params.batch_size", 4)
    # reference main.py: lr = accumulate * ngpu * bs * base_lr (scale_lr)
    trainer = AETrainer(model, loss, learning_rate=lr * bs,
                        lr_g_factor=mp.get("lr_g_factor", 1.0))
    size = get(cfg, "data.params.train.params.size", vcfg.resolution)
    return trainer, size


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--max-steps", type=int, default=100)
    ap.add_argument("--image-size", type=int, default=None,
                    help="override training resolution (smoke runs)")
    ap.add_argument("--fake-data", type=int, default=0,
                    help="train on N random images (no datasets on disk)")
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--logdir", default="./logs_ae")
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--ckpt-every", type=int, default=0,
                    help="orbax-checkpoint the full GAN state every N steps")
    ap.add_argument("-r", "--resume", action="store_true",
                    help="resume from the latest orbax checkpoint in logdir")
    ap.add_argument("--export-torch", default=None,
                    help="after training, write a reference-loadable torch "
                         ".ckpt of the first stage (state_dict layout)")
    ap.add_argument("--image-every", type=int, default=0,
                    help="save [inputs | reconstructions | samples] grids "
                         "every N steps (reference ImageLogger/log_images)")
    ap.add_argument("--seed", type=int, default=23)
    args = ap.parse_args(argv)

    with open(args.config) as f:
        cfg = yaml.safe_load(f)
    trainer, size = build_first_stage_trainer(cfg)
    size = args.image_size or size
    bs = args.batch_size or get(cfg, "data.params.batch_size", 4)

    rng = jax.random.key(args.seed)
    rng, k_init = jax.random.split(rng)
    state = trainer.init(k_init, image_size=size)
    print(f"[train_ae] {'VQ' if trainer.is_vq else 'KL'} autoencoder, "
          f"{size}x{size}, batch {bs}")

    if args.fake_data:
        data = np.random.default_rng(0).uniform(
            -1, 1, (args.fake_data, size, size, 3)).astype(np.float32)
        batches = lambda i: data[(i * bs) % len(data):][:bs]
    else:
        ds = instantiate_from_config(get(cfg, "data.params.train"))

        def batches(i):
            idx = [(i * bs + j) % len(ds) for j in range(bs)]
            return np.stack([ds[k]["image"] for k in idx])

    os.makedirs(args.logdir, exist_ok=True)
    ckpt = None
    start = 0
    if args.ckpt_every or args.resume:
        from celebbasis_tpu.train.callbacks import OrbaxResume
        ckpt = OrbaxResume(args.logdir, every=max(args.ckpt_every, 1))
        latest = ckpt.latest_step() if args.resume else None
        if latest is not None:
            snap = {"params": state.params, "opt_g": state.opt_g,
                    "opt_d": state.opt_d}
            abstract = jax.tree.map(
                lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype)
                if hasattr(a, "shape") else a, snap)
            restored = ckpt.restore(latest, abstract)
            from celebbasis_tpu.train.ae_trainer import AETrainState
            state = AETrainState(restored["params"], restored["opt_g"],
                                 restored["opt_d"], step=latest)
            start = latest
            print(f"[train_ae] resumed from step {latest}")

    def log_images(step, x):
        """AutoencoderKL/VQModel.log_images (autoencoder.py:233-258,
        :246-263): inputs, reconstructions, decoded-prior samples."""
        import jax.numpy as jnp
        from PIL import Image
        from celebbasis_tpu.models.vae import sample_posterior
        from celebbasis_tpu.pipeline import finish_images
        ae = state.params["ae"]
        xj = jnp.asarray(x[:4])
        if trainer.is_vq:
            rec, _, _ = trainer.model.apply(ae, xj)
            z_shape = trainer.model.apply(ae, xj,
                                          method="encode_to_prequant").shape
        else:
            mean, logvar = trainer.model.apply(ae, xj, method="encode")
            rec = trainer.model.apply(
                ae, sample_posterior(jax.random.key(step), mean, logvar),
                method="decode")
            z_shape = mean.shape
        samples = trainer.model.apply(
            ae, jax.random.normal(jax.random.key(step + 1), z_shape),
            method="decode")
        grid = jnp.concatenate(
            [jnp.concatenate(list(r), axis=1)
             for r in (xj, rec, samples)], axis=0)
        pixels = np.asarray(finish_images(grid[None], "uint8"))[0]
        path = os.path.join(args.logdir, "images", f"step_{step:06}.png")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        Image.fromarray(pixels).save(path)

    metrics = open(os.path.join(args.logdir, "metrics.jsonl"), "a")
    t0 = time.time()
    for i in range(start, args.max_steps):
        rng, k = jax.random.split(rng)
        x = batches(i)
        if x.shape[0] < bs:   # tail wrap
            x = np.concatenate([x, x[: bs - x.shape[0]]])
        state, log = trainer.train_batch(state, x, k)
        if i % args.log_every == 0 or i == args.max_steps - 1:
            row = {"step": i, "time": round(time.time() - t0, 2),
                   **{k2: float(v) for k2, v in log.items()}}
            print(f"[train_ae] {json.dumps(row)}")
            metrics.write(json.dumps(row) + "\n")
            metrics.flush()
        if ckpt is not None and args.ckpt_every \
                and (i + 1) % args.ckpt_every == 0:
            ckpt.maybe_save(i + 1, {"params": state.params,
                                    "opt_g": state.opt_g,
                                    "opt_d": state.opt_d})
        if args.image_every and (i + 1) % args.image_every == 0:
            log_images(i + 1, x)
    if ckpt is not None:
        ckpt.close()
    metrics.close()
    if args.export_torch:
        from celebbasis_tpu.utils import bridge
        from celebbasis_tpu.utils.pt_io import save_pt
        dd = get(cfg, "model.params.ddconfig", {}) or {}
        kw = dict(ch_mult=tuple(dd.get("ch_mult", (1, 2, 4, 4))),
                  num_res_blocks=dd.get("num_res_blocks", 2),
                  attn_resolutions=tuple(dd.get("attn_resolutions", ()) or ()),
                  resolution=dd.get("resolution", 256))
        params_np = jax.device_get(state.params["ae"])
        sd = (bridge.export_vq if trainer.is_vq
              else bridge.export_vae)(params_np, **kw)
        save_pt({"state_dict": sd}, args.export_torch)
        print(f"[train_ae] exported torch state_dict "
              f"({len(sd)} keys) -> {args.export_torch}")
    print(f"[train_ae] done: {args.max_steps} steps in "
          f"{time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
