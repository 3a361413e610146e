"""Legacy latent-diffusion training CLI — the reference ``main.py`` fitting
any `configs/latent-diffusion/*.yaml`: frozen first stage, eps-prediction
loss on latents, optional trainable cond stage
(``cond_stage_trainable: true``, e.g. cin256-v2), LambdaLinearScheduler,
EMA weights, scale_by_std latent calibration.

TPU-first: one jitted train step over {unet (+cond_stage)} with the frozen
first-stage encode jitted separately (or skipped entirely for cached
latents); EMA is a pure tree-map update.

Smoke mode: ``--fake-data N`` trains on random images when the config's
datasets are not on disk (this image ships none).
"""
from __future__ import annotations

import argparse
import json
import os
import time
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
import yaml

from celebbasis_tpu.core.losses import ema_init, ema_update
from celebbasis_tpu.diffusion.ddpm import ScheduleArrays, q_sample
from celebbasis_tpu.diffusion.schedules import make_schedule
from celebbasis_tpu.legacy import LegacyLDM, build_legacy_ldm
from celebbasis_tpu.utils.config import get
from celebbasis_tpu.utils.registry import instantiate_from_config


def make_legacy_trainer(ldm: LegacyLDM, cfg: Dict,
                        batch_size: int) -> Tuple[Callable, optax.GradientTransformation, bool]:
    """-> (jitted step(params, opt_state, z, cond_input, rng) ->
    (params, opt_state, loss), optimizer, cond_trainable).

    Matches LatentDiffusion.configure_optimizers (ddpm.py:1442-1466):
    AdamW over unet (+cond stage when cond_stage_trainable), lr =
    bs × base_lr (main.py scale_lr on one device), optional lambda
    scheduler from scheduler_config."""
    mp = get(cfg, "model.params", {}) or {}
    base_lr = get(cfg, "model.base_learning_rate", 1e-4)
    lr = base_lr * batch_size
    sched_cfg = mp.get("scheduler_config")
    if sched_cfg:
        # only the lambda-linear family appears in shipped configs; use its
        # traceable jnp twin so the schedule lives inside the jitted step
        assert sched_cfg["target"].endswith("LambdaLinearScheduler"), \
            sched_cfg["target"]
        from celebbasis_tpu.train.lr_schedule import lambda_linear_traceable
        p = dict(sched_cfg.get("params", {}) or {})
        p.pop("verbosity_interval", None)
        # weight_decay 1e-2 = torch AdamW's default: the intended
        # `torch.optim.AdamW(params, lr=lr)` semantics.  (In this reference
        # copy the no-manager `opt =` line sits mis-indented under
        # `if self.learn_logvar:` (ddpm.py:1457-1464) so the branch crashes
        # as shipped — the original ldm repo's working line is the target.)
        tx = optax.adamw(lambda_linear_traceable(lr, **p),
                         weight_decay=1e-2)
    else:
        tx = optax.adamw(lr, weight_decay=1e-2)
    cond_trainable = bool(mp.get("cond_stage_trainable", False)) \
        and ldm.cond_kind != "uncond"

    arrays = ScheduleArrays.from_schedule(
        make_schedule("linear", ldm.timesteps,
                      linear_start=ldm.linear_start,
                      linear_end=ldm.linear_end))

    def ctx_of(trainable, frozen, cond_input):
        if cond_input is None:
            return None
        if ldm.cond_kind == "identity":     # bsr_sr: LR image as-is
            return cond_input
        if ldm.cond_kind == "first_stage":  # inpainting: frozen encode
            return ldm.encode_first_stage(frozen, cond_input) \
                / ldm.scale_factor
        cs = trainable.get("cond_stage", frozen.get("cond_stage"))
        # class labels / token ids / rescaler segmentation images
        return ldm.cond_stage.apply(cs, cond_input)

    def loss_fn(trainable, frozen, z, cond_input, rng):
        kt, kn = jax.random.split(rng)
        B = z.shape[0]
        t = jax.random.randint(kt, (B,), 0, ldm.timesteps)
        noise = jax.random.normal(kn, z.shape)
        x_t = q_sample(arrays, z, t, noise)
        ctx = ctx_of(trainable, frozen, cond_input)
        if ldm.cond_mode == "concat" and ctx is not None:
            eps = ldm.unet.apply(
                trainable["unet"],
                jnp.concatenate([x_t, ctx.astype(x_t.dtype)], axis=-1),
                t, None)
        else:
            eps = ldm.unet.apply(trainable["unet"], x_t, t, ctx)
        if ldm.loss_type == "l1":
            return jnp.mean(jnp.abs(eps - noise))
        return jnp.mean((eps - noise) ** 2)

    @jax.jit
    def step(params, opt_state, z, cond_input, rng):
        trainable = {"unet": params["unet"]}
        if cond_trainable:
            trainable["cond_stage"] = params["cond_stage"]
        loss, grads = jax.value_and_grad(loss_fn)(trainable, params, z,
                                                  cond_input, rng)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        params = dict(params, **trainable)
        return params, opt_state, loss

    def init_opt(params):
        trainable = {"unet": params["unet"]}
        if cond_trainable:
            trainable["cond_stage"] = params["cond_stage"]
        return tx.init(trainable)

    return step, init_opt, cond_trainable


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--max-steps", type=int, default=100)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--fake-data", type=int, default=0)
    ap.add_argument("--no-ema", action="store_true")
    ap.add_argument("--logdir", default="./logs_legacy")
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--ckpt-every", type=int, default=0,
                    help="orbax-checkpoint params/opt/ema every N steps")
    ap.add_argument("-r", "--resume", action="store_true",
                    help="resume from the latest orbax checkpoint in logdir")
    ap.add_argument("--export-torch", default=None,
                    help="after training, write a reference-loadable torch "
                         ".ckpt (model.diffusion_model + first_stage_model "
                         "+ cond_stage_model state_dict)")
    ap.add_argument("--image-every", type=int, default=0,
                    help="save a DDIM sample grid every N steps (the "
                         "reference ImageLogger, main.py:344-447)")
    ap.add_argument("--image-steps", type=int, default=20)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args(argv)

    with open(args.config) as f:
        cfg = yaml.safe_load(f)
    ldm = build_legacy_ldm(cfg)
    bs = args.batch_size or get(cfg, "data.params.batch_size", 4)
    use_ema = get(cfg, "model.params.use_ema", True) and not args.no_ema

    rng = jax.random.key(args.seed)
    rng, k_init = jax.random.split(rng)
    params = ldm.init_params(k_init)
    step_fn, init_opt, cond_trainable = make_legacy_trainer(ldm, cfg, bs)
    opt_state = init_opt(params)
    ema = ema_init(params["unet"]) if use_ema else None
    print(f"[train_legacy] {ldm.first_stage_kind}/{ldm.cond_kind} "
          f"latent {ldm.image_size}^2x{ldm.channels}, batch {bs}, "
          f"cond_trainable={cond_trainable}, ema={use_ema}")

    img_res = ldm.first_stage.cfg.resolution
    if args.fake_data:
        data = np.random.default_rng(0).uniform(
            -1, 1, (args.fake_data, img_res, img_res, 3)).astype(np.float32)
        n_classes = (ldm.cond_stage.n_classes
                     if ldm.cond_kind == "class" else 0)
        labels = np.random.default_rng(1).integers(
            0, max(n_classes, 1), (args.fake_data,))
        caps = [f"a photo number {i}" for i in range(args.fake_data)]
        conds = None
        if ldm.cond_mode == "concat":
            if ldm.cond_kind == "first_stage":
                conds = data                      # masked-image stand-in
            elif ldm.cond_kind == "rescaler":
                n_up = 2 ** ldm.cond_stage.n_stages
                shape = (args.fake_data, ldm.image_size * n_up,
                         ldm.image_size * n_up,
                         ldm.cond_stage_params.get("in_channels", 3))
                conds = np.random.default_rng(2).uniform(
                    -1, 1, shape).astype(np.float32)
            else:                                  # identity (LR image)
                c_ch = ldm.unet.cfg.in_channels - ldm.channels
                conds = np.random.default_rng(2).uniform(
                    -1, 1, (args.fake_data, ldm.image_size, ldm.image_size,
                            c_ch)).astype(np.float32)

        def batch(i):
            idx = [(i * bs + j) % args.fake_data for j in range(bs)]
            return (data[idx], labels[idx], [caps[k] for k in idx],
                    conds[idx] if conds is not None else None)
    else:
        ds = instantiate_from_config(get(cfg, "data.params.train"))

        def batch(i):
            idx = [(i * bs + j) % len(ds) for j in range(bs)]
            ex = [ds[k] for k in idx]
            imgs = np.stack([e["image"] for e in ex])
            lab = np.asarray([e.get("class_label", 0) for e in ex])
            caps_ = [e.get("caption", "") for e in ex]
            cond = np.stack([e[ldm.cond_stage_key] for e in ex]) \
                if ldm.cond_mode == "concat" else None
            return imgs, lab, caps_, cond

    # jitted frozen encode (mode latents, like get_input's fallback)
    encode = jax.jit(lambda p, x: ldm.encode_first_stage(p, x))

    # scale_by_std: calibrate on the first batch (ddpm.py:576-587)
    if ldm.scale_by_std:
        imgs0, _, _, _ = batch(0)
        ldm.calibrate_scale(params, jnp.asarray(imgs0))
        encode = jax.jit(lambda p, x: ldm.encode_first_stage(p, x))
        print(f"[train_legacy] scale_by_std -> {ldm.scale_factor:.4f}")

    os.makedirs(args.logdir, exist_ok=True)
    sample_fn = None

    def log_images(step, cond_sample):
        nonlocal sample_fn
        from PIL import Image
        from celebbasis_tpu.pipeline import finish_images
        if sample_fn is None:
            sample_fn = ldm.make_sample_fn(num_steps=args.image_steps)
        n = min(4, bs)
        imgs = sample_fn(params, jax.random.key(1000 + step),
                         cond_sample[:n] if cond_sample is not None else None,
                         n)
        grid = jnp.concatenate(list(imgs), axis=1)
        pixels = np.asarray(finish_images(grid[None], "uint8"))[0]
        path = os.path.join(args.logdir, "images", f"step_{step:06}.png")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        Image.fromarray(pixels).save(path)

    ckpt = None
    start = 0
    if args.ckpt_every or args.resume:
        from celebbasis_tpu.train.callbacks import OrbaxResume
        ckpt = OrbaxResume(args.logdir, every=max(args.ckpt_every, 1))
        latest = ckpt.latest_step() if args.resume else None
        if latest is not None:
            snap = {"params": params, "opt": opt_state,
                    "ema": ema.params if use_ema else None}
            abstract = jax.tree.map(
                lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype)
                if hasattr(a, "shape") else a, snap)
            restored = ckpt.restore(latest, abstract)
            params, opt_state = restored["params"], restored["opt"]
            if use_ema and restored["ema"] is not None:
                ema = ema_init(restored["ema"])
            start = latest
            print(f"[train_legacy] resumed from step {latest}")

    metrics = open(os.path.join(args.logdir, "metrics.jsonl"), "a")
    t0 = time.time()
    for i in range(start, args.max_steps):
        imgs, lab, caps_, cond_img = batch(i)
        z = encode(params, jnp.asarray(imgs))
        if ldm.cond_mode == "concat":
            cond_input = jnp.asarray(cond_img)
        elif ldm.cond_kind == "uncond":
            cond_input = None
        elif ldm.cond_kind == "class":
            cond_input = jnp.asarray(lab, jnp.int32)
        else:
            cond_input = jnp.asarray(ldm.tokenizer(caps_))
        rng, k = jax.random.split(rng)
        params, opt_state, loss = step_fn(params, opt_state, z, cond_input,
                                          k)
        if use_ema:
            ema = ema_update(ema, params["unet"])
        if i % args.log_every == 0 or i == args.max_steps - 1:
            row = {"step": i, "loss": float(loss),
                   "time": round(time.time() - t0, 2)}
            print(f"[train_legacy] {json.dumps(row)}")
            metrics.write(json.dumps(row) + "\n")
            metrics.flush()
        if ckpt is not None and args.ckpt_every \
                and (i + 1) % args.ckpt_every == 0:
            ckpt.maybe_save(i + 1, {"params": params, "opt": opt_state,
                                    "ema": ema.params if use_ema else None})
        if args.image_every and (i + 1) % args.image_every == 0:
            if ldm.cond_mode == "concat":
                cs = cond_img
            elif ldm.cond_kind == "uncond":
                cs = None
            else:
                cs = lab if ldm.cond_kind == "class" else caps_
            log_images(i + 1, cs)
    if ckpt is not None:
        ckpt.close()
    metrics.close()
    if args.export_torch:
        from celebbasis_tpu.utils import bridge
        from celebbasis_tpu.utils.pt_io import save_pt
        unet_p = jax.device_get(ema.params if use_ema else params["unet"])
        sd = bridge.export_unet(unet_p, ldm.unet.cfg)
        dd = get(cfg, "model.params.first_stage_config.params.ddconfig",
                 {}) or {}
        kw = dict(ch_mult=tuple(dd.get("ch_mult", (1, 2, 4, 4))),
                  num_res_blocks=dd.get("num_res_blocks", 2),
                  attn_resolutions=tuple(dd.get("attn_resolutions", ()) or ()),
                  resolution=dd.get("resolution", 256))
        fs_export = bridge.export_vq if ldm.first_stage_kind == "vq" \
            else bridge.export_vae
        sd.update({f"first_stage_model.{k}": v for k, v in
                   fs_export(jax.device_get(params["first_stage"]),
                             **kw).items()})
        if ldm.cond_kind == "bert":
            sd.update(bridge.export_bert_text(
                jax.device_get(params["cond_stage"]),
                depth=ldm.cond_stage.cfg.depth))
        elif ldm.cond_kind == "class":
            sd["cond_stage_model.embedding.weight"] = np.asarray(
                jax.device_get(
                    params["cond_stage"])["params"]["embedding"])
        elif ldm.cond_kind == "rescaler":
            cm = jax.device_get(
                params["cond_stage"])["params"].get("channel_mapper")
            if cm is not None:   # 1x1 conv HWIO -> torch OIHW
                sd["cond_stage_model.channel_mapper.weight"] = np.transpose(
                    np.asarray(cm["kernel"]), (3, 2, 0, 1))
                if "bias" in cm:
                    sd["cond_stage_model.channel_mapper.bias"] = \
                        np.asarray(cm["bias"])
        save_pt({"state_dict": sd}, args.export_torch)
        print(f"[train_legacy] exported torch state_dict ({len(sd)} keys"
              f"{', EMA unet' if use_ema else ''}) -> {args.export_torch}")
    print(f"[train_legacy] done in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
