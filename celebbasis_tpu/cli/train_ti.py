"""Textual-Inversion baseline trainer — the reference's ``main.py`` path.

Optimizes the placeholder's learned vectors directly through the frozen
diffusion stack (no face encoder / basis): the `--init_word` recipe of
``textual_train.sh`` / ``v1-finetune.yaml``.
"""
from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from celebbasis_tpu.core import textual_inversion as ti
from celebbasis_tpu.data.personalized import (PersonalizedBase,
                                              PersonalizedConfig)
from celebbasis_tpu.diffusion import ddpm
from celebbasis_tpu.loader import assemble
from celebbasis_tpu.models.clip_text import CLIPTextEncoder
from celebbasis_tpu.models.vae import AutoencoderKL, sample_posterior
from celebbasis_tpu.train.trainer import TrainerConfig, make_run_dir
from celebbasis_tpu.utils.config import load_run_spec


def make_ti_train_step(pipe, cfg: ti.TIConfig, ph_ids, optimizer,
                       reg_weight: float = 0.0, init_vectors=None):
    sched = ddpm.ScheduleArrays.from_schedule(pipe.schedule)
    scale = pipe.cfg.scale_factor
    T = pipe.cfg.timesteps

    def loss_fn(params, frozen, batch, rng):
        # batch may carry override_znoise / override_t / override_noise —
        # deterministic draws replacing the internal RNG (same contract as
        # train/step.py; the composed TI trajectory oracle feeds the
        # reference's captured torch draws through these)
        rz, rt, re = jax.random.split(rng, 3)
        mean, logvar = pipe.vae.apply(frozen["vae"], batch["image"],
                                      method=AutoencoderKL.encode)
        zn = batch.get("override_znoise")
        std = jnp.exp(0.5 * logvar)
        z0 = (sample_posterior(rz, mean, logvar) if zn is None
              else mean + std * zn) * scale
        z0 = jax.lax.stop_gradient(z0)
        B = z0.shape[0]
        t = batch.get("override_t")
        if t is None:
            t = jax.random.randint(rt, (B,), 0, T)
        noise = batch.get("override_noise")
        if noise is None:
            noise = jax.random.normal(re, z0.shape)
        z_t = ddpm.q_sample(sched, z0, t, noise)
        embeds = pipe.clip.apply(frozen["clip"], batch["tokens"],
                                 method=CLIPTextEncoder.token_embed)
        embeds = ti.ti_inject(cfg, params, ph_ids, batch["tokens"], embeds)
        ctx = pipe.clip.apply(frozen["clip"], embeds,
                              method=CLIPTextEncoder.encode)
        eps = pipe.unet.apply(frozen["unet"], z_t, t, ctx)
        loss, logs = ddpm.eps_mse_loss(eps, noise)
        if reg_weight > 0 and init_vectors is not None:
            loss = loss + reg_weight * ti.embedding_reg_loss(params,
                                                             init_vectors)
        return loss, logs

    def step(params, opt_state, frozen, batch, rng):
        grads, logs = jax.grad(loss_fn, has_aux=True)(params, frozen, batch,
                                                      rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, logs

    return jax.jit(step, donate_argnums=(0, 1))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--base", type=str, nargs="+",
                   default=["configs/aigc_id.yaml"])
    p.add_argument("--data_root", type=str, required=True)
    p.add_argument("--placeholder", type=str, default="*")
    p.add_argument("--init_word", type=str, default="face")
    p.add_argument("--num_vectors", type=int, default=1)
    p.add_argument("--actual_resume", type=str, default=None)
    p.add_argument("--name", type=str, default="ti")
    p.add_argument("--logdir", type=str, default="logs")
    p.add_argument("--max_steps", type=int, default=5000)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--lr", type=float, default=5.0e-3)
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--seed", type=int, default=23)
    p.add_argument("--vocab", type=str, default=None)
    p.add_argument("--coarse_class", type=str, default=None)
    args = p.parse_args(argv)

    spec = load_run_spec(args.base)
    asm = assemble(spec, sd_ckpt=args.actual_resume, vocab_path=args.vocab,
                   image_size=args.image_size, seed=args.seed)
    pipe = asm.pipeline

    cfg = ti.TIConfig(placeholder_strings=(args.placeholder,),
                      num_vectors_per_token=args.num_vectors,
                      token_dim=spec.clip.width)
    table = pipe.token_table(asm.params)
    params = ti.init_ti_params(cfg, asm.tokenizer, table, [args.init_word])
    init_vectors = params
    ph_ids = jnp.asarray(ti.placeholder_token_ids(cfg, asm.tokenizer),
                         jnp.int32)

    lr = args.lr * args.batch_size  # reference scale_lr recipe
    # torch AdamW's default weight decay is 1e-2 (ddpm.py:1455 passes none);
    # bare optax.adamw defaults to 1e-4 and silently diverges — same parity
    # trap the W2 oracle caught in train/step.py::make_optimizer
    from celebbasis_tpu.train.step import make_optimizer
    optimizer = make_optimizer(lr)
    opt_state = optimizer.init(params)
    step_fn = make_ti_train_step(pipe, cfg, ph_ids, optimizer,
                                 reg_weight=0.0, init_vectors=init_vectors)

    ds = PersonalizedBase(PersonalizedConfig(
        data_root=args.data_root, placeholder=args.placeholder,
        image_size=args.image_size, coarse_class_text=args.coarse_class,
        seed=args.seed))

    tcfg = TrainerConfig(name=args.name, logdir=args.logdir,
                         max_steps=args.max_steps)
    run_dir = make_run_dir(tcfg)
    frozen = asm.params
    rng = jax.random.key(args.seed)
    log_path = os.path.join(run_dir, "metrics.jsonl")
    with open(log_path, "a") as logf:
        for step in range(1, args.max_steps + 1):
            idx = np.random.default_rng(step).integers(0, len(ds),
                                                       args.batch_size)
            items = [ds[int(i)] for i in idx]
            batch = {
                "image": jnp.asarray(np.stack([it["image"] for it in items])),
                "tokens": jnp.asarray(asm.tokenizer(
                    [it["caption"] for it in items])),
            }
            rng, sub = jax.random.split(rng)
            params, opt_state, logs = step_fn(params, opt_state, frozen,
                                              batch, sub)
            if step % 50 == 0 or step == 1:
                logf.write(json.dumps({"step": step,
                                       "loss": float(logs["loss"])}) + "\n")
                logf.flush()
            if step % 500 == 0 or step == args.max_steps:
                ti.save_ti_checkpoint(
                    cfg, params, [int(i) for i in np.asarray(ph_ids)],
                    os.path.join(run_dir, "checkpoints",
                                 f"embeddings_gs-{step}.pt"))
    print(f"[train_ti] done; run dir {run_dir}")
    return run_dir


if __name__ == "__main__":
    main()
