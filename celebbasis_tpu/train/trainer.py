"""Personalization trainer — the reference's Lightning driver, TPU-native.

Replaces `/root/reference/main_id_embed.py` (854 LoC of Lightning glue):

* run-dir layout contract kept: ``logs/<name><timestamp>_<suffix>/
  {checkpoints,configs,images}`` — downstream scripts derive config paths
  from the folder name (02_start_test.sh:24-27);
* LR recipe: ``lr = accumulate x n_shards x batch x base_lr`` when
  ``scale_lr`` (main_id_embed.py:769-782; 2 x 5e-3 = 1e-2 default);
* ``embeddings_gs-{step}.pt`` checkpoints every ``ckpt_every`` steps in the
  reference schema (ddpm.py:1519-1528 clears the Lightning ckpt and keeps
  only these);
* SIGUSR1/SIGINT -> immediate checkpoint ("melk", main_id_embed.py:789-807);
* per-step jsonl metrics + wall-time/step trace in place of
  TestTube/CUDACallback (main_id_embed.py:450-470);
* data-parallel over the mesh 'data' axis: batch sharded, frozen params
  replicated, MLP grads all-reduced by GSPMD.
"""
from __future__ import annotations

import datetime
import json
import os
import signal
import time
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from celebbasis_tpu.core import manager as mgr
from celebbasis_tpu.core.meta_net import MetaIdNet, MetaNetConfig
from celebbasis_tpu.data.face_id import (FaceIdDataset, FaceIdDatasetConfig,
                                         PrefetchLoader)
from celebbasis_tpu.parallel import mesh as pmesh
from celebbasis_tpu.train import step as tstep


@dataclass
class TrainerConfig:
    name: str = "aigc_id"
    logdir: str = "logs"
    suffix: str = ""
    max_steps: int = 800
    ckpt_every: int = 200
    batch_size: int = 2
    base_lr: float = 5.0e-3
    scale_lr: bool = True
    accumulate: int = 1
    loss_type: str = "none"
    unfreeze_model: bool = False
    model_lr: float = 0.0
    cache_latents: int = 0   # >0: precompute N batches of frozen features
    frozen_bf16: bool = False  # store frozen UNet/VAE/CLIP/FR weights bf16
    fsdp: bool = False       # shard large frozen leaves over the 'data' axis
    log_every: int = 10
    seed: int = 23
    n_data_shards: int = 1
    tensorboard: bool = False  # also emit a TB event stream (reference
    #                            TestTube logger, main_id_embed.py:629-653)


def make_run_dir(cfg: TrainerConfig, now: Optional[str] = None) -> str:
    now = now or datetime.datetime.now().strftime("%Y-%m-%dT%H-%M-%S")
    suffix = f"_{cfg.suffix}" if cfg.suffix else ""
    run = os.path.join(cfg.logdir, f"{now}_{cfg.name}{suffix}")
    for sub in ("checkpoints", "configs", "images"):
        os.makedirs(os.path.join(run, sub), exist_ok=True)
    return run


def effective_lr(cfg: TrainerConfig) -> float:
    if cfg.scale_lr:
        return (cfg.accumulate * cfg.n_data_shards * cfg.batch_size
                * cfg.base_lr)
    return cfg.base_lr


class Trainer:
    def __init__(self, pipeline, meta_net: MetaIdNet, frozen_params: Dict,
                 basis, loader: PrefetchLoader, cfg: TrainerConfig,
                 mesh=None, run_dir: Optional[str] = None, callbacks=(),
                 val_loader: Optional[PrefetchLoader] = None,
                 val_every: int = 200, val_batches: int = 4):
        self.callbacks = list(callbacks)
        self.val_loader = val_loader
        self.val_every = val_every
        self.val_batches = val_batches
        self.pipeline = pipeline
        self.meta_net = meta_net
        self.cfg = cfg
        self.loader = loader
        self.run_dir = run_dir or make_run_dir(cfg)
        self.mesh = mesh
        self.metrics_path = os.path.join(self.run_dir, "metrics.jsonl")
        self.tb = None
        if cfg.tensorboard:
            from celebbasis_tpu.utils.tb import TBWriter
            self.tb = TBWriter(os.path.join(self.run_dir, "tensorboard"))

        lr = effective_lr(cfg)
        self.optimizer = tstep.make_optimizer(
            lr, cfg.model_lr if cfg.unfreeze_model else None,
            accumulate=cfg.accumulate)
        if cfg.cache_latents > 0:
            assert not cfg.unfreeze_model, \
                "cache_latents requires the frozen-UNet path"
            step_fn = tstep.make_cached_train_step(pipeline, meta_net,
                                                   self.optimizer,
                                                   loss_type=cfg.loss_type)
        else:
            step_fn = tstep.make_train_step(pipeline, meta_net,
                                            self.optimizer,
                                            loss_type=cfg.loss_type,
                                            train_unet=cfg.unfreeze_model)
        self.jit_step = jax.jit(step_fn, donate_argnums=(0,))
        # loss-only step for validation: nothing donated, dictionaries not
        # advanced — no state copy per val batch.  With cache_latents and no
        # separate val loader, validation runs over the cached batches.
        self._eval_cached = cfg.cache_latents > 0 and val_loader is None
        self.jit_eval = jax.jit(tstep.make_eval_step(
            pipeline, meta_net, loss_type=cfg.loss_type,
            train_unet=cfg.unfreeze_model, cached=self._eval_cached))
        self._cache = None
        self._val_cache = None

        if cfg.frozen_bf16:
            # the frozen nets are read-only: bf16 storage halves their HBM
            # traffic in both the forward and the recompute-backward (same
            # rounding the bf16 compute path applies to activations anyway);
            # fp32 remains the parity default
            from celebbasis_tpu.utils.precision import cast_float_params
            frozen_params = cast_float_params(frozen_params)
        if mesh is not None:
            self.frozen = pmesh.shard_params(frozen_params, mesh,
                                             fsdp=cfg.fsdp)
            self.basis = jax.device_put(basis, pmesh.replicated(mesh))
        else:
            self.frozen = frozen_params
            self.basis = jnp.asarray(basis)
        self._interrupted = False

    # -- mid-run optimizer swap (ModeSwapCallback parity) --------------------
    def unfreeze_unet(self, state: tstep.TrainState,
                      model_lr: float) -> tstep.TrainState:
        """Swap to the two-group optimizer with the UNet unfrozen — the
        reference's ModeSwapCallback → configure_opt_model path
        (main_id_embed.py:473-487, ddpm.py:1449-1452).  Rebuilds the jitted
        step/eval functions and returns the new TrainState (fresh optimizer
        state, like the reference's new AdamW; step/rng/dictionaries kept).
        """
        cfg = self.cfg
        assert cfg.cache_latents == 0, \
            "mode swap needs the uncached path (the UNet must recompute)"
        meta_trainable = (state.trainable["meta"]
                          if isinstance(state.trainable, dict)
                          and "meta" in state.trainable else state.trainable)
        gnet = (state.trainable.get("gnet")
                if isinstance(state.trainable, dict) else None)
        # fresh buffers: the trainable UNet must not alias the (donated)
        # frozen copy
        unet = jax.tree.map(jnp.copy, self.frozen["unet"])
        trainable = tstep.build_trainable(meta_trainable, unet_params=unet,
                                          gnet_params=gnet)
        cfg.unfreeze_model, cfg.model_lr = True, model_lr
        self.optimizer = tstep.make_optimizer(effective_lr(cfg), model_lr,
                                              accumulate=cfg.accumulate)
        self.jit_step = jax.jit(
            tstep.make_train_step(self.pipeline, self.meta_net,
                                  self.optimizer, loss_type=cfg.loss_type,
                                  train_unet=True), donate_argnums=(0,))
        self.jit_eval = jax.jit(tstep.make_eval_step(
            self.pipeline, self.meta_net, loss_type=cfg.loss_type,
            train_unet=True))
        return tstep.TrainState(state.step, trainable,
                                self.optimizer.init(trainable),
                                state.manager_state, state.rng)

    # -- checkpointing ("melk") --------------------------------------------
    def save(self, state: tstep.TrainState, tag: Optional[str] = None):
        # state.step counts micro-batches; checkpoints are named by optimizer
        # steps like the reference's global_step (ddpm.py:1519-1528)
        step = int(state.step) // max(self.cfg.accumulate, 1)
        name = tag or f"embeddings_gs-{step}.pt"
        path = os.path.join(self.run_dir, "checkpoints", name)
        mgr.save_checkpoint(self.pipeline.manager_cfg, state.manager_state,
                            path)
        return path

    def _install_signal_handlers(self, get_state):
        def melk(signum, frame):
            print(f"[trainer] signal {signum}: checkpointing to last.pt")
            self.save(get_state(), tag="embeddings_last.pt")
            self._interrupted = True
        try:
            signal.signal(signal.SIGUSR1, melk)
        except (ValueError, OSError):  # non-main thread
            pass

    # -- frozen-feature cache (fast-personalization mode) --------------------
    def _build_cache(self) -> None:
        """Precompute the training cache plus ``val_batches`` extra held-out
        batches for cached-mode validation (so val never sees the exact
        cached batches the steps cycle over)."""
        cfg = self.cfg
        n_val = self.val_batches if self._eval_cached else 0
        print(f"[trainer] caching {cfg.cache_latents}+{n_val} augmented "
              f"batches of frozen features")
        cache = tstep.precompute_cache(
            self.pipeline, self.meta_net,
            self.frozen["meta_frozen"],  # fr_net lives in the frozen tree
            self.frozen["vae"], self.loader, cfg.cache_latents + n_val)
        if self.mesh is not None:
            cache = [pmesh.shard_batch(b, self.mesh) for b in cache]
        self._cache = cache[: cfg.cache_latents]
        self._val_cache = cache[cfg.cache_latents:]

    # -- validation (reference Lightning val loop, ddpm.py:372-379) ---------
    def validate(self, state: tstep.TrainState) -> float:
        """Mean eps-MSE over a few val batches with a fixed rng; loss-only
        eval step — the dictionaries/optimizer are untouched and no state
        copy is made.  Note: without a separate ``val_loader`` this measures
        the loss under the *training* loader's augmentation, like the
        reference (its val split reuses the train dataset, aigc_id.yaml).
        In cached mode the eval step consumes cached-schema batches: the
        cache (with its held-out val tail) is built on demand here."""
        if self._eval_cached:
            if self._cache is None:
                self._build_cache()
            val_batches = self._val_cache or self._cache[: self.val_batches]
        else:
            val_batches = None
        losses = []
        source = (val_batches if val_batches is not None
                  else (self.loader if self.val_loader is None
                        else self.val_loader))
        for bi, batch in enumerate(source):
            if bi >= self.val_batches:
                break
            dev_batch = {k: jnp.asarray(v) for k, v in batch.items()
                         if k != "captions"}
            if self.mesh is not None and val_batches is None:
                dev_batch = pmesh.shard_batch(dev_batch, self.mesh)
            logs = self.jit_eval(state, self.frozen, self.basis, dev_batch,
                                 jax.random.key(0))
            losses.append(float(logs["loss_simple"]))
        return float(np.mean(losses)) if losses else float("nan")

    # -- main loop ----------------------------------------------------------
    def fit(self, state: tstep.TrainState) -> tstep.TrainState:
        cfg = self.cfg
        current = {"state": state}
        self._install_signal_handlers(lambda: current["state"])
        log_f = open(self.metrics_path, "a")
        step = int(state.step)
        t_start = time.perf_counter()
        if cfg.cache_latents > 0 and self._cache is None:
            # fast-personalization mode: precompute frozen VAE posteriors +
            # FR features once; steps then cycle the cached batches
            self._build_cache()

        def batches():
            if self._cache is not None:
                i = 0
                while True:
                    yield self._cache[i % len(self._cache)]
                    i += 1
            else:
                yield from self.loader

        accum = max(cfg.accumulate, 1)
        micro = step * accum
        try:
            while step < cfg.max_steps and not self._interrupted:
                for batch in batches():
                    if step >= cfg.max_steps or self._interrupted:
                        break
                    if self._cache is not None:
                        dev_batch = batch  # already device-resident features
                    else:
                        dev_batch = {
                            "image": jnp.asarray(batch["image"]),
                            "tokens": jnp.asarray(batch["tokens"]),
                            "faces": jnp.asarray(batch["faces"]),
                            "ids": jnp.asarray(batch["ids"]),
                            "num_ids": jnp.asarray(batch["num_ids"]),
                        }
                    if self.mesh is not None and self._cache is None:
                        dev_batch = pmesh.shard_batch(dev_batch, self.mesh)
                    t0 = time.perf_counter()
                    state, logs = self.jit_step(current["state"], self.frozen,
                                                self.basis, dev_batch)
                    current["state"] = state
                    # host-side counters: pulling state.step would force a
                    # device sync every iteration and break async dispatch.
                    # `step` counts optimizer steps (Lightning global_step
                    # semantics under accumulate_grad_batches).
                    micro += 1
                    if micro % accum != 0:
                        continue
                    step += 1
                    if step % cfg.log_every == 0 or step == 1:
                        loss = float(logs["loss"])
                        rec = {"step": step, "loss": loss,
                               "loss_simple": float(logs["loss_simple"]),
                               "step_time_s": time.perf_counter() - t0,
                               "wall_s": time.perf_counter() - t_start}
                        log_f.write(json.dumps(rec) + "\n")
                        log_f.flush()
                        if self.tb is not None:
                            self.tb.add_scalar("train/loss", rec["loss"], step)
                            self.tb.add_scalar("train/loss_simple",
                                               rec["loss_simple"], step)
                            self.tb.flush()
                    if step % cfg.ckpt_every == 0:
                        self.save(state)
                    if ((self.val_loader is not None or self._eval_cached)
                            and step % self.val_every == 0):
                        val = self.validate(current["state"])
                        log_f.write(json.dumps(
                            {"step": step, "val_loss_simple": val}) + "\n")
                        log_f.flush()
                        if self.tb is not None:
                            self.tb.add_scalar("val/loss_simple", val, step)
                            self.tb.flush()
                    for cb in self.callbacks:
                        # a callback may transform the train state (ModeSwap
                        # swaps the optimizer mid-run, main_id_embed.py:473-487)
                        new_state = cb.on_step(step, self, current["state"])
                        if new_state is not None:
                            current["state"] = new_state
                    state = current["state"]
        except KeyboardInterrupt:
            print("[trainer] interrupted — saving last checkpoint")
            self.save(current["state"], tag="embeddings_last.pt")
            raise
        finally:
            log_f.close()
            if self.tb is not None:
                self.tb.flush()
        self.save(current["state"])
        return current["state"]
