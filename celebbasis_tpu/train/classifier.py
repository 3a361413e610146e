"""Noise-level latent classifier — the reference's
``NoisyLatentImageClassifier``
(`/root/reference/ldm/models/diffusion/classifier.py:28-267`): train an
EncoderUNetModel (or a full UNetModel for per-pixel 'segmentation' labels)
to classify latents noised to random diffusion timesteps by a *frozen*
latent-diffusion model.  Used upstream for classifier guidance.

TPU-first: the whole shared step — latent q_sample, classifier forward,
cross-entropy, top-k accuracies — is one jitted function; the frozen
diffusion model contributes only its VAE encode (precomputed latents can be
fed directly) and its beta schedule constants.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from celebbasis_tpu.diffusion.ddpm import ScheduleArrays, q_sample
from celebbasis_tpu.diffusion.schedules import make_schedule
from celebbasis_tpu.models.unet import EncoderUNetModel, UNetConfig, UNetModel


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """F.cross_entropy(reduction='none') over trailing class dim."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[..., None],
                                axis=-1).squeeze(-1)


def top_k_accuracy(logits: jax.Array, labels: jax.Array, k: int
                   ) -> jax.Array:
    """compute_top_k(reduction='mean') (classifier.py:150-155)."""
    _, top = jax.lax.top_k(logits, k)
    return jnp.mean(jnp.sum((top == labels[:, None]).astype(jnp.float32),
                            axis=-1))


@dataclass
class ClassifierConfig:
    """The reference ctor surface (classifier.py:30-67), minus the
    lightning/dir plumbing: the diffusion model's schedule + the classifier
    net shape."""
    num_classes: int
    unet: UNetConfig                       # the diffusion model's unet cfg
    label_key: str = "class_label"         # 'class_label' | 'segmentation'
    pool: str = "attention"
    image_size: int = 64                   # latent resolution
    timesteps: int = 1000
    linear_start: float = 0.0015
    linear_end: float = 0.0195
    weight_decay: float = 1e-2
    log_steps: int = 10

    def classifier_cfg(self) -> UNetConfig:
        """load_classifier (classifier.py:95-102): classifier takes the
        diffusion unet config with in=unet.out, out=num_classes."""
        import dataclasses
        return dataclasses.replace(self.unet,
                                   in_channels=self.unet.out_channels,
                                   out_channels=self.num_classes)


class NoisyLatentClassifier:
    """Functional trainer for the classifier; latents in, loss/metrics out.

    ``__call__``-style usage:
        clf = NoisyLatentClassifier(cfg)
        params = clf.init(rng)
        state = clf.init_state(params, lr=1e-4, scheduler=None)
        state, log = clf.train_step(state, z, labels, rng)
    """

    def __init__(self, cfg: ClassifierConfig, dtype=jnp.bfloat16):
        self.cfg = cfg
        ccfg = cfg.classifier_cfg()
        if cfg.label_key == "class_label":
            self.model = EncoderUNetModel(ccfg, image_size=cfg.image_size,
                                          pool=cfg.pool, dtype=dtype)
        elif cfg.label_key == "segmentation":
            # per-pixel classification via the full UNet (classifier.py:16-19)
            self.model = UNetModel(ccfg, dtype=dtype)
        else:
            raise NotImplementedError(cfg.label_key)
        self.sched = ScheduleArrays.from_schedule(
            make_schedule("linear", cfg.timesteps,
                          linear_start=cfg.linear_start,
                          linear_end=cfg.linear_end))
        self._train_step = jax.jit(self._make_train_step())
        self._eval_step = jax.jit(self._shared, static_argnums=(3,))

    # -- setup ------------------------------------------------------------------
    def init(self, rng: jax.Array) -> Dict:
        z = jnp.zeros((1, self.cfg.image_size, self.cfg.image_size,
                       self.cfg.unet.out_channels))
        t = jnp.zeros((1,), jnp.int32)
        if self.cfg.label_key == "segmentation":
            return jax.jit(self.model.init)(rng, z, t, None)
        return jax.jit(self.model.init)(rng, z, t)

    def make_optimizer(self, lr, scheduler: Optional[Callable] = None
                       ) -> optax.GradientTransformation:
        """AdamW(wd) with an optional multiplier schedule
        (configure_optimizers, classifier.py:222-237)."""
        if scheduler is not None:
            lr_fn = lambda step: lr * scheduler(step)
        else:
            lr_fn = lr
        return optax.adamw(lr_fn, weight_decay=self.cfg.weight_decay)

    # -- steps ------------------------------------------------------------------
    def _forward(self, params, z_noisy, t):
        if self.cfg.label_key == "segmentation":
            return self.model.apply(params, z_noisy, t, None)
        return self.model.apply(params, z_noisy, t)

    def _shared(self, params, z, labels, fixed_t: Optional[int],
                rng: jax.Array, t_override: Optional[jax.Array] = None,
                noise_override: Optional[jax.Array] = None
                ) -> Tuple[jax.Array, Dict]:
        """shared_step (classifier.py:179-196): noise to (random|fixed) t,
        classify, CE + top-k.  Segmentation labels are one-hot (B,H,W,K) and
        are argmaxed + nearest-downsampled to the latent grid by the caller
        (get_conditioning, classifier.py:133-148).

        ``t_override``/``noise_override`` substitute the drawn timesteps /
        q-noise (RNG-shared trajectory oracles feed the reference's torch
        draws)."""
        kt, kn = jax.random.split(rng)
        B = z.shape[0]
        if t_override is not None:
            t = t_override.astype(jnp.int32)
        elif fixed_t is None:
            t = jax.random.randint(kt, (B,), 0, self.cfg.timesteps)
        else:
            t = jnp.full((B,), fixed_t, jnp.int32)
        noise = (noise_override if noise_override is not None
                 else jax.random.normal(kn, z.shape))
        z_noisy = q_sample(self.sched, z, t, noise)
        logits = self._forward(params, z_noisy, t)
        loss = cross_entropy(logits, labels)
        k5 = min(5, self.cfg.num_classes)
        if self.cfg.label_key == "segmentation":
            flat_l, flat_y = logits.reshape(-1, logits.shape[-1]), \
                labels.reshape(-1)
        else:
            flat_l, flat_y = logits, labels
        log = {"loss": jnp.mean(loss),
               "acc@1": top_k_accuracy(flat_l, flat_y, 1),
               f"acc@{k5}": top_k_accuracy(flat_l, flat_y, k5)}
        return jnp.mean(loss), log

    def _make_train_step(self):
        def step(params, opt_state, tx_idx, z, labels, rng, t_override,
                 noise_override):
            del tx_idx
            (loss, log), grads = jax.value_and_grad(
                lambda p: self._shared(p, z, labels, None, rng, t_override,
                                       noise_override),
                has_aux=True)(params)
            return loss, log, grads
        return step

    def init_state(self, params: Dict, lr=1e-4,
                   scheduler: Optional[Callable] = None) -> Dict:
        tx = self.make_optimizer(lr, scheduler)
        return {"params": params, "opt": tx.init(params), "tx": tx,
                "step": 0}

    def train_step(self, state: Dict, z: jax.Array, labels: jax.Array,
                   rng: jax.Array, t_override: Optional[jax.Array] = None,
                   noise_override: Optional[jax.Array] = None
                   ) -> Tuple[Dict, Dict]:
        _, log, grads = self._train_step(state["params"], state["opt"], 0,
                                         z, labels, rng, t_override,
                                         noise_override)
        updates, opt = state["tx"].update(grads, state["opt"],
                                          state["params"])
        params = optax.apply_updates(state["params"], updates)
        return {**state, "params": params, "opt": opt,
                "step": state["step"] + 1}, \
            {f"train/{k}": v for k, v in log.items()}

    def validate_noise_sweep(self, params: Dict, z: jax.Array,
                             labels: jax.Array, rng: jax.Array,
                             log_every_t: int = 200) -> Dict[int, Dict]:
        """reset_noise_accs / validation_step sweep (classifier.py:198-219):
        accuracy at fixed noise levels 0, log_every_t, 2·log_every_t, …"""
        out = {}
        for t in range(0, self.cfg.timesteps, log_every_t):
            _, log = self._eval_step(params, z, labels, t, rng)
            out[t] = {k: float(v) for k, v in log.items()}
        return out
