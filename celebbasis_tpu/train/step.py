"""Personalization training step — coefficient-only backprop, jit/pjit-ready.

The reference trains via Lightning (`/root/reference/main_id_embed.py:812`,
`ddpm.py:921-1116`): VAE-encode the image (no-grad), draw t and noise,
run the CLIP encoder with the embedding manager injecting MetaIdNet's
predicted identity embeddings, predict eps with the frozen UNet, and take
AdamW steps on **only** the StyleVectorizer MLP
(`ddpm.py:1442-1466` — ~0.5M params; everything else frozen).

TPU-native design:
* one pure function ``train_step`` holding the entire graph; params are split
  into ``frozen`` (UNet+VAE+CLIP+FR-net) and ``trainable`` (MLP) pytrees —
  ``jax.grad`` differentiates w.r.t. the trainable tree only, so XLA never
  materializes gradients for the 860M frozen weights (SURVEY §7.1);
* the momentum dictionaries ride inside the carried ``ManagerState``;
* data-parallel: batch axis sharded over the mesh 'data' axis; the tiny MLP
  grads are combined by the mesh-aware jit (psum under the hood);
* loss parity: eps-MSE (+ optional l1/l2 coefficient regularizers,
  embedding_manager.py:514-529).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from celebbasis_tpu.core import manager as mgr
from celebbasis_tpu.core.meta_net import MetaIdNet
from celebbasis_tpu.diffusion import ddpm
from celebbasis_tpu.models.clip_text import CLIPTextEncoder
from celebbasis_tpu.models.vae import AutoencoderKL, sample_posterior


class TrainState(NamedTuple):
    step: jax.Array
    trainable: Any            # MetaIdNet MLP params subtree
    opt_state: Any
    manager_state: mgr.ManagerState
    rng: jax.Array


def split_meta_params(meta_params: Dict) -> Tuple[Dict, Dict]:
    """Partition MetaIdNet params into (trainable mlp/coef_table, frozen rest)."""
    inner = meta_params["params"]
    trainable = {k: v for k, v in inner.items() if k in ("mlp", "coef_table")}
    frozen = {k: v for k, v in inner.items() if k not in trainable}
    return {"params": trainable}, {"params": frozen}


def merge_meta_params(trainable: Dict, frozen: Dict) -> Dict:
    return {"params": {**trainable["params"], **frozen["params"]}}


def make_gnet(pipeline):
    """The contra head's trainable g-net (reference ContrastiveLoss.g_net,
    contrastive_loss.py:12-15; in the optimizer per embedding_manager.py:432-436)."""
    from celebbasis_tpu.core.losses import ContrastiveGNet
    return ContrastiveGNet(meta_dim=pipeline.cfg.clip.width)


def init_gnet_params(pipeline, rng: jax.Array):
    feat = pipeline.manager_cfg.reps * pipeline.cfg.clip.width
    return make_gnet(pipeline).init(rng, jnp.zeros((1, feat)))


def build_trainable(meta_trainable, unet_params=None, gnet_params=None):
    """Assemble the trainable pytree: the bare MetaIdNet subtree when nothing
    else trains, else a keyed dict {"meta", "unet"?, "gnet"?} (the reference's
    embedding_params + model_params groups, ddpm.py:1442-1466)."""
    if unet_params is None and gnet_params is None:
        return meta_trainable
    out = {"meta": meta_trainable}
    if unet_params is not None:
        out["unet"] = unet_params
    if gnet_params is not None:
        out["gnet"] = gnet_params
    return out


def make_optimizer(lr: float = 1e-2,
                   model_lr: Optional[float] = None,
                   accumulate: int = 1,
                   weight_decay: float = 1e-2) -> optax.GradientTransformation:
    """AdamW, reference LR recipe: base 5e-3 scaled by batch (=1e-2 at bs2)
    (main_id_embed.py:778-782, ddpm.py:1454).

    ``weight_decay`` defaults to torch's AdamW default 1e-2 — the reference
    constructs ``torch.optim.AdamW(embedding_params, lr=lr)`` with no
    explicit decay (ddpm.py:1455), so torch's default applies; optax's own
    default (1e-4) would silently diverge (caught by the full-trajectory
    train oracle, tests/test_composed_train_parity.py).

    With ``model_lr`` set, a second AdamW drives the unfrozen UNet at its own
    rate (the reference's ``unfreeze_model``/``model_lr`` path,
    ddpm.py:1442-1466): the trainable pytree is then the dict
    ``{"meta": ..., "unet": ...}`` and rates are routed by top-level key.

    ``accumulate > 1`` wraps the optimizer in ``optax.MultiSteps``: gradients
    are running-mean accumulated over ``accumulate`` micro-batches and one
    AdamW update is applied on the boundary — the Lightning
    ``accumulate_grad_batches`` semantics the reference's LR scaling assumes
    (main_id_embed.py:778-782).
    """
    if model_lr is None:
        opt = optax.adamw(lr, weight_decay=weight_decay)
    else:
        # the contra g-net (if present) rides in the embedding-params group
        # at the base lr, like the reference (ddpm.py:1446-1452)
        opt = optax.multi_transform(
            {"meta": optax.adamw(lr, weight_decay=weight_decay),
             "unet": optax.adamw(model_lr, weight_decay=weight_decay)},
            param_labels=lambda params: {
                k: ("unet" if k == "unet" else "meta") for k in params})
    if accumulate > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=accumulate)
    return opt


def make_loss_fn(pipeline, meta_net: MetaIdNet, loss_type: str = "none",
                 train_unet: bool = False):
    """The full personalization loss as one pure function
    ``loss_fn(trainable, frozen, manager_state, basis, batch, rng)`` —
    shared by the train step (grad) and the eval step (value only).

    batch dict: image (B,H,W,3) in [-1,1]; tokens (B,77) int32;
    faces (B,k,Hf,Wf,3); ids (B,k) int32; num_ids (B,) int32.
    frozen: {"unet","vae","clip","meta_frozen"}.

    The batch may optionally carry deterministic draws — ``override_znoise``
    (the VAE posterior's standard normal), ``override_t`` (B,) int32 and
    ``override_noise`` (the diffusion eps) — replacing the internal RNG.
    This exists so oracle tests can replay the reference's own
    ``training_step`` randomness (torch randn/randint) through the *shipped*
    loss function, trajectory-for-trajectory.
    """
    if loss_type not in mgr.VALID_LOSS_TYPES:   # never a silent no-op
        raise ValueError(f"unknown loss_type {loss_type!r}; "
                         f"expected one of {mgr.VALID_LOSS_TYPES}")
    sched = ddpm.ScheduleArrays.from_schedule(pipeline.schedule)
    m_cfg = pipeline.manager_cfg
    scale = pipeline.cfg.scale_factor
    T = pipeline.cfg.timesteps
    gnet = make_gnet(pipeline) if loss_type == "contra" else None
    keyed = train_unet or gnet is not None

    def loss_fn(trainable, frozen, manager_state, basis, batch, rng):
        rng_z, rng_t, rng_eps = jax.random.split(rng, 3)
        meta_trainable = trainable["meta"] if keyed else trainable
        unet_params = trainable["unet"] if train_unet else frozen["unet"]
        # 1. frozen VAE encode + posterior sample (ddpm.py:702-759)
        mean, logvar = pipeline.vae.apply(frozen["vae"], batch["image"],
                                          method=AutoencoderKL.encode)
        zn = batch.get("override_znoise")
        z0 = (sample_posterior(rng_z, mean, logvar) if zn is None
              else mean + jnp.exp(0.5 * logvar) * zn) * scale
        z0 = jax.lax.stop_gradient(z0)
        B = z0.shape[0]
        # 2. diffusion draw
        t = batch.get("override_t")
        if t is None:
            t = jax.random.randint(rng_t, (B,), 0, T)
        noise = batch.get("override_noise")
        if noise is None:
            noise = jax.random.normal(rng_eps, z0.shape)
        z_t = ddpm.q_sample(sched, z0, t, noise)
        # 3. identity prediction + injection + text encoding
        meta_params = merge_meta_params(meta_trainable, frozen["meta_frozen"])
        pred_z, pred_coeff = meta_net.apply(
            meta_params, batch["faces"], batch["ids"], basis,
            method=MetaIdNet.multi_faces)
        embeds = pipeline.clip.apply(frozen["clip"], batch["tokens"],
                                     method=CLIPTextEncoder.token_embed)
        new_embeds, new_mstate = mgr.train_inject(
            m_cfg, manager_state, batch["tokens"], embeds, pred_z, pred_coeff,
            batch["ids"], batch["num_ids"])
        context = pipeline.clip.apply(frozen["clip"], new_embeds,
                                      method=CLIPTextEncoder.encode)
        # 4. UNet eps prediction + loss (frozen unless train_unet)
        eps_pred = pipeline.unet.apply(unet_params, z_t, t, context)
        loss, logs = ddpm.eps_mse_loss(eps_pred, noise)
        # 5. embedding_neg_loss (ddpm.py:1112-1114, embedding_manager.py:492-529)
        neg, neg_logs = mgr.id_neg_loss(loss_type, pred_z, pred_coeff,
                                        gnet, trainable.get("gnet")
                                        if keyed else None)
        loss = loss + neg
        logs.update(neg_logs)
        return loss, (new_mstate, logs)

    return loss_fn


def _step_from_loss(loss_fn, optimizer):
    def step_fn(state: TrainState, frozen, basis, batch):
        rng, step_rng = jax.random.split(state.rng)
        grads, (new_mstate, logs) = jax.grad(loss_fn, has_aux=True)(
            state.trainable, frozen, state.manager_state, basis, batch,
            step_rng)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.trainable)
        new_trainable = optax.apply_updates(state.trainable, updates)
        return TrainState(state.step + 1, new_trainable, new_opt, new_mstate,
                          rng), logs

    return step_fn


def make_train_step(pipeline, meta_net: MetaIdNet,
                    optimizer: optax.GradientTransformation,
                    loss_type: str = "none", train_unet: bool = False):
    """Returns jit-able ``step_fn(state, frozen_params, basis, batch)``.

    With ``train_unet`` (reference ``unfreeze_model``), the trainable pytree
    is ``{"meta": <mlp>, "unet": <unet params>}`` and the UNet receives
    gradients too; otherwise it is the MLP subtree as before.
    """
    return _step_from_loss(
        make_loss_fn(pipeline, meta_net, loss_type, train_unet), optimizer)


def make_eval_step(pipeline, meta_net: MetaIdNet, loss_type: str = "none",
                   train_unet: bool = False, cached: bool = False):
    """Loss-only step for validation (reference Lightning val loop,
    ddpm.py:372-379): no gradients, no optimizer, the momentum dictionaries
    are NOT advanced, and nothing is donated — the trainer jits this once and
    reuses it without copying the (potentially large) train state.

    Returns ``eval_fn(state, frozen, basis, batch, rng) -> logs``.
    """
    loss_fn = (make_cached_loss_fn if cached else make_loss_fn)(
        pipeline, meta_net, loss_type, **(
            {} if cached else {"train_unet": train_unet}))

    def eval_fn(state: TrainState, frozen, basis, batch, rng):
        loss, (_, logs) = loss_fn(state.trainable, frozen,
                                  state.manager_state, basis, batch, rng)
        logs["loss"] = loss
        return logs

    return eval_fn


def init_train_state(rng: jax.Array, trainable, optimizer,
                     manager_state: mgr.ManagerState) -> TrainState:
    return TrainState(jnp.zeros((), jnp.int32), trainable,
                      optimizer.init(trainable), manager_state, rng)


def make_cached_loss_fn(pipeline, meta_net: MetaIdNet,
                        loss_type: str = "none"):
    """Loss over precomputed frozen features (fast-personalization mode).

    Exact-semantics optimization: the VAE posterior (mean, logvar) and the
    frozen FR-net features are deterministic functions of the augmented
    inputs, so they can be computed once per augmented sample and reused —
    the per-step compute reduces to UNet + CLIP + MLP.  The posterior is
    still *sampled* fresh each step.

    batch: latent_mean/latent_logvar (B,h,w,4); fr_feats (B,k,fr_dim);
    tokens (B,77); ids (B,k); num_ids (B,).
    """
    if loss_type not in mgr.VALID_LOSS_TYPES:   # never a silent no-op
        raise ValueError(f"unknown loss_type {loss_type!r}; "
                         f"expected one of {mgr.VALID_LOSS_TYPES}")
    sched = ddpm.ScheduleArrays.from_schedule(pipeline.schedule)
    m_cfg = pipeline.manager_cfg
    scale = pipeline.cfg.scale_factor
    T = pipeline.cfg.timesteps
    gnet = make_gnet(pipeline) if loss_type == "contra" else None

    def loss_fn(trainable, frozen, manager_state, basis, batch, rng):
        rng_z, rng_t, rng_eps = jax.random.split(rng, 3)
        meta_trainable = trainable["meta"] if gnet is not None else trainable
        z0 = sample_posterior(rng_z, batch["latent_mean"],
                              batch["latent_logvar"]) * scale
        B = z0.shape[0]
        t = jax.random.randint(rng_t, (B,), 0, T)
        noise = jax.random.normal(rng_eps, z0.shape)
        z_t = ddpm.q_sample(sched, z0, t, noise)
        meta_params = merge_meta_params(meta_trainable, frozen["meta_frozen"])
        k = batch["fr_feats"].shape[1]
        v = batch["fr_feats"].reshape(-1, batch["fr_feats"].shape[-1])
        z, coeff = meta_net.apply(meta_params, v, basis,
                                  method=MetaIdNet.z_from_features)
        pred_z = z.reshape(B, k, *z.shape[1:])
        pred_coeff = coeff.reshape(B, k, *coeff.shape[1:])
        embeds = pipeline.clip.apply(frozen["clip"], batch["tokens"],
                                     method=CLIPTextEncoder.token_embed)
        new_embeds, new_mstate = mgr.train_inject(
            m_cfg, manager_state, batch["tokens"], embeds, pred_z, pred_coeff,
            batch["ids"], batch["num_ids"])
        context = pipeline.clip.apply(frozen["clip"], new_embeds,
                                      method=CLIPTextEncoder.encode)
        eps_pred = pipeline.unet.apply(frozen["unet"], z_t, t, context)
        loss, logs = ddpm.eps_mse_loss(eps_pred, noise)
        neg, neg_logs = mgr.id_neg_loss(loss_type, pred_z, pred_coeff,
                                        gnet, trainable.get("gnet")
                                        if gnet is not None else None)
        logs.update(neg_logs)
        return loss + neg, (new_mstate, logs)

    return loss_fn


def make_cached_train_step(pipeline, meta_net: MetaIdNet,
                           optimizer: optax.GradientTransformation,
                           loss_type: str = "none"):
    """Fast-personalization step over precomputed frozen features
    (see ``make_cached_loss_fn``)."""
    return _step_from_loss(make_cached_loss_fn(pipeline, meta_net, loss_type),
                           optimizer)


def precompute_cache(pipeline, meta_net: MetaIdNet, meta_params, vae_params,
                     loader, n_batches: int):
    """Run the frozen VAE + FR-net over ``n_batches`` augmented batches and
    return a list of cached-step batches."""
    from celebbasis_tpu.models.vae import AutoencoderKL

    enc = jax.jit(lambda p, x: pipeline.vae.apply(
        p, x, method=AutoencoderKL.encode))
    feats = jax.jit(lambda p, f: meta_net.apply(
        p, f, method=MetaIdNet.face_features))
    cached = []
    for bi, batch in enumerate(loader):
        if bi >= n_batches:
            break
        mean, logvar = enc(vae_params, jnp.asarray(batch["image"]))
        B, k = batch["faces"].shape[:2]
        flat = jnp.asarray(batch["faces"]).reshape((B * k,)
                                                   + batch["faces"].shape[2:])
        v = feats(meta_params, flat).reshape(B, k, -1)
        cached.append({
            "latent_mean": mean, "latent_logvar": logvar, "fr_feats": v,
            "tokens": jnp.asarray(batch["tokens"]),
            "ids": jnp.asarray(batch["ids"]),
            "num_ids": jnp.asarray(batch["num_ids"]),
        })
    return cached
