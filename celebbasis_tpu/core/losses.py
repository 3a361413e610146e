"""Identity-loss heads: margin softmax family, InfoNCE contrastive, EMA.

Parity targets:
* ``AMCosFace`` / ``AMArcFace`` / ``CosFace`` / ``ArcFace`` / ``Softmax``
  margin-classification heads
  (`/root/reference/ldm/modules/id_embedding/margin_losses.py`) — present but
  disabled in the reference (`use_header=False`, meta_net.py:156-162); kept
  available here for the same configurability;
* ``ContrastiveLoss`` InfoNCE over per-id meta embeddings with a trainable
  g-net projection (`contrastive_loss.py:17-51`), enabled by
  ``loss_type: 'contra'``;
* ``LitEma``-style exponential moving average of a param pytree
  (`ldm/modules/ema.py`, disabled by default in the reference).

All pure functions / small Flax modules; margin math runs in fp32.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from celebbasis_tpu.ops.basic import l2_normalize


# -- margin softmax family ---------------------------------------------------

class MarginHead(nn.Module):
    """Normalized-weight classification head producing margin-adjusted logits.

    Exact math of the reference's five heads
    (`/root/reference/ldm/modules/id_embedding/margin_losses.py`):

    * 'softmax'    — plain ``W·x + b`` (:18-69);
    * 'cosface'    — target logit ``cosθ - m`` (:146-203, "Not Used");
    * 'arcface'    — target ``cosθ·cos m - sinθ·sin m`` with the
      easy-margin / ``θ > π - m`` numerical guard (:73-143, "Not Used");
    * 'am_cosface' — adaptive ``cosθ - m + k(θ - a)`` (:203-318; k=0
      degenerates to CosFace);
    * 'am_arcface' — adaptive ``cos(θ + m - k(θ - a))`` (:318-461; k=0
      degenerates to ArcFace without the guard).

    ``label == -1`` rows receive no margin (the reference's PartialFC
    convention).  Defaults keep a=k=0 (plain margins) — the reference's
    adaptive defaults are (a=1.2, k=0.1).
    """
    num_classes: int
    kind: str = "am_cosface"
    m: float = 0.35
    s: float = 64.0
    a: float = 0.0
    k: float = 0.0
    easy_margin: bool = False

    @nn.compact
    def __call__(self, feats: jax.Array, labels: Optional[jax.Array] = None
                 ) -> jax.Array:
        dim = feats.shape[-1]
        w = self.param("weight", nn.initializers.normal(0.01),
                       (self.num_classes, dim), jnp.float32)
        if self.kind == "softmax":
            b = self.param("bias", nn.initializers.zeros,
                           (self.num_classes,), jnp.float32)
            return feats @ w.T + b
        x = l2_normalize(feats.astype(jnp.float32))
        wn = l2_normalize(w)
        cos = jnp.clip(x @ wn.T, -1.0, 1.0)
        if labels is None:
            return self.s * cos
        valid = labels >= 0                            # PartialFC -1 rows
        onehot = jax.nn.one_hot(jnp.maximum(labels, 0), self.num_classes)
        onehot = onehot * valid[:, None]
        theta_t = jnp.arccos(jnp.clip((cos * onehot).sum(-1), -1.0, 1.0))
        if self.kind == "cosface":
            target = cos - self.m
        elif self.kind == "am_cosface":
            target = cos - self.m + (self.k * (theta_t - self.a))[:, None]
        elif self.kind == "arcface":
            sin = jnp.sqrt(jnp.clip(1.0 - cos ** 2, 0.0, 1.0))
            phi = cos * np.cos(self.m) - sin * np.sin(self.m)
            if self.easy_margin:
                target = jnp.where(cos > 0, phi, cos)
            else:
                target = jnp.where(cos > np.cos(np.pi - self.m), phi,
                                   cos - np.sin(np.pi - self.m) * self.m)
        elif self.kind == "am_arcface":
            theta = jnp.arccos(cos)
            m_eff = self.m - self.k * (theta_t - self.a)
            target = jnp.cos(theta + m_eff[..., None])
        else:
            raise ValueError(f"unknown margin head {self.kind!r}")
        return self.s * jnp.where(onehot > 0, target, cos)


def margin_cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=1).mean()


# -- contrastive --------------------------------------------------------------

class ContrastiveGNet(nn.Module):
    """relu -> linear projection g-net (contrastive_loss.py:12-15)."""
    meta_dim: int = 768

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.meta_dim, param_dtype=jnp.float32)(nn.relu(x))


def info_nce_loss(z_feats: jax.Array, temperature: float = 0.07) -> jax.Array:
    """InfoNCE over one example's (id_cnt, D) projected metas: positives are
    ``id_cnt//2`` apart (the second augmentation block), reference
    contrastive_loss.py:34-51."""
    k = z_feats.shape[0]
    cos = l2_normalize(z_feats) @ l2_normalize(z_feats).T
    # static (host) masks: concrete under jit tracing
    self_mask = np.eye(k, dtype=bool)
    cos = jnp.where(self_mask, -9e15, cos) / temperature
    pos = np.roll(np.eye(k, dtype=bool), k // 2, axis=0)
    nll = -cos[pos] + jax.nn.logsumexp(cos, axis=-1)
    return nll.mean()


def contrastive_loss(gnet: ContrastiveGNet, gnet_params, metas: jax.Array,
                     temperature: float = 0.07) -> jax.Array:
    """metas: (N, id_cnt, D) -> scalar InfoNCE through the g-net.

    Reference quirk replicated: the per-example loop overwrites ``nll``
    each iteration (``nll = ...`` not ``+=``, contrastive_loss.py:30-51),
    so only the LAST example's InfoNCE reaches the loss.  We match that
    exactly for oracle parity (the intended accumulation survives only as
    a commented-out line in the reference)."""
    N, k, D = metas.shape
    z = gnet.apply(gnet_params, metas.reshape(N * k, D)).reshape(N, k, -1)
    return info_nce_loss(z[-1], temperature)


# -- EMA (LitEma parity) -----------------------------------------------------

class EmaState(NamedTuple):
    params: object
    decay: float
    num_updates: jax.Array


def ema_init(params, decay: float = 0.9999, use_num_updates: bool = True
             ) -> EmaState:
    return EmaState(jax.tree.map(jnp.asarray, params), decay,
                    jnp.zeros((), jnp.int32) if use_num_updates
                    else jnp.full((), -1, jnp.int32))


def ema_update(state: EmaState, new_params) -> EmaState:
    n = jnp.where(state.num_updates >= 0, state.num_updates + 1,
                  state.num_updates)
    decay = jnp.where(
        n >= 0, jnp.minimum(state.decay, (1.0 + n) / (10.0 + n)), state.decay)
    ema = jax.tree.map(lambda e, p: e * decay + (1.0 - decay) * p,
                       state.params, new_params)
    return EmaState(ema, state.decay, n)
