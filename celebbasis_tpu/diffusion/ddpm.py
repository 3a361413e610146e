"""DDPM forward process + training losses as pure functions.

Functional redesign of the reference LatentDiffusion training math
(`/root/reference/ldm/models/diffusion/ddpm.py`):

* ``q_sample`` (ddpm.py:1056-1060): x_t = sqrt(acp_t) x0 + sqrt(1-acp_t) eps;
* ``p_losses`` (ddpm.py:1069-1116): eps-parameterized MSE with (constant,
  zero-init) per-timestep logvar weighting, l_simple_weight=1,
  original_elbo_weight=0 — net effect mean-MSE, but the full structure is kept
  so the elbo/logvar paths stay configurable;
* x0/eps conversions (ddpm.py:1030-1043).

All schedule gathers are static-shape `take` ops on a (1000,) constant —
jit-friendly, no host sync.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from celebbasis_tpu.diffusion.schedules import NoiseSchedule


class ScheduleArrays(NamedTuple):
    """Device-resident schedule constants."""
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    sqrt_recip_alphas_cumprod: jax.Array
    sqrt_recipm1_alphas_cumprod: jax.Array

    @staticmethod
    def from_schedule(s: NoiseSchedule) -> "ScheduleArrays":
        f32 = lambda a: jnp.asarray(a, jnp.float32)
        return ScheduleArrays(
            f32(s.sqrt_alphas_cumprod),
            f32(s.sqrt_one_minus_alphas_cumprod),
            f32(s.sqrt_recip_alphas_cumprod),
            f32(s.sqrt_recipm1_alphas_cumprod),
        )


def _gather(a: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    """a[t] broadcast to an ndim-rank tensor (extract_into_tensor, util.py:96)."""
    out = a[t]
    return out.reshape(out.shape + (1,) * (ndim - 1))


def q_sample(sched: ScheduleArrays, x0: jax.Array, t: jax.Array,
             noise: jax.Array) -> jax.Array:
    return (_gather(sched.sqrt_alphas_cumprod, t, x0.ndim) * x0
            + _gather(sched.sqrt_one_minus_alphas_cumprod, t, x0.ndim) * noise)


def predict_x0_from_eps(sched: ScheduleArrays, x_t: jax.Array, t: jax.Array,
                        eps: jax.Array) -> jax.Array:
    return (_gather(sched.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
            - _gather(sched.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * eps)


def eps_mse_loss(eps_pred: jax.Array, eps: jax.Array,
                 t: jax.Array | None = None,
                 logvar: jax.Array | None = None,
                 l_simple_weight: float = 1.0) -> tuple[jax.Array, dict]:
    """Training loss (p_losses parity). Returns (scalar, log-dict)."""
    per_ex = jnp.mean((eps_pred.astype(jnp.float32) - eps) ** 2,
                      axis=tuple(range(1, eps.ndim)))
    loss_simple = per_ex.mean()
    if logvar is not None and t is not None:
        lv = logvar[t]
        loss = (per_ex / jnp.exp(lv) + lv).mean()
    else:
        loss = loss_simple
    loss = l_simple_weight * loss
    return loss, {"loss_simple": loss_simple, "loss": loss}
