"""First-stage (autoencoder) training losses — LPIPS + PatchGAN, in JAX.

Parity targets:
* ``LPIPSWithDiscriminator``
  (`/root/reference/ldm/modules/losses/contperceptual.py:7-111`) — the KL
  autoencoder loss: elementwise L1 + weighted LPIPS, logvar-scaled NLL, KL
  term, and an adaptive-weighted PatchGAN generator/discriminator pair.
* ``VQLPIPSWithDiscriminator``
  (`/root/reference/ldm/modules/losses/vqperceptual.py:42-170`) — the VQ
  variant: mean NLL (no logvar), codebook term, optional perplexity logging.
* ``NLayerDiscriminator`` / ``weights_init`` / ``hinge_d_loss`` /
  ``vanilla_d_loss`` / ``adopt_weight`` — taming's PatchGAN stack, which the
  reference imports (contperceptual.py:4); not vendored there, so this
  follows the public pix2pix/taming construction.

TPU-first design: the losses are pure functions over Flax variables; the
reference's ``torch.autograd.grad`` adaptive weight
(contperceptual.py:32-42) becomes one ``jax.vjp`` pullback through the
decoder's final conv — the caller hands us the pullback, we hand back
``d_weight`` (see ``adaptive_weight``/``last_layer_pullback``).  Both
generator and discriminator passes jit cleanly (``global_step`` is a traced
array; ``adopt_weight`` is a ``jnp.where``).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from celebbasis_tpu.models.lpips import LPIPS

_conv_init = nn.initializers.normal(stddev=0.02)   # weights_init: N(0, 0.02)


class _TrainBatchNorm(nn.Module):
    """torch BatchNorm2d in training mode: normalize with *batch* statistics,
    learnable affine.  The discriminator only ever runs inside training
    steps, so running-average state is dead weight we do not carry (the
    reference keeps it in the checkpoint but never uses it in training
    mode)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        # weights_init hits BatchNorm too: scale N(1, 0.02), bias 0
        scale = self.param("scale",
                           lambda k, s: 1.0 + _conv_init(k, s, jnp.float32),
                           (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(0, 1, 2))
        var = jnp.var(x32, axis=(0, 1, 2))
        y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
        return (y * scale + bias).astype(x.dtype)


class ActNorm(nn.Module):
    """Per-channel affine (taming ActNorm minus the data-dependent init,
    which needs a host-side first batch; starts at identity)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        loc = self.param("loc", nn.initializers.zeros, (c,))
        scale = self.param("scale", nn.initializers.ones, (c,))
        return (x + loc) * scale


class NLayerDiscriminator(nn.Module):
    """PatchGAN discriminator (pix2pix / taming NLayerDiscriminator):
    4x4 stride-2 conv ladder with leaky ReLU, norm after the first layer,
    a stride-1 penultimate level, and a 1-channel logit head.  NHWC."""
    ndf: int = 64
    n_layers: int = 3
    use_actnorm: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        norm = ActNorm if self.use_actnorm else _TrainBatchNorm
        use_bias = self.use_actnorm   # torch: bias iff norm is not BatchNorm
        pad = ((1, 1), (1, 1))
        h = nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=pad,
                    kernel_init=_conv_init, name="conv_0")(
                        x.astype(jnp.float32))
        h = nn.leaky_relu(h, 0.2)
        for n in range(1, self.n_layers + 1):
            mult = min(2 ** n, 8)
            stride = (2, 2) if n < self.n_layers else (1, 1)
            h = nn.Conv(self.ndf * mult, (4, 4), strides=stride, padding=pad,
                        use_bias=use_bias, kernel_init=_conv_init,
                        name=f"conv_{n}")(h)
            h = norm(name=f"norm_{n}")(h)
            h = nn.leaky_relu(h, 0.2)
        return nn.Conv(1, (4, 4), strides=(1, 1), padding=pad,
                       kernel_init=_conv_init, name="conv_out")(h)


def hinge_d_loss(logits_real: jax.Array, logits_fake: jax.Array) -> jax.Array:
    return 0.5 * (jnp.mean(nn.relu(1.0 - logits_real))
                  + jnp.mean(nn.relu(1.0 + logits_fake)))


def vanilla_d_loss(logits_real: jax.Array,
                   logits_fake: jax.Array) -> jax.Array:
    return 0.5 * (jnp.mean(jax.nn.softplus(-logits_real))
                  + jnp.mean(jax.nn.softplus(logits_fake)))


def adopt_weight(weight: float, global_step: jax.Array,
                 threshold: int, value: float = 0.0) -> jax.Array:
    return jnp.where(global_step < threshold, value, weight)


def measure_perplexity(indices: jax.Array, n_embed: int
                       ) -> Tuple[jax.Array, jax.Array]:
    """Codebook usage diagnostics (vqperceptual.py:26-32)."""
    enc = jax.nn.one_hot(indices.reshape(-1), n_embed, dtype=jnp.float32)
    avg = enc.mean(0)
    perplexity = jnp.exp(-jnp.sum(avg * jnp.log(avg + 1e-10)))
    return perplexity, jnp.sum(avg > 0)


def adaptive_weight(nll_grads, g_grads, disc_weight: float) -> jax.Array:
    """contperceptual.py:32-42: ||∇nll|| / (||∇g|| + 1e-4), clipped, scaled;
    always stop-gradiented like the reference's .detach()."""
    flat = lambda t: jnp.concatenate(
        [jnp.ravel(x) for x in jax.tree_util.tree_leaves(t)])
    d_w = jnp.linalg.norm(flat(nll_grads)) \
        / (jnp.linalg.norm(flat(g_grads)) + 1e-4)
    return jax.lax.stop_gradient(jnp.clip(d_w, 0.0, 1e4)) * disc_weight


def last_layer_pullback(decode_from_last: Callable[[jax.Array], jax.Array],
                        last_kernel: jax.Array):
    """One vjp through the decoder's final conv: returns (reconstructions,
    pullback) where pullback(d recon) -> d last_kernel.  This is the JAX
    formulation of the reference's two ``torch.autograd.grad`` calls against
    ``decoder.conv_out.weight`` (autoencoder.py:230-231)."""
    return jax.vjp(decode_from_last, last_kernel)


@dataclass(frozen=True)
class DiscLossConfig:
    """Shared knobs of both loss classes (reference ctor args)."""
    disc_start: int = 0
    disc_num_layers: int = 3
    disc_in_channels: int = 3
    disc_factor: float = 1.0
    disc_weight: float = 1.0
    perceptual_weight: float = 1.0
    pixelloss_weight: float = 1.0
    use_actnorm: bool = False
    disc_conditional: bool = False
    disc_loss: str = "hinge"
    disc_ndf: int = 64
    # KL variant only
    logvar_init: float = 0.0
    kl_weight: float = 1.0
    # VQ variant only
    codebook_weight: float = 1.0
    pixel_loss: str = "l1"
    n_classes: Optional[int] = None

    def __post_init__(self):
        assert self.disc_loss in ("hinge", "vanilla"), self.disc_loss
        assert self.pixel_loss in ("l1", "l2"), self.pixel_loss


class LPIPSWithDiscriminator:
    """KL-autoencoder loss pair.  ``variables`` layout:
    {"lpips": <LPIPS variables>, "disc": <NLayerDiscriminator variables>,
     "logvar": scalar} — lpips is frozen (reference ``LPIPS().eval()``),
    logvar trains with the generator, disc with the discriminator."""

    def __init__(self, cfg: DiscLossConfig):
        self.cfg = cfg
        self.lpips = LPIPS()
        self.discriminator = NLayerDiscriminator(
            ndf=cfg.disc_ndf, n_layers=cfg.disc_num_layers,
            use_actnorm=cfg.use_actnorm)
        self._d_loss = hinge_d_loss if cfg.disc_loss == "hinge" \
            else vanilla_d_loss

    def init(self, rng: jax.Array, image_shape=(1, 64, 64, 3)) -> Dict:
        k1, k2 = jax.random.split(rng)
        x = jnp.zeros(image_shape, jnp.float32)
        d_in = jnp.zeros(image_shape[:-1]
                         + (self.cfg.disc_in_channels,), jnp.float32)
        return {"lpips": self.lpips.init(k1, x, x),
                "disc": self.discriminator.init(k2, d_in),
                "logvar": jnp.asarray(self.cfg.logvar_init, jnp.float32)}

    # -- shared pieces -------------------------------------------------------
    def nll_of(self, variables: Dict, inputs: jax.Array,
               recons: jax.Array, weights=None):
        """(weighted_nll, nll, rec_loss-mean) as in contperceptual.py:49-59:
        per-element L1 + weighted LPIPS, scaled by exp(-logvar)."""
        cfg = self.cfg
        rec = jnp.abs(inputs - recons)
        if cfg.perceptual_weight > 0:
            p = self.lpips.apply(variables["lpips"], inputs, recons)
            rec = rec + cfg.perceptual_weight * p
        logvar = variables["logvar"]
        nll = rec / jnp.exp(logvar) + logvar
        wnll = nll if weights is None else weights * nll
        B = inputs.shape[0]
        return jnp.sum(wnll) / B, jnp.sum(nll) / B, jnp.mean(rec)

    def _logits_fake(self, variables, recons, cond):
        cfg = self.cfg
        if cond is None:
            assert not cfg.disc_conditional
            return self.discriminator.apply(variables["disc"], recons)
        assert cfg.disc_conditional
        return self.discriminator.apply(
            variables["disc"], jnp.concatenate([recons, cond], axis=-1))

    # -- optimizer_idx == 0 ----------------------------------------------------
    def generator_loss(self, variables: Dict, inputs: jax.Array,
                       recons: jax.Array, kl: jax.Array,
                       global_step: jax.Array,
                       pullback: Optional[Callable] = None,
                       weights=None, cond=None, split: str = "train"
                       ) -> Tuple[jax.Array, Dict]:
        """contperceptual.py:44-93 with optimizer_idx==0.  ``pullback`` maps
        a recon cotangent to last-conv-kernel grads (see
        ``last_layer_pullback``); None behaves like the reference's eval-mode
        RuntimeError path (d_weight = 0)."""
        cfg = self.cfg
        wnll, nll, rec_mean = self.nll_of(variables, inputs, recons, weights)
        kl_loss = jnp.sum(kl) / inputs.shape[0]
        g_loss = -jnp.mean(self._logits_fake(variables, recons, cond))

        if pullback is not None and cfg.disc_factor > 0.0:
            nll_cot = jax.grad(
                lambda r: self.nll_of(variables, inputs, r, weights)[1]
            )(recons)
            g_cot = jax.grad(
                lambda r: -jnp.mean(self._logits_fake(variables, r, cond))
            )(recons)
            d_weight = adaptive_weight(pullback(nll_cot), pullback(g_cot),
                                       cfg.disc_weight)
        else:
            d_weight = jnp.asarray(0.0)

        disc_factor = adopt_weight(cfg.disc_factor, global_step,
                                   cfg.disc_start)
        loss = wnll + cfg.kl_weight * kl_loss \
            + d_weight * disc_factor * g_loss
        log = {f"{split}/total_loss": loss, f"{split}/logvar":
               variables["logvar"], f"{split}/kl_loss": kl_loss,
               f"{split}/nll_loss": nll, f"{split}/rec_loss": rec_mean,
               f"{split}/d_weight": d_weight,
               f"{split}/disc_factor": disc_factor,
               f"{split}/g_loss": g_loss}
        return loss, log

    # -- optimizer_idx == 1 ----------------------------------------------------
    def discriminator_loss(self, variables: Dict, inputs: jax.Array,
                           recons: jax.Array, global_step: jax.Array,
                           cond=None, split: str = "train"
                           ) -> Tuple[jax.Array, Dict]:
        cfg = self.cfg
        inputs = jax.lax.stop_gradient(inputs)
        recons = jax.lax.stop_gradient(recons)
        if cond is not None:
            inputs = jnp.concatenate([inputs, cond], axis=-1)
            recons = jnp.concatenate([recons, cond], axis=-1)
        logits_real = self.discriminator.apply(variables["disc"], inputs)
        logits_fake = self.discriminator.apply(variables["disc"], recons)
        disc_factor = adopt_weight(cfg.disc_factor, global_step,
                                   cfg.disc_start)
        d_loss = disc_factor * self._d_loss(logits_real, logits_fake)
        log = {f"{split}/disc_loss": d_loss,
               f"{split}/logits_real": jnp.mean(logits_real),
               f"{split}/logits_fake": jnp.mean(logits_fake)}
        return d_loss, log


class VQLPIPSWithDiscriminator(LPIPSWithDiscriminator):
    """VQ-autoencoder variant (vqperceptual.py:42-170): mean NLL without the
    logvar scaling, plus the codebook term; perplexity logging."""

    def nll_of(self, variables: Dict, inputs: jax.Array,
               recons: jax.Array, weights=None):
        cfg = self.cfg
        pix = jnp.abs(inputs - recons) if cfg.pixel_loss == "l1" \
            else (inputs - recons) ** 2
        rec = pix
        if cfg.perceptual_weight > 0:
            p = self.lpips.apply(variables["lpips"], inputs, recons)
            rec = rec + cfg.perceptual_weight * p
        nll = jnp.mean(rec)
        return nll, nll, jnp.mean(rec)

    def generator_loss(self, variables: Dict, inputs: jax.Array,   # type: ignore[override]
                       recons: jax.Array, codebook_loss: jax.Array,
                       global_step: jax.Array,
                       pullback: Optional[Callable] = None,
                       predicted_indices: Optional[jax.Array] = None,
                       cond=None, split: str = "train"
                       ) -> Tuple[jax.Array, Dict]:
        cfg = self.cfg
        nll, _, rec_mean = self.nll_of(variables, inputs, recons)
        g_loss = -jnp.mean(self._logits_fake(variables, recons, cond))
        if pullback is not None:
            nll_cot = jax.grad(
                lambda r: self.nll_of(variables, inputs, r)[0])(recons)
            g_cot = jax.grad(
                lambda r: -jnp.mean(self._logits_fake(variables, r, cond))
            )(recons)
            d_weight = adaptive_weight(pullback(nll_cot), pullback(g_cot),
                                       cfg.disc_weight)
        else:
            d_weight = jnp.asarray(0.0)
        disc_factor = adopt_weight(cfg.disc_factor, global_step,
                                   cfg.disc_start)
        loss = nll + d_weight * disc_factor * g_loss \
            + cfg.codebook_weight * jnp.mean(codebook_loss)
        log = {f"{split}/total_loss": loss,
               f"{split}/quant_loss": jnp.mean(codebook_loss),
               f"{split}/nll_loss": nll, f"{split}/rec_loss": rec_mean,
               f"{split}/d_weight": d_weight,
               f"{split}/disc_factor": disc_factor,
               f"{split}/g_loss": g_loss}
        if predicted_indices is not None:
            assert cfg.n_classes is not None
            perplexity, usage = measure_perplexity(predicted_indices,
                                                   cfg.n_classes)
            log[f"{split}/perplexity"] = perplexity
            log[f"{split}/cluster_usage"] = usage
        return loss, log
