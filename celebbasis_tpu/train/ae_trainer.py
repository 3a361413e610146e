"""First-stage (autoencoder) GAN trainer — AutoencoderKL / VQModel.

Parity target: the reference's lightning training of
``AutoencoderKL.training_step`` / ``VQModel.training_step``
(`/root/reference/ldm/models/autoencoder.py:142-196,351-377`): two Adam
optimizers (betas 0.5/0.9), generator pass (optimizer_idx 0) then
discriminator pass (optimizer_idx 1) per batch, losses from
``LPIPSWithDiscriminator`` / ``VQLPIPSWithDiscriminator``.

TPU-first: both passes are single jitted steps; the reference's
``torch.autograd.grad`` adaptive weight becomes a ``jax.vjp`` pullback
through the decoder's final conv (see ``train/ae_loss.py``); the
discriminator pass re-runs the forward with the *updated* generator, which
is exactly what lightning's sequential optimizer stepping does.

Optimizer partition parity quirk: the reference's training_step comment says
"train encoder+decoder+logvar", but its ``configure_optimizers``
(autoencoder.py:197-204 KL is analogous at 386-393) puts ONLY
encoder/decoder/quant convs (+quantize for VQ) in opt_ae — ``loss.logvar``
is in neither optimizer and stays at logvar_init forever.  We match that
behavior (pinned by the K-step trajectory oracle in
tests/test_ae_train_oracle.py).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from celebbasis_tpu.models.vae import AutoencoderKL, sample_posterior
from celebbasis_tpu.models.vq import VQModel
from celebbasis_tpu.train.ae_loss import (DiscLossConfig,
                                          LPIPSWithDiscriminator,
                                          VQLPIPSWithDiscriminator)


def _set_leaf(tree: Dict, path: Tuple[str, ...], value):
    if len(path) == 1:
        return {**tree, path[0]: value}
    return {**tree, path[0]: _set_leaf(tree[path[0]], path[1:], value)}


def _get_leaf(tree: Dict, path: Tuple[str, ...]):
    for p in path:
        tree = tree[p]
    return tree


_LAST_KERNEL = ("params", "decoder", "conv_out", "kernel")


def kl_divergence(mean: jax.Array, logvar: jax.Array) -> jax.Array:
    """DiagonalGaussianDistribution.kl() vs N(0,1)
    (reference distributions.py:66-74): per-sample sum."""
    return 0.5 * jnp.sum(mean ** 2 + jnp.exp(logvar) - 1.0 - logvar,
                         axis=(1, 2, 3))


@dataclass
class AETrainState:
    params: Dict              # {"ae": variables, "loss": {"lpips","disc","logvar"}}
    opt_g: Any
    opt_d: Any
    step: int = 0


class AETrainer:
    """GAN-trains a first stage.  ``model`` is AutoencoderKL or VQModel;
    ``loss`` is the matching (VQ)LPIPSWithDiscriminator."""

    def __init__(self, model, loss, learning_rate: float,
                 lr_g_factor: float = 1.0, tx_g=None, tx_d=None):
        self.model = model
        self.loss = loss
        self.is_vq = isinstance(model, VQModel)
        assert self.is_vq == isinstance(loss, VQLPIPSWithDiscriminator), \
            "VQModel pairs with VQLPIPSWithDiscriminator, KL with LPIPS..."
        # reference configure_optimizers: Adam betas (0.5, 0.9);
        # VQModel scales the generator lr by lr_g_factor.  tx_g/tx_d inject
        # a different optax transform (trajectory oracles use SGD).
        self.tx_g = tx_g if tx_g is not None else \
            optax.adam(learning_rate * lr_g_factor, b1=0.5, b2=0.9)
        self.tx_d = tx_d if tx_d is not None else \
            optax.adam(learning_rate, b1=0.5, b2=0.9)
        self._gen_step = jax.jit(self._make_gen_step())
        self._disc_step = jax.jit(self._make_disc_step())

    # -- setup ------------------------------------------------------------------
    def init(self, rng: jax.Array, image_size: int = 256) -> AETrainState:
        k1, k2, k3 = jax.random.split(rng, 3)
        x = jnp.zeros((1, image_size, image_size, self.model.cfg.in_ch))
        if self.is_vq:
            ae = jax.jit(self.model.init)(k1, x)
        else:   # AutoencoderKL.__call__(x, rng) samples the posterior
            ae = jax.jit(self.model.init)(k1, x, k1)
        lv = self.loss.init(k2, (1, image_size, image_size,
                                 self.loss.cfg.disc_in_channels))
        params = {"ae": ae, "loss": lv}
        # opt_ae covers the autoencoder only — NOT loss.logvar
        # (autoencoder.py:197-204,386-393; see the module docstring)
        return AETrainState(params=params,
                            opt_g=self.tx_g.init(ae),
                            opt_d=self.tx_d.init(lv["disc"]))

    # -- forward ----------------------------------------------------------------
    def _reconstruct(self, ae, x, rng):
        """-> (recons, aux) where aux is kl (KL model) or
        (emb_loss, indices) (VQ), plus the last-layer pullback."""
        if self.is_vq:
            h = self.model.apply(ae, x, method="encode_to_prequant")
            zq, emb_loss, ind = self.model.apply(
                ae, h, method=lambda mdl, hh: mdl.quantize(hh))
            z = zq
            aux = (emb_loss, ind)
        else:
            mean, logvar = self.model.apply(ae, x, method="encode")
            z = sample_posterior(rng, mean, logvar)
            aux = kl_divergence(mean, logvar)

        def decode_from_last(kernel):
            p = _set_leaf(ae, _LAST_KERNEL, kernel)
            return self.model.apply(p, z, method="decode")

        recons, pullback = jax.vjp(decode_from_last,
                                   _get_leaf(ae, _LAST_KERNEL))
        return recons, aux, lambda cot: pullback(cot)[0]

    # -- steps ------------------------------------------------------------------
    def _make_gen_step(self) -> Callable:
        def gen_loss(ae, loss_vars_frozen, x, rng, step):
            recons, aux, pullback = self._reconstruct(ae, x, rng)
            if self.is_vq:
                emb_loss, ind = aux
                kwargs = dict(predicted_indices=ind) \
                    if self.loss.cfg.n_classes else {}
                loss, log = self.loss.generator_loss(
                    loss_vars_frozen, x, recons, emb_loss, step, pullback,
                    **kwargs)
            else:
                loss, log = self.loss.generator_loss(
                    loss_vars_frozen, x, recons, aux, step, pullback)
            return loss, log

        def step_fn(params, opt_g, x, rng, step):
            ae = params["ae"]
            (_, log), grads = jax.value_and_grad(gen_loss, has_aux=True)(
                ae, params["loss"], x, rng, step)
            updates, opt_g = self.tx_g.update(grads, opt_g, ae)
            ae = optax.apply_updates(ae, updates)
            return {"ae": ae, "loss": params["loss"]}, opt_g, log
        return step_fn

    def _make_disc_step(self) -> Callable:
        def disc_loss(disc, params, x, rng, step):
            variables = {"lpips": params["loss"]["lpips"], "disc": disc,
                         "logvar": params["loss"]["logvar"]}
            recons, _, _ = self._reconstruct(params["ae"], x, rng)
            return self.loss.discriminator_loss(variables, x, recons, step)

        def step_fn(params, opt_d, x, rng, step):
            disc = params["loss"]["disc"]
            (_, log), grads = jax.value_and_grad(disc_loss, has_aux=True)(
                disc, params, x, rng, step)
            updates, opt_d = self.tx_d.update(grads, opt_d, disc)
            disc = optax.apply_updates(disc, updates)
            params = {"ae": params["ae"],
                      "loss": dict(params["loss"], disc=disc)}
            return params, opt_d, log
        return step_fn

    def train_batch(self, state: AETrainState, images: jax.Array,
                    rng: jax.Array) -> Tuple[AETrainState, Dict]:
        """One lightning batch: generator pass then discriminator pass
        (autoencoder.py:142-161 optimizer_idx 0 then 1)."""
        kg, kd = jax.random.split(rng)
        step = jnp.asarray(state.step)
        params, opt_g, log_g = self._gen_step(state.params, state.opt_g,
                                              images, kg, step)
        params, opt_d, log_d = self._disc_step(params, state.opt_d,
                                               images, kd, step)
        return AETrainState(params, opt_g, opt_d, state.step + 1), \
            {**log_g, **log_d}
