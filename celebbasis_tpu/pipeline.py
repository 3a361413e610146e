"""End-to-end CelebBasis pipeline: models + basis + manager glued together.

This is the TPU equivalent of the reference's LatentDiffusion container
(`/root/reference/ldm/models/diffusion/ddpm.py:439-528`) plus the
txt2img driver path (`scripts/stable_txt2img.py:229-376`):

    tokens -> CLIP token table -> identity injection -> CLIP encoder
           -> (context) -> UNet eps -> DDIM scan -> VAE decode

Everything from prompt embeddings to decoded pixels is one jitted function
(``make_txt2img_fn``); the 50-step CFG loop never leaves the device.

Weights live in a single params pytree ``{"unet","vae","clip"}`` so the bundle
shards/donates cleanly under pjit.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from celebbasis_tpu.core import manager as mgr
from celebbasis_tpu.core.basis import BasisConfig
from celebbasis_tpu.diffusion.sampler import SamplerConfig, ddim_sample, plms_sample
from celebbasis_tpu.diffusion.schedules import (DDIMSchedule, NoiseSchedule,
                                                make_ddim_schedule,
                                                make_schedule)
from celebbasis_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
from celebbasis_tpu.models.unet import UNetConfig, UNetModel
from celebbasis_tpu.models.vae import AutoencoderKL, VAEConfig
from celebbasis_tpu.text.tokenizer import CLIPTokenizer


def finish_images(img: jax.Array, output: str) -> jax.Array:
    """Final on-device image formatting for the sampling graphs.

    ``output='float'`` keeps the reference contract (clipped [-1, 1] fp32,
    `stable_txt2img.py:355-360`).  ``output='uint8'`` additionally quantizes
    to display pixels *on device*, so the host download over the tunnel is
    4x smaller — same math as the CLIs' former host-side
    ``((x + 1) * 127.5).clip(0, 255).astype(uint8)`` (float->int converts
    truncate toward zero in both XLA and numpy, so pixels are bit-equal).
    """
    img = jnp.clip(img, -1.0, 1.0)
    if output == "float":
        return img
    if output == "uint8":
        scaled = (img.astype(jnp.float32) + 1.0) * 127.5
        return jnp.clip(scaled, 0.0, 255.0).astype(jnp.uint8)
    raise ValueError(f"unknown output mode {output!r}")


@dataclass(frozen=True)
class PipelineConfig:
    unet: UNetConfig = UNetConfig.sd_v1()
    vae: VAEConfig = VAEConfig.sd_v1()
    clip: CLIPTextConfig = CLIPTextConfig.sd_v1()
    basis: BasisConfig = BasisConfig()
    placeholder_strings: Tuple[str, ...] = ("sks", "ks", "ata", "tre", "ry",
                                            "bop", "rn", "&", "*", "`")
    scale_factor: float = 0.18215
    timesteps: int = 1000
    linear_start: float = 0.00085
    linear_end: float = 0.0120
    dtype: Any = jnp.bfloat16

    @staticmethod
    def sd_v1() -> "PipelineConfig":
        return PipelineConfig()

    @staticmethod
    def tiny() -> "PipelineConfig":
        """Structurally identical, toy-sized config for tests/dryruns."""
        clip = CLIPTextConfig.tiny()
        return PipelineConfig(
            unet=UNetConfig.tiny(context_dim=clip.width),
            vae=VAEConfig.tiny(),
            clip=clip,
            basis=BasisConfig(n_components=8, special_id_threshold=1022),
            dtype=jnp.float32,
        )


class CelebBasisPipeline:
    """Bundles modules, tokenizer, schedule, basis, and manager config."""

    def __init__(self, cfg: PipelineConfig, tokenizer: CLIPTokenizer):
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.unet = UNetModel(cfg.unet, cfg.dtype)
        self.vae = AutoencoderKL(cfg.vae, cfg.dtype)
        self.clip = CLIPTextEncoder(cfg.clip, cfg.dtype)
        self.schedule: NoiseSchedule = make_schedule(
            "linear", cfg.timesteps, cfg.linear_start, cfg.linear_end)
        from celebbasis_tpu.text.tokenizer import token_for_string
        ph_ids = [token_for_string(tokenizer, s)
                  for s in cfg.placeholder_strings]
        self.manager_cfg = mgr.ManagerConfig(
            placeholder_token_ids=tuple(ph_ids),
            num_es=cfg.basis.num_embeds_per_token,
            inner_dim=cfg.basis.n_components,
            token_dim=cfg.clip.width,
        )

    @property
    def latent_factor(self) -> int:
        """VAE spatial downsample factor (8 for SD v1's f=8 KL autoencoder)."""
        return 2 ** (len(self.cfg.vae.ch_mult) - 1)

    # -- initialization -----------------------------------------------------
    def init_params(self, rng: jax.Array, image_size: int = 512) -> Dict:
        ru, rv, rc = jax.random.split(rng, 3)
        lat = image_size // self.latent_factor
        x = jnp.zeros((1, lat, lat, 4))
        t = jnp.zeros((1,), jnp.int32)
        ctx = jnp.zeros((1, self.cfg.clip.max_length, self.cfg.clip.width))
        ids = jnp.zeros((1, self.cfg.clip.max_length), jnp.int32)
        img = jnp.zeros((1, image_size, image_size, 3))
        return {
            "unet": jax.jit(self.unet.init)(ru, x, t, ctx),
            "vae": jax.jit(self.vae.init)(rv, img, rv),
            "clip": jax.jit(self.clip.init)(rc, ids),
        }

    def token_table(self, params) -> np.ndarray:
        return np.asarray(
            params["clip"]["params"]["token_embedding"]["embedding"])

    # -- conditioning -------------------------------------------------------
    def conditioning(self, params, tokens: jax.Array,
                     manager_state: Optional[mgr.ManagerState] = None,
                     basis: Optional[jax.Array] = None,
                     ids: Optional[jax.Array] = None,
                     num_ids: Optional[jax.Array] = None) -> jax.Array:
        """get_learned_conditioning (ddpm.py:599-611): tokens -> (B,77,D)
        context, with identity injection when ids are given."""
        embeds = self.clip.apply(params["clip"], tokens,
                                 method=CLIPTextEncoder.token_embed)
        if ids is not None:
            assert manager_state is not None and basis is not None
            embeds = mgr.test_inject(self.manager_cfg, manager_state, basis,
                                     tokens, embeds, ids, num_ids)
        return self.clip.apply(params["clip"], embeds,
                               method=CLIPTextEncoder.encode)

    def eps_model(self, params):
        def fn(x, t, ctx):
            return self.unet.apply(params["unet"], x, t, ctx)
        return fn

    # -- jitted end-to-end samplers -----------------------------------------
    def make_txt2img_fn(self, num_steps: int = 50, guidance_scale: float = 10.0,
                        eta: float = 0.0, image_size: int = 512,
                        sampler: str = "ddim", output: str = "float"):
        """Returns jit(fn)(params, manager_state, basis, tokens, uncond_tokens,
        ids, num_ids, rng) -> images (B,H,W,3) in [-1,1] (or uint8 pixels
        when ``output='uint8'`` — see :func:`finish_images`).

        Matches the reference recipe: DDIM 50 / scale 10 / eta 0
        (02_start_test.sh:36-49).
        """
        ddim = make_ddim_schedule(self.schedule, num_steps, eta)
        lat = image_size // self.latent_factor
        sample_fn = ddim_sample if sampler == "ddim" else plms_sample

        def fn(params, manager_state, basis, tokens, uncond_tokens, ids,
               num_ids, rng, x_T=None):
            # x_T: optional explicit start latents (B,lat,lat,4) — the
            # reference's ``start_code``/``x_T`` knob (stable_txt2img.py:327,
            # ddim.py:96-103); oracle tests use it to pin the composed chain
            B = tokens.shape[0]
            cond = self.conditioning(params, tokens, manager_state, basis,
                                     ids, num_ids)
            uncond = self.conditioning(params, uncond_tokens)
            x = sample_fn(self.eps_model(params), ddim, rng=rng,
                          shape=(B, lat, lat, 4), cond=cond, uncond=uncond,
                          cfg=SamplerConfig(guidance_scale=guidance_scale,
                                            eta=eta), x_T=x_T)
            z = x / self.cfg.scale_factor
            img = self.vae.apply(params["vae"], z,
                                 method=AutoencoderKL.decode)
            return finish_images(img, output)

        return jax.jit(fn)

    def make_txt2img_faces_fn(self, meta_net, num_steps: int = 50,
                              guidance_scale: float = 10.0, eta: float = 0.0,
                              image_size: int = 512, sampler: str = "ddim",
                              output: str = "float"):
        """Live-face personalization at inference (test_mode='image'):
        identity embeddings come from a fresh MetaIdNet forward on aligned
        face crops instead of saved coefficients — the reference's one-shot
        "insert anybody without training artifacts" mode
        (scripts/stable_txt2img.py:271-318, embedding_manager.py:452-481).

        Returns jit(fn)(params, meta_params, basis, tokens, uncond_tokens,
        faces, ids, num_ids, rng) -> images; faces (B, k, Hf, Wf, 3) aligned
        crops in [-1, 1].
        """
        import dataclasses

        from celebbasis_tpu.core.meta_net import MetaIdNet

        ddim = make_ddim_schedule(self.schedule, num_steps, eta)
        lat = image_size // self.latent_factor
        sample_fn = ddim_sample if sampler == "ddim" else plms_sample
        m_cfg = dataclasses.replace(self.manager_cfg, test_mode="image")

        def fn(params, meta_params, basis, tokens, uncond_tokens, faces,
               ids, num_ids, rng):
            B = tokens.shape[0]
            pred_z, _coeff = meta_net.apply(meta_params, faces, ids, basis,
                                            method=MetaIdNet.multi_faces)
            embeds = self.clip.apply(params["clip"], tokens,
                                     method=CLIPTextEncoder.token_embed)
            embeds = mgr.test_inject(m_cfg, None, basis, tokens, embeds,
                                     ids, num_ids, pred_z=pred_z)
            cond = self.clip.apply(params["clip"], embeds,
                                   method=CLIPTextEncoder.encode)
            uncond = self.conditioning(params, uncond_tokens)
            x = sample_fn(self.eps_model(params), ddim, rng=rng,
                          shape=(B, lat, lat, 4), cond=cond, uncond=uncond,
                          cfg=SamplerConfig(guidance_scale=guidance_scale,
                                            eta=eta))
            img = self.vae.apply(params["vae"], x / self.cfg.scale_factor,
                                 method=AutoencoderKL.decode)
            return finish_images(img, output)

        return jax.jit(fn)

    def make_txt2img_ti_fn(self, ti_cfg, ph_ids, num_steps: int = 50,
                           guidance_scale: float = 7.5, eta: float = 0.0,
                           image_size: int = 512, sampler: str = "ddim",
                           output: str = "float"):
        """Textual-inversion sampling: learned vectors replace placeholders
        (the reference's main.py/textual_test path).

        Returns jit(fn)(params, ti_params, tokens, uncond_tokens, rng).
        """
        from celebbasis_tpu.core import textual_inversion as ti
        ddim = make_ddim_schedule(self.schedule, num_steps, eta)
        lat = image_size // self.latent_factor
        sample_fn = ddim_sample if sampler == "ddim" else plms_sample
        ph = jnp.asarray(ph_ids, jnp.int32)

        def fn(params, ti_params, tokens, uncond_tokens, rng):
            B = tokens.shape[0]
            embeds = self.clip.apply(params["clip"], tokens,
                                     method=CLIPTextEncoder.token_embed)
            embeds = ti.ti_inject(ti_cfg, ti_params, ph, tokens, embeds)
            cond = self.clip.apply(params["clip"], embeds,
                                   method=CLIPTextEncoder.encode)
            uncond = self.conditioning(params, uncond_tokens)
            x = sample_fn(self.eps_model(params), ddim, rng=rng,
                          shape=(B, lat, lat, 4), cond=cond, uncond=uncond,
                          cfg=SamplerConfig(guidance_scale=guidance_scale,
                                            eta=eta))
            img = self.vae.apply(params["vae"], x / self.cfg.scale_factor,
                                 method=AutoencoderKL.decode)
            return finish_images(img, output)

        return jax.jit(fn)
