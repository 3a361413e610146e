"""Legacy latent-diffusion family: build runnable models from every shipped
reference config.

The reference ships ten legacy configs (`configs/latent-diffusion/*.yaml`) on
top of the four autoencoder ones (`configs/autoencoder/*.yaml`); each is a
``LatentDiffusion`` (`/root/reference/ldm/models/diffusion/ddpm.py:429-`)
with a first stage (AutoencoderKL / VQModelInterface), a cond stage
(unconditional / ClassEmbedder / BERTEmbedder / FrozenCLIPEmbedder), and a
legacy-knob UNet.  ``build_legacy_ldm`` maps any of those YAML dicts onto
this framework's Flax modules and returns a :class:`LegacyLDM` that can
init, encode/decode, condition, train a step, and DDIM/DDPM-sample — the
same capabilities ``scripts/sample_diffusion.py`` and ``main.py`` drive.

TPU-first: all sampling paths reuse the scan-based samplers
(`diffusion/sampler.py`), first-stage decode included in the jitted graph,
uint8 conversion on device (`pipeline.finish_images`).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from celebbasis_tpu.diffusion.ddpm import q_sample
from celebbasis_tpu.diffusion.sampler import (SamplerConfig, ddim_sample,
                                              ddpm_sample)
from celebbasis_tpu.diffusion.schedules import (make_ddim_schedule,
                                                make_schedule)
from celebbasis_tpu.models.bert_text import (BERTTextConfig, BERTTextEncoder,
                                             ClassEmbedder)
from celebbasis_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
from celebbasis_tpu.models.cond_stages import SpatialRescaler
from celebbasis_tpu.models.unet import UNetConfig, UNetModel
from celebbasis_tpu.models.vae import AutoencoderKL, VAEConfig
from celebbasis_tpu.models.vq import VQModelInterface
from celebbasis_tpu.text.bert_tokenizer import default_bert_tokenizer
from celebbasis_tpu.text.tokenizer import CLIPTokenizer
from celebbasis_tpu.utils.config import get


def _unet_cfg(up: Dict) -> UNetConfig:
    """openaimodel.UNetModel params (openaimodel.py:413-560) -> UNetConfig.
    The reference's ``use_spatial_transformer`` defaults to False — the
    legacy configs run plain AttentionBlock self-attention."""
    return UNetConfig(
        in_channels=up.get("in_channels", 4),
        out_channels=up.get("out_channels", 4),
        model_channels=up.get("model_channels", 320),
        num_res_blocks=up.get("num_res_blocks", 2),
        attention_resolutions=tuple(up.get("attention_resolutions",
                                           (4, 2, 1))),
        channel_mult=tuple(up.get("channel_mult", (1, 2, 4, 4))),
        num_heads=up.get("num_heads", -1),
        transformer_depth=up.get("transformer_depth", 1),
        context_dim=up.get("context_dim") or 768,
        remat=up.get("use_checkpoint", False),
        dropout=up.get("dropout", 0.0),
        use_spatial_transformer=up.get("use_spatial_transformer", False),
        num_head_channels=up.get("num_head_channels", -1),
        use_scale_shift_norm=up.get("use_scale_shift_norm", False),
        resblock_updown=up.get("resblock_updown", False),
    )


def _vae_cfg(fs_params: Dict, scale_factor: float = 1.0) -> VAEConfig:
    dd = fs_params.get("ddconfig", {})
    return VAEConfig(
        ch=dd.get("ch", 128),
        ch_mult=tuple(dd.get("ch_mult", (1, 2, 4, 4))),
        num_res_blocks=dd.get("num_res_blocks", 2),
        z_channels=dd.get("z_channels", 4),
        embed_dim=fs_params.get("embed_dim", 4),
        in_ch=dd.get("in_channels", 3),
        out_ch=dd.get("out_ch", 3),
        scale_factor=scale_factor,
        attn_resolutions=tuple(dd.get("attn_resolutions", ()) or ()),
        double_z=dd.get("double_z", True),
        resolution=dd.get("resolution", 256),
        attn_type=dd.get("attn_type", "vanilla"),
    )


@dataclass
class LegacyLDM:
    """A reference latent-diffusion config, instantiated TPU-side."""
    unet: UNetModel
    first_stage: Any                   # AutoencoderKL | VQModelInterface
    first_stage_kind: str              # 'kl' | 'vq'
    # 'uncond' | 'class' | 'bert' | 'clip' | 'rescaler' | 'identity'
    # | 'first_stage'
    cond_kind: str
    cond_stage: Any                    # module or None
    cond_mode: str                     # 'none' | 'concat' | 'crossattn'
    cond_stage_params: Dict            # raw cond_stage_config params
    tokenizer: Any                     # text tokenizer or None
    image_size: int                    # latent spatial size
    channels: int                      # latent channels
    timesteps: int
    linear_start: float
    linear_end: float
    scale_factor: float
    scale_by_std: bool
    loss_type: str                     # 'l1' | 'l2'
    cond_stage_key: str
    raw: Dict

    # -- init ------------------------------------------------------------------
    def init_params(self, rng: jax.Array) -> Dict:
        ku, kf, kc = jax.random.split(rng, 3)
        # concat mode: the UNet consumes latent ++ conditioning channels
        # (e.g. inpainting_big in_channels=7 = 3 latent + 3 masked-enc + 1
        # mask), so init with the UNet's own in_channels
        latent = jnp.zeros((1, self.image_size, self.image_size,
                            self.unet.cfg.in_channels))
        t = jnp.zeros((1,), jnp.int32)
        ctx = None
        if self.unet.cfg.use_spatial_transformer:
            ctx = jnp.zeros((1, 77, self.unet.cfg.context_dim))
        unet_p = jax.jit(self.unet.init)(ku, latent, t, ctx)
        img_res = self.first_stage.cfg.resolution
        img = jnp.zeros((1, img_res, img_res, self.first_stage.cfg.in_ch))
        if self.first_stage_kind == "kl":   # __call__(x, rng)
            fs_p = jax.jit(self.first_stage.init)(kf, img, kf)
        else:
            fs_p = jax.jit(self.first_stage.init)(kf, img)
        params = {"unet": unet_p, "first_stage": fs_p}
        if self.cond_kind == "class":
            params["cond_stage"] = self.cond_stage.init(
                kc, jnp.zeros((1,), jnp.int32))
        elif self.cond_kind in ("bert", "clip"):
            ids = jnp.zeros((1, 77), jnp.int32)
            params["cond_stage"] = jax.jit(self.cond_stage.init)(kc, ids)
        elif self.cond_kind == "rescaler":
            n_up = 2 ** self.cond_stage.n_stages
            seg = jnp.zeros((1, self.image_size * n_up,
                             self.image_size * n_up,
                             self.cond_stage_params.get("in_channels", 3)))
            params["cond_stage"] = self.cond_stage.init(kc, seg)
        return params

    # -- first stage -------------------------------------------------------------
    def encode_first_stage(self, params: Dict, x: jax.Array,
                           rng: Optional[jax.Array] = None) -> jax.Array:
        """image (B,H,W,3) in [-1,1] -> scaled latent (ddpm.py:830-865).
        KL stages sample the posterior when ``rng`` is given, else mode."""
        if self.first_stage_kind == "vq":
            z = self.first_stage.apply(params["first_stage"], x,
                                       method="encode")
        else:
            mean, logvar = self.first_stage.apply(
                params["first_stage"], x, method="encode")
            if rng is not None:
                from celebbasis_tpu.models.vae import sample_posterior
                z = sample_posterior(rng, mean, logvar)
            else:
                z = mean
        return self.scale_factor * z

    def decode_first_stage(self, params: Dict, z: jax.Array,
                           force_not_quantize: bool = False) -> jax.Array:
        z = z / self.scale_factor
        if self.first_stage_kind == "vq":
            return self.first_stage.apply(params["first_stage"], z,
                                          force_not_quantize, method="decode")
        return self.first_stage.apply(params["first_stage"], z,
                                      method="decode")

    # -- conditioning -------------------------------------------------------------
    def get_learned_conditioning(self, params: Dict, batch,
                                 inject: Optional[Callable] = None
                                 ) -> Optional[jax.Array]:
        """prompts/labels -> (B, T, D) context, or conditioning images ->
        (B, h, w, c) concat maps (ddpm.py:599-611).  ``inject`` is the
        textual-inversion hook threaded to the token-embedding layer
        (x_transformer.py:619-623 / modules.py embedding_manager kwarg)."""
        if self.cond_kind == "uncond":
            return None
        if self.cond_kind == "class":
            labels = jnp.asarray(batch, jnp.int32)
            return self.cond_stage.apply(params["cond_stage"], labels)
        if self.cond_kind == "identity":
            # bsr_sr: torch.nn.Identity over the LR image (NHWC [-1,1])
            return jnp.asarray(batch)
        if self.cond_kind == "rescaler":
            # semantic synthesis: rescale segmentation to latent resolution
            return self.cond_stage.apply(params["cond_stage"],
                                         jnp.asarray(batch))
        if self.cond_kind == "first_stage":
            # inpainting_big: cond_stage_model IS the first stage; the
            # reference calls .encode() directly — NO scale_factor
            # (scripts/inpaint.py:77)
            z = self.encode_first_stage(params, jnp.asarray(batch))
            return z / self.scale_factor
        ids = jnp.asarray(self.tokenizer(batch))
        if inject is not None:
            return self.cond_stage.apply(params["cond_stage"], ids, inject)
        return self.cond_stage.apply(params["cond_stage"], ids)

    def eps_model(self, params: Dict) -> Callable:
        """(x, t, cond) -> eps, dispatching on the conditioning mode like
        the reference DiffusionWrapper (ddpm.py:1537-1552): crossattn feeds
        cond as attention context, concat appends it to the input channels."""
        if self.cond_mode == "concat":
            def fn(x, t, ctx):
                return self.unet.apply(
                    params["unet"],
                    jnp.concatenate([x, ctx.astype(x.dtype)], axis=-1),
                    t, None)
        else:
            def fn(x, t, ctx):
                return self.unet.apply(params["unet"], x, t, ctx)
        return fn

    # -- training ----------------------------------------------------------------
    def make_train_step(self, optimizer) -> Callable:
        """eps-prediction loss step (ddpm.py:1030-1076 p_losses, with the
        config's loss_type l1/l2) over unet params; first/cond stages
        frozen like the reference default (cond_stage_trainable handled by
        the caller passing it into the optimizer partition)."""
        from celebbasis_tpu.diffusion.ddpm import ScheduleArrays
        sched = ScheduleArrays.from_schedule(
            make_schedule("linear", self.timesteps,
                          linear_start=self.linear_start,
                          linear_end=self.linear_end))

        def loss_fn(unet_params, params, z, ctx, rng, override_t=None,
                    override_noise=None):
            # override_t / override_noise: deterministic draws for the
            # composed trajectory oracle (same contract as train/step.py)
            kt, kn = jax.random.split(rng)
            B = z.shape[0]
            t = (jax.random.randint(kt, (B,), 0, self.timesteps)
                 if override_t is None else override_t)
            noise = (jax.random.normal(kn, z.shape)
                     if override_noise is None else override_noise)
            x_t = q_sample(sched, z, t, noise)
            if self.cond_mode == "concat" and ctx is not None:
                eps = self.unet.apply(
                    unet_params,
                    jnp.concatenate([x_t, ctx.astype(x_t.dtype)], axis=-1),
                    t, None)
            else:
                eps = self.unet.apply(unet_params, x_t, t, ctx)
            if self.loss_type == "l1":
                return jnp.mean(jnp.abs(eps - noise))
            return jnp.mean((eps - noise) ** 2)

        def step(params, opt_state, batch_z, ctx, rng, override_t=None,
                 override_noise=None):
            loss, grads = jax.value_and_grad(loss_fn)(
                params["unet"], params, batch_z, ctx, rng, override_t,
                override_noise)
            updates, opt_state = optimizer.update(grads, opt_state,
                                                  params["unet"])
            import optax
            params = dict(params,
                          unet=optax.apply_updates(params["unet"], updates))
            return params, opt_state, loss
        return step

    # -- sampling ----------------------------------------------------------------
    def make_sample_fn(self, num_steps: int = 50, eta: float = 0.0,
                       ddim: bool = True, guidance_scale: float = 1.0,
                       force_not_quantize: bool = False,
                       inject: Optional[Callable] = None,
                       uncond_label: Optional[int] = None,
                       raw_cond: bool = False) -> Callable:
        """(params, rng, batch_or_none, n) -> images float32 [-1,1] NHWC.
        DDIM via the scan sampler (sampler.py:88) or full-chain DDPM
        (scripts/sample_diffusion.py convsample / convsample_ddim).
        ``guidance_scale`` > 1 enables CFG against the empty prompt
        (evaluate_model.py / LDMCLIPEvaluator: scale 5.0 vs n*['']) for
        text conditioning, or against the learned ``uncond_label`` class
        embedding for class conditioning (the reference's
        latent_imagenet_diffusion.ipynb: uc = conditioning on label 1000
        of cin256-v2's n_classes=1001; defaults to n_classes-1)."""
        sched = make_schedule("linear", self.timesteps,
                              linear_start=self.linear_start,
                              linear_end=self.linear_end)

        def fn(params, rng, cond_batch, n: int):
            shape = (n, self.image_size, self.image_size, self.channels)
            if raw_cond:
                # caller-composed conditioning (e.g. cli/inpaint.py: encoded
                # masked image ++ downsampled mask, scripts/inpaint.py:76-79)
                ctx = cond_batch
            else:
                ctx = self.get_learned_conditioning(params, cond_batch,
                                                    inject) \
                    if cond_batch is not None else None
            eps = self.eps_model(params)
            uncond = None
            if ctx is None:
                model = lambda x, t, c: eps(x, t, None)
                cond = jnp.zeros((n, 1, 1))
            else:
                model, cond = eps, ctx
                if guidance_scale != 1.0 and self.cond_mode == "concat":
                    raise ValueError(
                        "CFG over concat conditioning has no uncond source "
                        "(no reference workload guides inpaint/SR/semantic)")
                if guidance_scale != 1.0 and self.cond_kind in ("bert",
                                                                "clip"):
                    uncond = self.get_learned_conditioning(params, [""] * n)
                elif guidance_scale != 1.0 and self.cond_kind == "class":
                    lbl = uncond_label if uncond_label is not None \
                        else self.cond_stage.n_classes - 1
                    uncond = self.get_learned_conditioning(
                        params, jnp.full((n,), lbl, jnp.int32))
            scfg = SamplerConfig(guidance_scale=guidance_scale, eta=eta)
            if ddim:
                dd = make_ddim_schedule(sched, num_steps, eta=eta)
                z = ddim_sample(model, dd, rng=rng, shape=shape,
                                cond=cond, uncond=uncond, cfg=scfg)
            else:
                z = ddpm_sample(model, sched, rng=rng, shape=shape,
                                cond=cond, uncond=uncond, cfg=scfg)
            return self.decode_first_stage(params, z,
                                           force_not_quantize=force_not_quantize)
        return fn

    def calibrate_scale(self, params: Dict, batch_images: jax.Array
                        ) -> "LegacyLDM":
        """scale_by_std (ddpm.py:576-587): set scale_factor to 1/std of the
        first batch's latents.  Returns self, mutated, for chaining."""
        assert self.scale_by_std
        z = self.encode_first_stage(params, batch_images) / self.scale_factor
        self.scale_factor = float(1.0 / jnp.std(z))
        return self


def build_legacy_ldm(cfg: Dict, dtype=jnp.bfloat16) -> LegacyLDM:
    """Reference LatentDiffusion YAML dict -> :class:`LegacyLDM`.

    Accepts every shipped `configs/latent-diffusion/*.yaml` AND every
    `models/ldm/*/config.yaml` (the reference's pretrained-model zoo:
    crossattn text/class conditioning plus the concat-mode inpainting /
    super-resolution / semantic-synthesis workloads); raises with the
    offending target string for anything else."""
    mp = get(cfg, "model.params", {}) or {}
    unet = UNetModel(_unet_cfg(get(cfg, "model.params.unet_config.params",
                                   {}) or {}), dtype=dtype)

    fs = get(cfg, "model.params.first_stage_config", {}) or {}
    fs_target = fs.get("target", "")
    fs_params = fs.get("params", {}) or {}
    scale_factor = mp.get("scale_factor", 1.0)
    vae_cfg = _vae_cfg(fs_params, scale_factor)
    if fs_target.endswith("VQModelInterface"):
        first_stage = VQModelInterface(vae_cfg, n_embed=fs_params["n_embed"],
                                       dtype=dtype)
        fs_kind = "vq"
    elif fs_target.endswith("AutoencoderKL"):
        first_stage = AutoencoderKL(vae_cfg, dtype=dtype)
        fs_kind = "kl"
    else:
        raise ValueError(f"unsupported first_stage target {fs_target!r}")

    cs = get(cfg, "model.params.cond_stage_config", "__is_unconditional__")
    tokenizer = None
    cs_params = {}
    if cs in ("__is_unconditional__", None):
        cond_kind, cond_stage = "uncond", None
    elif cs == "__is_first_stage__":
        # inpainting_big: the cond stage IS the first stage encoder
        # (ddpm.py:550-553); conditioning input is the masked image
        cond_kind, cond_stage = "first_stage", None
    else:
        target = cs.get("target", "")
        cp = cs_params = cs.get("params", {}) or {}
        if target.endswith("ClassEmbedder"):
            cond_kind = "class"
            cond_stage = ClassEmbedder(n_classes=cp.get("n_classes", 1000),
                                       embed_dim=cp["embed_dim"])
        elif target.endswith("BERTEmbedder"):
            cond_kind = "bert"
            tokenizer = default_bert_tokenizer()
            bc = BERTTextConfig(vocab_size=cp.get("vocab_size", 30522),
                                max_seq_len=cp.get("max_seq_len", 77),
                                dim=cp["n_embed"], depth=cp["n_layer"])
            cond_stage = BERTTextEncoder(bc, dtype=dtype)
        elif target.endswith("FrozenCLIPEmbedder"):
            cond_kind = "clip"
            tokenizer = CLIPTokenizer.synthetic()
            cond_stage = CLIPTextEncoder(CLIPTextConfig.sd_v1(), dtype=dtype)
        elif target.endswith("SpatialRescaler"):
            # semantic_synthesis configs: rescale the one-hot segmentation
            # to latent resolution + 1x1 channel map, concat-conditioned
            cond_kind = "rescaler"
            cond_stage = SpatialRescaler(
                n_stages=cp.get("n_stages", 1),
                method=cp.get("method", "bilinear"),
                multiplier=cp.get("multiplier", 0.5),
                out_channels=cp.get("out_channels"),
                bias=cp.get("bias", False))
        elif target.endswith("Identity"):
            # bsr_sr: cond stage is torch.nn.Identity over the LR image
            cond_kind, cond_stage = "identity", None
        else:
            raise ValueError(f"unsupported cond_stage target {target!r}")

    # conditioning mode resolution (ddpm.py:459-465): explicit
    # conditioning_key wins, else concat_mode (default True) decides;
    # unconditional forces None
    if cond_kind == "uncond":
        cond_mode = "none"
    else:
        cond_mode = mp.get("conditioning_key") or \
            ("concat" if mp.get("concat_mode", True) else "crossattn")
    if cond_mode not in ("none", "concat", "crossattn"):
        # DiffusionWrapper also lists 'hybrid'/'adm' (ddpm.py:1535) but no
        # shipped config uses them — fail loudly rather than mis-condition
        raise NotImplementedError(
            f"conditioning_key {cond_mode!r} (no shipped reference config "
            "uses hybrid/adm)")

    return LegacyLDM(
        unet=unet, first_stage=first_stage, first_stage_kind=fs_kind,
        cond_kind=cond_kind, cond_stage=cond_stage, cond_mode=cond_mode,
        cond_stage_params=cs_params, tokenizer=tokenizer,
        image_size=mp.get("image_size", 64), channels=mp.get("channels", 3),
        timesteps=mp.get("timesteps", 1000),
        linear_start=mp.get("linear_start", 0.0015),
        linear_end=mp.get("linear_end", 0.0195),
        scale_factor=scale_factor, scale_by_std=mp.get("scale_by_std", False),
        loss_type=mp.get("loss_type", "l2"),
        cond_stage_key=mp.get("cond_stage_key", "caption"), raw=cfg)
