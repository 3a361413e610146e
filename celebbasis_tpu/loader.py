"""Run assembly: spec + checkpoints -> pipeline, params, basis, meta-net.

The TPU-side equivalent of the reference's ``load_model_from_config`` +
``instantiate_*`` chain (`/root/reference/main_id_embed.py:25-44`,
``ddpm.py:478-528``): builds the model bundle, bridges pretrained torch
checkpoints when given (random-init otherwise — weights are not vendored in
this environment), constructs/caches the celeb basis, and wires the MetaIdNet.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from celebbasis_tpu.core import manager as mgr
from celebbasis_tpu.core.basis import build_celeb_basis_cached, build_celeb_basis
from celebbasis_tpu.core.meta_net import MetaIdNet, MetaNetConfig
from celebbasis_tpu.models.iresnet import IResNetConfig
from celebbasis_tpu.pipeline import CelebBasisPipeline, PipelineConfig
from celebbasis_tpu.text.tokenizer import CLIPTokenizer, default_tokenizer
from celebbasis_tpu.utils import bridge
from celebbasis_tpu.utils.config import RunSpec

# fallback names when the celeb list file is absent (offline test envs)
_FALLBACK_NAMES = [
    "Anne Hathaway", "Barack Obama", "Elon Musk", "Robert Downey",
    "Taylor Swift", "Emma Watson", "Brad Pitt", "Scarlett Johansson",
    "Leonardo DiCaprio", "Oprah Winfrey", "Keanu Reeves", "Rihanna",
    "Tom Hanks", "Beyonce Knowles", "Morgan Freeman", "Natalie Portman",
    "Will Smith", "Angelina Jolie", "Denzel Washington", "Meryl Streep",
]


@dataclass
class Assembled:
    spec: RunSpec
    tokenizer: CLIPTokenizer
    pipeline: CelebBasisPipeline
    params: Dict                     # {"unet","vae","clip"}
    basis: jnp.ndarray               # (es, 1+inner, width)
    meta_net: MetaIdNet
    meta_params: Dict
    manager_state: mgr.ManagerState


def pipeline_config_from_spec(spec: RunSpec, dtype=jnp.bfloat16
                              ) -> PipelineConfig:
    return PipelineConfig(
        unet=spec.unet, vae=spec.vae, clip=spec.clip, basis=spec.basis,
        placeholder_strings=spec.placeholder_strings,
        scale_factor=spec.scale_factor, timesteps=spec.timesteps,
        linear_start=spec.linear_start, linear_end=spec.linear_end,
        dtype=dtype)


def assemble(spec: RunSpec, *, sd_ckpt: Optional[str] = None,
             fr_ckpt: Optional[str] = None,
             vocab_path: Optional[str] = None,
             embedding_ckpt: Optional[str] = None,
             image_size: int = 512, seed: int = 0,
             dtype=jnp.bfloat16, cache_dir: Optional[str] = ".cache/celeb_basis",
             param_dtype=None) -> Assembled:
    """``param_dtype=jnp.bfloat16`` casts the frozen SD params (unet/vae/clip)
    to bf16 *storage* — inference-only: halves their HBM read traffic
    (+4.5% on the DDIM bench, utils/precision.py).  Training passes None
    and keeps fp32 masters.  The celeb basis is always built from the fp32
    token table before any cast."""
    tokenizer = default_tokenizer(vocab_path)
    if tokenizer.vocab_size != spec.clip.vocab_size:
        # offline synthetic fallback must match the model's embedding table
        tokenizer = CLIPTokenizer.synthetic(spec.clip.vocab_size)
    pcfg = pipeline_config_from_spec(spec, dtype)
    pipe = CelebBasisPipeline(pcfg, tokenizer)
    # align the pipeline's manager config with the spec (momentum/test_mode/...)
    pipe.manager_cfg = manager_config_from_spec(spec, pipe)
    rng = jax.random.key(seed)
    params = pipe.init_params(rng, image_size=image_size)
    if sd_ckpt:
        params = bridge.load_sd_checkpoint(sd_ckpt, spec.unet)
        print(f"[loader] bridged SD checkpoint {sd_ckpt}")

    # celeb basis (cached; W1)
    table = pipe.token_table(params)
    if os.path.exists(spec.celeb_txt):
        basis = build_celeb_basis_cached(spec.celeb_txt, tokenizer, table,
                                         spec.basis, cache_dir=cache_dir)
    else:
        print(f"[loader] celeb list {spec.celeb_txt!r} not found — "
              f"using builtin fallback names")
        basis = build_celeb_basis(_FALLBACK_NAMES, tokenizer, table, spec.basis)

    # MetaIdNet
    meta_cfg = MetaNetConfig(
        inner_dim=spec.meta_inner_dim, num_es=spec.num_embeds_per_token,
        heads=spec.meta_heads, mlp_depth=spec.meta_mlp_depth,
        token_dim=spec.clip.width, use_rm_mlp=spec.use_rm_mlp,
        num_ids=spec.max_ids, iresnet=IResNetConfig.r100())
    meta = MetaIdNet(meta_cfg, dtype=dtype)
    faces0 = jnp.zeros((1, 112, 112, 3))
    basis0 = jnp.zeros((spec.num_embeds_per_token,
                        1 + spec.meta_inner_dim, spec.clip.width))
    meta_params = jax.jit(meta.init)(jax.random.fold_in(rng, 7), faces0,
                                     jnp.zeros((1,), jnp.int32), basis0)
    if fr_ckpt:
        from celebbasis_tpu.utils.pt_io import load_pt
        fr_state = load_pt(fr_ckpt)
        fr_params = bridge.convert_iresnet(
            {k: np.asarray(v, np.float32) for k, v in fr_state.items()})
        meta_params = {"params": {**meta_params["params"],
                                  "fr_net": fr_params["params"]}}
        print(f"[loader] bridged CosFace backbone {fr_ckpt}")

    # manager state, optionally from a trained embeddings_gs-*.pt
    m_cfg = manager_config_from_spec(spec, pipe)
    init_emb = None
    if spec.initializer_words:
        tok_id = tokenizer.tokenize(spec.initializer_words[0])[0]
        init_emb = jnp.asarray(table[tok_id])
    state = mgr.init_state(m_cfg, jax.random.fold_in(rng, 9), init_emb)
    if embedding_ckpt:
        state = mgr.load_checkpoint(m_cfg, embedding_ckpt, state)
        print(f"[loader] loaded personalization checkpoint {embedding_ckpt}")

    if param_dtype is not None:
        from celebbasis_tpu.utils.precision import cast_float_params
        params = cast_float_params(params, param_dtype)

    return Assembled(spec, tokenizer, pipe, params, jnp.asarray(basis),
                     meta, meta_params, state)


def manager_config_from_spec(spec: RunSpec, pipe: CelebBasisPipeline
                             ) -> mgr.ManagerConfig:
    return mgr.ManagerConfig(
        placeholder_token_ids=pipe.manager_cfg.placeholder_token_ids,
        max_ids=spec.max_ids, num_es=spec.num_embeds_per_token,
        heads=spec.meta_heads, inner_dim=spec.meta_inner_dim,
        token_dim=spec.clip.width, momentum=spec.momentum,
        test_mode=spec.test_mode, loss_type=spec.loss_type,
        save_fp16=spec.save_fp16)
