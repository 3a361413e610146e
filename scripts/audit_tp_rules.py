#!/usr/bin/env python
"""Audit the tensor-parallel sharding rules: collective counts per variant.

Compiles the full personalization train step on a virtual 4x2 (data, model)
CPU mesh under three parameter-sharding variants and reports the collective
ops XLA inserted (from the compiled HLO):

  dp-only    — every param replicated (the reference's DDP equivalent)
  tp-attn    — Megatron attention/MLP rules only
  tp-full    — + conv channel rules (round-1 _TP_RULES)

A conv rule that only forces activation reshards shows up as extra
all-gathers with no all-reduce savings; that evidence drives which rules
ship (VERDICT r1 weak #4).

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python scripts/audit_tp_rules.py
"""
import os
import re
import sys

os.environ.setdefault("CELEBBASIS_PLATFORM", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from celebbasis_tpu.parallel import mesh as pmesh  # noqa: E402


def build_setup():
    from celebbasis_tpu.core import manager as mgr
    from celebbasis_tpu.core.basis import build_celeb_basis
    from celebbasis_tpu.core.meta_net import MetaIdNet, MetaNetConfig
    from celebbasis_tpu.pipeline import CelebBasisPipeline, PipelineConfig
    from celebbasis_tpu.text import CLIPTokenizer
    from celebbasis_tpu.train import step as tstep

    tok = CLIPTokenizer.synthetic(size=1024)
    cfg = PipelineConfig.tiny()
    pipe = CelebBasisPipeline(cfg, tok)
    img = 32
    params = pipe.init_params(jax.random.key(0), image_size=img)
    meta_cfg = MetaNetConfig.tiny()
    meta_cfg = type(meta_cfg)(**{**meta_cfg.__dict__,
                                 "inner_dim": cfg.basis.n_components,
                                 "token_dim": cfg.clip.width})
    meta = MetaIdNet(meta_cfg, dtype=jnp.float32)
    faces0 = jnp.zeros((1, meta_cfg.face_size, meta_cfg.face_size, 3))
    basis0 = jnp.zeros((cfg.basis.num_embeds_per_token,
                        1 + cfg.basis.n_components, cfg.clip.width))
    meta_params = jax.jit(meta.init)(jax.random.key(1), faces0,
                                     jnp.zeros((1,), jnp.int32), basis0)
    trainable, meta_frozen = tstep.split_meta_params(meta_params)
    basis = jnp.asarray(build_celeb_basis(
        ["Anne Hathaway", "Elon Musk", "Emma Watson"], tok,
        pipe.token_table(params), cfg.basis))
    frozen = {"unet": params["unet"], "vae": params["vae"],
              "clip": params["clip"], "meta_frozen": meta_frozen}
    opt = tstep.make_optimizer(1e-2)
    step_fn = tstep.make_train_step(pipe, meta, opt)
    mstate = mgr.init_state(pipe.manager_cfg, jax.random.key(2))
    state = tstep.init_train_state(jax.random.key(3), trainable, opt, mstate)
    B, k = 8, 2
    batch = {
        "image": jnp.zeros((B, img, img, 3), jnp.float32),
        "tokens": jnp.asarray(np.tile(tok(["a photo of a sks person"]),
                                      (B, 1))),
        "faces": jnp.zeros((B, k, meta_cfg.face_size, meta_cfg.face_size, 3)),
        "ids": jnp.zeros((B, k), jnp.int32),
        "num_ids": jnp.ones((B,), jnp.int32),
    }
    return step_fn, state, frozen, basis, batch


COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all")


def count_collectives(hlo_text):
    counts = {}
    for op in COLLECTIVES:
        # start-variants fuse with the base op name in HLO text
        n = len(re.findall(rf"\b{op}(-start)?\(", hlo_text)) or \
            len(re.findall(rf"= \S+ {op}", hlo_text))
        counts[op] = n
    return counts


def main():
    step_fn, state, frozen, basis, batch = build_setup()
    mesh = pmesh.make_mesh(n_data=4, n_model=2)
    results = {}
    for variant, use_tp, conv_rules in (("dp-only", False, False),
                                        ("tp-attn", True, False),
                                        ("tp-full", True, True)):
        with jax.set_mesh(mesh):
            frozen_sh = pmesh.shard_params(frozen, mesh, use_tp=use_tp,
                                           conv_tp=conv_rules)
            batch_sh = pmesh.shard_batch(batch, mesh)
            state_sh = jax.device_put(state, pmesh.replicated(mesh))
            basis_sh = jax.device_put(basis, pmesh.replicated(mesh))
            lowered = jax.jit(step_fn).lower(state_sh, frozen_sh,
                                             basis_sh, batch_sh)
            compiled = lowered.compile()
            text = compiled.as_text()
        counts = count_collectives(text)
        results[variant] = counts
        total = sum(counts.values())
        print(f"{variant:8s}: total={total:4d}  " +
              "  ".join(f"{k}={v}" for k, v in counts.items()))
    extra = (sum(results["tp-full"].values())
             - sum(results["tp-attn"].values()))
    print(f"\nconv rules add {extra} collectives on top of attention/MLP TP")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
