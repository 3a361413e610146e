"""Tensor-parallel sampling parity (cli/txt2img --tp) on the virtual mesh.

The Megatron param-sharding rules (parallel/mesh.py::_TP_RULES) were
collective-audited and numerics-pinned for the *training* step; this pins the
*sampling* graph: the full txt2img program (conditioning -> DDIM scan -> VAE
decode) over a (data, model) mesh must reproduce the single-device pixels.
Sharding only changes XLA's partitioning/reduction schedule, never the math.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from celebbasis_tpu.core import manager as mgr
from test_round3_fixes import _tiny_assembly


def _sample_args(pipe, make_batch):
    batch = make_batch(0)
    tokens = jnp.asarray(batch["tokens"])
    uncond = jnp.asarray(pipe.tokenizer([""] * tokens.shape[0]))
    return tokens, uncond, jnp.asarray(batch["ids"]), jnp.asarray(
        batch["num_ids"])


def test_tp_sampling_matches_replicated():
    from celebbasis_tpu.parallel import mesh as pmesh

    pipe, meta, trainable, frozen, basis, make_batch = _tiny_assembly()
    params = {"unet": frozen["unet"], "vae": frozen["vae"],
              "clip": frozen["clip"]}
    mstate = mgr.init_state(pipe.manager_cfg, jax.random.key(2))
    tokens, uncond, ids, num_ids = _sample_args(pipe, make_batch)
    rng = jax.random.key(7)
    fn = pipe.make_txt2img_fn(num_steps=3, guidance_scale=5.0, image_size=32)

    ref = np.asarray(fn(params, mstate, basis, tokens, uncond, ids,
                        num_ids, rng))

    # the CLI's --mesh 2 --tp 4 layout: batch over 'data', Megatron
    # attention/MLP sharding over 'model'
    mesh = pmesh.make_mesh(n_data=2, n_model=4)
    with jax.set_mesh(mesh):
        params_sh = pmesh.shard_params(params, mesh, use_tp=True)
        tok_sh, unc_sh, ids_sh, nid_sh = pmesh.shard_batch(
            (tokens, uncond, ids, num_ids), mesh)
        mstate_sh = jax.device_put(mstate, pmesh.replicated(mesh))
        basis_sh = jax.device_put(basis, pmesh.replicated(mesh))
        out = np.asarray(fn(params_sh, mstate_sh, basis_sh, tok_sh, unc_sh,
                            ids_sh, nid_sh, rng))

    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=2e-4)
