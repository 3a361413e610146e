"""embedding_neg_loss wiring + torch-oracle parity (VERDICT r2 #2).

The reference adds ``embedding_manager.embedding_neg_loss()`` into
``p_losses`` (ddpm.py:1112-1114); the loss itself is ``_calc_id_neg_loss``
(embedding_manager.py:492-529) whose final sum is
``loss_cosine*0 + loss_cls*0 + loss_reg*1 + loss_contra*1``.  Oracles:

* contra — the reference's OWN ``ContrastiveLoss`` module imported from
  /root/reference (its g-net weights bridged into our Flax g-net);
* cosine — the exact torch expressions from embedding_manager.py:501-505.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from celebbasis_tpu.core import manager as mgr
from celebbasis_tpu.core import losses

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")


def _mk_metas(rng, N, k, es_h, D):
    return rng.standard_normal((N, k, es_h, D)).astype(np.float32)


def test_contra_parity_vs_reference_module():
    """Our contra term == 1e-2 x the reference ContrastiveLoss on the same
    metas with the same g-net weights.  2-D per-face metas (es*h = 1): the
    only shape the reference module executes (contrastive_loss.py:22-26
    unpacks (N, D); training's 3-D metas crash it — deviation documented in
    mgr.id_neg_loss)."""
    from ldm.modules.id_embedding.contrastive_loss import ContrastiveLoss

    rng = np.random.default_rng(0)
    N, k, D = 3, 4, 16
    metas = _mk_metas(rng, N, k, 1, D)               # (N,k,1,D)
    cefs = rng.standard_normal((N, k, 2, 1, 8)).astype(np.float32)

    ref = ContrastiveLoss(meta_dim=D)
    with torch.no_grad():
        w = ref.g_net[1].weight.numpy().copy()       # (out,in)
        b = ref.g_net[1].bias.numpy().copy()
    gnet = losses.ContrastiveGNet(meta_dim=D)
    gnet_params = {"params": {"Dense_0": {"kernel": jnp.asarray(w.T),
                                          "bias": jnp.asarray(b)}}}

    ours, logs = mgr.id_neg_loss("contra", jnp.asarray(metas),
                                 jnp.asarray(cefs), gnet, gnet_params)
    # reference consumes a slot-major list of (N,D) tensors
    metas_t = [torch.from_numpy(metas[:, s, 0]) for s in range(k)]
    with torch.no_grad():
        expect = float(ref(metas_t)) * 1e-2
    np.testing.assert_allclose(float(ours), expect, rtol=1e-5)
    np.testing.assert_allclose(float(logs["loss_contra"]), expect, rtol=1e-5)


def test_cosine_parity_vs_torch_and_zero_weight():
    """'cosine' is computed exactly as embedding_manager.py:501-505 (logged)
    but weighted x0 in the total — the reference's own :529 sum."""
    rng = np.random.default_rng(1)
    N, k, es_h, D = 4, 4, 2, 12
    metas = _mk_metas(rng, N, k, es_h, D)
    cefs = rng.standard_normal((N, k, 2, 1, 8)).astype(np.float32)

    total, logs = mgr.id_neg_loss("cosine", jnp.asarray(metas),
                                  jnp.asarray(cefs))
    m = [torch.from_numpy(metas[:, s]) for s in range(k)]
    loss_cos = 1 - torch.cosine_similarity(m[0], m[-1])
    for m2 in m[1:-1]:
        loss_cos = loss_cos + torch.cosine_similarity(m[0], m2)
    np.testing.assert_allclose(float(logs["loss_cosine"]),
                               float(loss_cos.mean()), rtol=1e-5)
    np.testing.assert_allclose(float(total), 0.0, atol=1e-8)


def test_reg_flows_through_neg_loss():
    rng = np.random.default_rng(2)
    metas = _mk_metas(rng, 2, 2, 2, 8)
    cefs = rng.standard_normal((2, 2, 2, 1, 8)).astype(np.float32)
    total, logs = mgr.id_neg_loss("l2_reg", jnp.asarray(metas),
                                  jnp.asarray(cefs))
    expect = float(torch.norm(torch.from_numpy(
        cefs.reshape(-1, 2, 1, 8)), dim=1, p=2).mean()) * 1e-6
    np.testing.assert_allclose(float(total), expect, rtol=1e-5)


def test_unknown_loss_type_raises():
    with pytest.raises(ValueError, match="loss_type"):
        mgr.id_neg_loss("bogus", jnp.zeros((1, 2, 1, 4)),
                        jnp.zeros((1, 2, 1, 1, 4)))


# -- end-to-end: the train loss actually changes under 'contra' --------------

def test_train_loss_changes_with_contra():
    from celebbasis_tpu.core.basis import build_celeb_basis
    from celebbasis_tpu.core.meta_net import MetaIdNet, MetaNetConfig
    from celebbasis_tpu.pipeline import CelebBasisPipeline, PipelineConfig
    from celebbasis_tpu.text import CLIPTokenizer
    from celebbasis_tpu.train import step as tstep

    tok = CLIPTokenizer.synthetic(size=1024)
    cfg = PipelineConfig.tiny()
    pipe = CelebBasisPipeline(cfg, tok)
    params = pipe.init_params(jax.random.key(0), image_size=32)
    meta_cfg = MetaNetConfig.tiny()
    meta_cfg = type(meta_cfg)(**{**meta_cfg.__dict__,
                                 "inner_dim": cfg.basis.n_components,
                                 "token_dim": cfg.clip.width})
    meta = MetaIdNet(meta_cfg, dtype=jnp.float32)
    fs = meta_cfg.face_size
    basis0 = jnp.zeros((cfg.basis.num_embeds_per_token,
                        1 + cfg.basis.n_components, cfg.clip.width))
    meta_params = jax.jit(meta.init)(
        jax.random.key(1), jnp.zeros((1, fs, fs, 3)),
        jnp.zeros((1,), jnp.int32), basis0)
    meta_trainable, meta_frozen = tstep.split_meta_params(meta_params)
    basis = jnp.asarray(build_celeb_basis(
        ["Anne Hathaway", "Elon Musk", "Emma Watson", "Brad Pitt"],
        tok, pipe.token_table(params), cfg.basis))
    frozen = {"unet": params["unet"], "vae": params["vae"],
              "clip": params["clip"], "meta_frozen": meta_frozen}

    rng = np.random.default_rng(0)
    # k=4 face slots (diff_cnt=1 layout, 1+diff+1+diff): with k=2 the InfoNCE
    # is identically 0 (the sole candidate IS the positive) — true of the
    # reference as well
    B, k = 2, 4
    batch = {
        "image": jnp.asarray(rng.uniform(-1, 1, (B, 32, 32, 3)), jnp.float32),
        "tokens": jnp.asarray(tok(["a photo of a sks person"] * B)),
        "faces": jnp.asarray(rng.uniform(-1, 1, (B, k, fs, fs, 3)),
                             jnp.float32),
        "ids": jnp.asarray([[0, 1, 0, 1], [0, 1, 0, 1]], jnp.int32),
        "num_ids": jnp.ones((B,), jnp.int32),
    }
    mstate = mgr.init_state(pipe.manager_cfg, jax.random.key(2))
    key = jax.random.key(7)

    loss_none = tstep.make_loss_fn(pipe, meta, "none")
    l0, _ = jax.jit(loss_none)(meta_trainable, frozen, mstate, basis,
                               batch, key)

    gnet_params = tstep.init_gnet_params(pipe, jax.random.key(9))
    trainable = tstep.build_trainable(meta_trainable, gnet_params=gnet_params)
    loss_contra = tstep.make_loss_fn(pipe, meta, "contra")
    l1, (_, logs) = jax.jit(loss_contra)(trainable, frozen, mstate, basis,
                                         batch, key)
    assert float(l1) != float(l0)
    np.testing.assert_allclose(float(l1) - float(l0),
                               float(logs["loss_contra"]), rtol=1e-4)
    # gradients reach the g-net (it is in the optimizer group,
    # embedding_manager.py:432-436)
    grads, _ = jax.grad(loss_contra, has_aux=True)(
        trainable, frozen, mstate, basis, batch, key)
    gmax = max(float(np.abs(np.asarray(x)).max())
               for x in jax.tree.leaves(grads["gnet"]))
    assert gmax > 0

    # a full optimizer step runs with the keyed trainable pytree
    opt = tstep.make_optimizer(1e-3)
    step_fn = jax.jit(tstep.make_train_step(pipe, meta, opt, "contra"))
    state = tstep.init_train_state(jax.random.key(3), trainable, opt, mstate)
    state, logs = step_fn(state, frozen, basis, batch)
    assert np.isfinite(float(logs["loss"]))


def test_cached_loss_contra_wiring():
    """The cached (fast-personalization) loss applies the contra term too."""
    from celebbasis_tpu.core.meta_net import MetaIdNet, MetaNetConfig
    from celebbasis_tpu.pipeline import CelebBasisPipeline, PipelineConfig
    from celebbasis_tpu.text import CLIPTokenizer
    from celebbasis_tpu.train import step as tstep

    tok = CLIPTokenizer.synthetic(size=1024)
    cfg = PipelineConfig.tiny()
    pipe = CelebBasisPipeline(cfg, tok)
    params = pipe.init_params(jax.random.key(0), image_size=32)
    meta_cfg = MetaNetConfig.tiny()
    meta_cfg = type(meta_cfg)(**{**meta_cfg.__dict__,
                                 "inner_dim": cfg.basis.n_components,
                                 "token_dim": cfg.clip.width})
    meta = MetaIdNet(meta_cfg, dtype=jnp.float32)
    fs = meta_cfg.face_size
    basis = jnp.zeros((cfg.basis.num_embeds_per_token,
                       1 + cfg.basis.n_components, cfg.clip.width))
    meta_params = jax.jit(meta.init)(
        jax.random.key(1), jnp.zeros((1, fs, fs, 3)),
        jnp.zeros((1,), jnp.int32), basis)
    meta_trainable, meta_frozen = tstep.split_meta_params(meta_params)
    frozen = {"unet": params["unet"], "vae": params["vae"],
              "clip": params["clip"], "meta_frozen": meta_frozen}
    rng = np.random.default_rng(0)
    B, k = 2, 4
    lat = 32 // pipe.latent_factor
    batch = {
        "latent_mean": jnp.asarray(rng.standard_normal((B, lat, lat, 4)),
                                   jnp.float32),
        "latent_logvar": jnp.zeros((B, lat, lat, 4)),
        "fr_feats": jnp.asarray(rng.standard_normal((B, k, meta_cfg.fr_dim)),
                                jnp.float32),
        "tokens": jnp.asarray(tok(["a photo of a sks person"] * B)),
        "ids": jnp.asarray([[0, 1, 0, 1]] * B, jnp.int32),
        "num_ids": jnp.ones((B,), jnp.int32),
    }
    mstate = mgr.init_state(pipe.manager_cfg, jax.random.key(2))
    key = jax.random.key(7)
    l0, _ = jax.jit(tstep.make_cached_loss_fn(pipe, meta, "none"))(
        meta_trainable, frozen, mstate, basis, batch, key)
    gnet_params = tstep.init_gnet_params(pipe, jax.random.key(9))
    trainable = tstep.build_trainable(meta_trainable, gnet_params=gnet_params)
    loss_fn = tstep.make_cached_loss_fn(pipe, meta, "contra")
    l1, (_, logs) = jax.jit(loss_fn)(trainable, frozen, mstate, basis,
                                     batch, key)
    assert float(l1) != float(l0)
    np.testing.assert_allclose(float(l1) - float(l0),
                               float(logs["loss_contra"]), rtol=1e-4)
