"""Optimization smoke: the coefficient-only path must actually learn.

Builds a tiny pipeline whose denoising target depends on the injected
identity embedding; 40 AdamW steps through the frozen stack must cut the
eps-MSE loss substantially (validates the full gradient chain loss -> UNet ->
context -> CLIP -> injected slots -> MLP, SURVEY §7.3 hard part #2)."""
import jax
import jax.numpy as jnp
import numpy as np

from celebbasis_tpu.core import manager as mgr
from celebbasis_tpu.core.meta_net import MetaIdNet, MetaNetConfig
from celebbasis_tpu.core.basis import build_celeb_basis
from celebbasis_tpu.pipeline import CelebBasisPipeline, PipelineConfig
from celebbasis_tpu.text import CLIPTokenizer
from celebbasis_tpu.train import step as tstep


def test_loss_decreases_over_training():
    tok = CLIPTokenizer.synthetic(size=1024)
    cfg = PipelineConfig.tiny()
    pipe = CelebBasisPipeline(cfg, tok)
    params = pipe.init_params(jax.random.key(0), image_size=32)
    # non-degenerate UNet: bump the zero-init output convs so the prediction
    # depends on the context (and thus on the injected embedding)
    def bump(p):
        return jax.tree.map(
            lambda a: a + 0.05 if a.ndim >= 2 else a, p)
    params["unet"] = bump(params["unet"])

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
        ["Anne Hathaway", "Elon Musk", "Emma Watson", "Brad Pitt"],
        tok, pipe.token_table(params), cfg.basis))
    frozen = {"unet": params["unet"], "vae": params["vae"],
              "clip": params["clip"], "meta_frozen": meta_frozen}

    opt = tstep.make_optimizer(3e-3)
    step_fn = jax.jit(tstep.make_train_step(pipe, meta, opt),
                      donate_argnums=(0,))
    mstate = mgr.init_state(pipe.manager_cfg, jax.random.key(2))
    state = tstep.init_train_state(jax.random.key(3), trainable, opt, mstate)

    rng = np.random.default_rng(0)
    B, k, fs = 2, 2, meta_cfg.face_size
    batch = {
        "image": jnp.asarray(rng.uniform(-1, 1, (B, 32, 32, 3)), jnp.float32),
        "tokens": jnp.asarray(tok(["a photo of a sks person"] * B)),
        "faces": jnp.asarray(rng.uniform(-1, 1, (B, k, fs, fs, 3)),
                             jnp.float32),
        "ids": jnp.asarray([[0, 0], [0, 0]], jnp.int32),
        "num_ids": jnp.ones((B,), jnp.int32),
    }
    # pin the rng each step -> fixed (t, noise): a stationary objective the
    # 1024-coefficient path must descend. With random frozen weights most of
    # the loss is context-independent, so assert a steady monotone decrease
    # rather than a large drop.
    losses = []
    for _ in range(40):
        state = state._replace(rng=jax.random.key(7))
        state, logs = step_fn(state, frozen, basis, batch)
        losses.append(float(logs["loss"]))
    assert np.isfinite(losses).all()
    diffs = np.diff(losses)
    assert (diffs < 0).mean() > 0.9, "loss not descending"
    assert losses[0] - np.mean(losses[-5:]) > 0.1, (losses[0], losses[-5:])
    # the momentum dictionary for id 0 tracked the predictions
    moved = np.abs(np.asarray(state.manager_state.id_coefficients[0])).sum()
    assert moved > 0


def test_manager_embedding_and_image_modes():
    cfg = mgr.ManagerConfig(placeholder_token_ids=(500, 501), max_ids=3,
                            num_es=2, heads=1, inner_dim=4, token_dim=8,
                            test_mode="embedding")
    state = mgr.init_state(cfg, jax.random.key(0))
    tokens = jnp.asarray([[49406, 500, 7, 49407, 49407, 49407]], jnp.int32)
    embeds = jnp.asarray(np.random.default_rng(1).standard_normal((1, 6, 8)),
                         jnp.float32)
    basis = jnp.zeros((2, 5, 8))
    ids = jnp.asarray([[1, 0]])
    out = mgr.test_inject(cfg, state, basis, tokens, embeds, ids,
                          jnp.asarray([1]))
    np.testing.assert_allclose(np.asarray(out[0, 1]),
                               np.asarray(state.id_embeddings[1, 0]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[0, 2]),
                               np.asarray(state.id_embeddings[1, 1]),
                               atol=1e-6)

    cfg_img = cfg._replace(test_mode="image") if hasattr(cfg, "_replace") \
        else mgr.ManagerConfig(**{**cfg.__dict__, "test_mode": "image"})
    pred_z = jnp.asarray(np.random.default_rng(2).standard_normal((1, 2, 2, 8)),
                         jnp.float32)
    out2 = mgr.test_inject(cfg_img, state, basis, tokens, embeds, ids,
                           jnp.asarray([1]), pred_z=pred_z)
    np.testing.assert_allclose(np.asarray(out2[0, 1]),
                               np.asarray(pred_z[0, 0, 0]), atol=1e-6)
