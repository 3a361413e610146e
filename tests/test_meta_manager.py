"""Tests for MetaIdNet, warp ops, and the functional embedding manager."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from celebbasis_tpu.core import manager as mgr
from celebbasis_tpu.core.meta_net import (EqualLinear, MetaIdNet,
                                          MetaNetConfig, StyleVectorizer)
from celebbasis_tpu.ops.warp import (affine_warp_resize,
                                     bilinear_resize_align_corners,
                                     grid_sample_bilinear)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


# -- warp parity vs torch ---------------------------------------------------

def test_grid_sample_matches_torch():
    rng = np.random.default_rng(0)
    img = rng.standard_normal((9, 11, 3)).astype(np.float32)
    grid = (rng.uniform(-1.2, 1.2, (5, 7, 2))).astype(np.float32)
    ours = np.asarray(grid_sample_bilinear(jnp.asarray(img), jnp.asarray(grid)))
    ref = F.grid_sample(torch.from_numpy(img).permute(2, 0, 1)[None],
                        torch.from_numpy(grid)[None],
                        mode="bilinear", padding_mode="zeros",
                        align_corners=True)[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_affine_warp_resize_matches_torch():
    """Our fused warp+resize == torch affine_grid+grid_sample+interpolate."""
    rng = np.random.default_rng(1)
    img = rng.standard_normal((32, 32, 3)).astype(np.float32)
    M = np.array([[1.07695457, -0.03625215, -1.56352194 / 512],
                  [0.03625215, 1.07695457, -5.32134629 / 512]], np.float32)
    ours = np.asarray(affine_warp_resize(jnp.asarray(img), jnp.asarray(M),
                                         (12, 12)))
    timg = torch.from_numpy(img).permute(2, 0, 1)[None]
    grid = F.affine_grid(torch.from_numpy(M)[None], size=timg.size(),
                         align_corners=True)
    warped = F.grid_sample(timg, grid, align_corners=True, mode="bilinear",
                           padding_mode="zeros")
    ref = F.interpolate(warped, size=12, mode="bilinear",
                        align_corners=True)[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_bilinear_resize_matches_torch():
    rng = np.random.default_rng(2)
    img = rng.standard_normal((17, 23, 2)).astype(np.float32)
    ours = np.asarray(bilinear_resize_align_corners(jnp.asarray(img), (8, 10)))
    ref = F.interpolate(torch.from_numpy(img).permute(2, 0, 1)[None],
                        size=(8, 10), mode="bilinear",
                        align_corners=True)[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


# -- EqualLinear / StyleVectorizer vs torch semantics ----------------------

def test_equal_linear_matches_torch_semantics():
    lin = EqualLinear(8, lr_mul=0.5)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((4, 6)),
                    jnp.float32)
    params = lin.init(jax.random.key(0), x)
    out = lin.apply(params, x)
    w = np.asarray(params["params"]["weight"])
    b = np.asarray(params["params"]["bias"])
    ref = F.leaky_relu(torch.from_numpy(np.asarray(x)) @
                       torch.from_numpy(w * 0.5).t() +
                       torch.from_numpy(b * 0.5), 0.2).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


# -- MetaIdNet -------------------------------------------------------------

@pytest.fixture(scope="module")
def meta_setup():
    cfg = MetaNetConfig.tiny()
    net = MetaIdNet(cfg, dtype=jnp.float32)
    faces = jnp.asarray(np.random.default_rng(4).uniform(
        -1, 1, (2, cfg.face_size, cfg.face_size, 3)), jnp.float32)
    basis = jnp.asarray(np.random.default_rng(5).standard_normal(
        (cfg.num_es, 1 + cfg.inner_dim, cfg.token_dim)), jnp.float32)
    params = jax.jit(net.init)(jax.random.key(0), faces,
                               jnp.zeros((2,), jnp.int32), basis)
    return cfg, net, params, faces, basis


def test_meta_net_shapes(meta_setup):
    cfg, net, params, faces, basis = meta_setup
    z, coeff = jax.jit(net.apply)(params, faces, jnp.array([0, 1]), basis)
    assert z.shape == (2, cfg.num_es * cfg.heads, cfg.token_dim)
    assert coeff.shape == (2, cfg.num_es, cfg.heads, cfg.inner_dim)
    # coefficients live on the unit sphere (VectorNorm, meta_net.py:168)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(coeff), axis=-1),
                               1.0, atol=1e-5)
    # z = coeff · P + mean
    ref = np.einsum("behk,ekc->behc", np.asarray(coeff),
                    np.asarray(basis[:, 1:])) + np.asarray(basis[:, 0])[None, :, None]
    np.testing.assert_allclose(np.asarray(z),
                               ref.reshape(2, -1, cfg.token_dim), atol=1e-4)


def test_meta_net_grads_only_mlp(meta_setup):
    """Gradients flow to the MLP only — the FR backbone is frozen
    (reference no_grad, meta_net.py:253-264)."""
    cfg, net, params, faces, basis = meta_setup

    def loss(p):
        z, _ = net.apply(p, faces, jnp.array([0, 1]), basis)
        return (z ** 2).sum()

    g = jax.jit(jax.grad(loss))(params)
    flat = jax.tree_util.tree_flatten_with_path(g)[0]
    for path, leaf in flat:
        name = jax.tree_util.keystr(path)
        if "mlp" in name:
            assert np.abs(np.asarray(leaf)).sum() > 0, f"no grad at {name}"
        else:
            np.testing.assert_array_equal(np.asarray(leaf), 0.0,
                                          err_msg=f"grad leaked into {name}")


def test_multi_faces_folding(meta_setup):
    cfg, net, params, faces, basis = meta_setup
    fm = jnp.stack([faces, faces[::-1]], axis=1)  # (2, 2, H, W, 3)
    ids = jnp.array([[0, 1], [1, 0]])
    z, coeff = jax.jit(lambda p, f, i, b: net.apply(
        p, f, i, b, method=MetaIdNet.multi_faces))(params, fm, ids, basis)
    assert z.shape[:2] == (2, 2) and coeff.shape[:2] == (2, 2)
    z_single, _ = net.apply(params, faces, jnp.array([0, 1]), basis)
    np.testing.assert_allclose(np.asarray(z[:, 0]), np.asarray(z_single),
                               atol=1e-5)


# -- manager ----------------------------------------------------------------

def _mgr_cfg():
    return mgr.ManagerConfig(placeholder_token_ids=(500, 501), max_ids=4,
                             num_es=2, heads=1, inner_dim=8, token_dim=16,
                             momentum=0.9)


def test_momentum_update_sequential_compounding():
    cfg = _mgr_cfg()
    state = mgr.init_state(cfg, jax.random.key(0))
    z = jnp.ones((2, cfg.reps, cfg.token_dim))
    c = jnp.ones((2, cfg.num_es, cfg.heads, cfg.inner_dim))
    ids = jnp.array([1, 1])  # same id twice -> update must compound
    new = mgr.momentum_update(cfg, state, z, c, ids,
                              jnp.array([True, True]))
    m = cfg.momentum
    expect = m * (m * np.asarray(state.id_embeddings[1]) + (1 - m)) + (1 - m)
    np.testing.assert_allclose(np.asarray(new.id_embeddings[1]), expect,
                               rtol=1e-5)
    # untouched ids unchanged
    np.testing.assert_array_equal(np.asarray(new.id_embeddings[0]),
                                  np.asarray(state.id_embeddings[0]))


def test_test_inject_coefficient_mode():
    cfg = _mgr_cfg()
    state = mgr.init_state(cfg, jax.random.key(0))
    basis = jnp.asarray(np.random.default_rng(6).standard_normal(
        (cfg.num_es, 1 + cfg.inner_dim, cfg.token_dim)), jnp.float32)
    tokens = jnp.array([[49406, 500, 7, 49407, 49407, 49407]], jnp.int32)
    embeds = jnp.asarray(np.random.default_rng(7).standard_normal(
        (1, 6, cfg.token_dim)), jnp.float32)
    ids = jnp.array([[2, 0]])
    out = mgr.test_inject(cfg, state, basis, tokens, embeds, ids,
                          jnp.array([1]))
    z = mgr.reconstruct_z(cfg, state.id_coefficients[2], basis)
    np.testing.assert_allclose(np.asarray(out[0, 1]), np.asarray(z[0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[0, 2]), np.asarray(z[1]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[0, 3]), np.asarray(embeds[0, 2]),
                               atol=1e-6)


def test_checkpoint_roundtrip_reference_schema(tmp_path):
    cfg = _mgr_cfg()
    state = mgr.init_state(cfg, jax.random.key(1))
    p = tmp_path / "embeddings_gs-800.pt"
    mgr.save_checkpoint(cfg, state, str(p))
    loaded = mgr.load_checkpoint(cfg, str(p))
    np.testing.assert_allclose(np.asarray(loaded.id_coefficients),
                               np.asarray(state.id_coefficients), atol=1e-7)
    # the file must load in real torch with the reference's schema
    ck = torch.load(str(p), weights_only=True)
    assert isinstance(ck["id_coefficients"], list)
    assert len(ck["id_coefficients"]) == cfg.max_ids
    assert tuple(ck["id_coefficients"][0].shape) == (2, 1, 8)
