"""Shape/dtype/structure tests for the Flax model zoo (tiny configs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from celebbasis_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
from celebbasis_tpu.models.unet import UNetConfig, UNetModel
from celebbasis_tpu.models.vae import AutoencoderKL, VAEConfig


def test_clip_text_shapes():
    cfg = CLIPTextConfig.tiny()
    model = CLIPTextEncoder(cfg, dtype=jnp.float32)
    ids = jnp.zeros((2, 77), jnp.int32).at[:, 0].set(5)
    params = jax.jit(model.init)(jax.random.key(0), ids)
    out = jax.jit(model.apply)(params, ids)
    assert out.shape == (2, 77, cfg.width)
    assert out.dtype == jnp.float32

    # injection hook: token_embed -> encode must equal __call__
    embeds = jax.jit(lambda p, i: model.apply(p, i, method=CLIPTextEncoder.token_embed))(params, ids)
    assert embeds.shape == (2, 77, cfg.width)
    out2 = jax.jit(lambda p, e: model.apply(p, e, method=CLIPTextEncoder.encode))(params, embeds)
    np.testing.assert_allclose(out, out2, atol=1e-6)


@pytest.mark.smoke
def test_clip_causal():
    """Causality: token t's hidden state must not depend on tokens > t."""
    cfg = CLIPTextConfig.tiny()
    model = CLIPTextEncoder(cfg, dtype=jnp.float32)
    ids = jax.random.randint(jax.random.key(1), (1, 77), 0, cfg.vocab_size)
    params = jax.jit(model.init)(jax.random.key(0), ids)
    apply = jax.jit(model.apply)
    out1 = apply(params, ids)
    ids2 = ids.at[0, 40].set((ids[0, 40] + 1) % cfg.vocab_size)
    out2 = apply(params, ids2)
    np.testing.assert_allclose(out1[0, :40], out2[0, :40], atol=1e-5)
    assert not np.allclose(out1[0, 40:], out2[0, 40:], atol=1e-5)


def test_unet_shapes():
    cfg = UNetConfig.tiny()
    model = UNetModel(cfg, dtype=jnp.float32)
    x = jnp.ones((2, 16, 16, 4))
    t = jnp.array([10, 500])
    ctx = jnp.ones((2, 77, cfg.context_dim))
    params = jax.jit(model.init)(jax.random.key(0), x, t, ctx)
    out = jax.jit(model.apply)(params, x, t, ctx)
    assert out.shape == (2, 16, 16, 4)
    assert out.dtype == jnp.float32
    # zero-init output conv -> initial eps prediction is exactly zero
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_unet_context_dependence():
    cfg = UNetConfig.tiny()
    model = UNetModel(cfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(1), (1, 16, 16, 4))
    t = jnp.array([100])
    ctx = jax.random.normal(jax.random.key(2), (1, 77, cfg.context_dim))
    params = jax.jit(model.init)(jax.random.key(0), x, t, ctx)

    # perturb mid-layer weights away from zero so output depends on input
    def bump(p):
        return jax.tree.map(lambda a: a + 0.01 if a.ndim >= 2 else a, p)

    params = bump(params)
    apply = jax.jit(model.apply)
    o1 = apply(params, x, t, ctx)
    o2 = apply(params, x, t, ctx * 2.0)
    assert not np.allclose(o1, o2, atol=1e-6)


def test_vae_roundtrip_shapes():
    cfg = VAEConfig.tiny()  # f=2 downsampling (2 levels)
    model = AutoencoderKL(cfg, dtype=jnp.float32)
    x = jnp.ones((1, 32, 32, 3))
    params = jax.jit(model.init)(jax.random.key(0), x, jax.random.key(1))
    mean, logvar = jax.jit(lambda p, x: model.apply(p, x, method=AutoencoderKL.encode))(params, x)
    assert mean.shape == (1, 16, 16, 4) and logvar.shape == (1, 16, 16, 4)
    img = jax.jit(lambda p, z: model.apply(p, z, method=AutoencoderKL.decode))(params, mean)
    assert img.shape == (1, 32, 32, 3)
    assert img.dtype == jnp.float32


@pytest.mark.smoke
def test_vae_sd_downsample_factor():
    """SD config must be f=8: 4 levels, 3 downsamples."""
    cfg = VAEConfig.sd_v1()
    model = AutoencoderKL(cfg, dtype=jnp.float32)
    x = jnp.ones((1, 64, 64, 3))
    params = jax.jit(model.init)(jax.random.key(0), x, jax.random.key(1))
    mean, _ = jax.jit(lambda p, x: model.apply(p, x, method=AutoencoderKL.encode))(params, x)
    assert mean.shape == (1, 8, 8, 4)
