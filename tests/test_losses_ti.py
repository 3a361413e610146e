"""Tests for margin heads, contrastive loss, EMA, LR schedules, TI baseline."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from celebbasis_tpu.core import losses
from celebbasis_tpu.core import textual_inversion as ti
from celebbasis_tpu.text import CLIPTokenizer
from celebbasis_tpu.train import lr_schedule


def test_margin_head_cosface_margin_applied():
    head = losses.MarginHead(num_classes=8, kind="am_cosface", m=0.3, s=10.0)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 16)),
                    jnp.float32)
    labels = jnp.array([0, 1, 2, 3])
    params = head.init(jax.random.key(0), x, labels)
    with_l = head.apply(params, x, labels)
    without = head.apply(params, x)
    d = np.asarray(with_l - without)
    onehot = np.eye(8)[np.asarray(labels)]
    np.testing.assert_allclose(d[onehot > 0], -0.3 * 10.0, atol=1e-5)
    np.testing.assert_allclose(d[onehot == 0], 0.0, atol=1e-6)
    loss = losses.margin_cross_entropy(with_l, labels)
    assert np.isfinite(float(loss))


def test_margin_head_arcface_monotone():
    head = losses.MarginHead(num_classes=4, kind="am_arcface", m=0.5, s=1.0)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((3, 8)),
                    jnp.float32)
    labels = jnp.array([0, 1, 2])
    params = head.init(jax.random.key(0), x, labels)
    with_l = np.asarray(head.apply(params, x, labels))
    without = np.asarray(head.apply(params, x))
    onehot = np.eye(4)[np.asarray(labels)] > 0
    assert (with_l[onehot] <= without[onehot] + 1e-6).all()


def test_info_nce_prefers_aligned_positives():
    rng = np.random.default_rng(0)
    k, d = 4, 16
    base = rng.standard_normal((2, d))
    # positives k//2 apart identical -> low loss
    z_good = np.concatenate([base, base]) + rng.normal(0, 0.01, (k, d))
    z_bad = rng.standard_normal((k, d))
    lg = float(losses.info_nce_loss(jnp.asarray(z_good, jnp.float32)))
    lb = float(losses.info_nce_loss(jnp.asarray(z_bad, jnp.float32)))
    assert lg < lb


def test_contrastive_with_gnet():
    gnet = losses.ContrastiveGNet(meta_dim=16)
    metas = jnp.asarray(np.random.default_rng(2).standard_normal((3, 4, 16)),
                        jnp.float32)
    params = gnet.init(jax.random.key(0), metas[0])
    loss = losses.contrastive_loss(gnet, params, metas)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: losses.contrastive_loss(gnet, p, metas))(params)
    assert max(float(np.abs(np.asarray(x)).max())
               for x in jax.tree.leaves(g)) > 0


def test_ema_update():
    params = {"w": jnp.ones((4,))}
    st = losses.ema_init(params, decay=0.9)
    st = losses.ema_update(st, {"w": jnp.zeros((4,))})
    # early-step decay ramp: min(0.9, (1+1)/(10+1)) = 2/11
    expect = 1.0 * (2 / 11)
    np.testing.assert_allclose(np.asarray(st.params["w"]),
                               expect, rtol=1e-5)


def test_warmup_cosine_shape():
    fn = lr_schedule.warmup_cosine(1.0, warm_up_steps=10, lr_min=0.1,
                                   lr_max=1.0, lr_start=0.0,
                                   max_decay_steps=100)
    assert fn(0) == 0.0
    np.testing.assert_allclose(fn(10), 1.0, rtol=1e-6)
    assert 0.09 < fn(100) < 0.11
    assert fn(5) < fn(10)


def test_warmup_cosine_cycles():
    fn = lr_schedule.warmup_cosine_cycles(
        1.0, warm_up_steps=[5, 5], f_min=[0.1, 0.1], f_max=[1.0, 0.5],
        f_start=[0.0, 0.0], cycle_lengths=[50, 50])
    np.testing.assert_allclose(fn(5), 1.0, rtol=1e-6)
    np.testing.assert_allclose(fn(55), 0.5, rtol=1e-6)


# -- textual inversion -------------------------------------------------------

def test_ti_roundtrip_and_inject(tmp_path):
    tok = CLIPTokenizer.synthetic(size=1024)
    cfg = ti.TIConfig(placeholder_strings=("*",), num_vectors_per_token=2,
                      token_dim=8)
    table = np.random.default_rng(0).standard_normal((1024, 8)).astype(
        np.float32)
    params = ti.init_ti_params(cfg, tok, table, ["face"])
    face_tok = tok.tokenize("face")[0]
    np.testing.assert_allclose(np.asarray(params[0, 0]), table[face_tok])

    ph = jnp.asarray(ti.placeholder_token_ids(cfg, tok), jnp.int32)
    tokens = jnp.asarray(tok(["a photo of a *"]))
    embeds = jnp.asarray(table[np.asarray(tokens)])
    out = ti.ti_inject(cfg, params, ph, tokens, embeds)
    pos = int(np.where(np.asarray(tokens)[0] == int(ph[0]))[0][0])
    np.testing.assert_allclose(np.asarray(out[0, pos]),
                               np.asarray(params[0, 0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[0, pos + 1]),
                               np.asarray(params[0, 1]), atol=1e-6)

    p = tmp_path / "ti.pt"
    ti.save_ti_checkpoint(cfg, params, [int(ph[0])], str(p))
    loaded = ti.load_ti_checkpoint(str(p))
    np.testing.assert_allclose(loaded["*"],
                               np.asarray(params[0]), atol=1e-7)


def test_ti_merge_collision(tmp_path):
    tok = CLIPTokenizer.synthetic(size=1024)
    cfg = ti.TIConfig(("*",), 1, 8)
    table = np.zeros((1024, 8), np.float32)
    a, b = str(tmp_path / "a.pt"), str(tmp_path / "b.pt")
    ti.save_ti_checkpoint(cfg, ti.init_ti_params(cfg, tok, table), [1], a)
    ti.save_ti_checkpoint(cfg, ti.init_ti_params(cfg, tok, table), [1], b)
    with pytest.raises(ValueError, match="collision"):
        ti.merge_ti_checkpoints([a, b])
    merged = ti.merge_ti_checkpoints([a, b], {f"{b}:*": "@"})
    assert set(merged) == {"*", "@"}
