"""Noise-level classifier: EncoderUNetModel golden parity + trainer smoke.

Oracles: the reference's own ``EncoderUNetModel``
(`/root/reference/ldm/modules/diffusionmodules/openaimodel.py:745-958`) via
the weight bridge, and its loss/top-k semantics
(`ldm/models/diffusion/classifier.py:150-196`) replayed in torch.
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests/_stubs")
sys.path.insert(0, "/root/reference")

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from celebbasis_tpu.models.unet import EncoderUNetModel, UNetConfig
from celebbasis_tpu.train.classifier import (ClassifierConfig,
                                             NoisyLatentClassifier,
                                             cross_entropy, top_k_accuracy)
from celebbasis_tpu.utils import bridge

ATOL = 3e-4


def _cfgs(pool):
    ref_kwargs = dict(image_size=16, in_channels=3, out_channels=10,
                      model_channels=32, num_res_blocks=1,
                      attention_resolutions=[2], channel_mult=[1, 2],
                      num_head_channels=8, pool=pool, use_checkpoint=False)
    cfg = UNetConfig(in_channels=3, out_channels=10, model_channels=32,
                     channel_mult=(1, 2), num_res_blocks=1,
                     attention_resolutions=(2,), num_heads=-1,
                     num_head_channels=8, use_spatial_transformer=False)
    return ref_kwargs, cfg


@pytest.mark.parametrize("pool", ["adaptive", "attention", "spatial",
                                  "spatial_v2"])
def test_encoder_unet_golden(pool):
    from ldm.modules.diffusionmodules.openaimodel import \
        EncoderUNetModel as RefEnc
    ref_kwargs, cfg = _cfgs(pool)
    torch.manual_seed(11)
    ref = RefEnc(**ref_kwargs).eval()
    x = torch.randn(2, 3, 16, 16)
    t = torch.tensor([7, 300])
    with torch.no_grad():
        want = ref(x, t).numpy()
    state = {f"model.{k}": v.detach().numpy()
             for k, v in ref.state_dict().items()}
    params = bridge.convert_encoder_unet(state, cfg, pool=pool)
    model = EncoderUNetModel(cfg, image_size=16, pool=pool,
                             dtype=jnp.float32)
    got = jax.jit(model.apply)(params,
                               jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                               jnp.asarray(t.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL, rtol=1e-3)


def test_loss_and_topk_match_torch():
    torch.manual_seed(0)
    logits = torch.randn(8, 10)
    labels = torch.randint(0, 10, (8,))
    want_ce = torch.nn.functional.cross_entropy(
        logits, labels, reduction="none").numpy()
    got_ce = cross_entropy(jnp.asarray(logits.numpy()),
                           jnp.asarray(labels.numpy()))
    np.testing.assert_allclose(np.asarray(got_ce), want_ce, rtol=1e-5,
                               atol=1e-6)
    # top-k as in classifier.py:150-155
    for k in (1, 5):
        _, top = torch.topk(logits, k, dim=1)
        want = (top == labels[:, None]).float().sum(-1).mean().item()
        got = float(top_k_accuracy(jnp.asarray(logits.numpy()),
                                   jnp.asarray(labels.numpy()), k))
        assert abs(got - want) < 1e-6


def _clf_cfg(label_key="class_label"):
    return ClassifierConfig(
        num_classes=7,
        unet=UNetConfig(in_channels=3, out_channels=3, model_channels=32,
                        channel_mult=(1, 2), num_res_blocks=1,
                        attention_resolutions=(2,), num_heads=-1,
                        num_head_channels=8, use_spatial_transformer=False),
        label_key=label_key, pool="attention", image_size=16, timesteps=32)


def test_classifier_trains_and_sweeps():
    clf = NoisyLatentClassifier(_clf_cfg(), dtype=jnp.float32)
    params = clf.init(jax.random.key(0))
    state = clf.init_state(params, lr=1e-3)
    z = jax.random.normal(jax.random.key(1), (4, 16, 16, 3))
    labels = jnp.array([0, 3, 6, 2])
    losses = []
    for i in range(3):
        state, log = clf.train_step(state, z, labels, jax.random.key(5 + i))
        losses.append(log["train/loss"])
        assert 0.0 <= float(log["train/acc@1"]) <= 1.0
    assert all(np.isfinite(float(l)) for l in losses)
    assert state["step"] == 3
    sweep = clf.validate_noise_sweep(state["params"], z, labels,
                                     jax.random.key(9), log_every_t=16)
    assert sorted(sweep) == [0, 16]
    assert all(np.isfinite(v["loss"]) for v in sweep.values())


def test_classifier_segmentation_mode():
    clf = NoisyLatentClassifier(_clf_cfg("segmentation"), dtype=jnp.float32)
    params = clf.init(jax.random.key(0))
    z = jax.random.normal(jax.random.key(1), (2, 16, 16, 3))
    labels = jax.random.randint(jax.random.key(2), (2, 16, 16), 0, 7)
    state = clf.init_state(params, lr=1e-3)
    state, log = clf.train_step(state, z, labels, jax.random.key(3))
    assert np.isfinite(float(log["train/loss"]))
