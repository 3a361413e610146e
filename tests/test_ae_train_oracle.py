"""K-step AutoencoderKL GAN train trajectory oracle.

Replays the reference's OWN two-optimizer Lightning training
(`/root/reference/ldm/models/autoencoder.py:351-371` training_step with
optimizer_idx 0 then 1 per batch, the real
``ldm.modules.losses.contperceptual.LPIPSWithDiscriminator`` forward incl.
the ``torch.autograd.grad`` adaptive weight, and ``configure_optimizers``'s
param partition at autoencoder.py:386-393 — encoder/decoder/quant convs in
opt_ae, ``loss.discriminator`` in opt_disc, ``loss.logvar`` in NEITHER)
for K batches against K ``AETrainer.train_batch`` calls on bridge-shared
weights, and asserts per-step generator/discriminator loss agreement and
final AE + discriminator parameter agreement.

Optimizers are SGD on both sides (injected via AETrainer's tx_g/tx_d) for
the same reason as the legacy UNet oracle (test_legacy_family): SGD updates
are linear in the gradient, making the pin tight; Adam(0.5, 0.9) semantics
are not the subject here (optax.adam vs torch.optim.Adam parity is already
pinned elsewhere), the full GAN backward is.

The trajectory crosses ``disc_start`` mid-run, exercising adopt_weight's
gating on both sides of the threshold (gen loss without/with the
d_weight·disc_factor·g term, disc loss 0 -> hinge).

Randomness: the reference draws posterior noise from torch's global RNG
inside ``DiagonalGaussianDistribution.sample`` (distributions.py:35-37);
the class is monkeypatched to pop the exact noise our
``sample_posterior(rng, ...)`` will derive from the same jax keys, so both
stacks see byte-identical posterior samples (one draw for the generator
pass, a fresh one for the discriminator pass — lightning re-runs the
forward per optimizer).

taming is not installed: ``tests/_stubs/taming/modules/losses/vqperceptual``
provides LPIPS (random VGG16 + non-negative lin heads, torchvision feature
layout so ``bridge.convert_lpips`` reads its state_dict directly),
NLayerDiscriminator, weights_init, hinge/vanilla losses and adopt_weight —
the contperceptual loss itself runs the reference's code.
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests/_stubs")
sys.path.insert(0, "/root/reference")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

torch = pytest.importorskip("torch")

from celebbasis_tpu.models.vae import AutoencoderKL, VAEConfig  # noqa: E402
from celebbasis_tpu.train.ae_loss import (DiscLossConfig,  # noqa: E402
                                          LPIPSWithDiscriminator)
from celebbasis_tpu.train.ae_trainer import AETrainer, AETrainState  # noqa: E402
from celebbasis_tpu.utils import bridge  # noqa: E402

B, IMG, K = 2, 32, 6
DISC_START = 3
LR = 1e-4
KL_WEIGHT = 1e-6          # the shipped kl-f* configs' value
DISC_WEIGHT = 0.5
ZCH = 3


def _convert_disc(ref_disc) -> dict:
    """taming PatchGAN state -> our NLayerDiscriminator variables (the
    conv/bn iteration mapping pinned by test_nlayer_discriminator_parity)."""
    convs = [m for m in ref_disc.main if isinstance(m, torch.nn.Conv2d)]
    bns = [m for m in ref_disc.main if isinstance(m, torch.nn.BatchNorm2d)]
    p = {}
    for i, conv in enumerate(convs[:-1]):
        entry = {"kernel": jnp.asarray(
            conv.weight.detach().numpy().transpose(2, 3, 1, 0).copy())}
        if conv.bias is not None:
            entry["bias"] = jnp.asarray(conv.bias.detach().numpy().copy())
        p[f"conv_{i}"] = entry
    p["conv_out"] = {
        "kernel": jnp.asarray(
            convs[-1].weight.detach().numpy().transpose(2, 3, 1, 0).copy()),
        "bias": jnp.asarray(convs[-1].bias.detach().numpy().copy())}
    for i, bn in enumerate(bns):
        p[f"norm_{i + 1}"] = {
            "scale": jnp.asarray(bn.weight.detach().numpy().copy()),
            "bias": jnp.asarray(bn.bias.detach().numpy().copy())}
    return {"params": p}


def _assert_disc_match(ref_disc, disc_vars, atol):
    convs = [m for m in ref_disc.main if isinstance(m, torch.nn.Conv2d)]
    bns = [m for m in ref_disc.main if isinstance(m, torch.nn.BatchNorm2d)]
    p = disc_vars["params"]
    for i, conv in enumerate(convs[:-1]):
        np.testing.assert_allclose(
            np.asarray(p[f"conv_{i}"]["kernel"]).transpose(3, 2, 0, 1),
            conv.weight.detach().numpy(), atol=atol, err_msg=f"conv_{i}")
    np.testing.assert_allclose(
        np.asarray(p["conv_out"]["kernel"]).transpose(3, 2, 0, 1),
        convs[-1].weight.detach().numpy(), atol=atol, err_msg="conv_out")
    for i, bn in enumerate(bns):
        np.testing.assert_allclose(np.asarray(p[f"norm_{i + 1}"]["scale"]),
                                   bn.weight.detach().numpy(), atol=atol,
                                   err_msg=f"norm_{i + 1}")


def test_vq_gan_train_trajectory():
    """K-step VQ-GAN trajectory vs the reference's own VQModel.training_step
    (autoencoder.py:142-162) + its vendored
    ``ldm.modules.losses.vqperceptual.VQLPIPSWithDiscriminator`` — incl. the
    taming VectorQuantizer2 legacy loss (codebook term carries beta, the
    stub quantizer replicates the public taming forward), straight-through
    decode, adaptive d_weight, and configure_optimizers' partition
    (autoencoder.py:199-211: encoder+decoder+quantize+quant convs in opt_ae).

    The reference file has a latent bug its shipped configs never hit
    (no config trains a VQ loss): ``forward`` calls an undefined ``exists``.
    We inject the standard ``lambda v: v is not None`` to run its own code.
    """
    import ldm.modules.losses.vqperceptual as ref_vqp
    if not hasattr(ref_vqp, "exists"):
        ref_vqp.exists = lambda v: v is not None
    from ldm.models.autoencoder import VQModel as RefVQ

    N_EMBED = 64
    ddconfig = dict(double_z=False, z_channels=ZCH, resolution=IMG,
                    in_channels=3, out_ch=3, ch=32, ch_mult=[1, 2],
                    num_res_blocks=1, attn_resolutions=[], dropout=0.0)
    lossconfig = {
        "target": "ldm.modules.losses.vqperceptual.VQLPIPSWithDiscriminator",
        "params": dict(disc_start=DISC_START, codebook_weight=1.0,
                       disc_weight=DISC_WEIGHT, n_classes=N_EMBED)}
    torch.manual_seed(11)
    ref = RefVQ(ddconfig=ddconfig, lossconfig=lossconfig, n_embed=N_EMBED,
                embed_dim=ZCH)

    from celebbasis_tpu.models.vq import VQModel
    from celebbasis_tpu.train.ae_loss import VQLPIPSWithDiscriminator
    cfg = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=ZCH,
                    embed_dim=ZCH, double_z=False, resolution=IMG)
    ae_state = {f"first_stage_model.{k}": v.detach().numpy().copy()
                for k, v in ref.state_dict().items()
                if not k.startswith("loss.")}
    ae_vars = bridge.convert_vq(ae_state, cfg.ch_mult, cfg.num_res_blocks,
                                resolution=cfg.resolution)
    ae_vars = jax.tree.map(jnp.asarray, ae_vars)

    lp = ref.loss.perceptual_loss
    lin_state = {k: v.detach().numpy().copy()
                 for k, v in lp.state_dict().items() if k.startswith("lin")}
    vgg_state = {f"features.{k}": v.detach().numpy().copy()
                 for k, v in lp.features.state_dict().items()}
    lpips_vars = jax.tree.map(jnp.asarray,
                              bridge.convert_lpips(lin_state, vgg_state))
    disc_vars = _convert_disc(ref.loss.discriminator)

    model = VQModel(cfg, n_embed=N_EMBED, dtype=jnp.float32)
    loss = VQLPIPSWithDiscriminator(DiscLossConfig(
        disc_start=DISC_START, codebook_weight=1.0,
        disc_weight=DISC_WEIGHT, n_classes=N_EMBED))
    tr = AETrainer(model, loss, learning_rate=LR,
                   tx_g=optax.sgd(LR), tx_d=optax.sgd(LR))
    params = {"ae": ae_vars,
              "loss": {"lpips": lpips_vars, "disc": disc_vars,
                       "logvar": jnp.asarray(0.0, jnp.float32)}}
    state = AETrainState(params=params, opt_g=tr.tx_g.init(ae_vars),
                         opt_d=tr.tx_d.init(disc_vars))

    # opt_ae includes the codebook (autoencoder.py:199-207)
    opt_ae = torch.optim.SGD(
        list(ref.encoder.parameters()) + list(ref.decoder.parameters())
        + list(ref.quantize.parameters())
        + list(ref.quant_conv.parameters())
        + list(ref.post_quant_conv.parameters()), lr=LR)
    opt_disc = torch.optim.SGD(ref.loss.discriminator.parameters(), lr=LR)

    cb0 = ref.quantize.embedding.weight.detach().numpy().copy()
    rng_np = np.random.default_rng(17)
    ref_g, ref_d, our_g, our_d, our_perp = [], [], [], [], []
    for it in range(K):
        x_np = rng_np.uniform(-1, 1, (B, IMG, IMG, 3)).astype(np.float32)
        batch = {"image": torch.from_numpy(x_np)}
        ref.global_step = it

        loss_g = ref.training_step(batch, it, 0)
        opt_ae.zero_grad()
        loss_g.backward()
        opt_ae.step()
        loss_d = ref.training_step(batch, it, 1)
        opt_disc.zero_grad()
        loss_d.backward()
        opt_disc.step()
        ref_g.append(float(loss_g.detach()))
        ref_d.append(float(loss_d.detach()))

        state, log = tr.train_batch(state, jnp.asarray(x_np),
                                    jax.random.key(300 + it))
        our_g.append(float(log["train/total_loss"]))
        our_d.append(float(log["train/disc_loss"]))
        our_perp.append(float(log["train/perplexity"]))

    np.testing.assert_allclose(
        our_g, ref_g, rtol=1e-4, atol=1e-4,
        err_msg=f"generator trajectories diverged:\nours={our_g}"
                f"\nref ={ref_g}")
    np.testing.assert_allclose(
        our_d, ref_d, rtol=1e-4, atol=1e-5,
        err_msg=f"discriminator trajectories diverged:\nours={our_d}"
                f"\nref ={ref_d}")
    assert ref_d[0] == 0.0 and our_d[0] == 0.0 and ref_d[K - 1] != 0.0
    assert all(1.0 <= p <= N_EMBED for p in our_perp)

    final_sd = bridge.export_vq(jax.device_get(state.params["ae"]),
                                cfg.ch_mult, cfg.num_res_blocks,
                                resolution=cfg.resolution)
    ref_sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()
              if not k.startswith("loss.")}
    assert sorted(final_sd) == sorted(ref_sd)
    for k in ref_sd:
        np.testing.assert_allclose(final_sd[k], ref_sd[k], atol=5e-6,
                                   err_msg=k)
    _assert_disc_match(ref.loss.discriminator,
                       jax.device_get(state.params["loss"]["disc"]),
                       atol=5e-6)
    # the codebook actually trained (beta sits on this term — legacy order)
    assert not np.allclose(cb0, ref_sd["quantize.embedding.weight"])


def test_ae_kl_gan_train_trajectory(monkeypatch):
    from ldm.models.autoencoder import AutoencoderKL as RefAE
    from ldm.modules.distributions.distributions import \
        DiagonalGaussianDistribution

    ddconfig = dict(double_z=True, z_channels=ZCH, resolution=IMG,
                    in_channels=3, out_ch=3, ch=32, ch_mult=[1, 2],
                    num_res_blocks=1, attn_resolutions=[], dropout=0.0)
    lossconfig = {"target": "ldm.modules.losses.LPIPSWithDiscriminator",
                  "params": dict(disc_start=DISC_START, kl_weight=KL_WEIGHT,
                                 disc_weight=DISC_WEIGHT)}
    torch.manual_seed(7)
    ref = RefAE(ddconfig=ddconfig, lossconfig=lossconfig, embed_dim=ZCH)
    # construction-default modes: LPIPS eval (contperceptual builds
    # LPIPS().eval()), discriminator BatchNorm train (batch statistics) —
    # exactly our _TrainBatchNorm / dropout-free LPIPS semantics.

    # ---- bridge every trainable + the frozen LPIPS into our stack --------
    cfg = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=ZCH,
                    embed_dim=ZCH, double_z=True, resolution=IMG)
    # .copy() everywhere a torch tensor feeds jnp.asarray: on the CPU
    # backend jnp.asarray of a numpy view can be ZERO-COPY, and the torch
    # optimizer then mutates our bridged params in place mid-oracle.
    ae_state = {f"first_stage_model.{k}": v.detach().numpy().copy()
                for k, v in ref.state_dict().items()
                if not k.startswith("loss.")}
    ae_vars = bridge.convert_vae(ae_state, cfg.ch_mult, cfg.num_res_blocks,
                                 resolution=cfg.resolution)
    ae_vars = jax.tree.map(jnp.asarray, ae_vars)

    lp = ref.loss.perceptual_loss
    lin_state = {k: v.detach().numpy().copy()
                 for k, v in lp.state_dict().items() if k.startswith("lin")}
    vgg_state = {f"features.{k}": v.detach().numpy().copy()
                 for k, v in lp.features.state_dict().items()}
    lpips_vars = jax.tree.map(jnp.asarray,
                              bridge.convert_lpips(lin_state, vgg_state))
    disc_vars = _convert_disc(ref.loss.discriminator)

    model = AutoencoderKL(cfg, dtype=jnp.float32)
    loss = LPIPSWithDiscriminator(DiscLossConfig(
        disc_start=DISC_START, kl_weight=KL_WEIGHT,
        disc_weight=DISC_WEIGHT))
    tr = AETrainer(model, loss, learning_rate=LR,
                   tx_g=optax.sgd(LR), tx_d=optax.sgd(LR))
    params = {"ae": ae_vars,
              "loss": {"lpips": lpips_vars, "disc": disc_vars,
                       "logvar": jnp.asarray(0.0, jnp.float32)}}
    state = AETrainState(params=params, opt_g=tr.tx_g.init(ae_vars),
                         opt_d=tr.tx_d.init(disc_vars))

    # ---- shared random streams -------------------------------------------
    keys = [jax.random.key(100 + i) for i in range(K)]
    zshape = (B, IMG // 2, IMG // 2, ZCH)
    noise_plan = []
    for kk in keys:
        kg, kd = jax.random.split(kk)   # exactly train_batch's split
        noise_plan.append(
            (np.asarray(jax.random.normal(kg, zshape), np.float32),
             np.asarray(jax.random.normal(kd, zshape), np.float32)))

    queue = []

    def fake_sample(self):
        n = queue.pop(0)
        return self.mean + self.std * torch.from_numpy(
            np.ascontiguousarray(n.transpose(0, 3, 1, 2)))

    monkeypatch.setattr(DiagonalGaussianDistribution, "sample", fake_sample)

    # the reference partition (autoencoder.py:386-393): no loss.logvar
    opt_ae = torch.optim.SGD(
        list(ref.encoder.parameters()) + list(ref.decoder.parameters())
        + list(ref.quant_conv.parameters())
        + list(ref.post_quant_conv.parameters()), lr=LR)
    opt_disc = torch.optim.SGD(ref.loss.discriminator.parameters(), lr=LR)

    rng_np = np.random.default_rng(5)
    ref_g, ref_d, our_g, our_d = [], [], [], []
    for it in range(K):
        x_np = rng_np.uniform(-1, 1, (B, IMG, IMG, 3)).astype(np.float32)
        queue[:] = list(noise_plan[it])
        batch = {"image": torch.from_numpy(x_np)}
        ref.global_step = it            # PL 1.x: one increment per batch

        loss_g = ref.training_step(batch, it, 0)
        opt_ae.zero_grad()
        loss_g.backward()
        opt_ae.step()
        loss_d = ref.training_step(batch, it, 1)
        opt_disc.zero_grad()
        loss_d.backward()
        opt_disc.step()
        ref_g.append(float(loss_g.detach()))
        ref_d.append(float(loss_d.detach()))
        assert not queue, "both posterior draws must be consumed"

        state, log = tr.train_batch(state, jnp.asarray(x_np), keys[it])
        our_g.append(float(log["train/total_loss"]))
        our_d.append(float(log["train/disc_loss"]))

    np.testing.assert_allclose(
        our_g, ref_g, rtol=1e-4, atol=1e-4,
        err_msg=f"generator trajectories diverged:\nours={our_g}"
                f"\nref ={ref_g}")
    np.testing.assert_allclose(
        our_d, ref_d, rtol=1e-4, atol=1e-5,
        err_msg=f"discriminator trajectories diverged:\nours={our_d}"
                f"\nref ={ref_d}")
    # pre-disc_start the GAN terms must be literally off
    assert ref_d[0] == 0.0 and our_d[0] == 0.0
    assert ref_d[K - 1] != 0.0

    # ---- final parameter agreement ----------------------------------------
    final_sd = bridge.export_vae(jax.device_get(state.params["ae"]),
                                 cfg.ch_mult, cfg.num_res_blocks,
                                 resolution=cfg.resolution)
    ref_sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()
              if not k.startswith("loss.")}
    assert sorted(final_sd) == sorted(ref_sd)
    for k in ref_sd:
        np.testing.assert_allclose(final_sd[k], ref_sd[k], atol=5e-6,
                                   err_msg=k)
    _assert_disc_match(ref.loss.discriminator,
                       jax.device_get(state.params["loss"]["disc"]),
                       atol=5e-6)
    # logvar stayed at init on both sides (in neither optimizer)
    assert float(state.params["loss"]["logvar"]) == 0.0
    assert float(ref.loss.logvar.detach()) == 0.0
