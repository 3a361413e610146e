"""Legacy-LDM family: builder, datasets, schedulers, AE-GAN training.

Oracles:
* LR schedulers — the reference's own ``ldm/lr_scheduler.py`` classes
  (pure numpy, imported from /root/reference).
* NLayerDiscriminator — a torch replica of taming's public PatchGAN stack
  (the reference imports taming, which is not vendored; torch Conv/BatchNorm
  semantics are the thing under test).
* VGG16/LPIPS bridge — real ``torchvision.models.vgg16`` weights pushed
  through ``bridge.convert_vgg16`` and an in-torch LPIPS formula replay.
* Config surface — every shipped `configs/latent-diffusion/*.yaml` +
  `configs/autoencoder/*.yaml` builds / instantiates.
"""
import glob
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/repo/tests/_stubs")   # minimal omegaconf stub

import jax
import jax.numpy as jnp
import yaml

torch = pytest.importorskip("torch")

from celebbasis_tpu.train import lr_schedule

REF_LD = sorted(glob.glob("/root/reference/configs/latent-diffusion/*.yaml"))
REF_AE = sorted(glob.glob("/root/reference/configs/autoencoder/*.yaml"))


# ---------------------------------------------------------------------------
# LR schedulers vs the reference module
# ---------------------------------------------------------------------------

def test_lambda_linear_matches_reference():
    from ldm.lr_scheduler import LambdaLinearScheduler
    kw = dict(warm_up_steps=[10, 5], f_min=[0.1, 0.2], f_max=[1.0, 0.8],
              f_start=[1e-6, 0.01], cycle_lengths=[100, 50])
    ref = LambdaLinearScheduler(**kw)
    ours = lr_schedule.lambda_linear(1.0, **kw)
    # the reference's find_in_interval returns None past the last cycle
    # boundary (it assumes astronomically long final cycles); compare on
    # the domain where the reference is defined
    for n in [0, 1, 9, 10, 11, 50, 99, 100, 101, 104, 105, 106, 140, 149,
              150]:
        np.testing.assert_allclose(ours(n), ref(n), rtol=1e-12, err_msg=f"n={n}")


def test_warmup_cosine_cycles_matches_reference():
    from ldm.lr_scheduler import LambdaWarmUpCosineScheduler2
    kw = dict(warm_up_steps=[4, 2], f_min=[0.0, 0.1], f_max=[1.0, 0.5],
              f_start=[0.0, 0.0], cycle_lengths=[20, 30])
    ref = LambdaWarmUpCosineScheduler2(**kw)
    ours = lr_schedule.warmup_cosine_cycles(1.0, **kw)
    for n in range(0, 51):   # reference undefined past the last boundary
        np.testing.assert_allclose(ours(n), ref(n), rtol=1e-12, err_msg=f"n={n}")


def test_warmup_cosine_matches_reference():
    from ldm.lr_scheduler import LambdaWarmUpCosineScheduler
    kw = dict(warm_up_steps=8, lr_min=0.01, lr_max=1.0, lr_start=0.0,
              max_decay_steps=64)
    ref = LambdaWarmUpCosineScheduler(**kw)
    ours = lr_schedule.warmup_cosine(1.0, **kw)
    for n in [0, 1, 7, 8, 9, 32, 63, 64, 65, 100]:
        np.testing.assert_allclose(float(ours(n)), ref(n), rtol=1e-12,
                                   err_msg=f"n={n}")


# ---------------------------------------------------------------------------
# NLayerDiscriminator vs a torch PatchGAN oracle
# ---------------------------------------------------------------------------

def _torch_patchgan(input_nc=3, ndf=8, n_layers=3):
    import torch.nn as tnn
    seq = [tnn.Conv2d(input_nc, ndf, 4, 2, 1), tnn.LeakyReLU(0.2, True)]
    prev = 1
    for n in range(1, n_layers + 1):
        mult = min(2 ** n, 8)
        stride = 2 if n < n_layers else 1
        seq += [tnn.Conv2d(ndf * prev, ndf * mult, 4, stride, 1, bias=False),
                tnn.BatchNorm2d(ndf * mult), tnn.LeakyReLU(0.2, True)]
        prev = mult
    seq += [tnn.Conv2d(ndf * prev, 1, 4, 1, 1)]
    return tnn.Sequential(*seq)


def test_nlayer_discriminator_parity():
    from celebbasis_tpu.train.ae_loss import NLayerDiscriminator
    torch.manual_seed(3)
    ref = _torch_patchgan().train()   # train mode: batch statistics
    x = torch.randn(4, 3, 32, 32)
    with torch.no_grad():
        ref_out = ref(x).numpy()

    model = NLayerDiscriminator(ndf=8, n_layers=3)
    params = {"params": {}}
    convs = [m for m in ref if isinstance(m, torch.nn.Conv2d)]
    bns = [m for m in ref if isinstance(m, torch.nn.BatchNorm2d)]
    p = {}
    for i, conv in enumerate(convs[:-1]):
        name = f"conv_{i}"
        entry = {"kernel": jnp.asarray(
            conv.weight.detach().numpy().transpose(2, 3, 1, 0))}
        if conv.bias is not None:
            entry["bias"] = jnp.asarray(conv.bias.detach().numpy())
        p[name] = entry
    p["conv_out"] = {
        "kernel": jnp.asarray(
            convs[-1].weight.detach().numpy().transpose(2, 3, 1, 0)),
        "bias": jnp.asarray(convs[-1].bias.detach().numpy())}
    for i, bn in enumerate(bns):
        p[f"norm_{i + 1}"] = {
            "scale": jnp.asarray(bn.weight.detach().numpy()),
            "bias": jnp.asarray(bn.bias.detach().numpy())}
    got = jax.jit(model.apply)(
        {"params": p}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               ref_out, atol=2e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# VGG16 bridge + LPIPS formula vs torch
# ---------------------------------------------------------------------------

def _torch_vgg16_features():
    """torchvision vgg16().features replica (torchvision is not in this
    image): conv indices 0,2,5,7,10,12,14,17,19,21,24,26,28 — exactly the
    layout ``bridge.convert_vgg16`` maps."""
    import torch.nn as tnn
    plan = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512)
    layers, in_c = [], 3
    for item in plan:
        if item == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers += [tnn.Conv2d(in_c, item, 3, padding=1), tnn.ReLU()]
            in_c = item
    layers.append(tnn.MaxPool2d(2, 2))
    return tnn.Sequential(*layers)


def test_convert_vgg16_and_lpips_parity():
    from celebbasis_tpu.models.lpips import LPIPS, _SCALE, _SHIFT, _TAPS
    from celebbasis_tpu.utils import bridge

    torch.manual_seed(9)
    vgg = _torch_vgg16_features().eval()
    state = {k: v.detach().numpy() for k, v in vgg.state_dict().items()}
    params = bridge.convert_vgg16({f"features.{k}": v
                                   for k, v in state.items()})

    x = torch.randn(2, 3, 64, 64) * 0.5
    y = torch.randn(2, 3, 64, 64) * 0.5
    lin_w = [np.abs(np.random.default_rng(i).normal(
        size=(c,)).astype(np.float32))
        for i, c in enumerate((64, 128, 256, 512, 512))]

    # torch LPIPS replay (Zhang et al. construction, as taming consumes it)
    shift = torch.tensor(_SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(_SCALE).view(1, 3, 1, 1)

    def taps(t):
        feats, h, conv_i = [], (t - shift) / scale, 0
        for layer in vgg:
            h = layer(h)
            if isinstance(layer, torch.nn.Conv2d):
                conv_i += 1
            if isinstance(layer, torch.nn.ReLU) and conv_i in _TAPS:
                feats.append(h)
        return feats

    with torch.no_grad():
        total = 0
        for w, a, b in zip(lin_w, taps(x), taps(y)):
            # taming normalize_tensor: eps outside the sqrt
            na = a / (a.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            nb = b / (b.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            d = (na - nb) ** 2
            total = total + (d * torch.from_numpy(w).view(1, -1, 1, 1)) \
                .sum(1, keepdim=True).mean((2, 3), keepdim=True)
        ref_out = total.numpy()

    lp = LPIPS()
    variables = {"params": {"vgg": params["params"],
                            **{f"lin_{i}": jnp.asarray(w)
                               for i, w in enumerate(lin_w)}}}
    got = jax.jit(lp.apply)(variables,
                            jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                            jnp.asarray(y.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               ref_out, atol=2e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# Datasets
# ---------------------------------------------------------------------------

def _write_pngs(root, names, size=(40, 30)):
    from PIL import Image
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    for n in names:
        path = os.path.join(root, n)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        Image.fromarray(rng.integers(0, 255, (size[1], size[0], 3),
                                     dtype=np.uint8)).save(path)


def test_image_list_dataset(tmp_path):
    from celebbasis_tpu.data.legacy import ImageListBase
    root = str(tmp_path / "imgs")
    _write_pngs(root, ["a.png", "b.png"])
    txt = tmp_path / "list.txt"
    txt.write_text("a.png\nb.png\n")
    ds = ImageListBase(str(txt), root, size=16, flip_p=0.0, seed=0)
    assert len(ds) == 2
    ex = ds[0]
    assert ex["image"].shape == (16, 16, 3)
    assert ex["image"].dtype == np.float32
    assert -1.0 <= ex["image"].min() and ex["image"].max() <= 1.0
    assert ex["relative_file_path_"] == "a.png"


def test_imagenet_folder_and_sr(tmp_path):
    from celebbasis_tpu.data.legacy import ImageNetFolder, ImageNetSR
    root = str(tmp_path / "train")
    _write_pngs(root, ["n01/x.png", "n01/y.png", "n02/z.png"])
    ds = ImageNetFolder(root, size=16, random_crop=False, seed=0)
    assert len(ds) == 3
    assert [ds[i]["class_label"] for i in range(3)] == [0, 0, 1]
    assert ds[0]["image"].shape == (16, 16, 3)

    sr = ImageNetSR(ImageNetFolder(root, process_images=False), size=16,
                    degradation="pil_bicubic", downscale_f=4, seed=1)
    ex = sr[0]
    assert ex["image"].shape == (16, 16, 3)
    assert ex["LR_image"].shape == (4, 4, 3)

    bsr = ImageNetSR(ImageNetFolder(root, process_images=False), size=16,
                     degradation="bsrgan_light", downscale_f=4, seed=2)
    ex = bsr[1]
    assert ex["image"].shape == (16, 16, 3)
    assert ex["LR_image"].shape == (4, 4, 3)
    assert -1.0 <= ex["LR_image"].min() and ex["LR_image"].max() <= 1.0
    with pytest.raises(FileNotFoundError):
        ImageNetFolder(str(tmp_path / "missing"))


# ---------------------------------------------------------------------------
# Registry: every shipped legacy config target instantiates
# ---------------------------------------------------------------------------

def _walk_targets(node):
    if isinstance(node, dict):
        if "target" in node:
            yield node
        for v in node.values():
            yield from _walk_targets(v)
    elif isinstance(node, list):
        for v in node:
            yield from _walk_targets(v)


def test_every_legacy_target_registered():
    """All targets in the shipped legacy + autoencoder configs resolve in
    REFERENCE_TARGETS (or are model/driver targets the builder handles)."""
    from celebbasis_tpu.utils.registry import REFERENCE_TARGETS
    handled_by_builder = {
        "ldm.models.diffusion.ddpm.LatentDiffusion",
        "ldm.modules.diffusionmodules.openaimodel.UNetModel",
        "ldm.models.autoencoder.AutoencoderKL",
        "ldm.models.autoencoder.VQModelInterface",
        "ldm.modules.encoders.modules.FrozenCLIPEmbedder",
        "ldm.modules.encoders.modules.BERTEmbedder",
        "ldm.modules.encoders.modules.ClassEmbedder",
        "ldm.modules.embedding_manager.EmbeddingManager",
        "ldm.modules.embedding_manager.EmbeddingManagerId",
        "main.DataModuleFromConfig", "main.ImageLogger",
        "ldm.data.personalized.PersonalizedBase",
    }
    for path in REF_LD + REF_AE:
        with open(path) as f:
            cfg = yaml.safe_load(f)
        for node in _walk_targets(cfg):
            t = node["target"]
            assert t in REFERENCE_TARGETS or t in handled_by_builder, \
                f"{os.path.basename(path)}: unhandled target {t}"


def test_loss_and_scheduler_targets_instantiate():
    from celebbasis_tpu.train.ae_loss import (LPIPSWithDiscriminator,
                                              VQLPIPSWithDiscriminator)
    from celebbasis_tpu.utils.registry import instantiate_from_config
    loss = instantiate_from_config(
        {"target": "ldm.modules.losses.LPIPSWithDiscriminator",
         "params": {"disc_start": 50001, "kl_weight": 1e-6,
                    "disc_weight": 0.5}})
    assert isinstance(loss, LPIPSWithDiscriminator)
    assert loss.cfg.disc_start == 50001
    vq = instantiate_from_config(
        {"target": "taming.modules.losses.vqperceptual."
                   "VQLPIPSWithDiscriminator",
         "params": {"disc_start": 1, "codebook_weight": 1.0,
                    "perceptual_loss": "lpips"}})
    assert isinstance(vq, VQLPIPSWithDiscriminator)
    sched = instantiate_from_config(
        {"target": "ldm.lr_scheduler.LambdaLinearScheduler",
         "params": {"warm_up_steps": [10], "cycle_lengths": [int(1e12)],
                    "f_start": [1e-6], "f_max": [1.0], "f_min": [1.0],
                    "verbosity_interval": 0}})
    assert abs(sched(10**7) - 1.0) < 1e-9


# ---------------------------------------------------------------------------
# build_legacy_ldm over every shipped config + tiny end-to-end
# ---------------------------------------------------------------------------

def test_build_every_latent_diffusion_config():
    from celebbasis_tpu.legacy import build_legacy_ldm
    assert len(REF_LD) == 10
    kinds = {}
    for path in REF_LD:
        with open(path) as f:
            cfg = yaml.safe_load(f)
        ldm = build_legacy_ldm(cfg)
        kinds[os.path.basename(path)] = (ldm.first_stage_kind, ldm.cond_kind)
    assert kinds["celebahq-ldm-vq-4.yaml"] == ("vq", "uncond")
    assert kinds["cin256-v2.yaml"] == ("vq", "class")
    assert kinds["lsun_churches-ldm-kl-8.yaml"] == ("kl", "uncond")
    assert kinds["txt2img-1p4B-eval.yaml"] == ("kl", "bert")


def _tiny_legacy_cfg(first_stage="vq", cond="uncond"):
    fs = {"target": f"ldm.models.autoencoder."
                    f"{'VQModelInterface' if first_stage == 'vq' else 'AutoencoderKL'}",
          "params": {"embed_dim": 3, "n_embed": 32,
                     "ddconfig": {"double_z": first_stage != "vq",
                                  "z_channels": 3, "resolution": 32,
                                  "in_channels": 3, "out_ch": 3, "ch": 32,
                                  "ch_mult": [1, 2], "num_res_blocks": 1,
                                  "attn_resolutions": []}}}
    cs = "__is_unconditional__"
    if cond == "class":
        cs = {"target": "ldm.modules.encoders.modules.ClassEmbedder",
              "params": {"n_classes": 11, "embed_dim": 48}}
    elif cond == "bert":
        cs = {"target": "ldm.modules.encoders.modules.BERTEmbedder",
              "params": {"n_embed": 48, "n_layer": 2}}
    unet = {"target": "ldm.modules.diffusionmodules.openaimodel.UNetModel",
            "params": {"in_channels": 3, "out_channels": 3,
                       "model_channels": 32, "attention_resolutions": [2],
                       "num_res_blocks": 1, "channel_mult": [1, 2],
                       "num_head_channels": 8,
                       **({"use_spatial_transformer": True,
                           "transformer_depth": 1, "context_dim": 48,
                           "num_heads": 4} if cond != "uncond" else {})}}
    # the reference zoo's conditional configs set conditioning_key
    # explicitly (models/ldm/cin256/config.yaml:15, text2img256:15);
    # without it the reference's concat_mode default would concat a
    # (B,1,emb) class token into image channels and crash — there too
    extra = {} if cond == "uncond" else {"conditioning_key": "crossattn"}
    return {"model": {"target": "ldm.models.diffusion.ddpm.LatentDiffusion",
                      "params": {"linear_start": 0.0015, "linear_end": 0.0195,
                                 "timesteps": 16, "image_size": 16,
                                 "channels": 3, "unet_config": unet,
                                 "first_stage_config": fs,
                                 "cond_stage_config": cs, **extra}}}


def test_tiny_legacy_uncond_sample_and_train():
    import optax
    from celebbasis_tpu.legacy import build_legacy_ldm
    ldm = build_legacy_ldm(_tiny_legacy_cfg("vq", "uncond"),
                           dtype=jnp.float32)
    params = ldm.init_params(jax.random.key(0))
    sample = jax.jit(lambda p, r: ldm.make_sample_fn(num_steps=4)(p, r,
                                                                  None, 2))
    imgs = sample(params, jax.random.key(1))
    assert imgs.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(imgs)).all()

    # train step moves unet params, loss finite.  The output conv is
    # zero-initialized (reference zero_module), so step 1 only moves
    # conv_out; interior params move from step 2 on.
    tx = optax.adam(1e-3)
    step = jax.jit(ldm.make_train_step(tx))
    z = jax.random.normal(jax.random.key(2), (2, 16, 16, 3))
    opt_state = tx.init(params["unet"])
    p1, opt_state, loss = step(params, opt_state, z, None, jax.random.key(3))
    assert np.isfinite(float(loss))
    assert not np.allclose(
        np.asarray(params["unet"]["params"]["conv_out"]["Conv_0"]["kernel"]),
        np.asarray(p1["unet"]["params"]["conv_out"]["Conv_0"]["kernel"]))
    p2, opt_state, _ = step(p1, opt_state, z, None, jax.random.key(4))
    assert not np.allclose(
        np.asarray(p1["unet"]["params"]["conv_in"]["kernel"]),
        np.asarray(p2["unet"]["params"]["conv_in"]["kernel"]))


def test_tiny_legacy_class_conditional_sample():
    from celebbasis_tpu.legacy import build_legacy_ldm
    ldm = build_legacy_ldm(_tiny_legacy_cfg("vq", "class"),
                           dtype=jnp.float32)
    params = ldm.init_params(jax.random.key(0))
    fn = ldm.make_sample_fn(num_steps=3)
    imgs = fn(params, jax.random.key(1), np.array([3, 7]), 2)
    assert imgs.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(imgs)).all()


def _denullify(tree, key, scale=0.05):
    """Replace all-zero param leaves (the reference's zero_module layers)
    with small random values so outputs depend on every input path."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out = []
    for i, lf in enumerate(leaves):
        if hasattr(lf, "ndim") and lf.ndim >= 1 and \
                not np.any(np.asarray(lf)):
            out.append(jax.random.normal(jax.random.fold_in(key, i),
                                         lf.shape, lf.dtype) * scale)
        else:
            out.append(lf)
    return jax.tree_util.tree_unflatten(treedef, out)


def test_tiny_legacy_class_conditional_cfg():
    """Class-conditional CFG guides against the learned uncond class
    (latent_imagenet_diffusion.ipynb: uc = label 1000 of n_classes=1001;
    here the tiny config's n_classes-1 = 10 by default)."""
    from celebbasis_tpu.legacy import build_legacy_ldm
    ldm = build_legacy_ldm(_tiny_legacy_cfg("vq", "class"),
                           dtype=jnp.float32)
    params = ldm.init_params(jax.random.key(0))
    # perturb every zero-init leaf (conv_out AND the transformer proj_out)
    # so eps actually depends on the conditioning — at pure random init the
    # reference's zero_module layers make CFG a trivial no-op
    params["unet"] = _denullify(params["unet"], jax.random.PRNGKey(9))
    labels = np.array([3, 7])
    plain = ldm.make_sample_fn(num_steps=3)(
        params, jax.random.key(1), labels, 2)
    cfg = ldm.make_sample_fn(num_steps=3, guidance_scale=3.0)(
        params, jax.random.key(1), labels, 2)
    assert cfg.shape == plain.shape
    assert np.isfinite(np.asarray(cfg)).all()
    # scale engages the uncond branch: output must differ from scale=1
    assert not np.allclose(np.asarray(plain), np.asarray(cfg))
    # explicit uncond_label == default n_classes-1 is bit-identical
    explicit = ldm.make_sample_fn(num_steps=3, guidance_scale=3.0,
                                  uncond_label=10)(
        params, jax.random.key(1), labels, 2)
    np.testing.assert_array_equal(np.asarray(cfg), np.asarray(explicit))
    # ... and a different uncond label changes the guidance direction
    other = ldm.make_sample_fn(num_steps=3, guidance_scale=3.0,
                               uncond_label=0)(
        params, jax.random.key(1), labels, 2)
    assert not np.allclose(np.asarray(cfg), np.asarray(other))


def test_tiny_legacy_bert_conditional():
    from celebbasis_tpu.legacy import build_legacy_ldm
    ldm = build_legacy_ldm(_tiny_legacy_cfg("kl", "bert"),
                           dtype=jnp.float32)
    params = ldm.init_params(jax.random.key(0))
    ctx = ldm.get_learned_conditioning(params, ["a photograph of a church"])
    assert ctx.shape == (1, 77, 48)
    # scale_by_std calibration path
    ldm.scale_by_std = True
    x = jax.random.normal(jax.random.key(5), (2, 32, 32, 3)) * 0.5
    ldm.calibrate_scale(params, x)
    z = ldm.encode_first_stage(params, x)
    assert abs(float(jnp.std(z)) - 1.0) < 0.15


# ---------------------------------------------------------------------------
# AE GAN trainer
# ---------------------------------------------------------------------------

def _tiny_vae_cfg(double_z):
    from celebbasis_tpu.models.vae import VAEConfig
    return VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=3,
                     embed_dim=3, double_z=double_z, resolution=32)


def test_ae_trainer_kl_runs_and_updates():
    from celebbasis_tpu.models.vae import AutoencoderKL
    from celebbasis_tpu.train.ae_loss import (DiscLossConfig,
                                              LPIPSWithDiscriminator)
    from celebbasis_tpu.train.ae_trainer import AETrainer
    model = AutoencoderKL(_tiny_vae_cfg(True), dtype=jnp.float32)
    loss = LPIPSWithDiscriminator(DiscLossConfig(disc_start=1, kl_weight=1e-6,
                                                 disc_weight=0.5, disc_ndf=8))
    tr = AETrainer(model, loss, learning_rate=1e-3)
    state = tr.init(jax.random.key(0), image_size=32)
    x = jax.random.uniform(jax.random.key(1), (2, 32, 32, 3)) * 2 - 1

    d0 = state.params["loss"]["disc"]["params"]["conv_0"]["kernel"]
    e0 = state.params["ae"]["params"]["encoder"]["conv_in"]["kernel"]
    logs = []
    for i in range(3):
        state, log = tr.train_batch(state, x, jax.random.key(10 + i))
        logs.append({k: float(v) for k, v in log.items()})
    assert all(np.isfinite(list(l.values())).all() for l in logs)
    # disc_factor gating: step 0 contributes no GAN terms, later steps do
    assert logs[0]["train/disc_factor"] == 0.0
    assert logs[2]["train/disc_factor"] == 1.0
    assert logs[2]["train/d_weight"] > 0.0
    d1 = state.params["loss"]["disc"]["params"]["conv_0"]["kernel"]
    e1 = state.params["ae"]["params"]["encoder"]["conv_in"]["kernel"]
    assert not np.allclose(np.asarray(d0), np.asarray(d1))
    assert not np.allclose(np.asarray(e0), np.asarray(e1))
    # logvar is in NEITHER optimizer (autoencoder.py:386-393 puts only the
    # encoder/decoder/quant convs in opt_ae, despite its "train
    # encoder+decoder+logvar" comment) — it must stay at logvar_init
    assert float(state.params["loss"]["logvar"]) == 0.0


def test_ae_trainer_vq_runs_with_perplexity():
    from celebbasis_tpu.models.vq import VQModel
    from celebbasis_tpu.train.ae_loss import (DiscLossConfig,
                                              VQLPIPSWithDiscriminator)
    from celebbasis_tpu.train.ae_trainer import AETrainer
    model = VQModel(_tiny_vae_cfg(False), n_embed=16, dtype=jnp.float32)
    loss = VQLPIPSWithDiscriminator(DiscLossConfig(
        disc_start=0, codebook_weight=1.0, disc_ndf=8, n_classes=16))
    tr = AETrainer(model, loss, learning_rate=1e-3)
    state = tr.init(jax.random.key(0), image_size=32)
    x = jax.random.uniform(jax.random.key(1), (2, 32, 32, 3)) * 2 - 1
    state, log = tr.train_batch(state, x, jax.random.key(2))
    assert np.isfinite(float(log["train/total_loss"]))
    assert np.isfinite(float(log["train/quant_loss"]))
    assert 1.0 <= float(log["train/perplexity"]) <= 16.0
    assert np.isfinite(float(log["train/disc_loss"]))


def test_evaluate_model_ti_inject(tmp_path):
    """TI embeddings injected at the BERT token-embedding layer change the
    conditioning exactly at placeholder rows (evaluate_model.py +
    x_transformer.py:619-623 hook)."""
    import yaml as _yaml
    from celebbasis_tpu.cli.evaluate_model import make_ti_inject
    from celebbasis_tpu.legacy import build_legacy_ldm
    from celebbasis_tpu.utils.pt_io import save_pt

    with open("/root/repo/configs/tiny_legacy_bert.yaml") as f:
        ldm = build_legacy_ldm(_yaml.safe_load(f), dtype=jnp.float32)
    params = ldm.init_params(jax.random.key(0))

    vec = np.random.default_rng(0).normal(size=(1, 48)).astype(np.float32)
    pt = str(tmp_path / "emb.pt")
    save_pt({"string_to_param": {"*": vec}}, pt)
    inject = make_ti_inject(ldm, pt)

    base = ldm.get_learned_conditioning(params, ["a photo of a dog"])
    same = ldm.get_learned_conditioning(params, ["a photo of a dog"], inject)
    np.testing.assert_allclose(np.asarray(base), np.asarray(same), atol=1e-6)
    with_ph = ldm.get_learned_conditioning(params, ["a photo of a *"])
    injected = ldm.get_learned_conditioning(params, ["a photo of a *"],
                                            inject)
    assert not np.allclose(np.asarray(with_ph), np.asarray(injected))


def test_lambda_linear_traceable_matches_host():
    kw = dict(warm_up_steps=[10], f_min=[1.0], f_max=[1.0],
              f_start=[1e-6], cycle_lengths=[10000])
    host = lr_schedule.lambda_linear(2.0, **kw)
    traced = jax.jit(lr_schedule.lambda_linear_traceable(2.0, **kw))
    for n in [0, 1, 5, 9, 10, 11, 100, 5000, 9999]:
        np.testing.assert_allclose(float(traced(n)), host(n), rtol=1e-5,
                                   err_msg=f"n={n}")


def test_train_legacy_cond_stage_trainable():
    """cin256-v2-style: cond_stage_trainable trains the ClassEmbedder with
    the unet (configure_optimizers, ddpm.py:1442-1466)."""
    from celebbasis_tpu.cli.train_legacy import make_legacy_trainer
    from celebbasis_tpu.legacy import build_legacy_ldm
    cfg = _tiny_legacy_cfg("vq", "class")
    cfg["model"]["params"]["cond_stage_trainable"] = True
    cfg["model"]["params"]["scheduler_config"] = {
        "target": "ldm.lr_scheduler.LambdaLinearScheduler",
        "params": {"warm_up_steps": [2], "cycle_lengths": [10000],
                   "f_start": [1e-6], "f_max": [1.0], "f_min": [1.0]}}
    cfg["model"]["base_learning_rate"] = 1e-3
    ldm = build_legacy_ldm(cfg, dtype=jnp.float32)
    params = ldm.init_params(jax.random.key(0))
    step, init_opt, cond_trainable = make_legacy_trainer(ldm, cfg,
                                                         batch_size=2)
    assert cond_trainable
    opt = init_opt(params)
    z = jax.random.normal(jax.random.key(1), (2, 16, 16, 3))
    labels = jnp.array([3, 7])
    emb0 = np.asarray(params["cond_stage"]["params"]["embedding"])
    for i in range(3):
        params, opt, loss = step(params, opt, z, labels, jax.random.key(i))
        assert np.isfinite(float(loss))
    emb1 = np.asarray(params["cond_stage"]["params"]["embedding"])
    assert not np.allclose(emb0, emb1)


def test_adaptive_weight_pullback_matches_direct_grad():
    """The vjp-pullback formulation of calculate_adaptive_weight
    (train/ae_loss.py) must equal torch's autograd.grad-through-the-graph,
    i.e. direct jax.grad of nll/g wrt the decoder's last conv kernel."""
    from celebbasis_tpu.models.vae import AutoencoderKL, sample_posterior
    from celebbasis_tpu.train.ae_loss import (DiscLossConfig,
                                              LPIPSWithDiscriminator,
                                              adaptive_weight)
    from celebbasis_tpu.train.ae_trainer import (_LAST_KERNEL, _get_leaf,
                                                 _set_leaf)
    model = AutoencoderKL(_tiny_vae_cfg(True), dtype=jnp.float32)
    loss = LPIPSWithDiscriminator(DiscLossConfig(disc_start=0, disc_ndf=8))
    x = jax.random.uniform(jax.random.key(0), (2, 32, 32, 3)) * 2 - 1
    ae = model.init(jax.random.key(1), x, jax.random.key(2))
    lv = loss.init(jax.random.key(3), (1, 32, 32, 3))
    variables = {"lpips": lv["lpips"], "disc": lv["disc"],
                 "logvar": lv["logvar"]}

    mean, logvar = model.apply(ae, x, method="encode")
    z = sample_posterior(jax.random.key(4), mean, logvar)

    def decode_from_last(kernel):
        return model.apply(_set_leaf(ae, _LAST_KERNEL, kernel), z,
                           method="decode")

    kernel = _get_leaf(ae, _LAST_KERNEL)
    recons, pullback = jax.vjp(decode_from_last, kernel)

    def nll_of_kernel(k):
        return loss.nll_of(variables, x, decode_from_last(k))[1]

    def g_of_kernel(k):
        return -jnp.mean(loss._logits_fake(variables, decode_from_last(k),
                                           None))

    nll_cot = jax.grad(lambda r: loss.nll_of(variables, x, r)[1])(recons)
    g_cot = jax.grad(lambda r: -jnp.mean(
        loss._logits_fake(variables, r, None)))(recons)
    via_pullback_nll = pullback(nll_cot)[0]
    via_pullback_g = pullback(g_cot)[0]
    direct_nll = jax.grad(nll_of_kernel)(kernel)
    direct_g = jax.grad(g_of_kernel)(kernel)
    np.testing.assert_allclose(np.asarray(via_pullback_nll),
                               np.asarray(direct_nll), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(via_pullback_g),
                               np.asarray(direct_g), rtol=1e-4, atol=1e-6)

    d_w = adaptive_weight(via_pullback_nll, via_pullback_g, 0.5)
    want = 0.5 * np.linalg.norm(np.asarray(direct_nll).ravel()) / (
        np.linalg.norm(np.asarray(direct_g).ravel()) + 1e-4)
    np.testing.assert_allclose(float(d_w), want, rtol=1e-4)


def test_hinge_and_vanilla_d_loss_match_torch():
    """taming's hinge/vanilla discriminator losses (standard formulas)."""
    from celebbasis_tpu.train.ae_loss import hinge_d_loss, vanilla_d_loss
    torch.manual_seed(2)
    real = torch.randn(4, 1, 6, 6)
    fake = torch.randn(4, 1, 6, 6)
    want_h = 0.5 * (torch.nn.functional.relu(1.0 - real).mean()
                    + torch.nn.functional.relu(1.0 + fake).mean())
    want_v = 0.5 * (torch.nn.functional.softplus(-real).mean()
                    + torch.nn.functional.softplus(fake).mean())
    got_h = hinge_d_loss(jnp.asarray(real.numpy()), jnp.asarray(fake.numpy()))
    got_v = vanilla_d_loss(jnp.asarray(real.numpy()),
                           jnp.asarray(fake.numpy()))
    np.testing.assert_allclose(float(got_h), float(want_h), rtol=1e-6)
    np.testing.assert_allclose(float(got_v), float(want_v), rtol=1e-6)


def test_composed_legacy_ddim_parity():
    """Composed golden test: the reference's own DDIMSampler (ddim.py) over
    the reference torch UNet loaded from OUR exported weights vs our
    ddim_sample scan over our UNet — same x_T, eta=0, 4 steps.  Pins the
    full sampler+schedule+UNet composition, not just the modules."""
    from ldm.models.diffusion.ddim import DDIMSampler
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as RefUNet

    from celebbasis_tpu.diffusion.sampler import (SamplerConfig, ddim_sample)
    from celebbasis_tpu.diffusion.schedules import (make_ddim_schedule,
                                                    make_schedule)
    from celebbasis_tpu.models.unet import UNetConfig, UNetModel
    from celebbasis_tpu.utils import bridge

    T, S = 16, 4
    cfg = UNetConfig(in_channels=3, out_channels=3, model_channels=32,
                     channel_mult=(1, 2), num_res_blocks=1,
                     attention_resolutions=(2,), num_heads=-1,
                     num_head_channels=8, use_spatial_transformer=False)
    model = UNetModel(cfg, dtype=jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 16, 16, 3)),
                                 jnp.zeros((1,), jnp.int32), None)
    # perturb conv_out away from zero-init so eps is non-trivial
    k = jax.random.normal(jax.random.PRNGKey(9),
                          params["params"]["conv_out"]["Conv_0"]["kernel"].shape) * 0.05
    params = jax.tree_util.tree_map(lambda x: x, params)
    params["params"]["conv_out"]["Conv_0"]["kernel"] = k

    ref = RefUNet(image_size=16, in_channels=3, out_channels=3,
                  model_channels=32, attention_resolutions=[2],
                  num_res_blocks=1, channel_mult=[1, 2],
                  num_head_channels=8, use_checkpoint=False).eval()
    ref.load_state_dict(
        {kk: torch.from_numpy(np.ascontiguousarray(v)) for kk, v in
         bridge.export_unet(jax.device_get(params), cfg,
                            prefix="").items()}, strict=True)

    sched = make_schedule("linear", T, linear_start=0.0015,
                          linear_end=0.0195)

    class _Shim:   # duck-typed LatentDiffusion surface the sampler reads
        num_timesteps = T
        betas = torch.from_numpy(sched.betas).float()
        alphas_cumprod = torch.from_numpy(sched.alphas_cumprod).float()
        alphas_cumprod_prev = torch.from_numpy(
            sched.alphas_cumprod_prev).float()
        device = torch.device("cpu")

        @staticmethod
        def apply_model(x, t, c):
            with torch.no_grad():
                return ref(x, t)

    class _CPUSampler(DDIMSampler):   # no CUDA in this image
        def register_buffer(self, name, attr):
            setattr(self, name, attr)

    sampler = _CPUSampler(_Shim())
    x_T = np.random.default_rng(4).normal(size=(2, 3, 16, 16)) \
        .astype(np.float32)
    want, _ = sampler.sample(S=S, batch_size=2, shape=(3, 16, 16),
                             conditioning=None, eta=0.0, verbose=False,
                             x_T=torch.from_numpy(x_T))

    dd = make_ddim_schedule(sched, S, eta=0.0)
    eps = lambda x, t, c: model.apply(params, x, t, None)
    got = ddim_sample(eps, dd, rng=jax.random.key(0),
                      shape=(2, 16, 16, 3), cond=jnp.zeros((2, 1, 1)),
                      cfg=SamplerConfig(guidance_scale=1.0, eta=0.0),
                      x_T=jnp.asarray(x_T.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               want.numpy(), atol=5e-4, rtol=1e-3)


def test_composed_legacy_ddim_cfg_parity():
    """CFG composition golden test: the reference DDIMSampler with
    unconditional_guidance_scale (ddim.py:166-182: cat([x]*2), chunk,
    e_uc + s*(e_c - e_uc)) vs our batched-CFG scan — conditional UNet
    (SpatialTransformer context, as the class/BERT paths feed it),
    scale 3.0, same x_T and contexts.  Pins the guidance math the
    class-conditional uncond_label path rides
    (latent_imagenet_diffusion.ipynb flow)."""
    from ldm.models.diffusion.ddim import DDIMSampler
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as RefUNet

    from celebbasis_tpu.diffusion.sampler import (SamplerConfig, ddim_sample)
    from celebbasis_tpu.diffusion.schedules import (make_ddim_schedule,
                                                    make_schedule)
    from celebbasis_tpu.models.unet import UNetConfig, UNetModel
    from celebbasis_tpu.utils import bridge

    T, S, D = 16, 4, 16
    cfg = UNetConfig(in_channels=3, out_channels=3, model_channels=32,
                     channel_mult=(1, 2), num_res_blocks=1,
                     attention_resolutions=(2,), num_heads=4,
                     use_spatial_transformer=True, transformer_depth=1,
                     context_dim=D)
    model = UNetModel(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(11)
    ctx = rng.normal(size=(2, 1, D)).astype(np.float32)
    uctx = rng.normal(size=(2, 1, D)).astype(np.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 16, 16, 3)),
                                 jnp.zeros((1,), jnp.int32),
                                 jnp.asarray(ctx[:1]))
    # make the zero_module layers non-zero so the context path is live on
    # both sides (exported below), otherwise CFG parity is trivial
    params = _denullify(params, jax.random.PRNGKey(9))

    ref = RefUNet(image_size=16, in_channels=3, out_channels=3,
                  model_channels=32, attention_resolutions=[2],
                  num_res_blocks=1, channel_mult=[1, 2], num_heads=4,
                  use_spatial_transformer=True, transformer_depth=1,
                  context_dim=D, use_checkpoint=False).eval()
    ref.load_state_dict(
        {kk: torch.from_numpy(np.ascontiguousarray(v)) for kk, v in
         bridge.export_unet(jax.device_get(params), cfg,
                            prefix="").items()}, strict=True)

    sched = make_schedule("linear", T, linear_start=0.0015,
                          linear_end=0.0195)

    class _Shim:
        num_timesteps = T
        betas = torch.from_numpy(sched.betas).float()
        alphas_cumprod = torch.from_numpy(sched.alphas_cumprod).float()
        alphas_cumprod_prev = torch.from_numpy(
            sched.alphas_cumprod_prev).float()
        device = torch.device("cpu")
        parameterization = "eps"

        @staticmethod
        def apply_model(x, t, c):
            with torch.no_grad():
                return ref(x, t, context=c)

    class _CPUSampler(DDIMSampler):
        def register_buffer(self, name, attr):
            setattr(self, name, attr)

    sampler = _CPUSampler(_Shim())
    x_T = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    want, _ = sampler.sample(
        S=S, batch_size=2, shape=(3, 16, 16),
        conditioning=torch.from_numpy(ctx), eta=0.0, verbose=False,
        unconditional_guidance_scale=3.0,
        unconditional_conditioning=torch.from_numpy(uctx),
        x_T=torch.from_numpy(x_T))

    dd = make_ddim_schedule(sched, S, eta=0.0)
    eps = lambda x, t, c: model.apply(params, x, t, c)
    got = ddim_sample(eps, dd, rng=jax.random.key(0),
                      shape=(2, 16, 16, 3), cond=jnp.asarray(ctx),
                      uncond=jnp.asarray(uctx),
                      cfg=SamplerConfig(guidance_scale=3.0, eta=0.0),
                      x_T=jnp.asarray(x_T.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               want.numpy(), atol=5e-4, rtol=1e-3)


def test_legacy_train_trajectory_oracle():
    """K-step legacy train trajectory oracle: torch autograd + SGD over the
    reference UNet strict-loaded from OUR exported weights vs our jitted
    ``make_train_step`` — identical z/t/noise streams; per-step losses and
    the full final state_dict must agree tightly.

    Design notes:
    * The loss is the p_losses eps-MSE at default l_simple_weight=1 /
      elbo_weight=0 / logvar=0 (ddpm.py:1030-1076).  The reference's own
      no-manager ``configure_optimizers`` branch is unreachable as shipped
      (its ``opt =`` line sits mis-indented under ``if self.learn_logvar:``,
      ddpm.py:1457-1464 — legacy training crashes with UnboundLocalError),
      so the optimizer here is plain SGD: updates are linear in the
      gradient, making this a *tight* K-step pin of the full-UNet backward
      (Adam's first-step update is +-lr*sign(g), which amplifies fp-level
      noise on near-zero-gradient elements into +-lr divergence — measured:
      0.06 max param drift at lr 1e-2 — so an exact full-model Adam replay
      cannot distinguish real bugs from noise).  AdamW semantics incl.
      torch's 1e-2 default decay are already trajectory-pinned by the
      W2/TI oracles (test_composed_train_parity), whose small MLP/vector
      params get well-conditioned gradients.
    * conv_out is perturbed away from its reference zero-init so every
      layer receives real gradients from step 0."""
    import optax
    import torch.nn.functional as F
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as RefUNet

    from celebbasis_tpu.diffusion.ddpm import ScheduleArrays
    from celebbasis_tpu.diffusion.schedules import make_schedule
    from celebbasis_tpu.legacy import build_legacy_ldm
    from celebbasis_tpu.utils import bridge

    K, B, LR = 5, 2, 1e-2
    ldm = build_legacy_ldm(_tiny_legacy_cfg("vq", "uncond"),
                           dtype=jnp.float32)
    params = ldm.init_params(jax.random.key(0))
    k0 = jax.random.normal(
        jax.random.PRNGKey(9),
        params["unet"]["params"]["conv_out"]["Conv_0"]["kernel"].shape) * 0.05
    params["unet"]["params"]["conv_out"]["Conv_0"]["kernel"] = k0

    ref = RefUNet(image_size=16, in_channels=3, out_channels=3,
                  model_channels=32, attention_resolutions=[2],
                  num_res_blocks=1, channel_mult=[1, 2],
                  num_head_channels=8, use_checkpoint=False).train()
    ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
         bridge.export_unet(jax.device_get(params["unet"]), ldm.unet.cfg,
                            prefix="").items()}, strict=True)

    sched = ScheduleArrays.from_schedule(
        make_schedule("linear", 16, linear_start=0.0015, linear_end=0.0195))
    sqrt_ac = np.asarray(sched.sqrt_alphas_cumprod)
    sqrt_1mac = np.asarray(sched.sqrt_one_minus_alphas_cumprod)

    opt_ref = torch.optim.SGD(ref.parameters(), lr=LR)
    tx = optax.sgd(LR)
    step = jax.jit(ldm.make_train_step(tx))
    opt_state = tx.init(params["unet"])

    rng = np.random.default_rng(11)
    ref_losses, our_losses = [], []
    for it in range(K):
        z = rng.standard_normal((B, 16, 16, 3)).astype(np.float32)
        t = rng.integers(0, 16, (B,)).astype(np.int32)
        noise = rng.standard_normal((B, 16, 16, 3)).astype(np.float32)

        z_t = torch.from_numpy(
            (sqrt_ac[t][:, None, None, None] * z
             + sqrt_1mac[t][:, None, None, None] * noise
             ).transpose(0, 3, 1, 2).copy())
        eps = ref(z_t, torch.from_numpy(t).long())
        loss_ref = F.mse_loss(
            eps, torch.from_numpy(noise.transpose(0, 3, 1, 2).copy()))
        opt_ref.zero_grad()
        loss_ref.backward()
        opt_ref.step()

        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(z), None, jax.random.key(it),
            override_t=jnp.asarray(t), override_noise=jnp.asarray(noise))
        ref_losses.append(float(loss_ref.detach()))
        our_losses.append(float(loss))

    np.testing.assert_allclose(our_losses, ref_losses, atol=2e-5, rtol=2e-5,
                               err_msg=f"legacy train trajectories diverged:"
                                       f"\nours={our_losses}"
                                       f"\nref ={ref_losses}")
    final = bridge.export_unet(jax.device_get(params["unet"]), ldm.unet.cfg,
                               prefix="")
    ref_state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    assert set(final) == set(ref_state)
    for k in final:
        np.testing.assert_allclose(final[k], ref_state[k], atol=2e-5,
                                   rtol=2e-4, err_msg=k)
    # the trajectory actually trained
    base = ldm.init_params(jax.random.key(0))
    assert not np.allclose(
        np.asarray(params["unet"]["params"]["conv_in"]["kernel"]),
        np.asarray(base["unet"]["params"]["conv_in"]["kernel"]))
