"""Concat-mode conditioning: the reference's pretrained-model-zoo workloads
(`models/ldm/*/config.yaml`): inpainting (cond stage = first stage encoder),
super-resolution (Identity cond stage), semantic synthesis (SpatialRescaler)
— plus the `attn_type: none` first-stage backbone they use.

Oracles: torch F.interpolate for SpatialRescaler (modules.py:126-155), the
reference's own Encoder/Decoder for attn_type none (model.py:276-285
make_attn -> Identity), and the scripts/inpaint.py compositing contract.
"""
import glob
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests/_stubs")
sys.path.insert(0, "/root/reference")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import yaml  # noqa: E402

torch = pytest.importorskip("torch")

from celebbasis_tpu.legacy import build_legacy_ldm  # noqa: E402
from celebbasis_tpu.models.cond_stages import SpatialRescaler  # noqa: E402

ZOO_LDM = sorted(glob.glob("/root/reference/models/ldm/*/config.yaml"))
ZOO_FS = sorted(glob.glob(
    "/root/reference/models/first_stage_models/*/config.yaml"))


# ---------------------------------------------------------------------------
# SpatialRescaler vs torch F.interpolate
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("method", ["bilinear", "nearest"])
def test_spatial_rescaler_matches_torch(method):
    import torch.nn.functional as F
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 16, 16, 7)).astype(np.float32)
    w = rng.normal(size=(3, 7, 1, 1)).astype(np.float32) * 0.2

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    h = xt
    for _ in range(2):
        h = F.interpolate(h, scale_factor=0.5, mode=method)
    want = torch.nn.functional.conv2d(h, torch.from_numpy(w)) \
        .numpy().transpose(0, 2, 3, 1)

    mod = SpatialRescaler(n_stages=2, method=method, out_channels=3,
                          bias=False)
    params = {"params": {"channel_mapper":
                         {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))}}}
    got = np.asarray(mod.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_spatial_rescaler_rejects_unused_combos():
    with pytest.raises(NotImplementedError):
        SpatialRescaler(method="bicubic").apply(
            {"params": {}}, jnp.zeros((1, 8, 8, 3)))


# ---------------------------------------------------------------------------
# attn_type: none backbone (vq-f4-noattn, inpainting_big)
# ---------------------------------------------------------------------------

def test_backbone_attn_type_none_golden():
    """Reference Encoder/Decoder with make_attn('none') — all attention
    blocks are Identity and carry no weights; the bridge must skip them."""
    from ldm.modules.diffusionmodules.model import Decoder as RefDec
    from ldm.modules.diffusionmodules.model import Encoder as RefEnc

    from celebbasis_tpu.models.vae import Decoder, Encoder, VAEConfig
    from celebbasis_tpu.utils import bridge

    dd = dict(double_z=False, z_channels=3, resolution=32, in_channels=3,
              out_ch=3, ch=32, ch_mult=[1, 2], num_res_blocks=1,
              attn_resolutions=[16], dropout=0.0, attn_type="none")
    torch.manual_seed(5)
    enc, dec = RefEnc(**dd).eval(), RefDec(**dd).eval()
    assert not any("attn" in k for k in enc.state_dict())

    x = torch.randn(1, 3, 32, 32)
    with torch.no_grad():
        h_ref = enc(x).numpy()
        out_ref = dec(torch.from_numpy(h_ref)).numpy()

    cfg = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=3,
                    embed_dim=3, double_z=False, attn_resolutions=(16,),
                    resolution=32, attn_type="none")
    state = {f"first_stage_model.encoder.{k}": v.numpy()
             for k, v in enc.state_dict().items()}
    state.update({f"first_stage_model.decoder.{k}": v.numpy()
                  for k, v in dec.state_dict().items()})
    state["first_stage_model.quant_conv.weight"] = \
        np.eye(3, dtype=np.float32)[:, :, None, None]
    state["first_stage_model.quant_conv.bias"] = np.zeros(3, np.float32)
    state["first_stage_model.post_quant_conv.weight"] = \
        np.eye(3, dtype=np.float32)[:, :, None, None]
    state["first_stage_model.post_quant_conv.bias"] = np.zeros(3, np.float32)
    params = bridge.convert_vae(state, cfg.ch_mult, cfg.num_res_blocks,
                                attn_resolutions=cfg.attn_resolutions,
                                resolution=cfg.resolution, attn_type="none")

    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    h = Encoder(cfg, jnp.float32).apply(
        {"params": params["params"]["encoder"]}, xj)
    np.testing.assert_allclose(np.asarray(h).transpose(0, 3, 1, 2), h_ref,
                               atol=2e-4)
    out = Decoder(cfg, jnp.float32).apply(
        {"params": params["params"]["decoder"]}, h)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               out_ref, atol=2e-4)


# ---------------------------------------------------------------------------
# the model zoo builds
# ---------------------------------------------------------------------------

def test_build_every_zoo_ldm_config():
    assert len(ZOO_LDM) == 11
    got = {}
    for path in ZOO_LDM:
        with open(path) as f:
            cfg = yaml.safe_load(f)
        ldm = build_legacy_ldm(cfg)
        name = os.path.basename(os.path.dirname(path))
        got[name] = (ldm.cond_kind, ldm.cond_mode)
    assert got["inpainting_big"] == ("first_stage", "concat")
    assert got["bsr_sr"] == ("identity", "concat")
    assert got["semantic_synthesis256"] == ("rescaler", "concat")
    assert got["semantic_synthesis512"] == ("rescaler", "concat")
    assert got["cin256"] == ("class", "crossattn")
    assert got["text2img256"] == ("bert", "crossattn")
    assert got["layout2img-openimages256"] == ("bert", "crossattn")
    for name in ("ffhq256", "celeba256", "lsun_beds256",
                 "lsun_churches256"):
        assert got[name] == ("uncond", "none")


def test_build_every_zoo_first_stage_config():
    from celebbasis_tpu.cli.train_ae import build_first_stage_trainer
    assert len(ZOO_FS) == 9
    for path in ZOO_FS:
        with open(path) as f:
            cfg = yaml.safe_load(f)
        trainer, size = build_first_stage_trainer(cfg, dtype=jnp.float32)
        name = os.path.basename(os.path.dirname(path))
        if name == "vq-f4-noattn":
            assert trainer.model.cfg.attn_type == "none"


def _meta_state(module_cls, params):
    """Instantiate a reference torch module at FULL config size on the meta
    device (shapes only, no 270M-param allocations) -> {key: zeros(shape)}."""
    try:
        with torch.device("meta"):
            mod = module_cls(**params)
    except Exception:                       # meta unsupported in some init
        mod = module_cls(**params)
    return {k: np.zeros(tuple(v.shape), np.float32)
            for k, v in mod.state_dict().items()}


def _shape_tree(tree):
    import jax.tree_util as jtu
    return {jtu.keystr(p): tuple(v.shape)
            for p, v in jtu.tree_flatten_with_path(tree)[0]}


@pytest.mark.parametrize("path", ZOO_LDM,
                         ids=[os.path.basename(os.path.dirname(p))
                              for p in ZOO_LDM])
def test_zoo_bridge_structural(path):
    """Full-size structural bridge audit over the whole model zoo: the
    reference's own torch UNet + first stage (meta device, real config
    sizes) convert through the bridges into pytrees whose every leaf shape
    matches our models' eval_shape init — and export back to the exact
    torch key set (strict=True loadable).  Catches any layout the tiny
    golden tests don't reach (e.g. inpainting_big's 256-ch resblock_updown
    UNet, lsun_churches' scale-shift norm) without allocating weights."""
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as RefUNet

    from celebbasis_tpu.utils import bridge

    with open(path) as f:
        cfg = yaml.safe_load(f)
    ldm = build_legacy_ldm(cfg, dtype=jnp.float32)
    up = cfg["model"]["params"]["unet_config"]["params"]

    # -- UNet ---------------------------------------------------------------
    ref_sd = _meta_state(RefUNet, {**up, "use_checkpoint": False})
    got = bridge.convert_unet({f"model.diffusion_model.{k}": v
                               for k, v in ref_sd.items()}, ldm.unet.cfg)
    ctx = jnp.zeros((1, 77, ldm.unet.cfg.context_dim)) \
        if ldm.unet.cfg.use_spatial_transformer else None
    want = jax.eval_shape(
        ldm.unet.init, jax.random.key(0),
        jnp.zeros((1, ldm.image_size, ldm.image_size,
                   ldm.unet.cfg.in_channels)),
        jnp.zeros((1,), jnp.int32), ctx)
    assert _shape_tree(got) == _shape_tree(want)
    back = bridge.export_unet(got, ldm.unet.cfg, prefix="")
    assert set(back) == set(ref_sd)
    assert all(back[k].shape == ref_sd[k].shape for k in ref_sd)

    # -- first stage ----------------------------------------------------------
    fsp = cfg["model"]["params"]["first_stage_config"]["params"]
    dd = fsp["ddconfig"]
    kw = dict(ch_mult=tuple(dd["ch_mult"]),
              num_res_blocks=dd["num_res_blocks"],
              attn_resolutions=tuple(dd.get("attn_resolutions", ()) or ()),
              resolution=dd.get("resolution", 256),
              attn_type=dd.get("attn_type", "vanilla"))
    if ldm.first_stage_kind == "vq":
        from ldm.models.autoencoder import VQModelInterface as RefVQ
        ref_fs = _meta_state(RefVQ, dict(
            embed_dim=fsp["embed_dim"], n_embed=fsp["n_embed"],
            ddconfig=dd, lossconfig={"target": "torch.nn.Identity"}))
        got_fs = bridge.convert_vq(
            {f"first_stage_model.{k}": v for k, v in ref_fs.items()}, **kw)
        img = jnp.zeros((1, dd["resolution"], dd["resolution"], 3))
        want_fs = jax.eval_shape(ldm.first_stage.init, jax.random.key(0),
                                 img)
        back_fs = bridge.export_vq(got_fs, **kw)
    else:
        from ldm.models.autoencoder import AutoencoderKL as RefKL
        ref_fs = _meta_state(RefKL, dict(
            embed_dim=fsp["embed_dim"], ddconfig=dd,
            lossconfig={"target": "torch.nn.Identity"}))
        got_fs = bridge.convert_vae(
            {f"first_stage_model.{k}": v for k, v in ref_fs.items()}, **kw)
        img = jnp.zeros((1, dd["resolution"], dd["resolution"], 3))
        want_fs = jax.eval_shape(ldm.first_stage.init, jax.random.key(0),
                                 img, jax.random.key(1))
        back_fs = bridge.export_vae(got_fs, **kw)
    assert _shape_tree(got_fs) == _shape_tree(want_fs)
    assert set(back_fs) == set(ref_fs)


# ---------------------------------------------------------------------------
# tiny end-to-end: inpainting + concat training
# ---------------------------------------------------------------------------

def _tiny_concat_cfg(cond="__is_first_stage__", extra_cond_ch=1):
    z_ch = 3
    fs = {"target": "ldm.models.autoencoder.VQModelInterface",
          "params": {"embed_dim": z_ch, "n_embed": 32,
                     "ddconfig": {"double_z": False, "z_channels": z_ch,
                                  "resolution": 32, "in_channels": 3,
                                  "out_ch": 3, "ch": 32, "ch_mult": [1, 2],
                                  "num_res_blocks": 1,
                                  "attn_resolutions": [],
                                  "attn_type": "none"}}}
    unet = {"target": "ldm.modules.diffusionmodules.openaimodel.UNetModel",
            "params": {"in_channels": z_ch + z_ch + extra_cond_ch
                       if cond == "__is_first_stage__" else 2 * z_ch,
                       "out_channels": z_ch, "model_channels": 32,
                       "attention_resolutions": [], "num_res_blocks": 1,
                       "channel_mult": [1, 2], "num_head_channels": 8}}
    return {"model": {"target": "ldm.models.diffusion.ddpm.LatentDiffusion",
                      "params": {"linear_start": 0.0015,
                                 "linear_end": 0.0195, "timesteps": 16,
                                 "image_size": 16, "channels": z_ch,
                                 "concat_mode": True, "unet_config": unet,
                                 "first_stage_config": fs,
                                 "cond_stage_config": cond}}}


def test_tiny_inpaint_e2e():
    """Unmasked pixels survive bit-exactly (scripts/inpaint.py:95-97
    compositing); masked pixels are generated; determinism per key."""
    from celebbasis_tpu.cli.inpaint import make_batch, make_inpaint_fn
    from celebbasis_tpu.pipeline import finish_images
    from PIL import Image

    import tempfile
    with tempfile.TemporaryDirectory() as d:
        rng = np.random.default_rng(0)
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), np.uint8)).save(
            os.path.join(d, "a.png"))
        m = np.zeros((32, 32), np.uint8)
        m[8:24, 8:24] = 255
        Image.fromarray(m).save(os.path.join(d, "a_mask.png"))
        batch = make_batch(os.path.join(d, "a.png"),
                           os.path.join(d, "a_mask.png"))

    ldm = build_legacy_ldm(_tiny_concat_cfg(), dtype=jnp.float32)
    params = ldm.init_params(jax.random.key(0))
    run = jax.jit(make_inpaint_fn(ldm, steps=3))
    out = np.asarray(run(params, jax.random.key(1),
                         jnp.asarray(batch["image"]),
                         jnp.asarray(batch["mask"]),
                         jnp.asarray(batch["masked_image"])))
    assert out.shape == (1, 32, 32, 3) and out.dtype == np.uint8
    src_px = np.asarray(finish_images(jnp.asarray(batch["image"]), "uint8"))
    keep = batch["mask"][0, :, :, 0] < 0      # -1 = unmasked after *2-1
    np.testing.assert_array_equal(out[0][keep], src_px[0][keep])
    out2 = np.asarray(run(params, jax.random.key(1),
                          jnp.asarray(batch["image"]),
                          jnp.asarray(batch["mask"]),
                          jnp.asarray(batch["masked_image"])))
    np.testing.assert_array_equal(out, out2)


def test_concat_train_step_moves_params():
    """make_train_step with spatial concat conditioning (bsr_sr-style
    eps loss over [x_t ++ cond] input)."""
    import optax
    cfg = _tiny_concat_cfg(cond={"target": "torch.nn.Identity"},
                           extra_cond_ch=0)
    # identity cond: UNet input = latent 3 + cond 3
    ldm = build_legacy_ldm(cfg, dtype=jnp.float32)
    assert (ldm.cond_kind, ldm.cond_mode) == ("identity", "concat")
    params = ldm.init_params(jax.random.key(0))
    tx = optax.adam(1e-3)
    step = jax.jit(ldm.make_train_step(tx))
    z = jax.random.normal(jax.random.key(2), (2, 16, 16, 3))
    cond = jax.random.normal(jax.random.key(3), (2, 16, 16, 3))
    opt_state = tx.init(params["unet"])
    p1, opt_state, loss = step(params, opt_state, z, cond,
                               jax.random.key(4))
    assert np.isfinite(float(loss))
    assert not np.allclose(
        np.asarray(params["unet"]["params"]["conv_out"]["Conv_0"]["kernel"]),
        np.asarray(p1["unet"]["params"]["conv_out"]["Conv_0"]["kernel"]))


def test_train_legacy_cli_concat(tmp_path):
    """train_legacy drives concat configs end-to-end (SR-style identity
    cond + inpaint-style first_stage cond), fake data, loss finite."""
    import json
    from celebbasis_tpu.cli.train_legacy import main as train_main

    for cond, extra in ((
            {"target": "torch.nn.Identity"}, 0),
            ("__is_first_stage__", 1)):
        cfg = _tiny_concat_cfg(cond=cond, extra_cond_ch=extra)
        if cond == "__is_first_stage__":
            # fake cond is the image itself (3ch): in = 3 latent + 3 enc
            cfg["model"]["params"]["unet_config"]["params"]["in_channels"] \
                = 6
        cfg["model"]["params"]["use_ema"] = False
        path = tmp_path / "cfg.yaml"
        path.write_text(yaml.safe_dump(cfg))
        logdir = tmp_path / f"logs_{extra}"
        train_main(["--config", str(path), "--max-steps", "2",
                    "--batch-size", "2", "--fake-data", "4",
                    "--logdir", str(logdir), "--no-ema"])
        rows = [json.loads(l) for l in
                (logdir / "metrics.jsonl").read_text().splitlines()]
        assert rows and all(np.isfinite(r["loss"]) for r in rows)


def test_tiny_rescaler_concat_sample():
    """semantic-synthesis-style: SpatialRescaler cond stage, concat mode."""
    cfg = _tiny_concat_cfg(
        cond={"target": "ldm.modules.encoders.modules.SpatialRescaler",
              "params": {"n_stages": 1, "in_channels": 5,
                         "out_channels": 3}},
        extra_cond_ch=0)
    ldm = build_legacy_ldm(cfg, dtype=jnp.float32)
    assert (ldm.cond_kind, ldm.cond_mode) == ("rescaler", "concat")
    params = ldm.init_params(jax.random.key(0))
    seg = jax.random.normal(jax.random.key(1), (2, 32, 32, 5))
    fn = ldm.make_sample_fn(num_steps=3)
    imgs = fn(params, jax.random.key(2), seg, 2)
    assert imgs.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(imgs)).all()
