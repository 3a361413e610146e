"""Legacy-LDM family parity: generalized first-stage backbone + VQ models.

Covers the config surface of the reference's shipped legacy configs
(`configs/latent-diffusion/*.yaml`, `configs/autoencoder/*.yaml`):
in-level attention at attn_resolutions, double_z=False encoders, and the
VQModel / VQModelInterface quantization semantics (autoencoder.py:14-283).
Torch oracles are the reference's own Encoder/Decoder (model.py:368-545);
the quantizer is pinned against an explicit numpy nearest-codebook model
(taming is not importable in this image — autoencoder.py:6 is its only use).
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests/_stubs")
sys.path.insert(0, "/root/reference")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

torch = pytest.importorskip("torch")

from celebbasis_tpu.models.vae import Decoder, Encoder, VAEConfig  # noqa: E402
from celebbasis_tpu.models.vq import (VectorQuantizer, VQModel,  # noqa: E402
                                      VQModelInterface)
from celebbasis_tpu.utils import bridge  # noqa: E402

ATOL = 2e-4


def _np_state(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def _vq_cfg():
    # celebahq-ldm-vq-4-style first stage, tiny-ified: double_z False,
    # attention inside level 1 (resolution 32 -> level-1 res 16).
    return VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=3,
                     embed_dim=3, double_z=False, attn_resolutions=(16,),
                     resolution=32)


def _ref_enc_dec():
    from ldm.modules.diffusionmodules.model import Decoder as RefDec
    from ldm.modules.diffusionmodules.model import Encoder as RefEnc
    dd = dict(double_z=False, z_channels=3, resolution=32, in_channels=3,
              out_ch=3, ch=32, ch_mult=[1, 2], num_res_blocks=1,
              attn_resolutions=[16], dropout=0.0)
    return RefEnc(**dd).eval(), RefDec(**dd).eval()


def test_backbone_parity_attn_levels_no_double_z():
    """Encoder/Decoder with in-level attention and a single-moment output."""
    torch.manual_seed(7)
    enc, dec = _ref_enc_dec()
    x = torch.randn(1, 3, 32, 32)
    with torch.no_grad():
        h_ref = enc(x).numpy()
        dec_out = dec(torch.from_numpy(h_ref)).numpy()
    assert h_ref.shape == (1, 3, 16, 16)   # double_z=False: z, not 2z

    cfg = _vq_cfg()
    state = {}
    state.update({f"p.encoder.{k}": v for k, v in _np_state(enc).items()})
    state.update({f"p.decoder.{k}": v for k, v in _np_state(dec).items()})
    # bridge the backbone only (quant convs unused here)
    km = bridge.KeyMap({k[len("p."):]: v for k, v in state.items()})
    bridge._map_ldm_backbone(km, cfg.ch_mult, cfg.num_res_blocks,
                             cfg.attn_resolutions, cfg.resolution)
    params = bridge.unflatten(km.out)

    got_h = jax.jit(lambda p, x: Encoder(cfg, jnp.float32).apply(
        {"params": p}, x))(params["encoder"],
                           jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got_h).transpose(0, 3, 1, 2),
                               h_ref, atol=ATOL, rtol=1e-3)

    got_dec = jax.jit(lambda p, z: Decoder(cfg, jnp.float32).apply(
        {"params": p}, z))(params["decoder"],
                           jnp.asarray(h_ref.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got_dec).transpose(0, 3, 1, 2),
                               dec_out, atol=ATOL, rtol=1e-3)


def test_vector_quantizer_matches_numpy_model():
    """Nearest-codebook lookup, legacy loss order, straight-through grads."""
    rng = np.random.default_rng(0)
    n_embed, e_dim = 17, 3
    emb = rng.normal(size=(n_embed, e_dim)).astype(np.float32)
    z = rng.normal(size=(2, 4, 4, e_dim)).astype(np.float32)

    vq = VectorQuantizer(n_embed, e_dim)
    params = {"params": {"embedding": jnp.asarray(emb)}}
    z_q, loss, idx = jax.jit(vq.apply)(params, jnp.asarray(z))

    flat = z.reshape(-1, e_dim)
    d = ((flat[:, None, :] - emb[None, :, :]) ** 2).sum(-1)
    idx_np = d.argmin(1)
    zq_np = emb[idx_np].reshape(z.shape)
    np.testing.assert_array_equal(np.asarray(idx).reshape(-1), idx_np)
    np.testing.assert_allclose(np.asarray(z_q), zq_np, atol=1e-6)
    loss_np = 0.25 * ((zq_np - z) ** 2).mean() + ((zq_np - z) ** 2).mean()
    np.testing.assert_allclose(float(loss), loss_np, rtol=1e-5)

    # straight-through: d(sum z_q)/dz == 1 everywhere
    g = jax.grad(lambda p, z: jnp.sum(vq.apply(p, z)[0]), argnums=1)(
        params, jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(g), np.ones_like(z), atol=1e-6)
    # codebook grad comes only through the embedding-loss term
    ge = jax.grad(lambda p, z: vq.apply(p, z)[1])(params, jnp.asarray(z))
    assert np.abs(np.asarray(ge["params"]["embedding"])).sum() > 0


def test_vq_model_interface_roundtrip_bridged():
    """Full VQModelInterface vs a torch emulation of the reference graph."""
    torch.manual_seed(11)
    enc, dec = _ref_enc_dec()
    quant_conv = torch.nn.Conv2d(3, 3, 1)
    post_quant_conv = torch.nn.Conv2d(3, 3, 1)
    codebook = torch.nn.Embedding(17, 3)

    x = torch.randn(1, 3, 32, 32)
    with torch.no_grad():
        h = quant_conv(enc(x))                       # encode (pre-quant)
        flat = h.permute(0, 2, 3, 1).reshape(-1, 3)  # nearest codebook
        d = torch.cdist(flat, codebook.weight) ** 2
        zq = codebook.weight[d.argmin(1)].reshape(1, 16, 16, 3) \
            .permute(0, 3, 1, 2)
        ref_dec = dec(post_quant_conv(zq)).numpy()
        h_ref = h.numpy()

    state = {}
    for mod, pre in ((enc, "encoder"), (dec, "decoder"),
                     (quant_conv, "quant_conv"),
                     (post_quant_conv, "post_quant_conv")):
        state.update({f"fs.{pre}.{k}": v for k, v in _np_state(mod).items()})
    state["fs.quantize.embedding.weight"] = codebook.weight.detach().numpy()

    cfg = _vq_cfg()
    params = bridge.convert_vq(state, cfg.ch_mult, cfg.num_res_blocks,
                               prefix="fs.",
                               attn_resolutions=cfg.attn_resolutions,
                               resolution=cfg.resolution)
    model = VQModelInterface(cfg, n_embed=17, dtype=jnp.float32)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))

    got_h = jax.jit(lambda v, x: model.apply(v, x, method="encode"))(
        params, xj)
    np.testing.assert_allclose(np.asarray(got_h).transpose(0, 3, 1, 2),
                               h_ref, atol=ATOL, rtol=1e-3)
    got_dec = jax.jit(lambda v, h: model.apply(v, h, method="decode"))(
        params, got_h)
    np.testing.assert_allclose(np.asarray(got_dec).transpose(0, 3, 1, 2),
                               ref_dec, atol=5e-4, rtol=1e-3)
    # force_not_quantize skips the codebook (decode_first_stage's flag)
    got_nq = model.apply(params, got_h, True, method="decode")
    ref_nq = dec(post_quant_conv(torch.from_numpy(np.asarray(got_h))
                                 .permute(0, 3, 1, 2))).detach().numpy()
    np.testing.assert_allclose(np.asarray(got_nq).transpose(0, 3, 1, 2),
                               ref_nq, atol=5e-4, rtol=1e-3)


def _legacy_unet_pair(ref_kwargs, cfg):
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as RefUNet
    from celebbasis_tpu.models.unet import UNetModel
    torch.manual_seed(5)
    ref = RefUNet(use_checkpoint=False, **ref_kwargs).eval()
    x = torch.randn(2, ref_kwargs["in_channels"], 16, 16)
    t = torch.tensor([5, 421])
    with torch.no_grad():
        ref_out = ref(x, t).numpy()
    state = {f"model.diffusion_model.{k}": v
             for k, v in _np_state(ref).items()}
    params = bridge.convert_unet(state, cfg)
    model = UNetModel(cfg, dtype=jnp.float32)
    got = jax.jit(model.apply)(params,
                               jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                               jnp.asarray(t.numpy()))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               ref_out, atol=ATOL, rtol=1e-3)


def test_legacy_unet_attention_block_num_head_channels():
    """celebahq-ldm-vq-4-style UNet: plain AttentionBlock self-attention,
    head width pinned by num_head_channels, no context."""
    from celebbasis_tpu.models.unet import UNetConfig
    _legacy_unet_pair(
        dict(image_size=16, in_channels=3, out_channels=3, model_channels=32,
             attention_resolutions=[1, 2], num_res_blocks=1,
             channel_mult=[1, 2], num_head_channels=8),
        UNetConfig(in_channels=3, out_channels=3, model_channels=32,
                   channel_mult=(1, 2), num_res_blocks=1,
                   attention_resolutions=(1, 2), num_heads=-1,
                   num_head_channels=8, use_spatial_transformer=False))


def test_legacy_unet_scale_shift_resblock_updown():
    """lsun_churches-ldm-kl-8-style UNet: FiLM time conditioning and
    residual up/downsampling blocks."""
    from celebbasis_tpu.models.unet import UNetConfig
    _legacy_unet_pair(
        dict(image_size=16, in_channels=4, out_channels=4, model_channels=32,
             attention_resolutions=[1, 2], num_res_blocks=1,
             channel_mult=[1, 2], num_heads=4, use_scale_shift_norm=True,
             resblock_updown=True),
        UNetConfig(in_channels=4, out_channels=4, model_channels=32,
                   channel_mult=(1, 2), num_res_blocks=1,
                   attention_resolutions=(1, 2), num_heads=4,
                   use_spatial_transformer=False, use_scale_shift_norm=True,
                   resblock_updown=True))


def test_vq_model_train_view_and_decode_code():
    """VQModel.__call__ returns (rec, emb_loss, idx); decode_code(idx)
    reproduces the quantized reconstruction exactly."""
    cfg = _vq_cfg()
    model = VQModel(cfg, n_embed=17, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(1, 32, 32, 3)),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    rec, emb_loss, idx = jax.jit(model.apply)(variables, x)
    assert rec.shape == (1, 32, 32, 3) and idx.shape == (1, 16, 16)
    assert float(emb_loss) >= 0
    rec2 = model.apply(variables, idx, method="decode_code")
    np.testing.assert_allclose(np.asarray(rec2), np.asarray(rec), atol=1e-5)


def test_export_vq_loads_in_reference_torch_strict():
    """Flax->torch export: the reference's own Encoder/Decoder load the
    exported state_dict with strict=True and reproduce our forward — the
    migration path back (train here, run in the reference)."""
    cfg = _vq_cfg()
    model = VQModelInterface(cfg, n_embed=17, dtype=jnp.float32)
    x = np.random.default_rng(21).normal(size=(1, 32, 32, 3)) \
        .astype(np.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(5), jnp.asarray(x))
    sd = bridge.export_vq(jax.device_get(variables),
                          cfg.ch_mult, cfg.num_res_blocks,
                          attn_resolutions=cfg.attn_resolutions,
                          resolution=cfg.resolution)

    enc, dec = _ref_enc_dec()
    sub = lambda p: {k[len(p):]: torch.from_numpy(np.ascontiguousarray(v))
                     for k, v in sd.items() if k.startswith(p)}
    enc.load_state_dict(sub("encoder."), strict=True)
    dec.load_state_dict(sub("decoder."), strict=True)
    quant_conv = torch.nn.Conv2d(3, 3, 1)
    post_quant_conv = torch.nn.Conv2d(3, 3, 1)
    quant_conv.load_state_dict(sub("quant_conv."), strict=True)
    post_quant_conv.load_state_dict(sub("post_quant_conv."), strict=True)
    codebook = torch.from_numpy(sd["quantize.embedding.weight"])

    with torch.no_grad():
        h_ref = quant_conv(enc(torch.from_numpy(x).permute(0, 3, 1, 2)))
    got_h = model.apply(variables, jnp.asarray(x), method="encode")
    np.testing.assert_allclose(np.asarray(got_h).transpose(0, 3, 1, 2),
                               h_ref.numpy(), atol=2e-4, rtol=1e-3)

    # decode path incl. the exported codebook
    with torch.no_grad():
        flat = h_ref.permute(0, 2, 3, 1).reshape(-1, 3)
        d = torch.cdist(flat, codebook) ** 2
        zq = codebook[d.argmin(1)].reshape(1, 16, 16, 3).permute(0, 3, 1, 2)
        ref_dec = dec(post_quant_conv(zq)).numpy()
    got_dec = model.apply(variables, got_h, method="decode")
    np.testing.assert_allclose(np.asarray(got_dec).transpose(0, 3, 1, 2),
                               ref_dec, atol=5e-4, rtol=1e-3)
    # round-trip through the importer is exact
    back = bridge.convert_vq({f"fs.{k}": v for k, v in sd.items()},
                             cfg.ch_mult, cfg.num_res_blocks, prefix="fs.",
                             attn_resolutions=cfg.attn_resolutions,
                             resolution=cfg.resolution)
    for path, a in bridge.flatten(back["params"]).items():
        b = bridge.flatten(jax.device_get(variables)["params"])[path]
        np.testing.assert_array_equal(a, np.asarray(b), err_msg=path)


def test_export_vae_roundtrip_exact():
    """KL variant: export -> import is the identity on every leaf."""
    from celebbasis_tpu.models.vae import AutoencoderKL
    cfg = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=3,
                    embed_dim=3, double_z=True, resolution=32)
    model = AutoencoderKL(cfg, dtype=jnp.float32)
    x = jnp.zeros((1, 32, 32, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x,
                                    jax.random.PRNGKey(1))
    sd = bridge.export_vae(jax.device_get(variables), cfg.ch_mult,
                           cfg.num_res_blocks, resolution=cfg.resolution)
    back = bridge.convert_vae({f"first_stage_model.{k}": v
                               for k, v in sd.items()},
                              cfg.ch_mult, cfg.num_res_blocks,
                              resolution=cfg.resolution)
    flat_b = bridge.flatten(back["params"])
    flat_a = bridge.flatten(jax.device_get(variables)["params"])
    assert sorted(flat_a) == sorted(flat_b)
    for path in flat_a:
        np.testing.assert_array_equal(flat_a[path], flat_b[path],
                                      err_msg=path)


def test_export_unet_strict_load_and_roundtrip():
    """export_unet loads strict=True into the reference UNetModel and
    reproduces our forward; export->import is leaf-exact (incl. the
    spatial-transformer layout)."""
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as RefUNet
    from celebbasis_tpu.models.unet import UNetConfig, UNetModel

    # legacy AttentionBlock config (forward comparable without context)
    cfg = UNetConfig(in_channels=3, out_channels=3, model_channels=32,
                     channel_mult=(1, 2), num_res_blocks=1,
                     attention_resolutions=(1, 2), num_heads=-1,
                     num_head_channels=8, use_spatial_transformer=False)
    model = UNetModel(cfg, dtype=jnp.float32)
    x = np.random.default_rng(3).normal(size=(2, 16, 16, 3)) \
        .astype(np.float32)
    t = np.array([5, 40])
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(x),
                                 jnp.asarray(t), None)
    got = jax.jit(model.apply)(params, jnp.asarray(x), jnp.asarray(t))

    sd = bridge.export_unet(jax.device_get(params), cfg, prefix="")
    ref = RefUNet(image_size=16, in_channels=3, out_channels=3,
                  model_channels=32, attention_resolutions=[1, 2],
                  num_res_blocks=1, channel_mult=[1, 2], num_head_channels=8,
                  use_checkpoint=False).eval()
    ref.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                         for k, v in sd.items()}, strict=True)
    with torch.no_grad():
        want = ref(torch.from_numpy(x).permute(0, 3, 1, 2),
                   torch.from_numpy(t)).numpy()
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=2e-4, rtol=1e-3)

    # spatial-transformer roundtrip (cross-attention layout)
    cfg2 = UNetConfig(in_channels=4, out_channels=4, model_channels=32,
                      channel_mult=(1, 2), num_res_blocks=1,
                      attention_resolutions=(2,), num_heads=4,
                      transformer_depth=1, context_dim=48,
                      use_spatial_transformer=True)
    m2 = UNetModel(cfg2, dtype=jnp.float32)
    p2 = jax.jit(m2.init)(jax.random.PRNGKey(1),
                          jnp.zeros((1, 16, 16, 4)),
                          jnp.zeros((1,), jnp.int32),
                          jnp.zeros((1, 77, 48)))
    sd2 = bridge.export_unet(jax.device_get(p2), cfg2)
    back = bridge.convert_unet(sd2, cfg2)
    flat_a = bridge.flatten(jax.device_get(p2)["params"])
    flat_b = bridge.flatten(back["params"])
    assert sorted(flat_a) == sorted(flat_b)
    for path in flat_a:
        np.testing.assert_array_equal(flat_a[path], flat_b[path],
                                      err_msg=path)
