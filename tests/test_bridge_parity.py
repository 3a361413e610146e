"""Golden numerical parity: reference torch models -> bridge -> Flax models.

Instantiates the *reference's own* modules (imported from /root/reference,
never copied) at tiny configs with random weights, converts the state dicts
through ``celebbasis_tpu.utils.bridge``, and asserts our Flax forwards
reproduce the torch outputs.  This pins conv/linear layout transposes, GN/LN
epsilons, quick-GELU, attention scaling, the timestep embedding, and every
key-mapping rule (SURVEY §7.3 hard part #1).
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests/_stubs")   # minimal omegaconf stub
sys.path.insert(0, "/root/reference")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

torch = pytest.importorskip("torch")

from celebbasis_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder  # noqa: E402
from celebbasis_tpu.models.iresnet import IResNet, IResNetConfig  # noqa: E402
from celebbasis_tpu.models.unet import UNetConfig, UNetModel  # noqa: E402
from celebbasis_tpu.models.vae import AutoencoderKL, VAEConfig  # noqa: E402
from celebbasis_tpu.utils import bridge  # noqa: E402

ATOL = 2e-4


def _np_state(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def test_unet_parity_tiny():
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as RefUNet
    torch.manual_seed(0)
    ref = RefUNet(image_size=16, in_channels=4, out_channels=4,
                  model_channels=32, attention_resolutions=[1, 2],
                  num_res_blocks=1, channel_mult=[1, 2], num_heads=4,
                  use_spatial_transformer=True, transformer_depth=1,
                  context_dim=64, use_checkpoint=False, legacy=False).eval()
    x = torch.randn(2, 4, 16, 16)
    t = torch.tensor([3, 777])
    c = torch.randn(2, 7, 64)
    with torch.no_grad():
        ref_out = ref(x, t, c).numpy()

    cfg = UNetConfig(model_channels=32, channel_mult=(1, 2), num_heads=4,
                     num_res_blocks=1, attention_resolutions=(1, 2),
                     context_dim=64)
    state = {f"model.diffusion_model.{k}": v for k, v in _np_state(ref).items()}
    params = bridge.convert_unet(state, cfg)
    model = UNetModel(cfg, dtype=jnp.float32)
    got = jax.jit(model.apply)(params,
                               jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                               jnp.asarray(t.numpy()),
                               jnp.asarray(c.numpy()))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref_out, atol=ATOL, rtol=1e-3)


def test_vae_parity_tiny():
    # autoencoder.py pulls in pytorch_lightning; use the raw Encoder/Decoder
    # (the actual compute, model.py:368-545) plus manual quant convs.
    from ldm.modules.diffusionmodules.model import Encoder as RefEnc, \
        Decoder as RefDec
    torch.manual_seed(1)
    dd = dict(double_z=True, z_channels=4, resolution=32, in_channels=3,
              out_ch=3, ch=32, ch_mult=[1, 2], num_res_blocks=1,
              attn_resolutions=[], dropout=0.0)
    enc, dec = RefEnc(**dd).eval(), RefDec(**dd).eval()
    quant = torch.nn.Conv2d(8, 8, 1)
    post_quant = torch.nn.Conv2d(4, 4, 1)
    x = torch.randn(1, 3, 32, 32)
    with torch.no_grad():
        moments = quant(enc(x))
        mean = moments.chunk(2, dim=1)[0].numpy()
        dec_out = dec(post_quant(torch.from_numpy(mean))).numpy()

    cfg = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1)
    state = {}
    for mod, pre in ((enc, "encoder."), (dec, "decoder."),
                     (quant, "quant_conv."), (post_quant, "post_quant_conv.")):
        for k, v in _np_state(mod).items():
            state[f"first_stage_model.{pre}{k}"] = v
    params = bridge.convert_vae(state, cfg.ch_mult, cfg.num_res_blocks)
    model = AutoencoderKL(cfg, dtype=jnp.float32)
    got_mean, _ = jax.jit(
        lambda p, xx: model.apply(p, xx, method=AutoencoderKL.encode))(
            params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got_mean).transpose(0, 3, 1, 2),
                               mean, atol=ATOL, rtol=1e-3)
    got_dec = jax.jit(
        lambda p, zz: model.apply(p, zz, method=AutoencoderKL.decode))(
            params, jnp.asarray(mean.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got_dec).transpose(0, 3, 1, 2),
                               dec_out, atol=ATOL, rtol=1e-3)


def test_clip_text_parity_tiny():
    import transformers
    tcfg = transformers.CLIPTextConfig(
        vocab_size=1024, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=77, hidden_act="quick_gelu")
    torch.manual_seed(2)
    ref = transformers.CLIPTextModel(tcfg).eval()
    ids = torch.randint(0, 1024, (2, 77))
    with torch.no_grad():
        ref_out = ref(input_ids=ids).last_hidden_state.numpy()

    cfg = CLIPTextConfig(vocab_size=1024, width=64, layers=2, heads=4,
                         mlp_dim=128)
    state = {f"cond_stage_model.transformer.{k}": v
             for k, v in _np_state(ref).items()}
    params = bridge.convert_clip_text(state, layers=2)
    model = CLIPTextEncoder(cfg, dtype=jnp.float32)
    got = jax.jit(model.apply)(params, jnp.asarray(ids.numpy()))
    np.testing.assert_allclose(np.asarray(got), ref_out, atol=ATOL, rtol=1e-3)


def test_iresnet_parity_tiny():
    from ldm.modules.id_embedding.iresnet import IResNet as RefIResNet, \
        IBasicBlock
    torch.manual_seed(3)
    ref = RefIResNet(IBasicBlock, [1, 1, 1, 1], num_features=64).eval()
    # shrink: reference iresnet fixes fc input to 512*7*7; use 112 input
    x = torch.randn(1, 3, 112, 112)
    with torch.no_grad():
        ref_out = ref(x).numpy()

    cfg = IResNetConfig(layers=(1, 1, 1, 1), feat_dim=64, base=64,
                        input_size=112)
    params = bridge.convert_iresnet(_np_state(ref), layers=cfg.layers)
    model = IResNet(cfg, dtype=jnp.float32)
    got = jax.jit(model.apply)(params,
                               jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), ref_out, atol=5e-4, rtol=1e-3)


def test_clip_full_model_parity_tiny():
    """Eval scorer towers (vision + projected text) vs transformers CLIPModel."""
    import transformers
    from celebbasis_tpu.models.clip_vit import (CLIPVisionConfig,
                                                CLIPVisionEncoder,
                                                CLIPTextTower,
                                                convert_hf_clip)

    tcfg_hf = transformers.CLIPTextConfig(
        vocab_size=1024, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=77, hidden_act="quick_gelu",
        projection_dim=32, eos_token_id=1023)
    vcfg_hf = transformers.CLIPVisionConfig(
        hidden_size=64, intermediate_size=256, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=8,
        hidden_act="quick_gelu", projection_dim=32)
    cfg_hf = transformers.CLIPConfig.from_text_vision_configs(
        tcfg_hf, vcfg_hf, projection_dim=32)
    torch.manual_seed(5)
    ref = transformers.CLIPModel(cfg_hf).eval()

    imgs = torch.randn(2, 3, 32, 32)
    ids = torch.randint(0, 1000, (2, 77))
    # HF pools the text tower at the highest token id position for the
    # original CLIP checkpoints; place the true EOT (1023) at a fixed spot
    ids[:, 50] = 1023
    with torch.no_grad():
        img_ref = ref.get_image_features(pixel_values=imgs).numpy()
        txt_ref = ref.get_text_features(input_ids=ids).numpy()

    vcfg = CLIPVisionConfig(image_size=32, patch_size=8, width=64, layers=2,
                            heads=4, proj_dim=32)
    tcfg = CLIPTextConfig(vocab_size=1024, width=64, layers=2, heads=4,
                          mlp_dim=128)
    vp, tp = convert_hf_clip(_np_state(ref), vcfg, tcfg)
    vision = CLIPVisionEncoder(vcfg)
    text = CLIPTextTower(tcfg, proj_dim=32)
    got_img = jax.jit(vision.apply)(
        vp, jnp.asarray(imgs.numpy().transpose(0, 2, 3, 1)))
    got_txt = jax.jit(text.apply)(tp, jnp.asarray(ids.numpy()))
    np.testing.assert_allclose(np.asarray(got_img), img_ref, atol=ATOL,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_txt), txt_ref, atol=ATOL,
                               rtol=1e-3)
