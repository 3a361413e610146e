"""Full-trajectory W2 train-step oracle (VERDICT r3 #1).

Replays the reference's OWN Lightning ``training_step`` — the real
``LatentDiffusion`` assembled from a tiny aigc_id-shaped config
(`/root/reference/ldm/models/diffusion/ddpm.py:921-1116` shared_step →
get_learned_conditioning → p_losses) with ``configure_optimizers``'s AdamW
over the embedding-manager params only (ddpm.py:1442-1466) — for K steps
against K steps of OUR shipped train step (`train/step.py::make_train_step`
+ ``make_optimizer``) on bridge-shared weights, and asserts:

* per-step loss agreement,
* final StyleVectorizer MLP parameter agreement,
* final momentum-dictionary agreement (id_embeddings / id_coefficients).

Randomness: the reference draws (posterior randn, t randint, eps randn_like)
from torch's global RNG inside shared_step; a recorder wraps those three
functions and the captured draws are fed to our step via the batch's
``override_znoise`` / ``override_t`` / ``override_noise`` keys — so both
stacks see byte-identical random streams while the reference runs untouched.

Offline enablers as in test_composed_parity: ``from_pretrained`` is
monkeypatched to our synthetic tokenizer + a tiny random-init HF
CLIPTextModel, and ``MetaIdNet.load_fr_net`` to a tiny random-init IResNet
from the reference's own iresnet module.
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests/_stubs")
sys.path.insert(0, "/root/reference")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
omegaconf = pytest.importorskip("omegaconf")

from celebbasis_tpu.core import manager as mgr  # noqa: E402
from celebbasis_tpu.core.basis import BasisConfig  # noqa: E402
from celebbasis_tpu.core.meta_net import MetaIdNet, MetaNetConfig  # noqa: E402
from celebbasis_tpu.models.clip_text import CLIPTextConfig  # noqa: E402
from celebbasis_tpu.models.iresnet import IResNetConfig  # noqa: E402
from celebbasis_tpu.models.unet import UNetConfig  # noqa: E402
from celebbasis_tpu.models.vae import VAEConfig  # noqa: E402
from celebbasis_tpu.pipeline import CelebBasisPipeline, PipelineConfig  # noqa: E402
from celebbasis_tpu.text.tokenizer import CLIPTokenizer  # noqa: E402
from celebbasis_tpu.train import step as tstep  # noqa: E402
from celebbasis_tpu.utils import bridge  # noqa: E402

from _oracle_helpers import built_tiny_basis  # noqa: E402

TOKEN_DIM = 64
INNER = 8
NUM_ES = 2
MAX_IDS = 10
FACE = 112
IMG = 32          # pixel size; tiny VAE is f=2 -> 16x16 latents, 4 channels
LR = 1e-2         # the reference recipe at bs2 (main_id_embed.py:778-782)
K = 10            # replayed training steps
B = 2


class _HFTokStub:
    def __init__(self, tok):
        self.tok = tok

    def __call__(self, text, **kw):
        texts = [text] if isinstance(text, str) else list(text)
        return {"input_ids": torch.from_numpy(self.tok(texts)).long()}


class _RngRecorder:
    """Wraps torch.randn / torch.randn_like / torch.randint, recording every
    draw so it can be replayed into our step.  Fails loudly if the reference
    draws anything we don't expect (one of each per training step)."""

    def __init__(self, mp):
        self.randn, self.randn_like, self.randint = [], [], []
        orig_randn, orig_like, orig_randint = (torch.randn, torch.randn_like,
                                               torch.randint)

        def rec_randn(*a, **k):
            out = orig_randn(*a, **k)
            self.randn.append(out.detach().clone())
            return out

        def rec_like(*a, **k):
            out = orig_like(*a, **k)
            self.randn_like.append(out.detach().clone())
            return out

        def rec_randint(*a, **k):
            out = orig_randint(*a, **k)
            self.randint.append(out.detach().clone())
            return out

        mp.setattr(torch, "randn", rec_randn)
        mp.setattr(torch, "randn_like", rec_like)
        mp.setattr(torch, "randint", rec_randint)

    def clear(self):
        self.randn.clear()
        self.randn_like.clear()
        self.randint.clear()


def _tiny_ref_model(personalization=None):
    """The reference LatentDiffusion from a tiny aigc_id.yaml-shaped config
    (configs/stable-diffusion/aigc_id.yaml params, toy sizes).
    ``personalization`` overrides the embedding-manager config (the TI
    trajectory oracle swaps in the baseline EmbeddingManager)."""
    from ldm.util import instantiate_from_config

    cfg = omegaconf.OmegaConf.create({
        "target": "ldm.models.diffusion.ddpm.LatentDiffusion",
        "params": {
            "linear_start": 0.00085, "linear_end": 0.0120,
            "num_timesteps_cond": 1, "timesteps": 1000,
            "first_stage_key": "image", "cond_stage_key": "caption",
            "image_size": IMG // 2, "channels": 4,
            "cond_stage_trainable": True, "conditioning_key": "crossattn",
            "monitor": "val/loss_simple_ema", "scale_factor": 0.18215,
            "use_ema": False, "embedding_reg_weight": 0.0,
            "unfreeze_model": False, "model_lr": 0.0,
            "personalization_config": {
                "target": "ldm.modules.embedding_manager.EmbeddingManagerId",
                "params": {"placeholder_strings": ["sks", "ks"],
                           "initializer_words": ["face", "face"],
                           "max_ids": MAX_IDS, "num_embeds_per_token": NUM_ES,
                           "meta_mlp_depth": 1, "loss_type": "none",
                           "meta_inner_dim": INNER, "meta_heads": 1,
                           "use_rm_mlp": False, "test_mode": "coefficient",
                           "momentum": 0.99, "save_fp16": False}},
            "unet_config": {
                "target":
                    "ldm.modules.diffusionmodules.openaimodel.UNetModel",
                "params": {"image_size": IMG // 2, "in_channels": 4,
                           "out_channels": 4, "model_channels": 32,
                           "attention_resolutions": [1, 2],
                           "num_res_blocks": 1, "channel_mult": [1, 2],
                           "num_heads": 4, "use_spatial_transformer": True,
                           "transformer_depth": 1, "context_dim": TOKEN_DIM,
                           "use_checkpoint": False, "legacy": False}},
            "first_stage_config": {
                "target": "ldm.models.autoencoder.AutoencoderKL",
                "params": {"embed_dim": 4, "monitor": "val/rec_loss",
                           "ddconfig": {"double_z": True, "z_channels": 4,
                                        "resolution": IMG, "in_channels": 3,
                                        "out_ch": 3, "ch": 32,
                                        "ch_mult": [1, 2],
                                        "num_res_blocks": 1,
                                        "attn_resolutions": [],
                                        "dropout": 0.0},
                           "lossconfig": {"target": "torch.nn.Identity"}}},
            "cond_stage_config": {
                "target": "ldm.modules.encoders.modules.FrozenCLIPEmbedder",
                "params": {"version": "offline", "device": "cpu",
                           "use_celeb": False}},
        },
    })
    if personalization is not None:
        cfg["params"]["personalization_config"] = personalization
    return instantiate_from_config(cfg)


@pytest.fixture(scope="module")
def stacks():
    from ldm.modules.id_embedding import meta_net as ref_meta_mod
    from ldm.modules.id_embedding.iresnet import (IBasicBlock,
                                                  IResNet as RefIResNet)

    ours_tok = CLIPTokenizer.synthetic()
    mp = pytest.MonkeyPatch()
    torch.manual_seed(0)
    tcfg = transformers.CLIPTextConfig(
        vocab_size=ours_tok.vocab_size, hidden_size=TOKEN_DIM,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=77, hidden_act="quick_gelu")
    tiny_clip = transformers.CLIPTextModel(tcfg).eval()
    mp.setattr(transformers.CLIPTokenizer, "from_pretrained",
               classmethod(lambda cls, v, **k: _HFTokStub(ours_tok)))
    mp.setattr(transformers.CLIPTextModel, "from_pretrained",
               classmethod(lambda cls, v, **k: tiny_clip))

    def fake_load_fr_net(self):
        torch.manual_seed(1)
        self.id_model = RefIResNet(IBasicBlock, [1, 1, 1, 1],
                                   num_features=512)
        for p in self.id_model.parameters():
            p.requires_grad = False
        self.id_model.eval()
    mp.setattr(ref_meta_mod.MetaIdNet, "load_fr_net", fake_load_fr_net)

    torch.manual_seed(2)
    ref = _tiny_ref_model()
    ref.learning_rate = LR
    # neuter the Lightning logging glue (no Trainer attached); everything
    # else in training_step runs as shipped
    mp.setattr(type(ref), "log_dict", lambda self, *a, **k: None,
               raising=False)
    mp.setattr(type(ref), "log", lambda self, *a, **k: None, raising=False)
    ref.train()
    assert ref.embedding_manager.training
    assert not ref.model.training and not ref.cond_stage_model.training

    # ---- bridge every frozen component torch -> ours -----------------------
    unet_cfg = UNetConfig(model_channels=32, channel_mult=(1, 2), num_heads=4,
                          num_res_blocks=1, attention_resolutions=(1, 2),
                          context_dim=TOKEN_DIM)
    vae_cfg = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1)
    clip_cfg = CLIPTextConfig(vocab_size=ours_tok.vocab_size, width=TOKEN_DIM,
                              layers=2, heads=4, mlp_dim=128)
    pipe_cfg = PipelineConfig(
        unet=unet_cfg, vae=vae_cfg, clip=clip_cfg,
        basis=BasisConfig(n_components=INNER, num_embeds_per_token=NUM_ES),
        placeholder_strings=("sks", "ks"), dtype=jnp.float32)
    pipe = CelebBasisPipeline(pipe_cfg, ours_tok)

    np_state = lambda m: {k: v.detach().numpy()
                          for k, v in m.state_dict().items()}
    unet_params = bridge.convert_unet(
        {f"model.diffusion_model.{k}": v
         for k, v in np_state(ref.model.diffusion_model).items()}, unet_cfg)
    vae_params = bridge.convert_vae(
        {f"first_stage_model.{k}": v
         for k, v in np_state(ref.first_stage_model).items()},
        vae_cfg.ch_mult, vae_cfg.num_res_blocks)
    clip_params = bridge.convert_clip_text(
        {f"cond_stage_model.transformer.{k}": v
         for k, v in np_state(ref.cond_stage_model.transformer).items()},
        layers=2)

    ir_params = bridge.convert_iresnet(
        np_state(ref.embedding_manager.meta_id_net.id_model),
        layers=(1, 1, 1, 1))
    sv = ref.embedding_manager.meta_id_net.stylegan_mlp.net[0]
    meta_cfg = MetaNetConfig(
        fr_dim=512, inner_dim=INNER, num_es=NUM_ES, heads=1, mlp_depth=1,
        lr_mul=1.0, token_dim=TOKEN_DIM, face_size=FACE,
        iresnet=IResNetConfig(layers=(1, 1, 1, 1), feat_dim=512, base=64,
                              input_size=FACE))
    meta = MetaIdNet(meta_cfg, dtype=jnp.float32)
    meta_params = {"params": {
        "fr_net": ir_params["params"],
        "mlp": {"layer_0": {"weight": jnp.asarray(sv.weight.detach().numpy()),
                            "bias": jnp.asarray(sv.bias.detach().numpy())}},
    }}

    # basis from the SHIPPED builder on the tiny token table (the W1 oracle
    # in test_composed_basis_parity.py pins this builder to the reference's
    # own _get_celeb_embeddings); shared into both stacks — see
    # _oracle_helpers for why sharing is the sound closure under SVD sign
    # freedom.
    built_basis = built_tiny_basis(ours_tok, tiny_clip, INNER, NUM_ES)

    yield dict(tok=ours_tok, ref=ref, pipe=pipe, meta=meta,
               meta_params=meta_params, basis=built_basis,
               frozen_models={"unet": unet_params, "vae": vae_params,
                              "clip": clip_params}, mp=mp)
    mp.undo()


def test_full_trajectory_training_parity(stacks):
    s = stacks
    ref = s["ref"]
    pipe = s["pipe"]
    rng = np.random.default_rng(7)

    # shared dictionary seeds + shared basis (as in test_composed_parity)
    emb0 = rng.standard_normal((MAX_IDS, NUM_ES, TOKEN_DIM)).astype(np.float32)
    coef0 = rng.standard_normal((MAX_IDS, NUM_ES, 1, INNER)).astype(np.float32)
    ref.embedding_manager.id_embeddings = [torch.from_numpy(emb0[i].copy())
                                           for i in range(MAX_IDS)]
    ref.embedding_manager.id_coefficients = [torch.from_numpy(coef0[i].copy())
                                             for i in range(MAX_IDS)]
    mstate = mgr.ManagerState(jnp.asarray(emb0), jnp.asarray(coef0))
    basis = s["basis"]       # oracle-verified builder output (W1-pinned)
    ref.cond_stage_model.celeb_embeddings = torch.from_numpy(basis.copy())

    # reference optimizer: the shipped configure_optimizers (AdamW over the
    # embedding-manager params; only the MLP ever receives grads)
    opt_ref = ref.configure_optimizers()
    assert isinstance(opt_ref, torch.optim.AdamW)

    # our optimizer + shipped train step
    trainable, meta_frozen = tstep.split_meta_params(s["meta_params"])
    frozen = {**s["frozen_models"], "meta_frozen": meta_frozen}
    opt = tstep.make_optimizer(LR)
    step_fn = jax.jit(tstep.make_train_step(pipe, s["meta"], opt))
    state = tstep.init_train_state(jax.random.key(3), trainable, opt, mstate)

    prompts = ["face of sks person", "a photo of sks person and ks person"]
    tokens = s["tok"](prompts)
    ids = np.asarray([[0, 1], [0, 1]], np.int32)
    num_ids = np.asarray([1, 2], np.int32)

    rec = _RngRecorder(s["mp"])
    ref_losses, our_losses = [], []
    for it in range(K):
        images = rng.uniform(-1, 1, (B, IMG, IMG, 3)).astype(np.float32)
        faces = rng.uniform(-1, 1, (B, 2, FACE, FACE, 3)).astype(np.float32)
        ref_batch = {
            "image": torch.from_numpy(images.copy()),
            "caption": prompts,
            "image_ori": {
                "faces": torch.from_numpy(
                    np.concatenate([faces[:, 0], faces[:, 1]], axis=-1)),
                "ids": torch.from_numpy(ids).long(),
                "num_ids": torch.from_numpy(num_ids).long()},
        }
        # --- reference training step: shipped training_step + AdamW ---------
        rec.clear()
        torch.manual_seed(1000 + it)
        loss_ref = ref.training_step(ref_batch, it)
        opt_ref.zero_grad()
        loss_ref.backward()
        opt_ref.step()
        # exactly one posterior draw, one t draw, one eps draw
        assert len(rec.randn) == 1 and len(rec.randint) == 1 \
            and len(rec.randn_like) == 1, (
                len(rec.randn), len(rec.randint), len(rec.randn_like))
        znoise = rec.randn[0].numpy().transpose(0, 2, 3, 1)
        t_drawn = rec.randint[0].numpy().astype(np.int32)
        eps = rec.randn_like[0].numpy().transpose(0, 2, 3, 1)

        # --- our training step on the captured stream -----------------------
        batch = {
            "image": jnp.asarray(images),
            "tokens": jnp.asarray(tokens),
            "faces": jnp.asarray(faces),
            "ids": jnp.asarray(ids),
            "num_ids": jnp.asarray(num_ids),
            "override_znoise": jnp.asarray(znoise),
            "override_t": jnp.asarray(t_drawn),
            "override_noise": jnp.asarray(eps),
        }
        state, logs = step_fn(state, frozen, jnp.asarray(basis), batch)
        ref_losses.append(float(loss_ref))
        our_losses.append(float(logs["loss"]))

    np.testing.assert_allclose(our_losses, ref_losses, atol=2e-3, rtol=2e-3,
                               err_msg=f"loss trajectories diverged:\n"
                                       f"ours={our_losses}\nref ={ref_losses}")

    # final MLP parameters agree (the only weights AdamW moves)
    sv = ref.embedding_manager.meta_id_net.stylegan_mlp.net[0]
    got_w = np.asarray(state.trainable["params"]["mlp"]["layer_0"]["weight"])
    got_b = np.asarray(state.trainable["params"]["mlp"]["layer_0"]["bias"])
    np.testing.assert_allclose(got_w, sv.weight.detach().numpy(),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(got_b, sv.bias.detach().numpy(),
                               atol=2e-4, rtol=2e-4)

    # final momentum dictionaries agree for the live ids, and untouched ids
    # still sit at their seeds on both sides
    for idx in range(2):
        np.testing.assert_allclose(
            np.asarray(state.manager_state.id_embeddings[idx]),
            ref.embedding_manager.id_embeddings[idx].detach().numpy(),
            atol=1e-4, rtol=1e-4, err_msg=f"id_embeddings[{idx}]")
        np.testing.assert_allclose(
            np.asarray(state.manager_state.id_coefficients[idx]),
            ref.embedding_manager.id_coefficients[idx].detach().numpy(),
            atol=1e-4, rtol=1e-4, err_msg=f"id_coefficients[{idx}]")
    np.testing.assert_array_equal(
        np.asarray(state.manager_state.id_coefficients[5]), coef0[5])

    # the trajectory actually trained (not a frozen no-op comparison)
    assert not np.allclose(got_w, s["meta_params"]["params"]["mlp"]
                           ["layer_0"]["weight"])


def test_composed_w3_generation_parity(stacks):
    """Composed CelebBasis W3 chain oracle (VERDICT r3 #2): the reference's
    own DDIMSampler.sample with coefficient-mode embedding injection and CFG
    scale 10 (scripts/stable_txt2img.py:329-351 + ddim.py:166-204 +
    embedding_manager.py:462-475) vs our shipped ``make_txt2img_fn`` — same
    bridged weights, same dictionaries, same x_T; final pixels must match.

    Independent of the trajectory test above: dictionaries and basis are
    re-seeded fresh on both sides, and coefficient-mode injection never runs
    the MLP (faces=None), so earlier training state is irrelevant."""
    from ldm.models.diffusion.ddim import DDIMSampler

    s = stacks
    ref = s["ref"]
    pipe = s["pipe"]
    rng = np.random.default_rng(21)
    S, SCALE = 5, 10.0

    emb0 = rng.standard_normal((MAX_IDS, NUM_ES, TOKEN_DIM)).astype(np.float32)
    coef0 = rng.standard_normal((MAX_IDS, NUM_ES, 1, INNER)).astype(np.float32)
    ref.embedding_manager.id_embeddings = [torch.from_numpy(emb0[i].copy())
                                           for i in range(MAX_IDS)]
    ref.embedding_manager.id_coefficients = [torch.from_numpy(coef0[i].copy())
                                             for i in range(MAX_IDS)]
    mstate = mgr.ManagerState(jnp.asarray(emb0), jnp.asarray(coef0))
    basis = s["basis"]       # oracle-verified builder output (W1-pinned)
    ref.cond_stage_model.celeb_embeddings = torch.from_numpy(basis.copy())
    ref.eval()
    assert not ref.embedding_manager.training

    prompts = ["a photo of sks person and ks person"] * B
    ids = np.asarray([[0, 1]] * B, np.int32)
    num_ids = np.asarray([2] * B, np.int32)
    x_T = rng.standard_normal((B, 4, IMG // 2, IMG // 2)).astype(np.float32)

    # --- reference chain: stable_txt2img.py:329-351 --------------------------
    class _CPUSampler(DDIMSampler):   # ddim.py casts buffers to cuda; no GPU
        def register_buffer(self, name, attr):
            setattr(self, name, attr)

    image_ori = {"faces": None,
                 "ids": torch.from_numpy(ids).long(),
                 "num_ids": torch.full((B,), 2, dtype=torch.long)}
    with torch.no_grad():
        uc = ref.get_learned_conditioning(B * [""])
        c = ref.get_learned_conditioning(prompts, image_ori=image_ori)
        sampler = _CPUSampler(ref)
        samples, _ = sampler.sample(
            S=S, conditioning=c, batch_size=B,
            shape=(4, IMG // 2, IMG // 2), verbose=False,
            unconditional_guidance_scale=SCALE, unconditional_conditioning=uc,
            eta=0.0, x_T=torch.from_numpy(x_T))
        dec = ref.decode_first_stage(samples)
        want = torch.clamp((dec + 1.0) / 2.0, min=0.0, max=1.0).numpy()

    # --- our shipped chain: the whole jitted txt2img graph -------------------
    fn = pipe.make_txt2img_fn(num_steps=S, guidance_scale=SCALE,
                              image_size=IMG)
    imgs = fn(s["frozen_models"], mstate, jnp.asarray(basis),
              jnp.asarray(s["tok"](prompts)), jnp.asarray(s["tok"]([""] * B)),
              jnp.asarray(ids), jnp.asarray(num_ids), jax.random.key(0),
              x_T=jnp.asarray(x_T.transpose(0, 2, 3, 1)))
    got = (np.asarray(imgs).transpose(0, 3, 1, 2) + 1.0) / 2.0

    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


def test_composed_w3_plms_parity(stacks):
    """Composed --plms chain oracle: the reference's own PLMSSampler.sample
    (plms.py:119-236, the stable_txt2img.py --plms path) with coefficient
    injection + CFG vs our ``make_txt2img_fn(sampler='plms')`` — same bridged
    weights, dictionaries, and x_T; final pixels must match."""
    from ldm.models.diffusion.plms import PLMSSampler

    s = stacks
    ref = s["ref"]
    pipe = s["pipe"]
    rng = np.random.default_rng(33)
    S, SCALE = 5, 7.5

    emb0 = rng.standard_normal((MAX_IDS, NUM_ES, TOKEN_DIM)).astype(np.float32)
    coef0 = rng.standard_normal((MAX_IDS, NUM_ES, 1, INNER)).astype(np.float32)
    ref.embedding_manager.id_embeddings = [torch.from_numpy(emb0[i].copy())
                                           for i in range(MAX_IDS)]
    ref.embedding_manager.id_coefficients = [torch.from_numpy(coef0[i].copy())
                                             for i in range(MAX_IDS)]
    mstate = mgr.ManagerState(jnp.asarray(emb0), jnp.asarray(coef0))
    basis = s["basis"]       # oracle-verified builder output (W1-pinned)
    ref.cond_stage_model.celeb_embeddings = torch.from_numpy(basis.copy())
    ref.eval()

    prompts = ["a photo of sks person and ks person"] * B
    ids = np.asarray([[0, 1]] * B, np.int32)
    num_ids = np.asarray([2] * B, np.int32)
    x_T = rng.standard_normal((B, 4, IMG // 2, IMG // 2)).astype(np.float32)

    class _CPUSampler(PLMSSampler):   # plms.py casts buffers to cuda; no GPU
        def register_buffer(self, name, attr):
            setattr(self, name, attr)

    image_ori = {"faces": None,
                 "ids": torch.from_numpy(ids).long(),
                 "num_ids": torch.full((B,), 2, dtype=torch.long)}
    with torch.no_grad():
        uc = ref.get_learned_conditioning(B * [""])
        c = ref.get_learned_conditioning(prompts, image_ori=image_ori)
        sampler = _CPUSampler(ref)
        samples, _ = sampler.sample(
            S=S, conditioning=c, batch_size=B,
            shape=(4, IMG // 2, IMG // 2), verbose=False,
            unconditional_guidance_scale=SCALE, unconditional_conditioning=uc,
            eta=0.0, x_T=torch.from_numpy(x_T))
        dec = ref.decode_first_stage(samples)
        want = torch.clamp((dec + 1.0) / 2.0, min=0.0, max=1.0).numpy()

    fn = pipe.make_txt2img_fn(num_steps=S, guidance_scale=SCALE,
                              image_size=IMG, sampler="plms")
    imgs = fn(s["frozen_models"], mstate, jnp.asarray(basis),
              jnp.asarray(s["tok"](prompts)), jnp.asarray(s["tok"]([""] * B)),
              jnp.asarray(ids), jnp.asarray(num_ids), jax.random.key(0),
              x_T=jnp.asarray(x_T.transpose(0, 2, 3, 1)))
    got = (np.asarray(imgs).transpose(0, 3, 1, 2) + 1.0) / 2.0

    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


def test_composed_img2img_parity(stacks):
    """Composed img2img chain oracle: the reference DDIMSampler's
    stochastic_encode (ddim.py:207-220, gathers ddim_alphas[t_enc]) +
    partial CFG decode (ddim.py:223-241) vs our shipped
    ``cli/img2img.make_img2img_fn`` — same latents, encode noise, bridged
    weights, dictionaries.  Pins the strength->t_enc encode level and the
    reversed partial-chain step alphas."""
    from ldm.models.diffusion.ddim import DDIMSampler

    from celebbasis_tpu.cli.img2img import make_img2img_fn

    s = stacks
    ref = s["ref"]
    pipe = s["pipe"]
    rng = np.random.default_rng(55)
    S, SCALE, T_ENC = 5, 4.0, 3

    emb0 = rng.standard_normal((MAX_IDS, NUM_ES, TOKEN_DIM)).astype(np.float32)
    coef0 = rng.standard_normal((MAX_IDS, NUM_ES, 1, INNER)).astype(np.float32)
    ref.embedding_manager.id_embeddings = [torch.from_numpy(emb0[i].copy())
                                           for i in range(MAX_IDS)]
    ref.embedding_manager.id_coefficients = [torch.from_numpy(coef0[i].copy())
                                             for i in range(MAX_IDS)]
    mstate = mgr.ManagerState(jnp.asarray(emb0), jnp.asarray(coef0))
    basis = s["basis"]       # oracle-verified builder output (W1-pinned)
    ref.cond_stage_model.celeb_embeddings = torch.from_numpy(basis.copy())
    ref.eval()

    prompts = ["a photo of sks person"] * B
    ids = np.asarray([[0, 0]] * B, np.int32)
    num_ids = np.asarray([1] * B, np.int32)
    z0 = rng.standard_normal((B, 4, IMG // 2, IMG // 2)).astype(np.float32)
    enc_noise = rng.standard_normal(z0.shape).astype(np.float32)

    class _CPUSampler(DDIMSampler):
        def register_buffer(self, name, attr):
            setattr(self, name, attr)

    image_ori = {"faces": None,
                 "ids": torch.from_numpy(ids).long(),
                 "num_ids": torch.full((B,), 1, dtype=torch.long)}
    with torch.no_grad():
        uc = ref.get_learned_conditioning(B * [""])
        c = ref.get_learned_conditioning(prompts, image_ori=image_ori)
        sampler = _CPUSampler(ref)
        sampler.make_schedule(ddim_num_steps=S, ddim_eta=0.0, verbose=False)
        z_enc = sampler.stochastic_encode(
            torch.from_numpy(z0), torch.full((B,), T_ENC, dtype=torch.long),
            noise=torch.from_numpy(enc_noise))
        x_dec = sampler.decode(z_enc, c, T_ENC,
                               unconditional_guidance_scale=SCALE,
                               unconditional_conditioning=uc)
        dec = ref.decode_first_stage(x_dec)
        want = torch.clamp((dec + 1.0) / 2.0, min=0.0, max=1.0).numpy()

    fn = make_img2img_fn(pipe, num_steps=S, strength=T_ENC / S,
                         guidance_scale=SCALE, image_size=IMG)
    nhwc = lambda a: jnp.asarray(a.transpose(0, 2, 3, 1))
    imgs = fn(s["frozen_models"], mstate, jnp.asarray(basis),
              jnp.zeros((B, IMG, IMG, 3), jnp.float32), None,
              jnp.asarray(s["tok"](prompts)), jnp.asarray(s["tok"]([""] * B)),
              jnp.asarray(ids), jnp.asarray(num_ids), jax.random.key(0),
              override_z0=nhwc(z0), override_noise=nhwc(enc_noise))
    got = (np.asarray(imgs).transpose(0, 3, 1, 2) + 1.0) / 2.0

    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


def test_full_trajectory_ti_training_parity(stacks):
    """Full-trajectory TI train oracle: the reference's baseline
    ``EmbeddingManager`` (embedding_manager.py:38-187, the upstream
    textual-inversion manager, num_vectors_per_token=1 simple replacement)
    inside the same tiny LatentDiffusion, trained K steps with the shipped
    ``configure_optimizers`` AdamW (torch default weight decay 1e-2) vs K
    steps of our ``cli/train_ti.make_ti_train_step`` + the shared
    ``make_optimizer`` — per-step losses and the final learned vector must
    agree.  (Caught the TI CLI's bare ``optax.adamw`` default-decay 1e-4
    divergence.)"""
    from celebbasis_tpu.cli.train_ti import make_ti_train_step
    from celebbasis_tpu.core import textual_inversion as ti
    from celebbasis_tpu.models.clip_text import CLIPTextEncoder

    s = stacks
    base = s["ref"]
    pipe = s["pipe"]
    rng = np.random.default_rng(77)
    K_TI = 8

    torch.manual_seed(5)
    ref = _tiny_ref_model(personalization=omegaconf.OmegaConf.create({
        "target": "ldm.modules.embedding_manager.EmbeddingManager",
        "params": {"placeholder_strings": ["sks"],
                   "initializer_words": ["face"],
                   "num_vectors_per_token": 1}}))
    ref.learning_rate = LR
    mp = s["mp"]
    mp.setattr(type(ref), "log_dict", lambda self, *a, **k: None,
               raising=False)
    mp.setattr(type(ref), "log", lambda self, *a, **k: None, raising=False)
    # share the frozen stacks with the already-bridged weights
    ref.model.load_state_dict(base.model.state_dict())
    ref.first_stage_model.load_state_dict(base.first_stage_model.state_dict())
    ref.cond_stage_model.transformer.load_state_dict(
        base.cond_stage_model.transformer.state_dict())
    ref.train()

    # identical TI vector seed on both sides
    v0 = rng.standard_normal((1, TOKEN_DIM)).astype(np.float32)
    with torch.no_grad():
        ref.embedding_manager.string_to_param_dict["sks"].data = \
            torch.from_numpy(v0.copy())
    ti_cfg = ti.TIConfig(placeholder_strings=("sks",),
                         num_vectors_per_token=1, token_dim=TOKEN_DIM)
    ph_id = int(s["tok"](["sks"])[0, 1])
    assert ph_id == int(ref.embedding_manager.string_to_token_dict["sks"])
    params = jnp.asarray(v0[None])                      # (P=1, V=1, D)

    opt_ref = ref.configure_optimizers()
    assert isinstance(opt_ref, torch.optim.AdamW)
    assert opt_ref.param_groups[0]["weight_decay"] == pytest.approx(1e-2)

    optimizer = tstep.make_optimizer(LR)
    opt_state = optimizer.init(params)
    step_fn = make_ti_train_step(pipe, ti_cfg, jnp.asarray([ph_id]),
                                 optimizer)

    prompts = ["a photo of sks person"] * B
    tokens = s["tok"](prompts)
    faces = rng.uniform(-1, 1, (B, FACE, FACE, 6)).astype(np.float32)

    rec = _RngRecorder(mp)
    ref_losses, our_losses = [], []
    for it in range(K_TI):
        images = rng.uniform(-1, 1, (B, IMG, IMG, 3)).astype(np.float32)
        ref_batch = {
            "image": torch.from_numpy(images.copy()),
            "caption": prompts,
            "image_ori": {
                "faces": torch.from_numpy(faces.copy()),
                "ids": torch.zeros((B, 2), dtype=torch.long),
                "num_ids": torch.ones((B,), dtype=torch.long)},
        }
        rec.clear()
        torch.manual_seed(2000 + it)
        loss_ref = ref.training_step(ref_batch, it)
        opt_ref.zero_grad()
        loss_ref.backward()
        opt_ref.step()
        assert len(rec.randn) == 1 and len(rec.randint) == 1 \
            and len(rec.randn_like) == 1
        batch = {
            "image": jnp.asarray(images),
            "tokens": jnp.asarray(tokens),
            "override_znoise": jnp.asarray(
                rec.randn[0].numpy().transpose(0, 2, 3, 1)),
            "override_t": jnp.asarray(
                rec.randint[0].numpy().astype(np.int32)),
            "override_noise": jnp.asarray(
                rec.randn_like[0].numpy().transpose(0, 2, 3, 1)),
        }
        params, opt_state, logs = step_fn(params, opt_state,
                                          s["frozen_models"], batch,
                                          jax.random.key(it))
        ref_losses.append(float(loss_ref))
        our_losses.append(float(logs["loss"]))

    np.testing.assert_allclose(our_losses, ref_losses, atol=2e-3, rtol=2e-3,
                               err_msg=f"TI loss trajectories diverged:\n"
                                       f"ours={our_losses}\nref ={ref_losses}")
    want = ref.embedding_manager.string_to_param_dict["sks"] \
        .detach().numpy()
    np.testing.assert_allclose(np.asarray(params)[0], want, atol=2e-4,
                               rtol=2e-4)
    assert not np.allclose(np.asarray(params)[0], v0)   # actually trained
