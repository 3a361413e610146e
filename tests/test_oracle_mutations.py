"""Negative controls for the K-step trajectory oracles (torch-free).

The composed trajectory oracles (test_composed_train_parity.py,
test_ae_train_oracle.py, test_classifier_train_oracle.py) assert
ours-vs-reference agreement within tolerance T on specific quantities.
Each test here proves those tolerances are load-bearing by the triangle
inequality: run OUR stack twice on identical data and randomness — once
correct, once with one knob mutated to a plausible-bug value (each chosen
from a divergence an oracle actually caught, or the knob class VERDICT r4
named) — and assert the two runs differ by MORE than 2T on the oracle's
pinned quantity.  Since correct-ours sits within T of the reference, the
mutated run necessarily violates the oracle: the oracle is not vacuously
green.  (Running our stack twice is far cheaper than replaying the torch
reference, and proves exactly the same sensitivity.)

Knobs mutated:
* W2 manager momentum 0.99 -> 0.9  (embedding_manager.py:452-490 class)
* W2 AdamW weight decay 1e-2 -> 1e-4  (the class of bug 4f9db70 fixed)
* TI optimizer decay: shipped make_optimizer -> bare optax.adamw
  (EXACTLY the bug the TI oracle caught, f5ab5ef)
* classifier AdamW weight decay 1e-2 -> 0  (dab2cc3's knob)
* VQ commitment beta 0.25 -> 0.5  (the loss-term class 38f5ad7 fixed)

r5 adds the same controls for the W4 score-pipeline oracle
(test_composed_eval_parity.py pins every per-item score at atol=1e-5 —
tightened from 2e-4 after measuring the true two-stack agreement at
<=1.2e-7; the uint8 control below is what forced the tightening, its
1.3e-4 delta sat inside the old tolerance): each mutated knob is a
scoring definition the r5 reference-exact rework of eval/evaluators.py
actually changed — the quantities are recomputed with the plausible-bug
formula on the SAME embeddings/images, so the delta is exactly what the
oracle would see:

* L2 = sqrt(MSE*dim)/2 (clip_eval.py:249) -> plain mean pairwise L2
* MSE on normalized features -> MSE on raw sphere features
* CLIP features on float [-1,1] pixels -> uint8 round-trip first
  (the identity path round-trips, the CLIP path must NOT)
* the `success or i == 0` first-image-always-kept quirk
  (clip_eval.py:195-199) -> plain `success`

and for the W3 composed chain oracle (final latents at atol=2e-3/rtol=1e-3):

* DDIM ``alphas_prev`` off-by-one — the classic port bug of feeding
  alpha_t where the update needs alpha_{t-1} (the reference builds the
  shifted buffer at ddim.py:52-54; dropping the shift is one missed
  ``np.append``)

(The W1 basis oracle carries its own in-test negative control —
``true_dedup=True`` changes the basis, test_composed_basis_parity.py:169 —
and the W0 align oracle pins byte equality, where any knob flip is a
literal byte diff; neither needs a tolerance-sensitivity proof here.)
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from celebbasis_tpu.loader import assemble
from celebbasis_tpu.train import step as tstep
from celebbasis_tpu.utils.config import load_run_spec

import os
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = os.path.join(REPO, "configs", "tiny.yaml")

K = 10
B = 2
IMG = 32
FACE = 32
LR = 1e-2


@pytest.fixture(scope="module")
def asm():
    return assemble(load_run_spec([CFG]), image_size=IMG)


def _exceeds(a, b, atol, rtol, factor=2.0, name=""):
    """Assert max(|a-b| - rtol*|b|) > factor*atol — i.e. allclose(a, b,
    atol=factor*atol, rtol=rtol) would FAIL, hence a-vs-reference would."""
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    excess = np.abs(a - b) - rtol * np.abs(b)
    assert excess.max() > factor * atol, (
        f"{name}: mutation delta {excess.max():.2e} within oracle tolerance "
        f"{factor}x{atol:.0e} — the oracle could not catch this knob")


def _w2_batch(asm, rng):
    tokens = asm.tokenizer(["face of sks person",
                            "a photo of sks person and ks person"])
    return {
        "image": jnp.asarray(
            rng.uniform(-1, 1, (B, IMG, IMG, 3)).astype(np.float32)),
        "tokens": jnp.asarray(tokens),
        "faces": jnp.asarray(
            rng.uniform(-1, 1, (B, 2, FACE, FACE, 3)).astype(np.float32)),
        "ids": jnp.asarray(np.asarray([[0, 1], [0, 1]], np.int32)),
        "num_ids": jnp.asarray(np.asarray([1, 2], np.int32)),
    }


def _w2_run(asm, momentum=0.99, weight_decay=1e-2):
    pipe = asm.pipeline
    orig_cfg = pipe.manager_cfg
    pipe.manager_cfg = dataclasses.replace(orig_cfg, momentum=momentum)
    try:
        trainable, meta_frozen = tstep.split_meta_params(asm.meta_params)
        frozen = {**asm.params, "meta_frozen": meta_frozen}
        opt = tstep.make_optimizer(LR, weight_decay=weight_decay)
        step_fn = jax.jit(tstep.make_train_step(pipe, asm.meta_net, opt))
        state = tstep.init_train_state(jax.random.key(3), trainable, opt,
                                       asm.manager_state)
        rng = np.random.default_rng(7)
        losses = []
        for _ in range(K):
            state, logs = step_fn(state, frozen, asm.basis,
                                  _w2_batch(asm, rng))
            losses.append(float(logs["loss"]))
        mlp_w = np.asarray(
            state.trainable["params"]["mlp"]["layer_0"]["weight"])
        emb = np.asarray(state.manager_state.id_embeddings)
        return losses, mlp_w, emb
    finally:
        pipe.manager_cfg = orig_cfg


def test_w2_oracle_catches_momentum(asm):
    _, _, emb_ok = _w2_run(asm)
    _, _, emb_mut = _w2_run(asm, momentum=0.9)
    # W2 oracle pins the momentum dictionaries at atol=rtol=1e-4
    _exceeds(emb_mut[:2], emb_ok[:2], atol=1e-4, rtol=1e-4,
             name="momentum 0.99->0.9 / id_embeddings")


def test_w2_oracle_catches_weight_decay(asm):
    _, w_ok, _ = _w2_run(asm)
    _, w_mut, _ = _w2_run(asm, weight_decay=1e-4)
    # W2 oracle pins the MLP weights at atol=rtol=2e-4
    _exceeds(w_mut, w_ok, atol=2e-4, rtol=2e-4,
             name="AdamW decay 1e-2->1e-4 / mlp weights")


def _ti_run(asm, optimizer):
    from celebbasis_tpu.cli.train_ti import make_ti_train_step
    from celebbasis_tpu.core import textual_inversion as ti
    pipe = asm.pipeline
    dim = asm.basis.shape[-1]
    rng = np.random.default_rng(77)
    v0 = rng.standard_normal((1, 1, dim)).astype(np.float32)
    params = jnp.asarray(v0)
    ph_id = int(asm.tokenizer(["sks"])[0, 1])
    cfg = ti.TIConfig(placeholder_strings=("sks",), num_vectors_per_token=1,
                      token_dim=dim)
    opt_state = optimizer.init(params)
    step_fn = jax.jit(make_ti_train_step(pipe, cfg, jnp.asarray([ph_id]),
                                         optimizer))
    tokens = asm.tokenizer(["a photo of sks person"] * B)
    for it in range(K):
        batch = {"image": jnp.asarray(
            rng.uniform(-1, 1, (B, IMG, IMG, 3)).astype(np.float32)),
            "tokens": jnp.asarray(tokens)}
        params, opt_state, logs = step_fn(params, opt_state, asm.params,
                                          batch, jax.random.key(it))
    return np.asarray(params)[0]


def test_ti_oracle_catches_bare_adamw(asm):
    """f5ab5ef's exact bug: bare optax.adamw (decay 1e-4) instead of the
    torch-default 1e-2 the reference's configure_optimizers uses."""
    v_ok = _ti_run(asm, tstep.make_optimizer(LR))
    v_mut = _ti_run(asm, optax.adamw(LR))
    # TI oracle pins the final vector at atol=rtol=2e-4
    _exceeds(v_mut, v_ok, atol=2e-4, rtol=2e-4,
             name="bare optax.adamw / TI vector")


def _clf_run(weight_decay):
    from celebbasis_tpu.models.unet import UNetConfig
    from celebbasis_tpu.train.classifier import (ClassifierConfig,
                                                 NoisyLatentClassifier)
    unet_cfg = UNetConfig(in_channels=3, out_channels=3, model_channels=32,
                          channel_mult=(1, 2), num_res_blocks=1,
                          attention_resolutions=(2,), num_heads=-1,
                          num_head_channels=8, use_spatial_transformer=False)
    cfg = ClassifierConfig(num_classes=4, unet=unet_cfg, pool="attention",
                           image_size=8, timesteps=40, linear_start=0.0015,
                           linear_end=0.0195, weight_decay=weight_decay)
    ours = NoisyLatentClassifier(cfg, dtype=jnp.float32)
    params = ours.init(jax.random.key(5))
    state = ours.init_state(params, lr=LR)
    rng = np.random.default_rng(23)
    for it in range(K):
        z = jnp.asarray(rng.uniform(-1, 1, (B, 8, 8, 3)).astype(np.float32))
        y = jnp.asarray(rng.integers(0, 4, (B,)))
        state, _ = ours.train_step(state, z, y, jax.random.key(900 + it))
    return jax.device_get(state["params"])


def test_classifier_oracle_catches_weight_decay():
    p_ok = _clf_run(1e-2)
    p_mut = _clf_run(0.0)
    # classifier oracle pins losses/params at atol=rtol=6e-4
    leaves_ok = jax.tree.leaves(p_ok)
    leaves_mut = jax.tree.leaves(p_mut)
    deltas = [float(np.abs(np.asarray(a, np.float64)
                           - np.asarray(b, np.float64)
                           - 6e-4 * np.abs(np.asarray(b, np.float64))).max())
              for a, b in zip(leaves_mut, leaves_ok)]
    assert max(deltas) > 2 * 6e-4, (
        f"weight-decay mutation delta {max(deltas):.2e} within the "
        "classifier oracle tolerance")


def _vq_run(beta):
    from celebbasis_tpu.models.vae import VAEConfig
    from celebbasis_tpu.models.vq import VQModel
    from celebbasis_tpu.train.ae_loss import (DiscLossConfig,
                                              VQLPIPSWithDiscriminator)
    from celebbasis_tpu.train.ae_trainer import AETrainer, AETrainState
    cfg = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=3,
                    embed_dim=3, double_z=False, resolution=16)
    model = VQModel(cfg, n_embed=16, dtype=jnp.float32, beta=beta)
    loss = VQLPIPSWithDiscriminator(DiscLossConfig(
        disc_start=0, codebook_weight=1.0, disc_weight=0.5, n_classes=16))
    tr = AETrainer(model, loss, learning_rate=LR,
                   tx_g=optax.sgd(LR), tx_d=optax.sgd(LR))
    state = tr.init(jax.random.key(4), image_size=16)
    rng = np.random.default_rng(17)
    for it in range(K):
        x = jnp.asarray(rng.uniform(-1, 1, (B, 16, 16, 3)).astype(np.float32))
        state, _ = tr.train_batch(state, x, jax.random.key(300 + it))
    return jax.device_get(state.params["ae"])


def test_vq_oracle_catches_commitment_beta():
    """38f5ad7's bug class: the weighting of the VQ commitment/codebook
    terms.  The VQ trajectory oracle pins the final state_dict at
    atol 5e-6 — a beta shift must blow through it."""
    p_ok = _vq_run(0.25)
    p_mut = _vq_run(0.5)
    d = max(float(np.abs(np.asarray(a, np.float64)
                         - np.asarray(b, np.float64)).max())
            for a, b in zip(jax.tree.leaves(p_mut), jax.tree.leaves(p_ok)))
    assert d > 2 * 5e-6, (
        f"VQ beta mutation delta {d:.2e} within the AE oracle tolerance")


# ---------------------------------------------------------------------------
# W3 composed chain oracle (test_composed_train_parity.py::test_composed_w3_*,
# final latents at atol=2e-3 / rtol=1e-3)
# ---------------------------------------------------------------------------


def test_w3_oracle_catches_alphas_prev_offset():
    """Run OUR ddim_sample twice — correct schedule vs alphas_prev==alphas
    (the un-shifted buffer) — same tiny eps model, same key, CFG-10 like the
    oracle; the final-latent delta must exceed 2x the W3 tolerance."""
    from celebbasis_tpu.diffusion.sampler import SamplerConfig, ddim_sample
    from celebbasis_tpu.diffusion.schedules import (make_ddim_schedule,
                                                    make_schedule)
    ddim_ok = make_ddim_schedule(make_schedule(), 10)
    ddim_mut = dataclasses.replace(ddim_ok, alphas_prev=ddim_ok.alphas)

    rng = np.random.default_rng(9)
    w = jnp.asarray(0.2 * rng.standard_normal((4, 4)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((1, 3, 4)).astype(np.float32))
    uncond = jnp.zeros_like(cond)

    def eps_model(x, t, ctx):
        # deterministic, context-sensitive (so CFG is exercised), bounded
        drift = ctx.mean(axis=(1, 2))[:, None, None, None]
        return jnp.tanh(jnp.einsum("bhwc,cd->bhwd", x, w)) + 0.1 * drift

    def run(sched):
        return np.asarray(ddim_sample(
            eps_model, sched, rng=jax.random.key(5), shape=(1, 8, 8, 4),
            cond=cond, uncond=uncond,
            cfg=SamplerConfig(guidance_scale=10.0)))

    _exceeds(run(ddim_mut), run(ddim_ok), atol=2e-3, rtol=1e-3,
             name="alphas_prev off-by-one / final latents")


# ---------------------------------------------------------------------------
# W4 score-pipeline oracle (test_composed_eval_parity.py, per-item atol=1e-5)
# ---------------------------------------------------------------------------

W4_ATOL = 1e-5


@pytest.fixture(scope="module")
def id_eval():
    """Tiny-sphere IdentityEvaluator treating inputs as aligned crops
    (face_cropper=None isolates the scoring math from the align chain,
    which the W0 oracle pins byte-for-byte separately)."""
    from celebbasis_tpu.eval.evaluators import IdentityEvaluator
    from celebbasis_tpu.eval.sphere import SphereConfig, SphereNet
    cfg = SphereConfig.tiny()
    params = jax.jit(SphereNet(cfg).init)(
        jax.random.key(11), jnp.zeros((1, 112, 112, 3), jnp.float32))
    return IdentityEvaluator(params, face_cropper=None, cfg=cfg,
                             img_size=112, face_size=112)


def _w4_images(n, seed=31):
    rng = np.random.default_rng(seed)
    return rng.uniform(-1, 1, (n, 112, 112, 3)).astype(np.float32)


def test_w4_oracle_catches_l2_definition(id_eval):
    """Plausible bug: a from-scratch port writes l2_dist as the mean
    pairwise L2 distance; the reference is sqrt(MSE*dim)/2
    (clip_eval.py:249)."""
    from celebbasis_tpu.eval.evaluators import _f_normalize
    imgs = _w4_images(4)
    ok = id_eval.start_calc(imgs[:1], imgs[1:])
    feats = _f_normalize(id_eval.embed_crops(imgs))
    diff = np.tile(feats[:1], (3, 1)) - feats[1:]
    l2_mut = float(np.linalg.norm(diff, axis=1).mean())
    _exceeds(l2_mut, ok["l2_dist"], atol=W4_ATOL, rtol=0,
             name="plain pairwise L2 / l2_dist")


def test_w4_oracle_catches_unnormalized_mse(id_eval):
    """Plausible bug: MSE computed on raw sphere features instead of the
    F.normalize'd ones (clip_eval.py:236-243)."""
    imgs = _w4_images(4, seed=32)
    ok = id_eval.start_calc(imgs[:1], imgs[1:])
    feats = id_eval.embed_crops(imgs)          # raw, NOT normalized
    diff = np.tile(feats[:1], (3, 1)) - feats[1:]
    mse_mut = float((diff ** 2).mean())
    _exceeds(mse_mut, ok["mse_dist"], atol=W4_ATOL, rtol=0,
             name="unnormalized-feature MSE / mse_dist")


def test_w4_oracle_catches_first_image_quirk(id_eval):
    """clip_eval.py:195-199 keeps (and counts has_face) the FIRST image even
    when no face is found.  Mutating `ok or i == 0` to plain `ok` changes
    both the has/no-face counts (oracle: exact equality) and cos_sim."""
    from celebbasis_tpu.eval import evaluators as ev_mod
    imgs = _w4_images(4, seed=33)
    arrs = ((imgs + 1.0) * 127.5).astype(np.uint8)
    # a cropper that fails on the first image seen and crops the rest 2x
    calls = {"n": 0}

    def cropper(img_u8):
        i = calls["n"]
        calls["n"] += 1
        return (img_u8, False) if i == 0 else (img_u8[::2, ::2], True)

    class _NoQuirk(ev_mod.IdentityEvaluator):
        def _check_lmk_box(self, imgs_minus1_1):
            arr = ((imgs_minus1_1 + 1.0) * 127.5).astype(np.uint8)
            kept, has, no = [], 0, 0
            for img in arr:
                crop, okf = self.face_cropper(img)
                if okf:                     # the quirk dropped
                    has += 1
                    kept.append(ev_mod._trans_arr_to_tensor(
                        crop, self.img_size))
                else:
                    no += 1
            return np.stack(kept), has, no

    ok_eval = ev_mod.IdentityEvaluator(
        id_eval.params, face_cropper=cropper, cfg=id_eval.net.cfg,
        img_size=112, face_size=112)
    calls["n"] = 0
    ok = ok_eval.start_calc(imgs[:1], imgs[1:])
    mut_eval = _NoQuirk(
        id_eval.params, face_cropper=cropper, cfg=id_eval.net.cfg,
        img_size=112, face_size=112)
    calls["n"] = 0
    mut = mut_eval.start_calc(imgs[:1], imgs[1:])
    assert (mut["num_has_face"], mut["num_no_face"]) != \
        (ok["num_has_face"], ok["num_no_face"]), "face counts insensitive"
    # with the first (source) slot dropped, crops[:1] is a *generated* crop:
    # cos_sim is a different pairing entirely
    _exceeds(mut["cos_sim"], ok["cos_sim"], atol=W4_ATOL, rtol=0,
             name="first-image quirk / cos_sim")
    del arrs


def test_w4_oracle_catches_clip_uint8_roundtrip():
    """clip_eval.py:27-29 feeds CLIP the FLOAT un-normalized pixels (no
    uint8 round-trip — unlike the identity path).  Mutating the CLIP
    preprocessing to round-trip through uint8 must shift image_sim beyond
    the oracle tolerance."""
    from celebbasis_tpu.eval.evaluators import CLIPEvaluator
    from celebbasis_tpu.models.clip_vit import (CLIPVisionConfig,
                                                CLIPVisionEncoder)
    vcfg = CLIPVisionConfig.tiny()
    vp = jax.jit(CLIPVisionEncoder(vcfg).init)(
        jax.random.key(21),
        jnp.zeros((1, vcfg.image_size, vcfg.image_size, 3), jnp.float32))
    ev = CLIPEvaluator(vp, text_params=None, tokenizer=None, vision_cfg=vcfg)
    rng = np.random.default_rng(41)
    src = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    gen = rng.uniform(-1, 1, (3, 64, 64, 3)).astype(np.float32)
    sim_ok = ev.img_to_img_similarity(src, gen)

    def u8rt(x):
        return ((x + 1.0) * 127.5).astype(np.uint8) \
            .astype(np.float32) / 127.5 - 1.0

    sim_mut = ev.img_to_img_similarity(u8rt(src), u8rt(gen))
    _exceeds(sim_mut, sim_ok, atol=W4_ATOL, rtol=0,
             name="uint8 round-trip CLIP preprocessing / image_sim")
