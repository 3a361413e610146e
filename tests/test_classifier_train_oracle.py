"""K-step NoisyLatentImageClassifier train trajectory oracle.

Replays the reference's OWN ``NoisyLatentImageClassifier.training_step``
(`/root/reference/ldm/models/diffusion/classifier.py:179-202` shared_step:
frozen-LDM get_input -> get_x_noisy(q_sample at random t) -> EncoderUNetModel
-> F.cross_entropy) with ``configure_optimizers``'s
``AdamW(model.parameters(), lr, weight_decay=1e-2)`` (classifier.py:222-237)
for K batches against K ``NoisyLatentClassifier.train_step`` calls on
bridge-shared weights, asserting per-step loss agreement and final
classifier-parameter agreement.

The frozen diffusion model is the reference's real tiny unconditional
``LatentDiffusion`` with a VQ first stage (deterministic encode — no
posterior draw to synchronize); its ``get_input`` latents are recorded and
fed to our trainer, which takes latents directly by design.

Randomness: the reference draws t (torch.randint, shared_step) and the
q-noise (torch.randn_like, get_x_noisy) from torch's global RNG; both are
recorded and replayed into our step via ``t_override``/``noise_override``.

Two latent reference bugs on this (shipped-config-unreachable: no config
trains the classifier) path, worked around without touching its logic:

* ``get_x_noisy`` reads ``diffusion_model.use_continuous_noise``, an
  attribute this repo's LatentDiffusion never defines (vestigial from a
  different LDM lineage) — injected as False, selecting the only
  well-defined branch;
* it then passes ``continuous_sqrt_alpha_cumprod=None`` to ``q_sample``,
  which accepts no such kwarg (ddpm.py:289) — shimmed per-instance to drop
  the None kwarg and call the real q_sample.

``write_logs`` (classifier.py:161-177, logging-only: every input detached,
body is Lightning log_dict/optimizers plumbing absent in this image) is
no-op'd on the instance.
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests/_stubs")
sys.path.insert(0, "/root/reference")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

torch = pytest.importorskip("torch")

from celebbasis_tpu.models.unet import UNetConfig  # noqa: E402
from celebbasis_tpu.train.classifier import (ClassifierConfig,  # noqa: E402
                                             NoisyLatentClassifier)
from celebbasis_tpu.utils import bridge  # noqa: E402

B, IMG, K = 2, 32, 8
NUM_CLASSES = 7
TIMESTEPS = 16
LR = 1e-3


def _tiny_ref_ldm():
    """The reference's LatentDiffusion, unconditional, VQ first stage
    (deterministic encode), tiny — the classifier's frozen noise source.

    Construction quirks of this fork's ctor on the unconditional path:
    ``personalization_config`` is a REQUIRED positional (ddpm.py:444) even
    for unconditional models (satisfied by the NullManager stub), and the
    default ``unfreeze_model=False`` branch calls
    ``self.cond_stage_model.eval()`` (ddpm.py:490-494) which crashes when
    instantiate_cond_stage set it to None — so unfreeze_model=True skips
    that block and the test freezes the diffusion params itself."""
    from ldm.util import instantiate_from_config
    omegaconf = pytest.importorskip("omegaconf")
    cfg = {
        "target": "ldm.models.diffusion.ddpm.LatentDiffusion",
        "params": {
            "linear_start": 0.0015, "linear_end": 0.0195,
            "timesteps": TIMESTEPS, "image_size": IMG // 2, "channels": 3,
            "monitor": "val/loss", "first_stage_key": "image",
            "unfreeze_model": True, "model_lr": 0.0,
            "personalization_config": {"target": "clf_oracle_stub.NullManager",
                                       "params": {}},
            "unet_config": {
                "target":
                    "ldm.modules.diffusionmodules.openaimodel.UNetModel",
                "params": {"image_size": IMG // 2, "in_channels": 3,
                           "out_channels": 3, "model_channels": 32,
                           "attention_resolutions": [2],
                           "num_res_blocks": 1, "channel_mult": [1, 2],
                           "num_head_channels": 8}},
            "first_stage_config": {
                "target": "ldm.models.autoencoder.VQModelInterface",
                "params": {"embed_dim": 3, "n_embed": 32,
                           "lossconfig": {"target": "torch.nn.Identity"},
                           "ddconfig": {"double_z": False, "z_channels": 3,
                                        "resolution": IMG, "in_channels": 3,
                                        "out_ch": 3, "ch": 32,
                                        "ch_mult": [1, 2],
                                        "num_res_blocks": 1,
                                        "attn_resolutions": [],
                                        "dropout": 0.0}}},
            "cond_stage_config": "__is_unconditional__",
        },
    }
    # instantiate_embedding_manager does `config.params.get` (ddpm.py:573) —
    # the config must be an omegaconf node, as when loaded from yaml
    return instantiate_from_config(omegaconf.OmegaConf.create(cfg))


def test_classifier_train_trajectory(monkeypatch):
    from ldm.models.diffusion.classifier import NoisyLatentImageClassifier
    from ldm.modules.diffusionmodules.openaimodel import \
        EncoderUNetModel as RefEnc

    torch.manual_seed(3)
    ldm_ref = _tiny_ref_ldm().eval()
    for p in ldm_ref.parameters():
        p.requires_grad = False
    ldm_ref.use_continuous_noise = False        # see module docstring

    orig_q = ldm_ref.q_sample

    def q_shim(x_start, t, noise=None, continuous_sqrt_alpha_cumprod=None):
        assert continuous_sqrt_alpha_cumprod is None
        return orig_q(x_start=x_start, t=t, noise=noise)

    monkeypatch.setattr(ldm_ref, "q_sample", q_shim)

    z_rec = []
    orig_get_input = ldm_ref.get_input

    def rec_get_input(batch, k, **kw):
        out = orig_get_input(batch, k, **kw)
        z_rec.append(out[0].detach().clone())
        return out

    monkeypatch.setattr(ldm_ref, "get_input", rec_get_input)

    # load_classifier (classifier.py:95-102): the diffusion unet config with
    # in=its out_channels, out=num_classes, pool injected
    torch.manual_seed(4)
    ref_clf_net = RefEnc(image_size=IMG // 2, in_channels=3,
                         out_channels=NUM_CLASSES, model_channels=32,
                         num_res_blocks=1, attention_resolutions=[2],
                         channel_mult=[1, 2], num_head_channels=8,
                         pool="attention", use_checkpoint=False)

    clf = NoisyLatentImageClassifier.__new__(NoisyLatentImageClassifier)
    torch.nn.Module.__init__(clf)
    clf.num_classes = NUM_CLASSES
    clf.label_key = "class_label"
    clf.diffusion_model = ldm_ref
    clf.model = ref_clf_net
    clf.numd = ldm_ref.first_stage_model.encoder.num_resolutions - 1
    clf.log_steps = 10
    clf.log_time_interval = TIMESTEPS // 10 or 1
    clf.weight_decay = 1e-2
    clf.use_scheduler = False
    clf.scheduler_config = None
    monkeypatch.setattr(clf, "write_logs",
                        lambda *a, **k: None)       # logging-only (docstring)
    clf.train()

    # record the reference's two per-step global-RNG draws
    t_draws, noise_draws = [], []
    orig_randint, orig_randn_like = torch.randint, torch.randn_like

    def rec_randint(*a, **k):
        out = orig_randint(*a, **k)
        t_draws.append(out.detach().clone())
        return out

    def rec_randn_like(*a, **k):
        out = orig_randn_like(*a, **k)
        noise_draws.append(out.detach().clone())
        return out

    monkeypatch.setattr(torch, "randint", rec_randint)
    monkeypatch.setattr(torch, "randn_like", rec_randn_like)

    # configure_optimizers (classifier.py:222-237), no scheduler
    opt = torch.optim.AdamW(clf.model.parameters(), lr=LR,
                            weight_decay=clf.weight_decay)

    # ---- our stack on bridged weights --------------------------------------
    unet_cfg = UNetConfig(in_channels=3, out_channels=3, model_channels=32,
                          channel_mult=(1, 2), num_res_blocks=1,
                          attention_resolutions=(2,), num_heads=-1,
                          num_head_channels=8, use_spatial_transformer=False)
    cfg = ClassifierConfig(num_classes=NUM_CLASSES, unet=unet_cfg,
                           pool="attention", image_size=IMG // 2,
                           timesteps=TIMESTEPS, linear_start=0.0015,
                           linear_end=0.0195, weight_decay=1e-2)
    ours = NoisyLatentClassifier(cfg, dtype=jnp.float32)
    state0 = {f"model.{k}": v.detach().numpy().copy()
              for k, v in ref_clf_net.state_dict().items()}
    params = jax.tree.map(jnp.asarray, bridge.convert_encoder_unet(
        state0, cfg.classifier_cfg(), pool="attention"))
    state = ours.init_state(params, lr=LR)

    rng_np = np.random.default_rng(23)
    ref_losses, our_losses, our_acc1 = [], [], []
    for it in range(K):
        x_np = rng_np.uniform(-1, 1, (B, IMG, IMG, 3)).astype(np.float32)
        y_np = rng_np.integers(0, NUM_CLASSES, (B,))
        batch = {"image": torch.from_numpy(x_np),
                 "class_label": torch.from_numpy(y_np).long()}

        loss = clf.training_step(batch, it)
        opt.zero_grad()
        loss.backward()
        opt.step()
        ref_losses.append(float(loss.detach()))

        assert len(z_rec) == len(t_draws) == len(noise_draws) == it + 1
        z = jnp.asarray(z_rec[it].numpy().transpose(0, 2, 3, 1))
        t_ov = jnp.asarray(t_draws[it].numpy())
        n_ov = jnp.asarray(noise_draws[it].numpy().transpose(0, 2, 3, 1))
        state, log = ours.train_step(state, z, jnp.asarray(y_np),
                                     jax.random.key(900 + it),
                                     t_override=t_ov, noise_override=n_ov)
        our_losses.append(float(log["train/loss"]))
        our_acc1.append(float(log["train/acc@1"]))

    # tolerance floor: the EncoderUNetModel fwd golden itself needs atol 3e-4
    # (test_classifier.py) — step 0 here differs ~1e-4 before any update, so
    # per-step agreement beyond ~6e-4 is fp32 cross-framework noise, not
    # logic (AdamW-vs-optax parity is pinned tight in the W2 oracle)
    np.testing.assert_allclose(
        our_losses, ref_losses, rtol=6e-4, atol=6e-4,
        err_msg=f"classifier loss trajectories diverged:\nours={our_losses}"
                f"\nref ={ref_losses}")
    assert all(0.0 <= a <= 1.0 for a in our_acc1)

    # final classifier params: bridge the reference's end state into our
    # layout and compare leaf-for-leaf
    state1 = {f"model.{k}": v.detach().numpy()
              for k, v in ref_clf_net.state_dict().items()}
    want = bridge.convert_encoder_unet(state1, cfg.classifier_cfg(),
                                       pool="attention")
    got = jax.device_get(state["params"])
    flat_w = jax.tree_util.tree_flatten_with_path(want)[0]
    flat_g = dict(jax.tree_util.tree_flatten_with_path(got)[0])
    assert len(flat_w) == len(flat_g)
    # Param-pin bounds: AdamW's sqrt(v)-normalization turns fp32 grad noise
    # into sign-flipped full-lr steps on low-|grad| elements early in
    # training — individual elements scatter by up to the total step budget
    # K*LR (observed: up to 3.1e-3 on ~0.1-2% of elements).  So per leaf:
    # every element within the K*LR budget (hard Adam bound), and the mean
    # |diff| under 2e-4 (a partition/decay bug moves whole-leaf means by
    # ~K*LR, 30x that; per-step behavior is pinned by the losses above).
    budget = K * LR * 1.2
    for path, w in flat_w:
        name = jax.tree_util.keystr(path)
        diff = np.abs(np.asarray(flat_g[path]) - np.asarray(w))
        assert diff.max() < budget, (name, diff.max())
        assert float(diff.mean()) < 2e-4, (name, float(diff.mean()))
    # the trajectory actually trained (params moved from init)
    moved = np.abs(np.asarray(params["params"]["conv_in"]["kernel"])
                   - np.asarray(got["params"]["conv_in"]["kernel"])).max()
    assert moved > 1e-5
