#!/usr/bin/env python
"""Full-size bridge parity: reference torch models -> bridge -> Flax (CPU fp32).

Reproducible version of the round-1 claim that the production-size bridges
are exact: instantiates the *reference's own* torch modules (imported from
/root/reference, never copied) at FULL size with random weights, converts via
``celebbasis_tpu.utils.bridge``, and reports max-abs-error per model.

Spatial inputs are kept small (32² latents / 64² pixels) — every weight still
participates, only the spatial extent of the activations shrinks, so the
key-mapping/layout claim is exercised at full parameter count without hours
of 1-core CPU conv time.

Usage:  CELEBBASIS_PLATFORM=cpu python scripts/verify_full_parity.py [model...]
        models: unet vae clip iresnet   (default: all)

Reference configs: UNet/VAE `configs/stable-diffusion/aigc_id.yaml:39-77`,
CLIP ViT-L text `ldm/modules/encoders/modules.py:157-175`, CosFace R100
`ldm/modules/id_embedding/iresnet.py:232` + key prefixes `ddpm.py:195-217`.
Expected runtime: ~10-20 min total on this 1-core box (UNet dominates).
"""
import gc
import os
import sys
import time

os.environ.setdefault("CELEBBASIS_PLATFORM", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests", "_stubs"))  # omegaconf stub
sys.path.insert(0, "/root/reference")

import numpy as np  # noqa: E402

import celebbasis_tpu  # noqa: E402,F401  (platform knob)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402


def _np_state(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def _report(name, got, want, atol, relative=False):
    err = float(np.abs(np.asarray(got, np.float32)
                       - np.asarray(want, np.float32)).max())
    kind = "max_abs_err"
    if relative:       # deep residual nets emit O(1e6) values at random init
        err /= float(np.abs(want).max()) + 1e-12
        kind = "max_err/max|ref|"
    status = "OK " if err <= atol else "FAIL"
    print(f"[{status}] {name}: {kind}={err:.3e} (tol={atol:.0e})")
    return err <= atol


def verify_unet():
    """SD v1.4 UNet, 859.5M params (aigc_id.yaml:39-54)."""
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as RefUNet
    from celebbasis_tpu.models.unet import UNetConfig, UNetModel
    from celebbasis_tpu.utils import bridge

    torch.manual_seed(0)
    t0 = time.time()
    ref = RefUNet(image_size=32, in_channels=4, out_channels=4,
                  model_channels=320, attention_resolutions=[4, 2, 1],
                  num_res_blocks=2, channel_mult=[1, 2, 4, 4], num_heads=8,
                  use_spatial_transformer=True, transformer_depth=1,
                  context_dim=768, use_checkpoint=False, legacy=False).eval()
    n_params = sum(p.numel() for p in ref.parameters())
    print(f"  ref UNet built: {n_params/1e6:.1f}M params "
          f"({time.time()-t0:.0f}s)")
    x = torch.randn(1, 4, 32, 32)
    t = torch.tensor([981])
    c = torch.randn(1, 77, 768)
    with torch.no_grad():
        want = ref(x, t, c).numpy()
    print(f"  ref forward done ({time.time()-t0:.0f}s)")

    cfg = UNetConfig.sd_v1()
    state = {f"model.diffusion_model.{k}": v for k, v in _np_state(ref).items()}
    del ref
    gc.collect()
    params = bridge.convert_unet(state, cfg)
    del state
    gc.collect()
    model = UNetModel(cfg, dtype=jnp.float32)
    got = jax.jit(model.apply)(params,
                               jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                               jnp.asarray(t.numpy()),
                               jnp.asarray(c.numpy()))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    print(f"  flax forward done ({time.time()-t0:.0f}s)")
    return _report("unet-sd-v1-4 (860M)", got, want, atol=2e-4)


def verify_vae():
    """SD first-stage KL-f8 autoencoder, 83.7M params (aigc_id.yaml:56-77)."""
    from ldm.modules.diffusionmodules.model import Encoder as RefEnc, \
        Decoder as RefDec
    from celebbasis_tpu.models.vae import AutoencoderKL, VAEConfig
    from celebbasis_tpu.utils import bridge

    torch.manual_seed(1)
    dd = dict(double_z=True, z_channels=4, resolution=256, in_channels=3,
              out_ch=3, ch=128, ch_mult=[1, 2, 4, 4], num_res_blocks=2,
              attn_resolutions=[], dropout=0.0)
    enc, dec = RefEnc(**dd).eval(), RefDec(**dd).eval()
    quant, post_quant = torch.nn.Conv2d(8, 8, 1), torch.nn.Conv2d(4, 4, 1)
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        mean = quant(enc(x)).chunk(2, dim=1)[0].numpy()
        dec_out = dec(post_quant(torch.from_numpy(mean))).numpy()

    cfg = VAEConfig()  # full-size default: ch=128, (1,2,4,4), 2 blocks
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
    ok = _report("vae-encode (84M)", np.asarray(got_mean).transpose(0, 3, 1, 2),
                 mean, atol=2e-4)
    got_dec = jax.jit(
        lambda p, zz: model.apply(p, zz, method=AutoencoderKL.decode))(
            params, jnp.asarray(mean.transpose(0, 2, 3, 1)))
    return _report("vae-decode", np.asarray(got_dec).transpose(0, 3, 1, 2),
                   dec_out, atol=2e-4) and ok


def verify_clip():
    """CLIP ViT-L/14 text encoder, 123M params (modules.py:157-175)."""
    import transformers
    from celebbasis_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
    from celebbasis_tpu.utils import bridge

    tcfg = transformers.CLIPTextConfig(
        vocab_size=49408, hidden_size=768, intermediate_size=3072,
        num_hidden_layers=12, num_attention_heads=12,
        max_position_embeddings=77, hidden_act="quick_gelu")
    torch.manual_seed(2)
    ref = transformers.CLIPTextModel(tcfg).eval()
    ids = torch.randint(0, 49408, (2, 77))
    with torch.no_grad():
        want = ref(input_ids=ids).last_hidden_state.numpy()

    cfg = CLIPTextConfig()  # full-size default ViT-L text
    state = {f"cond_stage_model.transformer.{k}": v
             for k, v in _np_state(ref).items()}
    params = bridge.convert_clip_text(state, layers=cfg.layers)
    model = CLIPTextEncoder(cfg, dtype=jnp.float32)
    got = jax.jit(model.apply)(params, jnp.asarray(ids.numpy()))
    return _report("clip-text-vit-l (123M)", got, want, atol=2e-4)


def verify_iresnet():
    """CosFace IResNet-100, 65.2M params (iresnet.py:232, meta_net.py:348)."""
    from ldm.modules.id_embedding.iresnet import iresnet100
    from celebbasis_tpu.models.iresnet import IResNet, IResNetConfig
    from celebbasis_tpu.utils import bridge

    torch.manual_seed(3)
    ref = iresnet100(num_features=512).eval()
    # at random init the 100-layer residual stack overflows by layer3 (eval
    # BN has identity running stats, so block outputs compound unchecked —
    # verified: the torch reference itself hits inf/nan).  Scale the conv
    # weights down and randomize BN stats so the forward stays finite and
    # the running-stat bridging is exercised.
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.Conv2d):
                m.weight *= 0.25
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    x = torch.randn(2, 3, 112, 112)
    with torch.no_grad():
        want = ref(x).numpy()

    cfg = IResNetConfig()  # full-size default r100
    params = bridge.convert_iresnet(_np_state(ref), layers=cfg.layers)
    model = IResNet(cfg, dtype=jnp.float32)
    got = jax.jit(model.apply)(params,
                               jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    return _report("iresnet100 (65M)", got, want, atol=1e-5, relative=True)


ALL = {"unet": verify_unet, "vae": verify_vae, "clip": verify_clip,
       "iresnet": verify_iresnet}


# --------------------------------------------------------------------------
# readiness runbook (VERDICT r3 #6): one command that proves the whole
# real-weights path, dry-runnable today with random-init torch oracles.
# --------------------------------------------------------------------------

# the four checkpoints a reference user brings (MIGRATION.md "Weights"):
# manifest name -> canonical drop-in path (relative to repo root)
EXPECTED_CKPTS = {
    "sd-v1-4": "weights/sd-v1-4.ckpt",
    "cosface_r100": "weights/glint360k_cosface_r100.pth",
    "pipnet_wflw_r101": "weights/pipnet_r101_epoch59.pth",
    "faceboxesv2": "weights/faceboxesv2.pth",
    "sphere20": "weights/net_sphere20_data_vggface2_acc_9955.pth",
    "fid_inception": "weights/pt_inception-2015-12-05.pth",
}


def run_readiness():
    """Run the full readiness chain, each stage a subprocess (bounded memory
    on this 1-core box), and emit a single pass/fail report.

    Stages, covering all five workloads, and their expected tolerances:
      manifest-dryrun   zero-filled bridges over every manifest     (exact)
      ckpt-vs-manifest  real files present? key/shape diff          (exact)
      bridge-golden     random-init torch oracle fwd parity         (2e-4)
      composed-W0       reference align chain replay, crop bytes    (exact)
      composed-W1       reference _get_celeb_embeddings replay      (fp32)
      composed-W2+W3    k-step training_step + DDIM chain replay    (fp32)
      composed-W4       reference score-pipeline replay             (fp32)
      align-bench       W0 crops/s on the attached device (needs
                        faceboxes+pipnet weights; SKIP otherwise)
      tiny-fid          FID of a folder against itself == 0 through
                        the real Inception bridge (needs
                        fid_inception weights; SKIP otherwise)
      bench             one bench.py line on the attached device
    """
    import subprocess
    py = sys.executable
    report = []

    def stage(name, cmd, timeout=3600, on_device=False):
        # this process pins itself to CPU (setdefault above); the bench stage
        # must NOT inherit that or it silently measures the host, not the TPU
        env = dict(os.environ)
        if on_device:
            env.pop("CELEBBASIS_PLATFORM", None)
        print(f"\n==== {name}: {' '.join(cmd)} ====", flush=True)
        t0 = time.time()
        r = subprocess.run(cmd, cwd=REPO, timeout=timeout, env=env)
        ok = r.returncode == 0
        report.append((name, ok, time.time() - t0))
        return ok

    stage("manifest-dryrun", [py, "scripts/verify_weights.py"])
    for name, rel in EXPECTED_CKPTS.items():
        path = os.path.join(REPO, rel)
        if os.path.exists(path):
            stage(f"ckpt-vs-manifest:{name}",
                  [py, "scripts/verify_weights.py", "--check", path, name])
        else:
            print(f"[skip] {name}: {rel} absent — random-init oracle only")
            report.append((f"ckpt-vs-manifest:{name}", None, 0.0))
    stage("bridge-golden", [py, "scripts/verify_full_parity.py"])
    stage("composed-W0",
          [py, "-m", "pytest", "tests/test_composed_align_parity.py", "-q"])
    stage("composed-W1",
          [py, "-m", "pytest", "tests/test_composed_basis_parity.py", "-q"])
    stage("composed-W2+W3",
          [py, "-m", "pytest", "tests/test_composed_train_parity.py",
           "tests/test_composed_parity.py", "-q"])
    stage("composed-W4",
          [py, "-m", "pytest", "tests/test_composed_eval_parity.py", "-q"])
    # device stages gated on real weights (the two workload-specific ends)
    fb = os.path.join(REPO, EXPECTED_CKPTS["faceboxesv2"])
    pn = os.path.join(REPO, EXPECTED_CKPTS["pipnet_wflw_r101"])
    if os.path.exists(fb) and os.path.exists(pn):
        stage("align-bench", [py, "scripts/bench_align.py",
                              "--detector_ckpt", fb, "--pipnet_ckpt", pn],
              on_device=True)
    else:
        print("[skip] align-bench: faceboxes/pipnet weights absent")
        report.append(("align-bench", None, 0.0))
    inc = os.path.join(REPO, EXPECTED_CKPTS["fid_inception"])
    if os.path.exists(inc):
        stage("tiny-fid", [py, "scripts/bench_align.py", "--tiny_fid",
                           "--inception_ckpt", inc], on_device=True)
    else:
        print("[skip] tiny-fid: fid_inception weights absent")
        report.append(("tiny-fid", None, 0.0))
    stage("bench", [py, "bench.py"], on_device=True)

    print("\n================ readiness report ================")
    all_ok = True
    for name, ok, dt in report:
        mark = "SKIP" if ok is None else ("OK  " if ok else "FAIL")
        all_ok = all_ok and (ok is not False)
        print(f"[{mark}] {name:28s} {dt:7.0f}s")
    print("READY" if all_ok else "NOT READY")
    return 0 if all_ok else 1


def main(argv):
    if "--readiness" in argv:
        return run_readiness()
    names = argv or list(ALL)
    ok = True
    for n in names:
        print(f"== {n} ==")
        ok = ALL[n]() and ok
        gc.collect()
    print("ALL OK" if ok else "FAILURES")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
