#!/usr/bin/env python
"""Checkpoint manifest generation + dry-run validation (no weights needed).

Pretrained checkpoints are not shipped in this image, but the day they drop
in, every bridge must load them first try.  This tool makes that verifiable
NOW (VERDICT round-1, item 9):

* ``--gen``  — instantiate the *reference's own* torch modules (random
  weights) for every checkpoint the framework consumes and record each
  state-dict's key->shape map into ``manifests/<name>.json``.
* default   — for every manifest, build a zero-filled state dict with the
  recorded shapes and run the real bridge converter over it.  A converter
  that expects a missing key, mis-shapes a transpose, or silently ignores a
  weight fails here, long before a real 7 GB download.
* ``--check PATH NAME`` — load a real checkpoint (torch-free ``pt_io``) and
  diff its keys/shapes against the manifest.

Checkpoint sources (reference): sd-v1-4 ``ddpm.py:195-217``; CosFace R100
``meta_net.py:348-355``; PIPNet ``lib/networks.py:12-110`` + ``epoch59.pth``;
FaceBoxesV2 ``FaceBoxesV2/utils/faceboxes.py``; sphere20
``evaluation/face_align/cosface/net.py``; CLIP ViT-B/32 eval tower
``evaluation/clip_eval.py:20-77``; FID InceptionV3 (pytorch-fid variant)
``evaluation/fid/copy_together.py``.
"""
import argparse
import json
import os
import sys

os.environ.setdefault("CELEBBASIS_PLATFORM", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MANIFEST_DIR = os.path.join(REPO, "manifests")
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests", "_stubs"))
sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/reference/evaluation/face_align/PIPNet")

import numpy as np  # noqa: E402

import celebbasis_tpu  # noqa: E402,F401

# keys torch emits that no bridge consumes (BN step counters, HF buffers)
IGNORED_SUFFIXES = ("num_batches_tracked", "position_ids")


# --------------------------------------------------------------------------
# manifest generation (torch + reference modules; --gen only)
# --------------------------------------------------------------------------

def _state_shapes(mod, prefix=""):
    return {f"{prefix}{k}": list(v.shape) for k, v in mod.state_dict().items()}


def gen_sd_v1_4():
    import torch
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as RefUNet
    from ldm.modules.diffusionmodules.model import Encoder, Decoder
    import transformers

    unet = RefUNet(image_size=32, in_channels=4, out_channels=4,
                   model_channels=320, attention_resolutions=[4, 2, 1],
                   num_res_blocks=2, channel_mult=[1, 2, 4, 4], num_heads=8,
                   use_spatial_transformer=True, transformer_depth=1,
                   context_dim=768, use_checkpoint=False, legacy=False)
    keys = _state_shapes(unet, "model.diffusion_model.")
    del unet
    dd = dict(double_z=True, z_channels=4, resolution=256, in_channels=3,
              out_ch=3, ch=128, ch_mult=[1, 2, 4, 4], num_res_blocks=2,
              attn_resolutions=[], dropout=0.0)
    keys.update(_state_shapes(Encoder(**dd), "first_stage_model.encoder."))
    keys.update(_state_shapes(Decoder(**dd), "first_stage_model.decoder."))
    keys.update(_state_shapes(torch.nn.Conv2d(8, 8, 1),
                              "first_stage_model.quant_conv."))
    keys.update(_state_shapes(torch.nn.Conv2d(4, 4, 1),
                              "first_stage_model.post_quant_conv."))
    tcfg = transformers.CLIPTextConfig(
        vocab_size=49408, hidden_size=768, intermediate_size=3072,
        num_hidden_layers=12, num_attention_heads=12,
        max_position_embeddings=77, hidden_act="quick_gelu")
    keys.update(_state_shapes(transformers.CLIPTextModel(tcfg),
                              "cond_stage_model.transformer."))
    return keys, {"note": "real ckpt also carries DDPM buffers (betas, "
                          "alphas_cumprod, logvar, ...) and model_ema.* "
                          "copies; --check reports those as ignored extras"}


def gen_cosface_r100():
    from ldm.modules.id_embedding.iresnet import iresnet100
    return _state_shapes(iresnet100(num_features=512)), {
        "note": "glint360k_cosface_r100_fp16_0.1/backbone.pth"}


def gen_pipnet():
    from lib.networks import Pip_resnet101
    import torch_resnet  # tests/_stubs: torchvision-compatible Bottleneck net
    net = Pip_resnet101(torch_resnet.resnet(layers=(3, 4, 23, 3)), num_nb=10,
                        num_lms=98, input_size=256, net_stride=32)
    return _state_shapes(net), {
        "note": "snapshots/WFLW/pip_32_16_60_r101_l2_l1_10_1_nb10/epoch59.pth"}


def gen_faceboxes():
    from FaceBoxesV2.utils.faceboxes import FaceBoxesV2
    return _state_shapes(FaceBoxesV2("test", None, 2)), {
        "note": "FaceBoxesV2.pth (weights/)"}


def gen_sphere20():
    sys.path.insert(0, "/root/reference/evaluation/face_align")
    from cosface.net import sphere
    return _state_shapes(sphere(type=20)), {
        "note": "ACC99.28.pth (cosface eval net)"}


def gen_clip_vit_b32():
    import transformers
    cfg = transformers.CLIPConfig.from_text_vision_configs(
        transformers.CLIPTextConfig(
            vocab_size=49408, hidden_size=512, intermediate_size=2048,
            num_hidden_layers=12, num_attention_heads=8,
            max_position_embeddings=77, hidden_act="quick_gelu",
            projection_dim=512),
        transformers.CLIPVisionConfig(
            hidden_size=768, intermediate_size=3072, num_hidden_layers=12,
            num_attention_heads=12, image_size=224, patch_size=32,
            hidden_act="quick_gelu", projection_dim=512),
        projection_dim=512)
    return _state_shapes(transformers.CLIPModel(cfg)), {
        "note": "openai/clip-vit-base-patch32 (HF layout; OpenAI-layout "
                "ckpts are auto-detected by cli/eval_imgs.py)"}


def gen_fid_inception():
    from fid_inception_torch import FIDInceptionV3  # tests/_stubs oracle
    return _state_shapes(FIDInceptionV3()), {
        "note": "pt_inception-2015-12-05 (pytorch-fid) key layout"}


GENERATORS = {
    "sd-v1-4": gen_sd_v1_4,
    "cosface_r100": gen_cosface_r100,
    "pipnet_wflw_r101": gen_pipnet,
    "faceboxesv2": gen_faceboxes,
    "sphere20": gen_sphere20,
    "clip_vit_b32": gen_clip_vit_b32,
    "fid_inception": gen_fid_inception,
}


# --------------------------------------------------------------------------
# dry-run: manifest-shaped zeros through the real converters (torch-free)
# --------------------------------------------------------------------------

def _zero_state(keys):
    return {k: np.zeros(shape, np.float32) for k, shape in keys.items()}


def dry_sd(state):
    from celebbasis_tpu.utils import bridge
    from celebbasis_tpu.models.unet import UNetConfig
    return [bridge.convert_unet(state, UNetConfig.sd_v1()),
            bridge.convert_vae(state),
            bridge.convert_clip_text(state)]


def dry_cosface(state):
    from celebbasis_tpu.utils import bridge
    return [bridge.convert_iresnet(state)]


def dry_pipnet(state):
    from celebbasis_tpu.align.pipnet import PIPNetConfig
    from celebbasis_tpu.utils.bridge_align import convert_pipnet
    return [convert_pipnet(state, PIPNetConfig())]


def dry_faceboxes(state):
    from celebbasis_tpu.utils.bridge_align import convert_faceboxes
    return [convert_faceboxes(state)]


def dry_sphere(state):
    from celebbasis_tpu.eval.sphere import convert_sphere, SphereConfig
    return [convert_sphere(state, SphereConfig.sphere20())]


def dry_clip_b32(state):
    from celebbasis_tpu.models.clip_vit import (CLIPVisionConfig,
                                                convert_hf_clip)
    from celebbasis_tpu.models.clip_text import CLIPTextConfig
    tcfg = CLIPTextConfig(width=512, layers=12, heads=8, mlp_dim=2048)
    return list(convert_hf_clip(state, CLIPVisionConfig.vit_b32(), tcfg))


def dry_inception(state):
    from celebbasis_tpu.eval.inception import convert_inception
    return [convert_inception(state)]


DRYRUNS = {
    "sd-v1-4": dry_sd,
    "cosface_r100": dry_cosface,
    "pipnet_wflw_r101": dry_pipnet,
    "faceboxesv2": dry_faceboxes,
    "sphere20": dry_sphere,
    "clip_vit_b32": dry_clip_b32,
    "fid_inception": dry_inception,
}

# manifest keys a converter legitimately never reads
ALLOWED_UNUSED = {
    "clip_vit_b32": ("logit_scale",),            # scorer applies cosine itself
    "fid_inception": ("AuxLogits.", "fc."),      # not part of pool3 features
}


def _is_allowed_unused(name, key):
    if key.endswith(IGNORED_SUFFIXES):
        return True
    return any(key.startswith(p) or p in key
               for p in ALLOWED_UNUSED.get(name, ()))


def dryrun(name, keys) -> bool:
    from celebbasis_tpu.utils.bridge import KeyMap
    state = _zero_state(keys)
    with KeyMap.tracking() as kms:
        trees = DRYRUNS[name](state)
    assert all(t for t in trees)
    used = set().union(*(km.used for km in kms)) if kms else set(state)
    # converters strip checkpoint prefixes before building their KeyMap, so
    # a manifest key counts as consumed when any used key is its suffix
    def consumed(k):
        return k in used or any(k.endswith(u) for u in used)
    unused = [k for k in state if not consumed(k)
              and not _is_allowed_unused(name, k)]
    # convert_inception consumes by iteration, not KeyMap — full coverage
    if name == "fid_inception":
        unused = []
    if unused:
        print(f"[FAIL] {name}: {len(unused)} manifest keys not consumed, "
              f"e.g. {unused[:5]}")
        return False
    print(f"[OK ] {name}: {len(state)} keys -> "
          f"{sum(len(jax_tree_leaves(t)) for t in trees)} params consumed")
    return True


def jax_tree_leaves(tree):
    import jax
    return jax.tree.leaves(tree)


def check(path, name) -> bool:
    """Diff a real checkpoint against the manifest."""
    from celebbasis_tpu.utils.pt_io import load_pt
    keys = load_manifest(name)
    ckpt = load_pt(path)
    state = ckpt.get("state_dict", ckpt)
    got = {k: list(np.asarray(v).shape) for k, v in state.items()
           if hasattr(v, "shape")}
    got = {k[7:] if k.startswith("module.") else k: v for k, v in got.items()}
    missing = sorted(k for k in keys if k not in got)
    extra = sorted(k for k in got if k not in keys)
    bad = sorted(k for k in keys if k in got and got[k] != keys[k])
    for k in missing[:10]:
        print(f"  missing: {k} {keys[k]}")
    for k in bad[:10]:
        print(f"  shape mismatch: {k} ckpt={got[k]} manifest={keys[k]}")
    if extra:
        print(f"  {len(extra)} extra keys ignored (e.g. {extra[:3]})")
    ok = not missing and not bad
    print(f"[{'OK ' if ok else 'FAIL'}] {name}: {len(keys)} expected, "
          f"{len(missing)} missing, {len(bad)} mismatched, "
          f"{len(extra)} extra")
    return ok


def load_manifest(name):
    with open(os.path.join(MANIFEST_DIR, f"{name}.json")) as f:
        data = json.load(f)
    return data["keys"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gen", action="store_true",
                    help="regenerate manifests from reference torch modules")
    ap.add_argument("--check", nargs=2, metavar=("PATH", "NAME"),
                    help="validate a real checkpoint file against a manifest")
    ap.add_argument("names", nargs="*", default=[])
    args = ap.parse_args()

    if args.check:
        return 0 if check(*args.check) else 1

    names = args.names or list(GENERATORS)
    if args.gen:
        os.makedirs(MANIFEST_DIR, exist_ok=True)
        for n in names:
            keys, meta = GENERATORS[n]()
            with open(os.path.join(MANIFEST_DIR, f"{n}.json"), "w") as f:
                json.dump({"meta": meta, "keys": keys}, f, indent=0,
                          sort_keys=True)
            print(f"wrote manifests/{n}.json ({len(keys)} keys)")
        return 0

    ok = all(dryrun(n, load_manifest(n)) for n in names)
    print("ALL OK" if ok else "FAILURES")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
