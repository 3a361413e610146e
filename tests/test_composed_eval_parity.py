"""Composed W4 oracle: score pipeline vs the reference's own modules.

Runs the reference's own ``IdCLIPEvaluator`` (evaluation/clip_eval.py:
CLIPEvaluator + IdentityEvaluator with the PIPNet-aligned sphere20 chain)
and ``IDCLIPScoreCalculator.start_calc`` (evaluation/base_class.py:330-402,
GeneratedDataset txt-file layout, the id_cos>1e-6 inclusion filter)
against our ``eval/evaluators.py`` on shared random-init weights:

* CLIP towers: one tiny transformers.CLIPModel behind the clip stub's
  OpenAI API on the torch side, bridged via convert_hf_clip on ours —
  two independent executions of the same weights (tokenise is a shared
  deterministic scheme; no BPE vocab ships offline on either side);
* alignment chain: the W0 oracle's shared FaceBoxes/PIPNet builders
  (reference ``get_lmk_model`` patched to the torch twins);
* identity net: the reference's own cosface sphere20 random-init,
  bridged via convert_sphere.

Weight-file loading and `.cuda()` placement are the only reference
codepaths bypassed.  As in the W0 oracle, fp int()-boundary flips inside
the crop chain retry the next seed (a crop pre-check separates flips from
real bugs); score comparisons are then asserted tight.
"""
import functools
import os
import re
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

STUBS = os.path.join(os.path.dirname(__file__), "_stubs")
for p in (STUBS, "/root/reference"):
    if p not in sys.path:
        sys.path.insert(0, p)

import scipy.integrate as _si  # noqa: E402
if not hasattr(_si, "simps"):
    _si.simps = _si.simpson

_pk = "evaluation.face_align.PIPNet.FaceBoxesV2.utils.nms"
if _pk + ".cpu_nms" not in sys.modules:
    import importlib
    _py = importlib.import_module(_pk + ".py_cpu_nms")
    _m = types.ModuleType(_pk + ".cpu_nms")
    _m.cpu_nms = _py.py_cpu_nms
    _m.cpu_soft_nms = None
    sys.modules[_pk + ".cpu_nms"] = _m

import clip as clip_stub  # noqa: E402  (tests/_stubs/clip.py)
from evaluation import base_class as ref_base  # noqa: E402
from evaluation import clip_eval as ref_clip_eval  # noqa: E402
from evaluation.face_align.cosface import net as ref_cosface  # noqa: E402
from evaluation.face_align.PIPNet.lib import tools as ref_tools  # noqa: E402

from test_composed_align_parity import (_BoundaryFlip,  # noqa: E402
                                        _build_ref_faceboxes,
                                        _build_ref_pipnet)

from celebbasis_tpu.eval.evaluators import (CLIPEvaluator,  # noqa: E402
                                            IdCLIPEvaluator,
                                            IdentityEvaluator,
                                            IDCLIPScoreCalculator,
                                            face_cropper_from_nets)
from celebbasis_tpu.eval.sphere import (SphereConfig, SphereNet,  # noqa: E402
                                        convert_sphere)
from celebbasis_tpu.models.clip_text import CLIPTextConfig  # noqa: E402
from celebbasis_tpu.models.clip_vit import (CLIPTextTower,  # noqa: E402
                                            CLIPVisionConfig,
                                            CLIPVisionEncoder,
                                            convert_hf_clip)

IMG_SIZE = 128  # identity crop size (reference default 512, scaled down)


def _np_state(mod):
    return {k: v.numpy() for k, v in mod.state_dict().items()}


def _patch_cuda(monkeypatch):
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    monkeypatch.setattr(torch.nn.Module, "cuda", lambda self, *a, **k: self)


def _build_ref_evaluator(monkeypatch, ref_net, ref_det, sphere_torch):
    """The reference's own IdCLIPEvaluator, bypassing only weight files
    and CUDA placement."""
    _patch_cuda(monkeypatch)
    monkeypatch.setattr(ref_clip_eval, "get_lmk_model",
                        lambda: (ref_net, ref_det))
    monkeypatch.setattr(
        ref_clip_eval, "demo_image",
        functools.partial(ref_tools.demo_image, use_gpu=False, device="cpu"))
    monkeypatch.setattr(
        ref_clip_eval.IdentityEvaluator, "_load_fr_net",
        lambda self: setattr(self, "id_model", sphere_torch))
    return ref_clip_eval.IdCLIPEvaluator(
        device=torch.device("cpu"), clip_model="ViT-B/32",
        align_mode="ffhq", img_size=IMG_SIZE)


def _build_our_evaluator(our_det, our_lmk, sphere_torch):
    vcfg, tcfg = CLIPVisionConfig.tiny(), CLIPTextConfig.tiny()
    hf_model, _ = clip_stub.load()  # same fixed seed as the torch side
    vp, tp = convert_hf_clip(_np_state(hf_model.hf), vcfg, tcfg)
    clip_ev = CLIPEvaluator(vp, tp, clip_stub.tokenize_np, vcfg, tcfg)
    sp = convert_sphere(_np_state(sphere_torch), SphereConfig.sphere20())
    cropper = face_cropper_from_nets(our_det, our_lmk, IMG_SIZE, "ffhq")
    id_ev = IdentityEvaluator(sp, face_cropper=cropper,
                              cfg=SphereConfig.sphere20(),
                              img_size=IMG_SIZE, face_size=112)
    return IdCLIPEvaluator(clip_ev, id_ev)


def _tensor_nchw(arr_nhwc):
    return torch.from_numpy(np.ascontiguousarray(
        arr_nhwc.transpose(0, 3, 1, 2)))


def _make_images(rng, n, hw=(160, 192)):
    """uint8 blob images; same geometry as the W0 oracle's _photos."""
    out = []
    yy, xx = np.mgrid[0:hw[0], 0:hw[1]]
    for _ in range(n):
        img = rng.uniform(0, 80, hw + (3,)).astype(np.uint8)
        for _ in range(2):
            cy, cx = rng.uniform(40, hw[0] - 40), rng.uniform(40, hw[1] - 40)
            r = rng.uniform(18, 30)
            mask = ((yy - cy) / (1.3 * r)) ** 2 + ((xx - cx) / r) ** 2 < 1
            img[mask] = np.clip(180 + rng.normal(0, 25, (int(mask.sum()), 3)),
                                0, 255).astype(np.uint8)
        out.append(img)
    return out


def _crops_agree(imgs_u8, ref_net, ref_det, our_cropper):
    """Pre-check separating fp int()-boundary flips from real divergence:
    the identity cropper's output must be byte-equal on every image."""
    from evaluation.face_align.PIPNet.alignment import alignment as ref_al
    from evaluation.face_align.PIPNet.alignment.landmarks import \
        get_5_from_98 as ref_g5
    demo = functools.partial(ref_tools.demo_image, use_gpu=False,
                             device="cpu")
    for i, img in enumerate(imgs_u8):
        lmks = demo(img, ref_net, ref_det)
        if len(lmks) > 0:
            ref_crop = ref_al.norm_crop(img, ref_g5(lmks[0]), IMG_SIZE,
                                        mode="ffhq", borderValue=0.0)
            ref_ok = True
        else:
            ref_crop, ref_ok = img, False
        our_crop, our_ok = our_cropper(img)
        if ref_ok != our_ok:
            raise _BoundaryFlip(f"img {i}: has-face {ref_ok} vs {our_ok}")
        if ref_ok and (ref_crop != our_crop).any():
            raise _BoundaryFlip(f"img {i}: crop bytes differ")


def _seeded_stacks(seed, tmp_path, cal_imgs, min_per_img=1):
    ref_det, our_det = _build_ref_faceboxes(seed, tmp_path, cal_imgs,
                                            min_per_img=min_per_img)
    ref_net, our_lmk = _build_ref_pipnet(seed)
    torch.manual_seed(seed + 2000)
    sphere_torch = ref_cosface.sphere().eval()
    for prm in sphere_torch.parameters():
        prm.requires_grad = False
    return ref_det, our_det, ref_net, our_lmk, sphere_torch


def test_idclip_evaluator_vs_reference(monkeypatch, tmp_path):
    """Per-item scores: reference IdCLIPEvaluator.evaluate vs ours."""
    for seed in (0, 1, 2):
        rng = np.random.default_rng(100 + seed)
        imgs = _make_images(rng, 4)
        src_u8, gen_u8 = imgs[:1], imgs[1:]
        # the evaluator sees the uint8 round-trip of the [-1,1] tensors,
        # which is the images themselves; calibrate detections on them
        try:
            (ref_det, our_det, ref_net, our_lmk,
             sphere_torch) = _seeded_stacks(seed, tmp_path, imgs)
            ours = _build_our_evaluator(our_det, our_lmk, sphere_torch)
            _crops_agree(imgs, ref_net, ref_det,
                         ours.id.face_cropper)
        except _BoundaryFlip:
            continue
        ref_ev = _build_ref_evaluator(monkeypatch, ref_net, ref_det,
                                      sphere_torch)

        src = np.stack(src_u8).astype(np.float32) / 127.5 - 1.0
        gen = np.stack(gen_u8).astype(np.float32) / 127.5 - 1.0
        text = "a photo of a  person on the moon"
        r_img, r_txt, r_id = ref_ev.evaluate(
            _tensor_nchw(gen), _tensor_nchw(src), text)
        o_img, o_txt, o_id = ours.evaluate(gen, src, text)

        # Measured two-stack agreement is <=1.2e-7 (fp32, shared weights);
        # 1e-5 keeps ~100x margin while staying tight enough that the
        # uint8-round-trip mutation control (test_oracle_mutations.py,
        # delta 1.3e-4) provably fails the oracle.
        np.testing.assert_allclose(o_img, float(r_img), atol=1e-5)
        np.testing.assert_allclose(o_txt, float(r_txt), atol=1e-5)
        np.testing.assert_allclose(o_id["cos_sim"], float(r_id["cos_sim"]),
                                   atol=1e-5)
        np.testing.assert_allclose(o_id["mse_dist"], float(r_id["mse_dist"]),
                                   atol=1e-5)
        np.testing.assert_allclose(o_id["l2_dist"], float(r_id["l2_dist"]),
                                   atol=1e-5)
        assert o_id["num_has_face"] == int(r_id["num_has_face"])
        assert o_id["num_no_face"] == int(r_id["num_no_face"])
        return
    pytest.fail("no seed produced a flip-free run")


def _write_eval_folder(root, rng, src_paths_by_id, n_items=2, n_gen=2):
    """A tiny generated-eval folder in the reference layout."""
    from PIL import Image
    prompts, paths, ids = [], [], []
    os.makedirs(os.path.join(root, "imgs"), exist_ok=True)
    gen_arrays = []
    for i in range(n_items):
        prompt = ["a photo of a sks person",
                  "a sks person on the moon"][i % 2]
        id0, id1 = i % 2, (i + 1) % 2
        prompts.append(prompt)
        paths.append([src_paths_by_id[id0], src_paths_by_id[id1]])
        ids.append([id0, id1])
        sub = os.path.join(root, "imgs", f"{i:05d}_id{id0:05d}_{prompt}")
        os.makedirs(sub, exist_ok=True)
        for g, arr in enumerate(_make_images(rng, n_gen)):
            Image.fromarray(arr).save(os.path.join(sub, f"{g:05d}.jpg"))
            gen_arrays.append(None)  # decoded below from disk
    with open(os.path.join(root, "prompts.txt"), "w") as f:
        f.writelines("{}\n".format(x) for x in prompts)
    with open(os.path.join(root, "in_image_paths.txt"), "w") as f:
        f.writelines("{}\n".format(x) for x in paths)
    with open(os.path.join(root, "in_image_ids.txt"), "w") as f:
        f.writelines("{}\n".format(x) for x in ids)


def _all_eval_images(root):
    """Every uint8 array the identity cropper will see (jpg-decoded)."""
    from PIL import Image
    import glob as _g
    out = []
    for p in sorted(_g.glob(os.path.join(root, "imgs", "*", "*.jpg"))):
        out.append(np.asarray(Image.open(p).convert("RGB")))
    return out


_FLOAT = r"([-+]?\d*\.?\d+(?:[eE][-+]?\d+)?)"


def _parse_ref_aggregates(text):
    img = float(re.search(r"Image similarity \(avg\):\s*tensor\(" + _FLOAT,
                          text).group(1))
    txt = float(re.search(r"Text similarity \(avg\):\s*tensor\(" + _FLOAT,
                          text).group(1))
    cos = float(re.search(r"Identity cos similarity \(avg\):\s*tensor\(" +
                          _FLOAT, text).group(1))
    mse = float(re.search(r"mse_dist=" + _FLOAT, text).group(1))
    l2 = float(re.search(r"l2_dist=" + _FLOAT, text).group(1))
    has = int(re.search(r"has_face=(\d+)", text).group(1))
    no = int(re.search(r"no_face=(\d+)", text).group(1))
    return img, txt, cos, mse, l2, has, no


def test_score_calculator_loop_vs_reference(monkeypatch, tmp_path, capsys):
    """The full start_calc loop (base_class.py:356-402): GeneratedDataset
    txt-layout, per-item evaluate, the id_cos>1e-6 filter, face counts."""
    from PIL import Image
    for seed in (0, 1, 2):
        rng = np.random.default_rng(200 + seed)
        src_dir = tmp_path / f"src_{seed}"
        src_dir.mkdir(exist_ok=True)
        src_paths = {}
        for j, arr in enumerate(_make_images(rng, 2)):
            p = str(src_dir / f"{j:05d}_id{j}_#0.jpg")
            Image.fromarray(arr).save(p)
            src_paths[j] = p
        root = str(tmp_path / f"eval_{seed}")
        _write_eval_folder(root, rng, src_paths)

        all_imgs = _all_eval_images(root) + [
            np.asarray(Image.open(p).convert("RGB"))
            for p in src_paths.values()]
        try:
            (ref_det, our_det, ref_net, our_lmk,
             sphere_torch) = _seeded_stacks(seed, tmp_path, all_imgs,
                                            min_per_img=0)
            ours = _build_our_evaluator(our_det, our_lmk, sphere_torch)
            _crops_agree(all_imgs, ref_net, ref_det, ours.id.face_cropper)
        except _BoundaryFlip:
            continue
        ref_ev = _build_ref_evaluator(monkeypatch, ref_net, ref_det,
                                      sphere_torch)
        # single-core box: no DataLoader worker processes (idempotent
        # across seed retries — binds the true class, not the prior patch)
        from torch.utils.data import DataLoader as _TorchDL
        monkeypatch.setattr(
            ref_base, "DataLoader",
            lambda ds, **kw: _TorchDL(ds, **{**kw, "num_workers": 0}))
        ref_calc = ref_base.IDCLIPScoreCalculator(root, ref_ev,
                                                  torch.device("cpu"))
        capsys.readouterr()
        try:
            ref_calc.start_calc()  # prints; returns None (base_class.py:402)
        except RuntimeError:
            # every item's id_cos failed the 1e-6 filter: the reference
            # torch.stack([])s (base_class.py:392) — random-weight artifact,
            # not a parity statement; retry (our loop returns 0.0 instead)
            continue
        printed = capsys.readouterr().out
        r_img, r_txt, r_cos, r_mse, r_l2, r_has, r_no = \
            _parse_ref_aggregates(printed)

        scores = IDCLIPScoreCalculator(root, ours, verbose=False).start_calc()
        # reference aggregates only survive via print: torch's 4-decimal
        # tensor repr quantizes at 5e-5, which floors the achievable
        # tolerance here (true two-stack agreement is <=1.2e-7 per item —
        # the per-item test above pins that at 1e-5)
        np.testing.assert_allclose(scores["image_sim"], r_img, atol=1e-4)
        np.testing.assert_allclose(scores["text_sim"], r_txt, atol=1e-4)
        np.testing.assert_allclose(scores["id_cos_sim"], r_cos, atol=1e-4)
        np.testing.assert_allclose(scores["id_mse_dist"], r_mse, atol=1e-4)
        np.testing.assert_allclose(scores["id_l2_dist"], r_l2, atol=1e-4)
        assert scores["num_has_face"] == r_has
        assert scores["num_no_face"] == r_no
        assert scores["n_items"] == 2
        return
    pytest.fail("no seed produced a flip-free run")
