"""Composed W0 oracle: the full align chain vs the reference's own code.

Runs the reference's own torch chain — FaceBoxesDetector.detect
(faceboxes_detector.py:37-124) -> demo_image (lib/tools.py:73-162, shipped
reverse_index LUT) -> get_5_from_98 -> norm_crop (alignment/alignment.py)
-> FolderAlignCrop transform + start_align.tensor_to_arr save loop
(start_align.py:22-68) — against `cli/align.py`'s product chain on shared
random-init weights, and asserts box-for-box, landmark-for-landmark and
crop byte-for-byte equality, plus the emitted pickle.

Both stacks run fp32 through different backends (torch CPU vs XLA CPU), so
int() quantization can flip when a value sits within ~1e-4 of a boundary.
The test therefore tries a few seeds and accepts the first whose chains
match EXACTLY — but any divergence larger than one pixel, any crop
mismatch beyond warp-boundary noise, or flips on more than a tiny fraction
of values is a real bug and fails immediately, whatever the seed.

Also pins our runtime reverse-index derivation (pipnet.meanface_indices)
against the reference's own get_meanface (lib/functions.py:31-75).
"""
import os
import pickle
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

STUBS = os.path.join(os.path.dirname(__file__), "_stubs")
for p in (STUBS, "/root/reference"):
    if p not in sys.path:
        sys.path.insert(0, p)

# lib/functions.py imports the scipy<1.12 name `simps` (never called on the
# oracle path): alias it to the renamed simpson
import scipy.integrate as _si  # noqa: E402
if not hasattr(_si, "simps"):
    _si.simps = _si.simpson

# the Cython cpu_nms isn't compiled in this image: seed the module with the
# reference's own pure-python NMS (same algorithm, py_cpu_nms.py)
_pk = "evaluation.face_align.PIPNet.FaceBoxesV2.utils.nms"
if _pk + ".cpu_nms" not in sys.modules:
    import importlib
    _py = importlib.import_module(_pk + ".py_cpu_nms")
    _m = types.ModuleType(_pk + ".cpu_nms")
    _m.cpu_nms = _py.py_cpu_nms
    _m.cpu_soft_nms = None
    sys.modules[_pk + ".cpu_nms"] = _m

from evaluation.face_align.PIPNet.FaceBoxesV2.faceboxes_detector import (  # noqa: E402
    FaceBoxesDetector as RefDetector)
from evaluation.face_align.PIPNet.FaceBoxesV2.utils.faceboxes import (  # noqa: E402
    FaceBoxesV2 as RefFaceBoxes)
from evaluation.face_align.PIPNet.lib import networks as ref_networks  # noqa: E402
from evaluation.face_align.PIPNet.lib import tools as ref_tools  # noqa: E402
from evaluation.face_align.PIPNet.reverse_index import ri1 as REF_RI1  # noqa: E402
from evaluation.face_align.PIPNet.reverse_index import ri2 as REF_RI2  # noqa: E402
from evaluation.face_align.PIPNet.alignment import alignment as ref_alignment  # noqa: E402
from evaluation.face_align.PIPNet.alignment.landmarks import (  # noqa: E402
    get_5_from_98 as ref_get_5_from_98)

import torch_resnet  # noqa: E402  (stub resnet with torchvision layout)

from celebbasis_tpu.align.alignment import get_5_from_98, norm_crop  # noqa: E402
from celebbasis_tpu.align.faceboxes import FaceBoxesDetector  # noqa: E402
from celebbasis_tpu.align.pipnet import (PIPNetConfig, PIPNetLandmarker,  # noqa: E402
                                         meanface_indices)
from celebbasis_tpu.utils.bridge_align import (convert_faceboxes,  # noqa: E402
                                               convert_pipnet)

RI = (np.asarray(REF_RI1, np.int32).reshape(98, 17),
      np.asarray(REF_RI2, np.int32).reshape(98, 17))


# ---------------------------------------------------------------------------
# reverse-index derivation parity (replaces the 3.3k-line reverse_index.py)

@pytest.mark.smoke
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_meanface_reverse_index_vs_reference(tmp_path, seed):
    from evaluation.face_align.PIPNet.lib.functions import get_meanface
    rng = np.random.default_rng(seed)
    # jittered grid: every landmark has nearby neighbors, so every row is
    # non-empty and the reference's repeat-11x padding reaches max_len
    g = 10
    xs, ys = np.meshgrid(np.linspace(0.1, 0.9, g), np.linspace(0.1, 0.9, g))
    mf = np.stack([xs.ravel(), ys.ravel()], -1)[:98]
    mf = mf + rng.uniform(-0.02, 0.02, mf.shape)
    path = tmp_path / "meanface.txt"
    path.write_text(" ".join(f"{v:.8f}" for v in mf.ravel()) + "\n")

    _, r1, r2, ml = get_meanface(str(path), 10)
    ours1, ours2, ours_ml = meanface_indices(mf, 10)
    assert ours_ml == ml
    # reference rows are repeat-11x-truncated; equal to our ceil-cyclic pad
    # whenever 11*len(row) >= max_len (guaranteed by the grid meanface)
    np.testing.assert_array_equal(ours1.ravel(), np.asarray(r1))
    np.testing.assert_array_equal(ours2.ravel(), np.asarray(r2))


# ---------------------------------------------------------------------------
# shared-weight stack builders

class _BoundaryFlip(Exception):
    """fp int()-boundary flip (or a starved seed): retry with the next."""


def _build_ref_faceboxes(seed, tmp_path, imgs, min_per_img=1):
    """Shared-weight detectors tuned so ~6 boxes total cross the 0.6
    product threshold, with a known score margin.

    Random-init conf scores cluster tightly around 0.5, so a fixed bias
    either floods (the reference runs PIPNet per detection) or starves.
    A uniform class-1 bias shift is a monotone map on the softmax score:
    it preserves the score ORDER, hence the NMS kept-set, so we can
    calibrate it from one un-shifted reference run — per candidate box,
    the shift d_i that would put it exactly at 0.6 is
    log(s/(1-s)) - log(.6/.4); picking d between two d_i keeps exactly
    the boxes above, with margin (d_i gap)/2."""
    torch.manual_seed(seed)
    net = RefFaceBoxes("test", None, 2)
    for m in net.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 1.5)
    with torch.no_grad():
        for mod in net.conf.modules():
            if isinstance(mod, torch.nn.Conv2d):
                mod.weight *= 8.0  # spread the scores spatially

    def _save_and_load():
        sd = net.state_dict()
        wfile = tmp_path / f"fb_{seed}.pth"
        # the reference loading path strips a DataParallel "module." prefix
        torch.save({"module." + k: v for k, v in sd.items()}, str(wfile))
        ref = RefDetector("FaceBoxes", str(wfile), use_gpu=False,
                          device="cpu")
        ours = FaceBoxesDetector(
            convert_faceboxes({k: v.numpy() for k, v in sd.items()}))
        return ref, ours

    ref_det, _ = _save_and_load()
    logit06 = float(np.log(0.6 / 0.4))
    per_img = []
    for im in imgs:
        kept, _ = ref_det.detect(im, 1e-9, 1)
        s = np.clip(np.asarray([d[1] for d in kept], np.float64),
                    1e-9, 1 - 1e-9)
        per_img.append(np.log(s / (1 - s)) - logit06)
    pooled = np.sort(np.concatenate(per_img))[::-1]
    for k in (6, 5, 7, 4, 8):
        if k >= len(pooled):
            continue
        d = (pooled[k - 1] + pooled[k]) / 2
        margin = (pooled[k - 1] - pooled[k]) / 2
        counts = [int((di > d).sum()) for di in per_img]
        if margin > 1e-3 and min(counts) >= min_per_img:
            break
    else:
        raise _BoundaryFlip(f"no clean bias split (pooled={pooled[:9]})")
    with torch.no_grad():
        for mod in net.conf.modules():
            if isinstance(mod, torch.nn.Conv2d):
                mod.bias[1::2] -= float(d)
    return _save_and_load()


def _build_ref_pipnet(seed):
    torch.manual_seed(seed + 1000)
    resnet = torch_resnet.resnet(layers=(2, 2, 2, 2))
    net = ref_networks.Pip_resnet101(resnet, 10, num_lms=98, input_size=256,
                                     net_stride=32).eval()
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)
        # the reference zero-inits the five heads (std 1e-3): re-randomize so
        # cls argmax has clear margins and offsets actually move landmarks
        for name, p in net.named_parameters():
            if any(h in name for h in ("cls_layer", "x_layer", "y_layer",
                                       "nb_x_layer", "nb_y_layer")):
                p.data.normal_(0, 0.05)
    cfg = PIPNetConfig(layers=(2, 2, 2, 2), input_size=256)
    params = convert_pipnet(
        {k: v.numpy() for k, v in net.state_dict().items()}, cfg)
    ours = PIPNetLandmarker(params, cfg, meanface=None, ri=RI)
    return net, ours


def _photos(tmp_path, seed, n=3, hw=(160, 192)):
    """Structured multi-blob images, one shape (one XLA compile)."""
    rng = np.random.default_rng(seed)
    folder = tmp_path / "photos"
    folder.mkdir(exist_ok=True)
    from PIL import Image
    names = []
    for i in range(n):
        img = rng.uniform(0, 80, hw + (3,)).astype(np.uint8)
        yy, xx = np.mgrid[0:hw[0], 0:hw[1]]
        for _ in range(2):
            cy, cx = rng.uniform(40, hw[0] - 40), rng.uniform(40, hw[1] - 40)
            r = rng.uniform(18, 30)
            mask = ((yy - cy) / (1.3 * r)) ** 2 + ((xx - cx) / r) ** 2 < 1
            img[mask] = np.clip(
                180 + rng.normal(0, 25, (int(mask.sum()), 3)), 0,
                255).astype(np.uint8)
        name = f"p{i}.jpg"
        Image.fromarray(img).save(str(folder / name))
        names.append(name)
    return folder, names


# ---------------------------------------------------------------------------

def _ref_demo_image(img, net, detector):
    return ref_tools.demo_image(img, net, detector, input_size=256,
                                net_stride=32, num_nb=10, use_gpu=False,
                                device="cpu")


def _run_ref_chain(folder, names, net, detector, out_dir, out_size):
    """The reference's own start_align main loop (start_align.py:49-68) on
    top of FolderAlignCrop._check_lmk_box + transform (dataloader.py), with
    only the weight-file loading bypassed (nets passed in)."""
    from evaluation.face_align.PIPNet.alignment import dataloader as dl_mod
    from evaluation.face_align.PIPNet import start_align
    import functools
    demo = functools.partial(ref_tools.demo_image, use_gpu=False,
                             device="cpu")
    old_glm, old_demo = dl_mod.get_lmk_model, dl_mod.demo_image
    dl_mod.get_lmk_model = lambda: (net, detector)
    dl_mod.demo_image = demo
    try:
        ds = dl_mod.FolderAlignCrop(str(folder), image_size=out_size,
                                    align_mode="ffhq")
        os.makedirs(out_dir, exist_ok=True)
        saved = []
        for idx in range(len(ds)):
            item = ds[idx]
            if not item["has_lmk_box"]:
                continue
            arr = start_align.tensor_to_arr(item["target_image"][None])[0]
            from PIL import Image
            Image.fromarray(arr).save(os.path.join(out_dir,
                                                   item["img_name"]))
            saved.append(item["img_name"])
        return saved
    finally:
        dl_mod.get_lmk_model, dl_mod.demo_image = old_glm, old_demo


def _dets_to_tuples(ref_dets, our_dets):
    ref = [(d[2], d[3], d[4], d[5]) for d in ref_dets]
    ours = [(d.xmin, d.ymin, d.width, d.height) for d in our_dets]
    ref_scores = np.asarray([d[1] for d in ref_dets], np.float32)
    our_scores = np.asarray([d.score for d in our_dets], np.float32)
    return ref, ours, ref_scores, our_scores


def _run_both_chains(tmp_path, seed):
    from PIL import Image
    folder, names = _photos(tmp_path, seed)
    imgs = [np.asarray(Image.open(str(folder / n)).convert("RGB"))
            for n in names]
    ref_det, our_det = _build_ref_faceboxes(seed, tmp_path, imgs)
    ref_net, our_lmk = _build_ref_pipnet(seed)

    total_dets = 0
    for name, img in zip(names, imgs):
        ref_dets, _ = ref_det.detect(img, 0.6, 1)
        our_dets = our_det.detect(img, im_scale=1.0)
        if len(ref_dets) != len(our_dets):
            raise _BoundaryFlip(
                f"{name}: {len(ref_dets)} vs {len(our_dets)} detections")
        if not ref_dets:
            continue
        total_dets += len(ref_dets)
        ref_b, our_b, ref_s, our_s = _dets_to_tuples(ref_dets, our_dets)
        np.testing.assert_allclose(our_s, ref_s, atol=2e-4)
        db = np.abs(np.asarray(ref_b, np.int64) - np.asarray(our_b, np.int64))
        if db.max() > 1:
            pytest.fail(f"{name}: box divergence >1px — real bug:\n"
                        f"ref={ref_b}\nours={our_b}")
        if db.any():
            raise _BoundaryFlip(f"{name}: box int flip {db.max()}")

        ref_lmks = _ref_demo_image(img, ref_net, ref_det)
        assert len(ref_lmks) == len(ref_dets)
        for det_i, (rl, det) in enumerate(zip(ref_lmks, our_dets)):
            ol = our_lmk.landmarks_for_box(img, det)
            dl = np.abs(rl.astype(np.int64) - ol.astype(np.int64))
            if dl.max() > 1:
                pytest.fail(f"{name} det{det_i}: landmark divergence "
                            f">1px — real bug (max {dl.max()})")
            nflip = int((dl > 0).sum())
            if nflip > max(2, int(0.02 * dl.size)):
                pytest.fail(f"{name} det{det_i}: {nflip}/{dl.size} "
                            "landmark flips — systematic, not fp noise")
            if nflip:
                raise _BoundaryFlip(f"{name} det{det_i}: {nflip} lmk flips")

            # norm_crop byte equality on the (now proven equal) lmk5
            r5 = ref_get_5_from_98(rl)
            o5 = get_5_from_98(ol)
            np.testing.assert_allclose(o5, r5, atol=0)
            rcrop = ref_alignment.norm_crop(img, r5, 256, mode="ffhq",
                                            borderValue=0.0)
            ocrop = norm_crop(img, o5, 256, "ffhq")
            neq = int((rcrop != ocrop).sum())
            if neq:
                pytest.fail(f"{name} det{det_i}: norm_crop {neq} byte "
                            "mismatches — warp not cv2-exact")

    if total_dets < 2:
        raise _BoundaryFlip(f"only {total_dets} detections — retune seed")

    # full product drivers: reference start_align loop vs our align_folder
    out_size = 320
    ref_out = tmp_path / f"ref_out_{seed}"
    saved = _run_ref_chain(folder, names, ref_net, ref_det, str(ref_out),
                           out_size)
    from celebbasis_tpu.cli.align import align_folder, gen_pickle_abs
    our_out = tmp_path / f"our_out_{seed}"
    n = align_folder(str(folder), str(our_out), our_det, our_lmk,
                     crop_size=out_size, mode="ffhq", workers=1)
    assert sorted(saved) == sorted(os.listdir(str(our_out)))
    assert n == len(saved)
    for name in saved:
        r = np.asarray(Image.open(str(ref_out / name)))
        o = np.asarray(Image.open(str(our_out / name)))
        # jpg encoder is shared PIL => byte-equal input arrays give
        # byte-equal files; compare decoded pixels
        if (r != o).any():
            pytest.fail(f"{name}: final saved crop differs "
                        f"({int((r != o).sum())} bytes)")

    pkl = tmp_path / f"our_{seed}.pickle"
    gen_pickle_abs(str(our_out), str(pkl))
    with open(str(pkl), "rb") as f:
        paths = pickle.load(f)
    assert [os.path.basename(p) for p in paths] == sorted(saved)
    return total_dets


def test_composed_align_chain_vs_reference(tmp_path):
    last = None
    for seed in (0, 1, 2, 3):
        try:
            ndet = _run_both_chains(tmp_path, seed)
        except _BoundaryFlip as e:  # fp int()-boundary flip: next seed
            last = e
            continue
        assert ndet >= 2
        return
    pytest.fail(f"no seed produced a flip-free run; last: {last}")
