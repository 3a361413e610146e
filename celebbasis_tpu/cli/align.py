"""Face align/crop CLI (W0) — the reference's ``00_align_face.sh`` +
``PIPNet/start_align.py``.

folder of photos -> FaceBoxesV2 detect -> PIPNet 98 landmarks ->
get_5_from_98 -> FFHQ-template norm_crop (256²) -> resize to crop_size ->
saved crops + ``<out_folder>.pickle`` (path list — the W2 dataset contract,
``alignment/gen_pickle.py``).  The whole chain is oracle-pinned against
the reference's own torch code (tests/test_composed_align_parity.py).

Weights: ``--detector_ckpt`` (FaceBoxesV2.pth), ``--pipnet_ckpt``
(epoch59.pth) and ``--meanface`` are bridged torch files; without them the
nets run random-init (shape-correct, for pipeline testing only — a warning is
printed).
"""
from __future__ import annotations

import argparse
import glob
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from celebbasis_tpu.align.alignment import get_5_from_98, norm_crop
from celebbasis_tpu.align.faceboxes import FaceBoxesDetector, FaceBoxesV2
from celebbasis_tpu.align.pipnet import (PIPNet, PIPNetConfig,
                                         PIPNetLandmarker)


def gen_pickle_abs(folder: str, out_pickle: str):
    """Path list of every entry in ``folder`` (gen_pickle.py:7-18 verbatim:
    sorted os.listdir joined onto the folder as given — the pickle itself
    lives OUTSIDE the folder, so it never lists itself)."""
    names = sorted(os.listdir(folder))
    paths = [os.path.join(folder, n) for n in names]
    with open(out_pickle, "wb") as f:
        pickle.dump(paths, f)
    return paths


def _init_detector(ckpt, seed=0):
    net = FaceBoxesV2()
    params = jax.jit(net.init)(jax.random.key(seed),
                               jnp.zeros((1, 256, 256, 3)))
    if ckpt:
        from celebbasis_tpu.utils.pt_io import load_pt
        from celebbasis_tpu.utils.bridge_align import convert_faceboxes
        params = convert_faceboxes(load_pt(ckpt))
    else:
        print("[align] WARNING: no detector checkpoint — random weights")
    return FaceBoxesDetector(params)


def _init_landmarker(ckpt, meanface_path, seed=0):
    cfg = PIPNetConfig()
    net = PIPNet(cfg)
    params = jax.jit(net.init)(
        jax.random.key(seed), jnp.zeros((1, cfg.input_size, cfg.input_size, 3)))
    if ckpt:
        from celebbasis_tpu.utils.pt_io import load_pt
        from celebbasis_tpu.utils.bridge_align import convert_pipnet
        params = convert_pipnet(load_pt(ckpt), cfg)
    else:
        print("[align] WARNING: no PIPNet checkpoint — random weights")
    if meanface_path and os.path.exists(meanface_path):
        with open(meanface_path) as f:
            vals = [float(v) for v in f.readlines()[0].strip().split()]
        meanface = np.asarray(vals).reshape(-1, 2)
    else:
        print("[align] WARNING: no meanface file — using a uniform grid")
        g = int(np.ceil(np.sqrt(cfg.num_lms)))
        xs, ys = np.meshgrid(np.linspace(0.1, 0.9, g), np.linspace(0.1, 0.9, g))
        meanface = np.stack([xs.ravel(), ys.ravel()], -1)[: cfg.num_lms]
    return PIPNetLandmarker(params, cfg, meanface)


def _align_one(path: str, out_folder: str, detector, landmarker,
               crop_size: int, mode: str, hires: bool = False) -> bool:
    """One image through the exact product chain (start_align.py ->
    FolderAlignCrop._check_lmk_box -> demo_image):

    * the RAW RGB array goes straight into both nets, im_scale pinned to 1
      (dataloader.py:66, tools.py:98 — the reference never auto-rescales
      on this path, and its PIPNet therefore sees channel-flipped crops);
    * first NMS-ordered detection (``lmks[0]``, dataloader.py:68);
    * norm_crop at a FIXED 256 (dataloader.py:69), PIL-upscaled to
      crop_size (transforms.Resize, dataloader.py:34), then the
      ToTensor/Normalize(0.5)/((t+1)*127.5).astype(uint8) round-trip of
      start_align.py:22-24 replayed in fp32 — it can shift a pixel value
      down by 1, so it is replicated, not skipped;
    * saved under the ORIGINAL file name (start_align.py:63).

    ``hires=True`` is our quality extension: norm_crop directly at
    crop_size (no 256 bottleneck, no round-trip)."""
    rgb = np.asarray(Image.open(path).convert("RGB"))
    dets = detector.detect(rgb, im_scale=1.0)   # uint8 end to end: the
    if not dets:                                # fp32 image uploads were
        print(f"[align] no face in {path}")     # the W0 bottleneck (PERF.md)
        return False
    det = dets[0]
    lmk98 = landmarker.landmarks_for_box(rgb, det)
    lmk5 = get_5_from_98(lmk98)
    if hires:
        out_arr = norm_crop(rgb, lmk5, crop_size, mode)
    else:
        crop = norm_crop(rgb, lmk5, 256, mode)     # uint8 in -> uint8 out
        pil = Image.fromarray(crop)
        if crop_size != 256:
            pil = pil.resize((crop_size, crop_size), Image.BILINEAR)
        x = np.asarray(pil, np.float32)
        t = (x / np.float32(255.0) - np.float32(0.5)) / np.float32(0.5)
        out_arr = ((t + np.float32(1.0)) * np.float32(127.5)).astype(np.uint8)
    out = os.path.join(out_folder, os.path.basename(path))
    Image.fromarray(out_arr).save(out)
    return True


def annotate_frame(rgb: np.ndarray, detector, landmarker):
    """Shared demo drawing (lib/demo.py demo_image / demo_video.py:72-131):
    every detection's (1.2x-enlarged) red box + its 98 merged landmarks.
    Returns (annotated PIL image, any_face)."""
    from PIL import ImageDraw
    img = Image.fromarray(np.ascontiguousarray(rgb))
    # demo contract: the nets consume the cv2-BGR frame (demo.py:96-98,
    # im_scale pinned to 1); landmarks_for_box flips the crop internally
    bgr = np.ascontiguousarray(rgb[:, :, ::-1])
    dets = detector.detect(bgr, im_scale=1.0)
    draw = ImageDraw.Draw(img)
    H, W = rgb.shape[:2]
    for det in dets:
        s = landmarker.det_box_scale
        xmin = max(det.xmin - int(det.width * (s - 1) / 2), 0)
        ymin = min(max(det.ymin + int(det.height * (s - 1) / 2), 0), H - 1)
        xmax = min(det.xmin + det.width - 1 + int(det.width * (s - 1) / 2),
                   W - 1)
        ymax = min(det.ymin + det.height - 1 + int(det.height * (s - 1) / 2),
                   H - 1)
        draw.rectangle([xmin, ymin, xmax, ymax], outline=(255, 0, 0), width=2)
        for x, y in landmarker.landmarks_for_box(bgr, det):
            draw.ellipse([x - 2, y - 2, x + 2, y + 2], fill=(255, 0, 0))
    return img, bool(dets)


def _annotate_one(path: str, out_folder: str, detector, landmarker) -> bool:
    """lib/demo.py demo_image flow on a still image -> ``<name>_out.jpg``."""
    rgb = np.asarray(Image.open(path).convert("RGB"))
    img, found = annotate_frame(rgb, detector, landmarker)
    out = os.path.join(out_folder,
                       os.path.splitext(os.path.basename(path))[0]
                       + "_out.jpg")
    img.save(out)
    return found


def annotate_video(in_path: str, out_path: str, detector, landmarker,
                   thresh: float = 0.9) -> int:
    """Per-frame detect+landmark+annotate over a video stream — the
    reference's ``lib/demo_video.py:72-141`` (detector threshold 0.9 there).

    ``in_path`` may be a video file (decoded/encoded via cv2, mp4v) or a
    directory of frames; a directory input — or a codec that can't be
    opened — writes annotated frames to ``out_path`` as a directory
    (``frame_%06d.jpg``).  Returns the number of frames processed."""
    old_thresh, detector.thresh = detector.thresh, thresh
    try:
        if os.path.isdir(in_path):
            frames = sorted(
                p for ext in ("*.jpg", "*.jpeg", "*.png")
                for p in glob.glob(os.path.join(in_path, ext)))
            os.makedirs(out_path, exist_ok=True)
            for i, fp in enumerate(frames):
                rgb = np.asarray(Image.open(fp).convert("RGB"))
                img, _ = annotate_frame(rgb, detector, landmarker)
                img.save(os.path.join(out_path, f"frame_{i:06d}.jpg"))
            return len(frames)

        import cv2
        cap = cv2.VideoCapture(0 if in_path == "camera" else in_path)
        if not cap.isOpened():
            raise IOError(f"cannot open video stream {in_path!r}")
        fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
        w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        writer = cv2.VideoWriter(out_path,
                                 cv2.VideoWriter_fourcc(*"mp4v"), fps,
                                 (w, h))
        frame_dir = None
        if not writer.isOpened():       # no codec: frame-dir fallback
            frame_dir = os.path.splitext(out_path)[0] + "_frames"
            os.makedirs(frame_dir, exist_ok=True)
            print(f"[align] no mp4 codec — writing frames to {frame_dir}")
        count = 0
        while True:
            ret, frame = cap.read()     # BGR
            if not ret:
                break
            img, _ = annotate_frame(frame[:, :, ::-1], detector, landmarker)
            if frame_dir is None:
                writer.write(np.asarray(img)[:, :, ::-1])
            else:
                img.save(os.path.join(frame_dir, f"frame_{count:06d}.jpg"))
            count += 1
        cap.release()
        if frame_dir is None:
            writer.release()
        return count
    finally:
        detector.thresh = old_thresh


def align_folder(in_folder: str, out_folder: str, detector, landmarker,
                 crop_size: int = 512, mode: str = "ffhq",
                 workers: int = 4, hires: bool = False):
    """Pipelined W0: ``workers`` threads each run the full per-image chain
    (decode -> detect -> landmark -> crop -> save), so host PIL work and the
    per-call device round-trip latency overlap across images.  The per-image
    code path is IDENTICAL to the serial one (workers=1) — crops are
    pixel-equal; only scheduling changes.  On this host the device calls pay
    ~65 ms tunnel latency each (PERF.md), which threading hides."""
    os.makedirs(out_folder, exist_ok=True)
    images = sorted(
        p for ext in ("*.jpg", "*.jpeg", "*.png")
        for p in glob.glob(os.path.join(in_folder, ext)))
    if workers <= 1:
        return sum(_align_one(p, out_folder, detector, landmarker,
                              crop_size, mode, hires) for p in images)
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=workers) as pool:
        oks = list(pool.map(
            lambda p: _align_one(p, out_folder, detector, landmarker,
                                 crop_size, mode, hires), images))
    return sum(oks)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--in_folder", default=None,
                   help="input photo folder (required unless --video)")
    p.add_argument("--out_folder", required=True)
    p.add_argument("--crop_size", type=int, default=512)
    p.add_argument("--mode", type=str, default="ffhq",
                   choices=["ffhq", "arcface", "set1", "mtcnn"])
    p.add_argument("--detector_ckpt", type=str, default=None)
    p.add_argument("--pipnet_ckpt", type=str, default=None)
    p.add_argument("--meanface", type=str, default=None)
    p.add_argument("--workers", type=int, default=4,
                   help="pipeline threads (1 = serial reference behavior)")
    p.add_argument("--out_pickle", type=str, default=None,
                   help="path list pickle (default: <out_folder>.pickle, "
                        "start_align.py:66-67)")
    p.add_argument("--hires_crop", action="store_true",
                   help="quality extension: norm_crop directly at crop_size "
                        "instead of the reference's 256-crop + resize chain")
    p.add_argument("--annotate", action="store_true",
                   help="demo mode (lib/demo.py): draw boxes + landmarks "
                        "instead of cropping; no pickle is written")
    p.add_argument("--video", type=str, default=None,
                   help="video demo (lib/demo_video.py): per-frame "
                        "detect+landmark+annotate; a video file, 'camera', "
                        "or a directory of frames. --out_folder is the "
                        "output video path (or frame directory)")
    p.add_argument("--video_thresh", type=float, default=0.9,
                   help="detector threshold for --video "
                        "(demo_video.py my_thresh)")
    args = p.parse_args(argv)
    if args.video is None and args.in_folder is None:
        p.error("--in_folder is required unless --video is given")

    detector = _init_detector(args.detector_ckpt)
    landmarker = _init_landmarker(args.pipnet_ckpt, args.meanface)
    if args.video:
        n = annotate_video(args.video, args.out_folder, detector, landmarker,
                           thresh=args.video_thresh)
        print(f"[align] annotated {n} video frames -> {args.out_folder}")
        return
    if args.annotate:
        os.makedirs(args.out_folder, exist_ok=True)
        images = sorted(
            p_ for ext in ("*.jpg", "*.jpeg", "*.png")
            for p_ in glob.glob(os.path.join(args.in_folder, ext)))
        n = sum(_annotate_one(p_, args.out_folder, detector, landmarker)
                for p_ in images)
        print(f"[align] annotated {n}/{len(images)} images with faces")
        return
    if os.path.isdir(args.out_folder):     # start_align.py:45-46: a stale
        import shutil                      # out_folder would contaminate the
        shutil.rmtree(args.out_folder)     # listdir-built pickle
    n = align_folder(args.in_folder, args.out_folder, detector, landmarker,
                     args.crop_size, args.mode, workers=args.workers,
                     hires=args.hires_crop)
    pkl = args.out_pickle or "{}.pickle".format(args.out_folder)
    paths = gen_pickle_abs(args.out_folder, pkl)
    print(f"[align] cropped {n} faces; pickle with {len(paths)} paths at {pkl}")


if __name__ == "__main__":
    main()
