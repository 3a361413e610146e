#!/usr/bin/env python
"""W0 alignment throughput: serial vs pipelined (cli/align.py --workers).

Synthesizes N 1024x1024 JPEGs (random noise; the detector runs random-init
with a lowered threshold so the full detect -> landmark -> crop -> save chain
executes per image, same as tests/test_round3_fixes.py), then times
align_folder at workers=1 vs workers=K.  Warm numbers: the first pass
compiles + pays the one-off timed-loop pollution, so each variant runs
twice and the second time is reported.

Usage: python scripts/bench_align.py [n_images] [workers]
"""
import json
import os
import shutil
import sys
import tempfile
import time

os.makedirs("/root/repo/.cache/jax", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

from celebbasis_tpu.cli.align import (_init_detector, _init_landmarker,
                                      align_folder)


def tiny_fid(inception_ckpt: str) -> int:
    """Readiness end-check for W4's metric path: FID of a folder against
    itself through the REAL bridged Inception graph must be ~0 (pool3
    statistics are identical; only sqrtm numerics remain)."""
    from celebbasis_tpu.eval.fid import FIDScorer
    from celebbasis_tpu.eval.inception import load_inception
    root = tempfile.mkdtemp(prefix="tiny_fid_")
    rng = np.random.default_rng(0)
    for i in range(8):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3),
                                     dtype=np.uint8)).save(
            os.path.join(root, f"x{i}.jpg"))
    feat_fn, _ = load_inception(inception_ckpt)
    fid = FIDScorer(feat_fn).fid(root, root)
    print(json.dumps({"metric": "tiny-fid self", "value": fid}))
    shutil.rmtree(root)
    ok = abs(fid) < 1e-3
    print("OK" if ok else "FAIL: self-FID should be ~0")
    return 0 if ok else 1


def main():
    import argparse
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("n_images", nargs="?", type=int, default=24)
    p.add_argument("workers", nargs="?", type=int, default=4)
    p.add_argument("--detector_ckpt", default=None,
                   help="real FaceBoxesV2 weights (readiness align-bench)")
    p.add_argument("--pipnet_ckpt", default=None)
    p.add_argument("--meanface", default=None)
    p.add_argument("--tiny_fid", action="store_true",
                   help="instead of the align bench: self-FID == 0 through "
                        "the real Inception bridge")
    p.add_argument("--inception_ckpt", default=None)
    args = p.parse_args()
    if args.tiny_fid:
        raise SystemExit(tiny_fid(args.inception_ckpt))
    n, workers = args.n_images, args.workers
    root = tempfile.mkdtemp(prefix="bench_align_")
    photos = os.path.join(root, "photos")
    os.makedirs(photos)
    rng = np.random.default_rng(0)
    for i in range(n):
        Image.fromarray(rng.integers(0, 255, (1024, 1024, 3),
                                     dtype=np.uint8)).save(
            os.path.join(photos, f"p{i:03d}.jpg"), quality=92)

    det = _init_detector(args.detector_ckpt)
    if not args.detector_ckpt:
        det.thresh = 0.05      # random weights: let noise detections fire
    lmk = _init_landmarker(args.pipnet_ckpt, args.meanface)

    results = {}
    for w in (1, workers):
        for rep in range(2):          # measure twice, keep the second
            out = os.path.join(root, f"out_w{w}_{rep}")
            t0 = time.perf_counter()
            ok = align_folder(photos, out, det, lmk, crop_size=512,
                              workers=w)
            dt = time.perf_counter() - t0
        results[w] = (n / dt, ok)
        print(f"workers={w}: {n / dt:.2f} img/s ({ok}/{n} aligned, "
              f"{dt:.1f}s)")

    print(json.dumps({
        "metric": "W0 align throughput 1024^2",
        "serial_img_s": round(results[1][0], 2),
        "pipelined_img_s": round(results[workers][0], 2),
        "workers": workers,
        "speedup": round(results[workers][0] / results[1][0], 2),
    }))
    shutil.rmtree(root)


if __name__ == "__main__":
    main()
