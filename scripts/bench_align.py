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


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    workers = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    root = tempfile.mkdtemp(prefix="bench_align_")
    photos = os.path.join(root, "photos")
    os.makedirs(photos)
    rng = np.random.default_rng(0)
    for i in range(n):
        Image.fromarray(rng.integers(0, 255, (1024, 1024, 3),
                                     dtype=np.uint8)).save(
            os.path.join(photos, f"p{i:03d}.jpg"), quality=92)

    det = _init_detector(None)
    det.thresh = 0.05          # random weights: let noise detections fire
    lmk = _init_landmarker(None, None)

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
