"""Round-3 continuation: PIPNet backbone family + align demo mode."""
import os

import numpy as np


def test_align_annotate_demo_mode(tmp_path):
    """cli/align --annotate (lib/demo.py parity): draws every detection's
    box + landmarks and writes <name>_out.jpg, no crops / no pickle."""
    from PIL import Image
    from celebbasis_tpu.cli import align as align_cli

    photos = tmp_path / "photos"
    photos.mkdir()
    rng = np.random.default_rng(7)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (160, 140, 3), dtype=np.uint8)
                        ).save(photos / f"p{i}.jpg")
    det = align_cli._init_detector(None)
    det.thresh = 0.05            # random weights: make noise detections fire
    lmk = align_cli._init_landmarker(None, None)
    out = tmp_path / "demo"
    out.mkdir()
    n = sum(align_cli._annotate_one(str(photos / f), str(out), det, lmk)
            for f in sorted(os.listdir(photos)))
    assert n > 0, "no detections — threshold hack stopped working"
    files = sorted(os.listdir(out))
    assert files == [f"p{i}_out.jpg" for i in range(2)]
    for i, f in enumerate(files):
        got = np.asarray(Image.open(out / f).convert("RGB"))
        src = np.asarray(Image.open(photos / f"p{i}.jpg").convert("RGB"))
        assert got.shape == src.shape
        assert (got != src).any()   # something was drawn


def test_pipnet_config_presets():
    from celebbasis_tpu.align.pipnet import PIPNetConfig

    r18 = PIPNetConfig.resnet18(num_lms=68)
    assert r18.block == "basic" and r18.layers == (2, 2, 2, 2)
    assert PIPNetConfig.resnet50().layers == (3, 4, 6, 3)
    assert PIPNetConfig.resnet101().layers == (3, 4, 23, 3)
    assert PIPNetConfig.mbnetv2().arch == "mbnetv2"
    assert PIPNetConfig.mbnetv3().arch == "mbnetv3"
