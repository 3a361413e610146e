"""Round-4 features: video demo (lib/demo_video.py) and the class-wise
paper scatter (evaluation/paint/scatter_by_class.py)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "_stubs"))


def _rand_frames(tmp_path, n=3, h=160, w=140, seed=7):
    from PIL import Image
    frames = tmp_path / "frames"
    frames.mkdir()
    rng = np.random.default_rng(seed)
    for i in range(n):
        Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
                        ).save(frames / f"f{i}.jpg")
    return frames


def test_video_demo_frame_dir(tmp_path):
    """--video on a directory of frames: every frame is annotated in order
    (demo_video.py per-frame flow with the frame-dir fallback)."""
    from PIL import Image

    from celebbasis_tpu.cli import align as align_cli

    frames = _rand_frames(tmp_path)
    det = align_cli._init_detector(None)
    lmk = align_cli._init_landmarker(None, None)
    out = tmp_path / "out"
    # random weights: threshold 0.05 makes noise detections fire (as the
    # annotate demo test does); the default 0.9 is restored afterwards
    n = align_cli.annotate_video(str(frames), str(out), det, lmk,
                                 thresh=0.05)
    assert n == 3
    assert det.thresh != 0.05           # restored
    files = sorted(os.listdir(out))
    assert files == [f"frame_{i:06d}.jpg" for i in range(3)]
    srcs = sorted(os.listdir(frames))
    drew = 0
    for f, s in zip(files, srcs):
        got = np.asarray(Image.open(out / f).convert("RGB"))
        src = np.asarray(Image.open(frames / s).convert("RGB"))
        assert got.shape == src.shape
        drew += int((got != src).any())
    assert drew > 0, "no detections drawn on any frame"


def test_video_demo_video_file(tmp_path):
    """--video on an actual video file: decode via cv2, annotate, re-encode
    (or frame-dir fallback when no codec is available)."""
    cv2 = pytest.importorskip("cv2")

    from celebbasis_tpu.cli import align as align_cli

    rng = np.random.default_rng(3)
    src = str(tmp_path / "in.avi")
    w = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"MJPG"), 10.0,
                        (96, 80))
    if not w.isOpened():
        pytest.skip("no video codec in this image")
    for _ in range(4):
        w.write(rng.integers(0, 255, (80, 96, 3), dtype=np.uint8))
    w.release()

    det = align_cli._init_detector(None)
    lmk = align_cli._init_landmarker(None, None)
    out = str(tmp_path / "out.mp4")
    n = align_cli.annotate_video(src, out, det, lmk, thresh=0.05)
    assert n == 4
    frame_dir = str(tmp_path / "out_frames")
    assert os.path.exists(out) or (
        os.path.isdir(frame_dir) and len(os.listdir(frame_dir)) == 4)


def test_read_txt_matches_reference(tmp_path):
    """read_txt: tab-separated float rows, identical to the reference's
    paint/read_data.py contract."""
    sys.path.insert(0, "/root/reference/evaluation/paint")
    import read_data as ref_rd

    from celebbasis_tpu.eval.survey import read_txt

    p = tmp_path / "exp.txt"
    rng = np.random.default_rng(5)
    rows = rng.uniform(0, 1, (16, 2))
    p.write_text("\n".join("\t".join(str(v) for v in r) for r in rows) + "\n")
    got = read_txt(str(p))
    want = ref_rd.read_txt(str(p))
    np.testing.assert_array_equal(got, want)
    assert got.shape == (16, 2)


def test_scatter_by_class_renders(tmp_path):
    """scatter_by_class: 4 classes x 4 task rows -> per-class colored series
    with mean+std markers and both legends, rendered to PNG
    (scatter_by_class.py:24-111)."""
    matplotlib = pytest.importorskip("matplotlib")

    from celebbasis_tpu.eval.survey import (scatter_by_class, split_data)

    rng = np.random.default_rng(9)
    data = rng.uniform(0.2, 0.9, (16, 2))
    chunks = split_data(data, 4)
    assert len(chunks) == 4 and all(c.shape == (4, 2) for c in chunks)

    out = scatter_by_class(data, str(tmp_path / "sota.png"))
    assert out and os.path.getsize(out) > 1000
    # two classes also renders (generic beyond the paper's fixed 4)
    out2 = scatter_by_class(
        data[:8], str(tmp_path / "two.png"), n_classes=2,
        class_names=("A", "B"), task_names=("t1", "t2", "t3", "t4"))
    assert out2 and os.path.getsize(out2) > 1000
