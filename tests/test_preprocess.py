"""PIPNet preprocessing parity (align/preprocess.py vs the reference's
lib/preprocess.py:1-554) on synthetic fixture annotations — crops compared
pixel-for-pixel, normalized landmark rows float-for-float.  The reference
module is imported from /root/reference (never copied); its hdf5storage
dependency is stubbed to scipy.io."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "_stubs"))
sys.path.insert(0, "/root/reference/evaluation/face_align/PIPNet/lib")

cv2 = pytest.importorskip("cv2")

from celebbasis_tpu.align import preprocess as pp  # noqa: E402


@pytest.fixture(scope="module")
def ref_pp():
    import preprocess as ref
    return ref


def _rand_image(rng, h, w):
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def _rand_pts(rng, n, h, w, margin=6):
    x = rng.uniform(margin, w - margin, (n, 1))
    y = rng.uniform(margin, h - margin, (n, 1))
    return np.concatenate([x, y], axis=1)


def test_process_300w_parity(tmp_path, ref_pp):
    """process_300w reads image + .pts from disk; both sides run on the same
    files (preprocess.py:6-41)."""
    rng = np.random.default_rng(0)
    folder = tmp_path / "data_300W" / "afw"
    folder.mkdir(parents=True)
    for i in range(3):
        img = _rand_image(rng, 90 + 7 * i, 120 - 5 * i)
        pts = _rand_pts(rng, 68, *img.shape[:2][::-1][::-1])
        cv2.imwrite(str(folder / f"im{i}.jpg"), img)
        with open(folder / f"im{i}.pts", "w") as f:
            f.write("version: 1\nn_points: 68\n{\n")
            for x, y in pts:
                f.write(f"{x} {y}\n")
            f.write("}\n")
        want_crop, want_anno = ref_pp.process_300w(
            str(tmp_path / "data_300W"), "afw", f"im{i}.jpg", f"im{i}.pts", 64)
        image = cv2.imread(str(folder / f"im{i}.jpg"))
        got_crop, got_anno = pp.process_300w_arrays(
            image, pp._read_pts(str(folder / f"im{i}.pts")), 64)
        np.testing.assert_array_equal(got_crop, want_crop)
        np.testing.assert_allclose(got_anno, want_anno, rtol=0, atol=0)


def test_process_cofw_parity(ref_pp):
    rng = np.random.default_rng(1)
    img = _rand_image(rng, 100, 80)
    bbox = np.asarray([12.0, 9.0, 55.0, 70.0])
    anno = np.concatenate([rng.uniform(15, 60, 29), rng.uniform(12, 72, 29),
                           rng.integers(0, 2, 29).astype(float)])
    want_crop, want_anno = ref_pp.process_cofw(img, bbox, anno, 48)
    got_crop, got_anno = pp.process_cofw_arrays(img, bbox, anno, 48)
    np.testing.assert_array_equal(got_crop, want_crop)
    np.testing.assert_allclose(got_anno, want_anno, rtol=0, atol=0)


def test_process_wflw_parity(tmp_path, ref_pp, monkeypatch):
    """process_wflw reads '../data/WFLW/WFLW_images/<name>' relative to the
    cwd (preprocess.py:66-68) — chdir into a matching layout."""
    rng = np.random.default_rng(2)
    (tmp_path / "data" / "WFLW" / "WFLW_images").mkdir(parents=True)
    (tmp_path / "run").mkdir()
    img = _rand_image(rng, 140, 110)
    cv2.imwrite(str(tmp_path / "data" / "WFLW" / "WFLW_images" / "a.jpg"),
                img)
    lms = _rand_pts(rng, 98, 140, 110).flatten()
    bbox = [20.0, 25.0, 95.0, 120.0]
    attrs = [0, 1, 0, 0, 1, 0]
    row = ([str(v) for v in lms] + [str(v) for v in bbox]
           + [str(a) for a in attrs] + ["a.jpg"])
    monkeypatch.chdir(tmp_path / "run")
    want_crop, want_anno = ref_pp.process_wflw(row, 64)
    image = cv2.imread(str(tmp_path / "data" / "WFLW" / "WFLW_images"
                           / "a.jpg"))
    got_crop, got_anno = pp.process_wflw_arrays(image, row[:196], bbox, 64)
    np.testing.assert_array_equal(got_crop, want_crop)
    np.testing.assert_allclose(list(got_anno), list(want_anno),
                               rtol=0, atol=0)


def test_process_aflw_parity(tmp_path, ref_pp):
    rng = np.random.default_rng(3)
    (tmp_path / "AFLW" / "flickr").mkdir(parents=True)
    img = _rand_image(rng, 120, 150)
    cv2.imwrite(str(tmp_path / "AFLW" / "flickr" / "b.jpg"), img)
    anno = np.concatenate([rng.uniform(30, 120, 19), rng.uniform(25, 95, 19)])
    bbox = [22.0, 130.0, 18.0, 100.0]          # (xmin, xmax, ymin, ymax)
    want_crop, want_anno = ref_pp.process_aflw(str(tmp_path), "b.jpg", bbox,
                                               anno, 56)
    image = cv2.imread(str(tmp_path / "AFLW" / "flickr" / "b.jpg"))
    got_crop, got_anno = pp.process_aflw_arrays(image, bbox, anno, 56)
    np.testing.assert_array_equal(got_crop, want_crop)
    np.testing.assert_allclose(list(got_anno), list(want_anno),
                               rtol=0, atol=0)


def test_convert_wflw_98_to_68_parity(tmp_path, ref_pp, monkeypatch):
    """convert_wflw rewrites ../data/WFLW/test.txt into 68-point rows
    (preprocess.py:155-231); every remapped coordinate must match."""
    rng = np.random.default_rng(4)
    (tmp_path / "data" / "WFLW").mkdir(parents=True)
    (tmp_path / "run").mkdir()
    out_ref = tmp_path / "out_ref" / "w68"
    out_ref.mkdir(parents=True)
    rows = []
    for i in range(4):
        pts = rng.uniform(0, 1, (98, 2))
        rows.append(f"img_{i}.jpg " + " ".join(str(v)
                                               for v in pts.flatten()))
    with open(tmp_path / "data" / "WFLW" / "test.txt", "w") as f:
        f.write("\n".join(rows) + "\n")
    monkeypatch.chdir(tmp_path / "run")
    ref_pp.convert_wflw(str(tmp_path / "out_ref"), "w68")

    out_ours = tmp_path / "out_ours" / "w68"
    out_ours.mkdir(parents=True)
    pp.convert_wflw(str(tmp_path / "out_ours"), "w68",
                    str(tmp_path / "data" / "WFLW" / "test.txt"))

    def parse(p):
        out = []
        with open(p) as f:
            for line in f:
                tok = line.strip().split()
                if tok:
                    out.append((tok[0], [float(v) for v in tok[1:]]))
        return out

    got, want = parse(out_ours / "test.txt"), parse(out_ref / "test.txt")
    assert len(got) == len(want) == 4
    for (gn, gv), (wn, wv) in zip(got, want):
        assert gn == wn
        assert len(gv) == len(wv) == 136     # 68 landmarks
        np.testing.assert_allclose(gv, wv, rtol=0, atol=0)


def test_gen_meanface_parity(tmp_path, ref_pp):
    rng = np.random.default_rng(5)
    for d in ("ref", "ours"):
        (tmp_path / d / "ds").mkdir(parents=True)
    rows = [f"im{i}.jpg " + " ".join(str(v) for v in rng.uniform(0, 1, 10))
            for i in range(6)]
    for d in ("ref", "ours"):
        with open(tmp_path / d / "ds" / "train.txt", "w") as f:
            f.write("\n".join(rows) + "\n")
    ref_pp.gen_meanface(str(tmp_path / "ref"), "ds")
    mean = pp.gen_meanface(str(tmp_path / "ours"), "ds")
    want = np.loadtxt(tmp_path / "ref" / "ds" / "meanface.txt")
    got = np.loadtxt(tmp_path / "ours" / "ds" / "meanface.txt")
    np.testing.assert_allclose(got, want, rtol=0, atol=0)
    np.testing.assert_allclose(mean, want, rtol=0, atol=0)


def _build_300w_layout(root, rng):
    """Mini 300W: every reference folder, 2 image/.pts pairs each."""
    folders = ["afw", "helen/trainset", "helen/testset", "lfpw/trainset",
               "lfpw/testset", "ibug"]
    for fi, folder in enumerate(folders):
        d = root / "data_300W" / folder
        d.mkdir(parents=True, exist_ok=True)
        for i in range(2):
            h, w = 100 + 3 * fi, 130 - 4 * i
            img = _rand_image(rng, h, w)
            pts = _rand_pts(rng, 68, h, w)
            cv2.imwrite(str(d / f"im{i}.png"), img)
            with open(d / f"im{i}.pts", "w") as f:
                f.write("version: 1\nn_points: 68\n{\n")
                for x, y in pts:
                    f.write(f"{x} {y}\n")
                f.write("}\n")


def test_gen_data_300w_e2e(tmp_path, ref_pp):
    """Full data_300W driver vs the reference's gen_data: same label files
    (parsed), same split membership, same crops (preprocess.py:239-301)."""
    rng = np.random.default_rng(6)
    _build_300w_layout(tmp_path / "ref", rng)
    rng = np.random.default_rng(6)             # identical layout for ours
    _build_300w_layout(tmp_path / "ours", rng)

    ref_pp.gen_data(str(tmp_path / "ref"), "data_300W", 64)
    pp.gen_data(str(tmp_path / "ours"), "data_300W", 64)

    def parse(p):
        rows = {}
        with open(p) as f:
            for line in f:
                tok = line.strip().split()
                if tok:
                    rows[tok[0]] = [float(v) for v in tok[1:]]
        return rows

    for name in ("train.txt", "test.txt", "test_common.txt",
                 "test_challenge.txt"):
        got = parse(tmp_path / "ours" / "data_300W" / name)
        want = parse(tmp_path / "ref" / "data_300W" / name)
        assert got.keys() == want.keys(), name
        for k in want:
            np.testing.assert_allclose(got[k], want[k], rtol=0, atol=0,
                                       err_msg=f"{name}:{k}")
    got_mean = np.loadtxt(tmp_path / "ours" / "data_300W" / "meanface.txt")
    want_mean = np.loadtxt(tmp_path / "ref" / "data_300W" / "meanface.txt")
    np.testing.assert_allclose(got_mean, want_mean, rtol=0, atol=0)
    # crops identical
    for split in ("images_train", "images_test"):
        names = sorted(os.listdir(tmp_path / "ref" / "data_300W" / split))
        assert names == sorted(os.listdir(
            tmp_path / "ours" / "data_300W" / split)) and names
        for n in names[:3]:
            a = cv2.imread(str(tmp_path / "ours" / "data_300W" / split / n))
            b = cv2.imread(str(tmp_path / "ref" / "data_300W" / split / n))
            np.testing.assert_array_equal(a, b)


def test_preprocess_then_train_chain(tmp_path):
    """Raw 300W layout -> cli/preprocess_pipnet -> cli/train_pipnet: PIPNet
    training runs end-to-end from the public dataset layout with no
    externally supplied meanface (closes SURVEY §2.4's last partial row)."""
    import torch

    from celebbasis_tpu.cli import preprocess_pipnet, train_pipnet

    rng = np.random.default_rng(8)
    _build_300w_layout(tmp_path, rng)
    preprocess_pipnet.main(["data_300W", "--root", str(tmp_path),
                            "--target_size", "64", "--quiet"])
    ddir = tmp_path / "data_300W"
    assert (ddir / "meanface.txt").exists()
    assert len(os.listdir(ddir / "images_train")) == 6

    save = tmp_path / "snap"
    train_pipnet.main(["--data_dir", str(ddir), "--save_dir", str(save),
                       "--tiny", "--num_nb", "2", "--input_size", "64",
                       "--batch_size", "3", "--epochs", "2",
                       "--decay_steps", "1", "--save_interval", "2"])
    cks = sorted(os.listdir(save))
    assert cks == ["epoch1.pth"]
    assert len(torch.load(str(save / cks[0]), weights_only=True)) > 0


def test_gen_data_cofw_e2e(tmp_path, ref_pp):
    """COFW driver vs reference on a synthetic v5 .mat (cells of images,
    grayscale + color rows; preprocess.py:303-353)."""
    import scipy.io

    rng = np.random.default_rng(7)

    def build(root):
        r = np.random.default_rng(7)
        (root / "COFW" / "images_train").mkdir(parents=True)
        (root / "COFW" / "images_test").mkdir(parents=True)
        for mat_name, n in (("COFW_train_color.mat", 3),
                            ("COFW_test_color.mat", 2)):
            cells = np.empty((n, 1), object)
            bboxes = np.zeros((n, 4))
            phis = np.zeros((n, 87))
            for i in range(n):
                if i % 2:      # grayscale row exercises the GRAY2BGR branch
                    cells[i, 0] = r.integers(0, 256, (90, 100),
                                             dtype=np.uint8)
                else:
                    cells[i, 0] = r.integers(0, 256, (90, 100, 3),
                                             dtype=np.uint8)
                bboxes[i] = [10.0 + i, 8.0, 60.0, 70.0]
                phis[i] = np.concatenate([r.uniform(15, 65, 29),
                                          r.uniform(10, 75, 29),
                                          r.integers(0, 2, 29)])
            keys = (("IsTr", "bboxesTr", "phisTr") if "train" in mat_name
                    else ("IsT", "bboxesT", "phisT"))
            scipy.io.savemat(str(root / "COFW" / mat_name),
                             {keys[0]: cells, keys[1]: bboxes,
                              keys[2]: phis})

    build(tmp_path / "ref")
    build(tmp_path / "ours")
    ref_pp.gen_data(str(tmp_path / "ref"), "COFW", 48)
    pp.gen_data(str(tmp_path / "ours"), "COFW", 48)

    for name in ("train.txt", "test.txt", "meanface.txt"):
        with open(tmp_path / "ours" / "COFW" / name) as f:
            got = f.read().split()
        with open(tmp_path / "ref" / "COFW" / name) as f:
            want = f.read().split()
        assert len(got) == len(want), name
        for g, w in zip(got, want):
            try:
                assert float(g) == float(w), (name, g, w)
            except ValueError:
                assert g == w, name
    for split in ("images_train", "images_test"):
        for n in sorted(os.listdir(tmp_path / "ref" / "COFW" / split)):
            a = cv2.imread(str(tmp_path / "ours" / "COFW" / split / n))
            b = cv2.imread(str(tmp_path / "ref" / "COFW" / split / n))
            np.testing.assert_array_equal(a, b)
