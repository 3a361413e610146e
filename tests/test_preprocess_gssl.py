"""GSSL preprocessing parity (align/preprocess.py GSSL section vs the
reference's lib/preprocess_gssl.py:1-544) on synthetic fixtures — crops
pixel-for-pixel, label rows float-for-float.  The reference module is
imported from /root/reference (never copied); its hdf5storage dependency is
stubbed to scipy.io.

The reference's ``cp -r .../CELEBA/images_train .../data_300W_CELEBA/.``
merges the crops flat into the pre-existing images_train/ (GNU cp semantics
when the destination directory exists); our copy loop reproduces that, and
the data_300W_CELEBA e2e below pins it.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "_stubs"))
sys.path.insert(0, "/root/reference/evaluation/face_align/PIPNet/lib")

cv2 = pytest.importorskip("cv2")
scipy_io = pytest.importorskip("scipy.io")

from celebbasis_tpu.align import preprocess as pp  # noqa: E402


@pytest.fixture(scope="module")
def refg():
    import preprocess_gssl as ref
    return ref


def _rand_image(rng, h, w):
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def _rand_pts(rng, n, h, w, margin=6):
    x = rng.uniform(margin, w - margin, (n, 1))
    y = rng.uniform(margin, h - margin, (n, 1))
    return np.concatenate([x, y], axis=1)


# ---------------------------------------------------------------------------
# per-function parity
# ---------------------------------------------------------------------------

def test_process_celeba_parity(tmp_path, refg):
    """CELEBA crop drops the top margin (preprocess_gssl.py:91-109)."""
    rng = np.random.default_rng(10)
    d = tmp_path / "CELEBA" / "img_celeba"
    d.mkdir(parents=True)
    for i in range(3):
        img = _rand_image(rng, 120 + 5 * i, 100 - 3 * i)
        cv2.imwrite(str(d / f"{i:06d}.jpg"), img)
        bbox = [12 + i, 9, 80 - i, 105]
        want = refg.process_celeba(str(tmp_path), f"{i:06d}.jpg",
                                   list(bbox), 48)
        image = cv2.imread(str(d / f"{i:06d}.jpg"))
        got = pp.process_celeba_arrays(image, bbox, 48)
        np.testing.assert_array_equal(got, want)


def test_process_cofw68_train_parity(refg):
    rng = np.random.default_rng(11)
    img = _rand_image(rng, 110, 90)
    bbox = np.asarray([11.0, 8.0, 58.0, 72.0])
    phis = np.concatenate([rng.uniform(15, 60, 29), rng.uniform(12, 76, 29),
                           rng.integers(0, 2, 29).astype(float)])
    want_crop, want_anno = refg.process_cofw_68_train(img, bbox, phis, 48)
    got_crop, got_anno = pp.process_cofw68_train_arrays(img, bbox, phis, 48)
    np.testing.assert_array_equal(got_crop, want_crop)
    np.testing.assert_allclose(got_anno, want_anno, rtol=0, atol=0)


def test_process_cofw68_test_parity(refg):
    rng = np.random.default_rng(12)
    img = _rand_image(rng, 100, 120)
    bbox = np.asarray([14.0, 10.0, 70.0, 66.0])
    pts68 = _rand_pts(rng, 68, 100, 120)
    want_crop, want_anno = refg.process_cofw_68_test(img, bbox, pts68, 56)
    got_crop, got_anno = pp.process_cofw68_test_arrays(img, bbox, pts68, 56)
    np.testing.assert_array_equal(got_crop, want_crop)
    np.testing.assert_allclose(got_anno, want_anno, rtol=0, atol=0)


def test_process_wflw_gssl_drop_top(tmp_path, refg, monkeypatch):
    """The GSSL process_wflw *raises* the top edge (preprocess_gssl.py:66:
    ``bbox_ymin += height*(scale-1)/2``) unlike the supervised variant —
    pinned via drop_top=True, and drop_top=False must differ."""
    rng = np.random.default_rng(13)
    (tmp_path / "data" / "WFLW" / "WFLW_images").mkdir(parents=True)
    (tmp_path / "run").mkdir()
    img = _rand_image(rng, 150, 115)
    cv2.imwrite(str(tmp_path / "data" / "WFLW" / "WFLW_images" / "g.jpg"),
                img)
    lms = _rand_pts(rng, 98, 150, 115).flatten()
    bbox = [18.0, 30.0, 100.0, 130.0]
    row = ([str(v) for v in lms] + [str(v) for v in bbox]
           + [str(a) for a in [0, 1, 0, 0, 1, 0]] + ["g.jpg"])
    monkeypatch.chdir(tmp_path / "run")
    want_crop, want_anno = refg.process_wflw(row, 64)
    image = cv2.imread(str(tmp_path / "data" / "WFLW" / "WFLW_images"
                           / "g.jpg"))
    got_crop, got_anno = pp.process_wflw_arrays(image, row[:196], bbox, 64,
                                                drop_top=True)
    np.testing.assert_array_equal(got_crop, want_crop)
    np.testing.assert_allclose(list(got_anno), list(want_anno),
                               rtol=0, atol=0)
    sup_crop, _ = pp.process_wflw_arrays(image, row[:196], bbox, 64)
    assert not np.array_equal(sup_crop, want_crop)


def test_convert_wflw_gssl_parity(tmp_path, refg):
    rng = np.random.default_rng(14)
    for d in ("ref", "ours"):
        (tmp_path / d / "task").mkdir(parents=True)
    rows = [f"img_{i}.jpg " + " ".join(str(v)
                                       for v in rng.uniform(0, 1, 196))
            for i in range(3)]
    for d in ("ref", "ours"):
        with open(tmp_path / d / "task" / "test_WFLW_98.txt", "w") as f:
            f.write("\n".join(rows) + "\n")
    refg.convert_wflw(str(tmp_path / "ref"), "task")
    pp.convert_wflw_gssl(str(tmp_path / "ours"), "task")
    for d, out in (("ref", []), ("ours", [])):
        with open(tmp_path / d / "task" / "test_WFLW.txt") as f:
            for line in f:
                tok = line.strip().split()
                if tok:
                    out.append((tok[0], [float(v) for v in tok[1:]]))
        if d == "ref":
            want = out
        else:
            got = out
    assert len(got) == len(want) == 3
    for (gn, gv), (wn, wv) in zip(got, want):
        assert gn == wn and len(gv) == len(wv) == 136
        np.testing.assert_allclose(gv, wv, rtol=0, atol=0)


# ---------------------------------------------------------------------------
# full-driver e2e (gen_data, preprocess_gssl.py:251-531)
# ---------------------------------------------------------------------------

def _build_gssl_layout(root, task, seed=20):
    """Every raw input the GSSL drivers read, tiny: CELEBA crops+bboxes,
    300W pairs, COFW train/test .mats, the task dir's cofw68 bbox/annotation
    .mats, and the WFLW images+annotation lists."""
    rng = np.random.default_rng(seed)
    # CELEBA
    cdir = root / "CELEBA" / "img_celeba"
    cdir.mkdir(parents=True)
    with open(root / "CELEBA" / "celeba_bboxes.txt", "w") as f:
        for i in range(2):
            img = _rand_image(rng, 130, 105)
            cv2.imwrite(str(cdir / f"{i:06d}.jpg"), img)
            f.write(f"{i:06d}.jpg {10 + i} 12 90 118\n")
    # 300W
    for fi, folder in enumerate(["afw", "helen/trainset", "helen/testset",
                                 "lfpw/trainset", "lfpw/testset", "ibug"]):
        d = root / "data_300W" / folder
        d.mkdir(parents=True)
        for i in range(2):
            h, w = 100 + 3 * fi, 128 - 4 * i
            img = _rand_image(rng, h, w)
            pts = _rand_pts(rng, 68, h, w)
            cv2.imwrite(str(d / f"im{i}.png"), img)
            with open(d / f"im{i}.pts", "w") as f:
                f.write("version: 1\nn_points: 68\n{\n")
                for x, y in pts:
                    f.write(f"{x} {y}\n")
                f.write("}\n")
    # COFW train/test mats
    (root / "COFW").mkdir(parents=True)
    for mat_name, n, keys in (
            ("COFW_train_color.mat", 3, ("IsTr", "bboxesTr", "phisTr")),
            ("COFW_test_color.mat", 2, ("IsT", "bboxesT", "phisT"))):
        cells = np.empty((n, 1), object)
        bboxes = np.zeros((n, 4))
        phis = np.zeros((n, 87))
        for i in range(n):
            if i % 2:
                cells[i, 0] = rng.integers(0, 256, (95, 100), dtype=np.uint8)
            else:
                cells[i, 0] = rng.integers(0, 256, (95, 100, 3),
                                           dtype=np.uint8)
            bboxes[i] = [10.0 + i, 8.0, 60.0, 70.0]
            phis[i] = np.concatenate([rng.uniform(15, 65, 29),
                                      rng.uniform(10, 78, 29),
                                      rng.integers(0, 2, 29)])
        scipy_io.savemat(str(root / "COFW" / mat_name),
                         {keys[0]: cells, keys[1]: bboxes, keys[2]: phis})
    # task dir: cofw68 test bboxes + per-image 68-pt annotations
    tdir = root / task
    (tdir / "cofw68_test_annotations").mkdir(parents=True)
    scipy_io.savemat(str(tdir / "cofw68_test_bboxes.mat"),
                     {"bboxes": np.asarray([[12.0, 9.0, 64.0, 70.0],
                                            [14.0, 11.0, 60.0, 68.0]])})
    for i in range(2):
        scipy_io.savemat(str(tdir / "cofw68_test_annotations"
                             / f"{i + 1}_points.mat"),
                         {"Points": _rand_pts(rng, 68, 95, 100)})
    # WFLW
    wdir = root / "WFLW"
    (wdir / "WFLW_images").mkdir(parents=True)
    adir = wdir / "WFLW_annotations" / "list_98pt_rect_attr_train_test"
    adir.mkdir(parents=True)
    for split, n in (("train", 3), ("test", 2)):
        rows = []
        for i in range(n):
            h, w = 140 + 2 * i, 118
            name = f"{split}_{i}.jpg"
            cv2.imwrite(str(wdir / "WFLW_images" / name),
                        _rand_image(rng, h, w))
            lms = _rand_pts(rng, 98, h, w).flatten()
            rows.append(" ".join(str(v) for v in lms)
                        + f" 16.0 28.0 {w - 14}.0 {h - 10}.0 0 1 0 0 1 0 "
                        + name)
        with open(adir / f"list_98pt_rect_attr_{split}.txt", "w") as f:
            f.write("\n".join(rows) + "\n")


def _parse_rows(path):
    rows = {}
    with open(path) as f:
        for line in f:
            tok = line.strip().split()
            if tok:
                rows[tok[0]] = [float(v) for v in tok[1:]]
    return rows


def _assert_label_files_match(ours_dir, ref_dir, names):
    for name in names:
        got = _parse_rows(ours_dir / name)
        want = _parse_rows(ref_dir / name)
        assert got.keys() == want.keys(), name
        for k in want:
            np.testing.assert_allclose(got[k], want[k], rtol=0, atol=0,
                                       err_msg=f"{name}:{k}")


def _assert_crops_match(ours_dir, ref_dir, limit=4):
    names = sorted(os.listdir(ref_dir))
    names = [n for n in names if n.endswith((".jpg", ".png"))]
    assert names
    for n in names[:limit]:
        a = cv2.imread(str(ours_dir / n))
        b = cv2.imread(str(ref_dir / n))
        assert a is not None and b is not None, n
        np.testing.assert_array_equal(a, b, err_msg=n)


@pytest.mark.parametrize("task", ["data_300W_CELEBA", "data_300W_COFW_WFLW"])
def test_gen_data_gssl_e2e(tmp_path, refg, monkeypatch, task):
    """Full GSSL driver vs the reference's gen_data on identical layouts.
    The reference hardcodes '../data/...' paths (it is run from lib/), so it
    executes chdir'd into <ref>/run with root '../data'."""
    for side in ("ref", "ours"):
        _build_gssl_layout(tmp_path / side / "data", task)
    (tmp_path / "ref" / "run").mkdir()

    monkeypatch.chdir(tmp_path / "ref" / "run")
    if task == "data_300W_CELEBA":
        refg.gen_data("../data", "CELEBA", 48)
    refg.gen_data("../data", task, 48)
    monkeypatch.chdir(tmp_path)

    ours_root = str(tmp_path / "ours" / "data")
    if task == "data_300W_CELEBA":
        pp.gen_data_gssl(ours_root, "CELEBA", 48)
    pp.gen_data_gssl(ours_root, task, 48)

    ours = tmp_path / "ours" / "data" / task
    ref = tmp_path / "ref" / "data" / task
    label_files = ["train_300W.txt", "test_300W.txt", "test_COFW.txt",
                   "test_WFLW_98.txt", "test_WFLW.txt"]
    _assert_label_files_match(ours, ref, label_files)
    got_mean = np.loadtxt(ours / "meanface.txt")
    want_mean = np.loadtxt(ref / "meanface.txt")
    np.testing.assert_allclose(got_mean, want_mean, rtol=0, atol=0)

    for sub in ("images_train", "images_test_300W", "images_test_COFW",
                "images_test_WFLW"):
        _assert_crops_match(ours / sub, ref / sub)

    if task == "data_300W_CELEBA":
        # unlabeled pool: both sides merge the CELEBA crops flat
        with open(ours / "train_CELEBA.txt") as f:
            got_names = f.read().split()
        with open(ref / "train_CELEBA.txt") as f:
            assert got_names == f.read().split()
        for n in got_names:
            a = cv2.imread(str(ours / "images_train" / n))
            b = cv2.imread(str(ref / "images_train" / n))
            assert a is not None and b is not None, n
            np.testing.assert_array_equal(a, b, err_msg=n)
    else:
        # unlabeled COFW/WFLW train pools: name lists + crops
        for list_name, prefix in (("train_COFW.txt", "cofw_train_"),
                                  ("train_WFLW.txt", "wflw_train_")):
            with open(ours / list_name) as f:
                got_names = f.read().split()
            with open(ref / list_name) as f:
                assert got_names == f.read().split()
            assert all(n.startswith(prefix) for n in got_names)
            for n in got_names:
                a = cv2.imread(str(ours / "images_train" / n))
                b = cv2.imread(str(ref / "images_train" / n))
                assert a is not None and b is not None, n
                np.testing.assert_array_equal(a, b, err_msg=n)


def test_preprocess_then_gssl_train_chain(tmp_path):
    """Raw GSSL layout -> cli/preprocess_pipnet -> cli/train_pipnet_gssl:
    the semi-supervised curriculum runs end-to-end from the public dataset
    layouts (train_gssl.py's full flow), incl. per-epoch reference
    augmentations and the post-training NME eval over the three splits."""
    import torch

    from celebbasis_tpu.cli import preprocess_pipnet, train_pipnet_gssl

    root = tmp_path / "data"
    _build_gssl_layout(root, "data_300W_CELEBA", seed=30)
    preprocess_pipnet.main(["CELEBA", "--root", str(root),
                            "--target_size", "64", "--quiet"])
    preprocess_pipnet.main(["data_300W_CELEBA", "--root", str(root),
                            "--target_size", "64", "--quiet"])
    ddir = root / "data_300W_CELEBA"
    assert (ddir / "meanface.txt").exists()

    save = tmp_path / "snap"
    train_pipnet_gssl.main([
        "--data_dir", str(ddir), "--save_dir", str(save), "--tiny",
        "--num_nb", "2", "--input_size", "128", "--batch_size", "3",
        "--epochs", "1", "--decay_steps", "1", "--no_curriculum",
        "--eval"])
    cks = sorted(os.listdir(save))
    assert cks == ["epoch0.pth"]
    assert len(torch.load(str(save / cks[0]), weights_only=True)) > 0
