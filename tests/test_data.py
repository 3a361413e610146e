"""Dataset / loader tests against the reference's pickle + batch contract."""
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from celebbasis_tpu.data.face_id import (FaceIdDataset, FaceIdDatasetConfig,
                                         PrefetchLoader, parse_specific_ids,
                                         PLACEHOLDER_STRINGS)
from celebbasis_tpu.text import CLIPTokenizer


@pytest.fixture(scope="module")
def fake_ffhq(tmp_path_factory):
    d = tmp_path_factory.mktemp("ffhq")
    paths = []
    rng = np.random.default_rng(0)
    for i in range(5):
        p = d / f"{i:05d}.png"
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
                        ).save(p)
        paths.append(str(p))
    pkl = d / "ffhq.pickle"
    with open(pkl, "wb") as f:
        pickle.dump(paths, f)
    return str(pkl)


def test_dataset_basic(fake_ffhq):
    cfg = FaceIdDatasetConfig(pickle_path=fake_ffhq, num_ids=2,
                              specific_ids=[1, 2], image_size=64, repeats=10)
    ds = FaceIdDataset(cfg)
    assert len(ds) == 20
    ex = ds[0]
    assert ex["image"].shape == (64, 64, 3)
    assert ex["image"].min() >= -1.0 and ex["image"].max() <= 1.0
    # diff_cnt=0 -> faces = [main, aug2(main)] = 2 slots
    assert ex["faces"].shape == (2, 64, 64, 3)
    assert ex["num_ids"] == 1
    assert f"face of {PLACEHOLDER_STRINGS[0]} person" in ex["caption"]
    assert ex["ids"].shape == (2,)


def test_dataset_specific_ids(fake_ffhq):
    cfg = FaceIdDatasetConfig(pickle_path=fake_ffhq, num_ids=2,
                              specific_ids=[3, 4], image_size=64, repeats=1)
    ds = FaceIdDataset(cfg)
    assert ds.img_dict[0]["id"] == "00003"
    assert ds.img_dict[1]["id"] == "00004"
    assert parse_specific_ids("3-7") == [3, 4, 5, 6]


def test_dataset_not_enough_ids(fake_ffhq):
    cfg = FaceIdDatasetConfig(pickle_path=fake_ffhq, num_ids=9)
    with pytest.raises(ValueError, match="not enough identities"):
        FaceIdDataset(cfg)


def test_dataset_diff_cnt(fake_ffhq):
    cfg = FaceIdDatasetConfig(pickle_path=fake_ffhq, num_ids=3,
                              image_size=64, repeats=2, diff_cnt=1)
    ds = FaceIdDataset(cfg)
    ex = ds[0]
    # 1 + diff(1) + aug2(1+1) = 4 faces
    assert ex["faces"].shape == (4, 64, 64, 3)
    main, diff = int(ex["ids"][0]), int(ex["ids"][1])
    assert main != diff
    assert list(ex["ids"][2:]) == [main, diff]


def test_loader_batches(fake_ffhq):
    tok = CLIPTokenizer.synthetic(size=1024)
    cfg = FaceIdDatasetConfig(pickle_path=fake_ffhq, num_ids=2,
                              image_size=64, repeats=4)
    ds = FaceIdDataset(cfg)
    loader = PrefetchLoader(ds, tok, batch_size=2, face_size=32)
    batches = list(loader)
    assert len(batches) == 4
    b = batches[0]
    assert b["image"].shape == (2, 64, 64, 3)
    assert b["faces"].shape == (2, 2, 32, 32, 3)
    assert b["tokens"].shape == (2, 77)
    assert b["tokens"].dtype == np.int32
    assert b["num_ids"].shape == (2,)


def test_vgg_pickle_format(tmp_path):
    """(path, quality) tuple pickles with directory-name identities."""
    rng = np.random.default_rng(1)
    entries = []
    for pid in ("alice", "bob"):
        d = tmp_path / pid
        d.mkdir()
        for j in range(3):
            p = d / f"{j}.png"
            Image.fromarray(rng.integers(0, 255, (32, 32, 3),
                                         dtype=np.uint8)).save(p)
            entries.append((str(p), float(j)))  # ascending quality
    pkl = tmp_path / "vgg.pickle"
    with open(pkl, "wb") as f:
        pickle.dump(entries, f)
    cfg = FaceIdDatasetConfig(pickle_path=str(pkl), num_ids=2,
                              images_per_id=2, image_size=32, repeats=2)
    ds = FaceIdDataset(cfg)
    assert set(d["id"] for d in ds.img_dict.values()) == {"alice", "bob"}
    # best-quality-first ordering: image '2.png' (quality 2.0) leads
    assert ds.img_dict[0]["images"][0].endswith("2.png")
    ex = ds[1]
    assert ex["image"].shape == (32, 32, 3)
