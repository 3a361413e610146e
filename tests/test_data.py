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


@pytest.mark.smoke
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


# -- ColorJitter parity (VERDICT r2 missing #6 / next #8) ---------------------
# Oracle: torchvision's *tensor-backend* formulas implemented in torch by the
# test (torchvision itself is not in this image); our PIL-backend path must
# agree within uint8 quantization.

def _torch_oracle_ops():
    import torch

    def gray(x):  # rgb_to_grayscale, ITU-R 601-2
        r, g, b = x.unbind(0)
        return (0.2989 * r + 0.587 * g + 0.114 * b).unsqueeze(0)

    def brightness(x, f):
        return (x * f).clamp(0, 1)

    def contrast(x, f):
        mean = gray(x).mean()
        return (f * x + (1 - f) * mean).clamp(0, 1)

    def saturation(x, f):
        return (f * x + (1 - f) * gray(x)).clamp(0, 1)

    return brightness, contrast, saturation


@pytest.mark.parametrize("op_idx,factor", [
    (0, 0.8), (0, 1.2), (1, 0.8), (1, 1.2), (2, 0.8), (2, 1.2)])
def test_color_ops_match_torchvision_math(op_idx, factor):
    import torch
    from celebbasis_tpu.data.face_id import (adjust_brightness,
                                             adjust_contrast,
                                             adjust_saturation)
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    img = Image.fromarray(arr)
    ours_fn = [adjust_brightness, adjust_contrast, adjust_saturation][op_idx]
    ours = np.asarray(ours_fn(img, factor), np.float32) / 255.0
    x = torch.from_numpy(arr).permute(2, 0, 1).float() / 255.0
    oracle = _torch_oracle_ops()[op_idx](x, factor)
    expect = oracle.permute(1, 2, 0).numpy()
    # PIL ImageEnhance quantizes to uint8 and uses the rounded L-mean for
    # contrast; tolerance covers that quantization only
    np.testing.assert_allclose(ours, expect, atol=6 / 255.0)


def test_adjust_hue_rotates_and_wraps():
    from celebbasis_tpu.data.face_id import adjust_hue
    red = Image.fromarray(np.full((8, 8, 3), [255, 0, 0], np.uint8))
    # +1/3 hue on pure red -> pure green (HSV rotation)
    out = np.asarray(adjust_hue(red, 0.33))
    assert out[0, 0].argmax() == 1, out[0, 0]
    # identity at 0
    np.testing.assert_array_equal(np.asarray(adjust_hue(red, 0.0)),
                                  np.asarray(red))
    # negative shifts wrap
    out_neg = np.asarray(adjust_hue(red, -0.33))
    assert out_neg[0, 0].argmax() == 2, out_neg[0, 0]
    with pytest.raises(ValueError):
        adjust_hue(red, 0.7)


def test_jitter_applied_in_train_not_dev(fake_ffhq):
    cfg = FaceIdDatasetConfig(pickle_path=fake_ffhq, num_ids=2,
                              image_size=64, repeats=2, flip_p=0.0)
    ds = FaceIdDataset(cfg)
    a = ds[0]["image"]
    b = ds[0]["image"]
    assert np.abs(a - b).max() > 0, "train jitter should vary"
    cfg_dev = FaceIdDatasetConfig(pickle_path=fake_ffhq, num_ids=2,
                                  image_size=64, repeats=2, flip_p=0.0,
                                  split="dev")
    dsd = FaceIdDataset(cfg_dev)
    np.testing.assert_array_equal(dsd[0]["image"], dsd[0]["image"])


@pytest.mark.smoke
def test_loader_per_host_sharding(fake_ffhq):
    """Multi-host data sharding (SURVEY §2.5): same seed -> same global
    order; shards are disjoint and cover it."""
    from celebbasis_tpu.data.face_id import PrefetchLoader
    from celebbasis_tpu.text import CLIPTokenizer
    tok = CLIPTokenizer.synthetic(size=1024)
    cfg = FaceIdDatasetConfig(pickle_path=fake_ffhq, num_ids=2,
                              image_size=32, repeats=8, flip_p=0.0,
                              split="dev")
    seen = []
    for shard in range(2):
        ds = FaceIdDataset(cfg)
        loader = PrefetchLoader(ds, tok, batch_size=2, shuffle=True, seed=9,
                                shard_id=shard, num_shards=2)
        ids = [int(i) for b in loader for i in b["ids"][:, 0]]
        seen.append(ids)
    assert len(seen[0]) == len(seen[1]) == len(FaceIdDataset(cfg)) // 2
    # deterministic across constructions with the same seed
    ds = FaceIdDataset(cfg)
    again = [int(i) for b in PrefetchLoader(ds, tok, 2, shuffle=True, seed=9,
                                            shard_id=0, num_shards=2)
             for i in b["ids"][:, 0]]
    assert again == seen[0]
