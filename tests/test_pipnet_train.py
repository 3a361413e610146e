"""PIPNet trainer parity + convergence (align/pipnet_train.py vs the
reference's vendored training stack, lib/functions.py + lib/data_utils.py).

Oracle modules are imported from /root/reference (never copied); the loss
and label-generation semantics are pinned exactly, the augmentation chain
is replayed draw-for-draw against the reference's PIL math, and a tiny
net must actually learn synthetic landmarks.
"""
import os
import random as _py_random
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference/evaluation/face_align/PIPNet/lib")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

torch = pytest.importorskip("torch")

from celebbasis_tpu.align import pipnet_train as pt  # noqa: E402
from celebbasis_tpu.align.pipnet import PIPNet, PIPNetConfig  # noqa: E402


@pytest.fixture(scope="module")
def ref_data_utils():
    return pytest.importorskip("data_utils")


@pytest.fixture(scope="module")
def ref_functions():
    # functions.py does `from scipy.integrate import simps`; scipy>=1.14
    # renamed it — alias before import (oracle shim, not product code)
    import scipy.integrate as si
    if not hasattr(si, "simps"):
        si.simps = si.simpson
    return pytest.importorskip("functions")


def _rand_case(seed, B=3, L=7, nb=3, g=4):
    rng = np.random.default_rng(seed)
    landmarks = rng.uniform(-0.05, 1.05, (B, L, 2)).astype(np.float32)
    meanface = rng.uniform(0, 1, (L, 2)).astype(np.float32)
    nb_idx = pt.forward_neighbors(meanface, nb)
    return landmarks, meanface, nb_idx


def test_gen_targets_matches_reference(ref_data_utils):
    """Vectorized device label gen == gen_target_pip's per-sample loops
    (data_utils.py:87-111), including out-of-range clipping."""
    B, L, nb, g = 3, 7, 3, 4
    landmarks, _mf, nb_idx = _rand_case(0, B, L, nb, g)
    got = [np.asarray(a) for a in
           pt.gen_targets(jnp.asarray(landmarks), jnp.asarray(nb_idx), g)]
    mf_indices = [list(row) for row in nb_idx]
    for b in range(B):
        zeros = lambda c: np.zeros((c, g, g))
        ref = ref_data_utils.gen_target_pip(
            landmarks[b].flatten().copy(), mf_indices, zeros(L), zeros(L),
            zeros(L), zeros(L * nb), zeros(L * nb))
        names = ("map", "x", "y", "nb_x", "nb_y")
        for name, r, o in zip(names, ref, got):
            # ours is NHWC; reference is (C, H, W)
            np.testing.assert_allclose(o[b].transpose(2, 0, 1), r,
                                       atol=1e-6, err_msg=name)


def test_pip_loss_matches_reference(ref_functions):
    """pip_loss == compute_loss_pip (functions.py:77-108) with the
    reference's criterion defaults (MSE cls / L1 reg) and channel order."""
    B, L, nb, g = 2, 6, 3, 4
    rng = np.random.default_rng(1)
    landmarks, _mf, nb_idx = _rand_case(1, B, L, nb, g)
    targets = [np.asarray(a, np.float32) for a in
               pt.gen_targets(jnp.asarray(landmarks), jnp.asarray(nb_idx), g)]
    outputs = [rng.standard_normal((B, g, g, C)).astype(np.float32)
               for C in (L, L, L, L * nb, L * nb)]
    total, parts = pt.pip_loss([jnp.asarray(o) for o in outputs],
                               [jnp.asarray(t) for t in targets],
                               num_nb=nb, cls_w=10.0, reg_w=1.0)

    tt = [torch.tensor(np.ascontiguousarray(a.transpose(0, 3, 1, 2)))
          for a in outputs]
    tl = [torch.tensor(np.ascontiguousarray(a.transpose(0, 3, 1, 2)))
          for a in targets]
    ref = ref_functions.compute_loss_pip(
        tt[0], tt[1], tt[2], tt[3], tt[4], tl[0], tl[1], tl[2], tl[3],
        tl[4], torch.nn.MSELoss(), torch.nn.L1Loss(), nb)
    ref_total = 10.0 * ref[0] + ref[1] + ref[2] + ref[3] + ref[4]
    np.testing.assert_allclose(float(total), float(ref_total), rtol=1e-5)
    np.testing.assert_allclose(float(parts["map"]), float(ref[0]), rtol=1e-5)
    np.testing.assert_allclose(float(parts["nb_x"]), float(ref[3]), rtol=1e-5)


class _ReplayAdapter:
    """Route the reference's global `random` draws through an np Generator
    so its aug chain can be replayed draw-for-draw against ours."""

    def __init__(self, seed):
        self.g = np.random.default_rng(seed)

    def random(self):
        return float(self.g.random())

    def uniform(self, a, b):
        return float(self.g.uniform(a, b))


def test_augment_replays_reference_chain(ref_data_utils, monkeypatch):
    """augment() == the reference chain translate->occlusion->flip->rotate
    ->blur (data_utils.py:116-136) under identical draws, pixels and
    targets both."""
    from PIL import Image
    L = 8
    size = 64
    flip_perm = np.arange(L)[::-1].copy()
    base = np.random.default_rng(3).integers(0, 256, (size, size, 3),
                                             np.uint8)
    target0 = np.random.default_rng(4).uniform(0.1, 0.9, 2 * L
                                               ).astype(np.float32)
    hits = 0
    for seed in range(12):
        adapter = _ReplayAdapter(seed)
        monkeypatch.setattr(_py_random, "random", adapter.random)
        monkeypatch.setattr(_py_random, "uniform", adapter.uniform)
        img, tgt = Image.fromarray(base.copy()), target0.copy()
        img, tgt = ref_data_utils.random_translate(img, tgt)
        img = ref_data_utils.random_occlusion(img)
        img, tgt = ref_data_utils.random_flip(img, tgt, list(flip_perm))
        img, tgt = ref_data_utils.random_rotate(img, tgt, 30)
        img = ref_data_utils.random_blur(img)
        ref_arr = np.asarray(img, np.float32) / 255.0
        ref_arr = (ref_arr - pt.IMAGENET_MEAN) / pt.IMAGENET_STD

        mine = np.random.default_rng(seed)
        arr, tgt2 = pt.augment(Image.fromarray(base.copy()), target0.copy(),
                               mine, points_flip=flip_perm,
                               rotate_max_deg=30)
        # our chain draws one extra grayscale gate after blur (the reference
        # models grayscale with torchvision's own RNG — unreplayable); a
        # grayscaled output has equal RGB, so detect and skip those seeds
        grayscaled = np.allclose(
            arr[..., 0] * pt.IMAGENET_STD[0] + pt.IMAGENET_MEAN[0],
            arr[..., 1] * pt.IMAGENET_STD[1] + pt.IMAGENET_MEAN[1],
            atol=1e-5)
        if grayscaled:
            continue
        np.testing.assert_allclose(tgt2, tgt, atol=1e-6)
        np.testing.assert_allclose(arr, ref_arr, atol=1e-6)
        hits += 1
    assert hits >= 6, f"only {hits} comparable seeds — replay broken?"


def test_training_learns_synthetic_landmarks():
    """A tiny PIPNet must fit a synthetic landmark dataset: loss drops and
    decoded NME improves (the trainer actually trains)."""
    from celebbasis_tpu.align.pipnet import decode_landmarks, meanface_indices

    cfg = PIPNetConfig.tiny()            # 12 lms, nb 3, 64² input, stride 32
    tcfg = pt.PIPTrainConfig(
        num_lms=cfg.num_lms, num_nb=cfg.num_nb, input_size=cfg.input_size,
        net_stride=cfg.net_stride, batch_size=4, init_lr=3e-3,
        num_epochs=6, decay_steps=(4,), pretrained=True)
    rng = np.random.default_rng(0)
    meanface = rng.uniform(0.2, 0.8, (cfg.num_lms, 2)).astype(np.float32)
    N = 8
    lms = np.clip(meanface[None] + rng.normal(0, 0.08, (N, cfg.num_lms, 2)),
                  0.05, 0.95).astype(np.float32)
    imgs = np.zeros((N, cfg.input_size, cfg.input_size, 3), np.float32)
    for i in range(N):                   # bright dots at the landmarks
        px = (lms[i] * (cfg.input_size - 1)).astype(int)
        imgs[i, px[:, 1], px[:, 0]] = 1.0

    model = PIPNet(cfg)
    params = jax.jit(model.init)(jax.random.key(0), jnp.asarray(imgs[:1]))

    def batches_fn(epoch):
        order = np.random.default_rng(epoch).permutation(N)
        for s in range(0, N, tcfg.batch_size):
            sel = order[s:s + tcfg.batch_size]
            yield imgs[sel], lms[sel]

    ri1, ri2, _ = meanface_indices(meanface, cfg.num_nb)
    nb_idx = pt.forward_neighbors(meanface, cfg.num_nb)

    def nme(p):
        out = model.apply(p, jnp.asarray(imgs))
        dec = np.asarray(decode_landmarks(out, cfg, jnp.asarray(ri1),
                                          jnp.asarray(ri2)))
        return float(np.linalg.norm(dec - lms, axis=-1).mean())

    nme0 = nme(params)
    res = pt.fit_pipnet(model, params, batches_fn, tcfg, meanface,
                        steps_per_epoch=N // tcfg.batch_size, verbose=False)
    assert res["history"][-1] < 0.5 * res["history"][0], res["history"]
    assert nme(res["params"]) < nme0
    # device label gen sanity on this real case too
    tmaps = pt.gen_targets(jnp.asarray(lms[:2]), jnp.asarray(nb_idx),
                           tcfg.grid)
    assert np.asarray(tmaps[0]).sum() == 2 * cfg.num_lms   # one cell per lm


def test_checkpoint_roundtrips_via_torch(tmp_path):
    """Saved epoch%d.pth must load in real torch (weights_only)."""
    cfg = PIPNetConfig.tiny()
    model = PIPNet(cfg)
    params = jax.jit(model.init)(
        jax.random.key(1), jnp.zeros((1, cfg.input_size, cfg.input_size, 3)))
    path = pt._save_checkpoint(params, str(tmp_path), epoch=5)
    assert os.path.basename(path) == "epoch5.pth"
    loaded = torch.load(path, weights_only=True)
    key = next(iter(loaded))
    flat = {jax.tree_util.keystr(p): np.asarray(v) for p, v in
            jax.tree_util.tree_flatten_with_path(params)[0]}
    np.testing.assert_allclose(loaded[key].numpy(), flat[key])
    assert len(loaded) == len(flat)


def test_cli_end_to_end(tmp_path):
    """cli/train_pipnet on a synthetic reference-layout data dir: trains,
    saves torch-readable epoch checkpoints."""
    from PIL import Image

    from celebbasis_tpu.cli import train_pipnet as cli

    L, size = 6, 64
    rng = np.random.default_rng(7)
    data = tmp_path / "data"
    (data / "images_train").mkdir(parents=True)
    meanface = rng.uniform(0.2, 0.8, (L, 2))
    (data / "meanface.txt").write_text(
        " ".join(f"{v:.6f}" for v in meanface.flatten()) + "\n")
    lines = []
    for i in range(8):
        arr = rng.integers(0, 256, (size, size, 3), np.uint8)
        Image.fromarray(arr).save(data / "images_train" / f"im{i}.jpg")
        tgt = rng.uniform(0.1, 0.9, 2 * L)
        lines.append(f"im{i}.jpg " + " ".join(f"{v:.6f}" for v in tgt))
    (data / "train.txt").write_text("\n".join(lines) + "\n")

    save = tmp_path / "snap"
    cli.main(["--data_dir", str(data), "--save_dir", str(save), "--tiny",
              "--num_nb", "2", "--input_size", str(size),
              "--batch_size", "4", "--epochs", "3", "--decay_steps", "2",
              "--save_interval", "3"])
    cks = sorted(os.listdir(save))
    assert cks == ["epoch2.pth"]
    loaded = torch.load(str(save / cks[0]), weights_only=True)
    assert len(loaded) > 0
