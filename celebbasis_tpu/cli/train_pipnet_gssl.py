"""GSSL (semi-supervised) PIPNet training CLI — the reference's
``python lib/train_gssl.py experiments/data_300W_CELEBA/...``
(`/root/reference/evaluation/face_align/PIPNet/lib/train_gssl.py:1-297`).

Reads the curriculum layout written by ``cli/preprocess_pipnet``
(data_300W_CELEBA / data_300W_COFW_WFLW):

    <data_dir>/train_300W.txt            labeled rows (68-pt, normalized)
    <data_dir>/train_CELEBA.txt          unlabeled names   (CELEBA task)
    <data_dir>/train_COFW.txt + train_WFLW.txt  (COFW_WFLW task)
    <data_dir>/images_train/             all crops
    <data_dir>/meanface.txt
    <data_dir>/images_test_{300W,COFW,WFLW}/ + test_*.txt   (--eval)

and runs `align/pipnet_gssl.py`'s jitted curriculum (cls3 -> cls2 -> std x3,
or std x3 with --no_curriculum, train_gssl.py:98-103) with the reference's
per-epoch augmentations re-drawn for every row (data_utils_gssl.py:194-209).
``--eval`` reports inter-ocular NME on the three test splits with
neighbor-merged predictions like the reference's post-training loop
(train_gssl.py:165-197).

Usage:
    python -m celebbasis_tpu.cli.preprocess_pipnet data_300W_CELEBA --root data
    python -m celebbasis_tpu.cli.train_pipnet_gssl \
        --data_dir data/data_300W_CELEBA --save_dir snapshots/gssl --eval
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from celebbasis_tpu.align import pipnet_gssl as pg
from celebbasis_tpu.align import pipnet_train as pt
from celebbasis_tpu.align.metrics import compute_nme
from celebbasis_tpu.align.pipnet import (IMAGENET_MEAN, IMAGENET_STD,
                                         PIPNetConfig, meanface_indices)
from celebbasis_tpu.cli.train_pipnet import load_labels, load_meanface

NORM_INDICES = (36, 45)        # inter-ocular, train_gssl.py:166


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_dir", type=str, required=True,
                   help="data/data_300W_CELEBA or data/data_300W_COFW_WFLW")
    p.add_argument("--save_dir", type=str, default="snapshots/pipnet_gssl")
    p.add_argument("--num_nb", type=int, default=10)
    p.add_argument("--input_size", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--init_lr", type=float, default=1e-4)
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--decay_steps", type=int, nargs="+", default=[30, 50])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no_curriculum", action="store_true",
                   help="standard self-training, task list ['std']*3 "
                        "(train_gssl.py:98-103)")
    p.add_argument("--no_augment", action="store_true",
                   help="skip the per-epoch reference augmentations")
    p.add_argument("--eval", action="store_true",
                   help="NME on the 300W/COFW/WFLW test splits after "
                        "training (train_gssl.py:165-197)")
    p.add_argument("--tiny", action="store_true",
                   help="toy backbone for smoke runs/tests")
    p.add_argument("--max_unlabeled", type=int, default=None,
                   help="cap the unlabeled pool (tests/smoke)")
    return p


def _load_images(img_dir: str, names, input_size: int) -> np.ndarray:
    """uint8 RGB crops resized to the net input (train_gssl.py:219-222:
    cv2.resize then PIL RGB)."""
    from PIL import Image
    out = []
    for name in names:
        img = Image.open(os.path.join(img_dir, name)).convert("RGB")
        if img.size != (input_size, input_size):
            img = img.resize((input_size, input_size), Image.BILINEAR)
        out.append(np.asarray(img, np.uint8))
    return np.stack(out)


def _normalize(u8: np.ndarray) -> np.ndarray:
    return ((u8.astype(np.float32) / 255.0 - IMAGENET_MEAN)
            / IMAGENET_STD).astype(np.float32)


def main(argv=None):
    from PIL import Image

    args = build_argparser().parse_args(argv)
    ddir = args.data_dir
    img_dir = os.path.join(ddir, "images_train")

    meanface = load_meanface(os.path.join(ddir, "meanface.txt"))
    L = meanface.shape[0]
    labeled_rows = load_labels(os.path.join(ddir, "train_300W.txt"))
    assert all(len(t) == 2 * L for _, t in labeled_rows)

    # unlabeled pool: name-only lists (train_gssl.py:205-216's est_data_list)
    if os.path.exists(os.path.join(ddir, "train_CELEBA.txt")):
        unl_lists = ["train_CELEBA.txt"]
    else:
        unl_lists = ["train_COFW.txt", "train_WFLW.txt"]
    unl_names = []
    for name in unl_lists:
        with open(os.path.join(ddir, name)) as f:
            unl_names += [x.strip() for x in f if x.strip()]
    if args.max_unlabeled is not None:
        unl_names = unl_names[:args.max_unlabeled]

    print(f"[train_pipnet_gssl] {len(labeled_rows)} labeled / "
          f"{len(unl_names)} unlabeled rows from {ddir}")
    imgs_l_u8 = _load_images(img_dir, [n for n, _ in labeled_rows],
                             args.input_size)
    lms_l = np.stack([t.reshape(L, 2) for _, t in labeled_rows])
    imgs_u_u8 = (_load_images(img_dir, unl_names, args.input_size)
                 if unl_names else
                 np.zeros((0, args.input_size, args.input_size, 3),
                          np.uint8))

    if args.tiny:
        net_cfg = PIPNetConfig(num_lms=L, num_nb=args.num_nb,
                               input_size=args.input_size, net_stride=32,
                               layers=(1, 1, 1, 1), width=8)
    else:
        # the reference GSSL stack is resnet18 / stride 32 only
        # (train_gssl.py:107-116, networks_gssl.py:58-76)
        net_cfg = PIPNetConfig.resnet18(num_lms=L, num_nb=args.num_nb,
                                        input_size=args.input_size,
                                        net_stride=32)
    tcfg = pt.PIPTrainConfig(
        num_lms=L, num_nb=args.num_nb, input_size=args.input_size,
        net_stride=32, batch_size=args.batch_size, init_lr=args.init_lr,
        num_epochs=args.epochs, decay_steps=tuple(args.decay_steps))

    all_u8 = np.concatenate([imgs_l_u8, imgs_u_u8])
    points_flip = (np.asarray(pt.POINTS_FLIP_68, np.int32) if L == 68
                   else None)

    def augment_fn(rnd, epoch, lms):
        """Re-draw the reference chain for every row this epoch; rows are
        [labeled; unlabeled] per gssl_self_train's contract."""
        n = len(lms)
        rng = np.random.default_rng(
            args.seed * 1_000_003 + rnd * 1009 + epoch)
        ims, tgts = [], []
        for i in range(n):
            img = Image.fromarray(all_u8[i])
            arr, tgt = pt.augment(img, lms[i].flatten(), rng,
                                  points_flip=points_flip)
            ims.append(arr)
            tgts.append(np.clip(tgt.reshape(L, 2), 0.0, 1.0))
        return np.stack(ims).astype(np.float32), np.stack(tgts)

    result = pg.gssl_self_train(
        net_cfg, tcfg, meanface,
        (_normalize(imgs_l_u8), lms_l.astype(np.float32)),
        _normalize(imgs_u_u8),
        task_list=(("std",) * 3 if args.no_curriculum
                   else ("cls3", "cls2", "std", "std", "std")),
        augment_fn=None if args.no_augment else augment_fn,
        seed=args.seed)
    params = result["params"]
    path = pt._save_checkpoint(params, args.save_dir,
                               epoch=args.epochs - 1)
    print(f"[train_pipnet_gssl] saved {path}")

    if args.eval:
        model = pg.PIPNetGSSL(net_cfg)
        ri1, ri2, _ = meanface_indices(meanface, args.num_nb)
        ri1, ri2 = jnp.asarray(ri1), jnp.asarray(ri2)
        decode = jax.jit(lambda p, x: pg.gssl_decode(
            model.apply(p, x), net_cfg, ri1, ri2))
        for split in ("300W", "COFW", "WFLW"):
            rows = load_labels(os.path.join(ddir, f"test_{split}.txt"))
            u8 = _load_images(os.path.join(ddir, f"images_test_{split}"),
                              [n for n, _ in rows], args.input_size)
            x = _normalize(u8)
            bs = args.batch_size
            preds = []
            for i in range(0, len(x), bs):
                chunk = x[i:i + bs]
                k = len(chunk)
                if k < bs:
                    chunk = np.concatenate(
                        [chunk, np.repeat(chunk[-1:], bs - k, axis=0)])
                preds.append(np.asarray(decode(params,
                                               jnp.asarray(chunk)))[:k])
            preds = np.concatenate(preds)
            nmes = []
            for p, (_, t) in zip(preds, rows):
                gt = t.reshape(-1, 2)
                norm = np.linalg.norm(gt[NORM_INDICES[0]]
                                      - gt[NORM_INDICES[1]])
                nmes.append(compute_nme(p, gt, norm))
            print(f"[train_pipnet_gssl] {split} nme: {np.mean(nmes):.6f}")


if __name__ == "__main__":
    main()
