"""PIPNet landmark-model training CLI — the reference's
``python lib/train.py experiments/WFLW/pip_32_16_60_r101_l2_l1_10_1_nb10.py``
(`/root/reference/evaluation/face_align/PIPNet/lib/train.py`).

Reads the reference's data layout:

    <data_dir>/images_train/        training crops
    <data_dir>/train.txt            "<image> x1 y1 x2 y2 ..." (normalized)
    <data_dir>/meanface.txt         one line of 2L floats

and trains `align/pipnet.py`'s NHWC PIPNet with the jitted step in
`align/pipnet_train.py` (device-side label generation, reference loss
semantics, seedable reference augmentations).  Checkpoints land in
``<save_dir>/epoch<N>.pth`` (torch-readable via pt_io).

Usage:
    python -m celebbasis_tpu.cli.train_pipnet --data_dir data/WFLW \
        --save_dir snapshots/WFLW
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from celebbasis_tpu.align import pipnet_train as pt
from celebbasis_tpu.align.pipnet import PIPNet, PIPNetConfig


def load_labels(path: str):
    """train.txt -> [(image_name, (2L,) float array)] (functions.py:12-29)."""
    out = []
    with open(path) as f:
        for line in f:
            parts = line.strip().split()
            if not parts:
                continue
            out.append((parts[0],
                        np.asarray([float(x) for x in parts[1:]],
                                   np.float32)))
    return out


def load_meanface(path: str) -> np.ndarray:
    with open(path) as f:
        vals = [float(v) for v in f.readlines()[0].strip().split()]
    return np.asarray(vals, np.float32).reshape(-1, 2)


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_dir", type=str, required=True)
    p.add_argument("--save_dir", type=str, default="snapshots/pipnet")
    p.add_argument("--num_nb", type=int, default=10)
    p.add_argument("--input_size", type=int, default=256)
    p.add_argument("--net_stride", type=int, default=32)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--init_lr", type=float, default=1e-4)
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--decay_steps", type=int, nargs="+", default=[30, 50])
    p.add_argument("--save_interval", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--from_scratch", action="store_true",
                   help="adds Adam weight_decay 5e-4 (train.py:176-179)")
    p.add_argument("--tiny", action="store_true",
                   help="toy backbone for smoke runs/tests")
    p.add_argument("--backbone", type=str, default="resnet101",
                   choices=["resnet101", "resnet50", "resnet18", "mbnetv2",
                            "mbnetv3"],
                   help="the reference's five Pip_* wrappers "
                        "(lib/networks.py)")
    return p


def main(argv=None):
    from PIL import Image

    args = build_argparser().parse_args(argv)
    labels = load_labels(os.path.join(args.data_dir, "train.txt"))
    meanface = load_meanface(os.path.join(args.data_dir, "meanface.txt"))
    L = meanface.shape[0]
    assert all(len(t) == 2 * L for _, t in labels), \
        "label width must match meanface landmark count"

    if args.tiny:
        net_cfg = PIPNetConfig(num_lms=L, num_nb=args.num_nb,
                               input_size=args.input_size,
                               net_stride=args.net_stride,
                               layers=(1, 1, 1, 1), width=8)
    else:
        preset = getattr(PIPNetConfig, args.backbone)
        net_cfg = preset(num_lms=L, num_nb=args.num_nb,
                         input_size=args.input_size,
                         net_stride=args.net_stride)
    tcfg = pt.PIPTrainConfig(
        num_lms=L, num_nb=args.num_nb, input_size=args.input_size,
        net_stride=args.net_stride, batch_size=args.batch_size,
        init_lr=args.init_lr, num_epochs=args.epochs,
        decay_steps=tuple(args.decay_steps),
        pretrained=not args.from_scratch)
    points_flip = (np.asarray(pt.WFLW_POINTS_FLIP, np.int32)
                   if L == 98 else None)
    img_dir = os.path.join(args.data_dir, "images_train")

    def batches_fn(epoch):
        rng = np.random.default_rng(args.seed * 100_003 + epoch)
        order = rng.permutation(len(labels))
        B = args.batch_size
        for s in range(0, len(order) - B + 1, B):     # drop_last like ref
            ims, tgts = [], []
            for i in order[s:s + B]:
                name, target = labels[i]
                img = Image.open(os.path.join(img_dir, name)).convert("RGB")
                if img.size != (args.input_size, args.input_size):
                    img = img.resize((args.input_size, args.input_size),
                                     Image.BILINEAR)
                arr, tgt = pt.augment(img, target, rng,
                                      points_flip=points_flip)
                ims.append(arr)
                tgts.append(np.clip(tgt.reshape(L, 2), 0.0, 1.0))
            yield np.stack(ims), np.stack(tgts)

    model = PIPNet(net_cfg)
    params = jax.jit(model.init)(
        jax.random.key(args.seed),
        jnp.zeros((1, args.input_size, args.input_size, 3)))
    steps_per_epoch = max(len(labels) // args.batch_size, 1)
    pt.fit_pipnet(model, params, batches_fn, tcfg, meanface,
                  steps_per_epoch=steps_per_epoch, save_dir=args.save_dir,
                  save_interval=args.save_interval)
    print(f"[train_pipnet] done; checkpoints in {args.save_dir}")


if __name__ == "__main__":
    main()
