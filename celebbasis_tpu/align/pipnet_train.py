"""PIPNet landmark trainer — TPU-native equivalent of the reference's
vendored training stack (`/root/reference/evaluation/face_align/PIPNet/lib/
train.py`, `functions.py:77-156`, `data_utils.py:10-163`).

This closes SURVEY §2.4's last row: the reference ships upstream PIPNet's
trainer (it produced the WFLW `epoch59.pth` checkpoint the W0 alignment
consumes).  Same capability, the TPU way:

- **Label generation on device** (`gen_targets`): the reference builds the
  five target maps with per-sample, per-landmark Python loops on the host
  (data_utils.py:87-111); here it is a vectorized one-hot construction over
  the whole batch inside the jitted train step — the data loader only ships
  images + (L,2) landmark coords.
- **Exact loss semantics** (`pip_loss` = functions.py:77-108): MSE over the
  full cls heatmap + L1 on the x/y/neighbor offsets gathered at the *label*
  argmax cell, channel layout ``l*num_nb + j`` matching `align/pipnet.py`'s
  heads and the torch bridge.
- **One jitted update** (`make_train_step`): loss + grads + Adam in a single
  device program; MultiStepLR(30, 50, gamma 0.1) via optax schedule
  (train.py:179 — Adam lr 1e-4, weight_decay 5e-4 when from-scratch).
- **Seedable host augmentations** (`augment`): the reference's PIL transform
  math (translate/occlusion/flip/rotate/blur + RandomGrayscale(0.2) +
  ImageNet normalize) driven by an explicit np.random.Generator instead of
  the global `random` state.

Checkpoints are saved with `utils/pt_io.save_pt` (torch-readable without
torch in package code, the reference's `epoch%d.pth` naming).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from celebbasis_tpu.align.pipnet import (IMAGENET_MEAN, IMAGENET_STD, PIPNet,
                                         PIPNetConfig)

# WFLW left/right symmetry permutation (public dataset metadata; the
# reference hardcodes it in train.py:155 for random_flip)
WFLW_POINTS_FLIP = (
    32, 31, 30, 29, 28, 27, 26, 25, 24, 23, 22, 21, 20, 19, 18, 17, 16, 15,
    14, 13, 12, 11, 10, 9, 8, 7, 6, 5, 4, 3, 2, 1, 0, 46, 45, 44, 43, 42,
    50, 49, 48, 47, 37, 36, 35, 34, 33, 41, 40, 39, 38, 51, 52, 53, 54, 59,
    58, 57, 56, 55, 72, 71, 70, 69, 68, 75, 74, 73, 64, 63, 62, 61, 60, 67,
    66, 65, 82, 81, 80, 79, 78, 77, 76, 87, 86, 85, 84, 83, 92, 91, 90, 89,
    88, 95, 94, 93, 97, 96)

# 300W/68-point symmetry permutation (train_gssl.py:140-142, 1-based there)
POINTS_FLIP_68 = (
    16, 15, 14, 13, 12, 11, 10, 9, 8, 7, 6, 5, 4, 3, 2, 1, 0, 26, 25, 24,
    23, 22, 21, 20, 19, 18, 17, 27, 28, 29, 30, 35, 34, 33, 32, 31, 45, 44,
    43, 42, 47, 46, 39, 38, 37, 36, 41, 40, 54, 53, 52, 51, 50, 49, 48, 59,
    58, 57, 56, 55, 64, 63, 62, 61, 60, 67, 66, 65)

@dataclass(frozen=True)
class PIPTrainConfig:
    """The reference's `Config` (lib/tools.py:19-38) training fields."""
    num_lms: int = 98
    num_nb: int = 10
    input_size: int = 256
    net_stride: int = 32
    batch_size: int = 16
    init_lr: float = 1e-4
    num_epochs: int = 60
    decay_steps: Tuple[int, ...] = (30, 50)
    decay_gamma: float = 0.1
    cls_loss_weight: float = 10.0
    reg_loss_weight: float = 1.0
    pretrained: bool = True          # False adds Adam weight_decay 5e-4
    rotate_max_deg: float = 30.0

    @property
    def grid(self) -> int:
        return self.input_size // self.net_stride


def forward_neighbors(meanface: np.ndarray, num_nb: int) -> np.ndarray:
    """(L,2) meanface -> (L, num_nb) nearest-neighbor landmark indices
    (functions.py:37-43: each landmark also predicts its num_nb nearest
    meanface neighbors)."""
    dists = ((meanface[:, None] - meanface[None]) ** 2).sum(-1)
    return np.argsort(dists, axis=1)[:, 1:1 + num_nb].astype(np.int32)


# -- device-side label generation -----------------------------------------

def gen_targets(landmarks: jax.Array, nb_idx: jax.Array, grid: int):
    """(B, L, 2) normalized landmarks -> the five PIP target maps, NHWC.

    Vectorized re-derivation of gen_target_pip (data_utils.py:87-111): the
    cls map is 1 at landmark l's floor cell (clipped to the grid); local
    x/y hold the sub-cell shift at that cell; neighbor maps hold, at the
    same cell, the offsets to l's num_nb meanface neighbors (channel
    ``l*num_nb + j``).  Jittable — runs inside the train step.
    """
    B, L, _ = landmarks.shape
    g = grid
    num_nb = nb_idx.shape[1]
    f = landmarks.astype(jnp.float32) * g
    mu = jnp.clip(jnp.floor(f), 0, g - 1)                       # (B, L, 2)
    mux, muy = mu[..., 0], mu[..., 1]
    cell = (jax.nn.one_hot(muy.astype(jnp.int32), g)[:, :, :, None]
            * jax.nn.one_hot(mux.astype(jnp.int32), g)[:, :, None, :])
    maps = cell.transpose(0, 2, 3, 1)                           # (B, g, g, L)
    shift = f - mu                                              # (B, L, 2)
    tx = maps * shift[..., 0][:, None, None, :]
    ty = maps * shift[..., 1][:, None, None, :]
    nbf = f[:, nb_idx]                                          # (B, L, nb, 2)
    nsx = nbf[..., 0] - mux[..., None]                          # (B, L, nb)
    nsy = nbf[..., 1] - muy[..., None]
    tnx = (maps[..., None] * nsx[:, None, None]).reshape(B, g, g, L * num_nb)
    tny = (maps[..., None] * nsy[:, None, None]).reshape(B, g, g, L * num_nb)
    return maps, tx, ty, tnx, tny


def pip_loss(outputs, targets, num_nb: int, cls_w: float = 10.0,
             reg_w: float = 1.0):
    """compute_loss_pip (functions.py:77-108), NHWC heads.

    cls: MSE over the full map (the reference's criterion_cls='l2'
    default); x/y/nb: L1 on values gathered at the *label* map's argmax
    cell per (batch, landmark) — criterion_reg='l1'.  Returns
    (total, parts dict).
    """
    ocls, ox, oy, onbx, onby = outputs
    tcls, tx, ty, tnbx, tnby = targets
    B, g, _, L = ocls.shape

    def rows(a, C):     # (B, g, g, C) -> (B*C, g*g), torch channel order
        return a.transpose(0, 3, 1, 2).reshape(B * C, g * g)

    ids = jnp.argmax(rows(tcls, L), axis=1)                    # (B*L,)
    ids_nb = jnp.repeat(ids, num_nb)                           # (B*L*nb,)

    def sel(a, C, idx):
        return jnp.take_along_axis(rows(a, C), idx[:, None], axis=1)[:, 0]

    loss_map = jnp.mean((ocls.astype(jnp.float32) - tcls) ** 2)
    l1 = lambda a, b: jnp.mean(jnp.abs(a.astype(jnp.float32) - b))
    loss_x = l1(sel(ox, L, ids), sel(tx, L, ids))
    loss_y = l1(sel(oy, L, ids), sel(ty, L, ids))
    loss_nb_x = l1(sel(onbx, L * num_nb, ids_nb), sel(tnbx, L * num_nb, ids_nb))
    loss_nb_y = l1(sel(onby, L * num_nb, ids_nb), sel(tnby, L * num_nb, ids_nb))
    total = (cls_w * loss_map
             + reg_w * (loss_x + loss_y + loss_nb_x + loss_nb_y))
    return total, {"map": loss_map, "x": loss_x, "y": loss_y,
                   "nb_x": loss_nb_x, "nb_y": loss_nb_y}


# -- host-side augmentations (seedable reference math) ---------------------

def augment(img, target: np.ndarray, rng: np.random.Generator,
            points_flip: Optional[np.ndarray] = None,
            rotate_max_deg: float = 30.0):
    """PIL image + (2L,) normalized target -> augmented pair.

    The reference's per-sample chain (data_utils.py:116-136:
    translate -> occlusion -> flip -> rotate -> blur, each p=0.5 except
    blur p=0.3), with an explicit generator.  Square inputs assumed (the
    reference reads `image.size` as (h, w) — only valid when square).
    """
    from PIL import Image, ImageFilter
    size = img.size[0]
    target = np.asarray(target, np.float32).copy()
    # random_translate (data_utils.py:10-30)
    if rng.random() > 0.5:
        c = int((rng.random() - 0.5) * 60)
        f = int((rng.random() - 0.5) * 60)
        img = img.transform(img.size, Image.AFFINE, (1, 0, c, 0, 1, f))
        t = target.reshape(-1, 2)
        t[:, 0] -= c / size
        t[:, 1] -= f / size
        target = np.clip(t.flatten(), 0, 1)
    # random_occlusion (:37-52) — the reference works in BGR there, so its
    # three color draws land on channels B, G, R in that order
    if rng.random() > 0.5:
        a = np.array(img, np.uint8)
        oh = int(size * 0.4 * rng.random())
        ow = int(size * 0.4 * rng.random())
        ox = int((size - ow - 10) * rng.random())
        oy = int((size - oh - 10) * rng.random())
        for ch in (2, 1, 0):
            a[oy:oy + oh, ox:ox + ow, ch] = int(rng.random() * 255)
        img = Image.fromarray(a)
    # random_flip (:55-63)
    if points_flip is not None and rng.random() > 0.5:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
        t = target.reshape(-1, 2)[np.asarray(points_flip)]
        t[:, 0] = 1 - t[:, 0]
        target = t.flatten()
    # random_rotate (:65-84)
    if rng.random() > 0.5:
        theta = rng.uniform(-np.radians(rotate_max_deg),
                            np.radians(rotate_max_deg))
        img = img.rotate(np.degrees(theta))
        ctr = np.tile([0.5, 0.5], len(target) // 2)
        c, s = np.cos(theta), np.sin(theta)
        rot = np.array(((c, -s), (s, c)), np.float32)
        target = ((target - ctr).reshape(-1, 2) @ rot).flatten() + ctr
    # random_blur (:32-35)
    if rng.random() > 0.7:
        img = img.filter(ImageFilter.GaussianBlur(rng.random() * 5))
    # RandomGrayscale(0.2) + ImageNet normalize (train.py:187-189)
    if rng.random() < 0.2:
        img = img.convert("L").convert("RGB")
    arr = np.asarray(img, np.float32) / 255.0
    arr = (arr - IMAGENET_MEAN) / IMAGENET_STD
    return arr, target


# -- jitted training -------------------------------------------------------

def make_optimizer(cfg: PIPTrainConfig, steps_per_epoch: int):
    import optax
    sched = optax.piecewise_constant_schedule(
        cfg.init_lr,
        {e * steps_per_epoch: cfg.decay_gamma for e in cfg.decay_steps})
    if cfg.pretrained:
        return optax.adam(sched)
    return optax.chain(optax.add_decayed_weights(5e-4), optax.adam(sched))


def make_train_step(model: PIPNet, optimizer, nb_idx: np.ndarray,
                    cfg: PIPTrainConfig):
    """Returns jit(step)(params, opt_state, images, landmarks)
    -> (params, opt_state, total_loss, parts)."""
    nb = jnp.asarray(nb_idx)

    def loss_fn(params, images, landmarks):
        outputs = model.apply(params, images)
        targets = gen_targets(landmarks, nb, cfg.grid)
        return pip_loss(outputs, targets, cfg.num_nb,
                        cfg.cls_loss_weight, cfg.reg_loss_weight)

    def step(params, opt_state, images, landmarks):
        (total, parts), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, images, landmarks)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, total, parts

    return jax.jit(step, donate_argnums=(0, 1))


def fit_pipnet(model: PIPNet, params, batches_fn, cfg: PIPTrainConfig,
               meanface: np.ndarray, steps_per_epoch: int,
               save_dir: Optional[str] = None,
               save_interval: Optional[int] = None,
               verbose: bool = True) -> Dict:
    """Train loop (functions.py:110-156): ``batches_fn(epoch)`` yields
    ``(images (B,s,s,3) normalized NHWC float32, landmarks (B,L,2))``.
    Saves ``epoch%d.pth`` state dicts via pt_io at the reference's cadence
    (save_interval defaults to num_epochs; train.py saves at
    ``epoch % (save_interval-1) == 0 and epoch > 0``)."""
    import optax  # noqa: F401 — make_optimizer dependency, fail early

    nb_idx = forward_neighbors(meanface, cfg.num_nb)
    optimizer = make_optimizer(cfg, steps_per_epoch)
    opt_state = optimizer.init(params)
    step = make_train_step(model, optimizer, nb_idx, cfg)
    save_interval = save_interval or cfg.num_epochs
    history = []
    for epoch in range(cfg.num_epochs):
        epoch_loss, n = 0.0, 0
        for images, landmarks in batches_fn(epoch):
            params, opt_state, total, _parts = step(
                params, opt_state, jnp.asarray(images),
                jnp.asarray(landmarks))
            epoch_loss += float(total)
            n += 1
        epoch_loss /= max(n, 1)
        history.append(epoch_loss)
        if verbose:
            print(f"[pipnet-train] epoch {epoch}/{cfg.num_epochs - 1} "
                  f"loss {epoch_loss:.6f}")
        if (save_dir is not None and epoch > 0
                and epoch % (save_interval - 1) == 0):
            _save_checkpoint(params, save_dir, epoch)
    return {"params": params, "history": history}


def _save_checkpoint(params, save_dir: str, epoch: int) -> str:
    import os

    from celebbasis_tpu.utils.pt_io import save_pt
    os.makedirs(save_dir, exist_ok=True)
    flat = {jax.tree_util.keystr(path): np.asarray(v)
            for path, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    path = os.path.join(save_dir, f"epoch{epoch}.pth")
    save_pt(flat, path)
    return path
