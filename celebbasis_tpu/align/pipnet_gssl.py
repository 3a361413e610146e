"""GSSL PIPNet — curriculum self-training for landmark detection.

TPU-native rebuild of the reference's semi-supervised PIPNet stack
(`/root/reference/evaluation/face_align/PIPNet/lib/networks_gssl.py`,
`functions_gssl.py`, `data_utils_gssl.py`, `train_gssl.py`): a PIPNet whose
*shared* cls head is applied at three feature resolutions (full, /2, /4),
trained on a mix of fully-labeled rows and unlabeled rows that carry only a
pseudo cls target at one resolution, with per-sample masks choosing which
branches learn.  The curriculum loop re-estimates pseudo-labels with the
current net and retrains from scratch each round
(train_gssl.py:201-268: task types cls3 -> cls2 -> std -> std -> std).

The TPU way: task types are an ``(B,)`` int array; targets AND masks are
built vectorized inside the jitted step (the reference loops per landmark on
host, data_utils_gssl.py:87-131 + per-task mask blocks :225-256), so every
batch is one fixed-shape device program regardless of its task mix.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from celebbasis_tpu.align.pipnet import (PIPNetConfig, apply_backbone,
                                         decode_landmarks)
from celebbasis_tpu.align.pipnet_train import (PIPTrainConfig,
                                               forward_neighbors,
                                               gen_targets, make_optimizer)

# task-type codes (data_utils_gssl.py:225-256, order of its elif chain)
TASK_STD, TASK_CLS1, TASK_CLS2, TASK_CLS3 = 0, 1, 2, 3
TASK_IDS = {"std": TASK_STD, "cls1": TASK_CLS1,
            "cls2": TASK_CLS2, "cls3": TASK_CLS3}


class PIPNetGSSL(nn.Module):
    """Pip_resnet18 for GSSL (networks_gssl.py:13-77): the standard five
    heads plus the *same* cls conv re-applied after 2x2 max-pools —
    ``(cls1, cls2, cls3, x, y, nb_x, nb_y)``, NHWC.

    Param names match :class:`PIPNet` exactly, so
    ``utils.bridge_align.convert_pipnet`` round-trips GSSL checkpoints too
    (the torch module reuses ``cls_layer`` at all three scales, as here).

    Stride-32 only: the reference GSSL net has no extra-stride layers at all
    (networks_gssl.py:13-77 — no layer5/bn5, no deconv), so any other
    ``net_stride`` would add params a real GSSL checkpoint can't provide.
    """
    cfg: PIPNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        if cfg.net_stride != 32:
            raise ValueError(
                "PIPNetGSSL is stride-32 only (the reference GSSL stack, "
                f"networks_gssl.py:13-77, has no stride layers); got "
                f"net_stride={cfg.net_stride}")
        h = apply_backbone(cfg, self.dtype, x)
        conv = lambda f, name: nn.Conv(f, (1, 1), dtype=self.dtype,
                                       param_dtype=jnp.float32, name=name)
        cls = conv(cfg.num_lms, "cls")          # shared across scales
        cls1 = cls(h)
        ox = conv(cfg.num_lms, "x")(h)
        oy = conv(cfg.num_lms, "y")(h)
        onbx = conv(cfg.num_lms * cfg.num_nb, "nb_x")(h)
        onby = conv(cfg.num_lms * cfg.num_nb, "nb_y")(h)
        h2 = nn.max_pool(h, (2, 2), strides=(2, 2))
        cls2 = cls(h2)
        h3 = nn.max_pool(h2, (2, 2), strides=(2, 2))
        cls3 = cls(h3)
        return cls1, cls2, cls3, ox, oy, onbx, onby


def _cls_map(landmarks: jax.Array, g: int) -> jax.Array:
    """(B, L, 2) normalized landmarks -> (B, g, g, L) one-hot cell maps
    (gen_target_pip_cls{1,2,3}, data_utils_gssl.py:132-179)."""
    f = landmarks.astype(jnp.float32) * g
    mu = jnp.clip(jnp.floor(f), 0, g - 1).astype(jnp.int32)
    cell = (jax.nn.one_hot(mu[..., 1], g)[:, :, :, None]
            * jax.nn.one_hot(mu[..., 0], g)[:, :, None, :])
    return cell.transpose(0, 2, 3, 1)


def gen_targets_gssl(landmarks: jax.Array, nb_idx: jax.Array, grid: int,
                     task: jax.Array):
    """Targets + per-sample branch masks for a mixed-task batch.

    Matches ImageFolder_pip.__getitem__ (data_utils_gssl.py:196-256):
    every target is computed unconditionally (masked-off labels are
    multiplied by 0 in the loss, so their values never matter) and the
    masks encode the reference's per-task zeroing — note 'std' rows train
    only map1 + regression (mask_map2 = mask_map3 = 0 even when labeled).
    """
    maps1, tx, ty, tnx, tny = gen_targets(landmarks, nb_idx, grid)
    maps2 = _cls_map(landmarks, grid // 2)
    maps3 = _cls_map(landmarks, grid // 4)
    t = task.astype(jnp.int32)
    m1 = ((t == TASK_STD) | (t == TASK_CLS1)).astype(jnp.float32)
    m2 = (t == TASK_CLS2).astype(jnp.float32)
    m3 = (t == TASK_CLS3).astype(jnp.float32)
    mreg = (t == TASK_STD).astype(jnp.float32)
    return (maps1, maps2, maps3, tx, ty, tnx, tny), (m1, m2, m3, mreg)


def gssl_loss(outputs, targets, masks, num_nb: int, cls_w: float = 10.0,
              reg_w: float = 1.0):
    """compute_loss_pip (functions_gssl.py:74-138), NHWC heads.

    The reference uses sum-reduction criteria divided by the mask's count
    of ones (MSELoss(reduction='sum') over the concat of all three masked
    cls maps; L1Loss(reduction='sum') on offsets gathered at the *label*
    map1 argmax cell, masked per row) — train_gssl.py:124-138.  A fully
    masked-out branch contributes exactly 0, like the reference's
    ``if not masks.sum() == 0`` guard.
    """
    o1, o2, o3, ox, oy, onbx, onby = outputs
    t1, t2, t3, tx, ty, tnx, tny = targets
    m1, m2, m3, mreg = masks
    B, g, _, L = o1.shape
    f32 = jnp.float32

    def sq(o, t, m):
        d = (o.astype(f32) - t) * m[:, None, None, None]
        return (d * d).sum()

    num = sq(o1, t1, m1) + sq(o2, t2, m2) + sq(o3, t3, m3)
    den = (m1.sum() * (L * g * g) + m2.sum() * (L * (g // 2) ** 2)
           + m3.sum() * (L * (g // 4) ** 2))
    loss_map = num / jnp.maximum(den, 1.0)

    def rows(a, C):     # (B, g, g, C) -> (B*C, g*g), torch channel order
        return a.transpose(0, 3, 1, 2).reshape(B * C, g * g)

    ids = jnp.argmax(rows(t1, L), axis=1)
    ids_nb = jnp.repeat(ids, num_nb)

    def sel(a, C, idx):
        return jnp.take_along_axis(rows(a, C), idx[:, None], axis=1)[:, 0]

    mrow = jnp.repeat(mreg, L)                  # b-major, matches rows()
    mrow_nb = jnp.repeat(mreg, L * num_nb)

    def l1(o, t, m):
        return (jnp.abs(o.astype(f32) - t) * m).sum() / jnp.maximum(m.sum(),
                                                                    1.0)

    loss_x = l1(sel(ox, L, ids), sel(tx, L, ids), mrow)
    loss_y = l1(sel(oy, L, ids), sel(ty, L, ids), mrow)
    loss_nb_x = l1(sel(onbx, L * num_nb, ids_nb), sel(tnx, L * num_nb, ids_nb),
                   mrow_nb)
    loss_nb_y = l1(sel(onby, L * num_nb, ids_nb), sel(tny, L * num_nb, ids_nb),
                   mrow_nb)
    total = (cls_w * loss_map
             + reg_w * (loss_x + loss_y + loss_nb_x + loss_nb_y))
    return total, {"map": loss_map, "x": loss_x, "y": loss_y,
                   "nb_x": loss_nb_x, "nb_y": loss_nb_y}


def make_gssl_train_step(model: PIPNetGSSL, optimizer, nb_idx: np.ndarray,
                         cfg: PIPTrainConfig):
    """Returns jit(step)(params, opt_state, images, landmarks, task)
    -> (params, opt_state, total_loss, parts); ``task`` is (B,) int32."""
    nb = jnp.asarray(nb_idx)

    def loss_fn(params, images, landmarks, task):
        outputs = model.apply(params, images)
        targets, masks = gen_targets_gssl(landmarks, nb, cfg.grid, task)
        return gssl_loss(outputs, targets, masks, cfg.num_nb,
                         cfg.cls_loss_weight, cfg.reg_loss_weight)

    def step(params, opt_state, images, landmarks, task):
        (total, parts), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, images, landmarks, task)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, total, parts

    return jax.jit(step, donate_argnums=(0, 1))


def gssl_decode(outputs, cfg: PIPNetConfig, ri1, ri2) -> jax.Array:
    """GSSL head tuple -> (B, L, 2) merged landmarks (forward_pip +
    neighbor merge, functions_gssl.py:196-233 — cls1 drives the decode)."""
    c1, _c2, _c3, ox, oy, nbx, nby = outputs
    return decode_landmarks((c1, ox, oy, nbx, nby), cfg, ri1, ri2)


def _iter_batches(n: int, batch_size: int, rng: np.random.Generator):
    """Shuffled drop-last batch index iterator (the reference's DataLoader
    shuffle=True, drop_last=True — train_gssl.py:267)."""
    order = rng.permutation(n)
    for i in range(0, n - batch_size + 1, batch_size):
        yield order[i:i + batch_size]


def gssl_self_train(net_cfg: PIPNetConfig, train_cfg: PIPTrainConfig,
                    meanface: np.ndarray,
                    labeled: Tuple[np.ndarray, np.ndarray],
                    unlabeled_images: np.ndarray,
                    *, task_list: Sequence[str] = ("cls3", "cls2", "std",
                                                   "std", "std"),
                    init_rngs: Optional[Sequence] = None,
                    augment_fn=None,
                    seed: int = 0, verbose: bool = True) -> Dict:
    """The GSSL curriculum (train_gssl.py:98-268), array-level API.

    ``labeled`` = (images (N,s,s,3) normalized NHWC, landmarks (N,L,2));
    ``unlabeled_images`` = (M,s,s,3).  First, a fresh net trains
    ``num_epochs`` on the labeled 'std' rows alone (the reference's pre-loop
    ``train_model`` call, train_gssl.py:147-162), so the first pseudo-label
    estimate comes from a trained net, not random init.  Then per round
    ``ti``: (1) pseudo-label the unlabeled set with the *current* params
    (neighbor-merged decode), tagged with ``task_list[ti]``; (2)
    re-initialize a fresh net + optimizer (the reference rebuilds both each
    round, train_gssl.py:241-256); (3) train ``num_epochs`` on labeled
    'std' rows + the pseudo rows.  Returns {'params', 'init_history':
    supervised-warmup epoch losses, 'history': per-round epoch-loss lists}.

    ``augment_fn(round_idx, epoch_idx, lms) -> (images, lms)``: optional
    per-epoch augmentation hook (the reference's ImageFolder_pip re-draws
    translate/occlusion/flip/rotate/blur for EVERY row each epoch,
    data_utils_gssl.py:194-209).  Row order is the documented contract
    [labeled; unlabeled] (round_idx 0 = warmup, labeled only); ``lms``
    carries the current pseudo-labels so the hook transforms them with the
    images.  Pseudo-label *decode* always uses the clean ``unlabeled_images``
    (the reference estimates on un-augmented crops, train_gssl.py:214-235).
    """
    from celebbasis_tpu.align.pipnet import meanface_indices

    model = PIPNetGSSL(net_cfg)
    nb_idx = forward_neighbors(meanface, train_cfg.num_nb)
    ri1, ri2, _max_len = meanface_indices(meanface, train_cfg.num_nb)
    ri1, ri2 = jnp.asarray(ri1), jnp.asarray(ri2)
    host = np.random.default_rng(seed)

    imgs_l, lms_l = labeled
    n_l, n_u = len(imgs_l), len(unlabeled_images)
    bs = train_cfg.batch_size
    if n_l < bs:
        raise ValueError(
            f"need >= batch_size={bs} labeled rows (got {n_l}): the "
            "drop-last loader (train_gssl.py:267) would yield zero batches")

    def fresh_params(i):
        rng = (init_rngs[i] if init_rngs is not None
               else jax.random.key(seed + 100 + i))
        sample = jnp.zeros((1,) + imgs_l.shape[1:], jnp.float32)
        return jax.jit(model.init)(rng, sample)

    def train_round(rnd, images, lms, task):
        """Fresh net + optimizer, num_epochs over (images, lms, task)."""
        params = fresh_params(rnd)
        # GSSL always optimizes with plain Adam(lr) — no weight decay even
        # from scratch (train_gssl.py:147,251), unlike lib/train.py:174-176
        # which adds 5e-4 when not pretrained; force the no-decay branch
        optimizer = make_optimizer(
            dataclasses.replace(train_cfg, pretrained=True),
            max(len(images) // bs, 1))
        opt_state = optimizer.init(params)
        step = make_gssl_train_step(model, optimizer, nb_idx, train_cfg)
        hist = []
        for _epoch in range(train_cfg.num_epochs):
            if augment_fn is not None:
                ep_images, ep_lms = augment_fn(rnd, _epoch, lms)
                assert len(ep_images) == len(images)
            else:
                ep_images, ep_lms = images, lms
            total, n = 0.0, 0
            for idx in _iter_batches(len(images), bs, host):
                params, opt_state, loss, _ = step(
                    params, opt_state, jnp.asarray(ep_images[idx]),
                    jnp.asarray(ep_lms[idx]), jnp.asarray(task[idx]))
                total += float(loss)
                n += 1
            hist.append(total / max(n, 1))
        return params, hist

    decode = jax.jit(lambda p, x: gssl_decode(model.apply(p, x), net_cfg,
                                              ri1, ri2))

    def pseudo_label(params):
        """Decode the unlabeled set in fixed-shape batches (ragged tail is
        padded to batch_size so every round reuses one compiled program)."""
        if not n_u:
            return np.zeros((0,) + lms_l.shape[1:], np.float32)
        out = []
        for i in range(0, n_u, bs):
            chunk = unlabeled_images[i:i + bs]
            k = len(chunk)
            if k < bs:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], bs - k, axis=0)])
            out.append(np.asarray(decode(params, jnp.asarray(chunk)))[:k])
        return np.concatenate(out)

    # supervised warmup on the labeled set (train_gssl.py:147-162)
    params, init_hist = train_round(
        0, imgs_l, lms_l, np.full((n_l,), TASK_STD, np.int32))
    if verbose:
        print(f"[gssl] init (std, labeled only): "
              f"loss {init_hist[0]:.4f} -> {init_hist[-1]:.4f}")

    history = []
    for ti, task_type in enumerate(task_list):
        # (1) estimate pseudo-labels with the current net
        pseudo = pseudo_label(params)
        # (2)+(3) fresh net + optimizer; labeled 'std' + pseudo rows
        images = np.concatenate([imgs_l, unlabeled_images]) if n_u else imgs_l
        lms = np.concatenate([lms_l, pseudo]) if n_u else lms_l
        task = np.concatenate([np.full((n_l,), TASK_STD, np.int32),
                               np.full((n_u,), TASK_IDS[task_type],
                                       np.int32)])
        params, round_hist = train_round(ti + 1, images, lms, task)
        history.append(round_hist)
        if verbose:
            print(f"[gssl] round {ti} ({task_type}): "
                  f"loss {round_hist[0]:.4f} -> {round_hist[-1]:.4f}")
    return {"params": params, "history": history, "init_history": init_hist}
