"""GSSL PIPNet parity + curriculum smoke (align/pipnet_gssl.py vs the
reference's semi-supervised stack: networks_gssl.py, functions_gssl.py,
data_utils_gssl.py, train_gssl.py).  Oracle modules are imported from
/root/reference (never copied)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference/evaluation/face_align/PIPNet/lib")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "_stubs"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

torch = pytest.importorskip("torch")

from celebbasis_tpu.align import pipnet_gssl as pg  # noqa: E402
from celebbasis_tpu.align import pipnet_train as pt  # noqa: E402
from celebbasis_tpu.align.pipnet import PIPNetConfig  # noqa: E402


def _tiny_gssl_cfg():
    # grid must be pool-able twice: input 128 / stride 32 -> maps 4, 2, 1
    return PIPNetConfig(num_lms=5, num_nb=2, input_size=128,
                        layers=(1, 1, 1, 1), width=8, block="basic")


def _rand_case(seed, B=4, L=5, nb=2, g=4):
    rng = np.random.default_rng(seed)
    landmarks = rng.uniform(0.02, 0.98, (B, L, 2)).astype(np.float32)
    meanface = rng.uniform(0, 1, (L, 2)).astype(np.float32)
    nb_idx = pt.forward_neighbors(meanface, nb)
    return landmarks, meanface, nb_idx


def test_gssl_net_parity():
    """PIPNetGSSL vs the reference Pip_resnet18 (networks_gssl.py:13-77):
    same shared-cls-at-3-scales head family, golden through the existing
    convert_pipnet bridge (identical param names)."""
    import torch_resnet
    from networks_gssl import Pip_resnet18

    from celebbasis_tpu.utils.bridge_align import convert_pipnet

    torch.manual_seed(5)
    resnet = torch_resnet.resnet(layers=(2, 2, 2, 2), block="basic")
    ref = Pip_resnet18(resnet, num_nb=10, num_lms=98, input_size=128,
                       net_stride=32).eval()
    cfg = PIPNetConfig.resnet18(input_size=128, net_stride=32)
    params = convert_pipnet(ref.state_dict(), cfg)

    x = torch.randn(2, 3, 128, 128)
    with torch.no_grad():
        ref_outs = ref(x)
    model = pg.PIPNetGSSL(cfg)
    outs = model.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    assert len(outs) == 7
    for got, want in zip(outs, ref_outs):
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                                   want.numpy(), atol=2e-4, rtol=1e-3)


def test_cls_maps_match_reference():
    """_cls_map vs gen_target_pip_cls{1,2,3} (data_utils_gssl.py:132-179)."""
    import data_utils_gssl as ref_du

    landmarks, _, _ = _rand_case(0)
    for g in (4, 2, 1):
        ours = np.asarray(pg._cls_map(jnp.asarray(landmarks), g))
        for b in range(landmarks.shape[0]):
            want = ref_du.gen_target_pip_cls1(
                landmarks[b].flatten().copy(),
                np.zeros((landmarks.shape[1], g, g)))
            np.testing.assert_array_equal(ours[b].transpose(2, 0, 1), want)


def test_gssl_loss_parity():
    """gssl_loss vs the reference compute_loss_pip (functions_gssl.py:74-138)
    with train_gssl.py:124-138's criteria, on a batch mixing all four task
    types — targets/masks built by gen_targets_gssl, replayed into torch."""
    import functions_gssl as ref_fn

    landmarks, _, nb_idx = _rand_case(1)
    B, L, nb, g = 4, 5, 2, 4
    task = np.array([pg.TASK_STD, pg.TASK_CLS1, pg.TASK_CLS2, pg.TASK_CLS3],
                    np.int32)
    targets, masks = pg.gen_targets_gssl(jnp.asarray(landmarks),
                                         jnp.asarray(nb_idx), g,
                                         jnp.asarray(task))
    rng = np.random.default_rng(2)
    shapes = [(B, g, g, L), (B, g // 2, g // 2, L), (B, g // 4, g // 4, L),
              (B, g, g, L), (B, g, g, L), (B, g, g, L * nb),
              (B, g, g, L * nb)]
    outputs = [rng.normal(size=s).astype(np.float32) for s in shapes]

    total, parts = pg.gssl_loss([jnp.asarray(o) for o in outputs], targets,
                                masks, nb)

    # torch replay: expand per-sample branch masks to the reference's
    # full-size mask tensors (data_utils_gssl.py:214-256)
    tt = lambda a: torch.from_numpy(np.ascontiguousarray(
        np.asarray(a).transpose(0, 3, 1, 2)).astype(np.float32))
    t1, t2, t3, tx, ty, tnx, tny = [tt(t) for t in targets]
    m1, m2, m3, mreg = [np.asarray(m) for m in masks]
    exp = lambda m, like: torch.from_numpy(
        np.broadcast_to(m[:, None, None, None],
                        like.shape).astype(np.float32)).clone()
    o1, o2, o3, ox, oy, onx, ony = [tt(o) for o in outputs]
    crit_cls = torch.nn.MSELoss(reduction="sum")
    crit_reg = torch.nn.L1Loss(reduction="sum")
    ref = ref_fn.compute_loss_pip(
        o1, o2, o3, ox, oy, onx, ony, t1, t2, t3, tx, ty, tnx, tny,
        exp(m1, t1), exp(m2, t2), exp(m3, t3), exp(mreg, tx), exp(mreg, ty),
        exp(mreg, tnx), exp(mreg, tny), crit_cls, crit_reg, nb)
    ref_map, ref_x, ref_y, ref_nx, ref_ny = [float(r) for r in ref]
    np.testing.assert_allclose(float(parts["map"]), ref_map, rtol=1e-5)
    np.testing.assert_allclose(float(parts["x"]), ref_x, rtol=1e-5)
    np.testing.assert_allclose(float(parts["y"]), ref_y, rtol=1e-5)
    np.testing.assert_allclose(float(parts["nb_x"]), ref_nx, rtol=1e-5)
    np.testing.assert_allclose(float(parts["nb_y"]), ref_ny, rtol=1e-5)
    np.testing.assert_allclose(
        float(total), 10.0 * ref_map + ref_x + ref_y + ref_nx + ref_ny,
        rtol=1e-5)


def test_gssl_self_train_smoke():
    """Supervised warmup (train_gssl.py:147-162) + two curriculum rounds on
    synthetic data: the labeled-only warmup learns before any pseudo-labels
    are estimated, the net is re-initialized each round, and the final
    round learns.  Unlabeled count (2) is deliberately not a multiple of
    batch_size (4) to exercise the padded fixed-shape decode."""
    cfg = _tiny_gssl_cfg()
    tcfg = pt.PIPTrainConfig(num_lms=5, num_nb=2, input_size=128,
                             net_stride=32, batch_size=4, init_lr=3e-3,
                             num_epochs=4, decay_steps=(100,))
    rng = np.random.default_rng(3)
    meanface = rng.uniform(0.2, 0.8, (5, 2)).astype(np.float32)
    lms = np.clip(meanface[None] + rng.normal(0, 0.05, (8, 5, 2)),
                  0.05, 0.95).astype(np.float32)
    # images carry the landmark signal so the net can actually learn
    imgs = np.zeros((8, 128, 128, 3), np.float32)
    for i in range(8):
        for (xx, yy) in lms[i]:
            imgs[i, int(yy * 127), int(xx * 127)] = 1.0
    out = pg.gssl_self_train(cfg, tcfg, meanface, (imgs[:6], lms[:6]),
                             imgs[6:], task_list=("cls3", "std"),
                             seed=0, verbose=False)
    assert len(out["history"]) == 2
    init = out["init_history"]
    assert len(init) == tcfg.num_epochs
    assert init[-1] < init[0]            # the supervised warmup learns
    final = out["history"][-1]
    assert final[-1] < final[0]          # the last round learns
    assert all(np.isfinite(v) for r in out["history"] for v in r)
    leaves = jax.tree_util.tree_leaves(out["params"])
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_gssl_always_plain_adam(monkeypatch):
    """GSSL optimizes with plain Adam(lr) regardless of cfg.pretrained
    (train_gssl.py:147,251 never adds weight decay, unlike lib/train.py:174-176
    which adds 5e-4 when from-scratch).  Pin that every optimizer built inside
    the curriculum — warmup and per-round — takes the no-decay branch."""
    seen = []
    real = pt.make_optimizer

    def spy(cfg, steps_per_epoch):
        seen.append(cfg.pretrained)
        return real(cfg, steps_per_epoch)

    monkeypatch.setattr(pg, "make_optimizer", spy)
    cfg = _tiny_gssl_cfg()
    tcfg = pt.PIPTrainConfig(num_lms=5, num_nb=2, input_size=128,
                             net_stride=32, batch_size=4, init_lr=3e-3,
                             num_epochs=1, decay_steps=(100,),
                             pretrained=False)   # would add decay in lib/train
    rng = np.random.default_rng(4)
    meanface = rng.uniform(0.2, 0.8, (5, 2)).astype(np.float32)
    lms = rng.uniform(0.1, 0.9, (6, 5, 2)).astype(np.float32)
    imgs = rng.standard_normal((6, 128, 128, 3)).astype(np.float32)
    pg.gssl_self_train(cfg, tcfg, meanface, (imgs[:4], lms[:4]), imgs[4:],
                       task_list=("cls3",), seed=0, verbose=False)
    assert len(seen) >= 2 and all(seen)  # warmup + round, all no-decay
