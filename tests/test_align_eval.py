"""Tests for NMS (native + jax), detector decode, PIPNet decode, alignment
math, and the evaluators."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from celebbasis_tpu.align import nms as nms_mod
from celebbasis_tpu.align.alignment import (FFHQ, estimate_norm,
                                            get_5_from_98, norm_crop,
                                            umeyama_similarity,
                                            warp_affine_pixels)
from celebbasis_tpu.align.faceboxes import (FaceBoxesDetector, FaceBoxesV2,
                                            decode_boxes, prior_boxes)
from celebbasis_tpu.align.pipnet import (PIPNet, PIPNetConfig,
                                         decode_landmarks, meanface_indices)


def _rand_dets(n, seed=0):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, 200, (n, 2))
    wh = rng.uniform(10, 80, (n, 2))
    scores = rng.uniform(0.1, 1.0, (n, 1))
    return np.hstack([xy, xy + wh, scores]).astype(np.float32)


@pytest.mark.smoke
def test_native_nms_matches_numpy():
    dets = _rand_dets(300)
    ref = nms_mod.greedy_nms_numpy(dets, 0.3)
    got = nms_mod.greedy_nms(dets, 0.3)
    np.testing.assert_array_equal(ref, got)
    got_bm = nms_mod.bitmask_nms(dets, 0.3)
    np.testing.assert_array_equal(sorted(ref), sorted(got_bm))


def test_soft_nms_runs():
    dets = _rand_dets(50)
    out = nms_mod.soft_nms(dets, method=2)
    assert out.shape[1] == 5 and 1 <= len(out) <= 50


@pytest.mark.smoke
def test_jax_nms_matches_numpy():
    dets = _rand_dets(64, seed=3)
    ref = set(nms_mod.greedy_nms_numpy(dets, 0.3).tolist())
    keep = jax.jit(nms_mod.nms_jax, static_argnums=(2,))(
        jnp.asarray(dets[:, :4]), jnp.asarray(dets[:, 4]), 0.3)
    got = set(np.where(np.asarray(keep))[0].tolist())
    assert got == ref


def test_prior_boxes_count():
    pri = prior_boxes((256, 256))
    # stride 32: 8x8 cells x (16+4+1) anchors; stride 64: 4x4 x 1;
    # stride 128: 2x2 x 1
    assert pri.shape == (8 * 8 * 21 + 16 + 4, 4)


def test_decode_boxes_identity():
    pri = jnp.asarray([[0.5, 0.5, 0.2, 0.2]], jnp.float32)
    out = np.asarray(decode_boxes(jnp.zeros((1, 4)), pri))
    np.testing.assert_allclose(out, [[0.4, 0.4, 0.6, 0.6]], atol=1e-6)


def test_detector_end_to_end_random_weights():
    net = FaceBoxesV2()
    params = jax.jit(net.init)(jax.random.key(0), jnp.zeros((1, 128, 128, 3)))
    det = FaceBoxesDetector(params, thresh=0.0)  # accept anything
    img = np.random.default_rng(0).uniform(0, 255, (130, 140, 3))
    out = det.detect(img.astype(np.float32))
    assert isinstance(out, list)
    if out:
        d = out[0]
        assert hasattr(d, "score") and hasattr(d, "xmin")


# -- PIPNet -----------------------------------------------------------------

def test_meanface_indices_shapes():
    rng = np.random.default_rng(0)
    mf = rng.uniform(0, 1, (98, 2))
    ri1, ri2, max_len = meanface_indices(mf, 10)
    assert ri1.shape == (98, max_len) and ri2.shape == (98, max_len)
    assert ri2.max() < 10


def test_pipnet_decode_argmax_correct():
    """Decoder must pick the argmax cell + offset for each landmark."""
    cfg = PIPNetConfig.tiny()
    g = cfg.input_size // cfg.net_stride
    L, nb = cfg.num_lms, cfg.num_nb
    B = 1
    cls = np.full((B, g, g, L), -5.0, np.float32)
    tgt = [(i % g, (i * 2 + 1) % g) for i in range(L)]
    for i, (cy, cx) in enumerate(tgt):
        cls[0, cy, cx, i] = 5.0
    ox = np.full((B, g, g, L), 0.25, np.float32)
    oy = np.full((B, g, g, L), -0.25, np.float32)
    nbx = np.zeros((B, g, g, L * nb), np.float32)
    nby = np.zeros((B, g, g, L * nb), np.float32)
    mf = np.random.default_rng(1).uniform(0, 1, (L, 2))
    ri1, ri2, _ = meanface_indices(mf, nb)
    out = np.asarray(decode_landmarks(
        tuple(jnp.asarray(a) for a in (cls, ox, oy, nbx, nby)), cfg,
        jnp.asarray(ri1), jnp.asarray(ri2)))
    assert out.shape == (B, L, 2)
    # with zero neighbor offsets, merged x = mean(own + neighbor-cell coords);
    # check own-pred component via landmark 0's known argmax cell
    grid = cfg.input_size / cfg.net_stride
    cy, cx = tgt[0]
    own_x = (cx + 0.25) / grid
    # own pred is 1 of (1+max_len) averaged values; reconstruct exactly:
    rx = ((np.asarray([tgt[i][1] for i in ri1[0]]) + 0.0) / grid)
    expect = np.concatenate([[own_x], rx]).mean()
    np.testing.assert_allclose(out[0, 0, 0], expect, atol=1e-5)


def test_pipnet_forward_shapes():
    cfg = PIPNetConfig.tiny()
    net = PIPNet(cfg)
    x = jnp.zeros((2, cfg.input_size, cfg.input_size, 3))
    params = jax.jit(net.init)(jax.random.key(0), x)
    outs = jax.jit(net.apply)(params, x)
    g = cfg.input_size // 32
    assert outs[0].shape == (2, g, g, cfg.num_lms)
    assert outs[3].shape == (2, g, g, cfg.num_lms * cfg.num_nb)


# -- alignment --------------------------------------------------------------

def test_umeyama_recovers_similarity():
    rng = np.random.default_rng(0)
    src = rng.uniform(0, 100, (5, 2))
    theta, s, t = 0.3, 1.7, np.asarray([10.0, -5.0])
    R = np.asarray([[np.cos(theta), -np.sin(theta)],
                    [np.sin(theta), np.cos(theta)]])
    dst = s * src @ R.T + t
    M = umeyama_similarity(src, dst)
    got = src @ M[:, :2].T + M[:, 2]
    np.testing.assert_allclose(got, dst, atol=1e-4)


@pytest.mark.smoke
def test_estimate_norm_maps_to_template():
    lmk = FFHQ + np.random.default_rng(1).normal(0, 0.5, (5, 2)).astype(
        np.float32)
    M = estimate_norm(lmk, 512, "ffhq")
    got = lmk @ M[:, :2].T + M[:, 2]
    assert np.abs(got - FFHQ).max() < 3.0


def test_warp_affine_identity():
    img = np.random.default_rng(2).uniform(0, 1, (16, 16, 3)).astype(
        np.float32)
    M = np.asarray([[1.0, 0, 0], [0, 1.0, 0]], np.float32)
    out = warp_affine_pixels(img, M, (16, 16))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_get_5_from_98():
    lmk = np.arange(98 * 2, dtype=np.float32).reshape(98, 2)
    five = get_5_from_98(lmk)
    assert five.shape == (5, 2)
    np.testing.assert_allclose(five[0], (lmk[60] + lmk[64] + lmk[96]) / 3)
    np.testing.assert_allclose(five[2], lmk[54])


def test_norm_crop_shape():
    img = np.random.default_rng(3).uniform(0, 255, (600, 600, 3)).astype(
        np.float32)
    lmk = FFHQ * (600 / 512.0)
    crop = norm_crop(img, lmk, 512, "ffhq")
    assert crop.shape == (512, 512, 3)


# -- evaluators / fid -------------------------------------------------------

def test_frechet_distance_zero_and_positive():
    from celebbasis_tpu.eval.fid import (activation_statistics,
                                         frechet_distance)
    rng = np.random.default_rng(0)
    a = rng.standard_normal((500, 16))
    mu, cov = activation_statistics(a)
    assert abs(frechet_distance(mu, cov, mu, cov)) < 1e-6
    b = a + 3.0
    mu2, cov2 = activation_statistics(b)
    d = frechet_distance(mu, cov, mu2, cov2)
    np.testing.assert_allclose(d, 16 * 9.0, rtol=0.05)


def test_sphere_net_shapes():
    from celebbasis_tpu.eval.sphere import SphereConfig, SphereNet
    cfg = SphereConfig.tiny()
    net = SphereNet(cfg)
    x = jnp.zeros((2, 32, 32, 3))
    params = jax.jit(net.init)(jax.random.key(0), x)
    out = jax.jit(net.apply)(params, x)
    assert out.shape == (2, cfg.feat_dim)


def test_sphere_parity_with_reference():
    import sys
    sys.path.insert(0, "/root/reference")
    torch = pytest.importorskip("torch")
    from evaluation.face_align.cosface.net import sphere as RefSphere
    from celebbasis_tpu.eval.sphere import (SphereConfig, SphereNet,
                                            convert_sphere)
    torch.manual_seed(0)
    ref = RefSphere(type=20).eval()
    x = torch.randn(1, 3, 112, 112)
    with torch.no_grad():
        ref_out = ref(x).numpy()
    cfg = SphereConfig.sphere20()
    params = convert_sphere(
        {k: v.numpy() for k, v in ref.state_dict().items()}, cfg)
    net = SphereNet(cfg)
    got = jax.jit(net.apply)(params,
                             jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), ref_out, atol=3e-4, rtol=1e-3)


def test_clip_vision_shapes():
    from celebbasis_tpu.models.clip_vit import (CLIPVisionConfig,
                                                CLIPVisionEncoder)
    cfg = CLIPVisionConfig.tiny()
    net = CLIPVisionEncoder(cfg)
    x = jnp.zeros((2, cfg.image_size, cfg.image_size, 3))
    params = jax.jit(net.init)(jax.random.key(0), x)
    out = jax.jit(net.apply)(params, x)
    assert out.shape == (2, cfg.proj_dim)


# -- eval base layer ---------------------------------------------------------

def test_eval_grid_and_infer(tmp_path):
    from celebbasis_tpu.eval.base import (EvalGrid, ModelInfer,
                                          GeneratedDataset, image_name,
                                          parse_image_name)
    grid = EvalGrid(["a photo of sks person",
                     "sks person and ks person"], ids=[0, 1, 2],
                    out_root=str(tmp_path), shift_id=1)
    items = list(grid)
    assert len(items) == 6
    assert not items[0].two_person and items[3].two_person
    assert items[3].pair_idx == 1  # id 0 pairs with id 1

    calls = []

    def infer_one(item):
        calls.append(item.id_idx)
        return [np.zeros((8, 8, 3), np.float32)] * 2

    n = ModelInfer(infer_one).start_infer(grid, verbose=False)
    assert n == 6 and len(calls) == 6
    # resumable: second run does nothing
    n2 = ModelInfer(infer_one).start_infer(grid, verbose=False)
    assert n2 == 0 and len(calls) == 6

    assert parse_image_name(image_name(3, 7, 2)) == (3, 7, 2)
    groups = GeneratedDataset(str(tmp_path)).groups()
    assert len(groups) == 6
    key = sorted(groups)[0]
    arr = GeneratedDataset(str(tmp_path)).load_group(groups[key])
    assert arr.shape == (2, 8, 8, 3)


def test_survey_reader(tmp_path):
    from celebbasis_tpu.eval.survey import (preference_counts,
                                            preference_rates,
                                            read_survey_csv)
    p = tmp_path / "survey.csv"
    p.write_text("time,q1,q2\n"
                 "t0,ours,ref\n"
                 "t1,ours,ours\n"
                 "t2,ref,ours\n")
    rows = read_survey_csv(str(p))
    counts = preference_counts(rows)
    assert counts[0]["ours"] == 2 and counts[0]["ref"] == 1
    rates = preference_rates(rows)
    assert abs(rates["ours"] - 4 / 6) < 1e-9


def test_landmark_metrics():
    from celebbasis_tpu.align.metrics import compute_fr_and_auc, compute_nme
    gt = np.random.default_rng(0).uniform(0, 100, (98, 2))
    assert compute_nme(gt, gt, norm=10.0) == 0.0
    pred = gt + 1.0  # every landmark off by sqrt(2)
    np.testing.assert_allclose(compute_nme(pred, gt, norm=np.sqrt(2)), 1.0,
                               rtol=1e-6)
    fr, auc = compute_fr_and_auc([0.01, 0.02, 0.5], thres=0.1)
    np.testing.assert_allclose(fr, 1 / 3, rtol=1e-6)
    assert 0 < auc < 1


def test_verification_accuracy():
    from celebbasis_tpu.align.metrics import verification_accuracy
    rng = np.random.default_rng(1)
    pos = rng.normal(0.8, 0.05, 100)
    neg = rng.normal(0.2, 0.05, 100)
    scores = np.concatenate([pos, neg])
    labels = np.concatenate([np.ones(100), np.zeros(100)])
    order = rng.permutation(200)
    acc, std = verification_accuracy(scores[order], labels[order])
    assert acc > 0.98
