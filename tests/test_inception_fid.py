"""Golden parity: Flax InceptionV3-pool3 vs a torch FID-Inception oracle.

torchvision is absent in this image, so the oracle is a hand-built torch
module structurally identical to pytorch-fid's FID InceptionV3 (see
tests/_stubs/fid_inception_torch.py), random-init.  This pins the graph,
the weight-bridge key contract, and the FID pooling quirks.
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "_stubs"))

from fid_inception_torch import FIDInceptionV3  # noqa: E402

from celebbasis_tpu.eval import inception as inc  # noqa: E402
from celebbasis_tpu.eval.fid import FIDScorer, frechet_distance  # noqa: E402


@pytest.fixture(scope="module")
def bridged():
    torch.manual_seed(0)
    net = FIDInceptionV3().eval()
    # randomize BN running stats so parity actually exercises them
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    state = {k: v.numpy() for k, v in net.state_dict().items()}
    variables = inc.convert_inception(state)
    return net, variables


def test_pool3_parity(bridged):
    net, variables = bridged
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 299, 299, 3)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(inc.InceptionV3().apply(variables, x))
    assert ours.shape == (2, inc.POOL3_DIM)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_preprocess_matches_torch_interpolate():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (2, 64, 48, 3), dtype=np.uint8)
    ours = np.asarray(inc.preprocess(img, size=29))
    t = torch.from_numpy(img.transpose(0, 3, 1, 2).astype(np.float32) / 255.0)
    ref = torch.nn.functional.interpolate(
        t, size=(29, 29), mode="bilinear", align_corners=False)
    ref = (ref * 2 - 1).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_fid_scorer_with_inception(bridged, tmp_path):
    """End-to-end: two folders scored with the Inception extractor; FID of a
    folder with itself is ~0 and differing folders score > 0."""
    from PIL import Image
    _net, variables = bridged
    flax_net = inc.InceptionV3()

    import jax
    fwd = jax.jit(lambda v, x: flax_net.apply(v, x))

    def feature_fn(batch_uint8):
        return np.asarray(fwd(variables, inc.preprocess(batch_uint8)))

    rng = np.random.default_rng(2)
    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(), b.mkdir()
    for i in range(8):
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
                        ).save(a / f"{i}.png")
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
                        ).save(b / f"{i}.png")
    scorer = FIDScorer(feature_fn, batch_size=4)
    same = scorer.fid(str(a), str(a))
    diff = scorer.fid(str(a), str(b))
    assert abs(same) < 1e-3
    assert diff > 0


def test_load_inception_random_init_contract():
    fn, variables = inc.load_inception(None)
    out = fn(np.zeros((1, 40, 40, 3), np.uint8))
    assert out.shape == (1, 2048) and np.isfinite(out).all()


# -- sqrtm hardening (VERDICT r4 #8) -----------------------------------------

def _rand_cov(rng, d, rank=None, scale=1.0):
    """PSD covariance, optionally rank-deficient / badly scaled."""
    r = rank or d
    a = rng.standard_normal((d, r)) * scale
    return a @ a.T / r


class _ImaginaryComponent(Exception):
    """pytorch-fid raises ValueError('Imaginary component ...') here."""


def _pytorch_fid_distance(mu1, cov1, mu2, cov2, eps=1e-6):
    """pytorch_fid/fid_score.py:calculate_frechet_distance verbatim
    semantics on scipy's Schur sqrtm (the upstream the paper's numbers
    came from; torch-fidelity computes the same closed form)."""
    from scipy import linalg
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(cov1.dot(cov2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(cov1.shape[0]) * eps
        covmean = linalg.sqrtm((cov1 + offset).dot(cov2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise _ImaginaryComponent
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(cov1) + np.trace(cov2)
                 - 2 * np.trace(covmean))


@pytest.mark.parametrize("case", [
    ("well_conditioned", dict(rank=None, scale=1.0)),
    ("rank_deficient", dict(rank=3, scale=1.0)),          # d=16, rank 3
    ("near_singular", dict(rank=None, scale=1e-4)),
    ("mixed_scale", dict(rank=5, scale=1e3)),
], ids=lambda c: c[0])
def test_frechet_matches_pytorch_fid_on_hard_covariances(case):
    """Our eigh-route Fréchet distance vs the pytorch-fid/scipy Schur
    route on the covariance classes where FID implementations actually
    disagree (ill-conditioned / rank-deficient).  Agreement is relative:
    the documented cross-implementation tolerance (MIGRATION.md §6)."""
    from celebbasis_tpu.eval.fid import frechet_distance
    _, kw = case
    rng = np.random.default_rng(42)
    d = 16
    n_raised = 0
    for trial in range(5):
        mu1, mu2 = rng.standard_normal((2, d))
        c1 = _rand_cov(rng, d, **kw)
        c2 = _rand_cov(rng, d, **kw)
        ours = frechet_distance(mu1, c1, mu2, c2)
        assert np.isfinite(ours)
        try:
            ref = _pytorch_fid_distance(mu1, c1, mu2, c2)
        except _ImaginaryComponent:
            # scipy's Schur route emits large imaginary diagonals on badly
            # scaled rank-deficient products; pytorch-fid would CRASH here
            # ('Imaginary component') while the eigh route stays defined —
            # the documented behavioural delta (MIGRATION.md §6)
            n_raised += 1
            continue
        scale = max(abs(ref), 1e-6)
        assert abs(ours - ref) / scale < 2e-5, (trial, ours, ref)
    if kw == dict(rank=5, scale=1e3):
        assert n_raised > 0  # the delta actually exercised


def test_sqrtm_psd_matches_scipy_on_psd():
    from scipy import linalg
    from celebbasis_tpu.eval.fid import _sqrtm_psd
    rng = np.random.default_rng(3)
    for rank in (16, 8, 1):
        c = _rand_cov(rng, 16, rank=rank)
        got = _sqrtm_psd(c)
        want = linalg.sqrtm(c)
        if np.iscomplexobj(want):
            want = want.real
        np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)
        # a genuine square root
        np.testing.assert_allclose(got @ got, c, atol=1e-8, rtol=1e-7)


def test_frechet_identical_gaussians_zero_even_rank_deficient():
    from celebbasis_tpu.eval.fid import frechet_distance
    rng = np.random.default_rng(9)
    mu = rng.standard_normal(16)
    c = _rand_cov(rng, 16, rank=2)
    assert abs(frechet_distance(mu, c, mu, c)) < 1e-6 * max(np.trace(c), 1.0)
