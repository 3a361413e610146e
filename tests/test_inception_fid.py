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
