"""BSRGAN degradation pipeline vs the reference's own module.

The reference's ``ldm/modules/image_degradation/bsrgan_light.py`` imports
cleanly here (cv2/scipy present; albumentations stubbed) — its deterministic
kernel/filter functions are the oracles.  The randomized pipeline is
checked for contract properties (shapes, dtype, range, seed determinism)
since the reference draws from unseedable global RNG streams.
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests/_stubs")
sys.path.insert(0, "/root/reference")

from celebbasis_tpu.data import degradation as deg

ref = pytest.importorskip("ldm.modules.image_degradation.bsrgan_light")


def test_gaussian_kernel_matches_fspecial(monkeypatch):
    # the reference calls scipy.finfo, removed in scipy>=1.14 — restore it
    # for the oracle only
    monkeypatch.setattr(ref.scipy, "finfo", np.finfo, raising=False)
    for hsize, sigma in [(7, 0.5), (15, 2.0), (25, 0.1), (6, 1.3)]:
        np.testing.assert_allclose(
            deg.gaussian_kernel(hsize, sigma),
            ref.fspecial("gaussian", hsize, sigma), atol=1e-12,
            err_msg=f"hsize={hsize} sigma={sigma}")


def test_anisotropic_kernel_matches_reference():
    for ksize, theta, l1, l2 in [(15, 0.0, 6, 6), (9, 1.1, 2.5, 0.4),
                                 (12, np.pi * 0.9, 0.8, 0.7),
                                 (5, 0.3, 1.0, 1.0)]:
        np.testing.assert_allclose(
            deg.anisotropic_gaussian_kernel(ksize, theta, l1, l2),
            ref.anisotropic_Gaussian(ksize, theta, l1, l2), atol=1e-10,
            err_msg=f"ksize={ksize} theta={theta}")


def test_blur_matches_reference_convolve():
    rng = np.random.default_rng(0)
    img = rng.random((20, 24, 3)).astype(np.float32)
    k = deg.gaussian_kernel(7, 1.2)
    from scipy import ndimage
    want = ndimage.convolve(img, np.expand_dims(k, 2), mode="mirror")
    np.testing.assert_allclose(deg.blur(img, k), want, atol=1e-7)


def test_shift_pixel_matches_reference_on_interior():
    """The reference's interp2d-based shift (removed API, emulated); compare
    against a manual bilinear shift on the interior."""
    k = deg.gaussian_kernel(25, 1.5)
    got = deg.shift_pixel(k, 4)
    # shift = 1.5 px toward upper-left: interior value = bilinear mix
    s = 1.5
    manual = (0.25 * (k[3:-3, 3:-3] + k[3:-3, 4:-2]
                      + k[4:-2, 3:-3] + k[4:-2, 4:-2]))
    # bilinear at +1.5 offset = average of the 4 neighbours at +1/+2
    np.testing.assert_allclose(got[2:-4, 2:-4], manual, atol=1e-12)
    assert abs(got.sum() - k.sum()) < 0.05
    _ = s


def test_jpeg_noise_roundtrip():
    rng = np.random.default_rng(1)
    img = rng.random((32, 32, 3)).astype(np.float32)
    out = deg.add_jpeg_noise(img, np.random.default_rng(2))
    assert out.shape == img.shape and out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0
    # JPEG at q>=80 keeps the image close but not identical
    assert 1e-4 < np.abs(out - img).mean() < 0.2


def test_variant_pipeline_contract():
    rng_img = np.random.default_rng(3)
    img = rng_img.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    for sf in (2, 4):
        out = deg.degradation_bsrgan_variant(
            img, sf=sf, rng=np.random.default_rng(7))["image"]
        assert out.shape == (64 // sf, 64 // sf, 3), (sf, out.shape)
        assert out.dtype == np.uint8
    # seed-deterministic; different seeds differ
    a = deg.degradation_bsrgan_variant(img, 4, np.random.default_rng(7))
    b = deg.degradation_bsrgan_variant(img, 4, np.random.default_rng(7))
    c = deg.degradation_bsrgan_variant(img, 4, np.random.default_rng(8))
    np.testing.assert_array_equal(a["image"], b["image"])
    assert not np.array_equal(a["image"], c["image"])


def test_paired_pipeline_contract():
    img = np.random.default_rng(5).random((96, 96, 3)).astype(np.float32)
    lq, hq = deg.degradation_bsrgan(img, sf=4, lq_patchsize=16,
                                    rng=np.random.default_rng(11))
    assert lq.shape == (16, 16, 3)
    assert hq.shape == (64, 64, 3)
    assert 0.0 <= lq.min() and lq.max() <= 1.0
    with pytest.raises(ValueError):
        deg.degradation_bsrgan(img[:32, :32], sf=4, lq_patchsize=16)


def test_full_variant_differs_from_light():
    """light=False activates the second blur slot and wider kernels —
    statistically blurrier/noisier output on average."""
    img = np.random.default_rng(6).integers(0, 255, (64, 64, 3),
                                            dtype=np.uint8)
    out_l = deg.degradation_bsrgan_variant(img, 4, np.random.default_rng(1),
                                           light=True)["image"]
    out_f = deg.degradation_bsrgan_variant(img, 4, np.random.default_rng(1),
                                           light=False)["image"]
    assert out_l.shape == out_f.shape
    assert not np.array_equal(out_l, out_f)


# ---------------------------------------------------------------------------
# classical toolbox (bsrgan.py:29-335 + degradation_bsrgan_plus :617-714)
# ---------------------------------------------------------------------------

ref_full = pytest.importorskip("ldm.modules.image_degradation.bsrgan")


def _img64(seed=0):
    return np.random.RandomState(seed).rand(64, 64, 3).astype(np.float32)


def test_classical_degradations_match():
    x = _img64()
    k = deg.gaussian_kernel(7, 1.1)
    np.testing.assert_allclose(deg.bicubic_degradation(x, 2),
                               ref_full.bicubic_degradation(x, 2), atol=3e-7)
    np.testing.assert_allclose(deg.srmd_degradation(x, k, 2),
                               ref_full.srmd_degradation(x, k, 2), atol=3e-7)
    np.testing.assert_allclose(deg.dpsr_degradation(x, k, 2),
                               ref_full.dpsr_degradation(x, k, 2), atol=3e-7)
    np.testing.assert_allclose(deg.classical_degradation(x, k, 2),
                               ref_full.classical_degradation(x, k, 2),
                               atol=3e-7)


def test_kernel_generators_match():
    k = deg.gaussian_kernel(7, 1.3)
    np.testing.assert_allclose(deg.analytic_kernel(k),
                               ref_full.analytic_kernel(k), atol=1e-12)
    np.testing.assert_allclose(
        deg.gm_blur_kernel([0.3, -0.2], np.array([[2.0, 0.4], [0.4, 1.5]]), 9),
        ref_full.gm_blur_kernel([0.3, -0.2], [[2.0, 0.4], [0.4, 1.5]], 9),
        atol=1e-12)
    np.testing.assert_allclose(deg.fspecial_laplacian(0.3),
                               ref_full.fspecial_laplacian(0.3), atol=0)
    g = deg.gen_kernel(rng=np.random.default_rng(0))
    assert g.shape == (15, 15) and g.sum() == pytest.approx(1.0)
    np.testing.assert_array_equal(g, deg.gen_kernel(
        rng=np.random.default_rng(0)))


def test_add_sharpening_matches():
    x = _img64(1)
    np.testing.assert_allclose(deg.add_sharpening(x),
                               ref_full.add_sharpening(x), atol=3e-6)


def test_modcrop_random_crop():
    x = np.random.RandomState(2).rand(37, 41, 3).astype(np.float32)
    np.testing.assert_array_equal(deg.modcrop_np(x, 4),
                                  ref_full.modcrop_np(x, 4))
    lq = np.random.RandomState(3).rand(32, 32, 3).astype(np.float32)
    hq = np.random.RandomState(4).rand(128, 128, 3).astype(np.float32)
    a_l, a_h = deg.random_crop(lq, hq, 4, 16, rng=np.random.default_rng(5))
    b_l, b_h = deg.random_crop(lq, hq, 4, 16, rng=np.random.default_rng(5))
    assert a_l.shape == (16, 16, 3) and a_h.shape == (64, 64, 3)
    np.testing.assert_array_equal(a_l, b_l)
    np.testing.assert_array_equal(a_h, b_h)


def test_degradation_bsrgan_plus_contract():
    img = np.random.RandomState(6).rand(96, 96, 3).astype(np.float32)
    for sharp in (True, False):
        lq, hq = deg.degradation_bsrgan_plus(
            img, sf=4, lq_patchsize=16, use_sharp=sharp,
            rng=np.random.default_rng(7))
        assert lq.shape == (16, 16, 3) and hq.shape == (64, 64, 3)
        assert lq.dtype == np.float32 and np.isfinite(lq).all()
        assert 0.0 <= lq.min() and lq.max() <= 1.0
    a = deg.degradation_bsrgan_plus(img, sf=4, lq_patchsize=16,
                                    rng=np.random.default_rng(8))
    b = deg.degradation_bsrgan_plus(img, sf=4, lq_patchsize=16,
                                    rng=np.random.default_rng(8))
    np.testing.assert_array_equal(a[0], b[0])
