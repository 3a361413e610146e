"""utils_image parity: numpy ports vs the reference module as oracle.

Oracle: `/root/reference/ldm/modules/image_degradation/utils_image.py`
imported directly (cv2/torch available to tests only).  The reference's
``patches_from_image`` split path still uses the removed ``np.int`` alias and
crashes on this numpy — its small-image branch is oracled and the split path
is pinned against hand-computed slices.
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests/_stubs")
sys.path.insert(0, "/root/reference")

from celebbasis_tpu.utils import image_ops as ops  # noqa: E402

torch = pytest.importorskip("torch")
from ldm.modules.image_degradation import utils_image as ref  # noqa: E402


def _img(h=64, w=56, c=3, seed=0):
    return np.random.RandomState(seed).rand(h, w, c).astype(np.float32)


@pytest.mark.parametrize("scale", [0.5, 1 / 3, 0.25, 2.0, 1.7, 0.3])
@pytest.mark.parametrize("antialiasing", [True, False])
def test_imresize_np_matches(scale, antialiasing):
    img = _img()
    out = ops.imresize_np(img, scale, antialiasing)
    try:
        exp = ref.imresize_np(img, scale, antialiasing)
    except RuntimeError:
        # the reference crashes whenever sym_len_e == 0 (its `img[-0:]`
        # symmetric patch grabs the whole image, then narrow(…, 0) mismatches
        # — e.g. scale 0.25 without antialiasing); ours handles the empty pad
        import math as _m
        _, _, _, sym_e = ops.calculate_weights_indices(
            img.shape[0], _m.ceil(img.shape[0] * scale), scale, "cubic", 4,
            antialiasing)
        assert sym_e == 0
        assert out.shape == (_m.ceil(img.shape[0] * scale),
                             _m.ceil(img.shape[1] * scale), 3)
        assert np.isfinite(out).all()
        return
    assert out.shape == exp.shape
    np.testing.assert_allclose(out, exp, atol=2e-6)


def test_imresize_np_gray_and_chw():
    gray = _img(c=1)[..., 0]
    np.testing.assert_allclose(ops.imresize_np(gray, 0.5),
                               ref.imresize_np(gray, 0.5), atol=2e-6)
    chw = _img().transpose(2, 0, 1)
    exp = ref.imresize(torch.from_numpy(chw.copy()), 0.4, True).numpy()
    np.testing.assert_allclose(ops.imresize(chw, 0.4, True), exp, atol=2e-6)


def test_cubic_and_weights_indices():
    x = np.linspace(-3, 3, 41, dtype=np.float32)
    np.testing.assert_allclose(ops.cubic(x),
                               ref.cubic(torch.from_numpy(x)).numpy(),
                               atol=1e-6)
    for args in [(64, 32, 0.5), (64, 109, 109 / 64), (50, 17, 17 / 50)]:
        w, i, s, e = ops.calculate_weights_indices(*args, "cubic", 4, True)
        rw, ri, rs, re = ref.calculate_weights_indices(*args, "cubic", 4,
                                                       True)
        np.testing.assert_allclose(w, rw.numpy(), atol=1e-6)
        np.testing.assert_array_equal(i, ri.numpy().astype(np.int64))
        assert (s, e) == (int(rs), int(re))


def test_psnr_ssim_match():
    a = (np.random.RandomState(1).rand(48, 52, 3) * 255).astype(np.uint8)
    b = np.clip(a.astype(np.int32)
                + np.random.RandomState(2).randint(-20, 20, a.shape),
                0, 255).astype(np.uint8)
    assert ops.calculate_psnr(a, b, border=2) == pytest.approx(
        ref.calculate_psnr(a, b, border=2), abs=1e-9)
    assert ops.calculate_ssim(a, b, border=2) == pytest.approx(
        ref.calculate_ssim(a, b, border=2), abs=1e-7)
    assert ops.calculate_ssim(a[..., 0], b[..., 0]) == pytest.approx(
        ref.calculate_ssim(a[..., 0], b[..., 0]), abs=1e-7)
    assert ops.calculate_psnr(a, a) == float("inf")


def test_ycbcr_trio():
    u8 = (np.random.RandomState(3).rand(20, 21, 3) * 255).astype(np.uint8)
    f32 = np.random.RandomState(4).rand(20, 21, 3).astype(np.float32)
    for only_y in (True, False):
        np.testing.assert_array_equal(
            ops.rgb2ycbcr(u8, only_y), ref.rgb2ycbcr(u8.copy(), only_y))
        np.testing.assert_allclose(
            ops.rgb2ycbcr(f32, only_y), ref.rgb2ycbcr(f32.copy(), only_y),
            atol=1e-6)
        np.testing.assert_array_equal(
            ops.bgr2ycbcr(u8, only_y), ref.bgr2ycbcr(u8.copy(), only_y))
        np.testing.assert_allclose(
            ops.bgr2ycbcr(f32, only_y), ref.bgr2ycbcr(f32.copy(), only_y),
            atol=1e-6)
    np.testing.assert_array_equal(ops.ycbcr2rgb(u8),
                                  ref.ycbcr2rgb(u8.copy()))
    np.testing.assert_allclose(ops.ycbcr2rgb(f32), ref.ycbcr2rgb(f32.copy()),
                               atol=1e-6)
    # ours must NOT mutate float inputs (the reference's does, in place)
    before = f32.copy()
    ops.rgb2ycbcr(f32, True)
    np.testing.assert_array_equal(f32, before)


def test_channel_convert():
    u8 = (np.random.RandomState(5).rand(16, 17, 3) * 255).astype(np.uint8)
    got = ops.channel_convert(3, "gray", [u8])[0]
    exp = ref.channel_convert(3, "gray", [u8])[0]
    assert got.shape == exp.shape
    assert np.abs(got.astype(int) - exp.astype(int)).max() <= 1  # cv2 rounding
    np.testing.assert_array_equal(ops.channel_convert(3, "y", [u8])[0],
                                  ref.channel_convert(3, "y", [u8.copy()])[0])
    g = u8[..., :1]
    np.testing.assert_array_equal(ops.channel_convert(1, "RGB", [g])[0],
                                  ref.channel_convert(1, "RGB", [g])[0])


@pytest.mark.parametrize("mode", range(8))
def test_augment_modes(mode):
    img = _img(10, 12)
    np.testing.assert_array_equal(ops.augment_img(img, mode),
                                  ref.augment_img(img, mode))
    np.testing.assert_array_equal(ops.augment_img_np3(img, mode),
                                  ref.augment_img_np3(img, mode))


def test_augment_imgs_seeded():
    imgs = [_img(8, 9, seed=6), _img(8, 9, seed=7)]
    rng = np.random.default_rng(0)
    h, v, r = rng.random() < 0.5, rng.random() < 0.5, rng.random() < 0.5
    out = ops.augment_imgs(imgs, rng=np.random.default_rng(0))
    for src, got in zip(imgs, out):
        exp = src
        if h:
            exp = exp[:, ::-1, :]
        if v:
            exp = exp[::-1, :, :]
        if r:
            exp = exp.transpose(1, 0, 2)
        np.testing.assert_array_equal(got, exp)


def test_modcrop_shave_patches():
    img = (_img(37, 41) * 255).astype(np.uint8)
    np.testing.assert_array_equal(ops.modcrop(img, 4), ref.modcrop(img, 4))
    np.testing.assert_array_equal(ops.modcrop(img[..., 0], 3),
                                  ref.modcrop(img[..., 0], 3))
    np.testing.assert_array_equal(ops.shave(img, 5), ref.shave(img, 5))
    # small-image branch vs the oracle; the split path vs hand-built slices
    # (the reference's own split path np.int-crashes on this numpy)
    small = ops.patches_from_image(img, 16, 4, 100)
    assert len(small) == 1 and small[0] is img
    big = (_img(220, 230) * 255).astype(np.uint8)
    got = ops.patches_from_image(big, p_size=100, p_overlap=20, p_max=200)
    starts_w = [0, 80, 120]
    starts_h = [0, 80, 130]
    assert len(got) == 9
    k = 0
    for i in starts_w:
        for j in starts_h:
            np.testing.assert_array_equal(got[k],
                                          big[i:i + 100, j:j + 100, :])
            k += 1


def test_io_roundtrip(tmp_path):
    img = (_img(24, 25) * 255).astype(np.uint8)
    p = str(tmp_path / "x.png")
    ops.imsave(img, p)
    back = ops.imread_uint(p, 3)
    np.testing.assert_array_equal(back, img)
    gray = ops.imread_uint(p, 1)
    assert gray.shape == (24, 25, 1)
    assert ops.is_image_file("a.png") and not ops.is_image_file("a.txt")
    assert ops.get_image_paths(str(tmp_path)) == [p]

    big = (_img(220, 230, seed=8) * 255).astype(np.uint8)
    ops.imsave(big, str(tmp_path / "big.png"))
    out_dir = tmp_path / "out"
    out_dir.mkdir()
    ops.split_imageset(str(tmp_path), str(out_dir), p_size=100, p_overlap=20,
                       p_max=200)
    outs = sorted(out_dir.iterdir())
    assert len(outs) == 9 + 1  # big.png splits 3x3; x.png passes whole
    first = ops.imread_uint(str(out_dir / "big_s0000.png"), 3)
    np.testing.assert_array_equal(first, big[:100, :100, :])


def test_conversion_helpers():
    u8 = (np.random.RandomState(9).rand(6, 7, 3) * 255).astype(np.uint8)
    f = ops.uint2single(u8)
    np.testing.assert_array_equal(f, ref.uint2single(u8))
    np.testing.assert_array_equal(ops.single2uint(f), ref.single2uint(f))
    u16 = (np.random.RandomState(10).rand(6, 7) * 65535).astype(np.uint16)
    np.testing.assert_array_equal(ops.uint162single(u16),
                                  ref.uint162single(u16))
    np.testing.assert_array_equal(
        ops.single2uint16(ops.uint162single(u16)),
        ref.single2uint16(ref.uint162single(u16)))
