"""Face alignment math: 98->5 landmarks, similarity transform, norm_crop.

Parity target: `/root/reference/evaluation/face_align/PIPNet/alignment/`
(landmarks.py get_5_from_98, alignment.py estimate_norm/norm_crop).  The
templates (arcface/set1/ffhq/mtcnn 5-point targets) are the standard public
constants from insightface / FFHQ alignment.

The similarity fit is the Umeyama closed form (replacing skimage's
SimilarityTransform estimator — identical math); the warp is our bilinear
sampler in pixel coordinates (replacing cv2.warpAffine), jit-friendly.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from celebbasis_tpu.ops.warp import grid_sample_bilinear

SET1 = np.array([[41.125, 50.75], [71.75, 49.4375], [49.875, 73.0625],
                 [45.9375, 87.9375], [70.4375, 87.9375]], np.float32)
ARCFACE = np.array([[38.2946, 51.6963], [73.5318, 51.5014],
                    [56.0252, 71.7366], [41.5493, 92.3655],
                    [70.7299, 92.2041]], np.float32)
FFHQ = np.array([[192.98138, 239.94708], [318.90277, 240.1936],
                 [256.63416, 314.01935], [201.26117, 371.41043],
                 [313.08905, 371.15118]], np.float32)
MTCNN = np.array([[40.95041, 52.341854], [70.90203, 52.17619],
                  [56.02142, 69.376114], [43.716904, 86.910675],
                  [68.52042, 86.77348]], np.float32)

_TEMPLATES = {"set1": (SET1, 112), "arcface": (ARCFACE, 112),
              "ffhq": (FFHQ, 512), "mtcnn": (MTCNN, 112)}


def get_5_from_98(lmk: np.ndarray) -> np.ndarray:
    """WFLW 98 landmarks -> [left eye, right eye, nose, mouth corners]
    (landmarks.py:8-14).  float64, as the reference's int-landmark /3
    arithmetic produces — the similarity fit consumes it at full
    precision, which matters for cv2's quantized warp."""
    left_eye = (lmk[60] + lmk[64] + lmk[96]) / 3
    right_eye = (lmk[68] + lmk[72] + lmk[97]) / 3
    return np.asarray([left_eye, right_eye, lmk[54], lmk[76], lmk[82]],
                      np.float64)


def extract_five_from_68(lmk: np.ndarray) -> np.ndarray:
    """68-point (dlib/300W) landmarks -> 5 points (alignment.py:13-21)."""
    left_eye = lmk[36:42, :2].mean(axis=0)
    right_eye = lmk[42:48, :2].mean(axis=0)
    return np.asarray([left_eye, right_eye, lmk[30, :2], lmk[48, :2],
                       lmk[54, :2]], np.float32)


def umeyama_similarity(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Least-squares similarity transform src->dst (Umeyama 1991), (2,3)."""
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    n, d = src.shape
    mu_s, mu_d = src.mean(0), dst.mean(0)
    sc, dc = src - mu_s, dst - mu_d
    cov = dc.T @ sc / n
    U, S, Vt = np.linalg.svd(cov)
    sgn = np.ones(d)
    if np.linalg.det(cov) < 0:
        sgn[-1] = -1
    R = U @ np.diag(sgn) @ Vt
    var_s = (sc ** 2).sum() / n
    scale = (S * sgn).sum() / var_s
    t = mu_d - scale * R @ mu_s
    M = np.zeros((2, 3))
    M[:, :2] = scale * R
    M[:, 2] = t
    return M  # float64: cv2.warpAffine quantizes coords from the full-
    # precision M exactly as the reference's skimage-estimated transform


def estimate_norm(lmk5: np.ndarray, image_size: int = 112,
                  mode: str = "ffhq") -> np.ndarray:
    """Best similarity transform landmark->template (alignment.py:76-112)."""
    assert lmk5.shape == (5, 2)
    template, base = _TEMPLATES[mode]
    src = template * (float(image_size) / base)
    return umeyama_similarity(lmk5, src)


import functools


@functools.lru_cache(maxsize=32)
def _warp_jit(in_hw: Tuple[int, int], out_hw: Tuple[int, int],
              u8: bool = False):
    """One compiled warp per (input, output) geometry — the eager per-op
    dispatch otherwise dominates W0 throughput on slow hosts.

    ``u8=True`` takes/returns uint8 and converts on device: the fp32
    image transfer is 4× the bytes and dominates W0 wall-clock on
    tunneled hosts (PERF.md).  The uint8 output floors after clipping —
    bit-identical to the host-side ``crop.clip(0,255).astype(uint8)``."""
    H, W = in_hw
    oh, ow = out_hw

    def fn(image, Ainv):
        if u8:
            image = image.astype(jnp.float32)
        ys, xs = jnp.meshgrid(jnp.arange(oh, dtype=jnp.float32),
                              jnp.arange(ow, dtype=jnp.float32),
                              indexing="ij")
        ones = jnp.ones_like(xs)
        hom = jnp.stack([xs, ys, ones], -1)
        coords = hom @ Ainv.T  # (oh, ow, 2) source pixel coords
        gx = 2.0 * coords[..., 0] / (W - 1) - 1.0
        gy = 2.0 * coords[..., 1] / (H - 1) - 1.0
        grid = jnp.stack([gx, gy], -1)
        out = grid_sample_bilinear(image, grid, align_corners=True)
        if u8:
            out = jnp.floor(jnp.clip(out, 0.0, 255.0)).astype(jnp.uint8)
        return out

    return jax.jit(fn)


def warp_affine_pixels(image: np.ndarray, M: np.ndarray,
                       out_size: Tuple[int, int]) -> np.ndarray:
    """cv2.warpAffine equivalent: dst(x,y) = src(M^-1 [x,y,1]), bilinear,
    zero border. image: (H,W,C) float — or uint8, in which case the warp
    runs fp32 on device and a uint8 crop comes back (transfer-lean W0
    path). M: (2,3) src->dst pixel transform."""
    H, W = image.shape[:2]
    A = np.vstack([M, [0, 0, 1]]).astype(np.float64)
    Ainv = np.linalg.inv(A)[:2].astype(np.float32)
    u8 = image.dtype == np.uint8
    fn = _warp_jit((H, W), tuple(out_size), u8)
    img = jnp.asarray(image) if u8 else jnp.asarray(image, jnp.float32)
    return np.asarray(fn(img, jnp.asarray(Ainv)))


def _warp(image: np.ndarray, M: np.ndarray, image_size: int) -> np.ndarray:
    """cv2.warpAffine when available (the reference's exact fixed-point
    INTER_LINEAR resampler, alignment.py:141-144 — crops are then
    bit-identical to the reference's, which is the W0->W2 contract and
    also skips the device round-trip for this small host-side op);
    our jit bilinear warp otherwise."""
    try:
        import cv2
        return cv2.warpAffine(image, M, (image_size, image_size),
                              borderValue=0.0)
    except ImportError:                               # pragma: no cover
        return warp_affine_pixels(image, M, (image_size, image_size))


def norm_crop(image: np.ndarray, lmk5: np.ndarray, image_size: int = 112,
              mode: str = "ffhq") -> np.ndarray:
    """Aligned square crop (alignment.py:115-150)."""
    M = estimate_norm(lmk5, image_size, mode)
    return _warp(image, M, image_size)


def norm_crop_with_M(image: np.ndarray, lmk5: np.ndarray,
                     image_size: int = 112, mode: str = "ffhq"):
    M = estimate_norm(lmk5, image_size, mode)
    return _warp(image, M, image_size), M
