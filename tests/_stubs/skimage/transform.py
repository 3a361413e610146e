"""Faithful SimilarityTransform for the reference oracle chain.

`estimate` is the published Umeyama (1991) least-squares similarity fit
exactly as scikit-image's `_geometric._umeyama(src, dst, True)` computes it,
including the determinant sign handling and the rank-deficient branch, in
float64.  NOTE: this is a hand-written stand-in (skimage is not installed),
so the torch-side oracle exercises the same published formula our
`celebbasis_tpu.align.alignment.umeyama_similarity` implements — the two
remain independent codes, but a bug *in the formula itself* would be
invisible to the composed test (same caveat as the clip stub).
"""
import numpy as np


def _umeyama(src, dst, estimate_scale=True):
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    num, dim = src.shape
    src_mean = src.mean(axis=0)
    dst_mean = dst.mean(axis=0)
    src_demean = src - src_mean
    dst_demean = dst - dst_mean
    A = dst_demean.T @ src_demean / num
    d = np.ones((dim,), dtype=np.float64)
    if np.linalg.det(A) < 0:
        d[dim - 1] = -1
    T = np.eye(dim + 1, dtype=np.float64)
    U, S, V = np.linalg.svd(A)
    rank = np.linalg.matrix_rank(A)
    if rank == 0:
        return np.full_like(T, np.nan)
    elif rank == dim - 1:
        if np.linalg.det(U) * np.linalg.det(V) > 0:
            T[:dim, :dim] = U @ V
        else:
            s = d[dim - 1]
            d[dim - 1] = -1
            T[:dim, :dim] = U @ np.diag(d) @ V
            d[dim - 1] = s
    else:
        T[:dim, :dim] = U @ np.diag(d) @ V
    if estimate_scale:
        scale = 1.0 / src_demean.var(axis=0).sum() * (S @ d)
    else:
        scale = 1.0
    T[:dim, dim] = dst_mean - scale * (T[:dim, :dim] @ src_mean)
    T[:dim, :dim] *= scale
    return T


class SimilarityTransform:
    def __init__(self, matrix=None, scale=None, rotation=None,
                 translation=None):
        if matrix is not None:
            self.params = np.asarray(matrix, np.float64)
            return
        s = 1.0 if scale is None else float(scale)
        r = 0.0 if rotation is None else float(rotation)
        tx, ty = (0.0, 0.0) if translation is None else translation
        self.params = np.array(
            [[s * np.cos(r), -s * np.sin(r), tx],
             [s * np.sin(r), s * np.cos(r), ty],
             [0.0, 0.0, 1.0]], np.float64)

    def estimate(self, src, dst):
        self.params = _umeyama(src, dst, True)
        return not np.any(np.isnan(self.params))

    def __add__(self, other):
        # skimage composition: (self + other)(x) == other(self(x))
        return SimilarityTransform(matrix=other.params @ self.params)

    def __call__(self, coords):
        coords = np.asarray(coords, np.float64)
        hom = np.hstack([coords, np.ones((coords.shape[0], 1))])
        out = hom @ self.params.T
        return out[:, :2]
