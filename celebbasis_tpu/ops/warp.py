"""Affine warp + bilinear sampling (torch grid_sample semantics) in JAX.

The reference preprocesses faces with ``F.affine_grid`` + ``F.grid_sample``
(align_corners=True, zero padding) followed by ``F.interpolate(112,
bilinear, align_corners=True)`` (`/root/reference/ldm/modules/id_embedding/
meta_net.py:250-264`).  Because align-corners normalized coordinates are
resolution independent, the warp and the resize compose into a **single**
bilinear gather on a 112x112 grid — one fused op instead of materializing the
warped 512x512 image (8x less memory traffic).

All math is vectorized gathers; jit/vmap friendly, NHWC.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _norm_grid(h: int, w: int) -> jax.Array:
    """align_corners=True normalized coords: pixel i -> -1 + 2i/(n-1). (h,w,2) xy."""
    ys = jnp.linspace(-1.0, 1.0, h)
    xs = jnp.linspace(-1.0, 1.0, w)
    gx, gy = jnp.meshgrid(xs, ys)
    return jnp.stack([gx, gy], axis=-1)


def grid_sample_bilinear(img: jax.Array, grid: jax.Array,
                         align_corners: bool = True) -> jax.Array:
    """img: (H, W, C); grid: (h, w, 2) normalized xy coords -> (h, w, C).

    Zero padding outside [-1, 1] (padding_mode='zeros').
    """
    H, W, C = img.shape
    x, y = grid[..., 0], grid[..., 1]
    if align_corners:
        fx = (x + 1.0) * 0.5 * (W - 1)
        fy = (y + 1.0) * 0.5 * (H - 1)
    else:
        fx = ((x + 1.0) * W - 1.0) * 0.5
        fy = ((y + 1.0) * H - 1.0) * 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = fx - x0
    wy = fy - y0

    def tap(xi, yi):
        inb = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        vals = img[yi_c, xi_c]
        return vals * inb[..., None].astype(img.dtype)

    v00 = tap(x0, y0)
    v01 = tap(x0 + 1, y0)
    v10 = tap(x0, y0 + 1)
    v11 = tap(x0 + 1, y0 + 1)
    wx = wx[..., None].astype(img.dtype)
    wy = wy[..., None].astype(img.dtype)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def affine_warp(img: jax.Array, M: jax.Array,
                align_corners: bool = True) -> jax.Array:
    """torch affine_grid + grid_sample at the input resolution: (H,W,C)->(H,W,C)."""
    H, W, _ = img.shape
    base = _norm_grid(H, W)
    ones = jnp.ones_like(base[..., :1])
    hom = jnp.concatenate([base, ones], axis=-1)  # (H, W, 3)
    warped = jnp.einsum("hwk,ck->hwc", hom, M)
    return grid_sample_bilinear(img, warped, align_corners)


def affine_warp_resize(img: jax.Array, M: jax.Array, out_hw: tuple[int, int],
                       align_corners: bool = True,
                       fused: bool = False) -> jax.Array:
    """Warp by the 2x3 normalized-coords affine M, then resize to ``out_hw``.

    ``fused=False`` (default) reproduces the reference's two-stage resample
    (affine grid_sample at full res, then bilinear align-corners interpolate,
    meta_net.py:256-260) bit-for-bit.  ``fused=True`` composes both into a
    single gather on the output grid — one 2x2-tap filter instead of a
    4-tap cascade: cheaper, slightly different filtering; use only where
    parity with reference activations is not required.
    """
    if fused:
        h, w = out_hw
        base = _norm_grid(h, w)
        ones = jnp.ones_like(base[..., :1])
        hom = jnp.concatenate([base, ones], axis=-1)
        warped = jnp.einsum("hwk,ck->hwc", hom, M)
        return grid_sample_bilinear(img, warped, align_corners)
    warped = affine_warp(img, M, align_corners)
    return grid_sample_bilinear(warped, _norm_grid(*out_hw), align_corners=True)


def batched_affine_warp_resize(imgs: jax.Array, M: jax.Array,
                               out_hw: tuple[int, int]) -> jax.Array:
    """imgs: (B, H, W, C); M: (2, 3) shared or (B, 2, 3)."""
    if M.ndim == 2:
        return jax.vmap(lambda im: affine_warp_resize(im, M, out_hw))(imgs)
    return jax.vmap(lambda im, m: affine_warp_resize(im, m, out_hw))(imgs, M)


def bilinear_resize_align_corners(img: jax.Array, out_hw: tuple[int, int]
                                  ) -> jax.Array:
    """torch F.interpolate(mode='bilinear', align_corners=True) for (H,W,C)."""
    return grid_sample_bilinear(img, _norm_grid(*out_hw), align_corners=True)


# The reference's fixed FFHQ-crop -> ArcFace-crop normalized affine
# (meta_net.py:131-143, including the infamous '/512' correction).
INSIGHTFACE_TRANS_MATRIX = jnp.array(
    [[1.07695457, -0.03625215, -1.56352194 / 512],
     [0.03625215, 1.07695457, -5.32134629 / 512]], dtype=jnp.float32)
