"""Batched image primitives: pyramid, gradients, bilinear sampling.

TPU-native replacements for the OpenCV image machinery the reference relies
on (cv::buildOpticalFlowPyramid / cv::Scharr / subpixel access inside
cv::calcOpticalFlowPyrLK). Everything is pure jnp with static shapes; XLA
fuses the convolutions; per-point sampling vmaps into gathers.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp


def _conv2d_same(img, kernel):
    """2-D 'SAME' convolution of a single-channel image (H, W)."""
    out = jax.lax.conv_general_dilated(
        img[None, None, :, :],
        kernel[None, None, :, :].astype(img.dtype),
        window_strides=(1, 1),
        padding="SAME",
    )
    return out[0, 0]


_GAUSS5 = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0


def gaussian_blur5(img):
    """Separable 5-tap Gaussian (the classic pyramid smoothing kernel)."""
    img = _conv2d_same(img, _GAUSS5[None, :])
    img = _conv2d_same(img, _GAUSS5[:, None])
    return img


def downsample2(img):
    return img[::2, ::2]


def build_pyramid(img, levels: int = 4) -> List[jnp.ndarray]:
    """Gaussian pyramid, level 0 = full resolution. H, W must be divisible
    by 2^(levels-1) (callers pad KITTI frames up front)."""
    pyr = [img]
    for _ in range(levels - 1):
        pyr.append(downsample2(gaussian_blur5(pyr[-1])))
    return pyr


def scharr_gradients(img):
    """Scharr x/y gradients, 1/32 normalized (cv::Scharr convention)."""
    kx = jnp.array([[-3.0, 0.0, 3.0], [-10.0, 0.0, 10.0], [-3.0, 0.0, 3.0]]) / 32.0
    ky = kx.T
    return _conv2d_same(img, kx), _conv2d_same(img, ky)


def sobel_gradients(img):
    kx = jnp.array([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]]) / 8.0
    ky = kx.T
    return _conv2d_same(img, kx), _conv2d_same(img, ky)


def box_filter(img, size: int):
    k = jnp.ones((size,), img.dtype) / size
    img = _conv2d_same(img, k[None, :])
    img = _conv2d_same(img, k[:, None])
    return img


def bilinear_sample(img, xy):
    """Sample img (H, W) at subpixel locations xy (..., 2) [x, y] with
    border clamping. Returns (...,)."""
    H, W = img.shape
    x = jnp.clip(xy[..., 0], 0.0, W - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    fx = x - x0
    fy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11))


def patch_grid(center, size: int):
    """(size, size, 2) grid of [x, y] coords centered at ``center`` (2,)."""
    offs = jnp.arange(size, dtype=center.dtype) - (size - 1) / 2.0
    gx = center[0] + offs[None, :]
    gy = center[1] + offs[:, None]
    return jnp.stack([jnp.broadcast_to(gx, (size, size)),
                      jnp.broadcast_to(gy, (size, size))], axis=-1)


def sample_patch(img, center, size: int):
    """Bilinear (size, size) patch around subpixel center [x, y]."""
    return bilinear_sample(img, patch_grid(center, size))


def in_bounds(xy, H: int, W: int, margin: float = 1.0):
    return ((xy[..., 0] >= margin) & (xy[..., 0] <= W - 1 - margin)
            & (xy[..., 1] >= margin) & (xy[..., 1] <= H - 1 - margin))


def pad_to_multiple(img, mult: int):
    """Pad H, W up to a multiple (edge mode) so pyramids divide evenly."""
    H, W = img.shape
    ph = (-H) % mult
    pw = (-W) % mult
    if ph or pw:
        img = jnp.pad(img, ((0, ph), (0, pw)), mode="edge")
    return img
