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


def _sep_h(img, taps):
    """Horizontal 1-D filter via shift-and-add (zero 'SAME' padding).

    XLA's conv path is catastrophically slow for single-channel images on
    TPU (~25 ms per 5-tap blur at KITTI size); shifted slice adds are pure
    VPU elementwise work (<1 ms).
    """
    k = len(taps)
    pad = k // 2
    W = img.shape[1]
    xp = jnp.pad(img, ((0, 0), (pad, pad)))
    out = taps[0] * xp[:, 0:W]
    for i in range(1, k):
        out = out + taps[i] * xp[:, i:i + W]
    return out


def _sep_v(img, taps):
    k = len(taps)
    pad = k // 2
    H = img.shape[0]
    xp = jnp.pad(img, ((pad, pad), (0, 0)))
    out = taps[0] * xp[0:H, :]
    for i in range(1, k):
        out = out + taps[i] * xp[i:i + H, :]
    return out


def sep_filter(img, taps_x, taps_y):
    """Separable 2-D filter: taps_y applied vertically, taps_x
    horizontally (correlation orientation, matching 'SAME' zero-pad
    convolution of the symmetric/antisymmetric kernels used here)."""
    return _sep_v(_sep_h(img, taps_x), taps_y)


_GAUSS5 = (1 / 16.0, 4 / 16.0, 6 / 16.0, 4 / 16.0, 1 / 16.0)


def gaussian_blur5(img):
    """Separable 5-tap Gaussian (the classic pyramid smoothing kernel)."""
    return sep_filter(img, _GAUSS5, _GAUSS5)


def downsample2(img):
    return img[::2, ::2]


from functools import lru_cache as _lru_cache


@_lru_cache(maxsize=None)
def _pyr_mats(H: int, W: int):
    """Banded blur+downsample operators: (T @ img) @ S equals
    downsample2(gaussian_blur5(img)) to fp rounding (same taps, same
    zero-pad 'SAME' semantics). One level transition becomes two MXU
    matmuls instead of ten strided VPU passes. Not the build_pyramid
    default: in-batch pyramid compute is ~1 ms/frame (the 4 ms single
    dispatch measurement was relay call tax), and the ~1e-7 output
    differences butterfly keyframe cadence on marginal sequences."""
    import numpy as np
    taps = _GAUSS5
    T = np.zeros((H // 2, H), np.float32)
    S = np.zeros((W, W // 2), np.float32)
    for k in range(5):
        for i in range(H // 2):
            r = 2 * i + k - 2
            if 0 <= r < H:
                T[i, r] += taps[k]
        for j in range(W // 2):
            c = 2 * j + k - 2
            if 0 <= c < W:
                S[c, j] += taps[k]
    # numpy, NOT jnp: the cache outlives any jit trace this is first
    # called under (a cached tracer would leak out of its trace)
    return T, S


def blur_downsample2(img):
    """Fused 5-tap Gaussian blur + 2x decimation as banded matmuls."""
    T, S = _pyr_mats(img.shape[0], img.shape[1])
    return (jnp.asarray(T) @ img) @ jnp.asarray(S)


def build_pyramid(img, levels: int = 4) -> List[jnp.ndarray]:
    """Gaussian pyramid, level 0 = full resolution. H, W must be divisible
    by 2^(levels-1) (callers pad KITTI frames up front).

    The column decimation happens BETWEEN the separable passes: the
    vertical filter is per-column, so dropping the discarded columns
    first is bit-identical to blurring everything and decimating after
    (asserted on-chip, r7) while halving the vertical pass and its
    intermediate."""
    pyr = [img]
    for _ in range(levels - 1):
        half = _sep_h(pyr[-1], _GAUSS5)[:, ::2]
        pyr.append(_sep_v(half, _GAUSS5)[::2, :])
    return pyr


def scharr_gradients(img):
    """Scharr x/y gradients, 1/32 normalized (cv::Scharr convention)."""
    d = (-1.0 / 32, 0.0, 1.0 / 32)
    s = (3.0, 10.0, 3.0)
    return sep_filter(img, d, s), sep_filter(img, s, d)


def sobel_gradients(img):
    d = (-1.0 / 8, 0.0, 1.0 / 8)
    s = (1.0, 2.0, 1.0)
    return sep_filter(img, d, s), sep_filter(img, s, d)


def box_filter(img, size: int):
    taps = (1.0 / size,) * size
    return sep_filter(img, taps, taps)


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


def extract_patch(img, center, size: int):
    """Bilinear (size, size) patch via ONE dynamic_slice + 4-tap mix.

    TPU-friendly: a vmapped dynamic_slice lowers to a gather of contiguous
    2-D blocks instead of size^2 scalar gathers (the pointwise
    bilinear_sample path is an order of magnitude slower on TPU).
    dynamic_slice clamps out-of-range starts; callers must bounds-check
    separately (LK already gates with in_bounds).
    """
    half = (size - 1) / 2.0
    cx = center[0] - half
    cy = center[1] - half
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    fx = (cx - x0).astype(img.dtype)
    fy = (cy - y0).astype(img.dtype)
    blk = jax.lax.dynamic_slice(
        img, (y0.astype(jnp.int32), x0.astype(jnp.int32)),
        (size + 1, size + 1))
    top = (1 - fx) * blk[:-1, :-1] + fx * blk[:-1, 1:]
    bot = (1 - fx) * blk[1:, :-1] + fx * blk[1:, 1:]
    return (1 - fy) * top + fy * bot


def in_bounds(xy, H: int, W: int, margin: float = 1.0):
    return ((xy[..., 0] >= margin) & (xy[..., 0] <= W - 1 - margin)
            & (xy[..., 1] >= margin) & (xy[..., 1] <= H - 1 - margin))


def make_undistort_map(cam, H: int, W: int):
    """Precompute the undistortion remap grid for a camera with
    radial-tangential distortion (cv::undistort semantics,
    reference estimator.cpp undistort maps).

    Returns (H, W, 2) [x, y] source coordinates: the undistorted image at
    pixel p samples the raw image at map[p]."""
    yy = jnp.arange(H, dtype=jnp.float32)
    xx = jnp.arange(W, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xx, yy)
    f = jnp.stack([cam.fx, cam.fy])
    c = jnp.stack([cam.cx, cam.cy])
    norm = (jnp.stack([gx, gy], -1) - c) / f
    dist = cam.distort(norm)
    return dist * f + c


def make_undistorter(cam_left, cam_right, H: int, W: int):
    """Jitted raw-u8 undistortion for a stereo pair (maps precomputed
    once; shared across Estimator instances with the same cameras —
    utils/memo.py)."""
    maps = (make_undistort_map(cam_left, H, W),
            make_undistort_map(cam_right, H, W))

    @jax.jit
    def undistort_u8(img_u8, which):
        img = img_u8.astype(jnp.float32)
        out = jnp.where(which == 0,
                        undistort_image(img, maps[0]),
                        undistort_image(img, maps[1]))
        return jnp.clip(out, 0, 255).astype(jnp.uint8)

    return undistort_u8


from lvio_fusion_tpu.utils.memo import builder_memo

make_undistorter = builder_memo(make_undistorter)


def undistort_image(img, umap):
    """Apply a precomputed undistortion map (bilinear)."""
    return bilinear_sample(img, umap)


def equalize_hist(img_u8):
    """Global histogram equalization of a uint8 image (the reference
    equalizes every incoming frame before tracking,
    lvio_fusion_node.cpp:94 cv::equalizeHist). Fixed-shape: one 256-bin
    scatter-add + cumsum + LUT gather, fused into whichever jitted frame
    program calls it — no extra dispatch.

    lut[v] = round(255 * (cdf[v] - cdf_min) / (N - cdf_min)), cdf_min the
    cdf at the darkest occupied bin (OpenCV semantics: darkest pixel
    maps to 0, full dynamic range restored on low-contrast imagery)."""
    flat = img_u8.reshape(-1)
    n = flat.shape[0]
    hist = jnp.zeros(256, jnp.int32).at[flat.astype(jnp.int32)].add(1)
    cdf = jnp.cumsum(hist)
    cdf_min = jnp.min(jnp.where(hist > 0, cdf, n))
    denom = jnp.maximum(n - cdf_min, 1).astype(jnp.float32)
    lut = jnp.clip(jnp.round(
        (cdf - cdf_min).astype(jnp.float32) * (255.0 / denom)), 0, 255)
    return lut.astype(jnp.uint8)[img_u8.astype(jnp.int32)]


def pad_to_multiple(img, mult: int):
    """Pad H, W up to a multiple (edge mode) so pyramids divide evenly."""
    H, W = img.shape
    ph = (-H) % mult
    pw = (-W) % mult
    if ph or pw:
        img = jnp.pad(img, ((0, ph), (0, pw)), mode="edge")
    return img
