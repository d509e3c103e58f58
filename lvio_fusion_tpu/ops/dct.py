"""DCT-compressed image upload: host-side 8x8 block encode, on-device decode.

Why this exists: the TPU can sit behind a low-bandwidth tunnel (measured
~11-17 MB/s on the axon relay), and raw uint8 KITTI frames (467 KB each)
are by far the largest per-frame transfer — the measured throughput
ceiling of the whole pipeline is the image upload, not device compute.
This module moves the bits efficiently: the host performs a JPEG-style
8x8 DCT + quantization and keeps only the first K zigzag coefficients
(the entropy-coding role); the device dequantizes and runs the inverse
DCT as two batched 8x8 matmuls fused into the existing frame program
(the transform role — MXU-friendly, zero extra dispatches). K=16 at
quality 92 cuts upload bytes ~3.7x with sub-pixel-level tracking impact
(see tests/test_dct.py).

This mirrors how a production remote-TPU deployment would feed cameras:
sensor-side lossy encode, accelerator-side decode. The reference has no
counterpart (its camera feed is in-process ROS shared memory); the
uncompressed path remains the default and the flag is explicit
(EstimatorConfig.dct_k).

All functions are shape-static: for an (H, W) image padded to 8-multiples
there are nb = (H/8)*(W/8) blocks, and the payload is ONE (nb, K+2) int8
array per image (a single device_put — the relay charges per call):
  col 0:2   — quantized DC coefficient as little-endian int16 bytes
  col 2:K+1 — quantized AC coefficients in zigzag order (int8)
  col K+1   — per-block AC scale multiplier (uint8 bits; 1 for almost
              all blocks, >1 only where a coefficient would clip the
              int8 range, keeping high-contrast blocks faithful)
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# constants

# type-II orthonormal DCT matrix D (8x8): coeffs = D @ block @ D.T
_D8 = np.zeros((8, 8), np.float64)
for _k in range(8):
    for _n in range(8):
        _D8[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0)
_D8 *= np.sqrt(2.0 / 8.0)
_D8[0] *= np.sqrt(0.5)
_D8 = _D8.astype(np.float32)

# standard JPEG luminance quantization table (row-major 8x8)
_QTABLE = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], np.float32)

# zigzag scan order: zigzag[i] = flat row-major index of the i-th coeff
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    np.int64)


@lru_cache(maxsize=None)
def _qvec(quality: int):
    """Quantization steps in zigzag order at a libjpeg-style quality."""
    q = max(1, min(100, int(quality)))
    scale = 5000.0 / q if q < 50 else 200.0 - 2.0 * q
    qt = np.clip(np.floor((_QTABLE * scale + 50.0) / 100.0), 1, 255)
    return qt.reshape(-1)[_ZIGZAG].astype(np.float32)


def dct_grid(H: int, W: int):
    """Padded shape + block count for an (H, W) image."""
    Hp = ((H + 7) // 8) * 8
    Wp = ((W + 7) // 8) * 8
    return Hp, Wp, (Hp // 8) * (Wp // 8)


def pack_payload(dc, ac, sc) -> np.ndarray:
    """(dc int16, ac int8, sc uint8) -> one (nb, K+2) int8 payload."""
    nb, K1 = ac.shape
    out = np.empty((nb, K1 + 3), np.int8)
    out[:, 0:2] = dc.astype("<i2").view(np.uint8).reshape(nb, 2) \
                    .view(np.int8)
    out[:, 2:K1 + 2] = ac
    out[:, K1 + 2] = sc.view(np.int8)
    return out


def encode(img_u8: np.ndarray, K: int = 16, quality: int = 92,
           bits: int = 8):
    """Host-side encode of a uint8 image -> (nb, 2 + ac_bytes + 1) int8
    payload. Pads H/W to 8-multiples with edge values (the decoded image
    comes back at the padded shape, matching the pyramid padding the
    frame programs apply anyway). ``bits`` = 4 nibble-packs the AC
    coefficients two per byte (the per-block scale absorbs the coarser
    range) — ~40% fewer upload bytes for a slightly noisier decode."""
    H, W = img_u8.shape
    Hp, Wp, _ = dct_grid(H, W)
    img = np.asarray(img_u8, np.float32)
    if Hp != H or Wp != W:
        img = np.pad(img, ((0, Hp - H), (0, Wp - W)), mode="edge")
    # (nb, 8, 8) blocks, row-major over the block grid
    blk = (img.reshape(Hp // 8, 8, Wp // 8, 8)
           .transpose(0, 2, 1, 3).reshape(-1, 8, 8))
    coef = _D8 @ (blk - 128.0) @ _D8.T           # (nb, 8, 8)
    zz = coef.reshape(-1, 64)[:, _ZIGZAG[:K]]     # zigzag prefix
    qz = zz / _qvec(quality)[:K]
    dc = np.clip(np.rint(qz[:, 0]), -32768, 32767).astype(np.int16)
    # per-block AC scale: smallest integer that brings every kept AC
    # coefficient into range (1 almost everywhere at 8 bits)
    lim = 127.0 if bits == 8 else 7.0
    peak = np.abs(qz[:, 1:]).max(axis=1) if K > 1 \
        else np.zeros(len(qz), np.float32)
    sc = np.clip(np.ceil(peak / lim), 1, 255).astype(np.uint8)
    ac = np.clip(np.rint(qz[:, 1:] / sc[:, None]), -lim, lim)
    if bits == 4:
        ac = _nibble_pack(ac.astype(np.int8))
    return pack_payload(dc, ac.astype(np.int8), sc)


def _nibble_pack(ac: np.ndarray) -> np.ndarray:
    """(nb, K-1) int4-valued int8 -> (nb, ceil((K-1)/2)) packed bytes."""
    nb, n = ac.shape
    if n % 2:
        ac = np.concatenate([ac, np.zeros((nb, 1), np.int8)], axis=1)
    lo = ac[:, 0::2].astype(np.uint8) & 0xF
    hi = ac[:, 1::2].astype(np.uint8) & 0xF
    return ((hi << 4) | lo).astype(np.int8)


def ac_bytes(K: int, bits: int = 8) -> int:
    """Payload bytes holding the K-1 AC coefficients."""
    return (K - 1) if bits == 8 else (K - 1 + 1) // 2


def make_decoder(H: int, W: int, K: int = 16, quality: int = 92,
                 bits: int = 8):
    """Build the jit-traceable decoder: (nb, 2 + ac_bytes + 1) int8
    payload -> (Hp, Wp) f32 image in [0, 255]. Meant to be CALLED INSIDE
    an existing jitted program (the frame step) so decoding adds zero
    dispatches. ``bits`` = 4 reads nibble-packed AC coefficients (two per
    byte, see ``encode``'s int4 mode)."""
    Hp, Wp, nb = dct_grid(H, W)
    # Fold dequantization + inverse zigzag + 2-D IDCT into ONE (K, 64)
    # matrix: img_blk = D.T @ coef @ D is linear in the coefficients, so
    # vec(img_blk) = vec(coef) @ kron(D, D) (row-major vecs). The tiny
    # batched 8x8 matmuls underuse the MXU; a single (nb, K) @ (K, 64)
    # contraction is one well-shaped matmul.
    scatter = np.zeros((K, 64), np.float32)
    scatter[np.arange(K), _ZIGZAG[:K]] = 1.0
    M = jnp.asarray(
        (_qvec(quality)[:K, None] * scatter
         @ np.kron(_D8, _D8).astype(np.float64)).astype(np.float32))

    def _u8(col):
        """Unsigned value of an int8 column."""
        v = col.astype(jnp.int32)
        return jnp.where(v < 0, v + 256, v)

    nac = ac_bytes(K, bits)

    def decode(payload):
        p = payload.astype(jnp.int32)
        dc = p[:, 1] * 256 + _u8(payload[:, 0])     # signed hi, unsigned lo
        if bits == 8:
            ac = p[:, 2:K + 1].astype(jnp.float32)
        else:
            # nibble-packed: byte j holds AC 2j (lo) and 2j+1 (hi),
            # each a signed 4-bit value in [-8, 7]
            by = _u8(payload[:, 2:2 + nac])
            lo = by & 0xF
            hi = (by >> 4) & 0xF
            lo = lo - 16 * (lo >= 8)
            hi = hi - 16 * (hi >= 8)
            ac = jnp.stack([lo, hi], axis=-1).reshape(
                payload.shape[0], 2 * nac)[:, :K - 1].astype(jnp.float32)
        s = _u8(payload[:, 2 + nac]).astype(jnp.float32)[:, None]
        zz = jnp.concatenate(
            [dc.astype(jnp.float32)[:, None], ac * s], axis=1)
        img = zz @ M + 128.0                        # (nb, 64) pixels
        img = (img.reshape(Hp // 8, Wp // 8, 8, 8)
               .transpose(0, 2, 1, 3).reshape(Hp, Wp))
        return jnp.clip(img, 0.0, 255.0)

    return decode


def payload_bytes(H: int, W: int, K: int = 16, bits: int = 8) -> int:
    """Upload bytes per frame at this (H, W, K, bits)."""
    _, _, nb = dct_grid(H, W)
    return nb * (2 + ac_bytes(K, bits) + 1)


@lru_cache(maxsize=None)
def _cpu_encode_fn(Hp: int, Wp: int, K: int, quality: int, bits: int = 8):
    """Jitted XLA-CPU encode program (the pure-numpy ``encode`` costs
    ~20 ms per KITTI frame; the jitted program ~6 ms, and it releases
    the GIL so a small thread pool overlaps the per-frame encodes)."""
    import jax

    qv = jnp.asarray(_qvec(quality)[:K])
    Dj = jnp.asarray(_D8)
    zz_idx = jnp.asarray(_ZIGZAG[:K])
    lim = 127.0 if bits == 8 else 7.0

    def _i8(v):
        """int8 with two's-complement wrap of a [0, 255] int32 value."""
        return jnp.where(v >= 128, v - 256, v).astype(jnp.int8)

    def enc(img_u8):
        img = img_u8.astype(jnp.float32)
        blk = (img.reshape(Hp // 8, 8, Wp // 8, 8)
               .transpose(0, 2, 1, 3).reshape(-1, 8, 8))
        coef = Dj @ (blk - 128.0) @ Dj.T
        zzc = coef.reshape(-1, 64)[:, zz_idx] / qv
        dci = jnp.clip(jnp.rint(zzc[:, 0]), -32768, 32767).astype(jnp.int32)
        peak = jnp.max(jnp.abs(zzc[:, 1:]), axis=1)
        sci = jnp.clip(jnp.ceil(peak / lim), 1, 255).astype(jnp.int32)
        ac = jnp.clip(jnp.rint(zzc[:, 1:] / sci[:, None].astype(jnp.float32)),
                      -lim, lim).astype(jnp.int32)
        if bits == 4:
            n = K - 1
            if n % 2:
                ac = jnp.concatenate(
                    [ac, jnp.zeros((ac.shape[0], 1), jnp.int32)], axis=1)
            acl = ac[:, 0::2] & 0xF
            ach = ac[:, 1::2] & 0xF
            ac_b = _i8((ach << 4) | acl)
        else:
            ac_b = ac.astype(jnp.int8)
        lo = _i8(dci & 0xFF)
        hi = _i8((dci >> 8) & 0xFF)
        return jnp.concatenate(
            [lo[:, None], hi[:, None], ac_b, _i8(sci)[:, None]], axis=1)

    cpu = jax.devices("cpu")[0]
    return jax.jit(enc, device=cpu)


def _native_encoder(Hp: int, Wp: int, K: int, quality: int, bits: int):
    """C++ encoder (native/dct_encoder.cpp) or None: same payload as
    :func:`encode`, no XLA dispatch, GIL released for the whole call."""
    try:
        from lvio_fusion_tpu.datasets.native import get_lib
        lib = get_lib()
        if lib is None or not hasattr(lib, "lvio_dct_encode"):
            return None
    except Exception:
        return None
    import ctypes

    qv = np.ascontiguousarray(_qvec(quality)[:K], np.float32)
    nb = (Hp // 8) * (Wp // 8)
    row = 2 + ac_bytes(K, bits) + 1

    def encode_native(img_u8):
        img = np.ascontiguousarray(img_u8, np.uint8)
        out = np.empty((nb, row), np.int8)
        n = lib.lvio_dct_encode(
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), Hp, Wp,
            qv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), K, bits,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_byte)))
        if n != nb:
            raise RuntimeError(f"native dct encode failed: {n}")
        return out

    return encode_native


def make_encoder(H: int, W: int, K: int = 16, quality: int = 92,
                 bits: int = 8):
    """Fast host-side encoder: fn(u8 (H, W)) -> (nb, 2+ac_bytes+1) int8
    payload. Prefers the native C++ encoder (same payload as
    :func:`encode`, zero XLA dispatch); falls back to one jitted XLA-CPU
    program where no toolchain is available. Both release the GIL so a
    small thread pool overlaps per-frame encodes."""
    Hp, Wp, _ = dct_grid(H, W)
    native = _native_encoder(Hp, Wp, K, quality, bits)
    fn = None if native else _cpu_encode_fn(Hp, Wp, K, quality, bits)

    def encode_fast(img_u8):
        img = np.asarray(img_u8)
        if img.shape != (Hp, Wp):
            img = np.pad(img, ((0, Hp - img.shape[0]),
                               (0, Wp - img.shape[1])), mode="edge")
        return native(img) if native else np.asarray(fn(img))

    return encode_fast
