"""Native C++ DCT encoder (native/dct_encoder.cpp) vs the reference
numpy encode: same payload bytes modulo float-roundoff rounding flips,
indistinguishable decodes, and the make_encoder dispatch prefers it."""

import numpy as np
import pytest

from lvio_fusion_tpu.ops.dct import (
    _native_encoder, dct_grid, encode, make_decoder, make_encoder,
)


def _lib_or_skip():
    from lvio_fusion_tpu.datasets.native import get_lib
    lib = get_lib()
    if lib is None or not hasattr(lib, "lvio_dct_encode"):
        pytest.skip("native toolchain unavailable")
    return lib


def _image(H, W, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = (128 + 60 * np.sin(xx * 0.05) * np.cos(yy * 0.08)
           + rng.normal(0, 12, (H, W)))
    return np.clip(img, 0, 255).astype(np.uint8)


@pytest.mark.parametrize("bits", [8, 4])
def test_native_matches_reference_encode(bits):
    _lib_or_skip()
    H, W, K, q = 120, 168, 16, 100
    img = _image(H, W)
    ref = encode(img, K=K, quality=q, bits=bits)
    Hp, Wp, _ = dct_grid(H, W)
    nat = _native_encoder(Hp, Wp, K, q, bits)
    assert nat is not None
    out = nat(img)  # H, W already 8-multiples here
    assert out.shape == ref.shape and out.dtype == ref.dtype
    # float-roundoff can flip a coefficient sitting exactly between two
    # quantization steps; anything beyond rare single-step flips is a bug
    eq = np.mean(out == ref)
    assert eq > 0.995, f"payload agreement {eq}"
    # and the decoded images must be indistinguishable
    import jax.numpy as jnp
    dec = make_decoder(H, W, K, q, bits)
    d_ref = np.asarray(dec(jnp.asarray(ref)))
    d_nat = np.asarray(dec(jnp.asarray(out)))
    assert np.max(np.abs(d_ref - d_nat)) <= 2.0


def test_make_encoder_dispatches_native_and_pads():
    _lib_or_skip()
    H, W = 123, 161  # non-8-multiples: encoder must edge-pad
    enc = make_encoder(H, W, K=16, quality=92, bits=4)
    out = enc(_image(H, W, seed=3))
    ref = encode(_image(H, W, seed=3), K=16, quality=92, bits=4)
    assert out.shape == ref.shape
    assert np.mean(out == ref) > 0.995


def test_native_encoder_speed_info():
    """Informational: encode cost of a KITTI-sized frame (376x1241)."""
    _lib_or_skip()
    import time
    Hp, Wp, _ = dct_grid(376, 1241)
    img = _image(Hp, Wp, seed=1)
    nat = _native_encoder(Hp, Wp, 16, 100, 4)
    nat(img)
    t0 = time.perf_counter()
    for _ in range(5):
        nat(img)
    ms = (time.perf_counter() - t0) / 5 * 1000
    print(f"native DCT encode 376x1241: {ms:.2f} ms/frame")
    assert ms < 100.0
