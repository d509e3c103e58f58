"""Pallas TPU kernel: batched 3-nearest-neighbor search.

The hot association op of the lidar backend (scan-to-map correspondences,
mapping.cpp's kd-tree queries): for N query points against an M-point map,
return the 3 smallest squared distances + indices per query.

Kernel shape: grid over query tiles; the map lives in VMEM transposed to
(3, M) (lane-major) so the distance block is one MXU-friendly contraction
per tile; the top-3 reduction is three masked min/argmin passes over the
distance block (top_k isn't available inside Mosaic). Falls back to the
XLA formulation (matmul + lax.top_k) off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30


def _knn3_kernel(qt_ref, mt_ref, valid_ref, dist_ref, idx_ref):
    # qt: (3, TQ) query tile (transposed); mt: (3, M); valid: (1, M)
    qt = qt_ref[:]          # (3, TQ)
    mt = mt_ref[:]          # (3, M)
    q2 = jnp.sum(qt * qt, axis=0)[:, None]      # (TQ, 1)
    m2 = jnp.sum(mt * mt, axis=0)[None, :]      # (1, M)
    cross = jax.lax.dot_general(
        qt, mt, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)      # (TQ, M)
    d2 = q2 - 2.0 * cross + m2
    d2 = jnp.where(valid_ref[:] > 0.5, d2, _BIG)

    M = d2.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    for k in range(3):
        dmin = jnp.min(d2, axis=1, keepdims=True)            # (TQ, 1)
        is_min = d2 <= dmin
        imin = jnp.min(jnp.where(is_min, col, M), axis=1,
                       keepdims=True)                         # (TQ, 1)
        dist_ref[:, k:k + 1] = dmin
        idx_ref[:, k:k + 1] = imin
        # mask the winner out for the next pass
        d2 = jnp.where(col == imin, _BIG, d2)


def _pad_to(x, n, axis, fill=0.0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=fill)


@functools.partial(jax.jit, static_argnames=("interpret",))
def knn3_pallas(query, map_pts, map_valid, interpret: bool = False):
    """(N, 3) queries x (M, 3) map -> (dist2 (N, 3), idx (N, 3))."""
    N = query.shape[0]
    M = map_pts.shape[0]
    TQ = 256
    Np = ((N + TQ - 1) // TQ) * TQ
    Mp = ((M + 127) // 128) * 128

    qt = _pad_to(query, Np, 0).T                       # (3, Np)
    mt = _pad_to(map_pts, Mp, 0).T                     # (3, Mp)
    mv = _pad_to(map_valid.astype(jnp.float32), Mp, 0)[None, :]  # (1, Mp)

    grid = (Np // TQ,)
    dist, idx = pl.pallas_call(
        _knn3_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, TQ), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, Mp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TQ, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TQ, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, 3), jnp.float32),
            jax.ShapeDtypeStruct((Np, 3), jnp.int32),
        ],
        interpret=interpret,
    )(qt, mt, mv)
    return dist[:N], jnp.minimum(idx[:N], M - 1)


def knn3_xla(query, map_pts, map_valid):
    """XLA fallback: matmul distance matrix + top_k."""
    d2 = (jnp.sum(query ** 2, -1, keepdims=True)
          - 2.0 * query @ map_pts.T
          + jnp.sum(map_pts ** 2, -1)[None, :])
    d2 = jnp.where(map_valid[None, :], d2, _BIG)
    neg, idx = jax.lax.top_k(-d2, 3)
    return -neg, idx


def knn3(query, map_pts, map_valid):
    """Dispatch: Pallas kernel on TPU, XLA elsewhere."""
    if jax.default_backend() in ("tpu", "axon"):
        return knn3_pallas(query, map_pts, map_valid)
    return knn3_xla(query, map_pts, map_valid)
