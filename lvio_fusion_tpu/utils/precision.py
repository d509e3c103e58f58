"""Matmul-precision control for correctness-critical solvers.

TPU matmuls default to bf16 multiplies with f32 accumulation — ~16
mantissa bits lost per operand. That is the right trade for the image
path (LK tent resamples, the one-hot block fetch, DCT decode: bulk MXU
work where throughput is the product), and catastrophically the wrong
one for small stiff normal-equation solves: measured on the axon chip,
the VI-init GN (core/imu_init.py) returned |v| ~ 23 m/s on a
ground-truth 1.4 m/s window at DEFAULT precision while the identical
f32 CPU solve returned 1.65. The suite runs on XLA:CPU (always full
f32), so only on-device runs see the failure — pin solver precision
explicitly rather than relying on the backend.

Usage: decorate the OUTERMOST solver entry (works on plain functions
and around ``jax.jit``-wrapped ones — the context is active while the
function body is traced, which is when precision is baked in).
"""

from __future__ import annotations

import functools

import jax


def f32_solver(fn):
    """Run/trace ``fn`` under full-f32 matmul precision."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
