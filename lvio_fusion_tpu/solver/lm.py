"""Batched Levenberg-Marquardt with Schur-complement landmark elimination.

This replaces Ceres (reference backend.cpp:206-211 SPARSE_SCHUR,
mapping/navsat DENSE_QR solves) with a from-scratch TPU-native solver:

  * fixed iteration counts and fixed shapes (jit-compatible end to end)
  * normal equations assembled as dense blocks — the reduced camera system
    is a few-hundred-dim dense matrix, ideal for the MXU
  * scalar inverse-depth landmarks make the landmark Hessian diagonal, so
    the Schur trick is two matmuls + a broadcast divide
  * damping adapts multiplicatively with accept/reject inside lax.scan

All parameters live in one flat "reduced" vector (poses/velocities/biases,
dimension P = K*S) plus an optional landmark vector (dimension L). Masked
(invalid or fixed) rows are identity-pinned so the Cholesky stays PD.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class BlockSystem(NamedTuple):
    """Gauss-Newton normal equations with diagonal landmark block."""

    Hpp: jnp.ndarray  # (P, P)
    Hpl: jnp.ndarray  # (P, L)
    Hll: jnp.ndarray  # (L,)  diagonal
    bp: jnp.ndarray   # (P,)  = -J^T r (pose part)
    bl: jnp.ndarray   # (L,)
    cost: jnp.ndarray  # scalar 0.5*sum(r^2) (post-robust-weighting)


def pin_invalid(sys: BlockSystem, p_valid, l_valid) -> BlockSystem:
    """Identity-pin masked parameter rows/cols so the solve is well posed."""
    pv = p_valid.astype(sys.Hpp.dtype)
    lv = l_valid.astype(sys.Hll.dtype) if sys.Hll.size else l_valid
    Hpp = sys.Hpp * pv[:, None] * pv[None, :]
    Hpp = Hpp + jnp.diag(1.0 - pv)
    bp = sys.bp * pv
    if sys.Hll.size:
        Hpl = sys.Hpl * pv[:, None] * lv[None, :]
        Hll = sys.Hll * lv + (1.0 - lv)
        bl = sys.bl * lv
    else:
        Hpl, Hll, bl = sys.Hpl, sys.Hll, sys.bl
    return BlockSystem(Hpp, Hpl, Hll, bp, bl, sys.cost)


def schur_solve(sys: BlockSystem, lamb):
    """Solve the damped system, eliminating landmarks first.

    Marquardt-style damping: H += lamb * diag(H) (clamped), keeping the step
    scale-invariant across parameter types.
    """
    dp = jnp.diag(sys.Hpp)
    Hpp = sys.Hpp + jnp.diag(lamb * jnp.maximum(dp, 1e-6))
    if sys.Hll.size:
        Hll = sys.Hll + lamb * jnp.maximum(sys.Hll, 1e-6)
        Hll_safe = jnp.where(Hll > 1e-10, Hll, 1.0)
        inv_Hll = 1.0 / Hll_safe
        # reduced camera system: Hred = Hpp - Hpl diag(1/Hll) Hlp
        W = sys.Hpl * inv_Hll[None, :]
        Hred = Hpp - W @ sys.Hpl.T
        bred = sys.bp - W @ sys.bl
    else:
        Hred, bred, inv_Hll = Hpp, sys.bp, None

    # Jacobi preconditioning: mixed factor stiffness (IMU sqrt-info ~1e4 vs
    # visual ~1) gives cond(H) ~ 1e8, beyond f32 Cholesky. Rescaling to unit
    # diagonal restores solvability without f64.
    d = jnp.sqrt(jnp.maximum(jnp.diag(Hred), 1e-12))
    Hs = Hred / d[:, None] / d[None, :]
    bs = bred / d

    # dense Cholesky on the reduced system (MXU-friendly)
    eye = jnp.eye(Hs.shape[0], dtype=Hs.dtype)
    chol = jnp.linalg.cholesky(Hs + 1e-6 * eye)
    dxp = jax.scipy.linalg.cho_solve((chol, True), bs) / d
    # guard: if Cholesky failed (non-PD), fall back to zero step
    bad = jnp.any(jnp.isnan(chol))
    dxp = jnp.where(bad, jnp.zeros_like(dxp), dxp)

    if sys.Hll.size:
        dxl = inv_Hll * (sys.bl - sys.Hpl.T @ dxp)
        dxl = jnp.where(bad, jnp.zeros_like(dxl), dxl)
    else:
        dxl = jnp.zeros_like(sys.Hll)
    return dxp, dxl


class LMResult(NamedTuple):
    params: object
    cost: jnp.ndarray
    lamb: jnp.ndarray


def lm_solve(
    params,
    build_fn: Callable,      # params -> BlockSystem (already pinned)
    retract_fn: Callable,    # (params, dxp, dxl) -> params
    cost_fn: Callable,       # params -> scalar
    num_iters: int = 8,
    init_lamb: float = 1e-4,
) -> LMResult:
    """Fixed-iteration damped LM loop (jit/scan friendly).

    Per iteration: linearize, Schur-solve, retract, accept if the cost
    dropped, adapt damping. The build/cost functions close over the factor
    tables; everything is fixed shape.

    All matmuls traced in the loop (factor jacfwd, normal-equation
    assembly, the Schur solve) run at FULL f32 multiply precision: TPU's
    default bf16 multiplies lose ~16 mantissa bits per operand, which a
    stiff mixed-factor window cannot afford (measured catastrophic on
    the VI-init solve, core/imu_init.py). The window system is tiny
    next to the image-path work, so the extra MXU passes are free.
    """
    with jax.default_matmul_precision("highest"):
        return _lm_solve_impl(params, build_fn, retract_fn, cost_fn,
                              num_iters, init_lamb)


def _lm_solve_impl(params, build_fn, retract_fn, cost_fn, num_iters,
                   init_lamb):

    def step(carry, _):
        p, lamb, cost = carry
        sys = build_fn(p)
        dxp, dxl = schur_solve(sys, lamb)
        cand = retract_fn(p, dxp, dxl)
        new_cost = cost_fn(cand)
        accept = (new_cost < cost) & jnp.isfinite(new_cost)
        p = jax.tree.map(
            lambda a, b: jnp.where(accept, b, a), p, cand
        )
        cost = jnp.where(accept, new_cost, cost)
        lamb = jnp.where(accept, jnp.maximum(lamb * 0.3, 1e-9),
                         jnp.minimum(lamb * 5.0, 1e6))
        return (p, lamb, cost), cost

    cost0 = cost_fn(params)
    (p, lamb, cost), _ = jax.lax.scan(
        step, (params, jnp.asarray(init_lamb, dtype=jnp.float32), cost0),
        None, length=num_iters)
    return LMResult(p, cost, lamb)
