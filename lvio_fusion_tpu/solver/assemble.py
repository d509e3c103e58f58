"""Scatter-add assembly of per-factor blocks into Gauss-Newton normal
equations (BlockSystem).

Every factor type linearizes (via vmapped jacfwd) into:
  * residual (F, r)
  * one or two keyframe-state Jacobian blocks (F, r, S) with kf indices
  * optionally a scalar-landmark Jacobian (F, r) with landmark indices
and this module accumulates them into Hpp/(K,K,S,S), Hpl/(K,S,L), Hll/(L,),
bp/(K,S), bl/(L,) using XLA scatter-adds — the TPU-native replacement for
Ceres' sparse block assembly (reference adapt/problem.h + backend.cpp:96-183).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax.numpy as jnp

from lvio_fusion_tpu.solver.lm import BlockSystem


class Contribution(NamedTuple):
    r: jnp.ndarray                      # (F, rdim) residuals (robust-scaled)
    pose_idx: Tuple[jnp.ndarray, ...]   # each (F,) int32 kf indices
    pose_jacs: Tuple[jnp.ndarray, ...]  # each (F, rdim, S)
    lm_idx: Optional[jnp.ndarray]       # (F,) int32 or None
    lm_jac: Optional[jnp.ndarray]       # (F, rdim) or None
    valid: jnp.ndarray                  # (F,) bool


def assemble(contribs: Sequence[Contribution], K: int, S: int, L: int,
             dtype=jnp.float32) -> BlockSystem:
    Hpp = jnp.zeros((K, K, S, S), dtype)
    Hpl = jnp.zeros((K, S, L), dtype) if L else jnp.zeros((K * S, 0), dtype)
    Hll = jnp.zeros((L,), dtype)
    bp = jnp.zeros((K, S), dtype)
    bl = jnp.zeros((L,), dtype)
    cost = jnp.zeros((), dtype)

    for c in contribs:
        v = c.valid.astype(dtype)[:, None]
        r = c.r * v
        jacs = [j * v[..., None] for j in c.pose_jacs]
        cost = cost + 0.5 * jnp.sum(r * r)

        for idx_a, Ja in zip(c.pose_idx, jacs):
            # gradient:  bp -= Ja^T r   (b is defined as -J^T r)
            bp = bp.at[idx_a].add(-jnp.einsum("frs,fr->fs", Ja, r))
            for idx_b, Jb in zip(c.pose_idx, jacs):
                Hpp = Hpp.at[idx_a, idx_b].add(
                    jnp.einsum("frs,frt->fst", Ja, Jb))

        if c.lm_jac is not None and L:
            Jl = c.lm_jac * v
            Hll = Hll.at[c.lm_idx].add(jnp.sum(Jl * Jl, axis=-1))
            bl = bl.at[c.lm_idx].add(-jnp.sum(Jl * r, axis=-1))
            for idx_a, Ja in zip(c.pose_idx, jacs):
                blk = jnp.einsum("frs,fr->fs", Ja, Jl)  # (F, S)
                # scatter into (K, S, L): rows idx_a, col lm_idx
                Hpl = Hpl.at[idx_a, :, c.lm_idx].add(blk)

    P = K * S
    sys = BlockSystem(
        Hpp=jnp.transpose(Hpp, (0, 2, 1, 3)).reshape(P, P),
        Hpl=Hpl.reshape(P, L) if L else jnp.zeros((P, 0), dtype),
        Hll=Hll,
        bp=bp.reshape(P),
        bl=bl,
        cost=cost,
    )
    return sys
