"""Solver matmul-precision pinning (utils/precision.py).

TPU matmuls default to bf16 multiplies; every normal-equation solver
must trace under full-f32 precision (measured failure: the VI-init GN
fitted |v| ~ 23 m/s to a ground-truth 1.4 m/s window on-chip — see
core/imu_init.py). XLA:CPU always computes f32, so this suite can only
assert the WIRING (the context is active where it must be), not the
numeric failure itself; the on-chip guards are misc/long_multiloop_gate
and misc/bench_ate.
"""

import jax
import jax.numpy as jnp
import numpy as np

from lvio_fusion_tpu.utils.precision import f32_solver


def _current_precision():
    return jax.config.jax_default_matmul_precision


def test_f32_solver_sets_highest_inside():
    seen = {}

    @f32_solver
    def probe(x):
        seen["p"] = _current_precision()
        return x * 2

    before = _current_precision()
    assert probe(3) == 6
    assert seen["p"] == "highest"
    assert _current_precision() == before  # restored outside


def test_f32_solver_active_during_jit_trace():
    seen = {}

    @f32_solver
    @jax.jit
    def probe(x):
        seen["p"] = _current_precision()
        return x + 1

    probe(jnp.ones(3))
    assert seen["p"] == "highest"


def test_solver_entries_are_wrapped():
    """The correctness-critical solver entries must trace under the
    pinned precision. Each is probed by intercepting what the precision
    config reads as during its trace (via a tiny traced callback is not
    possible — instead assert the closure structure: the public entry
    must not BE the implementation, i.e. the wrapper layer exists)."""
    from lvio_fusion_tpu.core import frontend, imu_init
    from lvio_fusion_tpu.lidar import mapping
    from lvio_fusion_tpu.solver import lm

    # split-impl pattern: entry delegates to _impl under the context
    assert imu_init.inertial_init is not imu_init._inertial_init_impl
    assert lm.lm_solve is not lm._lm_solve_impl
    assert mapping._masked_gn is not mapping._masked_gn_impl
    assert frontend.pose_only_refine is not frontend._pose_only_refine_impl

    # decorator pattern: __wrapped__ chain reaches the raw function
    from lvio_fusion_tpu.adapt import environment
    from lvio_fusion_tpu.navsat import navsat
    from lvio_fusion_tpu.ops import stereo
    for fn in (stereo.triangulate, environment._solve_one,
               navsat._init_refine, navsat._bc_solve, navsat._ab_solve):
        assert hasattr(fn, "__wrapped__"), fn


def test_inertial_init_numerics_on_cpu():
    """The solve itself (under the pinned precision) recovers a
    constant-twist window's velocity: the exact probe that exposed the
    on-chip failure, kept as the CPU-side regression anchor."""
    from lvio_fusion_tpu.core.imu_init import inertial_init
    from lvio_fusion_tpu.datasets.synthetic import make_sequence
    from lvio_fusion_tpu.ops.imu_preint import preintegrate

    seq = make_sequence(num_frames=30, H=120, W=160, num_points=200,
                        seed=21, speed=1.4, closed_loop=True,
                        loop_turns=2.4 * 30 / 520.0, with_imu=True,
                        imu_rate=200.0)
    kf_frames = list(range(0, 24, 3))
    kf_times = [seq.frames[i].time for i in kf_frames]
    poses = jnp.asarray(np.stack([seq.gt_poses[i] for i in kf_frames]))
    pres = []
    for a, b in zip(kf_times[:-1], kf_times[1:]):
        m = (seq.imu_times > a) & (seq.imu_times <= b)
        idx = np.where(m)[0]
        ts = np.concatenate([[a], seq.imu_times[idx]])
        dts = np.diff(ts).astype(np.float32)
        pres.append(preintegrate(
            jnp.asarray(seq.imu_acc[idx], jnp.float32),
            jnp.asarray(seq.imu_gyr[idx], jnp.float32),
            jnp.asarray(dts), jnp.zeros(3), jnp.zeros(3),
            0.1, 0.01, 1e-3, 1e-4))
    pre = jax.tree.map(lambda *xs: jnp.stack(xs), *pres)
    init = inertial_init(poses, pre, jnp.float32(9.81007),
                         prior_bg=1.0, prior_ba=10.0)
    v = float(jnp.linalg.norm(init.vel[0]))
    assert 1.0 < v < 2.2, f"VI-init velocity {v} vs true 1.4 m/s"
    assert float(jnp.linalg.norm(init.bg)) < 0.02
