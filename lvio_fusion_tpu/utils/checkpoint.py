"""Estimator state checkpoint/resume.

The reference has NO persistence at all (a killed lvio_fusion run loses
the map); this is an additive capability: the whole host-side SLAM state
— map store, tracker, IMU chain, lidar world clouds, navsat alignment,
pose-graph sections, pending loop candidates — round-trips through one
pickle file, versioned and config-checked. Device state is NOT saved:
every jitted program re-seeds from the host map on the next frame
(`Estimator._sync_device_state`), so a resumed run continues exactly
where the saved one stopped.

Format: a dict {"version", "config", "map", "state"} where all leaves are
numpy arrays / plain Python containers (no JAX types).
"""

from __future__ import annotations

import pickle

import numpy as np

VERSION = 1

# config fields that shape the jitted programs / capacities: a checkpoint
# can only resume into an estimator compiled for the same geometry
_SHAPE_FIELDS = (
    "height", "width", "num_features", "levels", "window_kfs",
    "landmark_slots", "obs_slots", "po_slots", "use_imu", "use_lidar",
    "use_navsat", "use_loop", "frame_batch",
)


def save_estimator(est, path: str) -> None:
    """Serialize the full host-side state. Drains any in-flight
    pipelined batch and finishes any in-flight async BA first so the map
    is fully mirrored and solved at the cut point."""
    if getattr(est, "_pending_flush", None) is not None \
            or getattr(est, "_pipe", None) is not None:
        est._drain_pipe()
    if getattr(est, "_fbuf", None):
        # batched/pipelined modes buffer up to frame_batch-1 frames; push
        # them through the per-frame path (as finalize does) so the
        # resumed run has no tracking gap
        leftover, est._fbuf = est._fbuf, []
        for t, left_u8, right_u8 in leftover:
            if est.status == est.BUILDING:
                est._build_frame(t, left_u8, right_u8)
            else:
                est._track_single(t, left_u8, right_u8)
    est._finish_pending_ba()
    state = {
        # frontend / tracker
        "status": est.status,
        "last_pose": np.asarray(est.last_pose),
        "relative": np.asarray(est.relative),
        "_rel_dt": est._rel_dt,
        "last_time": est.last_time,
        "last_kf_time": est.last_kf_time,
        "feat_px": est.feat_px.copy(),
        "feat_lm": est.feat_lm.copy(),
        "feat_valid": est.feat_valid.copy(),
        # last image pyramid (numpy-ified): the resumed device chain LK
        # re-tracks from this exact frame
        "last_pyr": (None if est.last_pyr is None
                     else [np.asarray(l) for l in est.last_pyr]),
        # IMU
        "imu_initialized": est.imu_initialized,
        "_imu_init_stage": est._imu_init_stage,
        "_imu_init_time": est._imu_init_time,
        "_imu_init_min_kf": est._imu_init_min_kf,
        "cur_vel": est.cur_vel.copy(),
        "cur_bias": est.cur_bias.copy(),
        "_imu_t": list(est._imu_t),
        "_imu_acc": list(est._imu_acc),
        "_imu_gyr": list(est._imu_gyr),
        "_kf_t": list(est._kf_t),
        "_kf_acc": list(est._kf_acc),
        "_kf_gyr": list(est._kf_gyr),
        # lidar
        "_scans": list(est._scans),
        "_lidar_done": est._lidar_done,
        # global stage
        "_navsat_sections_done": est._navsat_sections_done,
        "pose_graph": {
            "sections": est.pose_graph.sections,
            "submaps": est.pose_graph.submaps,
            "current": est.pose_graph.current,
            "turning": est.pose_graph.turning,
            "_processed": est.pose_graph._processed,
        },
    }
    if est.cfg.use_lidar:
        state["lidar_mapping"] = {
            "world_ground": est.lidar_mapping.world_ground,
            "world_surf": est.lidar_mapping.world_surf,
            "up_axis": est.lidar_mapping.up_axis,
        }
    if est.navsat is not None:
        state["navsat"] = {
            "raw_t": list(est.navsat.raw_t),
            "raw_p": list(est.navsat.raw_p),
            "kf_fix": dict(est.navsat.kf_fix),
            "extrinsic": np.asarray(est.navsat.extrinsic),
            "initialized": est.navsat.initialized,
            "_kf_done": est.navsat._kf_done,
        }
    if est.relocator is not None:
        state["relocator_pending"] = dict(est.relocator._pending)
        state["relocator_up_axis"] = est.relocator.up_axis

    blob = {
        "version": VERSION,
        "config": {f: getattr(est.cfg, f) for f in _SHAPE_FIELDS},
        "map": dict(est.map.__dict__),
        "state": state,
    }
    with open(path, "wb") as f:
        pickle.dump(blob, f, protocol=pickle.HIGHEST_PROTOCOL)


def load_estimator(est, path: str) -> None:
    """Restore a checkpoint into an Estimator built with a compatible
    config (same shapes/capacities/sensor set)."""
    with open(path, "rb") as f:
        blob = pickle.load(f)
    if blob.get("version") != VERSION:
        raise ValueError(f"checkpoint version {blob.get('version')} "
                         f"!= supported {VERSION}")
    for fname in _SHAPE_FIELDS:
        want, have = blob["config"][fname], getattr(est.cfg, fname)
        if want != have:
            raise ValueError(
                f"checkpoint config mismatch: {fname}={want} but the "
                f"estimator was built with {have}")

    est.map.__dict__.update(blob["map"])
    s = blob["state"]
    est.status = s["status"]
    est.last_pose = np.asarray(s["last_pose"], np.float32)
    est.relative = np.asarray(s["relative"], np.float32)
    est._rel_dt = s["_rel_dt"]
    est.last_time = s["last_time"]
    est.last_kf_time = s["last_kf_time"]
    est.feat_px = np.asarray(s["feat_px"], np.float32)
    est.feat_lm = np.asarray(s["feat_lm"], np.int64)
    est.feat_valid = np.asarray(s["feat_valid"], bool)
    est.imu_initialized = s["imu_initialized"]
    est._imu_init_stage = s["_imu_init_stage"]
    est._imu_init_time = s["_imu_init_time"]
    est._imu_init_min_kf = s["_imu_init_min_kf"]
    est.cur_vel = np.asarray(s["cur_vel"], np.float32)
    est.cur_bias = np.asarray(s["cur_bias"], np.float32)
    est._imu_t, est._imu_acc, est._imu_gyr = \
        s["_imu_t"], s["_imu_acc"], s["_imu_gyr"]
    est._kf_t, est._kf_acc, est._kf_gyr = \
        s["_kf_t"], s["_kf_acc"], s["_kf_gyr"]
    est._scans = s["_scans"]
    est._lidar_done = s["_lidar_done"]
    est._navsat_sections_done = s["_navsat_sections_done"]
    pg = s["pose_graph"]
    est.pose_graph.sections = pg["sections"]
    est.pose_graph.submaps = pg.get("submaps", {})
    est.pose_graph.current = pg["current"]
    est.pose_graph.turning = pg["turning"]
    est.pose_graph._processed = pg["_processed"]
    if est.cfg.use_lidar and "lidar_mapping" in s:
        lm = s["lidar_mapping"]
        est.lidar_mapping.world_ground = lm["world_ground"]
        est.lidar_mapping.world_surf = lm["world_surf"]
        est.lidar_mapping.set_up_axis(lm["up_axis"])
    if est.navsat is not None and "navsat" in s:
        nv = s["navsat"]
        est.navsat.raw_t = nv["raw_t"]
        est.navsat.raw_p = nv["raw_p"]
        est.navsat.kf_fix = nv["kf_fix"]
        est.navsat.extrinsic = np.asarray(nv["extrinsic"], np.float32)
        est.navsat.initialized = nv["initialized"]
        est.navsat._kf_done = nv["_kf_done"]
    if est.relocator is not None and "relocator_pending" in s:
        est.relocator._pending = s["relocator_pending"]
    if est.relocator is not None and "relocator_up_axis" in s:
        # a run checkpointed after gravity alignment measures loop
        # proximity in the z-up plane; restore that, and the matching
        # scan-to-map DoF split, on resume
        est.relocator.set_up_axis(s["relocator_up_axis"])
    # the device-resident tracking chain is stale: restore the saved
    # pyramid and let _sync_device_state re-seed everything else from the
    # map on the next frame
    import jax.numpy as jnp
    lp = s.get("last_pyr")
    est.last_pyr = None if lp is None else [jnp.asarray(l) for l in lp]
    est._pending_ba = None
    est._dev = None
    est._fbuf = []
    # pipelined-frontend chain resets; it re-seeds from the mirror
    est._pipe = None
    est._pending_flush = None
    est._pipe_last_time = None
    est._pipe_imu_anchor = None
    if est._slot_gen is not None:
        est._slot_gen[:] = 0
    est._corr_total = np.array([1, 0, 0, 0, 0, 0, 0], np.float32)
    est._corr_injected = est._corr_total.copy()
