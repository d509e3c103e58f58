"""Probe: on a visually-degraded LVIO scene, are the default factor
weights suboptimal end-to-end?

The reference paper's headline claim is that ADAPTIVE factor weighting
improves accuracy when sensor reliability shifts (README.md:7-18,
environment.cpp:117-132). This probe builds the scene family the claim
is about — a low-texture / noisy / occluded visual stream with clean
lidar+imu — and measures end-to-end ATE under (a) default weights,
(b) fixed visual down-weights, (c) the shipped TD3 policy. If a fixed
down-weight beats the defaults by >=10%, the family qualifies as the
training/eval ground for the policy "helps" gate
(tests/test_policy_artifact.py).

Run: PYTHONPATH=/root/.axon_site:/root/repo /opt/venv/bin/python \
    misc/rl_degraded_probe.py
"""

import os
import sys

import numpy as np


def run_scene(scene_kw, weights=None, policy_path=None, frames=40):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from lvio_fusion_tpu.core.estimator import Estimator, EstimatorConfig
    from lvio_fusion_tpu.datasets.synthetic import make_sequence
    from lvio_fusion_tpu.utils.trajectory import ate_rmse

    kw = dict(num_frames=frames, H=240, W=360, num_points=400,
              with_imu=True, with_lidar=True, lidar_rows=16,
              lidar_cols=360)
    kw.update(scene_kw)
    seq = make_sequence(**kw)
    cfg = EstimatorConfig(
        height=240, width=360, num_features=200, num_features_init=30,
        num_features_tracking_bad=10, num_features_needed_for_keyframe=80,
        window_kfs=6, landmark_slots=256, obs_slots=1024, po_slots=512,
        ba_iters=5, cell=24, occupy_radius=10,
        use_imu=True, use_lidar=True, init_kfs=8,
        max_keyframe_interval=0.3,
        num_scans=16, horizon_scan=360, ang_res_y=2.0, ang_bottom=15.0,
        ground_rows=8, min_range=1.0, max_range=50.0,
        max_scan_points=8192, max_ground=512, max_surf=512,
        lidar_map_cap=2048, lidar_up_axis="y")
    est = Estimator(seq.cam_left, seq.cam_right, cfg,
                    lidar_extrinsic=seq.lidar_extrinsic)
    if weights is not None:
        class FixedAgent:
            def update_weights(self, obs):
                return np.asarray(weights, np.float32)
        est.set_agent(FixedAgent())
    elif policy_path:
        from lvio_fusion_tpu.adapt.agent import Agent, load_policy
        from lvio_fusion_tpu.adapt.td3 import TD3
        est.set_agent(Agent(load_policy(TD3(seed=0), policy_path)))

    imu_i = 0
    for i, fr in enumerate(seq.frames):
        while (imu_i < len(seq.imu_times)
               and seq.imu_times[imu_i] <= fr.time):
            est.input_imu(seq.imu_times[imu_i], seq.imu_acc[imu_i],
                          seq.imu_gyr[imu_i])
            imu_i += 1
        est.input_pointcloud(seq.scan_times[i], seq.scans[i])
        est.input_image(fr.time, fr.left, fr.right)
    est.finalize()
    t, p = est.trajectory()
    idx = np.searchsorted(seq.gt_times, t)
    gt = seq.gt_poses[np.clip(idx, 0, len(seq.gt_poses) - 1)]
    ate = ate_rmse(p[:, 4:], gt[:, 4:], align=True)
    return ate, len(t)


def main():
    fx = 0.9 * 360  # synthetic fx at W=360
    dw = np.array([fx / 10.0, 1.0, 0.01], np.float32)
    # v2 probe measured e2e ATE INSENSITIVE (+-2%) to 3 decades of
    # global weight change on zero-mean degradations (noise/occluders/
    # jitter): all sensors still AGREE on the optimum, so the robust
    # losses + outlier gates absorb the corruption. Weights have e2e
    # leverage only when a sensor systematically DISAGREES — v3 probes
    # a biased lidar (range-scale miscalibration).
    # v3 found CONSTANT range bias also e2e-neutral: scan-to-map is
    # self-referential (the map is built from the same biased scans), so
    # a constant miscalibration never disagrees with itself. v4 probes a
    # time-VARYING scale (thermal drift): each scan now disagrees with
    # the map built at other phases of the drift.
    scenes = {
        "drifting_lidar_5pct": dict(lidar_scale_drift=0.05, seed=44),
        "drifting_lidar_10pct": dict(lidar_scale_drift=0.10, seed=45),
        # control: clean scene (defaults should already be near-optimal)
        "clean": dict(seed=42),
    }
    arms = {
        "default": dict(weights=None),
        "lidar_x0.1": dict(weights=dw * np.array([1, 0.1, 0.1])),
        "lidar_x0.01": dict(weights=dw * np.array([1, 0.01, 0.01])),
        "vis_x10": dict(weights=dw * np.array([10, 1, 1])),
    }
    art = os.path.join(os.path.dirname(__file__), "td3_policy.pkl")
    if os.path.exists(art):
        arms["policy"] = dict(policy_path=art)

    for sname, skw in scenes.items():
        print(f"--- scene {sname} ---", flush=True)
        for aname, akw in arms.items():
            ate, k = run_scene(skw, **akw)
            print(f"  {aname:10s}: ATE {ate:.4f} ({k} kfs)", flush=True)


if __name__ == "__main__":
    main()
