"""The full _pyramid composition — DCT-payload upload + on-device
undistortion + histogram equalization — has never been gated TOGETHER:
a low-contrast, lens-distorted sequence fed as int4 DCT payloads must
still track (the EuRoC-style worst case over a bandwidth-limited
link)."""

import numpy as np

from lvio_fusion_tpu.core.estimator import Estimator, EstimatorConfig
from lvio_fusion_tpu.datasets.synthetic import make_sequence
from lvio_fusion_tpu.models.camera import Camera
from tests.test_undistort_fused import K1, K2, _distort_image


def _crush(img):
    """4x dynamic-range compression into the dark end (u8)."""
    f = np.asarray(img, np.float32)
    if f.max() > 1.5:
        f = f / 255.0
    return np.clip(f * 64.0, 0, 255).astype(np.uint8)


def test_dct_undistort_equalize_sequence_tracks():
    seq = make_sequence(num_frames=10, H=120, W=160, num_points=200,
                        seed=4)

    def run(cfg_kw, cams, prep):
        cl, cr = cams
        cfg = EstimatorConfig(
            height=120, width=160, num_features=60, num_features_init=20,
            num_features_tracking_bad=8,
            num_features_needed_for_keyframe=30,
            window_kfs=4, landmark_slots=96, obs_slots=256, po_slots=128,
            ba_iters=3, cell=20, occupy_radius=8, frame_batch=2, **cfg_kw)
        est = Estimator(cl, cr, cfg)
        for fr in seq.frames:
            est.input_image(fr.time, prep(fr.left, cl), prep(fr.right, cr))
        est.finalize()
        return est.trajectory()

    # reference: ideal images, plain pipeline
    t_ref, p_ref = run({}, (seq.cam_left, seq.cam_right),
                       lambda im, c: im)

    def with_dist(cam):
        return Camera.create(float(cam.fx), float(cam.fy), float(cam.cx),
                             float(cam.cy), cam.extrinsic, k1=K1, k2=K2)

    cams = (with_dist(seq.cam_left), with_dist(seq.cam_right))
    t_c, p_c = run(dict(undistort=True, equalize_hist=True, dct_k=16,
                        dct_quality=100, dct_bits=4), cams,
                   lambda im, c: _crush(_distort_image(im, c)))

    # keyframe cadence may differ under the crushed contrast; compare
    # poses at the keyframe times both runs share
    assert len(t_c) >= 2, f"tracking collapsed: {len(t_c)} kfs"
    common = np.intersect1d(np.round(t_c, 6), np.round(t_ref, 6))
    assert len(common) >= 2
    ic = np.searchsorted(np.round(t_c, 6), common)
    ir = np.searchsorted(np.round(t_ref, 6), common)
    err = np.linalg.norm(p_c[ic][:, 4:] - p_ref[ir][:, 4:], axis=1)
    # distortion resampling + 4x range crush + int4 DCT: still within
    # 15 cm of the clean trajectory over this ~5 m path
    assert np.max(err) < 0.15, f"composed pipeline diverged: {err}"
