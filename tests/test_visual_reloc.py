"""Visual (BRIEF/PnP) relocation: a revisit with a drifted pose estimate
must snap back onto the old keyframe's landmarks."""

import jax
import jax.numpy as jnp
import numpy as np

from lvio_fusion_tpu.core.frontend import make_frontend, unpack_keyframe_result
from lvio_fusion_tpu.core.hostmap import HostMap
from lvio_fusion_tpu.datasets.synthetic import make_sequence
from lvio_fusion_tpu.loop.relocator import Relocator
from lvio_fusion_tpu.ops.descriptors import brief_descriptors


def test_visual_relocation_recovers_drift():
    seq = make_sequence(num_frames=2, H=240, W=360, num_points=400, seed=4)
    fns = make_frontend(seq.cam_left, seq.cam_right, 240, 360, 200,
                        cell=24, occupy_radius=10)
    img = jnp.asarray((seq.frames[0].left * 255).astype(np.uint8))
    imgr = jnp.asarray((seq.frames[0].right * 255).astype(np.uint8))
    pyr = fns.preprocess(img)
    gt_pose = np.asarray(seq.gt_poses[0], np.float32)

    # old keyframe: detect + triangulate at the true pose
    kf = unpack_keyframe_result(fns.keyframe_step(
        imgr, pyr, jnp.zeros((200, 2)), jnp.zeros(200, bool),
        jnp.asarray(gt_pose)))
    valid = kf.valid
    n = int(valid.sum())
    assert n > 30

    m = HostMap()
    m.add_keyframe(0.0, gt_pose)
    ids = m.add_landmarks(0, kf.new_px_right[valid], kf.new_px_left[valid],
                          kf.inv_depth[valid], kf.world[valid])

    px = np.zeros((200, 2), np.float32)
    lm = np.full(200, -1, np.int64)
    ok = np.zeros(200, bool)
    px[:n] = kf.new_px_left[valid]
    lm[:n] = ids
    ok[:n] = True
    desc, dok = brief_descriptors(pyr[0], jnp.asarray(px), jnp.asarray(ok))
    m.kf_desc[0] = {"desc": np.asarray(desc), "ok": np.asarray(dok),
                    "px": px, "lm": lm}

    # revisit keyframe: SAME image, but the map pose has drifted 0.5 m
    drifted = gt_pose.copy()
    drifted[4] += 0.5
    drifted[5] -= 0.3
    m.add_keyframe(40.0, drifted)
    m.kf_desc[1] = m.kf_desc[0]  # same viewpoint => same observations

    rel = Relocator(None, mode=1, min_elapsed=30.0)
    rel._cam = seq.cam_left
    out = rel.relocate_visual(m, 1, 0)
    assert out is not None, "visual relocation found no matches"
    pose, score = out
    err = np.linalg.norm(pose[4:] - gt_pose[4:])
    print(f"visual reloc: score={score:.2f} err={err:.4f}")
    assert score > 0.5
    assert err < 0.05, err
