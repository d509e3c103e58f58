"""End-to-end CLI drive of the real-dataset intake path.

A synthetic sequence is rendered to disk in the exact KITTI odometry
layout (grayscale PNGs, times.txt, calib.txt with P0/P1), then
``cli run --dataset kitti`` streams it through KittiOdometry + the native
loader + the Estimator and ``cli eval`` scores the written trajectory
against ground truth. This keeps the real-data pipeline (reader, PNG
decode, calib parsing, CSV writer, built-in evo-style evaluation) warm
end to end until an actual KITTI drive is mounted — the reference's whole
validation story is dataset replay + evo (README.md:37-53,
lvio_fusion_node.cpp:295-350)."""

import re

import numpy as np
from PIL import Image


def test_cli_run_and_eval_on_kitti_layout(tmp_path, capsys):
    from lvio_fusion_tpu import cli
    from lvio_fusion_tpu.datasets.synthetic import make_sequence
    from lvio_fusion_tpu.models.camera import stereo_baseline
    from lvio_fusion_tpu.utils.trajectory import write_tum_csv

    seq = make_sequence(num_frames=30, H=240, W=360, num_points=400, seed=0)

    # ---- render to the KITTI odometry directory layout ----
    root = tmp_path / "kitti"
    sd = root / "sequences" / "00"
    (sd / "image_0").mkdir(parents=True)
    (sd / "image_1").mkdir(parents=True)
    def _u8(img):
        # same conversion input_image applies to float imagery
        # (Estimator._to_u8), so the PNG path sees identical pixels
        return np.clip(np.asarray(img) * 255.0, 0, 255).astype(np.uint8)

    for i, fr in enumerate(seq.frames):
        Image.fromarray(_u8(fr.left)).save(sd / "image_0" / f"{i:06d}.png")
        Image.fromarray(_u8(fr.right)).save(sd / "image_1" / f"{i:06d}.png")
    np.savetxt(sd / "times.txt", seq.gt_times)
    fx = float(seq.cam_left.fx)
    fy = float(seq.cam_left.fy)
    cx = float(seq.cam_left.cx)
    cy = float(seq.cam_left.cy)
    b = float(stereo_baseline(seq.cam_left, seq.cam_right))
    with open(sd / "calib.txt", "w") as f:
        f.write(f"P0: {fx} 0 {cx} 0 0 {fy} {cy} 0 0 0 1 0\n")
        f.write(f"P1: {fx} 0 {cx} {-fx * b} 0 {fy} {cy} 0 0 0 1 0\n")

    gt_csv = tmp_path / "gt.csv"
    write_tum_csv(str(gt_csv), seq.gt_times, seq.gt_poses)

    # ---- cli run: KITTI reader -> Estimator -> trajectory CSV ----
    traj = tmp_path / "traj.csv"
    cli.main(["run", "--dataset", "kitti", "--root", str(root),
              "--sequence", "00", "--frames", "30", "--small-shapes",
              "--out", str(traj)])

    # the reader reconstructed the cameras from calib.txt
    assert traj.exists()
    rows = [l for l in traj.read_text().splitlines() if l]
    assert len(rows) >= 3, f"too few keyframes: {len(rows)}"
    assert len(rows[0].split(",")) == 8

    # ---- cli eval: built-in ATE/RPE against the ground-truth CSV ----
    capsys.readouterr()
    cli.main(["eval", str(traj), str(gt_csv)])
    out = capsys.readouterr().out
    m = re.search(r"matched (\d+)/(\d+) poses\s+ATE RMSE ([0-9.]+) m", out)
    assert m, f"unexpected eval output: {out!r}"
    matched, total_poses, ate = int(m.group(1)), int(m.group(2)), \
        float(m.group(3))
    assert matched == total_poses == len(rows)
    total = float(np.linalg.norm(
        np.diff(seq.gt_poses[:, 4:], axis=0), axis=1).sum())
    assert ate < 0.05 * total, f"ATE {ate} too large for {total:.1f} m"
