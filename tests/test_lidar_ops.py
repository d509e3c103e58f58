"""Lidar range-image pipeline on a synthetic scene: ground plane + boxes.
Ground removal must find the plane, segmentation must separate the boxes,
feature extraction must yield sane ground/surf sets."""

import jax
import jax.numpy as jnp
import numpy as np

from lvio_fusion_tpu.ops.lidar import (
    count_neighbors, curvature, make_feature_extractor, project,
    remove_ground, segment, voxel_downsample,
)

R_SCANS, C_SCAN = 16, 360
ANG_RES_Y, ANG_BOTTOM, GROUND_ROWS = 2.0, 15.0, 8


def synth_scan(seed=0, sensor_h=1.8):
    """Simulate a spinning lidar over a ground plane with box obstacles."""
    rows = np.arange(R_SCANS)
    cols = np.arange(C_SCAN)
    vert = np.radians(rows * ANG_RES_Y - ANG_BOTTOM)
    az = np.radians(90.0 - (cols - C_SCAN / 2) * (360.0 / C_SCAN))
    pts, kinds = [], []
    boxes = [  # (cx, cy, half, height)
        (8.0, 3.0, 1.0, 2.5), (6.0, -4.0, 1.2, 3.0), (-7.0, 0.0, 1.5, 2.0),
    ]
    for r in range(R_SCANS):
        for c in range(C_SCAN):
            d = np.array([np.cos(vert[r]) * np.sin(az[c]),
                          np.cos(vert[r]) * np.cos(az[c]),
                          np.sin(vert[r])])
            # ray from (0,0,0); ground plane at z = -sensor_h
            t_hit, kind = np.inf, -1
            if d[2] < -1e-3:
                t = -sensor_h / d[2]
                if 1.0 < t < 40.0:
                    t_hit, kind = t, 0
            for (bx, by, half, hgt) in boxes:
                # exact ray-box (slab method): quantized ranges would
                # artificially break the angle-based connectivity
                lo = np.array([bx - half, by - half, -sensor_h])
                hi = np.array([bx + half, by + half, -sensor_h + hgt])
                with np.errstate(divide="ignore"):
                    t1 = (lo - 0.0) / d
                    t2 = (hi - 0.0) / d
                tmin = np.minimum(t1, t2).max()
                tmax = np.maximum(t1, t2).min()
                if tmax > tmin > 0.5 and tmin < t_hit:
                    t_hit, kind = tmin, 1
            if np.isfinite(t_hit):
                pts.append(t_hit * d)
                kinds.append(kind)
    return (jnp.asarray(np.asarray(pts), jnp.float32),
            np.asarray(kinds))


def test_projection_and_ground():
    pts, kinds = synth_scan()
    mask = jnp.ones(pts.shape[0], bool)
    rimg, pimg, valid = project(pts, mask, R_SCANS, C_SCAN, ANG_RES_Y,
                                ANG_BOTTOM)
    assert float(valid.mean()) > 0.3
    ground = remove_ground(rimg, pimg, valid, GROUND_ROWS)
    # the vast majority of ground pixels must be at z ~ -1.8 (a few
    # box-edge -> far-ground transitions legitimately pass the angle test,
    # same as the reference's RemoveGround)
    gz = np.asarray(pimg[..., 2][ground])
    assert (np.abs(gz + 1.8) < 0.3).mean() > 0.9
    # most ground-plane returns should be flagged
    assert int(ground.sum()) > 100


def test_segmentation_separates_boxes():
    pts, kinds = synth_scan()
    mask = jnp.ones(pts.shape[0], bool)
    rimg, pimg, valid = project(pts, mask, R_SCANS, C_SCAN, ANG_RES_Y,
                                ANG_BOTTOM)
    ground = remove_ground(rimg, pimg, valid, GROUND_ROWS)
    lab, ok = segment(rimg, valid, ground, min_px=10, ang_res_y=ANG_RES_Y)
    labs = np.asarray(lab[ok])
    xy = np.asarray(pimg[ok])[:, :2]
    uniq = np.unique(labs)
    assert len(uniq) >= 2, f"expected >=2 segments, got {uniq}"
    # each segment's points must be spatially compact (one box each)
    for u in uniq:
        sel = xy[labs == u]
        spread = sel.max(0) - sel.min(0)
        assert np.all(spread < 4.0), f"segment {u} too spread: {spread}"


def test_voxel_downsample_and_neighbors():
    rng = np.random.default_rng(0)
    # 100 points in one voxel + 50 spread out
    clump = rng.normal(0, 0.01, (100, 3)).astype(np.float32)
    spread = (rng.uniform(2, 30, (50, 3))).astype(np.float32)
    pts = jnp.asarray(np.concatenate([clump, spread]))
    valid = jnp.ones(150, bool)
    out, ov = voxel_downsample(pts, valid, 0.5, 64)
    n = int(ov.sum())
    assert 30 <= n <= 64  # clump collapses to ~1, spread mostly survives
    nb = count_neighbors(pts, valid, 0.5)
    assert int(nb[0]) >= 100  # clump point sees the whole clump
    assert int(nb[-1]) <= 3


def test_full_feature_extractor():
    pts, kinds = synth_scan()
    extract = make_feature_extractor(
        R_SCANS, C_SCAN, ANG_RES_Y, ANG_BOTTOM, GROUND_ROWS,
        min_range=1.0, max_range=50.0, resolution=0.2,
        max_ground=512, max_surf=512)
    f = extract.single(pts, jnp.ones(pts.shape[0], bool))
    ng, ns = int(f.ground_valid.sum()), int(f.surf_valid.sum())
    print("ground:", ng, "surf:", ns)
    assert ng > 50, "too few ground features"
    assert ns > 10, "too few surf features"
    gz = np.asarray(f.ground[np.asarray(f.ground_valid)])[:, 2]
    assert (np.abs(gz + 1.8) < 0.35).mean() > 0.9
    # surf features should lie on box walls (|z| above ground, near boxes)
    s = np.asarray(f.surf[np.asarray(f.surf_valid)])
    assert (s[:, 2] > -1.6).mean() > 0.8


def test_segmentation_wraps_azimuth_seam():
    """A box straddling the azimuth seam (behind the sensor) must get ONE
    label, not two."""
    pts, kinds = synth_scan()
    mask = jnp.ones(pts.shape[0], bool)
    rimg, pimg, valid = project(pts, mask, R_SCANS, C_SCAN, ANG_RES_Y,
                                ANG_BOTTOM)
    ground = remove_ground(rimg, pimg, valid, GROUND_ROWS)
    lab, ok = segment(rimg, valid, ground, min_px=10, ang_res_y=ANG_RES_Y)
    # the x=-7 box (behind: azimuth ~ +-180 deg) straddles the seam
    sel = np.asarray(ok) & (np.asarray(pimg[..., 0]) < -5.0)
    labs = np.unique(np.asarray(lab)[sel])
    assert len(labs) == 1, f"seam box split into labels {labs}"


def test_seam_object_passes_min_px_as_one_component():
    """Full-circle parity with the reference BFS (projection.cpp:199-320):
    a single object straddling the column wrap must pass the min-px
    validity rule as ONE component where either split half alone would
    fail it."""
    pts, kinds = synth_scan()
    mask = jnp.ones(pts.shape[0], bool)
    rimg, pimg, valid = project(pts, mask, R_SCANS, C_SCAN, ANG_RES_Y,
                                ANG_BOTTOM)
    ground = remove_ground(rimg, pimg, valid, GROUND_ROWS)
    # the seam box's obstacle pixels (wall at x = -5.5, |y| <= 1.5)
    P = np.asarray(pimg)
    box_px = (np.asarray(valid & ~ground) & (P[..., 0] <= -5.45)
              & (P[..., 0] > -8.6) & (np.abs(P[..., 1]) < 1.6))
    n_box = int(box_px.sum())
    assert n_box >= 8, f"seam box too small to test ({n_box}px)"
    # min_px chosen so each half (~n/2) fails but the whole passes;
    # min_lines high enough that the lines fallback can't rescue a half
    min_px = int(0.75 * n_box)
    lab, ok = segment(rimg, valid, ground, min_px=min_px,
                      min_px_lines=min_px, min_lines=R_SCANS + 1,
                      ang_res_y=ANG_RES_Y)
    ok_np, lab_np = np.asarray(ok), np.asarray(lab)
    labs, counts = np.unique(lab_np[box_px & ok_np], return_counts=True)
    assert len(labs) == 1, f"seam box split into valid labels {labs}"
    # the main component carries (nearly) all the box's pixels — each
    # split half (~n/2 < min_px) would have failed validity entirely
    assert counts[0] >= min_px, (counts, min_px)
    assert counts[0] >= 0.9 * n_box, (counts, n_box)
    # and it genuinely straddles the wrap: pixels on both sides
    cols = np.where((lab_np == labs[0]).any(0))[0]
    assert cols.min() < 50 and cols.max() > C_SCAN - 50, cols


def test_range_scatter_keeps_min_range_point():
    """Two points landing in the SAME range-image cell: the stored
    coordinates (and aux) must belong to the nearer point, exactly."""
    # same direction, two ranges — same row/col regardless of quantization
    d = np.array([np.cos(0.1) * np.sin(0.7), np.cos(0.1) * np.cos(0.7),
                  np.sin(0.1)])
    near, far = 5.0, 20.0
    pts = jnp.asarray(np.stack([far * d, near * d]), jnp.float32)
    mask = jnp.ones(2, bool)
    aux = jnp.asarray([7.0, 3.0], jnp.float32)
    rimg, pimg, valid, aimg = project(pts, mask, R_SCANS, C_SCAN,
                                      ANG_RES_Y, ANG_BOTTOM, aux=aux)
    r, c = np.argwhere(np.asarray(valid))[0]
    assert np.isclose(float(rimg[r, c]), near, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pimg[r, c]), near * d, atol=1e-4)
    assert float(aimg[r, c]) == 3.0, "aux must follow the min-range winner"
    # order-independence: swapping the scatter order changes nothing
    rimg2, pimg2, valid2, aimg2 = project(pts[::-1], mask, R_SCANS, C_SCAN,
                                          ANG_RES_Y, ANG_BOTTOM,
                                          aux=aux[::-1])
    np.testing.assert_allclose(np.asarray(pimg2[r, c]), near * d, atol=1e-4)
    assert float(aimg2[r, c]) == 3.0
