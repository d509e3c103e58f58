"""Run-overview figure: offline equivalent of the reference node's RViz
views (visualization.cpp:33-163) — path, landmark cloud, pose-graph
section markers, loop edges, navsat track."""

import numpy as np

from lvio_fusion_tpu.loop.pose_graph import PoseGraph, Section
from lvio_fusion_tpu.utils.viz import save_run_overview
from test_forward_update import _make_world


class _NavsatStub:
    extrinsic = np.array([1, 0, 0, 0, 0.5, -0.25, 0.0], np.float32)
    raw_p = [np.array([0.1 * k, 0.02 * k, 0.0], np.float32)
             for k in range(30)]


def test_save_run_overview_writes_figure(tmp_path):
    rng = np.random.default_rng(2)
    m, gt, cam_l, cam_r = _make_world(rng)
    pg = PoseGraph()
    pg.sections[0] = Section(A=0, B=2, C=6)
    m.kf_loop[10] = (1, np.array([1, 0, 0, 0, 0, 0, 0], np.float32))

    out = tmp_path / "overview.png"
    save_run_overview(str(out), m, pose_graph=pg, navsat=_NavsatStub(),
                      up_axis="z", title="test run")
    assert out.exists() and out.stat().st_size > 20_000

    # empty map must not crash (run aborted before the first keyframe)
    from lvio_fusion_tpu.core.hostmap import HostMap
    save_run_overview(str(tmp_path / "empty.png"), HostMap())


def test_save_frusta_ply(tmp_path):
    from lvio_fusion_tpu.utils.viz import save_frusta_ply

    rng = np.random.default_rng(3)
    m, gt, cam_l, cam_r = _make_world(rng)
    out = tmp_path / "frusta.ply"
    n_edges = save_frusta_ply(str(out), m, cam_l, height=240, width=360,
                              stride=2)
    assert out.exists()
    # 8 edges per drawn frustum + 3 car-pose axis edges
    txt = out.read_text().splitlines()
    n_v = int(next(x for x in txt if x.startswith("element vertex"))
              .split()[-1])
    n_e = int(next(x for x in txt if x.startswith("element edge"))
              .split()[-1])
    assert n_e == n_edges and n_e >= 8 + 3
    hdr_end = txt.index("end_header")
    verts = np.array([[float(v) for v in ln.split()[:3]]
                      for ln in txt[hdr_end + 1:hdr_end + 1 + n_v]])
    assert np.all(np.isfinite(verts))
    edges = np.array([[int(v) for v in ln.split()]
                      for ln in txt[hdr_end + 1 + n_v:]])
    assert edges.shape == (n_e, 2)
    assert edges.min() >= 0 and edges.max() < n_v
    # frustum vertices must sit near the keyframe path, not at infinity
    P = m.poses_array()[:, 4:]
    assert np.abs(verts - P.mean(0)).max() < np.abs(P).max() + 10.0
