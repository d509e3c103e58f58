"""Estimator facade: wires frontend, backend, (later) lidar/navsat/loop.

Functional equivalent of the reference Estimator (estimator.cpp:17-206):
``input_image`` drives the per-frame pipeline; keyframe boundaries trigger
the backend window BA. Unlike the reference's 7 concurrent threads, stages
run on a deterministic schedule (frontend every frame; backend + mapping +
navsat + loop as ordered sub-steps at keyframe boundaries) — same outputs,
no data races, and every dense stage is a fixed-shape jitted program.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lvio_fusion_tpu.core.backend import Backend, WindowCaps
from lvio_fusion_tpu.core.frontend import make_frontend
from lvio_fusion_tpu.core.hostmap import HostMap
from lvio_fusion_tpu.geometry.se3 import (
    se3_identity, se3_inv, se3_mul, se3_slerp,
)

_SE3_ID = np.array([1, 0, 0, 0, 0, 0, 0], np.float32)


@dataclass
class EstimatorConfig:
    height: int = 376
    width: int = 1241
    num_features: int = 400
    num_features_init: int = 50
    num_features_tracking_bad: int = 20
    num_features_needed_for_keyframe: int = 120
    max_keyframe_interval: float = 1.0  # force kf at >= 1 Hz
    frame_batch: int = 1  # frames tracked per device dispatch (>1 amortizes
    # the tunnel round-trip over several frames; keyframe decisions then lag
    # by up to frame_batch-1 frames — the same tolerance the reference's
    # async backend has, backend.cpp:28-40)
    scan_unroll: int = 1  # lax.scan unroll factor for the batched/pipelined
    # B-frame loop: >1 lets XLA fuse across consecutive frames at the cost
    # of a proportionally larger program (compile time and code size);
    # execution is sequential either way, so this is a fusion knob only.
    # r6 on-chip A/B (10 interleaved runs): unroll=4 is NEUTRAL within the
    # tunnel's 80-116 fps epoch swing and unroll=12 loses outright —
    # default stays 1 (fastest compile). Unrolling lets XLA reassociate
    # f32 reductions, so results drift at roundoff scale (NOT bit-exact;
    # trajectory equivalence guarded by test_scan_unroll_parity)
    async_ba: bool = True  # never block tracking on the window solve: the
    # BA launched at keyframe N is fetched/written back at keyframe N+1 and
    # its rigid correction forward-propagated (the reference backend
    # thread's exact semantics, backend.cpp:28-40 + Frontend::UpdateCache).
    # Keyframes that run the global stage (navsat/loop mutate poses) stay
    # synchronous.
    pipelined_flush: Optional[bool] = None  # lag-1 frontend pipeline
    # (frame_batch > 1 only): the host processes each batch's results
    # while the device tracks the NEXT batch — the keyframe decision and
    # feature merge run on-device, and map-side corrections are injected
    # into the chain one batch late. Keyframe bookkeeping (map insertion,
    # BA, global stages) lags one batch. Default None = auto: ON when
    # frame_batch > 1 and the backend is a TPU (r5/r6 on-chip A/B:
    # pipelined 55-66 fps vs 46-48 sync at batch 12 through the axon
    # tunnel — the relay overlaps fetches with in-flight programs, so the
    # pipeline wins even remotely); OFF on CPU (test mesh) where the
    # sync batched flush is simpler and equally fast.
    levels: int = 4
    lk_window: int = 21
    cell: int = 30
    occupy_radius: int = 15
    window_kfs: int = 8
    window_seconds: float = 3.0
    # covisibility re-association (local_map.cpp:271-368: project landmarks
    # of recent same-heading kfs into the new keyframe and re-attach them by
    # gated BRIEF matching instead of minting duplicates)
    use_covisibility: bool = True
    covis_kfs: int = 4           # GetCovisibilityKeyFrames window
    covis_max_angle: float = 30.0  # max heading difference (degrees)
    covis_radius: float = 25.0   # px search radius around the projection
    covis_max_dist: int = 50     # Hamming gate (local_map.cpp Search)
    covis_ratio: float = 0.8     # kNN ratio test
    # moving-point rejection (frontend.cpp:195-230 remove_moving_points)
    remove_moving_points: bool = True
    moving_px: float = 30.0
    landmark_slots: int = 512
    obs_slots: int = 2048
    po_slots: int = 1024
    ba_iters: int = 6
    visual_weight: float = 1.0  # per-pixel residual weight (RL-modulated)
    use_imu: bool = False
    # lidar (reference kitti.yaml lidar parameters)
    use_lidar: bool = False
    num_scans: int = 64
    horizon_scan: int = 1800
    ang_res_y: float = 0.427
    ang_bottom: float = 24.9
    ground_rows: int = 60
    min_range: float = 5.0
    max_range: float = 30.0
    resolution: float = 0.2
    cycle_time: float = 0.1036
    max_scan_points: int = 32768
    max_ground: int = 2048
    max_surf: int = 2048
    lidar_map_cap: int = 6144
    lidar_iters: int = 4
    lidar_up_axis: str = "z"  # world vertical axis for the DoF split
    # ('z' once gravity-aligned; 'y' in a raw camera-world)
    # navsat (reference navsat.cpp)
    use_navsat: bool = False
    navsat_accuracy: float = 1.0
    # loop closure (reference relocator.cpp; lidar mode only so far)
    use_loop: bool = False
    loop_threshold: float = 10.0
    loop_min_elapsed: float = 30.0
    relocator_mode: int = 2  # reference relocator_mode: 1 visual, 2 lidar,
    # 3 visual+lidar
    global_every_kfs: int = 5  # cadence of the global stage (the
    # reference's 2s GlobalLoop timer, expressed in keyframes)
    # IMU noise densities (reference kitti.yaml imu parameters)
    acc_n: float = 0.1
    gyr_n: float = 0.01
    acc_w: float = 1e-3
    gyr_w: float = 1e-4
    g_norm: float = 9.81007
    init_kfs: int = 10          # kfs needed before VI initialization
    imu_buf: int = 512          # max IMU samples per keyframe interval
    imu_frame_buf: int = 64     # max IMU samples per frame interval
    undistort: bool = False     # undistort raw images before the pipeline
    # (reference 'undistort' yaml flag; cameras' k1/k2/p1/p2 must be set)
    equalize_hist: bool = False  # histogram-equalize frames before
    # tracking (reference lvio_fusion_node.cpp:94; essential on
    # low-contrast imagery like EuRoC dark segments / KITTI tunnels)
    forward_resolve: bool = True  # after the async BA correction lands,
    # re-solve the forward keyframe's pose for 1 GN iteration against the
    # refreshed landmarks (Backend::UpdateFrontend, backend.cpp:248-293)
    navsat_v: bool = False  # GPS-speed seeding of the frame prediction
    # (reference 'navsat_v' yaml flag; frontend.cpp:49-65,104-106)
    dct_k: int = 0  # >0: upload images as DCT coefficients (keep the
    # first K zigzag coefficients per 8x8 block; ops/dct.py) and decode
    # on-device inside the frame programs. ~4x fewer upload bytes — the
    # throughput lever when the TPU sits behind a bandwidth-limited link
    # (the axon tunnel measures ~11-17 MB/s; raw 376x1241 uint8 frames
    # make the upload, not compute, the pipeline ceiling). K=16 at
    # quality 92 tracks within hundredths of a pixel of raw uint8
    # (tests/test_dct.py).
    dct_quality: int = 92  # JPEG-style quantization quality for dct_k
    dct_bits: int = 8  # 4: nibble-pack the AC coefficients two per byte
    # (the per-block scale absorbs the coarser range) — ~40% fewer
    # upload bytes again on top of dct_k, slightly noisier decode
    pallas_lk: bool = False  # route per-level LK through the Pallas
    # kernel (ops/pallas/lk.py: VMEM-resident images, no HBM gathers).
    # Off by default until an on-chip A/B vs the XLA block-fetch path
    # lands (tracked r4); exactness-tested in tests/test_pallas_lk.py
    cond_kf_stage: bool = True  # lax.cond-skip the speculative keyframe
    # stage (detect + stereo LK + BRIEF + triangulate) inside the
    # batched/pipelined frame programs when the on-device keyframe
    # decision — exactly the host's formula — says no keyframe is due;
    # XLA executes only the taken branch, so no-kf batches skip the
    # detection FLOPs entirely (equivalence: tests pass either way)

    def __post_init__(self):
        if self.pipelined_flush is None:
            # measured-best default per backend (see the field comment);
            # jax is already imported by this module, so the backend
            # query costs nothing new
            self.pipelined_flush = bool(
                self.frame_batch > 1
                and jax.default_backend() in ("tpu", "axon"))


class Estimator:
    BUILDING, TRACKING, LOST = 0, 1, 2

    def __init__(self, cam_left, cam_right, config: EstimatorConfig,
                 lidar_extrinsic=None):
        self.cfg = config
        self.cam_left = cam_left
        self.cam_right = cam_right
        c = config
        fns = make_frontend(
            cam_left, cam_right, c.height, c.width, c.num_features,
            levels=c.levels, win=c.lk_window, cell=c.cell,
            occupy_radius=c.occupy_radius,
            remove_moving=c.remove_moving_points, moving_px=c.moving_px,
            equalize=c.equalize_hist, dct_k=c.dct_k,
            dct_quality=c.dct_quality, dct_bits=c.dct_bits,
            pallas_lk=c.pallas_lk, undistort=c.undistort)
        self._dct = None
        self._enc_pool = None
        if c.dct_k:
            from concurrent.futures import ThreadPoolExecutor

            from lvio_fusion_tpu.ops.dct import make_encoder
            self._dct = make_encoder(c.height, c.width, c.dct_k,
                                     c.dct_quality, c.dct_bits)
            # per-frame encodes overlap each other at buffering time (the
            # jitted CPU program releases the GIL); the flush gathers
            self._enc_pool = ThreadPoolExecutor(max_workers=4)
        self.preprocess = fns.preprocess
        self.track_frame = fns.track_frame
        self.make_keyframe = fns.make_keyframe
        self.landmark_world = fns.landmark_world
        self.frame_step = fns.frame_step
        self.keyframe_step = fns.keyframe_step
        self.frame_step_chained = fns.frame_step_chained
        self.level0 = fns.level0
        # with IMU enabled, per-frame raw sample windows ride along in the
        # batched dispatch and seed LK via on-device preintegration
        self._batch_imu_cap = c.imu_frame_buf if c.use_imu else 0
        self._batch_step = (fns.make_batch_kf_step(
            c.frame_batch, imu_cap=self._batch_imu_cap, g_norm=c.g_norm,
            kf_thresh=(c.num_features_needed_for_keyframe
                       if c.cond_kf_stage else None),
            unroll=c.scan_unroll)
            if c.frame_batch > 1 and not c.pipelined_flush else None)
        # lag-1 pipelined frontend (device-autonomous keyframe merge)
        self._pipe_step = (fns.make_pipe_step(
            c.frame_batch, c.num_features_needed_for_keyframe,
            c.max_keyframe_interval, imu_cap=self._batch_imu_cap,
            g_norm=c.g_norm, unroll=c.scan_unroll)
            if c.frame_batch > 1 and c.pipelined_flush else None)
        self._pipe = None           # device chain state (dict) or None
        self._pending_flush = None  # in-flight batch handles
        self._pipe_discard = False  # drop the in-flight batch (post-LOST)
        self._pipe_gen = 1          # batch generation counter
        self._slot_gen = np.zeros(c.num_features, np.int32)  # host
        # mirror of feat_gen (which batch assigned each feature slot)
        self._corr_total = np.asarray(se3_identity())   # all rigid map
        # corrections ever applied (BA writeback tails, gravity alignment,
        # global-stage tails), composed left-to-right
        self._corr_injected = np.asarray(se3_identity())
        self._pipe_last_time = None
        self._pipe_imu_anchor = None
        self._ext_zero = None  # cached constant device args (non-IMU batch)
        self._fbuf: list = []  # pending (time, left_u8/payload, right_raw)
        # constant-velocity extrapolation cache for buffered frames:
        # (pose, n_buffered, base last_pose object) — stepping the cached
        # pose once per frame replaces the O(B) re-multiply per frame
        # (O(B^2) np_se3 calls per batch on the 1-core host)
        self._extrap = None
        self.backend = Backend(
            cam_left, cam_right,
            caps=WindowCaps(K=c.window_kfs, L=c.landmark_slots,
                            F=c.obs_slots, G=c.po_slots),
            num_iters=c.ba_iters, use_imu=c.use_imu,
            window_seconds=c.window_seconds)
        self.map = HostMap()
        self._pending_ba = None  # in-flight window solve (async backend)
        # host-side copy of the left camera intrinsics/extrinsic for
        # numpy-only projections (covisibility re-association)
        self._cam_np = {
            "fx": float(cam_left.fx), "fy": float(cam_left.fy),
            "cx": float(cam_left.cx), "cy": float(cam_left.cy),
            "ext": np.asarray(cam_left.extrinsic, np.float32),
        }

        # frontend state
        self.status = self.BUILDING
        self.last_pyr = None
        self._dev = None  # device-resident tracking chain state
        self.last_pose = np.asarray(se3_identity())
        self.relative = np.asarray(se3_identity())  # constant-velocity model
        self._rel_dt = 0.0  # time span the relative motion covers
        self.last_time: Optional[float] = None
        self.last_kf_time: Optional[float] = None
        # current tracked features: fixed capacity num_features
        N = c.num_features
        self.feat_px = np.zeros((N, 2), np.float32)
        self.feat_lm = np.full(N, -1, np.int64)   # global landmark ids
        self.feat_valid = np.zeros(N, bool)

        # IMU state (frontend.cpp imu_buf_ + Preintegrate/PredictState)
        self.imu_initialized = False
        self._imu_init_stage = 0    # retry ladder (initializer.cpp:58-130)
        self._imu_init_time = None  # wall time of the first successful init
        self._imu_init_min_kf = 0   # keyframes before this are poisoned
        # (a failed solve advances it, like the reference's init_time bump
        # after failure, frontend.cpp:150)
        self.cur_vel = np.zeros(3, np.float32)
        self.cur_bias = np.zeros(6, np.float32)
        self._imu_t: list = []
        self._imu_acc: list = []
        self._imu_gyr: list = []
        self._kf_t: list = []   # samples accumulated since the last keyframe
        self._kf_acc: list = []
        self._kf_gyr: list = []
        if c.use_imu:
            from lvio_fusion_tpu.ops.imu_preint import make_preintegrator
            self._preint = make_preintegrator(c.acc_n, c.gyr_n,
                                              c.acc_w, c.gyr_w)

        # lidar state (Estimator::InputPointCloud + FeatureAssociation)
        self._scans: list = []  # (time, np points in lidar frame)
        self._lidar_done = 0    # kfs refined by scan-to-map so far
        self.lidar_mapping = None
        if c.use_lidar:
            from lvio_fusion_tpu.lidar.mapping import LidarMapping
            from lvio_fusion_tpu.ops.lidar import make_feature_extractor

            self.lidar_extrinsic = (np.asarray(se3_identity())
                                    if lidar_extrinsic is None
                                    else np.asarray(lidar_extrinsic,
                                                    np.float32))
            self._lidar_extract = make_feature_extractor(
                c.num_scans, c.horizon_scan, c.ang_res_y, c.ang_bottom,
                c.ground_rows, c.min_range, c.max_range, c.resolution,
                c.max_ground, c.max_surf, cycle_time=c.cycle_time)
            self.lidar_mapping = LidarMapping(
                resolution=c.resolution, iters=c.lidar_iters,
                map_cap=c.lidar_map_cap, up_axis=c.lidar_up_axis)

        # global stage: pose graph + navsat + loop closure
        from lvio_fusion_tpu.loop.pose_graph import PoseGraph
        self.pose_graph = PoseGraph()
        self.navsat = None
        if c.use_navsat:
            from lvio_fusion_tpu.navsat.navsat import Navsat
            self.navsat = Navsat(accuracy=c.navsat_accuracy)
        self.relocator = None
        mode = c.relocator_mode & (1 | (2 if c.use_lidar else 0))
        if c.use_loop and mode:
            from lvio_fusion_tpu.loop.relocator import Relocator
            self.relocator = Relocator(
                self.lidar_mapping if c.use_lidar else None,
                threshold=c.loop_threshold,
                min_elapsed=c.loop_min_elapsed, up_axis=c.lidar_up_axis,
                resolution=c.resolution, mode=mode)
            self.relocator._cam = cam_left
            if mode & 1:
                from lvio_fusion_tpu.ops.descriptors import (
                    brief_descriptors_j,
                )
                self._brief = brief_descriptors_j
        self._navsat_sections_done = 0
        # adaptive factor weighting (reference Agent::SetCore; weights are
        # produced by the TD3 actor at keyframe creation)
        self.agent = None

    def set_agent(self, agent):
        self.agent = agent

    @classmethod
    def from_config(cls, path: str, height: int, width: int,
                    **overrides) -> "Estimator":
        """Build an Estimator from a reference-format YAML (e.g. the
        kitti.yaml shipped with lvio_fusion — same keys, including
        !!opencv-matrix extrinsics; estimator.cpp:17-166 wiring).

        Image dimensions aren't stored in the reference YAMLs, so they
        must be supplied.
        """
        from lvio_fusion_tpu.models.camera import Camera
        from lvio_fusion_tpu.utils import config as cfgmod

        c = cfgmod.load(path)
        flags = c.flags()
        cam0 = Camera.create(
            c.get("camera0.fx"), c.get("camera0.fy"),
            c.get("camera0.cx"), c.get("camera0.cy"),
            c.mat44_to_se3("body_to_cam0"),
            k1=c.get("camera0.k1", 0.0), k2=c.get("camera0.k2", 0.0),
            p1=c.get("camera0.p1", 0.0), p2=c.get("camera0.p2", 0.0))
        cam1 = Camera.create(
            c.get("camera1.fx"), c.get("camera1.fy"),
            c.get("camera1.cx"), c.get("camera1.cy"),
            c.mat44_to_se3("body_to_cam1"),
            k1=c.get("camera1.k1", 0.0), k2=c.get("camera1.k2", 0.0),
            p1=c.get("camera1.p1", 0.0), p2=c.get("camera1.p2", 0.0))
        lidar_ext = (np.asarray(c.mat44_to_se3("body_to_lidar"))
                     if "body_to_lidar" in c else None)

        parsed = dict(
            height=height, width=width,
            num_features=int(c.get("num_features", 500)),
            num_features_init=int(c.get("num_features_init", 50)),
            num_features_tracking_bad=int(
                c.get("num_features_tracking_bad", 20)),
            num_features_needed_for_keyframe=int(
                c.get("num_features_needed_for_keyframe", 120)),
            window_seconds=float(c.get("windows_size", 3)),
            use_imu=flags["use_imu"], use_lidar=flags["use_lidar"],
            use_navsat=flags["use_navsat"], use_loop=flags["use_loop"],
            num_scans=int(c.get("num_scans", 64)),
            horizon_scan=int(c.get("horizon_scan", 1800)),
            ang_res_y=float(c.get("ang_res_y", 0.427)),
            ang_bottom=float(c.get("ang_bottom", 24.9)),
            ground_rows=int(c.get("ground_rows", 60)),
            cycle_time=float(c.get("cycle_time", 0.1036)),
            min_range=float(c.get("min_range", 5)),
            max_range=float(c.get("max_range", 30)),
            resolution=float(c.get("resolution", 0.2)),
            acc_n=float(c.get("acc_n", 0.1)),
            gyr_n=float(c.get("gyr_n", 0.01)),
            acc_w=float(c.get("acc_w", 1e-3)),
            gyr_w=float(c.get("gyr_w", 1e-4)),
            g_norm=float(c.get("g_norm", 9.81007)),
            navsat_accuracy=float(c.get("accuracy", 1.0)),
            loop_threshold=float(c.get("threshold", 10.0)),
            visual_weight=float(c.get("camera0.fx", 500)) / 500.0,
            equalize_hist=bool(c.get("equalize_hist", 0)),
            navsat_v=bool(c.get("navsat_v", 0)),
            undistort=bool(c.get("undistort", 0)),
            remove_moving_points=bool(c.get("remove_moving_points", 1)),
            relocator_mode=int(c.get("relocator_mode", 2)),
        )
        # perf keys are OUR preset extension (the reference ships tuned
        # settings per dataset YAML the same way, config/kitti.yaml):
        # honored when present, absent keys fall to dataclass defaults
        # or caller overrides (cli._perf_overrides backend auto)
        for k, cast in (("frame_batch", int), ("pipelined_flush", bool),
                        ("dct_k", int), ("dct_quality", int),
                        ("dct_bits", int)):
            if k in c:
                parsed[k] = cast(c.get(k))
        parsed.update(overrides)  # caller overrides beat YAML values
        ecfg = EstimatorConfig(**parsed)
        est = cls(cam0, cam1, ecfg, lidar_extrinsic=lidar_ext)
        if flags.get("use_adapt"):
            # reference use_adapt wires the RL weight agent into the
            # backend (estimator.cpp Agent::SetCore); here the preset
            # names a policy pickle (default: the shipped artifact)
            import os as _os
            repo = _os.path.dirname(_os.path.dirname(_os.path.dirname(
                _os.path.abspath(__file__))))
            ppath = str(c.get("policy_path",
                              _os.path.join(repo, "misc", "td3_policy.pkl")))
            if _os.path.exists(ppath):
                from lvio_fusion_tpu.adapt.agent import Agent, load_policy
                from lvio_fusion_tpu.adapt.td3 import TD3
                est.set_agent(Agent(load_policy(TD3(seed=0), ppath)))
        return est

    def _kf_observation(self, kf_idx):
        """(4,12,3) observation grid for a new keyframe
        (Frame::GetObservation)."""
        from lvio_fusion_tpu.adapt.observation import observation_grid
        m = self.map
        if kf_idx == 0:
            return np.zeros((4, 12, 3), np.float32)
        prev_ids = {int(i): j for j, i in enumerate(m.obs_lm[kf_idx - 1])}
        ids = m.obs_lm[kf_idx]
        px = m.obs_px[kf_idx]
        n = len(ids)
        prev = np.zeros((max(n, 1), 2), np.float32)
        seen = np.zeros(max(n, 1), bool)
        for j, i in enumerate(ids):
            jj = prev_ids.get(int(i))
            if jj is not None:
                prev[j] = m.obs_px[kf_idx - 1][jj]
                seen[j] = True
        pxp = px if n else np.zeros((1, 2), np.float32)
        return np.asarray(observation_grid(
            jnp.asarray(pxp), jnp.asarray(prev), jnp.asarray(seen),
            self.cfg.height, self.cfg.width))

    # ------------------------------------------------------------------

    def input_navsat(self, time: float, p_enu):
        """Buffer one GNSS fix already converted to local ENU
        (Estimator::InputNavSat; the lat/lon/alt -> ENU conversion lives in
        the dataset layer, reference lvio_fusion_node.cpp:196-213)."""
        if self.navsat is None:
            return
        self.navsat.add_point(time, p_enu)

    def _run_global_stage(self):
        from lvio_fusion_tpu.utils.profiling import TIMERS
        with TIMERS.time("global.stage"):
            return self._run_global_stage_impl()

    def _run_global_stage_impl(self):
        """Deterministic replacement for the reference's GlobalLoop thread
        (backend.cpp:42-94) + Relocator thread: pose-graph sectioning,
        navsat section optimization + QuickFix, loop detection/correction,
        then the Backend::UpdateFrontend-equivalent forward pass."""
        from lvio_fusion_tpu.utils import np_se3
        m = self.map
        self.pose_graph.update_sections(m)
        poses0 = m.poses_array().copy() if m.num_kfs else None
        forward_start = m.num_kfs  # first kf of the rigid-only tail

        if self.navsat is not None:
            self.navsat.attach_keyframes(m)
            if not self.navsat.initialized:
                self.navsat.initialize(m)
            if self.navsat.initialized:
                sections = sorted(self.pose_graph.sections)
                for a in sections[self._navsat_sections_done:]:
                    sec = self.pose_graph.sections[a]
                    C = min(sec.C, m.num_kfs - 1)
                    old_pose = m.kf_pose[C].copy()
                    self.navsat.optimize_section(m, self.pose_graph, sec)
                    # rigid forward propagation of the section's net
                    # effect onto everything past C (GlobalLoop,
                    # backend.cpp:60-70) so segments awaiting their own
                    # optimization keep relative consistency
                    T = np_se3.se3_mul(
                        m.kf_pose[C], np_se3.se3_inv(old_pose)).astype(
                            np.float32)
                    if np.abs(T - _SE3_ID).max() > 1e-7:
                        self.pose_graph.forward_update(m, T, C + 1)
                        forward_start = min(forward_start, C + 1)
                self._navsat_sections_done = len(sections)
                fs = self.navsat.quick_fix(m, self.pose_graph,
                                           m.num_kfs - 1)
                if fs is not None:
                    forward_start = min(forward_start, fs)

        if self.relocator is not None:
            self.relocator.forward_start = 1 << 30
            self.relocator.process_keyframe(m, self.pose_graph,
                                            m.num_kfs - 1)
            forward_start = min(forward_start, self.relocator.forward_start)

        self._update_forward_keyframes(poses0, forward_start)

    def _update_forward_keyframes(self, poses0, forward_start: int):
        """Backend::UpdateFrontend equivalent after global corrections
        (backend.cpp:248-293): refresh landmark world caches from moved
        anchors, then re-solve each rigid-only tail keyframe's pose for
        ONE GN iteration against the corrected map — the rigid shift
        alone leaves the tail linearized against pre-correction geometry.
        Host-side numpy (a few hundred projections per kf), so the
        frontend never waits on an extra device dispatch."""
        m = self.map
        if poses0 is None or m.num_kfs == 0:
            return
        from lvio_fusion_tpu.core.hostmap import reworld_landmarks
        n0 = len(poses0)
        cur = m.poses_array()
        changed = np.ones(m.num_kfs, bool)
        changed[:n0] = np.abs(cur[:n0] - poses0).max(1) > 1e-7
        if not changed.any():
            return
        reworld_landmarks(m, self.cam_right, changed)
        if not self.cfg.forward_resolve:
            return
        from lvio_fusion_tpu.core.backend import pose_only_refine_np
        resolved = np.zeros(m.num_kfs, bool)
        for i in range(max(forward_start, 1), m.num_kfs):
            lm = m.obs_lm[i]
            if len(lm) < 8:
                continue
            pw = np.stack([m.lm_world[j] for j in lm])
            m.kf_pose[i] = pose_only_refine_np(
                m.kf_pose[i], pw, m.obs_px[i], m.obs_ok[i],
                self.cam_left, iters=1, weight=self.cfg.visual_weight)
            resolved[i] = True
        if resolved.any():
            # the re-solved tail kfs anchor landmarks of their own —
            # keep the world cache coherent with the new anchors
            reworld_landmarks(m, self.cam_right, resolved)

    def input_pointcloud(self, time: float, points):
        """Buffer one lidar scan (sensor-frame points)
        (Estimator::InputPointCloud)."""
        self._scans.append((float(time), np.asarray(points, np.float32)))
        # bound the buffer
        if len(self._scans) > 40:
            del self._scans[:-40]

    def _attach_kf_lidar(self, kf_idx, time):
        """Stitch the two raw scans bracketing the keyframe time into one
        full revolution centered on it (AlignScan, association.cpp:40-63),
        extract features, motion-deskew them to the keyframe instant
        (UndistortPoint, association.cpp:65-83), and store body-frame
        clouds — all inside ONE jitted program."""
        if not self._scans:
            return
        c = self.cfg
        from lvio_fusion_tpu.utils import np_se3
        T = c.cycle_time
        times = np.asarray([t for t, _ in self._scans])
        # scan timestamps are sweep STARTS; the window [time-T/2, time+T/2)
        # is covered by the last scan starting at/before the window start
        # plus its successor (AlignScan stitches exactly these two)
        i0 = int(np.searchsorted(times, time - 0.5 * T, side="right")) - 1
        i0 = max(i0, 0)
        if abs(times[i0] + 0.5 * T - time) > max(2.0 * T, 0.2):
            return  # no scan near the keyframe at all
        pair = [i0] + ([i0 + 1] if i0 + 1 < len(self._scans)
                       and times[i0 + 1] - times[i0] < 2.5 * T else [])
        P = c.max_scan_points
        buf = np.zeros((2 * P, 3), np.float32)
        msk = np.zeros(2 * P, bool)
        tb = np.zeros(2 * P, np.float32)
        for k, s in enumerate(pair):
            ts, pts = self._scans[s]
            n = min(len(pts), P)
            buf[k * P:k * P + n] = pts[:n]
            msk[k * P:k * P + n] = True
            tb[k * P:k * P + n] = ts - time
        # body twist over the last frame interval (constant-velocity; the
        # reference interpolates map poses — same signal at our cadence)
        xi = np_se3.se3_twist(self.relative, self._rel_dt) \
            if self._rel_dt > 0 else np.zeros(6, np.float32)
        f = self._lidar_extract.stitched(
            jnp.asarray(buf), jnp.asarray(msk), jnp.asarray(tb),
            jnp.asarray(xi), jnp.asarray(self.lidar_extrinsic))
        self.map.kf_lidar[kf_idx] = {
            "ground": np.asarray(f.ground),
            "ground_valid": np.asarray(f.ground_valid),
            "surf": np.asarray(f.surf),
            "surf_valid": np.asarray(f.surf_valid),
        }

    def _run_lidar_mapping(self):
        from lvio_fusion_tpu.utils.profiling import TIMERS
        with TIMERS.time("lidar.mapping"):
            return self._run_lidar_mapping_impl()

    def _run_lidar_mapping_impl(self):
        """Scan-to-map refine keyframes that left the BA window
        (backend.cpp:223-227 Mapping::Optimize on old kfs)."""
        ws = getattr(self.backend, "last_window_start", 0)
        for j in range(self._lidar_done, ws):
            self.lidar_mapping.refine(self.map, j)
        self._lidar_done = max(self._lidar_done, ws)

    def finalize(self):
        """Flush pending refinements (end of sequence; the reference's
        'e'-key final navsat optimization, lvio_fusion_node.cpp:387-393)."""
        if self._pipe_step is not None:
            self._drain_pipe()
        if self._fbuf:
            # drain buffered frames through the per-frame path
            leftover, self._fbuf = self._fbuf, []
            for t, left_u8, right_u8 in leftover:
                if self.status == self.BUILDING:
                    self._build_frame(t, left_u8, right_u8)
                else:
                    self._track_single(t, left_u8, right_u8)
        corr = self._finish_pending_ba()
        if corr is not None:
            from lvio_fusion_tpu.utils import np_se3
            self.last_pose = np_se3.se3_mul(
                corr, self.last_pose).astype(np.float32)
        if self.cfg.use_lidar:
            for j in range(self._lidar_done, self.map.num_kfs):
                self.lidar_mapping.refine(self.map, j)
            self._lidar_done = self.map.num_kfs
        if self.cfg.use_navsat or self.cfg.use_loop:
            self._run_global_stage()
        if self.relocator is not None:
            # an open loop-detection run ends with the stream
            self.relocator.flush(self.map, self.pose_graph)

    def input_imu(self, time: float, acc, gyr):
        """Buffer one IMU sample (Estimator::InputImu)."""
        self._imu_t.append(float(time))
        self._imu_acc.append(np.asarray(acc, np.float32))
        self._imu_gyr.append(np.asarray(gyr, np.float32))

    def _consume_imu(self, t_from, t_to):
        """Pop buffered samples in (t_from, t_to]; returns (t, acc, gyr)."""
        take = 0
        while take < len(self._imu_t) and self._imu_t[take] <= t_to:
            take += 1
        ts = self._imu_t[:take]
        accs = self._imu_acc[:take]
        gyrs = self._imu_gyr[:take]
        del self._imu_t[:take], self._imu_acc[:take], self._imu_gyr[:take]
        return ts, accs, gyrs

    def _preint_buffers(self, ts, accs, gyrs, cap, bias):
        """Fixed-capacity preintegration of a host sample list. The first
        sample is the integration anchor (its dt must be 0)."""
        n = min(len(ts), cap)
        acc = np.zeros((cap, 3), np.float32)
        gyr = np.zeros((cap, 3), np.float32)
        dt = np.zeros((cap,), np.float32)
        acc[:n] = accs[:n]
        gyr[:n] = gyrs[:n]
        for i in range(1, n):
            dt[i] = max(0.0, ts[i] - ts[i - 1])
        return self._preint(jnp.asarray(acc), jnp.asarray(gyr),
                            jnp.asarray(dt), jnp.asarray(bias[:3]),
                            jnp.asarray(bias[3:]))

    # ------------------------------------------------------------------

    def _sync_device_state(self):
        """Upload the host tracking state to the device chain (called when
        host-side events — keyframes, re-inits, global corrections —
        mutate features, landmark positions, or the pose)."""
        # drop live features whose landmark was retired by the backend's
        # outlier lifecycle (reference Map::RemoveLandmark ripples into the
        # frontend feature set)
        for k in np.where(self.feat_valid)[0]:
            if not self.map.lm_alive[self.feat_lm[k]]:
                self.feat_valid[k] = False
        lm_world = np.zeros((len(self.feat_lm), 3), np.float32)
        sel = self.feat_valid
        if sel.any():
            lm_world[sel] = np.stack(
                [self.map.lm_world[i] for i in self.feat_lm[sel]])
        self._dev = dict(
            pyr=self.last_pyr,
            feat_px=jnp.asarray(self.feat_px),
            feat_valid=jnp.asarray(self.feat_valid),
            lm_world=jnp.asarray(lm_world),
            pose=jnp.asarray(self.last_pose),
            relative=jnp.asarray(self.relative))

    @staticmethod
    def _to_u8(img):
        img = np.asarray(img)
        if img.dtype == np.uint8:
            return img
        return np.clip(img * 255.0, 0, 255).astype(np.uint8)

    def _stage_payload(self, img):
        """Worker-thread u8-coerce + encode + async device_put of one
        image payload (the put enqueues the wire transfer immediately;
        the returned device array is passed straight into the flush
        program). Coercing here keeps float-input conversions off the
        per-frame main-thread path — buffered frames hand the raw array
        to the pool and pay nothing until the worker picks it up."""
        return jax.device_put(self._dct(self._to_u8(img)))

    def _img_dev(self, img):
        """Device payload for one image: the raw u8 array, or the
        (nb, K+2) int8 DCT payload when cfg.dct_k is enabled
        (ops/dct.py). Accepts an already-encoded payload or an in-flight
        encode future unchanged — buffered frames drained through the
        per-frame path arrive that way; float inputs are u8-coerced."""
        if hasattr(img, "result"):
            img = img.result()
        if self._dct is None:
            return jnp.asarray(self._to_u8(img))
        if getattr(img, "dtype", None) == np.int8:
            return jnp.asarray(img)  # already encoded
        return jnp.asarray(self._dct(self._to_u8(img)))

    def input_image(self, time: float, img_left, img_right,
                    init_pose=None) -> np.ndarray:
        """Process one stereo pair (uint8 or [0,1] float grayscale);
        returns the current pose estimate."""
        from lvio_fusion_tpu.utils.profiling import TIMERS
        with TIMERS.time("frontend.frame"):
            return self._input_image(time, img_left, img_right,
                                     init_pose)

    def _input_image(self, time, img_left, img_right, init_pose=None):
        # undistortion (cfg.undistort) happens ON-DEVICE inside the frame
        # programs (frontend._pyramid) — the old standalone path cost two
        # dispatches + two image downloads per frame through the tunnel
        img_left = self._to_u8(img_left)
        img_right_u8 = None  # converted lazily (only needed at keyframes)

        if self.status != self.BUILDING and (
                self._batch_step is not None
                or self._pipe_step is not None):
            return self._input_image_batched(time, img_left, img_right)

        if self.status == self.BUILDING:
            return self._build_frame(time, img_left, img_right, init_pose)

        return self._track_single(time, img_left, img_right)

    def _build_frame(self, time, img_left_u8, img_right, init_pose=None):
        """BUILDING state: try to bootstrap the map from this frame."""
        if self.cfg.use_imu:
            # drain stale samples; keep the newest as the integration
            # anchor for the first keyframe interval
            ts, accs, gyrs = self._consume_imu(-np.inf, time)
            self._kf_t += ts
            self._kf_acc += accs
            self._kf_gyr += gyrs
            self._reset_kf_imu_buffer()
        pose = (np.asarray(se3_identity()) if init_pose is None
                else np.asarray(init_pose, np.float32))
        pyr_left = self.preprocess(self._img_dev(img_left_u8))
        ok = self._init_map(time, pyr_left, self._to_u8(img_right), pose)
        if ok:
            self.status = self.TRACKING
        self.last_pyr = pyr_left
        self.last_pose = pose
        self.last_time = time
        return self.last_pose

    def _track_single(self, time, img_left, img_right):
        # ---- per-frame tracking ----
        from lvio_fusion_tpu.utils import np_se3
        ext_pred = np.zeros(7, np.float32)
        ext_pred[0] = 1.0
        use_ext = False
        if self.cfg.use_imu:
            ts, accs, gyrs = self._consume_imu(self.last_time, time)
            self._kf_t += ts
            self._kf_acc += accs
            self._kf_gyr += gyrs
            if self.imu_initialized and len(ts) >= 2:
                # IMU state prediction (frontend.cpp PredictState)
                from lvio_fusion_tpu.ops.imu_preint import predict_state
                p = self._preint_buffers(ts, accs, gyrs,
                                         self.cfg.imu_frame_buf,
                                         self.cur_bias)
                pose_j, vel_j = predict_state(
                    p, jnp.asarray(self.last_pose),
                    jnp.asarray(self.cur_vel),
                    jnp.asarray(self.cur_bias[:3]),
                    jnp.asarray(self.cur_bias[3:]),
                    jnp.float32(self.cfg.g_norm))
                ext_pred = np.asarray(pose_j)
                self.cur_vel = np.asarray(vel_j)
                use_ext = True
        if (not use_ext and self.cfg.navsat_v and self.navsat is not None
                and self.navsat.initialized and self.map.num_kfs >= 2
                and self.last_time is not None and time > self.last_time):
            # GPS-speed seeding of the frame prediction (frontend.cpp:
            # 104-106 navsat_v + check_velocity's forward override
            # relative[3] = v*dt): rescale the constant-velocity
            # prediction's translation to the GPS-measured speed — VO
            # scale drift cannot run away from the GNSS track
            t2 = self.map.kf_time[-1]
            t1 = self.map.kf_time[-2]
            v = self.navsat.speed(t2, t1)
            if v > 0:
                dt = time - self.last_time
                rel = self.relative.copy()
                n = float(np.linalg.norm(rel[4:]))
                if n > 1e-6:
                    scale = np.clip((v * dt) / n, 0.25, 4.0)
                    rel[4:] *= scale
                    ext_pred = np_se3.se3_mul(self.last_pose, rel)
                    use_ext = True

        # device-chained step: all tracking state stays on device between
        # frames; one image upload, one dispatch, one packed fetch
        from lvio_fusion_tpu.core.frontend import unpack_track_result
        if self._dev is None:
            self._sync_device_state()
        d = self._dev
        (pyr_cur, fpx_d, fval_d, pose_d, rel_d, packed) = \
            self.frame_step_chained(
                self._img_dev(img_left), d["pyr"], d["feat_px"],
                d["feat_valid"], d["lm_world"], d["pose"], d["relative"],
                jnp.asarray(ext_pred), jnp.asarray(use_ext))
        self._dev = dict(pyr=pyr_cur, feat_px=fpx_d, feat_valid=fval_d,
                         lm_world=d["lm_world"], pose=pose_d,
                         relative=rel_d)
        pyr_left = pyr_cur
        pts, ok, pose, n_inliers = unpack_track_result(
            packed, self.cfg.num_features)
        self.feat_px = pts.copy()
        self.feat_valid = ok.copy()

        need_sync = False
        if n_inliers <= self.cfg.num_features_tracking_bad:
            # tracking lost. With an initialized IMU the reference first
            # disables the IMU and re-initializes later
            # (frontend.cpp:121-127 ResetImu); then re-init the map in
            # place keeping the extrapolated pose (frontend.cpp:129-137)
            if self.imu_initialized:
                self.imu_initialized = False
                self._imu_init_stage = 0
            self.status = self.LOST
            pose = (ext_pred if use_ext
                    else np_se3.se3_mul(self.last_pose, self.relative))
            corr = self._finish_pending_ba()
            if corr is not None:
                pose = np_se3.se3_mul(corr, pose).astype(np.float32)
            self.feat_valid[:] = False
            if self._init_map(time, pyr_left, self._to_u8(img_right), pose):
                self.status = self.TRACKING
            need_sync = True
        else:
            need_kf = (n_inliers < self.cfg.num_features_needed_for_keyframe
                       or time - self.last_kf_time
                       >= self.cfg.max_keyframe_interval)
            if need_kf:
                pose = self._create_keyframe(time, pyr_left,
                                             self._to_u8(img_right), pose)
                need_sync = True

        # update constant-velocity model with the (refined) relative motion,
        # normalized per unit time like relative_i_j in the reference
        if self.last_time is not None and time > self.last_time:
            self.relative = np_se3.se3_mul(np_se3.se3_inv(self.last_pose),
                                           pose)
            self._rel_dt = time - self.last_time
        self.last_pose = pose
        self.last_pyr = pyr_left
        self.last_time = time
        if need_sync:
            # host events changed features/landmarks/pose: re-seed the
            # device chain
            self._sync_device_state()
        return pose

    # ------------------------------------------------------------------
    # batched tracking (frame_batch > 1): B frames per device round trip

    def _input_image_batched(self, time, img_left_u8, img_right):
        """Buffer one frame; every frame_batch-th frame flushes the whole
        buffer through ONE jitted program (tracking for B frames + a
        speculative keyframe stage). Intermediate frames return the
        constant-velocity extrapolated pose; refined poses land in the
        keyframe map at flush time."""
        from lvio_fusion_tpu.utils import np_se3
        if self._pipe_step is not None:
            # pre-stage encode AND device_put NOW (worker thread): the
            # transfer enqueues while the in-flight batch computes instead
            # of paying B separate slow-mode puts at flush dispatch
            staged = (self._enc_pool.submit(self._stage_payload,
                                            img_left_u8)
                      if self._dct is not None
                      else jax.device_put(img_left_u8))
            # the right image stays RAW in the buffer: only the flush
            # frame's right ever enters the keyframe stage, so per-frame
            # u8 conversion of float inputs (~1.5 ms of clip+cast on a
            # 376x1241 frame) would be pure waste for B-1 of B frames
            right = img_right
            flushing = len(self._fbuf) + 1 >= self.cfg.frame_batch
            if flushing and self._dct is not None:
                # stage the flush frame's encode+put so it overlaps the
                # dispatch-side arg packing (u8 coercion rides the worker)
                right = self._enc_pool.submit(self._stage_payload, right)
            self._fbuf.append((float(time), staged, right))
            if flushing:
                return self._flush_pipe()
        else:
            # encode at buffering time (the pool overlaps per-frame
            # encodes instead of serializing them into the flush)
            left = (self._enc_pool.submit(self._dct, img_left_u8)
                    if self._dct is not None else img_left_u8)
            self._fbuf.append((float(time), left, img_right))
            if len(self._fbuf) >= self.cfg.frame_batch:
                return self._flush_batch()
        n = len(self._fbuf)
        ex = self._extrap
        if ex is not None and ex[1] == n - 1 and ex[2] is self.last_pose:
            # self.relative only changes at flush/correction time, where
            # last_pose is reassigned too — the base identity check makes
            # the incremental step exact
            p = np_se3.se3_mul(ex[0], self.relative)
        else:
            p = self.last_pose
            for _ in range(n):
                p = np_se3.se3_mul(p, self.relative)
        self._extrap = (p, n, self.last_pose)
        return p

    def _flush_batch(self):
        from lvio_fusion_tpu.core.frontend import (
            KeyframeResult, unpack_track_result,
        )
        from lvio_fusion_tpu.utils import np_se3
        buf, self._fbuf = self._fbuf, []
        B = self.cfg.frame_batch
        assert len(buf) == B
        times = [t for t, _, _ in buf]
        # ONE async device_put of the stacked batch (a synchronous
        # jnp.asarray here blocked ~100 ms on the tunnel; per-frame puts
        # at buffering time cost ~5 ms of enqueue RTT each)
        from lvio_fusion_tpu.utils.profiling import TIMERS
        with TIMERS.time("frontend.flush.upload"):
            if self._dct is not None:
                # left frames were encoded at buffering time (pool
                # futures): ONE put of the stacked (B, nb, K+2) int8
                # payload — ~4x fewer bytes than raw u8 (the upload is
                # the tunnel's bottleneck) and one call (the slow-mode
                # relay charges ~ms per put)
                imgs = jax.device_put(
                    np.stack([l.result() for _, l, _ in buf]))
                right_dev = jax.device_put(
                    self._dct(self._to_u8(buf[-1][2])))
            else:
                imgs = jax.device_put(np.stack([l for _, l, _ in buf]))
                right_dev = jax.device_put(self._to_u8(buf[-1][2]))

        C = self._batch_imu_cap
        if C:
            # slice consumed samples into per-frame windows: each frame's
            # window is anchored on the last sample of the previous one
            # (dt[0]=0 anchor row, preintegrate() conventions) so the
            # batched program can chain on-device IMU pose/vel prediction
            # (frontend.cpp PredictState, zero extra dispatches)
            imu_acc = np.zeros((B, C, 3), np.float32)
            imu_gyr = np.zeros((B, C, 3), np.float32)
            imu_dt = np.zeros((B, C), np.float32)
            imu_on = np.zeros(B, bool)
            anchor = ((self._kf_t[-1], self._kf_acc[-1], self._kf_gyr[-1])
                      if self._kf_t else None)
            t_prev = self.last_time
            for b, tb in enumerate(times):
                ts, accs, gyrs = self._consume_imu(t_prev, tb)
                self._kf_t += ts
                self._kf_acc += accs
                self._kf_gyr += gyrs
                if self.imu_initialized:
                    at = ([anchor[0]] + ts) if anchor else list(ts)
                    aa = ([anchor[1]] + accs) if anchor else list(accs)
                    ag = ([anchor[2]] + gyrs) if anchor else list(gyrs)
                    n = min(len(at), C)
                    if n >= 2:
                        imu_acc[b, :n] = aa[:n]
                        imu_gyr[b, :n] = ag[:n]
                        for i in range(1, n):
                            imu_dt[b, i] = max(0.0, at[i] - at[i - 1])
                        imu_on[b] = True
                if ts:
                    anchor = (ts[-1], accs[-1], gyrs[-1])
                t_prev = tb
        elif self.cfg.use_imu:
            ts, accs, gyrs = self._consume_imu(self.last_time, times[-1])
            self._kf_t += ts
            self._kf_acc += accs
            self._kf_gyr += gyrs

        from lvio_fusion_tpu.utils.profiling import TIMERS
        if self._dev is None:
            self._sync_device_state()
        d = self._dev
        # time-trigger half of the keyframe decision, known BEFORE the
        # dispatch (no keyframe can appear mid-batch); the inlier half is
        # computed on-device so the cond'd keyframe stage fires exactly
        # when the host's post-fetch decision will ask for its result
        force_kf = np.asarray(
            self.last_kf_time is None
            or times[-1] - self.last_kf_time
            >= self.cfg.max_keyframe_interval)
        with TIMERS.time("frontend.flush.dispatch"):
            common = (imgs, right_dev, d["pyr"],
                      d["feat_px"], d["feat_valid"], d["lm_world"],
                      d["pose"], d["relative"])
            if C:
                (pyr_cur, fpx_d, fval_d, pose_d, rel_d, packed, kf_packed,
                 vel_d) = self._batch_step(
                    *common, jnp.asarray(imu_acc), jnp.asarray(imu_gyr),
                    jnp.asarray(imu_dt), jnp.asarray(imu_on),
                    jnp.asarray(self.cur_vel), jnp.asarray(self.cur_bias),
                    force_kf)
            else:
                if self._ext_zero is None:
                    ext_preds = np.zeros((B, 7), np.float32)
                    ext_preds[:, 0] = 1.0
                    self._ext_zero = (jax.device_put(ext_preds),
                                      jax.device_put(np.zeros(B, bool)))
                (pyr_cur, fpx_d, fval_d, pose_d, rel_d, packed,
                 kf_packed) = self._batch_step(*common, *self._ext_zero,
                                               force_kf)
        self._dev = dict(pyr=pyr_cur, feat_px=fpx_d, feat_valid=fval_d,
                         lm_world=d["lm_world"], pose=pose_d,
                         relative=rel_d)
        self.last_pyr = pyr_cur  # _sync_device_state re-seeds from this
        with TIMERS.time("frontend.flush.fetch"):
            # one sync for everything the host needs this flush — incl.
            # the PREVIOUS keyframe's in-flight BA result (each extra
            # device_get is a full slow-mode sync, ~30 ms on the relay)
            pend = self._pending_ba
            extra = (pend.flat,) if pend is not None else ()
            if C:
                got = jax.device_get((packed, kf_packed, vel_d) + extra)
                packed_np, kf_np, vel_np = got[:3]
                if self.imu_initialized:
                    # IMU-propagated velocity across the batch; a pending
                    # BA correction (finished inside _create_keyframe)
                    # rotates it
                    self.cur_vel = np.asarray(vel_np, np.float32)
            else:
                got = jax.device_get((packed, kf_packed) + extra)
                packed_np, kf_np = got[:2]
            if pend is not None:
                self._pending_ba = pend._replace(flat=got[-1])
        rows = [unpack_track_result(packed_np[b], self.cfg.num_features)
                for b in range(B)]
        inliers = [r[3] for r in rows]

        lost_at = next((b for b in range(B)
                        if inliers[b] <= self.cfg.num_features_tracking_bad),
                       None)
        if lost_at is not None:
            # tracking collapsed inside the batch: extrapolate over the bad
            # frames and re-initialize the map from the speculative
            # detection, re-worlded under the corrected pose
            # (frontend.cpp:121-137 LOST handling)
            if self.imu_initialized:
                self.imu_initialized = False
                self._imu_init_stage = 0
            self.status = self.LOST
            pose = (rows[lost_at - 1][2] if lost_at > 0 else self.last_pose)
            for _ in range(B - lost_at if lost_at > 0 else B):
                pose = np_se3.se3_mul(pose, self.relative)
            corr = self._finish_pending_ba()
            if corr is not None:
                pose = np_se3.se3_mul(corr, pose)
            self.feat_valid[:] = False
            valid = kf_np[:, 8] > 0.5
            if valid.sum() >= self.cfg.num_features_init:
                from lvio_fusion_tpu.core.frontend import (
                    unpack_keyframe_desc,
                )
                world = np_se3.se3_apply_batch(pose, kf_np[:, 9:12])
                kf = KeyframeResult(
                    new_px_left=kf_np[:, 0:2], new_px_right=kf_np[:, 2:4],
                    inv_depth=kf_np[:, 4], world=world, valid=valid)
                desc, desc_ok = unpack_keyframe_desc(kf_np)
                kf_idx = self.map.add_keyframe(
                    times[-1], pose, weights=np.array(
                        [self.cfg.visual_weight, 1.0, 0.01], np.float32))
                self._insert_new_landmarks(kf_idx, kf, valid, descs=desc,
                                           descs_ok=desc_ok)
                self.last_kf_time = times[-1]
                self.status = self.TRACKING
            else:
                # keep falling back to the per-frame path until re-init
                self.status = self.BUILDING
            self.last_pose = pose.astype(np.float32)
            self.last_time = times[-1]
            self._sync_device_state()
            return self.last_pose

        pose = rows[-1][2]
        self.feat_px = rows[-1][0].copy()
        self.feat_valid = rows[-1][1].copy()
        if B >= 2:
            self.relative = np_se3.se3_mul(np_se3.se3_inv(rows[-2][2]), pose)
            self._rel_dt = times[-1] - times[-2]
        elif self.last_time is not None:
            self.relative = np_se3.se3_mul(np_se3.se3_inv(self.last_pose),
                                           pose)
            self._rel_dt = times[-1] - self.last_time

        need_kf = (min(inliers) < self.cfg.num_features_needed_for_keyframe
                   or times[-1] - self.last_kf_time
                   >= self.cfg.max_keyframe_interval)
        if need_kf:
            pose = self._create_keyframe(times[-1], pyr_cur, buf[-1][2],
                                         pose, kf_packed=kf_np)
        self.last_pose = np.asarray(pose, np.float32)
        self.last_time = times[-1]
        if need_kf:
            self._sync_device_state()
        return self.last_pose

    # ------------------------------------------------------------------
    # lag-1 pipelined frontend (cfg.pipelined_flush): the device chain
    # runs a batch AHEAD of the host mirror. Each flush (a) dispatches
    # the new batch chained on device state, then (b) processes the
    # PREVIOUS batch's results while the device computes — keyframe
    # decisions + feature merges already happened ON-DEVICE, the host
    # just mirrors them into the map one batch late. Rigid map
    # corrections (BA writeback, gravity alignment, global-stage tails)
    # accumulate in self._corr_total and are injected into the chain at
    # the next dispatch; canonical landmark worlds are re-injected with a
    # per-slot generation guard. Mirrors the reference's never-blocking
    # frontend/backend split (backend.cpp:28-40) at batch granularity.

    @staticmethod
    def _pack_pipe_aux(corr, use_corr, dts, lm_refresh, imu_parts,
                       refresh_gen, kill_gen, gen):
        """Single source of truth for the packed per-flush aux layout
        consumed by frontend.make_pipe_step (static offsets). Used by
        `_flush_pipe` and by `neutral_pipe_aux` (the device profiler's
        probe args, misc/prof_pipe.py) so the two can never drift."""
        aux_f32 = np.concatenate(
            [np.asarray(corr, np.float32).ravel(),
             np.array([1.0 if use_corr else 0.0], np.float32),
             np.asarray(dts, np.float32).ravel(),
             np.asarray(lm_refresh, np.float32).ravel()]
            + list(imu_parts)).astype(np.float32)
        aux_i32 = np.concatenate(
            [np.asarray(refresh_gen, np.int32),
             np.asarray(kill_gen, np.int32),
             np.array([gen], np.int32)]).astype(np.int32)
        return aux_f32, aux_i32

    def neutral_pipe_aux(self, dt=0.1, gen=99):
        """Probe-neutral packed per-flush aux (identity correction, no
        landmark refresh/kill, uniform frame dt, no IMU): the dispatch
        payload misc/prof_pipe.py times raw pipe_step execution with."""
        c = self.cfg
        N = c.num_features
        return self._pack_pipe_aux(
            corr=np.array([1, 0, 0, 0, 0, 0, 0], np.float32),
            use_corr=False,
            dts=np.full(c.frame_batch, dt, np.float32),
            lm_refresh=np.zeros((N, 3), np.float32),
            imu_parts=[],
            refresh_gen=np.full(N, -1, np.int32),
            kill_gen=np.full(N, -1, np.int32),
            gen=gen)

    def _flush_pipe(self):
        from lvio_fusion_tpu.utils import np_se3
        from lvio_fusion_tpu.utils.profiling import TIMERS
        buf, self._fbuf = self._fbuf, []
        prev = self._pending_flush
        with TIMERS.time("frontend.pipe.dispatch"):
            self._pending_flush = self._dispatch_pipe(buf)
        if prev is not None:
            with TIMERS.time("frontend.pipe.process"):
                self._process_flush(prev)
        # best-effort pose for the caller: the processed state
        # extrapolated over the (still in-flight) batch
        p = self.last_pose
        for _ in range(self.cfg.frame_batch):
            p = np_se3.se3_mul(p, self.relative)
        return p.astype(np.float32)

    def _dispatch_pipe(self, buf):
        """Launch the pipe program on the device chain (seeding a fresh
        chain from the host mirror when none exists); returns the handles
        needed to mirror the results later."""
        from lvio_fusion_tpu.utils import np_se3
        c = self.cfg
        B = c.frame_batch
        N = c.num_features
        m = self.map
        times = [t for t, _, _ in buf]
        t_prev0 = (self._pipe_last_time if self._pipe_last_time is not None
                   else self.last_time)

        # per-frame IMU windows, consumed NOW; the raw slices ride in the
        # handles and enter the keyframe buffers at PROCESSING time (the
        # host's _kf buffers must stay in batch order)
        C = self._batch_imu_cap
        imu_parts = []
        imu_samples = []
        if c.use_imu:
            imu_acc = np.zeros((B, max(C, 1), 3), np.float32)
            imu_gyr = np.zeros((B, max(C, 1), 3), np.float32)
            imu_dt = np.zeros((B, max(C, 1)), np.float32)
            imu_on = np.zeros(B, bool)
            anchor = self._pipe_imu_anchor
            t_prev = t_prev0
            for b, tb in enumerate(times):
                ts, accs, gyrs = self._consume_imu(t_prev, tb)
                imu_samples.append((ts, accs, gyrs))
                if C and self.imu_initialized:
                    at = ([anchor[0]] + ts) if anchor else list(ts)
                    aa = ([anchor[1]] + accs) if anchor else list(accs)
                    ag = ([anchor[2]] + gyrs) if anchor else list(gyrs)
                    n = min(len(at), C)
                    if n >= 2:
                        imu_acc[b, :n] = aa[:n]
                        imu_gyr[b, :n] = ag[:n]
                        for i in range(1, n):
                            imu_dt[b, i] = max(0.0, at[i] - at[i - 1])
                        imu_on[b] = True
                if ts:
                    anchor = (ts[-1], accs[-1], gyrs[-1])
                t_prev = tb
            self._pipe_imu_anchor = anchor
            if C:
                imu_parts = [self.cur_bias.astype(np.float32),
                             imu_on.astype(np.float32), imu_acc.ravel(),
                             imu_gyr.ravel(), imu_dt.ravel()]

        if self._pipe is None:
            # seed a fresh chain from the host mirror
            for k in np.where(self.feat_valid)[0]:
                if not m.lm_alive[self.feat_lm[k]]:
                    self.feat_valid[k] = False
            lm_world = np.zeros((N, 3), np.float32)
            sel = self.feat_valid
            if sel.any():
                lm_world[sel] = np.stack(
                    [m.lm_world[i] for i in self.feat_lm[sel]])
            if self._slot_gen is None:
                self._slot_gen = np.zeros(N, np.int32)
            t_since = (self.last_time - self.last_kf_time
                       if self.last_kf_time is not None else 0.0)
            self._pipe = dict(
                pyr=self.last_pyr,
                feat_px=jnp.asarray(self.feat_px),
                feat_valid=jnp.asarray(self.feat_valid),
                feat_gen=jnp.asarray(self._slot_gen),
                lm_world=jnp.asarray(lm_world),
                pose=jnp.asarray(self.last_pose),
                relative=jnp.asarray(self.relative),
                vel=jnp.asarray(self.cur_vel),
                t_since_kf=jnp.float32(t_since))
            self._corr_injected = self._corr_total.copy()

        # injections: rigid correction delta + canonical world refresh
        corr = np_se3.se3_mul(self._corr_total,
                              np_se3.se3_inv(self._corr_injected))
        use_corr = bool(np.abs(corr - np.array(
            [1, 0, 0, 0, 0, 0, 0], np.float32)).max() > 1e-7)
        self._corr_injected = self._corr_total.copy()
        lm_refresh = np.zeros((N, 3), np.float32)
        refresh_gen = np.full(N, -1, np.int32)
        kill_gen = np.full(N, -1, np.int32)
        for s in np.where(self.feat_valid & (self.feat_lm >= 0))[0]:
            lid = int(self.feat_lm[s])
            if m.lm_alive[lid]:
                lm_refresh[s] = m.lm_world[lid]
                refresh_gen[s] = self._slot_gen[s]
            else:
                kill_gen[s] = self._slot_gen[s]
                self.feat_valid[s] = False

        gen = self._pipe_gen
        self._pipe_gen += 1
        dts = np.diff([t_prev0 if t_prev0 is not None else times[0]]
                      + times).astype(np.float32)
        # ONE f32 + ONE i32 upload for all small per-flush args (each
        # separate jnp.asarray is a full slow-mode relay enqueue)
        aux_f32, aux_i32 = self._pack_pipe_aux(
            corr, use_corr, dts, lm_refresh, imu_parts,
            refresh_gen, kill_gen, gen)
        p = self._pipe
        out = self._pipe_step(
            tuple(self._img_dev(l) for _, l, _ in buf),
            self._img_dev(buf[-1][2]),
            p["pyr"], p["feat_px"], p["feat_valid"], p["feat_gen"],
            p["lm_world"], p["pose"], p["relative"], p["vel"],
            p["t_since_kf"], jnp.asarray(aux_f32), jnp.asarray(aux_i32))
        (pyr, fpx, fval, fgen, lmw, pose, rel, vel, t_since,
         packed, kf_packed, extras) = out
        self._pipe = dict(pyr=pyr, feat_px=fpx, feat_valid=fval,
                          feat_gen=fgen, lm_world=lmw, pose=pose,
                          relative=rel, vel=vel, t_since_kf=t_since)
        self._pipe_last_time = times[-1]
        return dict(packed=packed, kf=kf_packed, extras=extras, vel=vel,
                    pyr=pyr, times=times, gen=gen,
                    imu_samples=imu_samples,
                    frame=self._corr_total.copy(), discard=False)

    def _process_flush(self, h):
        """Mirror one finished batch into the host map (runs while the
        device computes the NEXT batch)."""
        from lvio_fusion_tpu.core.frontend import (
            unpack_keyframe_desc, unpack_keyframe_robot,
            unpack_track_result,
        )
        from lvio_fusion_tpu.utils import np_se3
        c, m = self.cfg, self.map
        B, N = c.frame_batch, c.num_features
        for ts, accs, gyrs in h["imu_samples"]:
            self._kf_t += ts
            self._kf_acc += accs
            self._kf_gyr += gyrs
        if h["discard"]:
            return
        from lvio_fusion_tpu.utils.profiling import TIMERS
        with TIMERS.time("frontend.pipe.fetch"):
            # blocks until the batch program has finished AND the result
            # crossed the wire — this is device-residual + transfer time,
            # not host work (split out so stats runs show which side of
            # the pipeline is the throughput ceiling). The PREVIOUS
            # keyframe's in-flight BA result rides the same sync (each
            # extra device_get is a full slow-mode relay sync, ~30 ms).
            pend = self._pending_ba
            extra = (pend.flat,) if pend is not None else ()
            got = jax.device_get(
                (h["packed"], h["kf"], h["extras"], h["vel"]) + extra)
            packed_np, kf_np, extras_np, vel_np = got[:4]
            if pend is not None:
                self._pending_ba = pend._replace(flat=got[-1])
        rows = [unpack_track_result(packed_np[b], N) for b in range(B)]
        assigned = extras_np[:N].astype(np.int32)
        need_kf = extras_np[N] > 0.5
        times = h["times"]
        # corrections applied to the map since this batch was dispatched
        dC = np_se3.se3_mul(self._corr_total, np_se3.se3_inv(h["frame"]))

        self.last_pyr = h["pyr"]  # the mirror's frame (LOST re-seed /
        # finalize / checkpoint all track from this batch's final image)
        lost_at = next(
            (b for b in range(B)
             if rows[b][3] <= c.num_features_tracking_bad), None)
        if lost_at is not None:
            self._process_pipe_lost(rows, kf_np, times, lost_at, dC)
            return

        pose = np_se3.se3_mul(dC, rows[-1][2]).astype(np.float32)
        self.feat_px = rows[-1][0].copy()
        self.feat_valid = rows[-1][1].copy()
        if B >= 2:
            self.relative = np_se3.se3_mul(
                np_se3.se3_inv(rows[-2][2]), rows[-1][2])
            self._rel_dt = times[-1] - times[-2]
        self.cur_vel = np_se3.quat_rotate(dC[:4], vel_np).astype(np.float32)

        if need_kf:
            pose = self._process_pipe_keyframe(h, kf_np, assigned, pose,
                                               times)
        self.last_pose = np.asarray(pose, np.float32)
        self.last_time = times[-1]

    def _process_pipe_keyframe(self, h, kf_np, assigned, pose, times):
        """Host mirror of a device-side keyframe: map insertion,
        landmark allocation (with covisibility re-association), BA
        dispatch, lidar/global stages. All rigid pose changes to the new
        kf fold into self._corr_total for later chain injection."""
        from lvio_fusion_tpu.core.frontend import (
            unpack_keyframe_desc, unpack_keyframe_robot,
        )
        from lvio_fusion_tpu.utils import np_se3
        c, m = self.cfg, self.map

        corr = self._finish_pending_ba()
        if corr is not None:
            pose = np_se3.se3_mul(corr, pose).astype(np.float32)
            self._corr_total = np_se3.se3_mul(
                corr, self._corr_total).astype(np.float32)
            if c.use_imu and self.imu_initialized:
                self.cur_vel = np_se3.quat_rotate(
                    corr[:4], self.cur_vel).astype(np.float32)
                self.cur_bias = m.kf_bias[m.num_kfs - 1].copy()

        kf_idx = m.add_keyframe(
            times[-1], pose, vel=self.cur_vel, bias=self.cur_bias,
            weights=np.array([c.visual_weight, 1.0, 0.01], np.float32))
        # observations of features tracked through the batch
        trk = self.feat_valid & (assigned < 0) & (self.feat_lm >= 0)
        if trk.any():
            m.add_observations(kf_idx, self.feat_lm[trk],
                               self.feat_px[trk])

        # landmark allocation for device-assigned detections
        desc, desc_ok = unpack_keyframe_desc(kf_np)
        det_px = kf_np[:, 0:2].astype(np.float32)
        det_px_r = kf_np[:, 2:4].astype(np.float32)
        inv_d = kf_np[:, 4].astype(np.float32)
        world = np_se3.se3_apply_batch(
            pose, unpack_keyframe_robot(kf_np)).astype(np.float32)
        slots = np.where(assigned >= 0)[0]
        dets = assigned[slots]
        det_mask = np.zeros(len(kf_np), bool)
        det_mask[dets] = True
        tracked_ids = set(self.feat_lm[trk].tolist())
        pairs = dict(self._covis_match(kf_idx, det_px, det_mask, desc,
                                       desc_ok, pose, tracked_ids))
        # vectorized allocation: one add_landmarks for all NEW detections
        # and one add_observations for the whole set (the per-det loop's
        # repeated np.concatenate was O(dets^2) host copying per flush)
        dets = dets.astype(np.int64)
        lids = np.full(len(dets), -1, np.int64)
        new_rows = []
        for i, d in enumerate(dets):
            lid = pairs.get(int(d))
            if lid is None:
                new_rows.append(i)
            else:
                lids[i] = lid
        if new_rows:
            nd = dets[new_rows]
            lids[new_rows] = m.add_landmarks(
                kf_idx, det_px_r[nd], det_px[nd], inv_d[nd], world[nd],
                descs=[desc[d] if desc_ok[d] else None for d in nd])
        m.add_observations(kf_idx, lids, det_px[dets])
        self.feat_lm[slots] = lids
        self.feat_px[slots] = det_px[dets]
        self.feat_valid[slots] = True
        self._slot_gen[slots] = h["gen"]
        self.last_kf_time = times[-1]

        if (self.relocator is not None and self.relocator.mode & 1):
            # visual-relocation descriptors: the detection set's BRIEF
            # (computed in-program) with the slot-assigned landmark ids —
            # the per-track descriptor pass of the synchronous path is
            # not available here, but detections cover the same frame
            lm_of_det = np.full(len(kf_np), -1, np.int64)
            lm_of_det[dets] = lids
            m.kf_desc[kf_idx] = {
                "desc": desc.copy(), "ok": desc_ok & det_mask,
                "px": det_px.copy(), "lm": lm_of_det,
            }

        if self.agent is not None:
            obs = self._kf_observation(kf_idx)
            m.kf_weights[kf_idx] = self.agent.update_weights(obs)

        # everything below may rigidly move the new kf (VI gravity
        # alignment, synchronous BA on global-stage kfs, global tails):
        # capture the net effect and fold it into the chain correction
        ref_before = np.asarray(m.kf_pose[kf_idx]).copy()
        if c.use_imu:
            self._attach_kf_preintegration(kf_idx)
            self._maybe_initialize_imu(times[-1])
        if c.use_lidar:
            self._attach_kf_lidar(kf_idx, times[-1])
        run_global = ((c.use_navsat or c.use_loop)
                      and kf_idx % c.global_every_kfs == 0)
        if c.async_ba and not run_global:
            self._pending_ba = self.backend.dispatch(
                m, imu_ready=self.imu_initialized)
            sync_ba = False
        else:
            self.backend.optimize(m, imu_ready=self.imu_initialized)
            sync_ba = True
        if c.use_lidar:
            self._run_lidar_mapping()
        if run_global:
            self._run_global_stage()
        C_step = np_se3.se3_mul(np.asarray(m.kf_pose[kf_idx]),
                                np_se3.se3_inv(ref_before))
        if np.abs(C_step - np.array([1, 0, 0, 0, 0, 0, 0],
                                    np.float32)).max() > 1e-7:
            self._corr_total = np_se3.se3_mul(
                C_step, self._corr_total).astype(np.float32)
        if sync_ba and c.use_imu and self.imu_initialized:
            self.cur_vel = m.kf_vel[kf_idx].copy()
            self.cur_bias = m.kf_bias[kf_idx].copy()
        return np.asarray(m.kf_pose[kf_idx])

    def _process_pipe_lost(self, rows, kf_np, times, lost_at, dC):
        """Tracking collapsed inside an already-finished batch: LOST
        handling one batch late (extrapolate, re-init from the
        speculative detection, reset the device chain, discard the
        in-flight batch)."""
        from lvio_fusion_tpu.core.frontend import (
            KeyframeResult, unpack_keyframe_desc,
        )
        from lvio_fusion_tpu.utils import np_se3
        c, m = self.cfg, self.map
        if self.imu_initialized:
            self.imu_initialized = False
            self._imu_init_stage = 0
        self.status = self.LOST
        pose = (np_se3.se3_mul(dC, rows[lost_at - 1][2]) if lost_at > 0
                else self.last_pose)
        B = c.frame_batch
        for _ in range(B - lost_at if lost_at > 0 else B):
            pose = np_se3.se3_mul(pose, self.relative)
        corr = self._finish_pending_ba()
        if corr is not None:
            pose = np_se3.se3_mul(corr, pose)
            self._corr_total = np_se3.se3_mul(
                corr, self._corr_total).astype(np.float32)
        self.feat_valid[:] = False
        valid = kf_np[:, 8] > 0.5
        if valid.sum() >= c.num_features_init:
            world = np_se3.se3_apply_batch(pose, kf_np[:, 9:12])
            kf = KeyframeResult(
                new_px_left=kf_np[:, 0:2], new_px_right=kf_np[:, 2:4],
                inv_depth=kf_np[:, 4], world=world, valid=valid)
            desc, desc_ok = unpack_keyframe_desc(kf_np)
            kf_idx = m.add_keyframe(
                times[-1], pose, weights=np.array(
                    [c.visual_weight, 1.0, 0.01], np.float32))
            self._insert_new_landmarks(kf_idx, kf, valid, descs=desc,
                                       descs_ok=desc_ok)
            self.last_kf_time = times[-1]
            self.status = self.TRACKING
        else:
            self.status = self.BUILDING
        self.last_pose = np.asarray(pose, np.float32)
        self.last_time = times[-1]
        # the in-flight batch chained on the bad state: drop it, and
        # re-seed the chain from the host at the next dispatch. The
        # re-init features were detected on THIS batch's final frame, so
        # its pyramid (held alive by the handles) re-seeds the chain.
        if self._slot_gen is not None:
            self._slot_gen[:] = self._pipe_gen
        self._pipe = None
        if self._pending_flush is not None:
            self._pending_flush["discard"] = True

    def _drain_pipe(self):
        """Process any in-flight pipelined batch and hand the tracking
        state back to the host (finalize / checkpoint / mode switch)."""
        h, self._pending_flush = self._pending_flush, None
        if h is not None:
            self._process_flush(h)
        if self._pipe is not None:
            self.last_pyr = self._pipe["pyr"]
            self._pipe = None
        self._dev = None

    # ------------------------------------------------------------------

    def _init_map(self, time, pyr_left, img_right_u8, pose) -> bool:
        """BUILDING/LOST -> detect + triangulate a fresh landmark set
        (frontend.cpp InitMap)."""
        from lvio_fusion_tpu.core.frontend import (
            unpack_keyframe_desc, unpack_keyframe_result,
        )
        kf_packed = self.keyframe_step(
            self._img_dev(img_right_u8), pyr_left,
            jnp.asarray(self.feat_px), jnp.asarray(self.feat_valid),
            jnp.asarray(pose, dtype=jnp.float32))
        kf = unpack_keyframe_result(kf_packed)
        desc, desc_ok = unpack_keyframe_desc(kf_packed)
        valid = kf.valid
        if valid.sum() < self.cfg.num_features_init:
            return False
        kf_idx = self.map.add_keyframe(
            time, pose, weights=np.array(
                [self.cfg.visual_weight, 1.0, 0.01], np.float32))
        self._insert_new_landmarks(kf_idx, kf, valid, descs=desc,
                                   descs_ok=desc_ok)
        self.last_kf_time = time
        return True

    def _create_keyframe(self, time, pyr_left, img_right_u8,
                         pose, kf_packed=None) -> np.ndarray:
        from lvio_fusion_tpu.utils.profiling import TIMERS
        with TIMERS.time("backend.keyframe"):
            return self._create_keyframe_impl(time, pyr_left,
                                              img_right_u8, pose,
                                              kf_packed)

    def _finish_pending_ba(self):
        """Write back the BA dispatched at the previous keyframe, if any
        (the reference backend thread never blocks the frontend,
        backend.cpp:28-40; its correction lands one keyframe late).
        Returns the rigid correction to forward-apply to poses computed
        since the dispatch, or None."""
        p, self._pending_ba = self._pending_ba, None
        if p is None:
            return None
        from lvio_fusion_tpu.utils.profiling import TIMERS
        with TIMERS.time("backend.finish"):
            return self.backend.finish(self.map, p)

    def _create_keyframe_impl(self, time, pyr_left, img_right_u8,
                              pose, kf_packed=None):
        """Persist tracked observations, detect new landmarks, run BA.
        ``kf_packed``: speculative detect/triangulate result already
        computed inside the batched frame program (saves the
        keyframe_step dispatch)."""
        from lvio_fusion_tpu.utils import np_se3
        corr = self._finish_pending_ba()
        if corr is not None:
            # forward-propagate the one-keyframe-late BA correction onto
            # the tracked pose (PoseGraph::ForwardUpdate semantics); the
            # relative motion model is invariant under this left-multiply
            pose = np_se3.se3_mul(corr, np.asarray(pose, np.float32))
            if self.cfg.use_imu and self.imu_initialized:
                self.cur_vel = np_se3.quat_rotate(
                    corr[:4], self.cur_vel).astype(np.float32)
                self.cur_bias = self.map.kf_bias[self.map.num_kfs - 1].copy()
            if self.cfg.forward_resolve and self.feat_valid.any():
                # one GN iteration against the BA-refreshed landmark
                # worlds (Backend::UpdateFrontend forward re-solve,
                # backend.cpp:260-267): the rigid shift alone leaves this
                # forward pose linearized against pre-BA geometry
                from lvio_fusion_tpu.core.backend import pose_only_refine_np
                sel = self.feat_valid
                pw = np.stack([self.map.lm_world[i]
                               for i in self.feat_lm[sel]])
                pose = pose_only_refine_np(
                    pose, pw, self.feat_px[sel], np.ones(len(pw), bool),
                    self.cam_left, iters=1,
                    weight=self.cfg.visual_weight)
        kf_idx = self.map.add_keyframe(
            time, pose, vel=self.cur_vel, bias=self.cur_bias,
            weights=np.array(
                [self.cfg.visual_weight, 1.0, 0.01], np.float32))
        sel = self.feat_valid
        if sel.any():
            self.map.add_observations(kf_idx, self.feat_lm[sel],
                                      self.feat_px[sel])
        from lvio_fusion_tpu.core.frontend import (
            unpack_keyframe_desc, unpack_keyframe_result,
        )
        was_speculative = kf_packed is not None
        if kf_packed is None:
            kf_packed = self.keyframe_step(
                self._img_dev(img_right_u8), pyr_left,
                jnp.asarray(self.feat_px), jnp.asarray(self.feat_valid),
                jnp.asarray(pose, dtype=jnp.float32))
        kf = unpack_keyframe_result(kf_packed)
        if corr is not None and was_speculative:
            # the batch program triangulated under the pre-correction pose;
            # re-world from the pose-independent robot-frame points
            from lvio_fusion_tpu.core.frontend import unpack_keyframe_robot
            kf = kf._replace(world=np_se3.se3_apply_batch(
                pose, unpack_keyframe_robot(kf_packed)).astype(np.float32))
        desc, desc_ok = unpack_keyframe_desc(kf_packed)
        matched = self._covisibility_reassociate(
            kf_idx, kf.new_px_left, kf.valid, desc, desc_ok, pose)
        self._insert_new_landmarks(kf_idx, kf, kf.valid & ~matched,
                                   descs=desc, descs_ok=desc_ok)
        self.last_kf_time = time

        if self.agent is not None:
            obs = self._kf_observation(kf_idx)
            self.map.kf_weights[kf_idx] = self.agent.update_weights(obs)

        if (self.relocator is not None and self.relocator.mode & 1):
            # BRIEF descriptors on the tracked features for visual
            # relocation (local_map.cpp mat2brief)
            desc, ok = self._brief(self.level0(pyr_left),
                                   jnp.asarray(self.feat_px),
                                   jnp.asarray(self.feat_valid))
            self.map.kf_desc[kf_idx] = {
                "desc": np.asarray(desc), "ok": np.asarray(ok),
                "px": self.feat_px.copy(), "lm": self.feat_lm.copy(),
            }

        if self.cfg.use_imu:
            self._attach_kf_preintegration(kf_idx)
            self._maybe_initialize_imu(time)
        if self.cfg.use_lidar:
            self._attach_kf_lidar(kf_idx, time)

        run_global = ((self.cfg.use_navsat or self.cfg.use_loop)
                      and kf_idx % self.cfg.global_every_kfs == 0)
        if self.cfg.async_ba and not run_global:
            # launch the window solve and keep tracking on the pre-BA
            # state; the result is fetched at the NEXT keyframe
            # (backend.cpp:28-40 — the backend thread never blocks the
            # frontend)
            self._pending_ba = self.backend.dispatch(
                self.map, imu_ready=self.imu_initialized)
            correction = None
        else:
            # global-stage keyframes mutate window poses (navsat QuickFix,
            # loop correction) — a late writeback would clobber them, so
            # solve synchronously here
            correction = self.backend.optimize(
                self.map, imu_ready=self.imu_initialized)
        if self.cfg.use_lidar:
            self._run_lidar_mapping()
        if run_global:
            self._run_global_stage()
        if correction is not None and self.cfg.use_imu and self.imu_initialized:
            self.cur_vel = self.map.kf_vel[kf_idx].copy()
            self.cur_bias = self.map.kf_bias[kf_idx].copy()
        # always return the MAP's pose of the new kf: VI initialization /
        # navsat / loop stages may have rigidly moved the whole map (incl.
        # this kf) after `pose` was captured — returning the stale local
        # would desynchronize the tracking frame from the map frame
        return np.asarray(self.map.kf_pose[kf_idx])

    def _attach_kf_preintegration(self, kf_idx):
        """Integrate the since-last-kf sample buffer and store it on the new
        keyframe (Frontend::Preintegrate per-keyframe target)."""
        if kf_idx == 0 or len(self._kf_t) < 2:
            self._reset_kf_imu_buffer()
            return
        p = self._preint_buffers(self._kf_t, self._kf_acc, self._kf_gyr,
                                 self.cfg.imu_buf,
                                 self.map.kf_bias[kf_idx - 1])
        self.map.kf_preint[kf_idx] = {
            "dp": np.asarray(p.dp), "dq": np.asarray(p.dq),
            "dv": np.asarray(p.dv), "sum_dt": np.asarray(p.sum_dt),
            "jac": np.asarray(p.jac), "cov": np.asarray(p.cov),
            "lin_ba": np.asarray(p.lin_ba), "lin_bg": np.asarray(p.lin_bg),
        }
        self.map.kf_good_imu[kf_idx] = True
        if kf_idx == 1:
            self.map.kf_good_imu[0] = True
        self._reset_kf_imu_buffer()

    def _reset_kf_imu_buffer(self):
        """Keep the last sample as the next segment's integration anchor."""
        if self._kf_t:
            self._kf_t = self._kf_t[-1:]
            self._kf_acc = self._kf_acc[-1:]
            self._kf_gyr = self._kf_gyr[-1:]

    def _maybe_initialize_imu(self, time):
        """VI initialization with the reference's retry ladder
        (initializer.cpp:58-130): first attempt once init_kfs keyframes
        exist; the inertial solve is RE-RUN ~5 s and ~10 s later with
        progressively weaker bias priors (by then the window holds richer
        motion); any failed solve leaves imu_initialized False so the next
        keyframe retries it."""
        m = self.map
        if not self.imu_initialized:
            if m.num_kfs < self.cfg.init_kfs:
                return
            st = self._initialize_imu(prior_bg=1.0, prior_ba=10.0)
            if st > 0:
                self.imu_initialized = True
                self._imu_init_stage = 1
                self._imu_init_time = time
            elif st < 0:
                # rejected solve: the window is poisoned (bad samples /
                # degenerate motion) — restart data collection from here
                # (reference bumps init_time past the failure)
                self._imu_init_min_kf = m.num_kfs
            return
        if self._imu_init_stage == 1 and time - self._imu_init_time >= 5.0:
            self._imu_init_stage = 2
            if self._initialize_imu(prior_bg=0.3, prior_ba=3.0) < 0:
                self.imu_initialized = False
                self._imu_init_stage = 0
                self._imu_init_min_kf = m.num_kfs
        elif (self._imu_init_stage == 2
                and time - self._imu_init_time >= 10.0):
            self._imu_init_stage = 3
            if self._initialize_imu(prior_bg=0.1, prior_ba=1.0) < 0:
                self.imu_initialized = False
                self._imu_init_stage = 0
                self._imu_init_min_kf = m.num_kfs

    def _initialize_imu(self, prior_bg: float = 1.0,
                        prior_ba: float = 10.0) -> int:
        """Run VI initialization over stored preintegrations and gravity-
        align the whole map (Initializer::Initialize +
        Map::ApplyGravityRotation). Returns 1 on success, 0 when the
        usable chain is still too short (just wait), and -1 when the solve
        is REJECTED — unphysical gyro bias, tools.cpp:59-63 bg > 0.2 —
        so the caller can advance past the poisoned window."""
        import jax as _jax

        from lvio_fusion_tpu.core.imu_init import (
            gravity_alignment, inertial_init,
        )
        from lvio_fusion_tpu.geometry.so3 import quat_mul, quat_rotate

        m = self.map
        # use the most recent contiguous preintegration chain (gaps appear
        # after LOST episodes / IMU resets), never reaching back into a
        # window a previous attempt rejected
        end = m.num_kfs
        start = end - 1
        while (start > max(0, self._imu_init_min_kf)
               and m.kf_preint[start] is not None):
            start -= 1
        if end - start < self.cfg.init_kfs:
            return 0
        pres = [m.kf_preint[i] for i in range(start + 1, end)]
        pre = jax.tree.map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
            *[{k: v for k, v in p.items()} for p in pres])
        from lvio_fusion_tpu.ops.imu_preint import Preintegration
        pre = Preintegration(dp=pre["dp"], dq=pre["dq"], dv=pre["dv"],
                             sum_dt=pre["sum_dt"], jac=pre["jac"],
                             cov=pre["cov"], lin_ba=pre["lin_ba"],
                             lin_bg=pre["lin_bg"])
        poses = jnp.asarray(np.stack(m.kf_pose[start:end]))
        init = inertial_init(poses, pre, jnp.float32(self.cfg.g_norm),
                             prior_bg=prior_bg, prior_ba=prior_ba)
        bg = np.asarray(init.bg)
        if not np.all(np.isfinite(bg)) or np.linalg.norm(bg) > 0.2:
            return -1  # unphysical solve — rejected (tools.cpp:59-63)
        align = gravity_alignment(init.rwg, self.cfg.g_norm)

        vels = np.asarray(jax.vmap(lambda v: quat_rotate(align, v))(init.vel))
        bias = np.concatenate([np.asarray(init.ba), np.asarray(init.bg)])
        for i in range(m.num_kfs):
            q = np.asarray(quat_mul(align, jnp.asarray(m.kf_pose[i][:4])))
            t = np.asarray(quat_rotate(align, jnp.asarray(m.kf_pose[i][4:])))
            m.kf_pose[i] = np.concatenate([q, t]).astype(np.float32)
            if i >= start:
                m.kf_vel[i] = vels[i - start]
            m.kf_bias[i] = bias.astype(np.float32)
        # rotate cached landmark world positions
        if m.num_landmarks:
            lw = jnp.asarray(np.stack(m.lm_world))
            lw = np.asarray(jax.vmap(lambda p: quat_rotate(align, p))(lw))
            for i in range(m.num_landmarks):
                m.lm_world[i] = lw[i]
        # rotate the frontend's live state
        q = np.asarray(quat_mul(align, jnp.asarray(self.last_pose[:4])))
        t = np.asarray(quat_rotate(align, jnp.asarray(self.last_pose[4:])))
        self.last_pose = np.concatenate([q, t]).astype(np.float32)
        # adopt the newest kf's SOLVED velocity (already gravity-aligned),
        # not a rotation of the stale pre-init value: the next frames'
        # IMU prediction integrates from cur_vel, and with the async
        # backend no window solve refreshes it before they run
        self.cur_vel = vels[-1].astype(np.float32)
        self.cur_bias = bias.astype(np.float32)

        # keep the other subsystems consistent with the rotated map:
        align_np = np.concatenate([np.asarray(align),
                                   np.zeros(3)]).astype(np.float32)
        self._on_gravity_aligned(align_np)
        return 1

    def _on_gravity_aligned(self, align_np):
        """Propagate a whole-map gravity rotation into every subsystem
        that caches world-frame state (Map::ApplyGravityRotation
        consumers). Split out so the cross-subsystem consistency is unit-
        testable independent of the VI-init solve."""
        if self.navsat is not None and self.navsat.initialized:
            # ENU->map extrinsic must follow the map rotation
            from lvio_fusion_tpu.utils import np_se3
            self.navsat.extrinsic = np_se3.se3_mul(align_np,
                                                   self.navsat.extrinsic)
        if self.cfg.use_lidar:
            # the world is gravity-aligned (z up) from here on: switch the
            # DoF split and re-render stale world clouds
            self.lidar_mapping.set_up_axis("z")
            for i in list(self.lidar_mapping.world_ground):
                self.lidar_mapping.to_world(self.map, i)
        if self.relocator is not None:
            # loop detection's horizontal plane follows the gravity
            # alignment (lidar DoF split handled above; relocator may run
            # without lidar, in which case there is no mapping to touch)
            self.relocator.set_up_axis("z")

    def _covisibility_reassociate(self, kf_idx, det_px, det_valid, desc,
                                  desc_ok, pose):
        """Re-attach new detections to EXISTING landmarks seen by recent
        same-heading keyframes (local_map.cpp:271-368). Returns the mask
        of consumed detections; claims free feature slots for matches."""
        matched = np.zeros(len(det_px), bool)
        tracked = set(self.feat_lm[self.feat_valid].tolist())
        pairs = self._covis_match(kf_idx, det_px, det_valid, desc, desc_ok,
                                  pose, tracked)
        free = list(np.where(~self.feat_valid)[0])
        for d, lid in pairs:
            if not free:
                break
            matched[d] = True
            self.map.add_observations(kf_idx, [lid], [det_px[d]])
            slot = free.pop(0)
            self.feat_px[slot] = det_px[d]
            self.feat_lm[slot] = lid
            self.feat_valid[slot] = True
        return matched

    def _covis_match(self, kf_idx, det_px, det_valid, desc, desc_ok, pose,
                     tracked):
        """Covisibility matching core (local_map.cpp:271-368: covisibility
        kfs + radius/angle-gated Hamming kNN Search). Without this, a
        landmark lost by LK is gone forever and a duplicate is minted in
        its place — a major drift source. Returns a list of unique
        (detection_row, landmark_id) matches, best first.

        All matching runs on the host (numpy XOR + popcount over a few
        hundred candidates) — the descriptors already came back in the
        keyframe fetch, so this costs zero extra device round trips."""
        c = self.cfg
        m = self.map
        if not c.use_covisibility or kf_idx == 0:
            return []

        # candidate landmarks: observed by the last covis_kfs keyframes
        # whose heading is within covis_max_angle, still alive, not
        # currently tracked, and carrying a descriptor
        q_new = np.asarray(pose[:4], np.float64)
        cand: dict = {}
        for g in range(max(0, kf_idx - c.covis_kfs), kf_idx):
            q = np.asarray(m.kf_pose[g][:4], np.float64)
            ang = 2.0 * np.degrees(np.arccos(
                min(1.0, abs(float(np.dot(q_new, q))))))
            if ang > c.covis_max_angle:
                continue
            for i in m.obs_lm[g][m.obs_ok[g]]:
                i = int(i)
                if (i not in cand and m.lm_alive[i] and i not in tracked
                        and m.lm_desc[i] is not None):
                    cand[i] = True
        if not cand:
            return []
        cand_ids = np.fromiter(cand.keys(), np.int64)

        # project candidates into the new keyframe (host-side pinhole)
        from lvio_fusion_tpu.utils import np_se3
        pw = np.stack([m.lm_world[i] for i in cand_ids])
        Tcw = np_se3.se3_inv(np_se3.se3_mul(pose, self._cam_np["ext"]))
        pc = np_se3.se3_apply_batch(Tcw, pw)
        z = pc[:, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            proj = np.stack([
                pc[:, 0] / z * self._cam_np["fx"] + self._cam_np["cx"],
                pc[:, 1] / z * self._cam_np["fy"] + self._cam_np["cy"]],
                axis=-1)
        vis = ((z > 0.3) & (proj[:, 0] >= 0) & (proj[:, 0] < c.width)
               & (proj[:, 1] >= 0) & (proj[:, 1] < c.height))
        cand_ids, proj = cand_ids[vis], proj[vis]
        if len(cand_ids) == 0:
            return []

        sel = np.where(det_valid & desc_ok)[0]
        if len(sel) == 0:
            return []
        # radius gate + Hamming distances (Search: ratio 0.8, dist < 50)
        d2 = np.linalg.norm(det_px[sel][:, None, :] - proj[None, :, :],
                            axis=-1)
        cdesc = np.stack([m.lm_desc[i] for i in cand_ids])
        ham = np.bitwise_count(
            desc[sel][:, None, :] ^ cdesc[None, :, :]).sum(-1).astype(
                np.int32)
        BIG = 10_000
        dist = np.where(d2 <= c.covis_radius, ham, BIG)
        best = dist.argmin(1)
        dbest = dist.min(1)
        tmp = dist.copy()
        tmp[np.arange(len(sel)), best] = BIG
        dsecond = tmp.min(1)
        good = (dbest < c.covis_max_dist) & (dbest < c.covis_ratio * dsecond)

        # greedy unique assignment (best distance first)
        order = np.argsort(dbest)
        used = set()
        pairs = []
        for k in order:
            if not good[k]:
                continue
            lid = int(cand_ids[best[k]])
            if lid in used:
                continue
            used.add(lid)
            pairs.append((int(sel[k]), lid))
        if used:
            from lvio_fusion_tpu.utils.profiling import COUNTERS
            COUNTERS["frontend.reassociated"] += len(used)
        return pairs

    def _insert_new_landmarks(self, kf_idx, kf, valid, descs=None,
                              descs_ok=None):
        """Append triangulated landmarks + claim free feature slots."""
        n_new = int(valid.sum())
        if n_new == 0:
            return
        left_px = np.asarray(kf.new_px_left)[valid]
        right_px = np.asarray(kf.new_px_right)[valid]
        inv_d = np.asarray(kf.inv_depth)[valid]
        world = np.asarray(kf.world)[valid]
        dsel = None
        if descs is not None:
            dsel = [d if ok else None
                    for d, ok in zip(descs[valid], descs_ok[valid])]
        ids = self.map.add_landmarks(kf_idx, right_px, left_px, inv_d, world,
                                     descs=dsel)
        # the anchor's left-camera pixel is also an observation of this kf
        self.map.add_observations(kf_idx, ids, left_px)

        free = np.where(~self.feat_valid)[0]
        take = min(len(free), n_new)
        slots = free[:take]
        self.feat_px[slots] = left_px[:take]
        self.feat_lm[slots] = ids[:take]
        self.feat_valid[slots] = True

    # ------------------------------------------------------------------

    def trajectory(self):
        return self.map.trajectory()

    # ------------------------------------------------------------------
    # checkpoint/resume (additive over the reference, which persists
    # nothing): full host-side state round-trips through one file

    def save_state(self, path: str):
        """Checkpoint the complete host-side SLAM state (map, tracker,
        IMU chain, lidar clouds, navsat alignment, pose-graph sections).
        Finishes any in-flight async BA first."""
        from lvio_fusion_tpu.utils.checkpoint import save_estimator
        save_estimator(self, path)

    def load_state(self, path: str):
        """Resume from a checkpoint written by :meth:`save_state`; the
        estimator must be built with a compatible (same-shape) config."""
        from lvio_fusion_tpu.utils.checkpoint import load_estimator
        load_estimator(self, path)
