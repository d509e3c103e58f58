"""On-chip per-stage timing of the frame program's sub-stages.

The pipelined bench is device-bound as of round 6 (pure pipe_step
execution ~10.5 ms/frame equals the bench wall time), so the next fps
comes from shrinking the program itself. This probe jits each sub-stage
separately at bench shapes and times it through the tunnel, subtracting
a no-op dispatch baseline (the relay sync RTT) so the numbers are
device-execution estimates:

    PYTHONPATH=/root/.axon_site:/root/repo /opt/venv/bin/python \
        misc/prof_stages.py

Stages: DCT decode, pyramid build, LK track (bidirectional), moving-
point rejection + pose GN, speculative keyframe stage.
"""

import time

import numpy as np


def bench_one(name, fn, *args, n=20):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000.0
    print(f"{name:28s}: {dt:7.2f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from lvio_fusion_tpu.core.estimator import Estimator, EstimatorConfig
    from lvio_fusion_tpu.datasets.synthetic import make_sequence
    from lvio_fusion_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    H, W = 376, 1241
    seq = make_sequence(num_frames=16, H=H, W=W, num_points=3000,
                        fps=10.0, speed=1.4, seed=0)
    cfg = EstimatorConfig(
        height=H, width=W, num_features=400, num_features_init=50,
        num_features_tracking_bad=20, num_features_needed_for_keyframe=120,
        window_kfs=8, landmark_slots=512, obs_slots=2048, po_slots=1024,
        ba_iters=5, frame_batch=1, dct_k=16, dct_quality=100, dct_bits=4)
    est = Estimator(seq.cam_left, seq.cam_right, cfg)
    for fr in seq.frames[:6]:
        est.input_image(fr.time, fr.left, fr.right)
    assert est.status == est.TRACKING

    from lvio_fusion_tpu.core import frontend as fe
    from lvio_fusion_tpu.ops.dct import make_decoder
    from lvio_fusion_tpu.ops.image import build_pyramid, pad_to_multiple
    from lvio_fusion_tpu.ops.lk import track_bidirectional

    payload = jax.device_put(est._dct(est._to_u8(seq.frames[-1].left)))
    decode = jax.jit(make_decoder(H, W, 16, 100, 4))
    img = decode(payload)

    pyr_fn = jax.jit(lambda im: build_pyramid(
        pad_to_multiple(im.astype(jnp.float32) * (1 / 255.0), 8), 4))
    pyr = pyr_fn(img)
    d = est._dev
    pyr_last, feat_px, feat_valid = d["pyr"], d["feat_px"], d["feat_valid"]
    lm_world, pose = d["lm_world"], d["pose"]

    lk_fn = jax.jit(lambda a, b, p, v: track_bidirectional(
        a, b, p, p, win=15, iters=6))
    _ = lk_fn(pyr_last, pyr, feat_px, feat_valid)

    # no-op dispatch baseline: sync RTT through the relay
    noop = jax.jit(lambda x: x + 1.0)
    base = bench_one("noop dispatch (RTT)", noop, jnp.float32(1.0))

    t_dec = bench_one("dct decode", decode, payload)
    t_pyr = bench_one("pyramid build (f32)", pyr_fn, img)
    t_lk = bench_one("LK bidirectional", lk_fn, pyr_last, pyr,
                     feat_px, feat_valid)
    t_full = bench_one("frame_step_chained (all)", est.frame_step_chained,
                       payload, pyr_last, feat_px, feat_valid, lm_world,
                       pose, d["relative"],
                       jnp.zeros(7, jnp.float32).at[0].set(1.0),
                       jnp.asarray(False))
    print(f"\nafter RTT subtraction ({base:.1f} ms):")
    for nm, t in [("decode", t_dec), ("pyramid", t_pyr), ("lk", t_lk),
                  ("full frame", t_full)]:
        print(f"  {nm:12s}: {max(t - base, 0.0):6.2f} ms")
    rest = t_full - t_dec - t_pyr - t_lk + 2 * base
    print(f"  {'gn+rest':12s}: {max(rest, 0.0):6.2f} ms (residual)")


if __name__ == "__main__":
    main()
