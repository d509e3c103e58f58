"""On-chip microbenchmark of LK per-level block-fetch strategies.

Round-6 profiling pinned the frame program's biggest device cost to LK's
per-LEVEL fixed overhead (~0.85 ms/level) — the 400-point template +
search block fetches, which the vmapped ``dynamic_slice`` formulation
lowers to per-point HBM gathers. Iterations are ~free (in-register tent
matmuls). This probe times one pyramid level at each bench shape under
alternative fetch formulations, to decide the gen-2 design:

  gather   — current: vmap'd 2-D dynamic_slice per point (r3 design)
  strip    — vmap'd (S, W) full-width row-strip dynamic_slice per point,
             then one batched one-hot matmul selects the S columns
  rowtake  — advanced-index row gather img[rows] -> (N,S,W), then the
             same column-select matmul
  onehot   — both axes as matmuls: (N,S,H) one-hot @ img @ one-hot
  norest   — blocks pre-fetched OUTSIDE the timed fn (isolates the
             non-fetch remainder: resample + Scharr + GN loop)

Run (tunnel up):
  PYTHONPATH=/root/.axon_site:/root/repo /opt/venv/bin/python misc/prof_lk.py
"""

import time
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from lvio_fusion_tpu.ops import lk as L

    N = 400
    win, iters = 21, 8
    rng = np.random.default_rng(0)

    # flip the relay into slow mode first so block_until_ready blocks
    # (CLAUDE.md r6: in fast mode it measures enqueue, not execution)
    import jax.numpy as jnp
    _ = float(jax.jit(lambda x: x + 1)(jnp.float32(1.0)))

    REPS = 32  # scan the op REPS times inside ONE program: per-op device
    # time = (t_call - RTT) / REPS — the ~2 ms tunnel RTT jitter would
    # otherwise swamp the sub-ms per-level cost

    def scan_reps(fn):
        def wrapped(*args):
            def body(carry, _):
                # feed the result back as BOTH template points and seed:
                # every input of the op depends on the carry, so XLA
                # cannot hoist any fetch out of the scan as invariant
                p, ok = fn(args[0], args[1], carry, carry)
                return p, ok
            p, _ = jax.lax.scan(body, args[3], None, length=REPS)
            return p
        return jax.jit(wrapped)

    def bench(fn, args, n=8):
        out = fn(*args)
        jax.block_until_ready(out)
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) * 1000.0

    noop = bench(jax.jit(lambda x: x + 1.0), (jnp.float32(1.0),))
    print(f"noop RTT: {noop:.2f} ms")

    S = win + L._MARGIN          # search block
    TB = win + 4                 # template block

    def corners_of(pts, half, size, Hh, Ww):
        cx = jnp.clip(jnp.floor(pts[:, 0] - half), 0.0, Ww - size)
        cy = jnp.clip(jnp.floor(pts[:, 1] - half), 0.0, Hh - size)
        return cx.astype(jnp.int32), cy.astype(jnp.int32)

    def fetch_gather(img, cx, cy, size):
        return jax.vmap(lambda x, y: jax.lax.dynamic_slice(
            img, (y, x), (size, size)))(cx, cy)

    def fetch_strip(img, cx, cy, size):
        W = img.shape[1]
        strips = jax.vmap(lambda y: jax.lax.dynamic_slice(
            img, (y, 0), (size, W)))(cy)          # (N,S,W)
        csel = (cx[:, None, None] + jnp.arange(size)[None, :, None]
                == jnp.arange(W)[None, None, :]).astype(img.dtype)
        return jnp.einsum("nsw,ntw->nst", strips, csel)

    def fetch_rowtake(img, cx, cy, size):
        W = img.shape[1]
        rows = cy[:, None] + jnp.arange(size)[None, :]
        strips = img[rows]                        # (N,S,W)
        csel = (cx[:, None, None] + jnp.arange(size)[None, :, None]
                == jnp.arange(W)[None, None, :]).astype(img.dtype)
        return jnp.einsum("nsw,ntw->nst", strips, csel)

    def fetch_onehot(img, cx, cy, size):
        H, W = img.shape
        rsel = (cy[:, None, None] + jnp.arange(size)[None, :, None]
                == jnp.arange(H)[None, None, :]).astype(img.dtype)
        strips = jnp.einsum("nsh,hw->nsw", rsel, img)
        csel = (cx[:, None, None] + jnp.arange(size)[None, :, None]
                == jnp.arange(W)[None, None, :]).astype(img.dtype)
        return jnp.einsum("nsw,ntw->nst", strips, csel)

    FETCH = {"gather": fetch_gather, "strip": fetch_strip,
             "rowtake": fetch_rowtake, "onehot": fetch_onehot}

    def level_with_fetch(fetch, img0, img1, pts, seeds):
        """_lk_level_pt's math with the block fetches swapped out."""
        h = (win - 1) / 2.0
        H, W = img0.shape
        tcx, tcy = corners_of(pts, h + 1.0, TB, H, W)
        # search corner = floor(seed) - S//2, clamped
        scx = jnp.clip(jnp.floor(seeds[:, 0]).astype(jnp.int32) - S // 2,
                       0, W - S)
        scy = jnp.clip(jnp.floor(seeds[:, 1]).astype(jnp.int32) - S // 2,
                       0, H - S)
        blk0 = fetch(img0, tcx, tcy, TB)          # (N,TB,TB)
        blk1 = fetch(img1, scx, scy, S)           # (N,S,S)
        c0 = jnp.stack([tcx, tcy], -1).astype(img0.dtype)
        c1 = jnp.stack([scx, scy], -1).astype(img0.dtype)

        def per_point(b0, b1, p0, p1i, cc0, cc1):
            o0 = jnp.clip(p0 - (h + 1.0) - cc0, 0.0, float(TB - win - 2))
            tc = L._resample(b0, o0[1], o0[0], win + 2)
            t = tc[1:-1, 1:-1]
            gx, gy = L._scharr_patch(tc)
            gxx = jnp.sum(gx * gx)
            gxy = jnp.sum(gx * gy)
            gyy = jnp.sum(gy * gy)
            det = gxx * gyy - gxy * gxy
            ok = det > 1e-6
            inv = jnp.array([[gyy, -gxy], [-gxy, gxx]]) / jnp.where(
                ok, det, 1.0)
            lim = jnp.asarray(S - win - 1, img0.dtype)

            def body(_, p):
                l = jnp.clip(p - h - cc1, 0.0, lim)
                w = L._resample(b1, l[1], l[0], win)
                diff = w - t
                b = jnp.stack([jnp.sum(gx * diff), jnp.sum(gy * diff)])
                return (l - inv @ b) + h + cc1

            p1 = jax.lax.fori_loop(0, iters, body, p1i)
            return p1, ok

        return jax.vmap(per_point)(blk0, blk1, pts, seeds, c0, c1)

    shapes = [(376, 1248), (188, 624), (94, 312), (47, 156)]
    totals = {k: 0.0 for k in FETCH}
    totals["current"] = 0.0
    totals["norest"] = 0.0
    for (H, W) in shapes:
        img0 = jnp.asarray(rng.random((H, W), np.float32))
        img1 = jnp.asarray(rng.random((H, W), np.float32))
        pts = jnp.asarray(
            rng.uniform([8, 8], [W - 8, H - 8], (N, 2)).astype(np.float32))
        seeds = pts + jnp.asarray(
            rng.normal(0, 1.5, (N, 2)).astype(np.float32))
        # current production path
        cur = scan_reps(partial(L._track_level, win=win, iters=iters,
                                use_pallas=False))
        t = (bench(cur, (img0, img1, pts, seeds)) - noop) / REPS
        totals["current"] += t
        row = [f"({H:4d},{W:4d}) current {t:6.3f}"]
        for name, f in FETCH.items():
            fn = scan_reps(partial(level_with_fetch, f))
            t = (bench(fn, (img0, img1, pts, seeds)) - noop) / REPS
            totals[name] += t
            row.append(f"{name} {t:6.3f}")
        # remainder with blocks prefetched (fetch excluded from timing)
        h = (win - 1) / 2.0
        tcx, tcy = corners_of(pts, h + 1.0, TB, H, W)
        scx = jnp.clip(jnp.floor(seeds[:, 0]).astype(jnp.int32) - S // 2,
                       0, W - S)
        scy = jnp.clip(jnp.floor(seeds[:, 1]).astype(jnp.int32) - S // 2,
                       0, H - S)
        b0 = fetch_gather(img0, tcx, tcy, TB)
        b1 = fetch_gather(img1, scx, scy, S)
        c0 = jnp.stack([tcx, tcy], -1).astype(jnp.float32)
        c1 = jnp.stack([scx, scy], -1).astype(jnp.float32)

        def rest_only(b0, b1, pts, seeds, c0, c1):
            def per_point(b0, b1, p0, p1i, cc0, cc1):
                o0 = jnp.clip(p0 - (h + 1.0) - cc0, 0.0,
                              float(TB - win - 2))
                tc = L._resample(b0, o0[1], o0[0], win + 2)
                t_ = tc[1:-1, 1:-1]
                gx, gy = L._scharr_patch(tc)
                gxx = jnp.sum(gx * gx)
                gxy = jnp.sum(gx * gy)
                gyy = jnp.sum(gy * gy)
                det = gxx * gyy - gxy * gxy
                inv = jnp.array([[gyy, -gxy], [-gxy, gxx]]) / jnp.where(
                    det > 1e-6, det, 1.0)
                lim = jnp.asarray(S - win - 1, jnp.float32)

                def body(_, p):
                    l = jnp.clip(p - h - cc1, 0.0, lim)
                    w = L._resample(b1, l[1], l[0], win)
                    diff = w - t_
                    b = jnp.stack(
                        [jnp.sum(gx * diff), jnp.sum(gy * diff)])
                    return (l - inv @ b) + h + cc1

                return jax.lax.fori_loop(0, iters, body, p1i)

            return jax.vmap(per_point)(b0, b1, pts, seeds, c0, c1)

        def rest_reps(b0, b1, pts, sd, c0, c1):
            def body(carry, _):
                return rest_only(b0, b1, pts, carry, c0, c1), None
            p, _ = jax.lax.scan(body, sd, None, length=REPS)
            return p

        t = (bench(jax.jit(rest_reps),
                   (b0, b1, pts, seeds, c0, c1)) - noop) / REPS
        totals["norest"] += t
        row.append(f"norest {t:6.3f}")
        print("  ".join(row))

    print("\nper-frame totals over 4 levels (ms):")
    for k, v in totals.items():
        print(f"  {k:8s}: {v:6.2f}")


if __name__ == "__main__":
    main()
