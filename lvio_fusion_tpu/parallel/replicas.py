"""Multi-stream scale-out: N independent SLAM instances on N devices.

The production serving mode for a multi-chip host: each camera stream
gets its own Estimator whose device work — image uploads, frame-program
dispatches, BA solves, result fetches — is pinned to one chip via
``jax.default_device``, so N streams process concurrently on N chips
from a single host process. This is the framework's DCN-free answer to
the reference's "one ROS node per vehicle" deployment (SURVEY §2.4:
data parallelism over independent SLAM instances is the production
axis; the reference itself has no multi-stream story at all).

Program sharing: estimators with identical configs share their traced
stage programs (utils/memo.builder_memo), so replica construction does
not multiply trace time; XLA compiles per device but the persistent
compilation cache deduplicates identical HLO.

Dispatch model: the host round-robins frames across replicas. Each
replica's per-batch device work runs asynchronously after dispatch, so
while stream i's flush executes on chip i the host is already feeding
stream i+1 — host Python is the only serialized resource (it is the
scheduler, not the worker).
"""

from __future__ import annotations

import jax


class ReplicaRunner:
    """N estimators, each pinned to one device of ``devices``.

    ``make_estimator()`` must build a fresh Estimator (called once per
    replica, inside the replica's default-device scope so construction-
    time device state lands on the right chip).
    """

    def __init__(self, make_estimator, n_replicas: int, devices=None):
        devices = list(devices if devices is not None else jax.devices())
        if n_replicas > len(devices):
            raise ValueError(
                f"{n_replicas} replicas > {len(devices)} devices")
        self.devices = devices[:n_replicas]
        self.replicas = []
        for d in self.devices:
            with jax.default_device(d):
                self.replicas.append(make_estimator())

    def __len__(self):
        return len(self.replicas)

    def _scoped(self, i):
        return jax.default_device(self.devices[i])

    def input_image(self, i: int, time: float, left, right, **kw):
        with self._scoped(i):
            return self.replicas[i].input_image(time, left, right, **kw)

    def input_imu(self, i: int, time: float, acc, gyr):
        with self._scoped(i):
            return self.replicas[i].input_imu(time, acc, gyr)

    def input_pointcloud(self, i: int, time: float, points):
        with self._scoped(i):
            return self.replicas[i].input_pointcloud(time, points)

    def input_navsat(self, i: int, time: float, p_enu):
        with self._scoped(i):
            return self.replicas[i].input_navsat(time, p_enu)

    def finalize(self, i: int = None):
        idx = range(len(self.replicas)) if i is None else [i]
        for j in idx:
            with self._scoped(j):
                self.replicas[j].finalize()

    def trajectory(self, i: int):
        return self.replicas[i].trajectory()


def run_streams(runner: ReplicaRunner, streams):
    """Round-robin replay: ``streams`` is a list (one per replica) of
    iterables yielding (time, left, right) frames. Feeds frame k of
    every stream before frame k+1 of any (the steady-state interleave a
    live multi-camera host would see), then finalizes all replicas."""
    its = [iter(s) for s in streams]
    live = [True] * len(its)
    while any(live):
        for i, it in enumerate(its):
            if not live[i]:
                continue
            try:
                t, left, right = next(it)
            except StopIteration:
                live[i] = False
                continue
            runner.input_image(i, t, left, right)
    runner.finalize()
    return [runner.trajectory(i) for i in range(len(runner))]
