"""The measured-best perf configuration must be the default on TPU.

Round-4 verdict: the bench demonstrated 116 fps at batch-12 / pipelined
/ DCT-int4, but `cli run` defaulted to the single-frame sync raw-u8
path — the driver metric and the user experience had diverged. These
tests pin the resolution chain: CLI flag > preset-YAML perf key >
backend auto (fast on TPU, conservative on CPU).
"""

import argparse

import jax
import pytest

from lvio_fusion_tpu import cli
from lvio_fusion_tpu.core.estimator import EstimatorConfig


def _args(**kw):
    ns = argparse.Namespace(batch=None, pipelined=None, dct=None,
                            dct_quality=None, dct_bits=None)
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def test_auto_is_conservative_on_cpu():
    ov = cli._perf_overrides(_args())
    assert ov["frame_batch"] == 1
    assert ov["pipelined_flush"] is False
    assert ov["dct_k"] == 0


def test_auto_is_fast_config_on_tpu(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    ov = cli._perf_overrides(_args())
    # the bench's own configuration (bench.py defaults; r7 A/B pinned
    # batch 20, misc/ab_r07_final.log + bench_ate accuracy gate)
    assert ov == dict(frame_batch=20, pipelined_flush=True, dct_k=16,
                      dct_quality=100, dct_bits=4)


def test_explicit_flags_beat_auto(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    ov = cli._perf_overrides(_args(batch=4, dct=0, pipelined=False))
    assert ov["frame_batch"] == 4
    assert ov["pipelined_flush"] is False
    assert ov["dct_k"] == 0


def test_batch_one_never_pipelines(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    ov = cli._perf_overrides(_args(batch=1))
    assert ov["pipelined_flush"] is False


def test_yaml_perf_keys_stand(tmp_path, monkeypatch):
    """Preset-tuned perf keys win over backend auto (but not over
    explicit CLI flags)."""
    y = tmp_path / "preset.yaml"
    y.write_text("%YAML:1.0\nframe_batch: 6\ndct_k: 8\n")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    ov = cli._perf_overrides(_args(), str(y))
    assert "frame_batch" not in ov          # YAML value left standing
    assert "dct_k" not in ov
    assert ov["pipelined_flush"] is True    # auto still fills the rest
    ov = cli._perf_overrides(_args(batch=2), str(y))
    assert ov["frame_batch"] == 2           # explicit flag still wins


def test_from_config_parses_perf_keys(tmp_path):
    """Estimator.from_config honors preset perf keys end to end."""
    import numpy as np

    from lvio_fusion_tpu.utils import config as cfgmod
    eye = ("!!opencv-matrix\n   rows: 4\n   cols: 4\n   dt: d\n"
           "   data: [1,0,0,0, 0,1,0,0, 0,0,1,0, 0,0,0,1]")
    text = ("%YAML:1.0\n"
            "camera0.fx: 400.0\ncamera0.fy: 400.0\n"
            "camera0.cx: 180.0\ncamera0.cy: 120.0\n"
            "camera1.fx: 400.0\ncamera1.fy: 400.0\n"
            "camera1.cx: 180.0\ncamera1.cy: 120.0\n"
            f"body_to_cam0: {eye}\n"
            f"body_to_cam1: {eye}\n"
            "frame_batch: 3\ndct_k: 8\ndct_bits: 4\n")
    y = tmp_path / "tuned.yaml"
    y.write_text(text)
    c = cfgmod.load(str(y))
    assert int(c.get("frame_batch")) == 3
    from lvio_fusion_tpu.core.estimator import Estimator
    est = Estimator.from_config(str(y), 240, 360, num_features=64,
                                landmark_slots=64, obs_slots=128,
                                po_slots=64)
    assert est.cfg.frame_batch == 3
    assert est.cfg.dct_k == 8
    assert est.cfg.dct_bits == 4


def test_config_post_init_auto_pipelines_on_tpu(monkeypatch):
    assert EstimatorConfig(frame_batch=4).pipelined_flush is False  # cpu
    assert EstimatorConfig(frame_batch=1).pipelined_flush is False
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert EstimatorConfig(frame_batch=4).pipelined_flush is True
    assert EstimatorConfig(frame_batch=1).pipelined_flush is False
    # explicit value is never second-guessed
    assert EstimatorConfig(frame_batch=4,
                           pipelined_flush=False).pipelined_flush is False
