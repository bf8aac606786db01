"""Per-host structured metrics stream (SURVEY §5.5)."""

import json

import numpy as np

from siftgpu_tpu.core.config import MatchConfig, SiftConfig
from siftgpu_tpu.oracle import fixtures
from siftgpu_tpu.pipeline import metrics, slam


def test_logger_writes_jsonl_with_host_stamp(tmp_path):
    p = str(tmp_path / "m.jsonl")
    with metrics.MetricsLogger(p) as m:
        assert m.enabled
        m.event("hello", n=np.int32(3), x=1.5, s="a")
    recs = [json.loads(ln) for ln in open(p)]
    assert len(recs) == 1
    r = recs[0]
    assert r["event"] == "hello" and r["n"] == 3 and r["x"] == 1.5
    assert "t" in r and "host" in r and "pid" in r
    assert isinstance(r["n"], int)  # numpy scalar converted


def test_disabled_logger_is_noop(tmp_path):
    m = metrics.MetricsLogger(None)
    m.event("x", a=1)  # must not raise
    assert not m.enabled
    assert metrics.or_null(None) is not None


def test_slam_emits_metrics(tmp_path):
    H, W, T = 144, 192, 8
    intr = (170.0, 170.0, W / 2.0, H / 2.0)
    frames, _ = fixtures.two_plane_sequence(
        T, H, W, intr,
        rvec_step=np.array([0.002, -0.004, 0.001]),
        t_step=np.array([-0.08, 0.012, 0.006]),
        d_near=5.0, d_far=10.0, seed=4,
    )
    cfg = SiftConfig(height=H, width=W, max_keypoints=768)
    p = str(tmp_path / "slam.jsonl")
    with metrics.MetricsLogger(p) as m:
        slam.run_slam(
            frames, intr, cfg, MatchConfig(max_match=768),
            slam.SlamConfig(kf_min_inliers=60, kf_flow_px=8.0,
                            init_flow_px=10.0),
            metrics=m,
        )
    kinds = [json.loads(ln)["event"] for ln in open(p)]
    assert "bootstrap" in kinds and "track" in kinds and "ba_window" in kinds
    tracks = [json.loads(ln) for ln in open(p) if json.loads(ln)["event"] == "track"]
    assert all("inliers" in r and "frame" in r for r in tracks)
