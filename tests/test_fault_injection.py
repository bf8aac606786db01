"""Fault injection (SURVEY §5.3): SIGKILL a SLAM run mid-sequence, resume
from its last atomic checkpoint, verify the recovered trajectory."""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

from siftgpu_tpu.core.config import MatchConfig, SiftConfig
from siftgpu_tpu.geometry import align
from siftgpu_tpu.oracle import fixtures
from siftgpu_tpu.pipeline import checkpoint, slam

_SCENE = dict(
    T=14, H=144, W=192,
    rvec_step=[0.002, -0.004, 0.001], t_step=[-0.08, 0.012, 0.006],
    d_near=5.0, d_far=10.0, seed=4,
)

_CHILD = r"""
import sys, numpy as np
import jax; jax.config.update("jax_platforms", "cpu")
from siftgpu_tpu.core.config import MatchConfig, SiftConfig
from siftgpu_tpu.oracle import fixtures
from siftgpu_tpu.pipeline import slam
import json
scene = json.loads(sys.argv[1]); ckpt = sys.argv[2]
T, H, W = scene["T"], scene["H"], scene["W"]
intr = (170.0, 170.0, W / 2.0, H / 2.0)
frames, gt = fixtures.two_plane_sequence(
    T, H, W, intr, rvec_step=np.array(scene["rvec_step"]),
    t_step=np.array(scene["t_step"]), d_near=scene["d_near"],
    d_far=scene["d_far"], seed=scene["seed"],
)
cfg = SiftConfig(height=H, width=W, max_keypoints=768)
slam.run_slam(
    frames, intr, cfg, MatchConfig(max_match=768),
    slam.SlamConfig(kf_min_inliers=60, kf_flow_px=8.0, init_flow_px=10.0),
    checkpoint_path=ckpt,
)
print("CHILD_DONE", flush=True)
"""


@pytest.mark.slow
def test_kill_and_resume(tmp_path):
    ckpt = str(tmp_path / "ckpt.npz")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.Popen(
        [sys.executable, "-c", _CHILD, json.dumps(_SCENE), ckpt],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, stdout=subprocess.PIPE,
    )
    # SIGKILL (no cleanup chance) as soon as the first checkpoint lands
    deadline = time.monotonic() + 300
    while time.monotonic() < deadline:
        if os.path.exists(ckpt) or proc.poll() is not None:
            break
        time.sleep(0.2)
    killed_midrun = proc.poll() is None and os.path.exists(ckpt)
    if killed_midrun:
        proc.send_signal(signal.SIGKILL)
    proc.wait(timeout=60)
    assert os.path.exists(ckpt), "no checkpoint was ever written"

    # the atomic-rename protocol guarantees the file loads even though the
    # writer may have died at any point
    ck = checkpoint.load_slam_state(ckpt)
    T, H, W = _SCENE["T"], _SCENE["H"], _SCENE["W"]
    assert 0 < ck.next_frame <= T
    if killed_midrun:
        assert proc.returncode == -signal.SIGKILL

    intr = (170.0, 170.0, W / 2.0, H / 2.0)
    frames, gt = fixtures.two_plane_sequence(
        T, H, W, intr,
        rvec_step=np.array(_SCENE["rvec_step"]),
        t_step=np.array(_SCENE["t_step"]),
        d_near=_SCENE["d_near"], d_far=_SCENE["d_far"], seed=_SCENE["seed"],
    )
    cfg = SiftConfig(height=H, width=W, max_keypoints=768)
    res = slam.run_slam(
        frames, intr, cfg, MatchConfig(max_match=768),
        slam.SlamConfig(kf_min_inliers=60, kf_flow_px=8.0, init_flow_px=10.0),
        resume=ck,
    )
    est = align.camera_centers(res.trajectory)
    gtc = align.camera_centers(gt)
    rmse, _ = align.ate_rmse(est, gtc, with_scale=True)
    span = np.linalg.norm(gtc[-1] - gtc[0])
    assert rmse < 0.06 * span, f"post-recovery ATE {rmse} vs span {span}"


_CHILD_DIST = r"""
import sys, json, numpy as np
import jax; jax.config.update("jax_platforms", "cpu")
from jax.sharding import Mesh
from siftgpu_tpu.core.config import MatchConfig, SiftConfig
from siftgpu_tpu.oracle import fixtures
from siftgpu_tpu.parallel import sequence
from siftgpu_tpu.pipeline import slam
scene = json.loads(sys.argv[1]); ckpt = sys.argv[2]
T, H, W = scene["T"], scene["H"], scene["W"]
intr = (170.0, 170.0, W / 2.0, H / 2.0)
frames, gt = fixtures.two_plane_sequence(
    T, H, W, intr, rvec_step=np.array(scene["rvec_step"]),
    t_step=np.array(scene["t_step"]), d_near=scene["d_near"],
    d_far=scene["d_far"], seed=scene["seed"],
)
cfg = SiftConfig(height=H, width=W, max_keypoints=768)
mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "spatial"))
sequence.run_slam_distributed(
    frames, intr, cfg, MatchConfig(max_match=768),
    slam.SlamConfig(kf_min_inliers=60, kf_flow_px=8.0, init_flow_px=10.0),
    mesh, data_axis="data", checkpoint_path=ckpt,
)
print("CHILD_DONE", flush=True)
"""


@pytest.mark.slow
def test_kill_and_resume_distributed(tmp_path):
    """Config-5 crash recovery (VERDICT r3 task 4): SIGKILL the DISTRIBUTED
    pipeline mid-sequence, resume through `run_slam_distributed(resume=...)`
    (the feature store is re-extracted — extraction is deterministic), and
    the resumed run must replay the uninterrupted one to 1e-4."""
    from jax.sharding import Mesh

    import jax

    from siftgpu_tpu.parallel import sequence

    ckpt = str(tmp_path / "ckpt_dist.npz")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    proc = subprocess.Popen(
        [sys.executable, "-c", _CHILD_DIST, json.dumps(_SCENE), ckpt],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, stdout=subprocess.PIPE,
    )
    deadline = time.monotonic() + 600
    while time.monotonic() < deadline:
        if os.path.exists(ckpt) or proc.poll() is not None:
            break
        time.sleep(0.2)
    killed_midrun = proc.poll() is None and os.path.exists(ckpt)
    if killed_midrun:
        proc.send_signal(signal.SIGKILL)
    proc.wait(timeout=60)
    assert os.path.exists(ckpt), "no checkpoint was ever written"
    ck = checkpoint.load_slam_state(ckpt)
    T, H, W = _SCENE["T"], _SCENE["H"], _SCENE["W"]
    assert 0 < ck.next_frame <= T

    intr = (170.0, 170.0, W / 2.0, H / 2.0)
    frames, gt = fixtures.two_plane_sequence(
        T, H, W, intr,
        rvec_step=np.array(_SCENE["rvec_step"]),
        t_step=np.array(_SCENE["t_step"]),
        d_near=_SCENE["d_near"], d_far=_SCENE["d_far"], seed=_SCENE["seed"],
    )
    cfg = SiftConfig(height=H, width=W, max_keypoints=768)
    mcfg = MatchConfig(max_match=768)
    scfg = slam.SlamConfig(kf_min_inliers=60, kf_flow_px=8.0,
                           init_flow_px=10.0)
    import jax as _jax
    mesh = Mesh(np.array(_jax.devices()[:8]).reshape(4, 2),
                ("data", "spatial"))
    resumed = sequence.run_slam_distributed(
        frames, intr, cfg, mcfg, scfg, mesh, data_axis="data", resume=ck,
    )
    full = sequence.run_slam_distributed(
        frames, intr, cfg, mcfg, scfg, mesh, data_axis="data",
    )
    # exact replay: the resumed distributed run equals the uninterrupted one
    np.testing.assert_allclose(
        resumed.trajectory, full.trajectory, atol=1e-4,
        err_msg="resumed distributed run diverged from the uninterrupted one",
    )
    assert resumed.keyframe_indices == full.keyframe_indices
