"""Loop closure (SURVEY §7.2 step 9; BASELINE config 5 pose graph).

An out-and-back trajectory revisits its starting view: the revisit detector
must fire (measured loop edges), and the distributed pose graph must use them
to reduce accumulated drift — `pose_graph=True` must beat `pose_graph=False`
on ATE, on the virtual 8-device mesh.
"""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from siftgpu_tpu.core.config import MatchConfig, SiftConfig
from siftgpu_tpu.geometry import align
from siftgpu_tpu.oracle import fixtures
from siftgpu_tpu.parallel import sequence
from siftgpu_tpu.pipeline import slam

pytestmark = pytest.mark.slow


def _loop_scene(T=24, H=144, W=192):
    """Camera translates out for T/2 frames, then returns to the start.

    Sensor noise + a deliberately weak BA (tiny window, few iterations, few
    keypoints) make odometry drift accumulate, so the measured loop edge has
    real drift to correct — on the clean fixture the windowed BA alone tracks
    to <1% ATE and a pose graph has nothing to do."""
    intr = (170.0, 170.0, W / 2.0, H / 2.0)
    half = T // 2
    t_step = np.array([-0.085, 0.012, 0.006])
    r_step = np.array([0.002, -0.004, 0.001])
    ks = np.concatenate([np.arange(half), np.arange(half - 2, -2, -1)])[:T]
    rvecs = np.outer(ks, r_step)
    tvecs = np.outer(ks, t_step)
    frames, gt = fixtures.two_plane_sequence_poses(
        rvecs, tvecs, H, W, intr, d_near=5.0, d_far=10.0, seed=4
    )
    rng = np.random.default_rng(11)
    frames = np.clip(
        frames + rng.normal(0.0, 0.03, frames.shape).astype(np.float32), 0, 1
    )
    cfg = SiftConfig(height=H, width=W, max_keypoints=384)
    mcfg = MatchConfig(max_match=384)
    scfg = slam.SlamConfig(
        kf_min_inliers=60, kf_flow_px=8.0, init_flow_px=10.0,
        kf_window=2, ba_iters=1, ba_cg=4, pnp_iters=4,
        loop_min_matches=25, loop_kf_gap=3,
    )
    return frames, gt, intr, cfg, mcfg, scfg


def test_loop_detected_and_pose_graph_reduces_ate():
    frames, gt, intr, cfg, mcfg, scfg = _loop_scene()
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "spatial"))

    plain = sequence.run_slam_distributed(
        frames, intr, cfg, mcfg, scfg, mesh, data_axis="data",
        pose_graph=False,
    )
    refined = sequence.run_slam_distributed(
        frames, intr, cfg, mcfg, scfg, mesh, data_axis="data",
        pose_graph=True,
    )

    # the revisit detector must have fired with a measured edge
    assert plain.loop_edges, "no loop closures detected on a loop trajectory"
    i, j, rel, w = plain.loop_edges[0][:4]
    assert j - i >= scfg.loop_kf_gap
    assert w >= scfg.loop_min_inliers

    gtc = align.camera_centers(gt)
    span = max(np.linalg.norm(gtc[k] - gtc[0]) for k in range(len(gtc)))
    ate_plain, _ = align.ate_rmse(align.camera_centers(plain.trajectory), gtc,
                                  with_scale=True)
    ate_ref, _ = align.ate_rmse(align.camera_centers(refined.trajectory), gtc,
                                with_scale=True)
    # the pose graph consumes the measured loop edges: it must measurably
    # reduce drift, not just leave the trajectory unchanged
    assert ate_ref < ate_plain * 0.9, (
        f"pose graph did not reduce drift: {ate_ref} vs {ate_plain}"
    )
    assert ate_ref < 0.08 * span, (ate_ref, span)


def test_loop_closure_survives_resume(tmp_path):
    """The revisit archive (retired keyframes' host descriptors) is
    checkpointed: a run resumed BEFORE the revisit must still detect the
    loop against pre-checkpoint keyframes and produce the uninterrupted
    run's edges."""
    from siftgpu_tpu.pipeline import checkpoint

    frames, gt, intr, cfg, mcfg, scfg = _loop_scene()
    full = slam.run_slam(frames, intr, cfg, mcfg, scfg)
    assert full.loop_edges

    Tc = 13  # out-leg only: no revisit has happened yet
    part = slam.run_slam(frames[:Tc], intr, cfg, mcfg, scfg)
    p = str(tmp_path / "ckpt.npz")
    checkpoint.save_slam_state(p, part, next_frame=Tc, kf_window=scfg.kf_window)
    resumed = slam.run_slam(
        frames, intr, cfg, mcfg, scfg, resume=checkpoint.load_slam_state(p)
    )
    assert [(e[0], e[1]) for e in resumed.loop_edges] == [
        (e[0], e[1]) for e in full.loop_edges
    ], "resume lost the loop-closure archive"
    np.testing.assert_allclose(
        np.stack([e[2] for e in resumed.loop_edges]),
        np.stack([e[2] for e in full.loop_edges]), atol=1e-4,
    )
