"""Checkpoint / resume: SLAM continues from a snapshot (SURVEY §5.3/5.4)."""

import numpy as np
import pytest

from siftgpu_tpu.core.config import MatchConfig, SiftConfig
from siftgpu_tpu.geometry import align
from siftgpu_tpu.oracle import fixtures
from siftgpu_tpu.pipeline import checkpoint, slam


@pytest.mark.slow
def test_slam_resume_from_checkpoint(tmp_path):
    H, W = 144, 192
    intr = (170.0, 170.0, W / 2.0, H / 2.0)
    T = 10
    frames, gt = fixtures.two_plane_sequence(
        T, H, W, intr,
        rvec_step=np.array([0.002, -0.004, 0.001]),
        t_step=np.array([-0.08, 0.012, 0.006]),
        d_near=5.0, d_far=10.0, seed=4,
    )
    cfg = SiftConfig(height=H, width=W, max_keypoints=768)
    mcfg = MatchConfig(max_match=768)
    scfg = slam.SlamConfig(kf_min_inliers=60, kf_flow_px=8.0, init_flow_px=10.0)

    # full run (reference)
    full = slam.run_slam(frames, intr, cfg, mcfg, scfg)

    # run the first Tc frames, checkpoint, resume for the rest
    Tc = 7
    part = slam.run_slam(frames[:Tc], intr, cfg, mcfg, scfg)
    p = str(tmp_path / "ckpt.npz")
    checkpoint.save_slam_state(p, part, next_frame=Tc)
    ck = checkpoint.load_slam_state(p)
    assert ck.next_frame == Tc

    resumed = slam.run_slam(frames, intr, cfg, mcfg, scfg, resume=ck)

    # the checkpoint carries the FULL windowed-BA context (window keyframes,
    # live descriptors, tracker velocity), so the resumed run must REPLAY the
    # uninterrupted run exactly — trajectory equality, not just an ATE bound
    assert resumed.keyframe_indices == full.keyframe_indices
    np.testing.assert_allclose(
        resumed.trajectory, full.trajectory, atol=1e-4,
        err_msg="resumed run diverged from the uninterrupted run",
    )
    np.testing.assert_array_equal(resumed.map_mask, full.map_mask)
    assert resumed.num_tracked == full.num_tracked

    # and it still hits the absolute accuracy bar
    cr = align.camera_centers(resumed.trajectory)
    gtc = align.camera_centers(gt)
    rmse_res, _ = align.ate_rmse(cr, gtc)
    span = np.linalg.norm(gtc[-1] - gtc[0])
    assert rmse_res < 0.06 * span, (rmse_res, span)
    # non-keyframe prefix rows are restored verbatim (keyframe rows are
    # retroactively refined by post-resume windowed BA, same as the full run)
    non_kf = [t for t in range(Tc - 1) if t not in full.keyframe_indices]
    np.testing.assert_allclose(
        resumed.trajectory[non_kf], part.trajectory[non_kf], atol=1e-6
    )
