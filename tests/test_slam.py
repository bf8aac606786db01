"""SLAM loop on a synthetic sequence with exact ground truth (ATE metric)."""

import numpy as np

from siftgpu_tpu.core.config import MatchConfig, SiftConfig
from siftgpu_tpu.geometry import align
from siftgpu_tpu.oracle import fixtures
from siftgpu_tpu.pipeline import slam


def test_slam_sequence_ate():
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
    res = slam.run_slam(frames, intr, cfg, mcfg, scfg)

    assert len(res.keyframe_indices) >= 2
    assert res.map_mask.sum() > 50
    # tracking never collapsed after bootstrap
    boot = res.keyframe_indices[1]
    assert all(n > 20 for n in res.num_tracked[boot:])

    est_c = align.camera_centers(res.trajectory)
    gt_c = align.camera_centers(gt)
    rmse, err = align.ate_rmse(est_c, gt_c, with_scale=True)
    # trajectory span is ~0.5 units; demand ATE well under 5% of span
    span = np.linalg.norm(gt_c[-1] - gt_c[0])
    assert rmse < 0.05 * span, f"ATE {rmse} vs span {span}"
