"""Config-5 sequence pipeline: distributed extraction + dist BA + pose graph
must reproduce the single-device SLAM trajectory (BASELINE.json config 5)."""

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


def _scene(T=8, H=144, W=192):
    intr = (170.0, 170.0, W / 2.0, H / 2.0)
    frames, gt = fixtures.two_plane_sequence(
        T, H, W, intr,
        rvec_step=np.array([0.002, -0.004, 0.001]),
        t_step=np.array([-0.08, 0.012, 0.006]),
        d_near=5.0, d_far=10.0, seed=4,
    )
    cfg = SiftConfig(height=H, width=W, max_keypoints=768)
    mcfg = MatchConfig(max_match=768)
    scfg = slam.SlamConfig(kf_min_inliers=60, kf_flow_px=8.0, init_flow_px=10.0)
    return frames, gt, intr, cfg, mcfg, scfg


def test_sequence_pipeline_matches_single_device():
    frames, gt, intr, cfg, mcfg, scfg = _scene()
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "spatial"))

    single = slam.run_slam(frames, intr, cfg, mcfg, scfg)
    dist = sequence.run_slam_distributed(
        frames, intr, cfg, mcfg, scfg, mesh, data_axis="data"
    )

    assert dist.keyframe_indices == single.keyframe_indices
    # identical keyframe decisions => trajectories agree to solver tolerance
    err = np.abs(dist.trajectory - single.trajectory)
    assert err.max() < 5e-3, f"trajectory divergence {err.max()}"

    # and the distributed trajectory hits the same ATE bar as test_slam
    est_c = align.camera_centers(dist.trajectory)
    gt_c = align.camera_centers(gt)
    rmse, _ = align.ate_rmse(est_c, gt_c, with_scale=True)
    span = np.linalg.norm(gt_c[-1] - gt_c[0])
    assert rmse < 0.05 * span, f"ATE {rmse} vs span {span}"


def test_extract_sequence_dp_matches_batched():
    """Chunked DP sequence extraction == one batched extraction."""
    import jax.numpy as jnp

    from siftgpu_tpu.frontend.extract import extract_features_jit

    frames, _, _, cfg, _, _ = _scene(T=6)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "spatial"))
    seq = sequence.extract_sequence_dp(frames, cfg, mesh, chunk=4)
    ref = extract_features_jit(jnp.asarray(frames), cfg)
    np.testing.assert_array_equal(seq.mask, np.asarray(ref.mask))
    np.testing.assert_allclose(seq.x, np.asarray(ref.x), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(seq.desc), np.asarray(ref.desc))


def test_host_resident_feature_store_matches_device():
    """Beyond the HBM budget the descriptor store lives on host and uploads
    per frame — identical features and trajectory (bounded device memory for
    arbitrarily long sequences)."""
    frames, gt, intr, cfg, mcfg, scfg = _scene(T=6)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "spatial"))
    dev = sequence.extract_sequence_dp(frames, cfg, mesh, chunk=4)
    host = sequence.extract_sequence_dp(
        frames, cfg, mesh, chunk=4, desc_hbm_budget=0
    )
    assert isinstance(host.desc, np.ndarray) and not isinstance(
        dev.desc, np.ndarray
    )
    np.testing.assert_array_equal(np.asarray(dev.desc), host.desc)
    r_dev = slam.run_slam(frames, intr, cfg, mcfg, scfg, features=dev)
    r_host = slam.run_slam(frames, intr, cfg, mcfg, scfg, features=host)
    np.testing.assert_allclose(r_host.trajectory, r_dev.trajectory, atol=1e-6)
    assert r_host.keyframe_indices == r_dev.keyframe_indices
