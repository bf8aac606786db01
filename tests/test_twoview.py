"""Config-4 integration: image pair -> features -> matches -> E -> pose -> BA."""

import jax
import jax.numpy as jnp
import numpy as np

from siftgpu_tpu.core.config import MatchConfig, SiftConfig
from siftgpu_tpu.oracle import fixtures
from siftgpu_tpu.pipeline import twoview


def test_two_view_reconstruction_recovers_pose():
    H, W = 160, 200
    intr = (180.0, 180.0, W / 2.0, H / 2.0)
    rvec = np.array([0.01, -0.03, 0.005])
    t_gt = np.array([-0.4, 0.05, 0.02])
    img0, img1, meta = fixtures.two_plane_stereo(
        H, W, intr, rvec, t_gt, d_near=5.0, d_far=10.0, seed=2
    )

    cfg = SiftConfig(height=H, width=W, max_keypoints=1024)
    mcfg = MatchConfig(max_match=1024)
    res = twoview.two_view_reconstruct(
        jnp.stack([jnp.asarray(img0), jnp.asarray(img1)]),
        jnp.asarray(intr, jnp.float32),
        cfg, mcfg, jax.random.PRNGKey(7),
    )

    assert int(res.num_matches) > 100
    assert int(res.num_inliers) > 0.5 * int(res.num_matches)

    # rotation parity with ground truth
    R = np.asarray(res.R)
    dR = R @ meta["R"].T
    ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
    assert ang < 0.01, f"rotation error {ang} rad"

    # translation direction parity (scale is not observable)
    tn = np.asarray(res.t)
    tn = tn / np.linalg.norm(tn)
    tg = t_gt / np.linalg.norm(t_gt)
    assert min(np.abs(tn - tg).max(), np.abs(tn + tg).max()) < 0.02

    # post-BA reprojection
    assert float(res.rms) < 0.75, f"rms {float(res.rms)}px"

    # triangulated structure: two depth groups at ~d_far and ~d_near scale
    # (absolute scale gauge = |t| of BA result vs |t_gt|)
    m = np.asarray(res.point_mask)
    z = np.asarray(res.points)[m][:, 2]
    s = np.linalg.norm(np.asarray(res.t)) / np.linalg.norm(t_gt)
    z = z / s
    frac_near = ((z > 4.0) & (z < 6.0)).mean()
    frac_far = ((z > 8.0) & (z < 12.0)).mean()
    assert frac_near + frac_far > 0.8, (frac_near, frac_far)
