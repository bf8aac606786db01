"""Bundle adjustment on synthetic scenes: perturb -> optimize -> recover."""

import jax.numpy as jnp
import numpy as np

from siftgpu_tpu.geometry import pose
from siftgpu_tpu.optim import ba


def _make_problem(n_cams=4, n_pts=60, seed=0, perturb=0.05, pix_noise=0.0):
    rng = np.random.default_rng(seed)
    X = rng.uniform([-2, -2, 6], [2, 2, 10], (n_pts, 3))
    intr = np.array([500.0, 500.0, 320.0, 240.0], np.float32)
    cams_gt = []
    for i in range(n_cams):
        rvec = rng.normal(0, 0.03, 3)
        t = np.array([0.5 * i, 0, 0]) + rng.normal(0, 0.02, 3)
        cams_gt.append(np.concatenate([rvec, t]))
    cams_gt = np.stack(cams_gt).astype(np.float32)

    cam_idx, pt_idx, uvs = [], [], []
    for ci in range(n_cams):
        R = np.asarray(pose.exp_so3(jnp.asarray(cams_gt[ci, :3])))
        Xc = X @ R.T + cams_gt[ci, 3:]
        uv = intr[:2] * Xc[:, :2] / Xc[:, 2:] + intr[2:]
        for pi in range(n_pts):
            cam_idx.append(ci)
            pt_idx.append(pi)
            uvs.append(uv[pi] + rng.normal(0, pix_noise, 2))
    cams0 = cams_gt.copy()
    cams0[1:] += rng.normal(0, perturb, cams0[1:].shape).astype(np.float32)
    X0 = X + rng.normal(0, perturb, X.shape)

    prob = ba.BAProblem(
        cams=jnp.asarray(cams0),
        points=jnp.asarray(X0, jnp.float32),
        intrinsics=jnp.asarray(intr),
        cam_idx=jnp.asarray(cam_idx, jnp.int32),
        pt_idx=jnp.asarray(pt_idx, jnp.int32),
        uv=jnp.asarray(np.stack(uvs), jnp.float32),
        w=jnp.ones(len(uvs), jnp.float32),
    )
    return prob, cams_gt, X


def test_ba_reduces_cost_to_zero():
    prob, cams_gt, X = _make_problem()
    r0 = np.asarray(ba.reprojection_residuals(prob, prob.cams, prob.points))
    rms0 = np.sqrt((r0**2).mean())
    state = ba.run_ba(prob, iters=15, n_cg=40)
    r1 = np.asarray(ba.reprojection_residuals(prob, state.cams, state.points))
    rms1 = np.sqrt((r1**2).mean())
    assert rms0 > 5.0          # perturbation is visible
    assert rms1 < 1e-2         # converged to (noise-free) optimum
    assert float(state.cost) < float((r0**2).sum())


def test_ba_first_camera_frozen():
    prob, _, _ = _make_problem(seed=3)
    state = ba.run_ba(prob, iters=5, n_cg=20)
    np.testing.assert_allclose(
        np.asarray(state.cams[0]), np.asarray(prob.cams[0]), atol=1e-7
    )


def test_ba_masked_observations_ignored():
    prob, _, _ = _make_problem(seed=4)
    # corrupt 10 observations but zero their weights: result must still converge
    uv = np.asarray(prob.uv).copy()
    w = np.asarray(prob.w).copy()
    uv[:10] += 500.0
    w[:10] = 0.0
    prob2 = prob._replace(uv=jnp.asarray(uv), w=jnp.asarray(w))
    state = ba.run_ba(prob2, iters=15, n_cg=40)
    r = np.asarray(ba.reprojection_residuals(prob2, state.cams, state.points))
    assert np.sqrt((r**2).mean()) < 1e-2


def test_ba_with_noise_converges_to_gt_scale():
    prob, cams_gt, X = _make_problem(seed=5, perturb=0.03, pix_noise=0.3)
    state = ba.run_ba(prob, iters=15, n_cg=40)
    # camera positions should be close to ground truth (gauge: cam0 fixed,
    # scale fixed by fixing all of cam0 and the observation geometry)
    d = np.abs(np.asarray(state.cams[1:, 3:]) - cams_gt[1:, 3:])
    assert d.max() < 0.05
