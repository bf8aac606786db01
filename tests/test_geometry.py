"""Two-view geometry on synthetic scenes with exact ground truth (SURVEY §4.4)."""

import jax
import jax.numpy as jnp
import numpy as np

from siftgpu_tpu.geometry import epipolar, pose


def _synthetic_two_view(n=100, seed=0, noise=0.0, outliers=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform([-2, -2, 4], [2, 2, 8], (n, 3))
    # ground-truth pose of cam1 (cam0 = identity)
    rvec = np.array([0.03, -0.2, 0.05])
    t = np.array([1.0, 0.1, -0.05])
    R = np.asarray(pose.exp_so3(jnp.asarray(rvec)))
    x0 = X[:, :2] / X[:, 2:]
    Xc1 = X @ R.T + t
    x1 = Xc1[:, :2] / Xc1[:, 2:]
    x0 = x0 + rng.normal(0, noise, x0.shape)
    x1 = x1 + rng.normal(0, noise, x1.shape)
    if outliers:
        idx = rng.choice(n, outliers, replace=False)
        x1[idx] += rng.uniform(0.05, 0.3, (outliers, 2))
    return (
        jnp.asarray(x0, jnp.float32), jnp.asarray(x1, jnp.float32),
        R, t, X, set(idx.tolist()) if outliers else set(),
    )


def _essential_from_rt(R, t):
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    return tx @ R


def test_eight_point_exact():
    x0, x1, R, t, X, _ = _synthetic_two_view(60, seed=1)
    w = jnp.ones(60)
    E = epipolar.eight_point(x0, x1, w)
    d = np.asarray(epipolar.sampson_distance(E, x0, x1))
    assert d.max() < 1e-9
    # E matches ground truth up to scale/sign
    Egt = _essential_from_rt(R, t)
    En = np.asarray(E) / np.linalg.norm(E)
    Egtn = Egt / np.linalg.norm(Egt)
    assert min(np.abs(En - Egtn).max(), np.abs(En + Egtn).max()) < 1e-4


def test_ransac_rejects_outliers():
    x0, x1, R, t, X, bad = _synthetic_two_view(120, seed=2, noise=1e-4, outliers=30)
    res = epipolar.ransac_essential(
        x0, x1, jnp.ones(120, bool), jax.random.PRNGKey(0),
        num_hypotheses=256, threshold=1e-5,
    )
    inl = np.asarray(res.inliers)
    assert int(res.num_inliers) >= 80
    assert not any(inl[i] for i in bad)
    d = np.asarray(epipolar.sampson_distance(res.E, x0, x1))[inl]
    assert d.max() < 1e-5


def test_recover_pose_and_triangulate():
    x0, x1, R, t, X, _ = _synthetic_two_view(80, seed=3)
    Egt = jnp.asarray(_essential_from_rt(R, t), jnp.float32)
    tv = pose.recover_pose(Egt, x0, x1, jnp.ones(80, bool))
    assert int(tv.num_good) == 80
    # rotation exact, translation up to scale
    assert np.abs(np.asarray(tv.R) - R).max() < 1e-4
    tn = np.asarray(tv.t) / np.linalg.norm(tv.t)
    assert np.abs(tn - t / np.linalg.norm(t)).max() < 1e-4
    # triangulated points match ground truth up to the translation scale
    s = np.linalg.norm(t)
    Xr = np.asarray(tv.points) * s
    assert np.abs(Xr - X).max() < 1e-2


def test_so3_roundtrip():
    rng = np.random.default_rng(5)
    w = jnp.asarray(rng.normal(0, 1, (16, 3)), jnp.float32)
    R = pose.exp_so3(w)
    w2 = pose.log_so3(R)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-4)
    # identity safe
    np.testing.assert_allclose(
        np.asarray(pose.exp_so3(jnp.zeros(3))), np.eye(3), atol=1e-7
    )
