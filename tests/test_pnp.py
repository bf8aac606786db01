import jax.numpy as jnp
import numpy as np

from siftgpu_tpu.geometry import pose as P
from siftgpu_tpu.optim import pnp


def _scene(n=80, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform([-2, -2, 5], [2, 2, 12], (n, 3)).astype(np.float32)
    intr = np.array([300.0, 300.0, 160.0, 120.0], np.float32)
    gt = np.array([0.04, -0.06, 0.02, 0.3, -0.1, 0.15], np.float32)
    R, t = P.exp_se3(jnp.asarray(gt))
    Xc = X @ np.asarray(R).T + np.asarray(t)
    uv = intr[:2] * Xc[:, :2] / Xc[:, 2:] + intr[2:]
    return X, uv.astype(np.float32), intr, gt


def test_pnp_recovers_pose():
    X, uv, intr, gt = _scene()
    res = pnp.pnp_gn(
        jnp.asarray(X), jnp.asarray(uv), jnp.ones(len(X)),
        jnp.asarray(intr), jnp.zeros(6), iters=12,
    )
    np.testing.assert_allclose(np.asarray(res.pose), gt, atol=1e-4)
    assert int(res.num_inliers) == len(X)
    assert float(res.rms) < 1e-3


def test_pnp_robust_to_outliers():
    X, uv, intr, gt = _scene(seed=2)
    uv = uv.copy()
    uv[:15] += 80.0   # gross outliers
    res = pnp.pnp_gn(
        jnp.asarray(X), jnp.asarray(uv), jnp.ones(len(X)),
        jnp.asarray(intr), jnp.zeros(6), iters=15, huber_px=2.0,
    )
    np.testing.assert_allclose(np.asarray(res.pose), gt, atol=2e-3)
    inl = np.asarray(res.inliers)
    assert not inl[:15].any()
    assert inl[15:].all()


def test_pnp_respects_weights():
    X, uv, intr, gt = _scene(seed=3)
    uv = uv.copy()
    uv[:10] += 500.0
    w = np.ones(len(X), np.float32)
    w[:10] = 0.0      # masked out entirely
    res = pnp.pnp_gn(
        jnp.asarray(X), jnp.asarray(uv), jnp.asarray(w),
        jnp.asarray(intr), jnp.zeros(6), iters=12,
    )
    np.testing.assert_allclose(np.asarray(res.pose), gt, atol=1e-4)
