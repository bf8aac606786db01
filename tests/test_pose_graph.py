"""Pose-graph optimization: noisy odometry + loop closures -> recover poses."""

import jax.numpy as jnp
import numpy as np

from siftgpu_tpu.geometry import pose as P
from siftgpu_tpu.optim import pose_graph as pg


def _circle_graph(n=12, seed=0, odo_noise=0.02, n_loop=4):
    """Ground-truth poses on a circle; noisy odometry edges + exact loops."""
    rng = np.random.default_rng(seed)
    gt = []
    for k in range(n):
        ang = 2 * np.pi * k / n
        # camera k: rotated about y, positioned on a circle
        xi = np.array([0.0, ang, 0.0, np.cos(ang), 0.0, np.sin(ang)])
        gt.append(xi)
    gt = jnp.asarray(np.stack(gt), jnp.float32)

    def rel(i, j):
        Ri, ti = P.exp_se3(gt[i])
        Rj, tj = P.exp_se3(gt[j])
        R, t = P.relative(Ri, ti, Rj, tj)
        return P.log_se3(R, t)

    ei, ej, meas, w = [], [], [], []
    for k in range(n - 1):
        ei.append(k)
        ej.append(k + 1)
        noise = rng.normal(0, odo_noise, 6)
        meas.append(np.asarray(rel(k, k + 1)) + noise)
        w.append(1.0)
    # loop closures (exact)
    for _ in range(n_loop):
        i, j = sorted(rng.choice(n, 2, replace=False))
        if j - i < 2:
            continue
        ei.append(i)
        ej.append(j)
        meas.append(np.asarray(rel(i, j)))
        w.append(2.0)
    # initialization: integrate noisy odometry
    init = [np.asarray(gt[0])]
    for k in range(n - 1):
        Ri, ti = P.exp_se3(jnp.asarray(init[-1]))
        Rm, tm = P.exp_se3(jnp.asarray(meas[k], jnp.float32))
        R, t = P.compose(Rm, tm, Ri, ti)
        init.append(np.asarray(P.log_se3(R, t)))
    g = pg.PoseGraph(
        poses=jnp.asarray(np.stack(init), jnp.float32),
        edge_i=jnp.asarray(ei, jnp.int32),
        edge_j=jnp.asarray(ej, jnp.int32),
        t_meas=jnp.asarray(np.stack(meas), jnp.float32),
        weight=jnp.asarray(w, jnp.float32),
    )
    return g, gt


def _pose_errors(poses, gt):
    R1, t1 = P.exp_se3(poses)
    R2, t2 = P.exp_se3(gt)
    dt = np.linalg.norm(np.asarray(t1 - t2), axis=1)
    tr = np.trace(np.asarray(R1 @ np.swapaxes(np.asarray(R2), 1, 2)), axis1=1, axis2=2)
    ang = np.arccos(np.clip((tr - 1) / 2, -1, 1))
    return dt, ang


def test_pose_graph_reduces_drift():
    g, gt = _circle_graph()
    dt0, ang0 = _pose_errors(g.poses, gt)
    out, costs = pg.optimize_pose_graph(g, iters=10)
    dt1, ang1 = _pose_errors(out.poses, gt)
    assert float(costs[-1]) < float(costs[0])
    # loop closures pull the integrated-odometry drift down
    assert dt1.max() < 0.6 * dt0.max()
    assert ang1.max() < ang0.max() + 1e-6
    # first pose frozen
    np.testing.assert_allclose(np.asarray(out.poses[0]), np.asarray(g.poses[0]), atol=1e-7)


def test_se3_roundtrip():
    rng = np.random.default_rng(1)
    xi = jnp.asarray(rng.normal(0, 0.7, (8, 6)), jnp.float32)
    R, t = P.exp_se3(xi)
    xi2 = P.log_se3(R, t)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-4)


def test_zero_weight_edges_ignored():
    g, gt = _circle_graph(seed=3)
    # add a wildly wrong edge with zero weight: result must be unchanged
    g2 = g._replace(
        edge_i=jnp.concatenate([g.edge_i, jnp.asarray([0], jnp.int32)]),
        edge_j=jnp.concatenate([g.edge_j, jnp.asarray([5], jnp.int32)]),
        t_meas=jnp.concatenate([g.t_meas, jnp.full((1, 6), 9.0, jnp.float32)]),
        weight=jnp.concatenate([g.weight, jnp.zeros(1, jnp.float32)]),
    )
    out1, _ = pg.optimize_pose_graph(g, iters=5)
    out2, _ = pg.optimize_pose_graph(g2, iters=5)
    np.testing.assert_allclose(
        np.asarray(out2.poses), np.asarray(out1.poses), atol=1e-5
    )
