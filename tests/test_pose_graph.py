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


# ---------------- Sim(3) pose graph (monocular loop closure) ----------------

def _sim3_circle_graph(n=10, drift=0.05, seed=2, noise=0.01):
    """Ground truth on a circle with per-node scale e^(drift*k); exact
    relative Sim(3) edge measurements; initialization with all scales at 1
    and noisy translations — the optimizer must recover both."""
    rng = np.random.default_rng(seed)
    gt6, gts = [], []
    for k in range(n):
        ang = 2 * np.pi * k / n
        gt6.append([0.0, ang, 0.0, np.cos(ang), 0.0, np.sin(ang)])
        gts.append(np.exp(drift * k))
    R, t = P.exp_se3(jnp.asarray(np.stack(gt6), jnp.float32))
    s = jnp.asarray(gts, jnp.float32)
    gt7 = pg.srt_to_sim7(s, R, t)

    def rel(i, j):
        sr, Rr, tr = P.relative_sim3(s[i], R[i], t[i], s[j], R[j], t[j])
        return np.asarray(pg.srt_to_sim7(sr, Rr, tr))

    ei, ej, meas = [], [], []
    for k in range(n - 1):
        ei.append(k)
        ej.append(k + 1)
        meas.append(rel(k, k + 1))
    for (i, j) in [(0, n // 2), (1, n - 2), (0, n - 1)]:
        ei.append(i)
        ej.append(j)
        meas.append(rel(i, j))
    init = np.asarray(gt7)
    init = init.copy()
    init[1:, 3:6] += rng.normal(0, noise, (n - 1, 3))
    init[:, 6] = 0.0  # all scales initialized to 1
    g = pg.Sim3PoseGraph(
        poses=jnp.asarray(init, jnp.float32),
        edge_i=jnp.asarray(ei, jnp.int32),
        edge_j=jnp.asarray(ej, jnp.int32),
        t_meas=jnp.asarray(np.stack(meas), jnp.float32),
        weight=jnp.ones(len(ei), jnp.float32),
    )
    return g, np.asarray(gt7)


def test_sim3_pose_graph_recovers_scale_drift():
    g, gt7 = _sim3_circle_graph()
    out, costs = pg.optimize_pose_graph_sim3(g, iters=12)
    assert float(costs[-1]) < 1e-6 * float(costs[0])
    got = np.asarray(out.poses)
    # per-node scales recovered (gauge: node 0 fixed at scale gt = 1)
    np.testing.assert_allclose(
        np.exp(got[:, 6]), np.exp(gt7[:, 6]), rtol=2e-3,
        err_msg="per-node scale drift not recovered",
    )
    np.testing.assert_allclose(got[:, 3:6], gt7[:, 3:6], atol=5e-3)
    # an SE(3) graph CANNOT represent the scale component: feeding it the
    # SE(3) part of the same measurements leaves large translation error
    g6 = pg.PoseGraph(
        poses=jnp.asarray(
            np.asarray(P.log_se3(*P.exp_se3(jnp.zeros((len(gt7), 6))))) * 0
            + np.concatenate(
                [gt7[:, :3], gt7[:, 3:6]], axis=1
            ),
            jnp.float32,
        ),
        edge_i=g.edge_i, edge_j=g.edge_j,
        t_meas=jnp.asarray(
            np.concatenate(
                [np.asarray(g.t_meas)[:, :3], np.asarray(g.t_meas)[:, 3:6]],
                axis=1,
            ), jnp.float32,
        ),
        weight=g.weight,
    )
    out6, costs6 = pg.optimize_pose_graph(g6, iters=12)
    assert float(costs6[-1]) > 1e3 * float(costs[-1])


def test_sim3_matches_se3_when_scales_trivial():
    """With unit scales and se3-consistent edges, the Sim(3) optimizer must
    reproduce the SE(3) optimizer's solution."""
    g_se3, gt = _circle_graph(seed=5)
    R, t = P.exp_se3(g_se3.poses)
    ones = jnp.ones(g_se3.poses.shape[0])
    Rm, tm = P.exp_se3(g_se3.t_meas)
    em = jnp.ones(g_se3.t_meas.shape[0])
    g_sim = pg.Sim3PoseGraph(
        poses=pg.srt_to_sim7(ones, R, t),
        edge_i=g_se3.edge_i, edge_j=g_se3.edge_j,
        t_meas=pg.srt_to_sim7(em, Rm, tm),
        weight=g_se3.weight,
    )
    out6, _ = pg.optimize_pose_graph(g_se3, iters=10)
    out7, _ = pg.optimize_pose_graph_sim3(g_sim, iters=10)
    R6, t6 = P.exp_se3(out6.poses)
    s7, R7, t7 = pg.sim7_to_srt(out7.poses)
    # with NOISY odometry the scale DoF absorbs a little residual (it is
    # weakly observable), so agreement is approximate, not exact
    np.testing.assert_allclose(np.asarray(s7), 1.0, atol=2e-2)
    np.testing.assert_allclose(np.asarray(t7), np.asarray(t6), atol=5e-2)


# ------------- scalable Sim(3) pose graph (matrix-free PCG) -----------------

def test_sim3_cg_matches_dense():
    """CG solver converges to the same optimum as the dense solver on the
    scale-drift circle graph."""
    g, gt7 = _sim3_circle_graph()
    out_d, costs_d = pg.optimize_pose_graph_sim3(g, iters=12)
    out_c, costs_c = pg.optimize_pose_graph_sim3_cg(g, iters=12, n_cg=80)
    assert float(costs_c[-1]) < 1e-6 * float(costs_c[0])
    got_d = np.asarray(out_d.poses)
    got_c = np.asarray(out_c.poses)
    np.testing.assert_allclose(got_c, got_d, atol=5e-4)
    np.testing.assert_allclose(np.exp(got_c[:, 6]), np.exp(gt7[:, 6]), rtol=2e-3)


def _long_chain_graph(M=1000, seed=7, odo_noise=0.01, drift=0.002, n_loop=30):
    """M-node chain with per-node scale drift, noisy odometry + exact loop
    edges — the 'pod slice, long sequence' scale the dense solver cannot
    touch (its H alone would be [7000, 7000])."""
    rng = np.random.default_rng(seed)
    ang = np.linspace(0, 4 * np.pi, M)
    gt6 = np.stack([
        np.zeros(M), ang, np.zeros(M),
        np.cos(ang) * 3, np.linspace(0, 1, M), np.sin(ang) * 3,
    ], axis=1)
    R, t = P.exp_se3(jnp.asarray(gt6, jnp.float32))
    s = jnp.asarray(np.exp(drift * np.arange(M)), jnp.float32)
    gt7 = np.asarray(pg.srt_to_sim7(s, R, t))

    def rel(i, j):
        sr, Rr, tr = P.relative_sim3(s[i], R[i], t[i], s[j], R[j], t[j])
        return np.asarray(pg.srt_to_sim7(sr, Rr, tr))

    ei, ej, meas, w = [], [], [], []
    for k in range(M - 1):
        ei.append(k)
        ej.append(k + 1)
        m = rel(k, k + 1).copy()
        m[:6] += rng.normal(0, odo_noise, 6)
        meas.append(m)
        w.append(1.0)
    for _ in range(n_loop):
        i, j = sorted(rng.choice(M, 2, replace=False))
        if j - i < 10:
            continue
        ei.append(i)
        ej.append(j)
        meas.append(rel(i, j))
        w.append(4.0)
    init = gt7.copy()
    init[1:, 3:6] += rng.normal(0, 0.02, (M - 1, 3))
    init[:, 6] = 0.0
    return pg.Sim3PoseGraph(
        poses=jnp.asarray(init, jnp.float32),
        edge_i=jnp.asarray(ei, jnp.int32),
        edge_j=jnp.asarray(ej, jnp.int32),
        t_meas=jnp.asarray(np.stack(meas), jnp.float32),
        weight=jnp.asarray(w, jnp.float32),
    ), gt7


def test_sim3_cg_thousand_nodes():
    """1000-node chain + loops: optimizes in seconds (the dense path's H
    would be [7000, 7000] with an O(M^3) solve per GN iteration).  The MAP
    optimum itself carries a few % scale error from the noisy odometry
    (verified vs the dense solver at M=300, agreement 3e-5), so the bar is
    5% — against an 86% initialization error."""
    g, gt7 = _long_chain_graph(M=1000, odo_noise=0.004, n_loop=80)
    out, costs = pg.optimize_pose_graph_sim3_cg(g, iters=10, n_cg=250)
    assert float(costs[-1]) < 1e-4 * float(costs[0])
    got = np.asarray(out.poses)
    # scale drift recovered along the whole chain (init error: 86% at the end)
    np.testing.assert_allclose(
        np.exp(got[:, 6]), np.exp(gt7[:, 6]), rtol=5e-2,
        err_msg="scale drift not recovered at 1000 nodes",
    )
    assert np.isfinite(got).all()


def test_sim3_cg_distributed_parity():
    """Edge-sharded CG on the virtual 8-device mesh == single-device."""
    import jax
    from jax.sharding import Mesh

    from siftgpu_tpu.parallel import dist_pose_graph as dpg

    g, _ = _long_chain_graph(M=120, n_loop=8)
    out_s, costs_s = pg.optimize_pose_graph_sim3_cg(g, iters=6, n_cg=60)
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("pg",))
    out_d, costs_d = dpg.optimize_pose_graph_sim3_cg_distributed(
        g, mesh, axis="pg", iters=6, n_cg=60
    )
    np.testing.assert_allclose(
        np.asarray(out_d.poses), np.asarray(out_s.poses), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(costs_d), np.asarray(costs_s), rtol=1e-4
    )
