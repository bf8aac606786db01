"""Distributed paths on the virtual 8-device CPU mesh (SURVEY §4 item 3):
data-parallel extraction, spatially-sharded (halo-exchange) extraction,
distributed Schur-complement BA, and the driver dry run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from siftgpu_tpu import SiftConfig, extract_features_jit
from siftgpu_tpu.oracle import fixtures
from siftgpu_tpu.optim import ba
from siftgpu_tpu.parallel import dist_ba, dp, spatial


def _mesh(n, name):
    assert len(jax.devices()) >= n
    return Mesh(np.array(jax.devices()[:n]), axis_names=(name,))


def test_data_parallel_matches_single_device():
    cfg = SiftConfig(height=64, width=80, max_keypoints=128, num_octaves=2)
    imgs = jnp.asarray(
        np.stack([fixtures.random_texture(64, 80, seed=s) for s in range(4)])
    )
    ref = extract_features_jit(imgs, cfg)
    mesh = _mesh(4, "data")
    out = dp.extract_features_dp(imgs, cfg, mesh, axis="data")
    np.testing.assert_array_equal(np.asarray(ref.mask), np.asarray(out.mask))
    np.testing.assert_allclose(np.asarray(ref.x), np.asarray(out.x), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ref.desc), np.asarray(out.desc))


@pytest.mark.parametrize(
    "n",
    [2, pytest.param(4, marks=pytest.mark.slow),
     pytest.param(8, marks=pytest.mark.slow)],
)
def test_spatial_sharding_matches_single_device(n):
    H, W = 256, 96
    cfg = SiftConfig(height=H, width=W, max_keypoints=512)
    img = jnp.asarray(fixtures.random_texture(H, W, seed=3)[None])
    ref = extract_features_jit(img, cfg)
    out = spatial.extract_features_spatial(img, cfg, _mesh(n, "spatial"))
    mr = np.asarray(ref.mask[0])
    ms = np.asarray(out.mask[0])
    assert mr.sum() == ms.sum() > 50

    def rows(f, m):
        a = np.stack(
            [np.asarray(f.x[0])[m], np.asarray(f.y[0])[m],
             np.asarray(f.sigma[0])[m], np.asarray(f.theta[0])[m]], axis=1
        )
        order = np.lexsort((a[:, 3], a[:, 1], a[:, 0]))
        return a[order], order

    ra, oa = rows(ref, mr)
    rb, ob = rows(out, ms)
    np.testing.assert_allclose(ra, rb, atol=5e-3)
    da = np.asarray(ref.desc[0])[mr][oa].astype(int)
    db = np.asarray(out.desc[0])[ms][ob].astype(int)
    assert np.abs(da - db).max() <= 2    # quantization-step float noise


def test_distributed_ba_matches_single_device():
    from test_ba import _make_problem

    prob, _, _ = _make_problem(n_cams=4, n_pts=64, seed=7)
    ref = ba.run_ba(prob, iters=8, n_cg=25)
    sprob = dist_ba.partition_problem(prob, 8)
    state, _ = dist_ba.run_ba_distributed(
        sprob, _mesh(8, "ba"), axis="ba", iters=8, n_cg=25
    )
    # both must reach the (noise-free) optimum
    assert float(ref.cost) < 1e-4 and float(state.cost) < 1e-4
    # rotations are gauge-free: compare directly
    np.testing.assert_allclose(
        np.asarray(state.cams[:, :3]), np.asarray(ref.cams[:, :3]), atol=1e-3
    )
    # translations/points only up to the global scene-scale gauge (central
    # projection with cam0 frozen is invariant under scene scaling)
    t_ref = np.asarray(ref.cams[1:, 3:]).ravel()
    t_dst = np.asarray(state.cams[1:, 3:]).ravel()
    s = float(t_dst @ t_ref) / max(float(t_dst @ t_dst), 1e-12)
    np.testing.assert_allclose(t_dst * s, t_ref, atol=1e-3)
    pts = np.asarray(state.points).reshape(-1, 3)[: prob.points.shape[0]]
    np.testing.assert_allclose(pts * s, np.asarray(ref.points), atol=5e-3)


def test_dryrun_multichip():
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_distributed_pose_graph_matches_single_device():
    from test_pose_graph import _circle_graph

    from siftgpu_tpu.optim import pose_graph as pg
    from siftgpu_tpu.parallel import dist_pose_graph as dpg

    g, gt = _circle_graph(seed=11)
    ref, ref_costs = pg.optimize_pose_graph(g, iters=8)
    out, costs = dpg.optimize_pose_graph_distributed(
        g, _mesh(8, "pg"), axis="pg", iters=8
    )
    np.testing.assert_allclose(
        np.asarray(out.poses), np.asarray(ref.poses), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(costs), np.asarray(ref_costs), rtol=1e-4
    )


def test_distributed_sim3_pose_graph_matches_single_device():
    """Sim(3) (7-DoF) edge-sharded pose graph == single-device optimizer,
    including weight-0 shard padding."""
    from test_pose_graph import _sim3_circle_graph

    from siftgpu_tpu.optim import pose_graph as pg
    from siftgpu_tpu.parallel import dist_pose_graph as dpg

    g, gt7 = _sim3_circle_graph(seed=7)
    ref, ref_costs = pg.optimize_pose_graph_sim3(g, iters=8)
    out, costs = dpg.optimize_pose_graph_sim3_distributed(
        g, _mesh(8, "pg"), axis="pg", iters=8
    )
    np.testing.assert_allclose(
        np.asarray(out.poses), np.asarray(ref.poses), atol=1e-4
    )
    # costs converge to ~1e-13; below that the reduction-order noise floor
    # dominates a pure relative comparison
    np.testing.assert_allclose(
        np.asarray(costs), np.asarray(ref_costs), rtol=1e-4, atol=1e-10
    )
    # and it actually recovered the synthetic scale drift
    np.testing.assert_allclose(
        np.exp(np.asarray(out.poses)[:, 6]), np.exp(gt7[:, 6]), rtol=5e-3
    )
