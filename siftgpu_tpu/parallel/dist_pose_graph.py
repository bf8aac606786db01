"""Distributed pose-graph optimization: edges sharded, (H, b) psum'ed.

The second half of BASELINE config 5.  Pose graphs are small relative to BA,
so the normal equations are dense over all poses; sharding the EDGES across
devices splits the Jacobian work and needs one `psum` of (H [M,6,M,6],
b [M,6]) per GN iteration (SURVEY §5.8).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from ..optim import pose_graph as pg

__all__ = [
    "partition_edges", "optimize_pose_graph_distributed",
    "optimize_pose_graph_sim3_distributed",
    "optimize_pose_graph_sim3_cg_distributed",
]


def partition_edges(g: pg.PoseGraph, n_shards: int) -> pg.PoseGraph:
    """Pad edges to a shard-divisible count (weight-0 padding) and return a
    graph whose edge arrays have a leading shard axis folded in."""
    e = g.edge_i.shape[0]
    pad = (-e) % n_shards
    if pad:
        g = g._replace(
            edge_i=jnp.pad(g.edge_i, (0, pad)),
            edge_j=jnp.pad(g.edge_j, (0, pad)),
            t_meas=jnp.pad(g.t_meas, ((0, pad), (0, 0))),
            weight=jnp.pad(g.weight, (0, pad)),
        )
    return g


def optimize_pose_graph_distributed(
    g: pg.PoseGraph, mesh: Mesh, axis: str = "pg",
    iters: int = 10, lam: float = 1e-5, fix_first: bool = True,
):
    """Edges sharded over `axis`; poses replicated. Same result as the
    single-device optimizer (tests/test_parallel.py)."""
    n = mesh.shape[axis]
    g = partition_edges(g, n)

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def shard_fn(poses, ei, ej, tm, w):
        local = pg.PoseGraph(poses=poses, edge_i=ei, edge_j=ej, t_meas=tm, weight=w)
        out, costs = pg.optimize_pose_graph(
            local, iters=iters, lam=lam, fix_first=fix_first, psum_axis=axis
        )
        return out.poses, costs

    from . import multihost

    args = multihost.globalize_args(
        (g.poses, g.edge_i, g.edge_j, g.t_meas, g.weight),
        (P(), P(axis), P(axis), P(axis), P(axis)),
        mesh,
    )
    poses, costs = jax.jit(shard_fn)(*args)
    return g._replace(poses=poses), costs


def optimize_pose_graph_sim3_distributed(
    g: pg.Sim3PoseGraph, mesh: Mesh, axis: str = "pg",
    iters: int = 10, lam: float = 1e-5, fix_first: bool = True,
    n_fix: int = 1,
):
    """Sim(3) variant (monocular loop closure): edges sharded over `axis`,
    one psum of the 7-DoF (H, b) per GN iteration."""
    n = mesh.shape[axis]
    e = g.edge_i.shape[0]
    pad = (-e) % n
    if pad:
        g = g._replace(
            edge_i=jnp.pad(g.edge_i, (0, pad)),
            edge_j=jnp.pad(g.edge_j, (0, pad)),
            t_meas=jnp.pad(g.t_meas, ((0, pad), (0, 0))),
            weight=jnp.pad(g.weight, (0, pad)),
        )

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def shard_fn(poses, ei, ej, tm, w):
        local = pg.Sim3PoseGraph(
            poses=poses, edge_i=ei, edge_j=ej, t_meas=tm, weight=w
        )
        out, costs = pg.optimize_pose_graph_sim3(
            local, iters=iters, lam=lam, fix_first=fix_first,
            psum_axis=axis, n_fix=n_fix,
        )
        return out.poses, costs

    from . import multihost

    args = multihost.globalize_args(
        (g.poses, g.edge_i, g.edge_j, g.t_meas, g.weight),
        (P(), P(axis), P(axis), P(axis), P(axis)),
        mesh,
    )
    poses, costs = jax.jit(shard_fn)(*args)
    return g._replace(poses=poses), costs


def optimize_pose_graph_sim3_cg_distributed(
    g: pg.Sim3PoseGraph, mesh: Mesh, axis: str = "pg",
    iters: int = 10, lam: float = 1e-5, fix_first: bool = True,
    n_cg: int = 60, n_fix: int = 1,
):
    """Scalable Sim(3) variant: edges sharded, matrix-free PCG — every psum
    is an O(M) vector ([M,7] per CG step, [M,7,7] once per GN iteration),
    never a dense [7M,7M] H (VERDICT r3 missing #4)."""
    n = mesh.shape[axis]
    e = g.edge_i.shape[0]
    pad = (-e) % n
    if pad:
        g = g._replace(
            edge_i=jnp.pad(g.edge_i, (0, pad)),
            edge_j=jnp.pad(g.edge_j, (0, pad)),
            t_meas=jnp.pad(g.t_meas, ((0, pad), (0, 0))),
            weight=jnp.pad(g.weight, (0, pad)),
        )

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def shard_fn(poses, ei, ej, tm, w):
        local = pg.Sim3PoseGraph(
            poses=poses, edge_i=ei, edge_j=ej, t_meas=tm, weight=w
        )
        out, costs = pg.optimize_pose_graph_sim3_cg(
            local, iters=iters, lam=lam, fix_first=fix_first,
            psum_axis=axis, n_cg=n_cg, n_fix=n_fix,
        )
        return out.poses, costs

    from . import multihost

    args = multihost.globalize_args(
        (g.poses, g.edge_i, g.edge_j, g.t_meas, g.weight),
        (P(), P(axis), P(axis), P(axis), P(axis)),
        mesh,
    )
    poses, costs = jax.jit(shard_fn)(*args)
    return g._replace(poses=poses), costs
