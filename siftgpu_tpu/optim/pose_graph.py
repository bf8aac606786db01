"""Pose-graph optimization over SE(3) (BASELINE config 5's second half).

Gauss-Newton on relative-pose constraints: for edge (i, j) with measured
T_ij, residual r = log_se3(T_ij_meas^-1 . T_j . T_i^-1) in R^6, weighted by
per-edge scalar information.  Small dense normal equations (pose graphs are
tiny next to BA); per-edge Jacobians by forward-mode autodiff through the
exp/log maps.  `psum_axis` shards edges across devices with one `psum` of
(H, b) per iteration — the distributed pose-graph leg of SURVEY §5.8.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..geometry import pose as P

__all__ = [
    "PoseGraph", "optimize_pose_graph",
    "Sim3PoseGraph", "optimize_pose_graph_sim3",
    "optimize_pose_graph_sim3_cg", "sim7_to_srt", "srt_to_sim7",
]


class PoseGraph(NamedTuple):
    poses: jax.Array    # [M, 6] se3 twists (world->cam_i as exp(xi))
    edge_i: jax.Array   # [E] int32
    edge_j: jax.Array   # [E] int32
    t_meas: jax.Array   # [E, 6] measured relative twists T_ij (cam_i -> cam_j)
    weight: jax.Array   # [E] scalar information (0 masks the edge)


def _edge_residual_local(di, dj, Ri, ti, Rj, tj, Rm, tm):
    """Residual as a function of LOCAL left-multiplicative perturbations
    (manifold GN: T_i <- exp(di) . T_i), evaluated/differentiated at d = 0.
    Avoids the exp-chart singularity at |w| = pi that makes global-twist
    parameterization ill-conditioned."""
    dRi, dti = P.exp_se3(di)
    dRj, dtj = P.exp_se3(dj)
    Ri2, ti2 = P.compose(dRi, dti, Ri, ti)
    Rj2, tj2 = P.compose(dRj, dtj, Rj, tj)
    Rrel, trel = P.relative(Ri2, ti2, Rj2, tj2)
    Rminv, tminv = P.inverse(Rm, tm)
    Re, te = P.compose(Rminv, tminv, Rrel, trel)
    return P.log_se3(Re, te)


def optimize_pose_graph(
    g: PoseGraph, iters: int = 10, lam: float = 1e-5,
    fix_first: bool = True, psum_axis: Optional[str] = None,
) -> PoseGraph:
    M = g.poses.shape[0]

    def allred(x):
        return jax.lax.psum(x, psum_axis) if psum_axis else x

    Rm_all, tm_all = P.exp_se3(g.t_meas)
    zero6 = jnp.zeros(6)

    def step(carry, _):
        R_all, t_all = carry

        def per_edge(i, j, Rm, tm, w):
            args = (R_all[i], t_all[i], R_all[j], t_all[j], Rm, tm)
            r = _edge_residual_local(zero6, zero6, *args)
            Ji = jax.jacfwd(_edge_residual_local, argnums=0)(zero6, zero6, *args)
            Jj = jax.jacfwd(_edge_residual_local, argnums=1)(zero6, zero6, *args)
            sw = jnp.sqrt(w)
            return r * sw, Ji * sw, Jj * sw

        r, Ji, Jj = jax.vmap(per_edge)(
            g.edge_i, g.edge_j, Rm_all, tm_all, g.weight
        )

        # dense normal equations over all pose blocks
        H = jnp.zeros((M, 6, M, 6))
        b = jnp.zeros((M, 6))
        ii = jnp.einsum("eab,eac->ebc", Ji, Ji)
        jj = jnp.einsum("eab,eac->ebc", Jj, Jj)
        ij = jnp.einsum("eab,eac->ebc", Ji, Jj)
        H = H.at[g.edge_i, :, g.edge_i, :].add(ii)
        H = H.at[g.edge_j, :, g.edge_j, :].add(jj)
        H = H.at[g.edge_i, :, g.edge_j, :].add(ij)
        H = H.at[g.edge_j, :, g.edge_i, :].add(jnp.swapaxes(ij, -1, -2))
        b = b.at[g.edge_i].add(-jnp.einsum("eab,ea->eb", Ji, r))
        b = b.at[g.edge_j].add(-jnp.einsum("eab,ea->eb", Jj, r))

        H = allred(H)
        b = allred(b)

        Hf = H.reshape(6 * M, 6 * M) + lam * jnp.eye(6 * M)
        bf = b.reshape(6 * M)
        if fix_first:
            # freeze pose 0: zero its rows/cols, identity diagonal
            mask = jnp.arange(6 * M) >= 6
            Hf = jnp.where(mask[:, None] & mask[None, :], Hf, 0.0)
            Hf = Hf + jnp.diag(jnp.where(mask, 0.0, 1.0))
            bf = jnp.where(mask, bf, 0.0)
        dx = jnp.linalg.solve(Hf, bf).reshape(M, 6)
        dR, dt = P.exp_se3(dx)
        R_new, t_new = P.compose(dR, dt, R_all, t_all)
        return (R_new, t_new), allred((r * r).sum())

    R0, t0 = P.exp_se3(g.poses)
    (Rf, tf), costs = jax.lax.scan(step, (R0, t0), None, length=iters)
    return g._replace(poses=P.log_se3(Rf, tf)), costs


optimize_pose_graph_jit = partial(jax.jit, static_argnums=(1, 3, 4))(
    optimize_pose_graph
)


# ---------------- Sim(3) pose graph (monocular loop closure) ----------------
# Monocular scale drifts along the trajectory; an SE(3) graph cannot absorb
# that error mode, so loop correction optimizes per-keyframe SCALE too (the
# classic monocular formulation — 7-DoF states, 7-dim edge residuals).
#
# Chart convention: a Sim(3) measurement / perturbation is a 7-vector
# [omega(3), t(3), lambda(1)] mapped DIRECTLY to (s, R, t) =
# (e^lambda, exp_so3(omega), t) — a first-order-equivalent chart of the true
# sim(3) exponential (no W-matrix): residuals are zero iff the transforms
# agree, which is all GN needs.  `sim7_to_srt` / `srt_to_sim7` define it.


class Sim3PoseGraph(NamedTuple):
    poses: jax.Array    # [M, 7] chart coords (world->cam, s x -> s R x + t)
    edge_i: jax.Array   # [E] int32
    edge_j: jax.Array   # [E] int32
    t_meas: jax.Array   # [E, 7] measured relative transforms S_ij (chart)
    weight: jax.Array   # [E] scalar information (0 masks the edge)


def sim7_to_srt(v):
    """[..., 7] chart vector -> (s, R, t)."""
    return jnp.exp(v[..., 6]), P.exp_so3(v[..., :3]), v[..., 3:6]


def srt_to_sim7(s, R, t):
    return jnp.concatenate(
        [P.log_so3(R), t, jnp.log(s)[..., None]], axis=-1
    )


def _sim3_edge_residual_local(di, dj, si, Ri, ti, sj, Rj, tj, sm, Rm, tm):
    """7-dim residual under LOCAL left perturbations (evaluated at d = 0)."""
    S_i = P.compose_sim3(*sim7_to_srt(di), si, Ri, ti)
    S_j = P.compose_sim3(*sim7_to_srt(dj), sj, Rj, tj)
    S_rel = P.relative_sim3(*S_i, *S_j)
    s_e, R_e, t_e = P.compose_sim3(*P.inverse_sim3(sm, Rm, tm), *S_rel)
    return srt_to_sim7(s_e, R_e, t_e)


def optimize_pose_graph_sim3(
    g: Sim3PoseGraph, iters: int = 10, lam: float = 1e-5,
    fix_first: bool = True, psum_axis: Optional[str] = None,
    n_fix: int = 1,
) -> Tuple[Sim3PoseGraph, jax.Array]:
    """Gauss-Newton over (pose, scale) per node; same structure as the SE(3)
    optimizer (dense normal equations, optional edge-sharded psum).

    `n_fix` freezes the FIRST n nodes (pose and scale) — n_fix=1 is the
    usual gauge anchor; larger values implement the online loop-correction
    policy where the established chain stays put and only the recent
    segment snaps onto the loop constraint (`fix_first=False` forces
    n_fix=0)."""
    M = g.poses.shape[0]
    D = 7
    if not fix_first:
        n_fix = 0

    def allred(x):
        return jax.lax.psum(x, psum_axis) if psum_axis else x

    sm_all, Rm_all, tm_all = sim7_to_srt(g.t_meas)
    zero7 = jnp.zeros(D)

    def step(carry, _):
        s_all, R_all, t_all = carry

        def per_edge(i, j, sm, Rm, tm, w):
            args = (s_all[i], R_all[i], t_all[i],
                    s_all[j], R_all[j], t_all[j], sm, Rm, tm)
            r = _sim3_edge_residual_local(zero7, zero7, *args)
            Ji = jax.jacfwd(_sim3_edge_residual_local, argnums=0)(
                zero7, zero7, *args)
            Jj = jax.jacfwd(_sim3_edge_residual_local, argnums=1)(
                zero7, zero7, *args)
            sw = jnp.sqrt(w)
            return r * sw, Ji * sw, Jj * sw

        r, Ji, Jj = jax.vmap(per_edge)(
            g.edge_i, g.edge_j, sm_all, Rm_all, tm_all, g.weight
        )

        H = jnp.zeros((M, D, M, D))
        b = jnp.zeros((M, D))
        ii = jnp.einsum("eab,eac->ebc", Ji, Ji)
        jj = jnp.einsum("eab,eac->ebc", Jj, Jj)
        ij = jnp.einsum("eab,eac->ebc", Ji, Jj)
        H = H.at[g.edge_i, :, g.edge_i, :].add(ii)
        H = H.at[g.edge_j, :, g.edge_j, :].add(jj)
        H = H.at[g.edge_i, :, g.edge_j, :].add(ij)
        H = H.at[g.edge_j, :, g.edge_i, :].add(jnp.swapaxes(ij, -1, -2))
        b = b.at[g.edge_i].add(-jnp.einsum("eab,ea->eb", Ji, r))
        b = b.at[g.edge_j].add(-jnp.einsum("eab,ea->eb", Jj, r))

        H = allred(H)
        b = allred(b)

        Hf = H.reshape(D * M, D * M) + lam * jnp.eye(D * M)
        bf = b.reshape(D * M)
        if n_fix > 0:
            # freeze the first n_fix nodes (pose AND scale): gauge + global
            # scale anchor (+ the established chain in online mode)
            mask = jnp.arange(D * M) >= D * n_fix
            Hf = jnp.where(mask[:, None] & mask[None, :], Hf, 0.0)
            Hf = Hf + jnp.diag(jnp.where(mask, 0.0, 1.0))
            bf = jnp.where(mask, bf, 0.0)
        dx = jnp.linalg.solve(Hf, bf).reshape(M, D)
        s_new, R_new, t_new = P.compose_sim3(
            *sim7_to_srt(dx), s_all, R_all, t_all
        )
        return (s_new, R_new, t_new), allred((r * r).sum())

    s0, R0, t0 = sim7_to_srt(g.poses)
    (sf, Rf, tf), costs = jax.lax.scan(step, (s0, R0, t0), None, length=iters)
    return g._replace(poses=srt_to_sim7(sf, Rf, tf)), costs


# ------------- scalable Sim(3) pose graph (block-sparse GN + PCG) -----------
# The dense optimizer materializes [7M, 7M] normal equations and solves them
# with an O(M^3) replicated `linalg.solve` (and the distributed variant psums
# the dense H every iteration) — fine at M ~ tens, unusable at "pod slice,
# long sequence" scale (VERDICT r3 missing #4).  This variant never forms H:
# H @ x is evaluated per-edge and scattered with segment-sums, preconditioned
# by the block-Jacobi 7x7 diagonal, so an edge-sharded distributed run psums
# only O(M)-sized vectors ([M,7] per CG step, [M,7,7] once per GN iteration).


def _sim3_linearize(g: Sim3PoseGraph, s_all, R_all, t_all):
    """Per-edge residuals + Jacobians at the current estimate.
    Returns r [E,7], Ji [E,7,7], Jj [E,7,7] (weight-folded)."""
    sm_all, Rm_all, tm_all = sim7_to_srt(g.t_meas)
    zero7 = jnp.zeros(7)

    def per_edge(i, j, sm, Rm, tm, w):
        args = (s_all[i], R_all[i], t_all[i],
                s_all[j], R_all[j], t_all[j], sm, Rm, tm)
        r = _sim3_edge_residual_local(zero7, zero7, *args)
        Ji = jax.jacfwd(_sim3_edge_residual_local, argnums=0)(zero7, zero7, *args)
        Jj = jax.jacfwd(_sim3_edge_residual_local, argnums=1)(zero7, zero7, *args)
        sw = jnp.sqrt(w)
        return r * sw, Ji * sw, Jj * sw

    return jax.vmap(per_edge)(
        g.edge_i, g.edge_j, sm_all, Rm_all, tm_all, g.weight
    )


def optimize_pose_graph_sim3_cg(
    g: Sim3PoseGraph, iters: int = 10, lam: float = 1e-5,
    fix_first: bool = True, psum_axis: Optional[str] = None,
    n_cg: int = 60, n_fix: int = 1,
) -> Tuple[Sim3PoseGraph, jax.Array]:
    """Matrix-free Gauss-Newton: block-sparse H, PCG with 7x7 block-Jacobi.

    Same measurement model / chart as `optimize_pose_graph_sim3`; scales to
    thousands of nodes (the dense path is O(M^3) per iteration, this one is
    O(E * n_cg)).  With `psum_axis` set (edges sharded inside `shard_map`,
    poses replicated) every reduction is a psum of an O(M) vector — never a
    dense H (SURVEY §5.8; VERDICT r3 task 6)."""
    M = g.poses.shape[0]
    D = 7
    seg = partial(jax.ops.segment_sum, num_segments=M)

    def allred(x):
        return jax.lax.psum(x, psum_axis) if psum_axis else x

    if not fix_first:
        n_fix = 0
    # gauge + global scale anchor (n_fix=1) or the frozen established chain
    # of the online correction policy (n_fix > 1)
    gm = (jnp.arange(M)[:, None] >= n_fix).astype(jnp.float32)

    def step(carry, _):
        s_all, R_all, t_all = carry
        r, Ji, Jj = _sim3_linearize(g, s_all, R_all, t_all)

        b = allred(
            seg(-jnp.einsum("eab,ea->eb", Ji, r), g.edge_i)
            + seg(-jnp.einsum("eab,ea->eb", Jj, r), g.edge_j)
        ) * gm                                                   # [M, 7]
        # block-Jacobi preconditioner: damped 7x7 diagonal blocks
        Hd = allred(
            seg(jnp.einsum("eab,eac->ebc", Ji, Ji), g.edge_i)
            + seg(jnp.einsum("eab,eac->ebc", Jj, Jj), g.edge_j)
        ) + lam * jnp.eye(D)
        Minv = jnp.linalg.inv(Hd)

        def matvec(x):                                           # x: [M, 7]
            xg = x * gm
            z = (
                jnp.einsum("eab,eb->ea", Ji, xg[g.edge_i])
                + jnp.einsum("eab,eb->ea", Jj, xg[g.edge_j])
            )                                                    # [E, 7]
            out = allred(
                seg(jnp.einsum("eab,ea->eb", Ji, z), g.edge_i)
                + seg(jnp.einsum("eab,ea->eb", Jj, z), g.edge_j)
            )
            return (out + lam * xg) * gm

        def precond(v):
            return jnp.einsum("mij,mj->mi", Minv, v) * gm

        def cg_body(state, _):
            x, rr, p, rz = state
            Ap = matvec(p)
            denom = (p * Ap).sum()
            alpha = rz / jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
            x = x + alpha * p
            rr = rr - alpha * Ap
            z = precond(rr)
            rz_new = (rr * z).sum()
            beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
            p = z + beta * p
            return (x, rr, p, rz_new), None

        z0 = precond(b)
        (dx, _, _, _), _ = jax.lax.scan(
            cg_body, (jnp.zeros_like(b), b, z0, (b * z0).sum()), None,
            length=n_cg,
        )
        dx = dx * gm
        s_new, R_new, t_new = P.compose_sim3(
            *sim7_to_srt(dx), s_all, R_all, t_all
        )
        return (s_new, R_new, t_new), allred((r * r).sum())

    s0, R0, t0 = sim7_to_srt(g.poses)
    (sf, Rf, tf), costs = jax.lax.scan(step, (s0, R0, t0), None, length=iters)
    return g._replace(poses=srt_to_sim7(sf, Rf, tf)), costs
