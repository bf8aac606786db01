"""Bundle adjustment: Levenberg-Marquardt with matrix-free Schur complement.

The SfM back end's core solver (SURVEY.md §7.2 step 8, §7.4 item 4).  Design
is distribution-first: the reduced camera system S = H_cc - W H_pp^-1 W^T is
NEVER materialized; S @ x is evaluated per-observation with segment-sums, so
sharding observations+points across devices needs exactly one `psum` of the
camera-side partials per CG iteration (see parallel/dist_ba.py).

Structure-of-arrays problem layout, fixed shapes, fully in-graph LM loop with
accept/reject damping (no host syncs).  Gauge: camera 0 is frozen.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..geometry.pose import exp_so3

__all__ = [
    "BAProblem", "BAState", "project", "reprojection_residuals", "run_ba",
    "refine_points",
]


class BAProblem(NamedTuple):
    cams: jax.Array        # [M, 6] (so3 rotvec, translation), world->cam
    points: jax.Array      # [P, 3]
    intrinsics: jax.Array  # [4] fx, fy, cx, cy (shared)
    cam_idx: jax.Array     # [N] int32
    pt_idx: jax.Array      # [N] int32
    uv: jax.Array          # [N, 2] pixel observations
    w: jax.Array           # [N] observation weights (0 masks out)
    # optional [P] bool: FIXED landmarks — their observations still constrain
    # the cameras (full J_c^T J_c contribution; that is how a revisit anchors
    # the camera to established geometry) but the points themselves do not
    # move.  The windowed-BA policy marks landmarks whose anchor keyframe
    # retired: without this, a loop-fused old landmark entering the recent
    # window's observation set gets DRAGGED toward the window consensus,
    # corrupting the retired region's internal consistency (measured: later
    # revisit PnP inlier ratios halved).
    pt_fixed: Optional[jax.Array] = None


class BAState(NamedTuple):
    cams: jax.Array
    points: jax.Array
    lam: jax.Array         # LM damping
    cost: jax.Array


def project(cam: jax.Array, X: jax.Array, intr: jax.Array) -> jax.Array:
    """cam: [6], X: [3], intr: [4] -> pixel [2]."""
    R = exp_so3(cam[:3])
    xc = R @ X + cam[3:]
    z = jnp.where(jnp.abs(xc[2]) < 1e-9, 1e-9, xc[2])
    return intr[:2] * xc[:2] / z + intr[2:]


def reprojection_residuals(prob: BAProblem, cams, points) -> jax.Array:
    """[N, 2] weighted residuals."""

    def one(ci, pi, uv, w):
        return (project(cams[ci], points[pi], prob.intrinsics) - uv) * jnp.sqrt(w)

    return jax.vmap(one)(prob.cam_idx, prob.pt_idx, prob.uv, prob.w)


def _cost(prob, cams, points):
    r = reprojection_residuals(prob, cams, points)
    return (r * r).sum()


def _jacobians(prob: BAProblem, cams, points):
    """Per-observation closed-form (autodiff) Jacobians.
    Returns r [N,2], Jc [N,2,6], Jp [N,2,3] (weighted)."""

    def res_one(cam6, X3, uv, w):
        return (project(cam6, X3, prob.intrinsics) - uv) * jnp.sqrt(w)

    def with_grads(ci, pi, uv, w):
        cam6 = cams[ci]
        X3 = points[pi]
        r = res_one(cam6, X3, uv, w)
        Jc = jax.jacfwd(res_one, argnums=0)(cam6, X3, uv, w)
        Jp = jax.jacfwd(res_one, argnums=1)(cam6, X3, uv, w)
        return r, Jc, Jp

    return jax.vmap(with_grads)(prob.cam_idx, prob.pt_idx, prob.uv, prob.w)


def _inv3(A):
    """Batched closed-form 3x3 inverse (adjugate/det) for SPD blocks."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    adj = jnp.stack(
        [
            jnp.stack([A11, A12, A13], -1),
            jnp.stack([A21, A22, A23], -1),
            jnp.stack([A31, A32, A33], -1),
        ],
        -2,
    )
    return adj / det[..., None, None]


def schur_solve(
    r, Jc, Jp, cam_idx, pt_idx, M: int, P: int, lam,
    gauge_mask, n_cg: int = 30, psum_axis: Optional[str] = None,
    pt_fixed: Optional[jax.Array] = None,
):
    """Solve the damped normal equations via Schur complement + PCG.

    Returns (dcam [M,6], dpt [P,3]).  `gauge_mask` [M] zeroes frozen cameras.
    If `psum_axis` is set, camera-side segment-sums are `psum`ed over that
    mesh axis (observations/points sharded, cameras replicated) — the
    distributed-BA hook (SURVEY §5.8).
    """
    seg_c = partial(jax.ops.segment_sum, num_segments=M)
    seg_p = partial(jax.ops.segment_sum, num_segments=P)

    def allred(x):
        return jax.lax.psum(x, psum_axis) if psum_axis else x

    # gradient blocks
    bc = allred(seg_c(-jnp.einsum("nij,ni->nj", Jc, r), cam_idx))      # [M, 6]
    bp = seg_p(-jnp.einsum("nij,ni->nj", Jp, r), pt_idx)               # [P, 3]

    # block diagonals (damped)
    Hcc = allred(seg_c(jnp.einsum("nij,nik->njk", Jc, Jc), cam_idx))   # [M,6,6]
    Hpp = seg_p(jnp.einsum("nij,nik->njk", Jp, Jp), pt_idx)            # [P,3,3]
    Hcc = Hcc + lam * jnp.eye(6)
    Hpp = Hpp + lam * jnp.eye(3)
    Hpp_inv = _inv3(Hpp)
    if pt_fixed is not None:
        # fixed landmarks: zero their marginalization block — dpt comes out
        # 0 and their observations act as pure camera constraints (the full
        # Jc^T Jc term stays in S because the W Hpp^-1 W^T correction drops)
        Hpp_inv = jnp.where(pt_fixed[:, None, None], 0.0, Hpp_inv)

    gm = gauge_mask[:, None].astype(bc.dtype)

    def S_matvec(x):                                                   # x: [M,6]
        u = jnp.einsum("nij,nj->ni", Jc, x[cam_idx])                   # [N, 2]
        v = seg_p(jnp.einsum("nij,ni->nj", Jp, u), pt_idx)             # [P, 3]
        y = jnp.einsum("pij,pj->pi", Hpp_inv, v)                       # [P, 3]
        wv = jnp.einsum("nij,nj->ni", Jp, y[pt_idx])                   # [N, 2]
        out = allred(seg_c(jnp.einsum("nij,ni->nj", Jc, u - wv), cam_idx))
        return (out + lam * x) * gm

    # reduced RHS: bc - W Hpp^-1 bp
    yb = jnp.einsum("pij,pj->pi", Hpp_inv, bp)
    wb = jnp.einsum("nij,nj->ni", Jp, yb[pt_idx])
    rhs = (bc - allred(seg_c(jnp.einsum("nij,ni->nj", Jc, wb), cam_idx))) * gm

    # PCG with block-Jacobi (6x6 Hcc) preconditioner
    Minv = jnp.linalg.inv(Hcc)

    def precond(v):
        return jnp.einsum("mij,mj->mi", Minv, v) * gm

    def cg_body(state, _):
        x, rr, p, rz = state
        Ap = S_matvec(p)
        denom = (p * Ap).sum()
        alpha = rz / jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
        x = x + alpha * p
        rr = rr - alpha * Ap
        z = precond(rr)
        rz_new = (rr * z).sum()
        beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
        p = z + beta * p
        return (x, rr, p, rz_new), None

    x0 = jnp.zeros_like(rhs)
    z0 = precond(rhs)
    (dcam, _, _, _), _ = jax.lax.scan(
        cg_body, (x0, rhs, z0, (rhs * z0).sum()), None, length=n_cg
    )

    # back-substitute points: dp = Hpp^-1 (bp - W^T dcam)
    u = jnp.einsum("nij,nj->ni", Jc, dcam[cam_idx])
    wtd = seg_p(jnp.einsum("nij,ni->nj", Jp, u), pt_idx)
    dpt = jnp.einsum("pij,pj->pi", Hpp_inv, bp - wtd)
    return dcam, dpt


def run_ba_impl(
    prob: BAProblem, iters: int = 10, n_cg: int = 30,
    fix_first_cam: bool = True, lam0: float = 1e-3,
    psum_axis: Optional[str] = None,
) -> BAState:
    """Fully in-graph LM loop with multiplicative accept/reject damping.

    With `psum_axis` set (inside `shard_map`): observations + points are this
    shard's slice, cameras are replicated; every camera-side reduction and the
    cost are `psum`ed so all shards take identical accept/reject decisions —
    the distributed-BA core (SURVEY §2.3 multi-host row, §7.2 step 9).
    """
    M = prob.cams.shape[0]
    P = prob.points.shape[0]
    gauge = jnp.ones(M)
    if fix_first_cam:
        gauge = gauge.at[0].set(0.0)

    def allred(x):
        return jax.lax.psum(x, psum_axis) if psum_axis else x

    def cost_fn(cams, points):
        r = reprojection_residuals(prob, cams, points)
        return allred((r * r).sum())

    def lm_step(state: BAState, _):
        r, Jc, Jp = _jacobians(prob, state.cams, state.points)
        r = r.reshape(-1, 2)
        dcam, dpt = schur_solve(
            r, Jc, Jp, prob.cam_idx, prob.pt_idx, M, P, state.lam, gauge,
            n_cg, psum_axis=psum_axis, pt_fixed=prob.pt_fixed,
        )
        new_cams = state.cams + dcam
        new_pts = state.points + dpt
        new_cost = cost_fn(new_cams, new_pts)
        accept = new_cost < state.cost
        cams = jnp.where(accept, new_cams, state.cams)
        pts = jnp.where(accept, new_pts, state.points)
        lam = jnp.where(accept, state.lam * 0.3, state.lam * 4.0)
        lam = jnp.clip(lam, 1e-9, 1e6)
        cost = jnp.where(accept, new_cost, state.cost)
        return BAState(cams, pts, lam, cost), new_cost

    init = BAState(
        cams=prob.cams, points=prob.points,
        lam=jnp.asarray(lam0, jnp.float32),
        cost=cost_fn(prob.cams, prob.points),
    )
    final, _ = jax.lax.scan(lm_step, init, None, length=iters)
    return final


@partial(jax.jit, static_argnums=(1, 2, 3))
def run_ba(
    prob: BAProblem, iters: int = 10, n_cg: int = 30,
    fix_first_cam: bool = True, lam0: float = 1e-3,
) -> BAState:
    return run_ba_impl(prob, iters, n_cg, fix_first_cam, lam0)


@partial(jax.jit, static_argnums=(1,))
def refine_points(prob: BAProblem, iters: int = 3,
                  huber_px: float = 3.0) -> jax.Array:
    """Points-only GN refit with CAMERAS FIXED (Huber-IRLS).

    The map-consistency restorer after a pose-graph loop correction: the
    Sim(3) correction transports each landmark with its anchor keyframe,
    which is exact for the anchor's own observations but warps the map
    slightly non-rigidly for points observed across anchor boundaries —
    measured on the loop fixtures, that inconsistency halved later revisit
    PnP inlier ratios and starved loop detection.  Re-fitting ONLY the
    points against the (pinned) corrected poses restores consistency
    without letting full BA re-open the loop (full BA's optimum is the
    drifted odometry solution unless enough duplicated landmarks were
    fused to tie the loop: measured 0.049 -> 0.093 ATE regression).

    Per-point 3x3 damped normal equations — embarrassingly parallel over
    the map, one `segment_sum` per iteration.  Returns the refined [P, 3]
    points (unobserved points keep their coordinates)."""
    Pn = prob.points.shape[0]
    seg_p = partial(jax.ops.segment_sum, num_segments=Pn)

    def one_iter(points, _):
        def res_one(ci, pi, uv):
            return project(prob.cams[ci], points[pi], prob.intrinsics) - uv

        def jac_one(ci, pi, uv):
            return jax.jacfwd(
                lambda X: project(prob.cams[ci], X, prob.intrinsics) - uv
            )(points[pi])

        r = jax.vmap(res_one)(prob.cam_idx, prob.pt_idx, prob.uv)
        Jp = jax.vmap(jac_one)(prob.cam_idx, prob.pt_idx, prob.uv)
        rn = jnp.linalg.norm(r, axis=1)
        w = prob.w * jnp.minimum(1.0, huber_px / jnp.maximum(rn, 1e-9))
        bp = seg_p(-jnp.einsum("nij,ni->nj", Jp, r * w[:, None]),
                   prob.pt_idx)
        Hpp = seg_p(
            w[:, None, None] * jnp.einsum("nij,nik->njk", Jp, Jp),
            prob.pt_idx,
        ) + 1e-4 * jnp.eye(3)
        dpt = jnp.einsum("pij,pj->pi", _inv3(Hpp), bp)
        # guard: a point with degenerate observations must not fly away
        dpt = jnp.clip(dpt, -1e3, 1e3)
        return points + dpt, None

    out, _ = jax.lax.scan(one_iter, prob.points, None, length=iters)
    return out
