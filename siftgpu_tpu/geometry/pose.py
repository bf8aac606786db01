"""Pose recovery and triangulation (pure jax.numpy, vmapped small solves).

Rotations use the so(3) exponential map (Rodrigues); world-to-camera
convention x_cam = R x_world + t.  E decomposition follows Hartley &
Zisserman; cheirality (positive depth in both views) selects among the four
(R, t) candidates.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "exp_so3", "log_so3", "hat",
    "exp_se3", "log_se3", "compose", "inverse", "relative",
    "triangulate", "decompose_essential", "recover_pose", "TwoViewPose",
]


def hat(w: jax.Array) -> jax.Array:
    """[..., 3] -> [..., 3, 3] skew-symmetric."""
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -w[..., 2], w[..., 1]], -1),
            jnp.stack([w[..., 2], zeros, -w[..., 0]], -1),
            jnp.stack([-w[..., 1], w[..., 0], zeros], -1),
        ],
        -2,
    )


def exp_so3(w: jax.Array) -> jax.Array:
    """Rodrigues: [..., 3] axis-angle -> [..., 3, 3] rotation (safe at 0)."""
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)[..., None]
    K = hat(w / jnp.maximum(theta[..., 0], 1e-12))
    s = jnp.sin(theta)
    c = jnp.cos(theta)
    I = jnp.broadcast_to(jnp.eye(3), K.shape)
    R = I + s * K + (1.0 - c) * (K @ K)
    return jnp.where(theta < 1e-8, I + hat(w), R)


def log_so3(R: jax.Array) -> jax.Array:
    """[..., 3, 3] -> [..., 3] axis-angle (principal branch).

    Robust at the theta ~ pi singularity: there the skew part vanishes, so
    the axis is recovered from the symmetric part (outer product aa^T =
    (R_sym - cos I) / (1 - cos)), taking the column with the largest
    diagonal for numerically stable, sign-consistent components."""
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    cos = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos)
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        -1,
    )
    # generic branch (theta away from 0 and pi): w_skew = 2 sin(theta) * axis
    s = jnp.where(
        jnp.abs(theta) < 1e-8,
        0.5,
        theta / jnp.maximum(2.0 * jnp.sin(theta), 1e-12),
    )
    w_generic = w * s[..., None]

    # near-pi branch: axis from the symmetric part
    I = jnp.broadcast_to(jnp.eye(3), R.shape)
    sym = 0.5 * (R + jnp.swapaxes(R, -1, -2))
    denom = jnp.maximum(1.0 - cos, 1e-6)[..., None, None]
    aa = (sym - cos[..., None, None] * I) / denom         # ~ axis axis^T
    d = jnp.clip(
        jnp.stack([aa[..., 0, 0], aa[..., 1, 1], aa[..., 2, 2]], -1), 0.0, None
    )
    k = jnp.argmax(d, axis=-1)
    col = jnp.take_along_axis(aa, k[..., None, None].repeat(3, -2), axis=-1)[..., 0]
    ak = jnp.sqrt(jnp.maximum(jnp.take_along_axis(d, k[..., None], -1)[..., 0], 1e-12))
    axis = col / ak[..., None]
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-12)
    # fix overall sign from the (tiny but sign-carrying) skew part; at exactly
    # pi both signs are equivalent
    dot = jnp.sum(axis * w, axis=-1, keepdims=True)
    axis = jnp.where(dot < 0, -axis, axis)
    w_pi = axis * theta[..., None]

    return jnp.where((theta > 3.0)[..., None], w_pi, w_generic)


def _so3_left_jacobian(w: jax.Array) -> jax.Array:
    """V such that exp_se3([w, v]) has translation V @ v. [..., 3, 3]."""
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)[..., None]
    K = hat(w / jnp.maximum(theta[..., 0], 1e-12))
    I = jnp.broadcast_to(jnp.eye(3), K.shape)
    s = jnp.sin(theta)
    c = jnp.cos(theta)
    V = I + (1.0 - c) / jnp.maximum(theta, 1e-12) * K \
        + (theta - s) / jnp.maximum(theta, 1e-12) * (K @ K)
    return jnp.where(theta < 1e-6, I + 0.5 * hat(w), V)


def exp_se3(xi: jax.Array):
    """[..., 6] (rot, trans) twist -> (R [..., 3, 3], t [..., 3])."""
    w, v = xi[..., :3], xi[..., 3:]
    R = exp_so3(w)
    t = (_so3_left_jacobian(w) @ v[..., None])[..., 0]
    return R, t


def log_se3(R: jax.Array, t: jax.Array) -> jax.Array:
    """(R, t) -> [..., 6] twist (inverse of exp_se3)."""
    w = log_so3(R)
    Vinv = jnp.linalg.inv(_so3_left_jacobian(w))
    v = (Vinv @ t[..., None])[..., 0]
    return jnp.concatenate([w, v], axis=-1)


def compose(Ra, ta, Rb, tb):
    """(Ra, ta) o (Rb, tb): x -> Ra (Rb x + tb) + ta."""
    return Ra @ Rb, (Ra @ tb[..., None])[..., 0] + ta


# ---------------- Sim(3) (monocular loop closure / pose graph) ----------
# A Sim(3) element (s, R, t) acts as x -> s R x + t.  Monocular SLAM's
# scale is unobservable and DRIFTS along the trajectory; loop-closure
# correction must therefore optimize per-keyframe scale too (the classic
# monocular pose-graph formulation), or the graph cannot absorb the
# dominant error mode.  Elements are passed as (s [...], R [..., 3, 3],
# t [..., 3]); all ops batch.

def compose_sim3(sa, Ra, ta, sb, Rb, tb):
    """(sa, Ra, ta) o (sb, Rb, tb): x -> sa Ra (sb Rb x + tb) + ta."""
    return (
        sa * sb,
        Ra @ Rb,
        sa[..., None] * (Ra @ tb[..., None])[..., 0] + ta,
    )


def inverse_sim3(s, R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    si = 1.0 / s
    return si, Rt, -si[..., None] * (Rt @ t[..., None])[..., 0]


def relative_sim3(si, Ri, ti, sj, Rj, tj):
    """S_ij = S_j o S_i^-1 (maps cam_i coordinates to cam_j)."""
    return compose_sim3(sj, Rj, tj, *inverse_sim3(si, Ri, ti))


def inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -(Rt @ t[..., None])[..., 0]


def relative(Ri, ti, Rj, tj):
    """T_ij = T_j o T_i^-1 (maps cam_i coordinates to cam_j)."""
    Rinv, tinv = inverse(Ri, ti)
    return compose(Rj, tj, Rinv, tinv)


def triangulate(
    R0, t0, R1, t1, x0: jax.Array, x1: jax.Array
) -> jax.Array:
    """DLT triangulation.  (R*, t*): world->cam; x*: [N, 2] normalized coords.
    Returns X [N, 3] world points (smallest eigenvector of A^T A per point)."""
    P0 = jnp.concatenate([R0, t0[:, None]], axis=1)      # [3, 4]
    P1 = jnp.concatenate([R1, t1[:, None]], axis=1)

    def one(p0, p1):
        A = jnp.stack(
            [
                p0[0] * P0[2] - P0[0],
                p0[1] * P0[2] - P0[1],
                p1[0] * P1[2] - P1[0],
                p1[1] * P1[2] - P1[1],
            ]
        )                                                # [4, 4]
        _, vecs = jnp.linalg.eigh(A.T @ A)
        X = vecs[:, 0]
        return X[:3] / jnp.where(jnp.abs(X[3]) < 1e-12, 1e-12, X[3])

    return jax.vmap(one)(x0, x1)


def decompose_essential(E: jax.Array):
    """E -> 4 candidate (R, t) with |t| = 1.  Returns (Rs [4,3,3], ts [4,3])."""
    U, _, Vt = jnp.linalg.svd(E)
    # ensure proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    Ra = U @ W @ Vt
    Rb = U @ W.T @ Vt
    t = U[:, 2]
    Rs = jnp.stack([Ra, Ra, Rb, Rb])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


class TwoViewPose(NamedTuple):
    R: jax.Array          # [3, 3] world(cam0)->cam1
    t: jax.Array          # [3] unit-norm translation
    points: jax.Array     # [N, 3] triangulated points (cam0 frame)
    good: jax.Array       # [N] bool: positive depth in both views
    num_good: jax.Array


def recover_pose(E: jax.Array, x0: jax.Array, x1: jax.Array, w: jax.Array) -> TwoViewPose:
    """Cheirality check over the 4 (R, t) candidates (the cv2.recoverPose
    analog).  w: [N] inlier mask; returns pose of cam1 w.r.t. cam0."""
    Rs, ts = decompose_essential(E)
    I = jnp.eye(3)
    z = jnp.zeros(3)

    def evaluate(R, t):
        X = triangulate(I, z, R, t, x0, x1)
        z0 = X[:, 2]
        z1 = (X @ R.T + t)[:, 2]
        good = (z0 > 1e-6) & (z1 > 1e-6) & w
        return good.sum(), X, good

    counts, Xs, goods = jax.vmap(evaluate)(Rs, ts)
    best = jnp.argmax(counts)
    return TwoViewPose(
        R=Rs[best], t=ts[best], points=Xs[best], good=goods[best],
        num_good=counts[best].astype(jnp.int32),
    )
