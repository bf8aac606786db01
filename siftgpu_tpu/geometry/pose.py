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
    """[..., 3, 3] -> [..., 3] axis-angle (principal branch)."""
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
    s = jnp.where(jnp.abs(theta) < 1e-8, 1.0, theta / jnp.maximum(2 * jnp.sin(theta), 1e-12))
    return w * s[..., None]


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
