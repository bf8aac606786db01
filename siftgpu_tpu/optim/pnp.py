"""Absolute pose from 2D-3D correspondences (PnP) by robust manifold GN.

The SLAM tracker's per-frame pose solve: fixed-iteration Gauss-Newton on the
6-dof camera pose with Huber-weighted reprojection residuals (fixed shapes,
masked correspondences, no RANSAC loop — robustness comes from the loss and
from gating by the previous pose).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import pose as P

__all__ = ["PnPResult", "pnp_gn"]


class PnPResult(NamedTuple):
    pose: jax.Array      # [6] se3 twist (world->cam)
    inliers: jax.Array   # [N] bool (< inlier_px after optimization)
    num_inliers: jax.Array
    rms: jax.Array       # inlier reprojection rms (px)


def _project(R, t, X, intr):
    xc = X @ R.T + t
    z = jnp.where(jnp.abs(xc[:, 2:]) < 1e-9, 1e-9, xc[:, 2:])
    return intr[:2] * xc[:, :2] / z + intr[2:], xc[:, 2]


@partial(jax.jit, static_argnames=("iters",))
def pnp_gn(
    X: jax.Array, uv: jax.Array, w: jax.Array, intr: jax.Array,
    pose0: jax.Array, iters: int = 10, huber_px: float = 3.0,
    inlier_px: float = 3.0,
) -> PnPResult:
    """X: [N, 3] world points; uv: [N, 2] pixels; w: [N] weights (0 masks);
    pose0: [6] initial twist.  Returns the refined pose."""

    def residuals(dpose, R0, t0):
        dR, dt = P.exp_se3(dpose)
        R, t = P.compose(dR, dt, R0, t0)
        proj, z = _project(R, t, X, intr)
        r = proj - uv                                   # [N, 2]
        return r, z

    def step(carry, wv):
        # NOTE: weights ride in `xs`, not the closure — lax.scan caches traced
        # jaxprs by function identity, so a closed-over `w` would be baked in
        # as a constant and the refine pass would silently reuse stage-1
        # weights.
        R0, t0 = carry
        zero = jnp.zeros(6)
        r, z = residuals(zero, R0, t0)
        J = jax.jacfwd(lambda d: residuals(d, R0, t0)[0])(zero)   # [N, 2, 6]
        # Huber weights on the residual norm + cheirality + user mask
        rn = jnp.linalg.norm(r, axis=1)
        hw = jnp.where(rn <= huber_px, 1.0, huber_px / jnp.maximum(rn, 1e-9))
        ww = wv * hw * (z > 1e-6)
        H = jnp.einsum("nia,nib,n->ab", J, J, ww) + 1e-6 * jnp.eye(6)
        b = -jnp.einsum("nia,ni,n->a", J, r, ww)
        d = jnp.linalg.solve(H, b)
        dR, dt = P.exp_se3(d)
        return P.compose(dR, dt, R0, t0), None

    def tile(wv, n):
        return jnp.broadcast_to(wv, (n,) + wv.shape)

    R0, t0 = P.exp_se3(pose0)
    (Rf, tf), _ = jax.lax.scan(step, (R0, t0), tile(w, iters))

    # reject-then-refine: gross outliers survive Huber with small but nonzero
    # weight; a second pass on hard inliers removes the residual bias
    proj, z = _project(Rf, tf, X, intr)
    rn = jnp.linalg.norm(proj - uv, axis=1)
    w = w * ((rn < inlier_px) & (z > 1e-6))
    n2 = max(2, iters // 2)
    (Rf, tf), _ = jax.lax.scan(step, (Rf, tf), tile(w, n2))

    proj, z = _project(Rf, tf, X, intr)
    rn = jnp.linalg.norm(proj - uv, axis=1)
    inl = (rn < inlier_px) & (w > 0) & (z > 1e-6)
    n = jnp.maximum(inl.sum(), 1)
    rms = jnp.sqrt(((rn**2) * inl).sum() / n)
    return PnPResult(
        pose=P.log_se3(Rf, tf), inliers=inl,
        num_inliers=inl.sum().astype(jnp.int32), rms=rms,
    )
