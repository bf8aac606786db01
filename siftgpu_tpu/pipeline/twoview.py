"""Two-view SfM: match -> RANSAC essential -> pose -> triangulate -> BA.

BASELINE config 4: the minimum incremental-SfM slice on one chip.  Everything
downstream of extraction is fixed-shape: the match buffer defines the (padded)
point set; validity flows through weights.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.config import MatchConfig, SiftConfig
from ..frontend.extract import Features, extract_features
from ..frontend.match import MatchResult, match_descriptors_impl
from ..geometry import epipolar, pose
from ..optim import ba

__all__ = ["TwoViewResult", "two_view_from_features", "two_view_reconstruct"]


class TwoViewResult(NamedTuple):
    R: jax.Array           # [3, 3] cam0 -> cam1
    t: jax.Array           # [3] unit baseline
    points: jax.Array      # [max_match, 3] triangulated (cam0 frame), padded
    point_mask: jax.Array  # [max_match] bool
    pairs: jax.Array       # [max_match, 2] matched keypoint indices
    num_matches: jax.Array
    num_inliers: jax.Array
    ba_state: ba.BAState
    rms: jax.Array         # post-BA RMS reprojection error (pixels, valid obs)


def _normalized(xy: jax.Array, intr: jax.Array) -> jax.Array:
    return (xy - intr[2:]) / intr[:2]


def two_view_from_features(
    feats: Features, match_res: MatchResult, intr: jax.Array, key: jax.Array,
    num_hypotheses: int = 512, sampson_px: float = 2.0,
    ba_iters: int = 10, n_cg: int = 30,
) -> TwoViewResult:
    """feats: Features with batch 2 (image 0 and 1). intr: [4] fx fy cx cy."""
    pairs = match_res.pairs                       # [Q, 2], -1 padded
    Q = pairs.shape[0]
    valid = pairs[:, 0] >= 0
    i0 = jnp.clip(pairs[:, 0], 0)
    i1 = jnp.clip(pairs[:, 1], 0)
    uv0 = jnp.stack([feats.x[0][i0], feats.y[0][i0]], axis=1)
    uv1 = jnp.stack([feats.x[1][i1], feats.y[1][i1]], axis=1)
    x0 = _normalized(uv0, intr)
    x1 = _normalized(uv1, intr)

    # threshold in normalized coords: (px / f)^2 on squared Sampson distance
    f_mean = (intr[0] + intr[1]) / 2.0
    thr = (sampson_px / f_mean) ** 2

    rr = epipolar.ransac_essential(
        x0, x1, valid, key, num_hypotheses=num_hypotheses, threshold=thr
    )
    tv = pose.recover_pose(rr.E, x0, x1, rr.inliers)

    w = tv.good.astype(jnp.float32)
    cams = jnp.zeros((2, 6), jnp.float32)
    cams = cams.at[1, :3].set(pose.log_so3(tv.R))
    cams = cams.at[1, 3:].set(tv.t)

    cam_idx = jnp.concatenate([jnp.zeros(Q, jnp.int32), jnp.ones(Q, jnp.int32)])
    pt_idx = jnp.concatenate([jnp.arange(Q, dtype=jnp.int32)] * 2)
    uv = jnp.concatenate([uv0, uv1], axis=0)
    ww = jnp.concatenate([w, w])

    prob = ba.BAProblem(
        cams=cams, points=tv.points.astype(jnp.float32), intrinsics=intr,
        cam_idx=cam_idx, pt_idx=pt_idx, uv=uv, w=ww,
    )
    state = ba.run_ba(prob, iters=ba_iters, n_cg=n_cg)

    r = ba.reprojection_residuals(prob, state.cams, state.points)
    nobs = jnp.maximum(ww.sum(), 1.0)
    rms = jnp.sqrt((r * r).sum() / nobs)

    R1 = pose.exp_so3(state.cams[1, :3])
    return TwoViewResult(
        R=R1, t=state.cams[1, 3:], points=state.points, point_mask=tv.good,
        pairs=pairs, num_matches=match_res.count,
        num_inliers=rr.num_inliers, ba_state=state, rms=rms,
    )


@partial(jax.jit, static_argnums=(2, 3))
def two_view_reconstruct(
    images: jax.Array, intr: jax.Array,
    cfg: SiftConfig, mcfg: MatchConfig, key: jax.Array,
) -> TwoViewResult:
    """images: [2, H, W] grayscale in [0,1]. Full config-4 pipeline, one jit."""
    feats = extract_features(images, cfg)
    res = match_descriptors_impl(
        feats.desc[0], feats.desc[1], feats.mask[0], feats.mask[1], mcfg
    )
    return two_view_from_features(feats, res, intr, key)
