"""Synthetic fixtures with analytically known keypoints (SURVEY.md §4 item 1).

Stronger than the reference's eyeball-an-image testing: Gaussian blobs at known
(x, y, sigma) must be detected at those coordinates; rotated/scaled
checkerboards and warped image pairs give ground-truth correspondences for
matcher and geometry tests.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "gaussian_blob_image", "checkerboard", "random_texture", "warp_affine",
    "warp_homography", "two_plane_stereo", "two_plane_sequence",
]


def gaussian_blob_image(h, w, blobs, background=0.0):
    """blobs: list of (y, x, sigma, amplitude). A blob of scale `sigma_b`
    produces a DoG extremum at sigma ~= sigma_b (detected scale).
    """
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.full((h, w), background, np.float64)
    for (y, x, s, a) in blobs:
        img += a * np.exp(-((yy - y) ** 2 + (xx - x) ** 2) / (2 * s * s))
    return img.astype(np.float32)


def checkerboard(h, w, cell=8, lo=0.2, hi=0.8):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.where(((yy // cell) + (xx // cell)) % 2 == 0, lo, hi).astype(np.float32)


def random_texture(h, w, seed=0, smooth=2):
    """Smoothed random texture: dense in features, deterministic."""
    rng = np.random.default_rng(seed)
    img = rng.random((h, w)).astype(np.float32)
    k = np.ones(2 * smooth + 1, np.float32)
    k /= k.sum()
    pad = np.pad(img, smooth, mode="edge")
    out = np.zeros_like(img)
    for i, t in enumerate(k):
        out += t * pad[smooth:-smooth or None, i : i + w]
    img2 = out
    out = np.zeros_like(img2)
    pad = np.pad(img2, smooth, mode="edge")
    for i, t in enumerate(k):
        out += t * pad[i : i + h, smooth:-smooth or None]
    return out


def warp_homography(img, H, out_shape=None):
    """Inverse-warp `img` by the 3x3 homography H (x' ~ H x), bilinear.
    Returns (warped, valid_mask)."""
    h, w = out_shape or img.shape
    Hh, Ww = img.shape
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    Hinv = np.linalg.inv(H)
    sx = Hinv[0, 0] * xx + Hinv[0, 1] * yy + Hinv[0, 2]
    sy = Hinv[1, 0] * xx + Hinv[1, 1] * yy + Hinv[1, 2]
    sz = Hinv[2, 0] * xx + Hinv[2, 1] * yy + Hinv[2, 2]
    sz = np.where(np.abs(sz) < 1e-12, 1e-12, sz)
    sx, sy = sx / sz, sy / sz
    x0 = np.floor(sx).astype(int)
    y0 = np.floor(sy).astype(int)
    fx, fy = sx - x0, sy - y0
    valid = (x0 >= 0) & (y0 >= 0) & (x0 < Ww - 1) & (y0 < Hh - 1)
    x0c = np.clip(x0, 0, Ww - 2)
    y0c = np.clip(y0, 0, Hh - 2)
    out = (
        img[y0c, x0c] * (1 - fy) * (1 - fx)
        + img[y0c, x0c + 1] * (1 - fy) * fx
        + img[y0c + 1, x0c] * fy * (1 - fx)
        + img[y0c + 1, x0c + 1] * fy * fx
    )
    return np.where(valid, out, 0.0).astype(np.float32), valid


def two_plane_stereo(h, w, intr, rvec, t, d_near=5.0, d_far=10.0, seed=0):
    """Synthetic calibrated stereo pair of two fronto-parallel textured planes
    (top half at depth d_far, bottom half at d_near) — non-degenerate for E.

    intr: (fx, fy, cx, cy); rvec/t: pose of cam1 (x_c1 = R x_c0 + t).
    Returns (img0, img1, meta) where meta holds K, R, t and plane depths.
    """
    fx, fy, cx, cy = intr
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    Kinv = np.linalg.inv(K)
    # local import avoids a jax dependency at fixture module import time
    from ..geometry.pose import exp_so3
    import jax.numpy as jnp

    R = np.asarray(exp_so3(jnp.asarray(np.asarray(rvec, np.float64))))
    n = np.array([0.0, 0.0, 1.0])

    def plane_H(d):
        return K @ (R + np.outer(t, n) / d) @ Kinv

    tex_far = random_texture(h, w, seed=seed, smooth=2)
    tex_near = random_texture(h, w, seed=seed + 1, smooth=2)
    yy = np.mgrid[0:h, 0:w][0]
    top = yy < h // 2
    img0 = np.where(top, tex_far, tex_near).astype(np.float32)

    w_far, v_far = warp_homography(np.where(top, tex_far, 0.0).astype(np.float32), plane_H(d_far))
    w_near, v_near = warp_homography(
        np.where(~top, tex_near, 0.0).astype(np.float32), plane_H(d_near)
    )
    # near plane occludes far where both project
    img1 = np.where(w_near > 0, w_near, w_far).astype(np.float32)
    meta = dict(K=K, R=R, t=np.asarray(t, np.float64), d_near=d_near, d_far=d_far)
    return img0, img1, meta


def two_plane_sequence(n_frames, h, w, intr, rvec_step, t_step,
                       d_near=5.0, d_far=10.0, seed=0):
    """Synthetic calibrated monocular sequence over the two-plane scene.

    Frame k is rendered from the canonical (frame-0) textures via per-plane
    homographies for the pose (k*rvec_step, k*t_step) — exact ground truth
    for the SLAM loop's ATE metric (SURVEY §4.4).
    Returns (frames [T, h, w], poses_gt [T, 6] world->cam twists).
    """
    rvs = np.outer(np.arange(n_frames), np.asarray(rvec_step, np.float64))
    tvs = np.outer(np.arange(n_frames), np.asarray(t_step, np.float64))
    return two_plane_sequence_poses(rvs, tvs, h, w, intr,
                                    d_near=d_near, d_far=d_far, seed=seed)


def two_plane_sequence_poses(rvecs, tvecs, h, w, intr,
                             d_near=5.0, d_far=10.0, seed=0):
    """`two_plane_sequence` with EXPLICIT per-frame poses (rvecs/tvecs
    [T, 3]) — e.g. a loop trajectory that returns to its start, the
    loop-closure test scene.  Returns (frames [T, h, w], poses_gt [T, 6])."""
    import jax.numpy as jnp

    from ..geometry.pose import exp_so3, log_se3

    fx, fy, cx, cy = intr
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    Kinv = np.linalg.inv(K)
    n = np.array([0.0, 0.0, 1.0])
    tex_far = random_texture(h, w, seed=seed, smooth=2)
    tex_near = random_texture(h, w, seed=seed + 1, smooth=2)
    yy = np.mgrid[0:h, 0:w][0]
    top = yy < h // 2
    far0 = np.where(top, tex_far, 0.0).astype(np.float32)
    near0 = np.where(~top, tex_near, 0.0).astype(np.float32)

    frames, poses = [], []
    for rv, tv in zip(np.asarray(rvecs, np.float64), np.asarray(tvecs, np.float64)):
        R = np.asarray(exp_so3(jnp.asarray(rv)))
        w_far, _ = warp_homography(far0, K @ (R + np.outer(tv, n) / d_far) @ Kinv)
        w_near, _ = warp_homography(near0, K @ (R + np.outer(tv, n) / d_near) @ Kinv)
        frames.append(np.where(w_near > 0, w_near, w_far).astype(np.float32))
        # world->cam twist for (R, tv): translation needs V^-1, hence log_se3
        poses.append(np.asarray(log_se3(jnp.asarray(R), jnp.asarray(tv))))
    return np.stack(frames), np.stack(poses).astype(np.float32)


def warp_affine(img, A, t, out_shape=None):
    """Inverse-warp `img` by x' = A x + t (bilinear). Returns warped image and
    the forward map for ground-truth correspondences."""
    h, w = out_shape or img.shape
    H, W = img.shape
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    Ainv = np.linalg.inv(A)
    sx = Ainv[0, 0] * (xx - t[0]) + Ainv[0, 1] * (yy - t[1])
    sy = Ainv[1, 0] * (xx - t[0]) + Ainv[1, 1] * (yy - t[1])
    x0 = np.floor(sx).astype(int)
    y0 = np.floor(sy).astype(int)
    fx = sx - x0
    fy = sy - y0
    valid = (x0 >= 0) & (y0 >= 0) & (x0 < W - 1) & (y0 < H - 1)
    x0c = np.clip(x0, 0, W - 2)
    y0c = np.clip(y0, 0, H - 2)
    out = (
        img[y0c, x0c] * (1 - fy) * (1 - fx)
        + img[y0c, x0c + 1] * (1 - fy) * fx
        + img[y0c + 1, x0c] * fy * (1 - fx)
        + img[y0c + 1, x0c + 1] * fy * fx
    )
    return np.where(valid, out, 0.0).astype(np.float32)
