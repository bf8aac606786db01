"""Feature-file IO: Lowe ASCII `.sift` and VisualSFM-style binary `.sift`
(`SiftPyramid::SaveSIFT` analog, SURVEY.md §5.4 ⚠), plus NPZ feature stores.

Lowe ASCII layout (⚠ canonical, loadable by Lowe's match.c / VLFeat tooling):
  line 1: "<N> 128"
  per keypoint: "y x sigma theta" then 128 uint8s wrapped at 20 per line.

Binary layout (VisualSFM SIFT v4 convention ⚠ — unverified against the fork):
  5 x int32 header: [magic 'SIFT', version 'V4.0', npoint, 5, 128]
  npoint x 5 float32 location records: (x, y, color, scale, orientation)
  npoint x 128 uint8 descriptors
  int32 EOF marker 0x00454F46.

NPZ stores are the modern checkpoint path (SURVEY §5.4 build note).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "save_trajectory_tum",
    "write_lowe_ascii", "read_lowe_ascii",
    "write_binary_sift", "read_binary_sift",
    "save_feature_store", "load_feature_store",
]

_MAGIC = struct.unpack("<i", b"SIFT")[0]
_V4 = struct.unpack("<i", b"V4.0")[0]
_EOF = struct.unpack("<i", b"\x46\x4f\x45\x00")[0]  # 'EOF\0' little-endian


def write_lowe_ascii(path: str, keys: np.ndarray, desc: np.ndarray) -> None:
    """keys: [N, 4] (x, y, sigma, theta); desc: [N, 128] uint8."""
    n = len(keys)
    with open(path, "w") as f:
        f.write(f"{n} {desc.shape[1] if n else 128}\n")
        for i in range(n):
            x, y, s, o = keys[i]
            f.write(f"{y:.6f} {x:.6f} {s:.6f} {o:.6f}\n")
            d = desc[i]
            for j in range(0, len(d), 20):
                f.write(" ".join(str(int(v)) for v in d[j : j + 20]) + "\n")


def read_lowe_ascii(path: str):
    with open(path) as f:
        toks = f.read().split()
    n, dim = int(toks[0]), int(toks[1])
    keys = np.zeros((n, 4), np.float32)
    desc = np.zeros((n, dim), np.uint8)
    p = 2
    for i in range(n):
        y, x, s, o = (float(t) for t in toks[p : p + 4])
        keys[i] = (x, y, s, o)
        p += 4
        desc[i] = [int(t) for t in toks[p : p + dim]]
        p += dim
    return keys, desc


def write_binary_sift(path: str, keys: np.ndarray, desc: np.ndarray) -> None:
    n = len(keys)
    with open(path, "wb") as f:
        f.write(struct.pack("<5i", _MAGIC, _V4, n, 5, 128))
        loc = np.zeros((n, 5), np.float32)
        if n:
            loc[:, 0] = keys[:, 0]          # x
            loc[:, 1] = keys[:, 1]          # y
            loc[:, 2] = 0.0                 # packed color (unused)
            loc[:, 3] = keys[:, 2]          # scale
            loc[:, 4] = keys[:, 3]          # orientation
        f.write(loc.astype("<f4").tobytes())
        f.write(np.asarray(desc, np.uint8).tobytes())
        f.write(struct.pack("<i", _EOF))


def read_binary_sift(path: str):
    with open(path, "rb") as f:
        magic, ver, n, ldim, ddim = struct.unpack("<5i", f.read(20))
        assert magic == _MAGIC and ldim == 5, "not a binary sift file"
        loc = np.frombuffer(f.read(n * 5 * 4), "<f4").reshape(n, 5)
        desc = np.frombuffer(f.read(n * ddim), np.uint8).reshape(n, ddim)
    keys = np.stack([loc[:, 0], loc[:, 1], loc[:, 3], loc[:, 4]], axis=1)
    return keys.astype(np.float32), desc.copy()


def save_feature_store(path: str, feats, frame_ids=None) -> None:
    """Batched Features pytree -> NPZ (per-frame keys/desc/mask)."""
    np.savez_compressed(
        path,
        x=np.asarray(feats.x), y=np.asarray(feats.y),
        sigma=np.asarray(feats.sigma), theta=np.asarray(feats.theta),
        response=np.asarray(feats.response), octave=np.asarray(feats.octave),
        desc=np.asarray(feats.desc), mask=np.asarray(feats.mask),
        frame_ids=np.asarray(frame_ids if frame_ids is not None else []),
    )


def load_feature_store(path: str) -> dict:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


# ---------------- trajectory export (SLAM back end) ----------------

def _quat_from_rotation(R: np.ndarray) -> np.ndarray:
    """[4] (qx, qy, qz, qw) from a 3x3 rotation matrix (Shepperd's method)."""
    m00, m11, m22 = R[0, 0], R[1, 1], R[2, 2]
    tr = m00 + m11 + m22
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2.0
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    elif m00 >= m11 and m00 >= m22:
        s = np.sqrt(1.0 + m00 - m11 - m22) * 2.0
        w = (R[2, 1] - R[1, 2]) / s
        x = 0.25 * s
        y = (R[0, 1] + R[1, 0]) / s
        z = (R[0, 2] + R[2, 0]) / s
    elif m11 >= m22:
        s = np.sqrt(1.0 + m11 - m00 - m22) * 2.0
        w = (R[0, 2] - R[2, 0]) / s
        x = (R[0, 1] + R[1, 0]) / s
        y = 0.25 * s
        z = (R[1, 2] + R[2, 1]) / s
    else:
        s = np.sqrt(1.0 + m22 - m00 - m11) * 2.0
        w = (R[1, 0] - R[0, 1]) / s
        x = (R[0, 2] + R[2, 0]) / s
        y = (R[1, 2] + R[2, 1]) / s
        z = 0.25 * s
    q = np.array([x, y, z, w], np.float64)
    return q / np.linalg.norm(q)


def save_trajectory_tum(path: str, trajectory: np.ndarray,
                        timestamps=None) -> None:
    """Write a [T, 6] world->cam twist trajectory in TUM RGB-D format:
    `timestamp tx ty tz qx qy qz qw` per line, pose of the CAMERA IN THE
    WORLD frame (center -R^T t, orientation R^T) — the format the standard
    ATE/RPE evaluation tooling consumes."""
    import jax.numpy as jnp

    from ..geometry import pose as P

    R, t = P.exp_se3(jnp.asarray(np.asarray(trajectory, np.float32)))
    R = np.asarray(R)
    t = np.asarray(t)
    T = len(trajectory)
    ts = np.arange(T, dtype=np.float64) if timestamps is None else timestamps
    with open(path, "w") as f:
        for k in range(T):
            Rwc = R[k].T
            C = -Rwc @ t[k]
            q = _quat_from_rotation(Rwc)
            f.write(
                f"{ts[k]:.6f} {C[0]:.6f} {C[1]:.6f} {C[2]:.6f} "
                f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}\n"
            )
