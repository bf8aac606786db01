"""Golden CPU matcher oracle (SiftMatchGPU semantics, SURVEY.md §3.2 ⚠).

Distances are angular: d = arccos(<a, b>) on L2-normalized descriptors.
A pair (i, j) matches iff
  d_best(i) < dist_max  AND  d_best(i) < ratio_max * d_second(i)
  AND (if mutual_best) j's best row is i.
Guided variant gates candidate pairs by homography reprojection and/or
epipolar (symmetric-transfer) distance before the best-2 search.
"""

from __future__ import annotations

import numpy as np

from ..core.config import MatchConfig

__all__ = ["normalize_desc", "match", "guided_match"]


def normalize_desc(d: np.ndarray) -> np.ndarray:
    d = d.astype(np.float64)
    n = np.linalg.norm(d, axis=1, keepdims=True)
    return d / np.maximum(n, 1e-12)


def _angles(d0: np.ndarray, d1: np.ndarray) -> np.ndarray:
    sim = normalize_desc(d0) @ normalize_desc(d1).T
    return np.arccos(np.clip(sim, -1.0, 1.0))


def _select(ang: np.ndarray, cfg: MatchConfig) -> np.ndarray:
    """Best-2 + ratio + mutual selection on a full angle matrix. -> [M, 2] int."""
    n0, n1 = ang.shape
    if n0 == 0 or n1 == 0:
        return np.zeros((0, 2), np.int32)
    best_j = np.argmin(ang, axis=1)
    best = ang[np.arange(n0), best_j]
    tmp = ang.copy()
    tmp[np.arange(n0), best_j] = np.inf
    second = tmp.min(axis=1)
    ok = (best < cfg.dist_max) & (best < cfg.ratio_max * second)
    if cfg.mutual_best:
        col_best_i = np.argmin(ang, axis=0)
        ok &= col_best_i[best_j] == np.arange(n0)
    pairs = np.stack([np.nonzero(ok)[0], best_j[ok]], axis=1).astype(np.int32)
    return pairs[: cfg.max_match]


def match(d0: np.ndarray, d1: np.ndarray, cfg: MatchConfig | None = None) -> np.ndarray:
    cfg = cfg or MatchConfig()
    return _select(_angles(d0, d1), cfg)


def guided_match(
    d0, d1, loc0, loc1,
    H=None, F=None, hdist_max: float = 32.0, fdist_max: float = 16.0,
    cfg: MatchConfig | None = None,
) -> np.ndarray:
    """loc* are [N, 2] (x, y) pixel locations. H maps image0 -> image1."""
    cfg = cfg or MatchConfig()
    ang = _angles(d0, d1)
    gate = np.ones_like(ang, dtype=bool)
    x0 = np.concatenate([loc0, np.ones((len(loc0), 1))], axis=1)  # [N0,3]
    x1 = np.concatenate([loc1, np.ones((len(loc1), 1))], axis=1)
    if H is not None:
        p = x0 @ np.asarray(H).T                       # [N0,3]
        p = p[:, :2] / np.maximum(np.abs(p[:, 2:]), 1e-12) * np.sign(p[:, 2:])
        d2 = ((p[:, None, :] - loc1[None, :, :]) ** 2).sum(-1)
        gate &= d2 < hdist_max * hdist_max
    if F is not None:
        F = np.asarray(F)
        l1 = x0 @ F.T                                  # epiline in image1 per i
        num = np.abs(l1 @ x1.T)                        # [N0,N1]
        den = np.sqrt(l1[:, 0] ** 2 + l1[:, 1] ** 2)[:, None]
        d_a = num / np.maximum(den, 1e-12)
        l0 = x1 @ F                                    # epiline in image0 per j
        den2 = np.sqrt(l0[:, 0] ** 2 + l0[:, 1] ** 2)[None, :]
        d_b = num / np.maximum(den2.T, 1e-12).T
        gate &= np.maximum(d_a, d_b) < fdist_max
    ang = np.where(gate, ang, np.inf)
    return _select(ang, cfg)
