"""Keypoint detection: DoG extrema -> contrast/edge tests -> subpixel refine.

TPU-native replacement for `ProgramCU::ComputeKEY` + the histogram-pyramid
list generation (`InitHist/ReduceHist/ListGen`, SURVEY.md §2.4 items 3-4 ⚠).
The reference compacts variable-length keypoint lists on the GPU and reads the
count back to the host; here there are NO host syncs and NO dynamic shapes:

  1. dense extrema / contrast / edge masks over the DoG volume in one fused
     Pallas stencil pass on accelerators (ops/detect_scores.py);
  2. per-octave `top_k` of |DoG| over 2x2-pooled candidate scores into a
     fixed-capacity buffer (deterministic: score desc, flat index asc —
     SURVEY §7.4 item 1), winner pixel recovered from the block corner index
     packed in the score's low mantissa bits;
  3. ONE packed `take_along_axis` pulls the 19 DoG patch cells the solve
     reads (cube corners unused) for every survivor — merged across ALL
     octaves by `detect_pyramid`;
  4. vectorized closed-form (Cramer) 3x3 solve for subpixel offsets, final
     contrast + border tests folded into the validity mask.

The candidate ordering uses the *unrefined* |DoG| response; the oracle orders
by refined response.  Identical sets whenever the cap is not binding.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.config import SiftConfig
from .pyramid import Octave

__all__ = [
    "OctaveKeypoints", "OctaveWinners",
    "detect_octave", "detect_pyramid", "detect_winners",
    "patch_indices", "refine_patches",
]


class OctaveKeypoints(NamedTuple):
    y: jax.Array          # [B, K] refined row, octave-local float
    x: jax.Array          # [B, K] refined col
    level: jax.Array      # [B, K] refined DoG level (float)
    grad_level: jax.Array # [B, K] int32 in [1, S]: Gaussian level for gradients
    sigma: jax.Array      # [B, K] octave-local scale
    response: jax.Array   # [B, K] |DoG| at the candidate pixel
    mask: jax.Array       # [B, K] bool validity


def _pool3x3(x: jax.Array, op) -> jax.Array:
    """3x3 spatial max/min pool of [B, L, H, W] (edges padded with identity)."""
    init = -jnp.inf if op is jax.lax.max else jnp.inf
    return jax.lax.reduce_window(
        x, init, op, window_dimensions=(1, 1, 3, 3), window_strides=(1, 1, 1, 1),
        padding=((0, 0), (0, 0), (1, 1), (1, 1)),
    )


def _pool8(x: jax.Array, op) -> jax.Array:
    """Max/min over the 8 spatial neighbors, center EXCLUDED."""
    init = -jnp.inf if op is jax.lax.max else jnp.inf
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)), constant_values=init)
    H, W = x.shape[-2:]
    shifts = []
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            if dy == 1 and dx == 1:
                continue
            shifts.append(xp[:, :, dy : dy + H, dx : dx + W])
    out = shifts[0]
    for s in shifts[1:]:
        out = op(out, s)
    return out


def _pick_scores_impl(cfg: SiftConfig) -> str:
    """Fused Pallas stencil on accelerators, XLA on CPU.  Queue-amortized
    TPU timings (v5e): detect over all octaves 1080p 8.4 ms Pallas vs 20.9 ms
    XLA; 4K 22.7 vs 36.1; 640x480 b4 10.8 vs 11.6 — Pallas wins at every
    octave size."""
    if not cfg.use_pallas:
        return "xla"
    try:
        return "xla" if jax.default_backend() == "cpu" else "pallas"
    except Exception:
        return "xla"


def _dense_scores_xla(dog: jax.Array, cfg: SiftConfig, owned_rows):
    """Masked per-type candidate score planes, pure-XLA formulation.

    Returns (s_max, s_min) [B, S, He, We] (He/We = H/W rounded up to even)
    where nonzero entries are |DoG| at strict 26-neighbor extrema passing the
    pre-threshold + Hessian edge + interior tests.  The Pallas kernel
    (ops/detect_scores.py) computes the identical planes in one fused pass on
    accelerators; this is the CPU / golden route."""
    B, L, H, W = dog.shape
    S = L - 2
    v = dog[:, 1 : S + 1]              # [B, S, H, W] candidate slices

    # --- dense extremum test over 26 neighbors (strict; ties rejected) ---
    m2x = _pool3x3(dog, jax.lax.max)
    m2n = _pool3x3(dog, jax.lax.min)
    m8x = _pool8(v, jax.lax.max)
    m8n = _pool8(v, jax.lax.min)
    nmax = jnp.maximum(jnp.maximum(m2x[:, 0:S], m2x[:, 2 : S + 2]), m8x)
    nmin = jnp.minimum(jnp.minimum(m2n[:, 0:S], m2n[:, 2 : S + 2]), m8n)
    pre = jnp.abs(v) > 0.8 * cfg.dog_threshold
    is_max = (v > 0) & (v > nmax) & pre
    is_min = (v < 0) & (v < nmin) & pre

    # --- dense Hessian edge test on the DoG slice ---
    xp = jnp.pad(v, ((0, 0), (0, 0), (1, 1), (1, 1)))
    c = xp[:, :, 1 : H + 1, 1 : W + 1]
    dxx = xp[:, :, 1 : H + 1, 2:] + xp[:, :, 1 : H + 1, :W] - 2 * c
    dyy = xp[:, :, 2:, 1 : W + 1] + xp[:, :, :H, 1 : W + 1] - 2 * c
    dxy = 0.25 * (xp[:, :, 2:, 2:] - xp[:, :, 2:, :W] - xp[:, :, :H, 2:] + xp[:, :, :H, :W])
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    r = cfg.edge_threshold
    edge_ok = (det > 0) & (tr * tr / jnp.where(det > 0, det, 1.0) < (r + 1.0) ** 2 / r)

    # --- interior-only (3x3x3 patch must exist) ---
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    interior = (yy >= 1) & (yy <= H - 2) & (xx >= 1) & (xx <= W - 2)

    base_keep = edge_ok & interior[None, None]
    if owned_rows is not None:
        lo, hi = owned_rows
        base_keep &= (yy[None, None] >= lo) & (yy[None, None] < hi)

    He, We = H + (H % 2), W + (W % 2)
    # pack the pixel's 2x2-block corner index (y&1)*2 + (x&1) into the two
    # low mantissa bits (<= 2^-22 relative perturbation): after the 2x2 max
    # pool the winner's within-block position rides along in the top-k value,
    # so no post-top-k corner gather is needed.  Zeros stay exactly zero.
    par = (yy & 1) * 2 + (xx & 1)
    s_max = _pack_corner(jnp.abs(v) * (is_max & base_keep), par[None, None])
    s_min = _pack_corner(jnp.abs(v) * (is_min & base_keep), par[None, None])
    if (He, We) != (H, W):
        pad2 = ((0, 0), (0, 0), (0, He - H), (0, We - W))
        s_max = jnp.pad(s_max, pad2)
        s_min = jnp.pad(s_min, pad2)
    return s_max, s_min


def _pack_corner(s: jax.Array, par: jax.Array) -> jax.Array:
    """Overwrite the two low mantissa bits of positive scores with `par`."""
    u = jax.lax.bitcast_convert_type(s.astype(jnp.float32), jnp.int32)
    u = jnp.where(s > 0, (u & ~3) | par, 0)
    return jax.lax.bitcast_convert_type(u, jnp.float32)


class OctaveWinners(NamedTuple):
    """Integer winner pixels of the pooled top-k, pre-refinement."""
    py: jax.Array      # [B, cap] int32 winner row
    px: jax.Array      # [B, cap] int32 winner col
    l: jax.Array       # [B, cap] int32 DoG slice in [1, S]
    cand: jax.Array    # [B, cap] bool (top-k slot holds a real candidate)


def detect_winners(
    dog: jax.Array, cfg: SiftConfig, cap: int, owned_rows=None,
    scores_impl: str | None = None,
) -> OctaveWinners:
    """Dense scores -> 2x2-pooled top-k -> integer winner pixels.

    `owned_rows=(lo, hi)` restricts candidates to slab rows [lo, hi) — used
    by the spatially-sharded path so halo-region extrema neither consume
    top-k capacity nor get double-counted across shards.  `scores_impl`:
    "xla" | "pallas" | "pallas_interpret" (default: auto — the fused Pallas
    stencil on accelerators, XLA on CPU; both produce identical planes).

    --- fixed-capacity compaction via EXACT 2x2-pooled top-k ---
    Within one extremum TYPE, strict 26-neighbor extrema are never 8-adjacent
    in a slice (a > all neighbors forbids an adjacent b > its neighbors), so
    each 2x2 block holds at most one MAXIMUM and one MINIMUM candidate.
    Pooling the two types separately and concatenating keeps top-k exact at
    half the sort size.  (A max and a min CAN be adjacent — pooling |DoG|
    jointly would drop one.)  Pooling uses a native strided reduce_window
    (2.6 ms at 4K vs 40 ms for the reshape/moveaxis formulation it replaced);
    the winner's within-block corner rides in the two low mantissa bits of
    the score (`_pack_corner`), so no post-top-k corner gather is needed.
    """
    B, L, H, W = dog.shape
    S = L - 2

    impl = scores_impl or _pick_scores_impl(cfg)
    if impl.startswith("pallas"):
        from ..ops.detect_scores import detect_scores

        s_max, s_min = detect_scores(
            dog, cfg, owned_rows, interpret=(impl == "pallas_interpret")
        )
    else:
        s_max, s_min = _dense_scores_xla(dog, cfg, owned_rows)
    Hs, Ws = s_max.shape[-2:]          # even tile-padded plane dims

    def pooled(score):
        return jax.lax.reduce_window(
            score, 0.0, jax.lax.max,
            window_dimensions=(1, 1, 2, 2), window_strides=(1, 1, 2, 2),
            padding="VALID",
        )

    nb1 = S * (Hs // 2) * (Ws // 2)
    bscore = jnp.concatenate(
        [pooled(s_max).reshape(B, nb1), pooled(s_min).reshape(B, nb1)], axis=1
    )
    use_approx = cfg.detect_topk == "approx" or (
        cfg.detect_topk == "auto"
        and bscore.shape[1] >= cfg.topk_approx_min
        and jax.default_backend() != "cpu"
    )
    k = min(cap, bscore.shape[1])  # tiny octaves: fewer pooled entries than cap
    if use_approx:
        # TPU PartialReduce-based top-k: ~2 ms vs ~27 ms exact on 12M-entry
        # 4K candidate arrays; may miss ~(1-recall) of borderline candidates
        # when the cap binds (see SiftConfig.detect_topk)
        top, bidx = jax.lax.approx_max_k(
            bscore, k, recall_target=cfg.topk_recall
        )
        bidx = bidx.astype(jnp.int32)
    else:
        top, bidx = jax.lax.top_k(bscore, k)         # [B, k]
    if k < cap:  # pad to the fixed capacity; zero scores are masked by `cand`
        top = jnp.pad(top, ((0, 0), (0, cap - k)))
        bidx = jnp.pad(bidx, ((0, 0), (0, cap - k)))
    cand = top > 0.0
    bidx1 = bidx % nb1                               # drop the type axis
    l = bidx1 // ((Hs // 2) * (Ws // 2)) + 1         # DoG slice index in [1, S]
    rem = bidx1 % ((Hs // 2) * (Ws // 2))
    # winner pixel = block origin + the corner packed in the score mantissa
    corner = jax.lax.bitcast_convert_type(top, jnp.int32) & 3
    py = (rem // (Ws // 2)) * 2 + (corner >> 1)
    px = (rem % (Ws // 2)) * 2 + (corner & 1)
    # padded rows/cols can never win: their scores are 0 and cand masks them
    return OctaveWinners(py=py, px=px, l=l, cand=cand)


# 3x3x3 patch cells the Cramer solve actually reads: the gradient and the
# symmetric Hessian only touch the center, the 6 faces, and the 12 edges —
# the 8 cube corners (dl, dy, dx all nonzero) never appear, so gathering
# them would waste ~30% of the dominant per-element gather cost (measured
# ~15 ns/elem on v5e regardless of locality).
_PATCH_OFFSETS = [
    (dl, dy, dx)
    for dl in (-1, 0, 1) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
    if not (dl and dy and dx)
]
N_PATCH = len(_PATCH_OFFSETS)  # 19


def patch_indices(win: OctaveWinners, H: int, W: int) -> jax.Array:
    """[B, 19*cap] flat DoG-volume indices of the used 3x3x3 patch cells per
    winner (layout [_PATCH_OFFSETS, cap]; l is 1-based so l-1+dl stays in
    [0, S+1]).  Clamps keep padded-plane winners (masked by `cand`) in
    range."""
    yc = jnp.clip(win.py, 1, H - 2)
    xc = jnp.clip(win.px, 1, W - 2)
    base = win.l * (H * W) + yc * W + xc             # [B, cap] center
    offs = [(dl * H + dy) * W + dx for dl, dy, dx in _PATCH_OFFSETS]
    return jnp.concatenate([base + o for o in offs], axis=1)


def refine_patches(
    p: jax.Array, win: OctaveWinners, cfg: SiftConfig, H: int, W: int
) -> OctaveKeypoints:
    """p: [B, N_PATCH, cap] gathered DoG patch cells (`_PATCH_OFFSETS`
    order) -> Cramer 3x3 subpixel solve + final contrast/border tests."""
    S = cfg.dog_levels
    py, px, l, cand = win.py, win.px, win.l, win.cand

    def q(dl, dy, dx):
        return p[:, _PATCH_OFFSETS.index((dl, dy, dx))]

    vc = q(0, 0, 0)
    # gradient
    gl = 0.5 * (q(1, 0, 0) - q(-1, 0, 0))
    gy = 0.5 * (q(0, 1, 0) - q(0, -1, 0))
    gx = 0.5 * (q(0, 0, 1) - q(0, 0, -1))
    # symmetric Hessian [[a,b,c],[b,d,e],[c,e,f]] in (l, y, x) order
    a = q(1, 0, 0) + q(-1, 0, 0) - 2 * vc
    d = q(0, 1, 0) + q(0, -1, 0) - 2 * vc
    f = q(0, 0, 1) + q(0, 0, -1) - 2 * vc
    b_ = 0.25 * (q(1, 1, 0) - q(1, -1, 0) - q(-1, 1, 0) + q(-1, -1, 0))
    c_ = 0.25 * (q(1, 0, 1) - q(1, 0, -1) - q(-1, 0, 1) + q(-1, 0, -1))
    e_ = 0.25 * (q(0, 1, 1) - q(0, 1, -1) - q(0, -1, 1) + q(0, -1, -1))

    if cfg.subpixel:
        detH = a * (d * f - e_ * e_) - b_ * (b_ * f - c_ * e_) + c_ * (b_ * e_ - c_ * d)
        ok_det = jnp.abs(detH) > 1e-12
        inv_det = jnp.where(ok_det, 1.0 / jnp.where(ok_det, detH, 1.0), 0.0)
        # adjugate rows (symmetric inverse)
        i00 = d * f - e_ * e_
        i01 = c_ * e_ - b_ * f
        i02 = b_ * e_ - c_ * d
        i11 = a * f - c_ * c_
        i12 = b_ * c_ - a * e_
        i22 = a * d - b_ * b_
        off_l = -(i00 * gl + i01 * gy + i02 * gx) * inv_det
        off_y = -(i01 * gl + i11 * gy + i12 * gx) * inv_det
        off_x = -(i02 * gl + i12 * gy + i22 * gx) * inv_det
        val = vc + 0.5 * (gl * off_l + gy * off_y + gx * off_x)
        off_ok = (
            (jnp.abs(off_l) <= 1.5) & (jnp.abs(off_y) <= 1.5) & (jnp.abs(off_x) <= 1.5)
        )
        # a level offset beyond +-0.5 means the extremum belongs to the
        # neighboring DoG slice; clamp so refined sigma stays within the
        # bound the static orientation/descriptor windows are sized for
        # (core/scalespace.py::max_detect_sigma) — oracle does the same
        off_l = jnp.clip(off_l, -0.5, 0.5)
    else:
        off_l = off_y = off_x = jnp.zeros_like(vc)
        val = vc
        off_ok = jnp.ones_like(vc, dtype=bool)

    fy = py.astype(jnp.float32) + off_y
    fx = px.astype(jnp.float32) + off_x
    fl = l.astype(jnp.float32) + off_l

    bd = float(cfg.border)
    border_ok = (fy >= bd) & (fy < H - bd) & (fx >= bd) & (fx < W - bd)
    contrast_ok = jnp.abs(val) >= cfg.dog_threshold
    mask = cand & off_ok & border_ok & contrast_ok

    sigma = cfg.sigma0 * jnp.exp2(fl / S)
    grad_level = jnp.clip(jnp.round(fl).astype(jnp.int32), 1, S)

    # `-sign` flag parity (GlobalUtil::_KeepExtremumSign ⚠): keep the SIGNED
    # refined DoG value so the output stage can mark minima (dark blobs) with
    # a negated sigma; ranking sites take |response| when keep_sign is on.
    resp = val if cfg.keep_sign else jnp.abs(val)
    return OctaveKeypoints(
        y=fy, x=fx, level=fl, grad_level=grad_level, sigma=sigma,
        response=resp, mask=mask,
    )


def detect_octave(
    oc: Octave, cfg: SiftConfig, cap: int, owned_rows=None,
    scores_impl: str | None = None,
) -> OctaveKeypoints:
    """Single-octave detection (see `detect_winners` for the semantics).
    The multi-octave single-chip path uses `detect_pyramid`, which merges the
    per-octave patch gathers into one call."""
    dog = oc.dog                       # [B, S+2, H, W]
    B, L, H, W = dog.shape
    win = detect_winners(dog, cfg, cap, owned_rows, scores_impl)
    pidx = patch_indices(win, H, W)
    # ONE packed gather: all used patch cells of all winners in a single
    # take_along_axis (per-call dispatch cost ~1 ms, per-element ~15 ns —
    # the vmapped dynamic_slice formulation this replaces cost 18 ms at
    # 640x480)
    p = (
        jnp.take_along_axis(dog.reshape(B, L * H * W), pidx, axis=1)
        .reshape(B, N_PATCH, -1)
        .astype(jnp.float32)
    )
    return refine_patches(p, win, cfg, H, W)


def detect_pyramid(
    pyr, cfg: SiftConfig, caps=None, scores_impl: str | None = None,
):
    """Detection over ALL octaves with the patch gathers of every octave
    merged into ONE take_along_axis (per-call gather cost dominates the
    per-octave formulation: 5 calls ~= 5 ms at 640x480).  Returns a list of
    per-octave `OctaveKeypoints`, identical to calling `detect_octave` per
    octave."""
    caps = caps or [cfg.octave_cap(o) for o in range(len(pyr))]
    B = pyr[0].dog.shape[0]
    wins, pidxs, sizes = [], [], []
    off = 0
    for oc, cap in zip(pyr, caps):
        _, L, H, W = oc.dog.shape
        win = detect_winners(oc.dog, cfg, cap, None, scores_impl)
        wins.append(win)
        pidxs.append(patch_indices(win, H, W) + off)
        sizes.append(L * H * W)
        off += L * H * W
    dogf = jnp.concatenate([oc.dog.reshape(B, -1) for oc in pyr], axis=1)
    pall = jnp.take_along_axis(
        dogf, jnp.concatenate(pidxs, axis=1), axis=1
    ).astype(jnp.float32)

    outs, col = [], 0
    for oc, cap, win in zip(pyr, caps, wins):
        _, L, H, W = oc.dog.shape
        p = pall[:, col : col + N_PATCH * cap].reshape(B, N_PATCH, cap)
        col += N_PATCH * cap
        outs.append(refine_patches(p, win, cfg, H, W))
    return outs
