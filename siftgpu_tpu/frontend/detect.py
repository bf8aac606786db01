"""Keypoint detection: DoG extrema -> contrast/edge tests -> subpixel refine.

TPU-native replacement for `ProgramCU::ComputeKEY` + the histogram-pyramid
list generation (`InitHist/ReduceHist/ListGen`, SURVEY.md §2.4 items 3-4 ⚠).
The reference compacts variable-length keypoint lists on the GPU and reads the
count back to the host; here there are NO host syncs and NO dynamic shapes:

  1. dense extrema / contrast / edge masks AND the dense closed-form
     (Cramer) subpixel solve over the DoG volume in one fused Pallas stencil
     pass on accelerators (ops/detect_scores.py) — the pass already holds
     all 27 taps, so it emits a per-pixel refinement record
     (val, off_l, off_y, off_x) alongside the score planes;
  2. per-octave `top_k` of |DoG| over 2x2-pooled candidate scores into a
     fixed-capacity buffer (deterministic: score desc, flat index asc —
     SURVEY §7.4 item 1), winner pixel recovered from the block corner index
     packed in the score's low mantissa bits;
  3. ONE packed `take_along_axis` pulls each survivor's 4-field record —
     merged across ALL octaves by `detect_pyramid` (the per-element gather
     cost made the previous 19-cell DoG patch gather the dominant detect
     stage);
  4. offset/contrast/border validity tests on the gathered records.

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
    "record_indices", "refine_records",
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
    """Masked per-type candidate score planes + dense refinement record,
    pure-XLA formulation.

    Returns (s_max, s_min, val, off_l, off_y, off_x), all [B, S, He, We]
    (He/We = H/W rounded up to even).  Nonzero score entries are |DoG| at
    strict 26-neighbor extrema passing the pre-threshold + Hessian edge +
    interior tests; the record planes carry the Cramer subpixel solve of
    every pixel (garbage at non-candidates — only winner cells are read).
    The Pallas kernel (ops/detect_scores.py) computes the identical planes
    in one fused pass on accelerators; this is the CPU / golden route."""
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

    # --- dense subpixel-refinement record (shared `cramer_record`: ONE
    # expression graph for this mirror and the Pallas kernel, so their
    # ulp-level agreement cannot drift; its spatial-Hessian terms double
    # as the edge test's dyy/dxx/dxy) ---
    from ..ops.detect_scores import cramer_record

    dgp = jnp.pad(dog.astype(jnp.float32), ((0, 0), (0, 0), (1, 1), (1, 1)))

    def q(dl, dy, dx):
        return dgp[:, 1 + dl : 1 + dl + S, 1 + dy : 1 + dy + H,
                   1 + dx : 1 + dx + W]

    val, off_l, off_y, off_x, (dyy, dxx, dxy) = cramer_record(
        q, bool(cfg.subpixel)
    )

    # --- dense Hessian edge test on the DoG slice ---
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

    recs = (val, off_l, off_y, off_x)
    if (He, We) != (H, W):
        pad2 = ((0, 0), (0, 0), (0, He - H), (0, We - W))
        s_max = jnp.pad(s_max, pad2)
        s_min = jnp.pad(s_min, pad2)
        recs = tuple(jnp.pad(p, pad2) for p in recs)
    # score planes are ROW-POOLED (matching the Pallas kernel's emission);
    # the consumer pools the lane pairs
    rp = lambda p: jax.lax.reduce_window(
        p, 0.0, jax.lax.max, (1, 1, 2, 1), (1, 1, 2, 1), "VALID"
    )
    return (rp(s_max), rp(s_min)) + recs


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
    """Back-compat wrapper: winners only (profiling scripts)."""
    win, _, _ = _winners_and_records(dog, cfg, cap, owned_rows, scores_impl)
    return win


def _winners_and_records(
    dog: jax.Array, cfg: SiftConfig, cap: int, owned_rows=None,
    scores_impl: str | None = None,
):
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
    bscore, recs, (Hs, Ws), (nb1, Hs2) = _octave_scores(
        dog, cfg, owned_rows, scores_impl
    )
    top, bidx = _run_topk(bscore, cap, cfg)
    win = _decode_topk(top, bidx, cap, nb1, Hs2, Ws)
    return win, recs, (Hs, Ws)


def _octave_scores(dog, cfg, owned_rows=None, scores_impl=None):
    """Dense scores + pooling only — the per-octave front half of
    `_winners_and_records`; `detect_pyramid` batches the top-k across
    octaves (per-call top_k overhead dominated the tail octaves: 8.1 ms of
    the 4K detect stage across 8 calls).  Returns
    (bscore [B, nb], records, (Hs, Ws), (nb1, Hs2))."""
    B, L, H, W = dog.shape
    S = L - 2
    impl = scores_impl or _pick_scores_impl(cfg)
    if impl.startswith("pallas"):
        from ..ops.detect_scores import detect_scores

        s_max, s_min, r_val, r_ol, r_oy, r_ox = detect_scores(
            dog, cfg, owned_rows, interpret=(impl == "pallas_interpret")
        )
    else:
        s_max, s_min, r_val, r_ol, r_oy, r_ox = _dense_scores_xla(
            dog, cfg, owned_rows
        )
    Hs2, Ws = s_max.shape[-2:]
    Hs = r_val.shape[-2]

    def pooled(score):
        return jax.lax.reduce_window(
            score, 0.0, jax.lax.max,
            window_dimensions=(1, 1, 1, 2), window_strides=(1, 1, 1, 2),
            padding="VALID",
        )

    nb1 = S * Hs2 * (Ws // 2)
    bscore = jnp.concatenate(
        [pooled(s_max).reshape(B, nb1), pooled(s_min).reshape(B, nb1)], axis=1
    )
    return bscore, (r_val, r_ol, r_oy, r_ox), (Hs, Ws), (nb1, Hs2)


_TWOSTAGE_MIN = 1 << 21  # 4K-class only: at 640-class rows (921k) the
                         # chunked form at chunk-recall 0.90 measured
                         # overlap 0.9550 vs the single call's 0.9908 at
                         # 0.97 (chunks are small there, no over-delivery)
                         # for only ~0.2 ms — measured and rejected   # row length above which the chunked form wins
_TWOSTAGE_R = 16          # chunks per row
_TWOSTAGE_KDIV = 4        # per-chunk k = cap // KDIV (capacity guard: one
                          # chunk may hold up to kc of the row's true top-k).
                          # Sweep at 4K-oct0 (scripts/probe_topk0.py, 12.5M
                          # entries, k=8192): KDIV=2 2.44 ms / overlap
                          # 0.9955, KDIV=4 1.88 / 0.9885, R=32 KDIV=8
                          # 1.85 / 0.9874, single-call rc=.90 2.10 / 0.9535
                          # — approx cost scales with per-call k, so the
                          # smaller chunk k wins while chunk spreading keeps
                          # overlap far above the 0.95 quality bar


def _run_topk(bscore, cap, cfg):
    """Exact/approx top-k policy on a [rows, n] score matrix.

    approx_max_k's cost at large k is dominated by its FINAL exact top-k
    over the ~k/(1-recall) PartialReduce survivors, not by the reduction
    pass (measured oct0-4K k=8192: 5.0 ms at recall .97 vs 2.0 ms at
    k=2048 on the same 12.4M entries).  Above `_TWOSTAGE_MIN` entries the
    row is therefore split into R chunks, each approx-reduced to
    kc = cap/2, and the R*kc survivors merged with one small exact top_k —
    same recall class (a chunk would have to hold > half the row's true
    winners to lose any; winners are spread across S DoG slices x image
    bands), measured 3.0 ms vs 5.0 at oct0-4K."""
    use_approx = cfg.detect_topk == "approx" or (
        cfg.detect_topk == "auto"
        and bscore.shape[1] >= cfg.topk_approx_min
        and jax.default_backend() != "cpu"
    )
    rows, n = bscore.shape
    k = min(cap, n)  # tiny octaves: fewer pooled entries than cap
    if use_approx and n >= _TWOSTAGE_MIN and k > 1024:
        R = _TWOSTAGE_R
        npad = -(-n // R) * R
        kc = min(max(512, k // _TWOSTAGE_KDIV), npad // R)
        bp = jnp.pad(bscore, ((0, 0), (0, npad - n))).reshape(
            rows * R, npad // R
        )
        v, ic = jax.lax.approx_max_k(
            bp, kc, recall_target=cfg.topk_chunk_recall
        )
        base = (
            jax.lax.broadcasted_iota(jnp.int32, (rows * R, 1), 0)
            % R * (npad // R)
        )
        ic = ic.astype(jnp.int32) + base
        v = v.reshape(rows, R * kc)
        ic = ic.reshape(rows, R * kc)
        top, sel = jax.lax.top_k(v, k)
        bidx = jnp.take_along_axis(ic, sel, axis=1)
    elif use_approx:
        # TPU PartialReduce-based top-k: ~2 ms vs ~27 ms exact on 12M-entry
        # 4K candidate arrays; may miss ~(1-recall) of borderline candidates
        # when the cap binds (see SiftConfig.detect_topk)
        top, bidx = jax.lax.approx_max_k(
            bscore, k, recall_target=cfg.topk_recall
        )
        bidx = bidx.astype(jnp.int32)
    else:
        top, bidx = jax.lax.top_k(bscore, k)         # [rows, k]
    if k < cap:  # pad to the fixed capacity; zero scores are masked by `cand`
        top = jnp.pad(top, ((0, 0), (0, cap - k)))
        bidx = jnp.pad(bidx, ((0, 0), (0, cap - k)))
    return top, bidx


def _decode_topk(top, bidx, cap, nb1, Hs2, Ws):
    cand = top > 0.0
    bidx1 = bidx % nb1                               # drop the type axis
    l = bidx1 // (Hs2 * (Ws // 2)) + 1               # DoG slice index in [1, S]
    rem = bidx1 % (Hs2 * (Ws // 2))
    # winner pixel = block origin + the corner packed in the score mantissa
    corner = jax.lax.bitcast_convert_type(top, jnp.int32) & 3
    py = (rem // (Ws // 2)) * 2 + (corner >> 1)
    px = (rem % (Ws // 2)) * 2 + (corner & 1)
    # padded rows/cols can never win: their scores are 0 and cand masks them
    return OctaveWinners(py=py, px=px, l=l, cand=cand)


# The subpixel solve no longer gathers 3x3x3 DoG patches: the dense score
# pass (Pallas kernel / XLA mirror) already holds all 27 taps and emits the
# Cramer RECORD (val, off_l, off_y, off_x) per pixel, so the top-k tail
# gathers 4 record cells per winner instead of 19 patch cells — per-element
# gather cost (~11-15 ns on v5e, independent of locality) dominated detect.
N_REC = 4


def record_indices(win: OctaveWinners, S: int, Hs: int, Ws: int) -> jax.Array:
    """[B, 4*cap] flat indices of the winner's record cells in the
    field-stacked record planes reshaped to [B, 4 * S*Hs*Ws] (field-major:
    val | off_l | off_y | off_x; l is 1-based, records indexed by slice
    l-1).  Indices are in range by construction: `l` is clamped to
    [0, S-1] here, and py/px are bounded by the score-plane decode
    (py < Hs, px < Ws) — there is no py/px clamp.  Padded winners are
    masked by `cand` downstream (refine_records), not by indexing."""
    vol = S * Hs * Ws
    cell = (jnp.clip(win.l - 1, 0, S - 1)) * (Hs * Ws) + win.py * Ws + win.px
    return jnp.concatenate([cell + f * vol for f in range(N_REC)], axis=1)


def refine_records(
    rec: jax.Array, win: OctaveWinners, cfg: SiftConfig, H: int, W: int
) -> OctaveKeypoints:
    """rec: [B, 4, cap] gathered (val, off_l, off_y, off_x) records of each
    winner (the dense Cramer solve ran in the score pass) -> offset/contrast/
    border validity tests + derived scale.  H, W are the TRUE image dims."""
    S = cfg.dog_levels
    py, px, l, cand = win.py, win.px, win.l, win.cand
    val, off_l, off_y, off_x = rec[:, 0], rec[:, 1], rec[:, 2], rec[:, 3]

    if cfg.subpixel:
        off_ok = (
            (jnp.abs(off_l) <= 1.5) & (jnp.abs(off_y) <= 1.5)
            & (jnp.abs(off_x) <= 1.5)
        )
        # a level offset beyond +-0.5 means the extremum belongs to the
        # neighboring DoG slice; clamp so refined sigma stays within the
        # bound the static orientation/descriptor windows are sized for
        # (core/scalespace.py::max_detect_sigma) — oracle does the same
        off_l = jnp.clip(off_l, -0.5, 0.5)
    else:
        off_ok = jnp.ones_like(val, dtype=bool)

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
    per-octave record gathers into one call."""
    dog = oc.dog                       # [B, S+2, H, W]
    B, L, H, W = dog.shape
    S = L - 2
    win, recs, (Hs, Ws) = _winners_and_records(
        dog, cfg, cap, owned_rows, scores_impl
    )
    ridx = record_indices(win, S, Hs, Ws)
    rf = jnp.concatenate([r.reshape(B, -1) for r in recs], axis=1)
    rec = jnp.take_along_axis(rf, ridx, axis=1).reshape(B, N_REC, -1)
    return refine_records(rec, win, cfg, H, W)


def detect_pyramid(
    pyr, cfg: SiftConfig, caps=None, scores_impl: str | None = None,
):
    """Detection over ALL octaves with the record gathers of every octave
    merged into ONE take_along_axis (per-call gather cost ~1 ms dominates
    the per-octave formulation).  Returns a list of per-octave
    `OctaveKeypoints`, identical to calling `detect_octave` per octave."""
    caps = caps or [cfg.octave_cap(o) for o in range(len(pyr))]
    B = pyr[0].dog.shape[0]
    # phase 1: dense scores + pooled candidate arrays for every octave
    bscores, recss, hw, metas, dims = [], [], [], [], []
    for oc in pyr:
        _, L, H, W = oc.dog.shape
        bscore, recs, (Hs, Ws), meta = _octave_scores(
            oc.dog, cfg, None, scores_impl
        )
        bscores.append(bscore)
        recss.append(recs)
        hw.append((Hs, Ws, L - 2))
        metas.append(meta)
        dims.append((H, W))

    # phase 2: top-k — octave 0 alone (its candidate array dwarfs the
    # rest); the other octaves PAD into one batched call WHEN the padded
    # group rides the approx path (cost per element is tiny there, and the
    # per-call top_k floor dominated the tail octaves: measured 4K detect
    # top-k 8.8 ms per-octave vs 6.7 batched).  With an exact-path group
    # (small images) the 4x-per-octave padding inflation costs more than
    # the saved call floors (640: 3.1 -> 3.6 ms), so stay per-octave.
    # Parity: top-k_max of a zero-padded row, sliced to the octave's cap,
    # equals the octave's own top-cap for the exact path (padding scores
    # are 0 and `cand` masks them); the batched group's approx recall is
    # re-validated by scripts/approx_recall.py.
    tops, bidxs = [None] * len(pyr), [None] * len(pyr)
    tops[0], bidxs[0] = _run_topk(bscores[0], caps[0], cfg)
    n_max = max((b.shape[1] for b in bscores[1:]), default=0)
    batch_ok = (
        len(pyr) > 2
        and cfg.detect_topk != "exact"
        and n_max >= cfg.topk_approx_min
        and jax.default_backend() != "cpu"
    )
    if batch_ok:
        k_max = max(
            min(c, b.shape[1]) for c, b in zip(caps[1:], bscores[1:])
        )
        batch = jnp.stack(
            [jnp.pad(b, ((0, 0), (0, n_max - b.shape[1])))
             for b in bscores[1:]], axis=1,
        ).reshape(B * (len(pyr) - 1), n_max)
        topb, bidxb = _run_topk(batch, k_max, cfg)
        topb = topb.reshape(B, len(pyr) - 1, -1)
        bidxb = bidxb.reshape(B, len(pyr) - 1, -1)
        for i, cap in enumerate(caps[1:]):
            t = topb[:, i, :cap]
            x = bidxb[:, i, :cap]
            if cap > t.shape[1]:
                t = jnp.pad(t, ((0, 0), (0, cap - t.shape[1])))
                x = jnp.pad(x, ((0, 0), (0, cap - x.shape[1])))
            tops[i + 1], bidxs[i + 1] = t, x
    else:
        for i in range(1, len(pyr)):
            tops[i], bidxs[i] = _run_topk(bscores[i], caps[i], cfg)

    # phase 3: decode winners + merge the record gathers into ONE call
    wins, ridxs, flats = [], [], []
    off = 0
    for i, cap in enumerate(caps):
        Hs, Ws, S = hw[i]
        nb1, Hs2 = metas[i]
        win = _decode_topk(tops[i], bidxs[i], cap, nb1, Hs2, Ws)
        wins.append(win)
        ridxs.append(record_indices(win, S, Hs, Ws) + off)
        flats.append(
            jnp.concatenate([r.reshape(B, -1) for r in recss[i]], axis=1))
        off += N_REC * S * Hs * Ws
    rall = jnp.take_along_axis(
        jnp.concatenate(flats, axis=1), jnp.concatenate(ridxs, axis=1), axis=1
    )

    outs, col = [], 0
    for (H, W), cap, win in zip(dims, caps, wins):
        rec = rall[:, col : col + N_REC * cap].reshape(B, N_REC, cap)
        col += N_REC * cap
        outs.append(refine_records(rec, win, cfg, H, W))
    return outs
