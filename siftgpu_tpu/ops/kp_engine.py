"""Pallas TPU kernel: fused orientation assignment + descriptor sampling.

Replaces the two hottest per-keypoint stages (SURVEY.md §2.4 items 5-6 —
`ProgramCU::ComputeOrient` + the descriptor gradient gather ⚠) with ONE pass
per keypoint over ONE window DMA:

  - the old XLA orientation path gathered a (2R+1)^2 window per keypoint with
    vmapped `dynamic_slice` (~20 ms per batch-4 640x480 iteration) and built
    the 36-bin histogram with a chunked one-hot einsum (~50 ms more);
  - the old descriptor path (ops/desc_sampler.py) re-DMA'd the same gradient
    window once per orientation slot.

Here each keypoint's gradient window is DMA'd HBM -> VMEM exactly once
(double-buffered across grid steps) and everything downstream happens
in-kernel:

  1. 36-bin Gaussian-weighted orientation histogram over a dynamically
     row-sliced sub-window, QUAD-packed (4 keypoints per 128-lane register;
     exact same pixel set as the XLA path: clipped window ∩ radius circle
     ∩ global image rows), Gaussian window via `exp_window`;
  2. histogram smoothing x6 as ONE tiny matmul against a precomputed
     circulant matrix (box smoothing is linear), with left/right-rolled
     copies fused into the same constant so peak tests need no roll ops;
  3. peak selection (<= NORI peaks >= peak_ratio * max, ties -> smallest
     bin like `lax.top_k`), parabola refinement via one-hot dots;
  4. per-orientation descriptor sampling in G2-ON-LANES layout: rotated
     16x16 grid positions/bounds on [BLK, 1, G2] full-lane arrays, column
     tents [BLK, nx, G2] contracted against the window on the MXU
     ([BLK, win_y, nx] x [BLK, nx, G2] -> [BLK, win_y, G2], no N-padding
     waste), row-tent sublane reduce — no lane-degenerate intermediates
     and no relayouts (each alternative measured slower; see the round-4
     commit).

Geometry: DMA offsets must be tile-aligned (8 sublanes x 128 lanes); window
origins snap down to the tile grid and margins are derived from the config's
`max_detect_sigma` bound (see `window_geometry`).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["orient_sample", "window_geometry"]

_TWO_PI = 6.283185307179586
_NEG = -1e30
# keypoints per grid step (env knob for benchmarking block-size tradeoffs:
# larger BLK amortizes per-step overhead, costs VMEM).  Measured v5e, 8192
# noise-gradient slots at 640x480 on the round-4 lane-major kernel:
# BLK=16 619 ns/slot, 32 593 (-4%; ~24 MB scratch, well under the 96 MB
# scoped-vmem limit) — 32 is the default since round 4.  BLK=64 measured
# WORSE on the round-5 packed-u32 kernel (545 vs 528 ns/slot, bench_kp
# 2026-08-22): the wider block gains no DMA overlap (already double-
# buffered) and the larger scratch hurts scheduling.
def _read_blk() -> int:
    import os

    raw = os.environ.get("SIFTGPU_KP_BLK", "32")
    try:
        v = int(raw)
    except ValueError:
        raise ValueError(f"SIFTGPU_KP_BLK={raw!r}: must be an integer") from None
    # must be a small positive even value: odd disables the pair-packed
    # histogram path, <=0 breaks the Np//BLK grid math, large blows the
    # 96 MB scoped-vmem limit at compile time
    if v not in (2, 4, 8, 16, 32, 64):
        raise ValueError(
            f"SIFTGPU_KP_BLK={v}: expected one of 2/4/8/16/32/64 "
            "(even, and bounded by the kernel's VMEM scratch budget)"
        )
    return v


BLK = _read_blk()


# degree-7 least-squares fit of exp(x) on [-4.75, 0] (abs err <= 6.3e-5,
# rel err at the in-circle extreme x = -rad_f^2/2 = -4.5: 0.2%).  The
# orientation histogram's Gaussian window weight was 1.7 ms of the 8.5 ms
# kernel at 8192 keypoints — the VPU's transcendental path is ~an order
# slower than its mul/add path, and a window weight needs no exp-grade
# accuracy.  The XLA mirror (frontend/orient.py) uses the SAME polynomial
# so cross-backend parity stays tight; the NumPy oracle keeps true exp.
_EXPW = (
    2.1755081222e-05, 5.1727565826e-04, 5.5559910437e-03, 3.6198773900e-02,
    1.6038511456e-01, 4.9620069315e-01, 9.9901960879e-01, 9.9993781360e-01,
)


def exp_window(x):
    """Polynomial stand-in for exp(x) on the Gaussian-window range
    [-rad_f^2/2, 0]; inputs are clamped (out-of-circle pixels evaluate it
    too before their mask applies, at arbitrarily negative x)."""
    x = jnp.maximum(x, -4.75)
    acc = jnp.full_like(x, _EXPW[0])
    for c in _EXPW[1:]:
        acc = acc * x + c
    return acc


def _vec3(vals, dtype):
    """[len(vals), 1, 1] vector from in-kernel scalars.  Mosaic rejects the
    1-D stack + reshape formulation (vector<8> -> vector<8x1x1> shape cast),
    so build it as iota-selected splats instead."""
    ids = jax.lax.broadcasted_iota(jnp.int32, (len(vals), 1, 1), 0)
    out = jnp.zeros((len(vals), 1, 1), dtype)
    for k, s in enumerate(vals):
        out = jnp.where(ids == k, s, out)
    return out


def window_geometry(cfg):
    """Static window geometry derived from the config's sigma bound.

    Returns (margin, WIN_Y, WIN_X, win_o, ORI_SPAN).  The descriptor sample
    grid reaches (G-1)/2 * spacing*sigma/spc * sqrt(2) pixels from the center
    (rotation worst case) + 1 for the bilinear tent; the orientation window
    is (2R+1)^2 and must sit inside the descriptor window.
    """
    G = cfg.descriptor_grid
    smax = cfg.max_detect_sigma
    reach = (G - 1) / 2.0 * cfg.descriptor_spacing * smax / cfg.descriptor_samples_per_cell
    margin = int(math.ceil(reach * math.sqrt(2.0) + 1.5))
    R = cfg.orient_window_radius
    margin = max(margin, R + 2)
    win_y = -(-(2 * margin + 8) // 8) * 8
    win_o = 2 * R + 1
    ori_span = min(-(-(win_o + 7) // 8) * 8, win_y)
    if margin > 64:
        raise ValueError(
            f"descriptor margin {margin} exceeds the 64-px column margin of "
            f"the 256-lane window; widen WIN_X handling for this config"
        )
    return margin, win_y, 256, win_o, ori_span


def _cum_to_bin_matrix(nb: int) -> np.ndarray:
    """[nb, nb] constant mapping CUMULATIVE quadrant sums to bin counts.

    The quad-packed histogram path accumulates C[q, j] = sum of wm over
    pixels in quadrant q with sector index s >= j (the sector indicators
    ay >= ax*tan_t are NESTED, so s >= j is ONE existing compare — no
    per-(pixel, bin) one-hot compare needed).  hist[b] = C[q, j] - C[q, j+1]
    for the (q, j) that maps to bin b (same fold as the `bins` expression in
    the one-hot paths); the difference and the quadrant->bin permutation are
    linear, so they ride in this constant, pre-multiplied into the smoothing
    matrix (hist @ SM == C @ (D @ SM)) — zero extra kernel ops."""
    nq = nb // 4
    D = np.zeros((nb, nb), np.float32)
    for q in range(4):
        for j in range(nq):
            if q == 0:
                b = j                      # qy & qx:   bins = s
            elif q == 1:
                b = (2 * nq - 1) - j       # qy & ~qx:  bins = 2nq-1-s
            elif q == 2:
                b = 2 * nq + j             # ~qy & ~qx: bins = 2nq+s
            else:
                b = (4 * nq - 1) - j       # ~qy & qx:  bins = 4nq-1-s
            D[q * nq + j, b] += 1.0
            if j + 1 < nq:
                D[q * nq + j + 1, b] -= 1.0
    return D


def _smooth_matrix(nb: int, rounds: int = 6) -> np.ndarray:
    """[nb, 3*nb] constant: hist @ M -> (smoothed | left-rolled | right-rolled).

    Box smoothing x`rounds` is linear, so it collapses into one circulant
    matrix; roll(+1)/roll(-1) of the smoothed histogram are the same matrix
    with permuted columns.
    """
    C = np.zeros((nb, nb), np.float64)
    for i in range(nb):
        C[i, i] = 1.0
    step = np.zeros((nb, nb), np.float64)
    for i in range(nb):
        step[i, i] = 1 / 3
        step[i, (i + 1) % nb] = 1 / 3
        step[i, (i - 1) % nb] = 1 / 3
    for _ in range(rounds):
        C = C @ step
    left = np.roll(C, 1, axis=1)    # (hist @ left)[b]  = smoothed[b-1]
    right = np.roll(C, -1, axis=1)  # (hist @ right)[b] = smoothed[b+1]
    return np.concatenate([C, left, right], axis=1).astype(np.float32)


def _kernel(
    cur_ref, nxt_ref, flt_ref, y0g_ref, sm_ref, *rest,
    win_y, win_x, win_o, ori_span, nb, nori, G, peak_ratio,
    sig_f, rad_f, spacing, spc_cell, narrow, packed, pack4, pack_g,
):
    """cur/nxt_ref: [1, 9, BLK] int32 SMEM (plane, wy0, wx0, ro, sy, sx,
    valid, co, ix); flt_ref: [1, 3, BLK] f32 SMEM (ky, kx, sigma); y0g_ref:
    [1, 3] int32 SMEM (global row offset, true image width, global image
    height); sm_ref: [nb, 3nb] smoothing constant.

    `pack_g` (static, narrow-only): the gradient pair arrives as ONE u32
    plane per level (gy bf16 bits in [31:16], gx in [15:0], packed by the
    XLA prologue in `_orient_sample_impl`) — HALVING the per-keypoint DMA
    count AND the per-keypoint rolls; `wxy` is then [2, BLK, WIN_Y, WIN_X]
    u32 and `build_narrow` bit-unpacks after the single roll (exact: the
    unpacked f32 values are the bf16 gradients).  Without pack_g, wxy is
    [2, BLK, WIN_Y, 2*WIN_X] bf16 with gx in cols [:WIN_X].

    `narrow` (static): every contributing pixel lies within 62 px of the
    keypoint column, so compute runs on a per-keypoint 128-lane window —
    `co` = dynamic lane offset, realized as one `pltpu.roll` per keypoint
    into the compact `nwin` scratch.  Halves the histogram VPU work, the
    tent MXU matmul, and the column reduction vs the aligned 256-lane
    window."""
    if pack_g:
        gp_hbm, misc_ref, sgx_ref, sgy_ref, wxy, b_scr, sems, *scr = rest
    else:
        gx_hbm, gy_hbm, misc_ref, sgx_ref, sgy_ref, wxy, b_scr, sems, *scr = rest
    G2 = G * G
    i = pl.program_id(0)
    nbk = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)
    nslot = jax.lax.rem(i + 1, 2)

    def dma(src, ref, k, dslot, col0, sem_idx):
        p = ref[0, 0, k]
        y0 = pl.multiple_of(ref[0, 1, k], 8)
        x0 = pl.multiple_of(ref[0, 2, k], 128)
        return pltpu.make_async_copy(
            src.at[p, pl.ds(y0, win_y), pl.ds(x0, win_x)],
            wxy.at[dslot, k, :, pl.ds(col0, win_x)], sems.at[dslot, sem_idx],
        )

    def start_windows(ref, dslot):
        for k in range(BLK):
            @pl.when(ref[0, 6, k] > 0)
            def _():
                if pack_g:
                    dma(gp_hbm, ref, k, dslot, 0, k).start()
                else:
                    dma(gx_hbm, ref, k, dslot, 0, 2 * k).start()
                    dma(gy_hbm, ref, k, dslot, win_x, 2 * k + 1).start()

    # DMA only the windows of VALID keypoints (start/wait guarded by the same
    # SMEM flag, so semaphore signals always pair up); invalid keypoints read
    # stale scratch, and their outputs are masked downstream.
    @pl.when(i == 0)
    def _warmup():
        start_windows(cur_ref, 0)

    @pl.when(i + 1 < nbk)
    def _prefetch():
        start_windows(nxt_ref, nslot)

    for k in range(BLK):
        @pl.when(cur_ref[0, 6, k] > 0)
        def _():
            if pack_g:
                dma(gp_hbm, cur_ref, k, slot, 0, k).wait()
            else:
                dma(gx_hbm, cur_ref, k, slot, 0, 2 * k).wait()
                dma(gy_hbm, cur_ref, k, slot, win_x, 2 * k + 1).wait()

    y0g = y0g_ref[0, 0]
    w_true = y0g_ref[0, 1]
    global_h = y0g_ref[0, 2]
    anyv = cur_ref[0, 6, 0]
    for k in range(1, BLK):
        anyv = jnp.maximum(anyv, cur_ref[0, 6, k])

    nx = 128 if narrow else win_x      # compute-window lane width
    nwin = owin = None
    if narrow:
        nwin = scr[0]                  # [BLK, win_y, 256] compact windows
        owin = scr[1]                  # [BLK, ORI_SPAN, 256] orientation rows

    # ---------------- orientation histograms (per keypoint) ----------------
    rows_o = jax.lax.broadcasted_iota(jnp.int32, (ori_span, nx), 0)
    cols_o = jax.lax.broadcasted_iota(jnp.int32, (ori_span, nx), 1)
    # tan of the within-quadrant sector boundaries (nb/4 sectors per quadrant)
    nq = nb // 4
    tans = [math.tan(_TWO_PI / nb * t) for t in range(1, nq)]

    def build_narrow(k):
        co = cur_ref[0, 7, k]
        ro = pl.multiple_of(cur_ref[0, 3, k], 8)
        if pack_g:
            # ONE roll on the packed u32 window, then bit-unpack: f32 bits
            # of a bf16 value are its 16 bits shifted high, so gx (low half)
            # is `w << 16` and gy (high half) is `w & 0xffff0000` — exactly
            # the values the unpacked path's bf16->f32 upcast produced
            rolled = pltpu.roll(wxy[slot, k], -co, 1)[:, :128]
            nwin[k, :, :128] = jax.lax.bitcast_convert_type(
                rolled << jnp.uint32(16), jnp.float32)
            nwin[k, :, 128:] = jax.lax.bitcast_convert_type(
                rolled & jnp.uint32(0xFFFF0000), jnp.float32)
        else:
            # upcast at the roll: the DMA'd windows are bf16 (HBM traffic is
            # the kernel's dominant cost) but Mosaic's dynamic_rotate only
            # lowers for 32-bit lanes, and downstream math is f32 anyway
            nwin[k, :, :128] = pltpu.roll(
                wxy[slot, k, :, :win_x].astype(jnp.float32), -co, 1)[:, :128]
            nwin[k, :, 128:] = pltpu.roll(
                wxy[slot, k, :, win_x:].astype(jnp.float32), -co, 1)[:, :128]
        if pack4:
            # FOUR keypoints share each 128-lane register (32-lane slots,
            # centers 16/48/80/112 for gx and +128 for gy) — quartering the
            # 36-bin accumulate's VPU element count, and the row span
            # shrinks to 40 (the circle reaches 16 rows either side).
            # Valid because every contributing pixel satisfies
            # (c - kx)^2 <= (rad_f sig_f sigma_max)^2 with
            # |kx - round(kx)| <= 0.5, so integer offsets from the rounded
            # center are <= floor(rad + 0.5) <= 16 (`offmax` gate).
            # Wrapped lanes alias columns the box/circle masks reject.
            cl = cur_ref[0, 8, k] - cur_ref[0, 2, k] - co
            q = k % 4
            rolled = pltpu.roll(
                nwin[k, pl.ds(ro, ori_span), :], (16 + 32 * q) - cl, 1
            )
            if q == 0:
                owin[k // 4] = rolled
            else:
                lane = jax.lax.broadcasted_iota(jnp.int32, (ori_span, 256), 1)
                keep = (jax.lax.rem(lane, 128) // 32) == q
                owin[k // 4] = jnp.where(keep, rolled, owin[k // 4])
            return
        if not packed:
            owin[k] = nwin[k, pl.ds(ro, ori_span), :]
            return
        # `packed`: TWO keypoints share each 128-lane register of the
        # orientation window — even keypoint centered at lanes 32 (gx) /
        # 160 (gy), odd at 96 / 224 — halving the 36-bin accumulate loop's
        # VPU element count.  Valid because the radius mask bounds every
        # contributing pixel within +-(R+1) <= 31 columns of the keypoint,
        # which sits at lane cl = ix - wx0 - co of its compact window.
        # Wrapped lanes alias columns outside [window start, window end),
        # which the box/circle masks always reject.
        cl = cur_ref[0, 8, k] - cur_ref[0, 2, k] - co
        rolled = pltpu.roll(
            nwin[k, pl.ds(ro, ori_span), :], (32 + 64 * (k % 2)) - cl, 1
        )
        if k % 2 == 0:
            owin[k // 2] = rolled
        else:
            lane = jax.lax.broadcasted_iota(jnp.int32, (ori_span, 256), 1)
            keep = (lane < 64) | ((lane >= 128) & (lane < 192))
            owin[k // 2] = jnp.where(keep, owin[k // 2], rolled)

    def one_hist(k):
        wy0 = cur_ref[0, 1, k]
        wx0 = cur_ref[0, 2, k] + (cur_ref[0, 7, k] if narrow else 0)
        ro = pl.multiple_of(cur_ref[0, 3, k], 8)
        sy = cur_ref[0, 4, k]
        sx = cur_ref[0, 5, k]
        ky = flt_ref[0, 0, k]
        kx = flt_ref[0, 1, k]
        sw = sig_f * flt_ref[0, 2, k]
        rad2 = (rad_f * sw) * (rad_f * sw)

        if narrow:
            gxw = nwin[k, pl.ds(ro, ori_span), :128].astype(jnp.float32)
            gyw = nwin[k, pl.ds(ro, ori_span), 128:].astype(jnp.float32)
        else:
            gxw = wxy[slot, k, pl.ds(ro, ori_span), :win_x].astype(jnp.float32)
            gyw = wxy[slot, k, pl.ds(ro, ori_span), win_x:].astype(jnp.float32)
        row_abs = rows_o + (wy0 + ro)
        col_abs = cols_o + wx0
        oy = row_abs.astype(jnp.float32) - ky
        ox = col_abs.astype(jnp.float32) - kx
        r2 = oy * oy + ox * ox
        inwin = (
            (row_abs >= sy) & (row_abs < sy + win_o)
            & (col_abs >= sx) & (col_abs < sx + win_o)
            & (row_abs + y0g >= 0) & (row_abs + y0g < global_h)
            & (r2 <= rad2)
        )
        wgt = jnp.where(inwin, exp_window(r2 * (-0.5 / (sw * sw))), 0.0)
        mag = jnp.sqrt(gxw * gxw + gyw * gyw)
        wm = wgt * mag
        # Bin index WITHOUT atan2 (unsupported in Mosaic): quadrant from the
        # gradient signs, within-quadrant sector s = #{t : |gy| >= |gx| tan_t}
        # (= floor of the reduced angle / sector width), then the quadrant
        # fold maps s to the global bin.  Matches the XLA floor(atan2·nb/2π)
        # binning exactly up to f32 rounding at sector boundaries.
        ax = jnp.abs(gxw)
        ay = jnp.abs(gyw)
        s = jnp.zeros(ax.shape, jnp.int32)
        for t in tans:
            s = s + (ay >= ax * t).astype(jnp.int32)
        # axis conventions match atan2: gx=0,gy>0 -> π/2 (bin nq via the
        # qx=False fold since s=nq-1 there); gx=0,gy<0 -> 3π/2 (bin 3nq via
        # qx=True); gy=0,gx<0 -> +π (bin 2nq via qy=False, qx=False)
        qx = (gxw > 0.0) | ((gxw == 0.0) & (gyw < 0.0))
        qy = (gyw > 0.0) | ((gyw == 0.0) & qx)
        bins = jnp.where(
            qy,
            jnp.where(qx, s, (2 * nq - 1) - s),
            jnp.where(qx, (4 * nq - 1) - s, 2 * nq + s),
        )
        # (bf16 accumulation here measured NO faster and flips razor-thin
        # second peaks — keep f32)
        parts = [
            jnp.sum(jnp.where(bins == b, wm, 0.0), axis=0, keepdims=True)
            for b in range(nb)
        ]
        part = jnp.concatenate(parts, axis=0)            # [nb, win_x]
        return jnp.sum(part, axis=1, keepdims=True).T    # [1, nb]

    def iv(idx):
        return _vec3([cur_ref[0, idx, k] for k in range(BLK)], jnp.int32)

    def fv(idx):
        return _vec3([flt_ref[0, idx, k] for k in range(BLK)], jnp.float32)

    def batched_hist():
        """All-BLK histogram over the compact orientation rows (`owin`):
        identical per-keypoint math and reduction shapes to `one_hist`, but
        every VPU op covers the whole block — the 8 separate [ori_span, 128]
        op chains were op-overhead-bound."""
        wy0 = iv(1) + iv(3)            # window origin + orientation row snap
        wx0 = iv(2) + iv(7)
        sy = iv(4)
        sx = iv(5)
        ky = fv(0)
        kx = fv(1)
        sw = sig_f * fv(2)
        rad2 = (rad_f * sw) * (rad_f * sw)
        gxw = owin[:, :, :128].astype(jnp.float32)
        gyw = owin[:, :, 128:].astype(jnp.float32)
        sh3 = (BLK, ori_span, 128)
        row_abs = jax.lax.broadcasted_iota(jnp.int32, sh3, 1) + wy0
        col_abs = jax.lax.broadcasted_iota(jnp.int32, sh3, 2) + wx0
        oy = row_abs.astype(jnp.float32) - ky
        ox = col_abs.astype(jnp.float32) - kx
        r2 = oy * oy + ox * ox
        inwin = (
            (row_abs >= sy) & (row_abs < sy + win_o)
            & (col_abs >= sx) & (col_abs < sx + win_o)
            & (row_abs + y0g >= 0) & (row_abs + y0g < global_h)
            & (r2 <= rad2)
        )
        wgt = jnp.where(inwin, exp_window(r2 * (-0.5 / (sw * sw))), 0.0)
        mag = jnp.sqrt(gxw * gxw + gyw * gyw)
        wm = wgt * mag
        ax = jnp.abs(gxw)
        ay = jnp.abs(gyw)
        s = jnp.zeros(ax.shape, jnp.int32)
        for t in tans:
            s = s + (ay >= ax * t).astype(jnp.int32)
        qx = (gxw > 0.0) | ((gxw == 0.0) & (gyw < 0.0))
        qy = (gyw > 0.0) | ((gyw == 0.0) & qx)
        bins = jnp.where(
            qy,
            jnp.where(qx, s, (2 * nq - 1) - s),
            jnp.where(qx, (4 * nq - 1) - s, 2 * nq + s),
        )
        parts = [
            jnp.sum(jnp.where(bins == b, wm, 0.0), axis=1) for b in range(nb)
        ]                                            # each [BLK, 128]
        return jnp.sum(jnp.stack(parts, axis=1), axis=2)   # [BLK, nb]

    def packed_hist():
        """Pair-packed variant of `batched_hist`: the 36-bin accumulate runs
        on [BLK/2, ori_span, 128] with two keypoints per register (even in
        lanes 0:64 / 128:192, odd in 64:128 / 192:256 — see `build_narrow`).
        Identical per-pixel math; per-keypoint scalars become lane-half
        selected constants, and the final lane reduction splits per half."""
        BLK2 = BLK // 2
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (BLK2, 1, 128), 2)

        def halves(fn, dtype):
            va = _vec3([fn(k) for k in range(0, BLK, 2)], dtype)
            vb = _vec3([fn(k) for k in range(1, BLK, 2)], dtype)
            return jnp.where(lane1 < 64, va, vb)       # [BLK2, 1, 128]

        wy0ro = lambda k: cur_ref[0, 1, k] + cur_ref[0, 3, k]
        ixof = lambda k: cur_ref[0, 8, k] - (32 + 64 * (k % 2))
        sww = lambda k: sig_f * flt_ref[0, 2, k]
        fy = jnp.float32
        c_oy = halves(lambda k: wy0ro(k).astype(fy) - flt_ref[0, 0, k], fy)
        c_ox = halves(lambda k: ixof(k).astype(fy) - flt_ref[0, 1, k], fy)
        c_by = halves(lambda k: wy0ro(k) - cur_ref[0, 4, k], jnp.int32)
        c_bx = halves(lambda k: ixof(k) - cur_ref[0, 5, k], jnp.int32)
        c_gy = halves(lambda k: wy0ro(k) + y0g, jnp.int32)
        c_iv = halves(lambda k: -0.5 / (sww(k) * sww(k)), fy)
        c_r2 = halves(lambda k: (rad_f * sww(k)) * (rad_f * sww(k)), fy)

        sh3 = (BLK2, ori_span, 128)
        rows = jax.lax.broadcasted_iota(jnp.int32, sh3, 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, sh3, 2)
        gxw = owin[:, :, :128].astype(jnp.float32)
        gyw = owin[:, :, 128:].astype(jnp.float32)
        oy = rows.astype(fy) + c_oy
        ox = cols.astype(fy) + c_ox
        r2 = oy * oy + ox * ox
        br = rows + c_by
        bc = cols + c_bx
        gr = rows + c_gy
        inwin = (
            (br >= 0) & (br < win_o) & (bc >= 0) & (bc < win_o)
            & (gr >= 0) & (gr < global_h) & (r2 <= c_r2)
        )
        wgt = jnp.where(inwin, exp_window(r2 * c_iv), 0.0)
        mag = jnp.sqrt(gxw * gxw + gyw * gyw)
        wm = wgt * mag
        ax = jnp.abs(gxw)
        ay = jnp.abs(gyw)
        s = jnp.zeros(ax.shape, jnp.int32)
        for t in tans:
            s = s + (ay >= ax * t).astype(jnp.int32)
        qx = (gxw > 0.0) | ((gxw == 0.0) & (gyw < 0.0))
        qy = (gyw > 0.0) | ((gyw == 0.0) & qx)
        bins = jnp.where(
            qy,
            jnp.where(qx, s, (2 * nq - 1) - s),
            jnp.where(qx, (4 * nq - 1) - s, 2 * nq + s),
        )
        parts = [
            jnp.sum(jnp.where(bins == b, wm, 0.0), axis=1) for b in range(nb)
        ]                                              # each [BLK2, 128]
        st = jnp.stack(parts, axis=1)                  # [BLK2, nb, 128]
        lane2 = jax.lax.broadcasted_iota(jnp.int32, (BLK2, nb, 128), 2)
        # where-selects (not mask multiplies): an invalid keypoint's stale
        # window can hold non-finite garbage, and NaN * 0 would leak into
        # its pair partner through a masked multiply
        ha = jnp.sum(jnp.where(lane2 < 64, st, 0.0), axis=2)
        hb = jnp.sum(jnp.where(lane2 >= 64, st, 0.0), axis=2)
        return jnp.stack([ha, hb], axis=1).reshape(BLK, nb)

    def packed_hist4():
        """Quad-packed variant: the 36-bin accumulate runs on
        [BLK/4, ori_span(40), 128] with FOUR keypoints per register in
        32-lane slots (see `build_narrow`).  2.4x fewer histogram elements
        than the pair path ([BLK/2, 48, 128]); identical per-pixel math."""
        BLK4 = BLK // 4
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (BLK4, 1, 128), 2)
        lq1 = lane1 // 32

        def quarters(fn, dtype):
            vs = [
                _vec3([fn(k) for k in range(q, BLK, 4)], dtype)
                for q in range(4)
            ]
            return jnp.where(
                lq1 == 0, vs[0],
                jnp.where(lq1 == 1, vs[1],
                          jnp.where(lq1 == 2, vs[2], vs[3])),
            )

        wy0ro = lambda k: cur_ref[0, 1, k] + cur_ref[0, 3, k]
        ixof = lambda k: cur_ref[0, 8, k] - (16 + 32 * (k % 4))
        sww = lambda k: sig_f * flt_ref[0, 2, k]
        fy = jnp.float32
        c_oy = quarters(lambda k: wy0ro(k).astype(fy) - flt_ref[0, 0, k], fy)
        c_ox = quarters(lambda k: ixof(k).astype(fy) - flt_ref[0, 1, k], fy)
        c_by = quarters(lambda k: wy0ro(k) - cur_ref[0, 4, k], jnp.int32)
        c_bx = quarters(lambda k: ixof(k) - cur_ref[0, 5, k], jnp.int32)
        c_gy = quarters(lambda k: wy0ro(k) + y0g, jnp.int32)
        c_iv = quarters(lambda k: -0.5 / (sww(k) * sww(k)), fy)
        c_r2 = quarters(lambda k: (rad_f * sww(k)) * (rad_f * sww(k)), fy)

        sh3 = (BLK4, ori_span, 128)
        rows = jax.lax.broadcasted_iota(jnp.int32, sh3, 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, sh3, 2)
        gxw = owin[:, :, :128].astype(jnp.float32)
        gyw = owin[:, :, 128:].astype(jnp.float32)
        oy = rows.astype(fy) + c_oy
        ox = cols.astype(fy) + c_ox
        r2 = oy * oy + ox * ox
        br = rows + c_by
        bc = cols + c_bx
        gr = rows + c_gy
        inwin = (
            (br >= 0) & (br < win_o) & (bc >= 0) & (bc < win_o)
            & (gr >= 0) & (gr < global_h) & (r2 <= c_r2)
        )
        wgt = jnp.where(inwin, exp_window(r2 * c_iv), 0.0)
        mag = jnp.sqrt(gxw * gxw + gyw * gyw)
        wm = wgt * mag
        ax = jnp.abs(gxw)
        ay = jnp.abs(gyw)
        qx = (gxw > 0.0) | ((gxw == 0.0) & (gyw < 0.0))
        qy = (gyw > 0.0) | ((gyw == 0.0) & qx)
        # CUMULATIVE-threshold accumulate (round 5): the sector indicators
        # (ay >= ax*tan_t) are nested, so s >= j is one compare — C[q, j] =
        # sum of wm over quadrant q with s >= j replaces the per-(pixel, bin)
        # one-hot compare of the previous form (bins==bid cost 36 extra
        # VPU compares per pixel).  The bin differences C[j] - C[j+1] and the quadrant->bin
        # permutation are folded into the smoothing constant host-side
        # (`_cum_to_bin_matrix`; sm_ref = D @ SM), so hist_fn returns rows
        # in (q, j) cumulative order at zero extra kernel cost.
        inds = [ay >= ax * t for t in tans]            # nested indicators
        quads = [qy & qx, qy & ~qx, ~qy & ~qx, ~qy & qx]
        rows_c = []
        for qm in quads:
            # where-selects (not mask multiplies): see packed_hist
            wmq = jnp.where(qm, wm, 0.0)
            rows_c.append(jnp.sum(wmq, axis=1))        # C[q, 0]
            for ind in inds:
                rows_c.append(jnp.sum(jnp.where(ind, wmq, 0.0), axis=1))
        st = jnp.stack(rows_c, axis=1)                 # [BLK4, nb, 128]
        lane2 = jax.lax.broadcasted_iota(jnp.int32, (BLK4, nb, 128), 2)
        lq2 = lane2 // 32
        # where-selects (not mask multiplies): see packed_hist
        hs = [
            jnp.sum(jnp.where(lq2 == q, st, 0.0), axis=2) for q in range(4)
        ]                                              # each [BLK4, nb]
        return jnp.stack(hs, axis=1).reshape(BLK, nb)

    def hist_fn():
        if pack4:
            return packed_hist4()
        if narrow:
            return packed_hist() if packed else batched_hist()
        return jnp.concatenate([one_hist(k) for k in range(BLK)], axis=0)

    # whole-block skip: blocks with no valid keypoint (common tail of the
    # fixed-capacity candidate buffers) write zeros and do no window math
    @pl.when(anyv == 0)
    def _zeros():
        misc_ref[:, :] = jnp.zeros((BLK, 2 * nori), jnp.float32)
        sgx_ref[:, :] = jnp.zeros((BLK, nori * G2), jnp.float32)
        sgy_ref[:, :] = jnp.zeros((BLK, nori * G2), jnp.float32)

    @pl.when(anyv > 0)
    def _compute():
        if narrow:
            for k in range(BLK):
                build_narrow(k)
        _compute_block(
            cur_ref, flt_ref, y0g, w_true, global_h, sm_ref,
            misc_ref, sgx_ref, sgy_ref,
            (nwin if narrow else wxy), b_scr, slot, hist_fn,
            win_y=win_y, nx=nx, nb=nb, nori=nori, G=G, narrow=narrow,
            peak_ratio=peak_ratio, spacing=spacing, spc_cell=spc_cell,
        )


def _compute_block(
    cur_ref, flt_ref, y0g, w_true, global_h, sm_ref,
    misc_ref, sgx_ref, sgy_ref, win_view, b_scr, slot, hist_fn,
    *, win_y, nx, nb, nori, G, narrow, peak_ratio, spacing, spc_cell,
):
    G2 = G * G
    hist = hist_fn()

    # ---------------- smoothing + peak selection (batched) -----------------
    hh = jnp.dot(hist, sm_ref[:, :], preferred_element_type=jnp.float32)
    s = hh[:, :nb]
    l = hh[:, nb : 2 * nb]
    r = hh[:, 2 * nb :]
    mx = jnp.max(s, axis=1, keepdims=True)
    is_peak = (s > l) & (s > r) & (s >= peak_ratio * mx) & (mx > 0)
    pv = jnp.where(is_peak, s, _NEG)
    bidx = jax.lax.broadcasted_iota(jnp.int32, (BLK, nb), 1)

    thetas, haspks = [], []
    for _ in range(nori):
        m = jnp.max(pv, axis=1, keepdims=True)
        has = m > 0.5 * _NEG
        idx = jnp.min(jnp.where((pv == m) & has, bidx, nb), axis=1, keepdims=True)
        idx = jnp.minimum(idx, nb - 1)
        oh_c = (bidx == idx).astype(jnp.float32)
        oh_l = (bidx == jax.lax.rem(idx + (nb - 1), nb)).astype(jnp.float32)
        oh_r = (bidx == jax.lax.rem(idx + 1, nb)).astype(jnp.float32)
        ci = jnp.sum(s * oh_c, axis=1, keepdims=True)
        li = jnp.sum(s * oh_l, axis=1, keepdims=True)
        ri = jnp.sum(s * oh_r, axis=1, keepdims=True)
        denom = li - 2.0 * ci + ri
        d = jnp.where(jnp.abs(denom) < 1e-12, 0.0, 0.5 * (li - ri) / denom)
        th = _TWO_PI * (idx.astype(jnp.float32) + 0.5 + d) / nb
        th = th - jnp.floor(th * (1.0 / _TWO_PI)) * _TWO_PI
        thetas.append(jnp.where(has, th, 0.0))
        haspks.append(has.astype(jnp.float32))
        pv = jnp.where(bidx == idx, _NEG, pv)

    theta = jnp.concatenate(thetas, axis=1)              # [BLK, nori]
    misc_ref[:, :nori] = theta
    misc_ref[:, nori:] = jnp.concatenate(haspks, axis=1)

    # ---------------- descriptor sampling (per orientation) ----------------
    # G2 lives on the LANE axis THROUGHOUT: positions/bounds are computed on
    # [BLK, 1, G2] full-lane arrays, tents on [BLK, nx|win_y, G2], and the
    # MXU contracts the SUBLANE (column) axis — so no array in the stage is
    # lane-degenerate and nothing needs a relayout.  The previous layout put
    # G2 on sublanes: the per-sample position/rotation/bounds chain then ran
    # on [BLK, G2, 1] arrays at 1/128 lane utilization and cost 2.6 ms of
    # the 8.3 ms kernel (measured by constant-substitution probes); a
    # lane-layout chain + jnp.swapaxes relayout was tried and measured
    # WORSE (11.0 ms) — Mosaic relayouts dominate.  This layout needs none.
    half = (G - 1) / 2.0
    lane_g = jax.lax.broadcasted_iota(jnp.int32, (BLK, 1, G2), 2)
    gil = (lane_g // G).astype(jnp.float32)              # sample grid row
    gjl = jax.lax.rem(lane_g, G).astype(jnp.float32)     # sample grid col
    rows_i = jax.lax.broadcasted_iota(
        jnp.int32, (1, win_y, 1), 1).astype(jnp.float32)
    cols_i = jax.lax.broadcasted_iota(
        jnp.int32, (1, nx, 1), 1).astype(jnp.float32)

    def iv(idx):
        return _vec3([cur_ref[0, idx, k] for k in range(BLK)], jnp.int32)

    def fv(idx):
        return _vec3([flt_ref[0, idx, k] for k in range(BLK)], jnp.float32)

    wy0f = iv(1).astype(jnp.float32)
    cbf = (iv(2) + iv(7) if narrow else iv(2)).astype(jnp.float32)
    kyv = fv(0)
    kxv = fv(1)
    spc = spacing * fv(2) / spc_cell                     # [BLK, 1, 1]
    u = (gjl - half) * spc                               # [BLK, 1, G2]
    v = (gil - half) * spc

    # [BLK, WIN_Y, 2*nx]: compact per-keypoint windows (narrow) or the
    # current DMA slot of the aligned windows
    wb = (win_view[:] if narrow else win_view[slot]).astype(jnp.bfloat16)

    def sample_ori(o):
        th = _vec3([theta[k, o] for k in range(BLK)], jnp.float32)
        ct = jnp.cos(th)
        st = jnp.sin(th)
        px = kxv + ct * u - st * v                       # [BLK, 1, G2]
        py = kyv + st * u + ct * v
        inb = (
            (px >= 0.0) & (px <= (w_true - 1).astype(jnp.float32))
            & (py + y0g >= 0.0)
            & (py + y0g <= (global_h - 1).astype(jnp.float32))
        ).astype(jnp.float32)
        # column tents (bf16, MXU rhs, [BLK, nx, G2]); row tents stay a
        # VPU-side f32 temp [BLK, win_y, G2]
        b_scr[:, :, :] = (jnp.maximum(
            1.0 - jnp.abs((px - cbf) - cols_i), 0.0
        ) * inb).astype(jnp.bfloat16)
        a_t = jnp.maximum(1.0 - jnp.abs((py - wy0f) - rows_i), 0.0)
        # contract the COLUMN (sublane) axis on the MXU: [BLK, win_y, nx]
        # x [BLK, nx, G2] -> [BLK, win_y, G2] (N = G2 = 256: no MXU column
        # padding waste), then the row-tent reduction is a sublane reduce
        dn = (((2,), (1,)), ((0,), (0,)))
        u_x = jax.lax.dot_general(
            wb[:, :, :nx], b_scr[:, :, :], dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )                                                # [BLK, win_y, G2]
        u_y = jax.lax.dot_general(
            wb[:, :, nx:], b_scr[:, :, :], dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )
        sgx_ref[:, o * G2 : (o + 1) * G2] = jnp.sum(
            u_x * a_t, axis=1, dtype=jnp.float32
        )
        sgy_ref[:, o * G2 : (o + 1) * G2] = jnp.sum(
            u_y * a_t, axis=1, dtype=jnp.float32
        )

    sample_ori(0)
    for o in range(1, nori):
        # descriptor slots for orientation o >= 1 are consumed only where a
        # histogram peak exists (fused.py masks by haspk); skip the whole
        # pass when no keypoint in the block has an o-th peak (~75-85% of
        # blocks at the default peak ratio)
        any_o = jnp.max(haspks[o])

        @pl.when(any_o > 0.0)
        def _(o=o):
            sample_ori(o)

        @pl.when(any_o <= 0.0)
        def _(o=o):
            sgx_ref[:, o * G2 : (o + 1) * G2] = jnp.zeros((BLK, G2), jnp.float32)
            sgy_ref[:, o * G2 : (o + 1) * G2] = jnp.zeros((BLK, G2), jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "nori", "nb", "G", "peak_ratio", "sig_f", "rad_f", "spacing",
        "spc_cell", "win_o", "R", "margin", "win_y", "ori_span", "smax",
        "interpret",
    ),
)
def _orient_sample_impl(
    gx, gy, plane, ky, kx, sigma, valid, y0g, w_true, global_h,
    *, nori, nb, G, peak_ratio, sig_f, rad_f, spacing, spc_cell,
    win_o, R, margin, win_y, ori_span, smax, interpret,
):
    P, H, Wimg = gx.shape
    N = plane.shape[0]
    G2 = G * G
    win_x = 256

    # bf16 gradient planes: halves the dominant per-keypoint window DMA
    # (144 KB -> 72 KB per kp at the 640 geometry); production stacks are
    # already bf16 (grad_stencil), the cast covers f32 callers (benches)
    gx = gx.astype(jnp.bfloat16)
    gy = gy.astype(jnp.bfloat16)
    H2 = max(-(-H // 8) * 8, win_y)
    W2 = max(-(-Wimg // 128) * 128, win_x)
    if (H2, W2) != (H, Wimg):
        gx = jnp.pad(gx, ((0, 0), (0, H2 - H), (0, W2 - Wimg)))
        gy = jnp.pad(gy, ((0, 0), (0, H2 - H), (0, W2 - Wimg)))
    # narrow geometry rides the PACKED gradient plane: one u32 per pixel
    # (gy bf16 bits high, gx low) packed here in a cheap XLA pass, so the
    # kernel issues ONE window DMA + ONE roll per keypoint instead of two
    # of each (the per-keypoint DMA/scaffolding floor was ~2.2 ms of the
    # 4.3 ms kernel at 8192 slots)
    pack_g = margin <= 62 and win_x == 256
    if pack_g:
        to16 = lambda a: jax.lax.bitcast_convert_type(a, jnp.uint16).astype(
            jnp.uint32)
        g_in = ((to16(gy) << jnp.uint32(16)) | to16(gx),)
    else:
        g_in = (gx, gy)

    pad = (-N) % BLK
    if pad:
        plane = jnp.pad(plane, (0, pad))
        ky = jnp.pad(ky, (0, pad))
        kx = jnp.pad(kx, (0, pad))
        sigma = jnp.pad(sigma, (0, pad), constant_values=1.0)
        valid = jnp.pad(valid, (0, pad))
    Np = plane.shape[0]

    wy0 = jnp.clip(
        (jnp.floor((ky - margin) / 8.0)).astype(jnp.int32) * 8, 0, H2 - win_y
    )
    wx0 = jnp.clip(
        (jnp.floor((kx - 64.0) / 128.0)).astype(jnp.int32) * 128, 0, W2 - win_x
    )
    iy = jnp.round(ky).astype(jnp.int32)
    ix = jnp.round(kx).astype(jnp.int32)
    sy = jnp.clip(iy - R, 0, H2 - win_o)
    sx = jnp.clip(ix - R, 0, W2 - win_o)
    # narrow compute window: dynamic lane offset centering the keypoint in a
    # 128-lane window (valid whenever every contributing pixel is within
    # 62 px of the keypoint column, i.e. margin <= 62)
    narrow = margin <= 62 and win_x == 256
    co = jnp.clip(ix - wx0 - 64, 0, 128)
    # quad-packing gate: every contributing pixel's INTEGER offset from the
    # rounded center is <= floor(rad + 0.5) (|kx - ix| <= 0.5 and the circle
    # test is sharp), so 32-lane slots suffice when that bound is <= 16
    offmax = math.floor(rad_f * sig_f * smax + 0.5)
    pack4 = narrow and offmax <= 16 and BLK % 4 == 0
    if pack4:
        # rows: the circle reaches 16 either side of the rounded center ->
        # 33 rows + up to 7 rows of 8-alignment slack
        ori_span = -(-(2 * 16 + 1 + 7) // 8) * 8
        ro = jnp.clip(((iy - 16 - wy0) // 8) * 8, 0, win_y - ori_span)
    else:
        ro = jnp.clip(((sy - wy0) // 8) * 8, 0, win_y - ori_span)

    nbk = Np // BLK
    ints = jnp.stack(
        [
            a.reshape(nbk, BLK)
            for a in (plane, wy0, wx0, ro, sy, sx, valid, co, ix)
        ],
        axis=1,
    )                                                    # [nbk, 9, BLK]
    nxt = jnp.concatenate([ints[1:], jnp.zeros((1, 9, BLK), ints.dtype)])
    flts = jnp.stack(
        [a.reshape(nbk, BLK).astype(jnp.float32) for a in (ky, kx, sigma)], axis=1
    )                                                    # [nbk, 3, BLK]
    # pack4's hist rows are (quadrant, sector) CUMULATIVE sums; fold the
    # cumulative->bin difference matrix into the smoothing constant so the
    # kernel's hist @ sm_ref contraction is unchanged (`_cum_to_bin_matrix`)
    sm_np = _smooth_matrix(nb)
    if pack4:
        sm_np = _cum_to_bin_matrix(nb) @ sm_np
    sm = jnp.asarray(sm_np)
    y0g2 = jnp.stack(
        [jnp.asarray(a, jnp.int32).reshape(()) for a in (y0g, w_true, global_h)]
    ).reshape(1, 3)

    packed = (narrow and (R + 1 <= 31) and BLK % 2 == 0
              and not pack4)
    kern = functools.partial(
        _kernel,
        win_y=win_y, win_x=win_x, win_o=win_o, ori_span=ori_span, nb=nb,
        nori=nori, G=G, peak_ratio=peak_ratio, sig_f=sig_f, rad_f=rad_f,
        spacing=spacing, spc_cell=spc_cell, narrow=narrow, packed=packed,
        pack4=pack4, pack_g=pack_g,
    )
    in_specs = [
        pl.BlockSpec((1, 9, BLK), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 9, BLK), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 3, BLK), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((nb, 3 * nb), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(memory_space=pl.ANY)] * len(g_in)
    out_specs = [
        pl.BlockSpec((BLK, 2 * nori), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((BLK, nori * G2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((BLK, nori * G2), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    misc, sgx, sgy = pl.pallas_call(
        kern,
        grid=(nbk,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((Np, 2 * nori), jnp.float32),
            jax.ShapeDtypeStruct((Np, nori * G2), jnp.float32),
            jax.ShapeDtypeStruct((Np, nori * G2), jnp.float32),
        ],
        scratch_shapes=[
            (pltpu.VMEM((2, BLK, win_y, win_x), jnp.uint32) if pack_g
             else pltpu.VMEM((2, BLK, win_y, 2 * win_x), jnp.bfloat16)),
            pltpu.VMEM((BLK, 128 if narrow else win_x, G2), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, BLK if pack_g else 2 * BLK)),
        ]
        + (
            [
                pltpu.VMEM((BLK, win_y, 256), jnp.float32),
                pltpu.VMEM(
                    (BLK // 4 if pack4 else (BLK // 2 if packed else BLK),
                     ori_span, 256), jnp.float32
                ),
            ]
            if narrow
            else []
        ),
        # the double-buffered window scratch scales with BLK; the default
        # 16M scoped-vmem limit caps BLK at 8, so raise it (v5e has headroom)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        interpret=interpret,
    )(ints, nxt, flts, y0g2, sm, *g_in)
    theta = misc[:N, :nori]
    haspk = misc[:N, nori:] > 0.5
    return theta, haspk, sgx[:N], sgy[:N]


def orient_sample(
    gx: jax.Array, gy: jax.Array, plane: jax.Array,
    ky: jax.Array, kx: jax.Array, sigma: jax.Array,
    cfg, mask: jax.Array | None = None,
    y0g=None, global_h: int | None = None, w_true: int | None = None,
    interpret: bool = False,
):
    """Fused orientation + descriptor gradient sampling.

    gx, gy: [P, H, W] gradient planes (P = batch*levels); plane: [N] int32
    plane index per keypoint; ky, kx, sigma: [N] f32 keypoint geometry in
    octave-local (slab) coordinates.  mask: [N] bool keypoint validity —
    invalid keypoints skip their window DMA + compute (their outputs are
    unspecified; callers mask downstream).  y0g: traced scalar global row
    offset of slab row 0 (spatially-sharded path; 0 on a single chip);
    global_h / w_true: full-image bounds used for the out-of-image masks.

    Returns (theta [N, NORI], haspk [N, NORI] bool, sgx [N, NORI*G2],
    sgy [N, NORI*G2]) where slot 0 of theta falls back to 0.0 when the
    histogram is empty (haspk False there; caller applies mask semantics).
    """
    P, H, Wimg = gx.shape
    margin, win_y, _win_x, win_o, ori_span = window_geometry(cfg)
    if mask is None:
        mask = jnp.ones(plane.shape, bool)
    # clamp sigma to the geometry bound the window/packing math was derived
    # from: the pair-packed histogram path is only collision-free while
    # rad_f*sig_f*sigma <= orient_window_radius (contributions within
    # +-(R+1) <= 31 lanes of the keypoint); a caller-supplied sigma beyond
    # max_detect_sigma would silently cross-contaminate paired keypoints
    sigma = jnp.minimum(sigma.astype(jnp.float32), cfg.max_detect_sigma)
    return _orient_sample_impl(
        gx, gy, plane.astype(jnp.int32),
        ky.astype(jnp.float32), kx.astype(jnp.float32),
        sigma, mask.astype(jnp.int32),
        jnp.zeros((), jnp.int32) if y0g is None else y0g,
        jnp.asarray(Wimg if w_true is None else w_true, jnp.int32),
        jnp.asarray(H if global_h is None else global_h, jnp.int32),
        nori=cfg.max_orientations, nb=cfg.orientation_bins,
        G=cfg.descriptor_grid, peak_ratio=cfg.orientation_peak_ratio,
        sig_f=cfg.orientation_sigma_factor, rad_f=cfg.orientation_radius_factor,
        spacing=cfg.descriptor_spacing, spc_cell=cfg.descriptor_samples_per_cell,
        win_o=win_o, R=cfg.orient_window_radius, margin=margin,
        win_y=win_y, ori_span=ori_span, smax=float(cfg.max_detect_sigma),
        interpret=interpret,
    )
