"""Pallas TPU kernel: fused dense keypoint-score pass over the DoG volume.

TPU-native replacement for the dense half of `ProgramCU::ComputeKEY`
(SURVEY.md §2.4 item 3 ⚠ — 26-neighbor extremum test, contrast
pre-threshold, Hessian edge-ratio test).  The XLA formulation in
`frontend/detect.py` materializes ~10 full-volume intermediates (two 3x3
pools, an 8-neighbor shift reduction, four padded Hessian shifts, mask
products); at 4K that is ~45 ms of HBM traffic for what is arithmetically a
single stencil.  This kernel reads each DoG tile once (double-buffered row
slabs, halo rows re-read only at the 8-sublane alignment granularity) and
emits the two masked score planes

    smax[b, s, y, x] = |dog[b, s+1, y, x]|  if it is a strict 26-neighbor
                       MAXIMUM passing pre-threshold + edge + border tests
    smin             = same for strict minima

plus the dense per-pixel subpixel-refinement record (val, off_l, off_y,
off_x) that the top-k tail gathers per winner (4 cells instead of the
19-cell DoG patch gather this replaced).  All planes feed the shared
pooled-top-k compaction tail in `detect.py`.  Score planes are
bit-identical to the XLA path (same f32 compares and selects); record
planes agree to f32 ulps (FMA contraction differs between compilers).
Outputs are padded with zeros to (Hp, Wo) tile geometry — padded cells can
never win top-k.

Geometry: row slabs of TH rows (TH chosen so two slab buffers fit VMEM) with
8 halo rows above/below (DMA sublane alignment); the lane axis is loaded
whole with a 128-lane zero apron on each side so the dx = ±1 stencil taps
are plain static slices; compute runs in 512-lane chunks to bound register
temporaries.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["detect_scores"]

import os as _os

# lane chunk per compute step: 1920 measured best at 4K (v5e sweep 512/1024/
# 1920/3840 -> 10.0/9.5/9.1/9.5 ms at TH=16; re-checked at TH=64 after the
# round-5 budget bump: 3840 full-width still loses, 6.79 vs 6.56 ms —
# smaller chunks pay per-chunk tap set-up, full-width pushes VMEM
# temporaries)


def _read_cw() -> int:
    raw = _os.environ.get("SIFTGPU_DETECT_CW", "1920")
    try:
        v = int(raw)
    except ValueError:
        raise ValueError(
            f"SIFTGPU_DETECT_CW={raw!r}: must be an integer"
        ) from None
    # <=0 would make the chunk loop empty (uninitialized score planes) or
    # crash range(); non-multiples of 128 break the Mosaic lane alignment
    # of the per-chunk windows
    if v <= 0 or v % 128:
        raise ValueError(
            f"SIFTGPU_DETECT_CW={v}: expected a positive multiple of 128"
        )
    return v


_CW = _read_cw()
# budget for the double-buffered window scratch.  9 MB keeps TH = 64 at
# EVERY production width (4.5 MB forced TH = 16 at 4K-class Wo = 3840:
# 16 halo rows per 16-row slab re-read the whole input TWICE, and the
# [16, cw] per-op arrays paid 4x the per-op overhead of [64, cw] — the
# stencil is issue-bound, not bandwidth-bound).  Measured v5e 4K
# detect_scores: TH=16 10.5 ms -> TH=64 see CLAUDE.md round-5 table.
_WIN_BYTES = 9_000_000


def cramer_record(q, subpixel):
    """Dense subpixel-refinement record: the closed-form (Cramer) 3x3 solve
    at every pixel.  `q(dl, dy, dx)` returns the DoG tap array at that
    offset.  Returns (val, off_l, off_y, off_x, (dyy, dxx, dxy)) — the
    spatial Hessian terms are returned so the caller's edge-ratio test
    reuses them instead of recomputing (they are exactly the solve's
    d/f/e_ terms; ~12 VPU ops/px saved in the compute-bound stencil).

    SINGLE implementation consumed by BOTH the Pallas kernel and the XLA
    mirror (frontend/detect._dense_scores_xla): the bit-level contract
    between the two paths ("records agree to f32 ulps") holds only while
    they share one expression graph — keep it here, not copied."""
    vc = q(0, 0, 0)
    # spatial Hessian (needed by the edge test even when subpixel is off)
    d = q(0, 1, 0) + q(0, -1, 0) - 2 * vc
    f = q(0, 0, 1) + q(0, 0, -1) - 2 * vc
    e_ = 0.25 * (q(0, 1, 1) - q(0, 1, -1) - q(0, -1, 1) + q(0, -1, -1))
    if not subpixel:
        zero = vc * 0.0
        return vc, zero, zero, zero, (d, f, e_)
    gl = 0.5 * (q(1, 0, 0) - q(-1, 0, 0))
    gy = 0.5 * (q(0, 1, 0) - q(0, -1, 0))
    gx = 0.5 * (q(0, 0, 1) - q(0, 0, -1))
    a = q(1, 0, 0) + q(-1, 0, 0) - 2 * vc
    b_ = 0.25 * (q(1, 1, 0) - q(1, -1, 0) - q(-1, 1, 0) + q(-1, -1, 0))
    c_ = 0.25 * (q(1, 0, 1) - q(1, 0, -1) - q(-1, 0, 1) + q(-1, 0, -1))
    i00 = d * f - e_ * e_
    i01 = c_ * e_ - b_ * f
    i02 = b_ * e_ - c_ * d
    i11 = a * f - c_ * c_
    i12 = b_ * c_ - a * e_
    i22 = a * d - b_ * b_
    # detH via the first adjugate row (b_*i01 == -b_*(b_*f - c_*e_) exactly:
    # f32 negation is exact, so this is bit-identical to the expanded form
    # while reusing i00/i01/i02)
    detH = a * i00 + b_ * i01 + c_ * i02
    ok_det = jnp.abs(detH) > 1e-12
    inv_det = jnp.where(ok_det, 1.0 / jnp.where(ok_det, detH, 1.0), 0.0)
    off_l = -(i00 * gl + i01 * gy + i02 * gx) * inv_det
    off_y = -(i01 * gl + i11 * gy + i12 * gx) * inv_det
    off_x = -(i02 * gl + i12 * gy + i22 * gx) * inv_det
    val = vc + 0.5 * (gl * off_l + gy * off_y + gx * off_x)
    return val, off_l, off_y, off_x, (d, f, e_)


def _kernel(
    dog_hbm, omax_ref, omin_ref, oval_ref, ool_ref, ooy_ref, oox_ref,
    win, sems,
    *, S, nty, TH, Wo, W, ylo, yhi, thr, edge_r, subpixel,
):
    b = pl.program_id(0)
    s = pl.program_id(1)
    ty = pl.program_id(2)
    n_total = pl.num_programs(0) * S * nty
    i = (b * S + s) * nty + ty
    slot = jax.lax.rem(i, 2)
    nslot = jax.lax.rem(i + 1, 2)

    def dma(bb, ss, tt, dslot):
        return pltpu.make_async_copy(
            dog_hbm.at[bb, pl.ds(ss, 3), pl.ds(tt * TH, TH + 16), :],
            win.at[dslot], sems.at[dslot],
        )

    @pl.when(i == 0)
    def _warmup():
        dma(b, s, ty, slot).start()

    # prefetch the next grid step's slab (grid order: b slowest, ty fastest)
    t2 = jax.lax.rem(ty + 1, nty)
    carry_t = (ty + 1 == nty).astype(jnp.int32)
    s2 = jax.lax.rem(s + carry_t, S)
    carry_s = carry_t * (s + 1 == S).astype(jnp.int32)
    b2 = b + carry_s

    @pl.when(i + 1 < n_total)
    def _prefetch():
        dma(b2, s2, t2, nslot).start()

    dma(b, s, ty, slot).wait()

    edge_c = (edge_r + 1.0) ** 2 / edge_r
    for c0 in range(0, Wo, _CW):
        cw = min(_CW, Wo - c0)

        # materialize the 9 (plane, dx) tap arrays ONCE per chunk: a tap at
        # dx != 0 is a LANE-shifted load (vector rotate — the expensive op
        # here), while dy offsets are cheap sublane slices.  27 direct
        # lane-shifted tap loads made the kernel issue-bound at ~2.6 Gpx/s;
        # this form pays 6 lane shifts instead of 18 and reuses each.
        # apron: win lane 128+j holds image col j; sublane 8+i holds slab
        # row i (real row ty*TH + i)
        taps = {
            (p, dx): win[slot, p, 7 : 9 + TH,
                         128 + c0 + dx : 128 + c0 + dx + cw]
            for p in (0, 1, 2) for dx in (-1, 0, 1)
        }

        def sl(p, dy, dx):
            return taps[(p, dx)][1 + dy : 1 + dy + TH]

        v = sl(1, 0, 0)
        # separable 26-neighbor reduction: horizontal 3-tap max/min per
        # plane on the full (TH+2)-row tap arrays, vertical 3-tap via row
        # slides, center row of the center plane from the dx=±1 taps only.
        # Same value set as the flat 25-op loop (max/min are order-free),
        # so the score planes stay bit-identical — at 30 VPU ops instead
        # of 50 in the issue-bound stencil.
        def sep(op):
            h = {
                p: op(op(taps[(p, -1)], taps[(p, 0)]), taps[(p, 1)])
                for p in (0, 1, 2)
            }

            def vrow(a, dy):
                return a[1 + dy : 1 + dy + TH]

            full0 = op(op(vrow(h[0], -1), vrow(h[0], 0)), vrow(h[0], 1))
            full2 = op(op(vrow(h[2], -1), vrow(h[2], 0)), vrow(h[2], 1))
            hcen = op(taps[(1, -1)], taps[(1, 1)])
            m8 = op(op(vrow(h[1], -1), vrow(h[1], 1)), vrow(hcen, 0))
            return op(op(full0, full2), m8)

        nmax = sep(jnp.maximum)
        nmin = sep(jnp.minimum)

        pre = jnp.abs(v) > 0.8 * thr
        is_max = (v > 0) & (v > nmax) & pre
        is_min = (v < 0) & (v < nmin) & pre

        # --- dense subpixel-refinement RECORD: the Cramer solve at every
        # pixel (shared `cramer_record` — the 27 taps are already in VMEM).
        # Emitting (val, off_l, off_y, off_x) per pixel lets the top-k tail
        # gather 4 record cells per winner instead of 19 DoG patch cells —
        # the per-element gather cost (~11-15 ns on v5e) dominated detect.
        # The solve's spatial-Hessian terms double as the edge test's
        # dyy/dxx/dxy (identical expressions, computed once).
        val, off_l, off_y, off_x, (dyy, dxx, dxy) = cramer_record(
            lambda dl, dy, dx: sl(dl + 1, dy, dx), subpixel
        )

        # Hessian edge-ratio test on the center DoG slice (same expressions
        # as detect.py so results match bit-for-bit)
        tr = dxx + dyy
        det = dxx * dyy - dxy * dxy
        edge_ok = (det > 0) & (tr * tr / jnp.where(det > 0, det, 1.0) < edge_c)

        rows = jax.lax.broadcasted_iota(jnp.int32, (TH, cw), 0) + ty * TH
        cols = jax.lax.broadcasted_iota(jnp.int32, (TH, cw), 1) + c0
        keep = (
            edge_ok
            & (rows >= ylo) & (rows <= yhi)
            & (cols >= 1) & (cols <= W - 2)
        )
        # pack the 2x2-block corner index into the two low mantissa bits
        # (mirrors detect._pack_corner; winner position survives the pooled
        # top-k so the tail needs no corner gather)
        par = (rows & 1) * 2 + (cols & 1)
        av = jax.lax.bitcast_convert_type(jnp.abs(v), jnp.int32)
        av = (av & ~3) | par
        zero = jnp.zeros_like(av)
        # score planes are emitted ROW-POOLED (max over row pairs via a
        # sublane-split reshape — Mosaic rejects strided slices, but a
        # second-minor reshape + reduce is legal): halves the score-plane
        # HBM traffic and half of the downstream 2x2 reduce_window work
        # (1.6 ms of the 4K budget).  The winner's within-block corner
        # already rides in the low mantissa bits, so pooling order doesn't
        # lose position.  Lane pairs are pooled downstream (detect.py).
        sm_full = jax.lax.bitcast_convert_type(
            jnp.where(is_max & keep, av, zero), jnp.float32
        )
        sn_full = jax.lax.bitcast_convert_type(
            jnp.where(is_min & keep, av, zero), jnp.float32
        )
        omax_ref[0, 0, :, pl.ds(c0, cw)] = jnp.max(
            sm_full.reshape(TH // 2, 2, cw), axis=1
        )
        omin_ref[0, 0, :, pl.ds(c0, cw)] = jnp.max(
            sn_full.reshape(TH // 2, 2, cw), axis=1
        )

        oval_ref[0, 0, :, pl.ds(c0, cw)] = val
        ool_ref[0, 0, :, pl.ds(c0, cw)] = off_l
        ooy_ref[0, 0, :, pl.ds(c0, cw)] = off_y
        oox_ref[0, 0, :, pl.ds(c0, cw)] = off_x


@functools.partial(
    jax.jit,
    static_argnames=("ylo", "yhi", "thr", "edge_r", "subpixel", "interpret"),
)
def _detect_scores_impl(dog, *, ylo, yhi, thr, edge_r, subpixel, interpret):
    B, L, H, W = dog.shape
    S = L - 2
    Wo = -(-W // 128) * 128
    # slab height: two (3, TH+16, Wo+256) f32 buffers within budget; TH is a
    # multiple of 16 so the row-pooled score blocks keep 8-sublane alignment
    th_fit = _WIN_BYTES // (24 * (Wo + 256)) - 16
    TH = max(16, min(64, (th_fit // 16) * 16, -(-H // 16) * 16))
    nty = -(-H // TH)
    Hp = nty * TH

    dogp = jnp.pad(
        dog.astype(jnp.float32),
        ((0, 0), (0, 0), (8, Hp - H + 8), (128, Wo - W + 128)),
    )
    kern = functools.partial(
        _kernel, S=S, nty=nty, TH=TH, Wo=Wo, W=W,
        ylo=ylo, yhi=yhi, thr=thr, edge_r=edge_r, subpixel=subpixel,
    )
    out_spec = pl.BlockSpec(
        (1, 1, TH, Wo), lambda b, s, t: (b, s, t, 0), memory_space=pltpu.VMEM
    )
    half_spec = pl.BlockSpec(
        (1, 1, TH // 2, Wo), lambda b, s, t: (b, s, t, 0),
        memory_space=pltpu.VMEM,
    )
    plane = jax.ShapeDtypeStruct((B, S, Hp, Wo), jnp.float32)
    half = jax.ShapeDtypeStruct((B, S, Hp // 2, Wo), jnp.float32)
    outs = pl.pallas_call(
        kern,
        grid=(B, S, nty),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[half_spec, half_spec] + [out_spec] * 4,
        out_shape=[half, half] + [plane] * 4,
        scratch_shapes=[
            pltpu.VMEM((2, 3, TH + 16, Wo + 256), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # 6 output blocks + the double-buffered input slab exceed the 16M
        # default scoped-vmem budget at 4K-class widths
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(dogp)
    return tuple(outs)


def detect_scores(dog, cfg, owned_rows=None, interpret: bool = False):
    """dog: [B, S+2, H, W] DoG volume.  Returns 6 planes: (smax, smin)
    ROW-POOLED masked per-type candidate scores [B, S, Hp/2, Wo] (max over
    row pairs; zero outside the valid region and on tile padding — the
    consumer pools lane pairs) and the dense subpixel-refinement record
    (val, off_l, off_y, off_x) [B, S, Hp, Wo] — the Cramer-solve outputs of
    EVERY pixel, gathered per winner by the top-k tail (replaces the
    19-cell DoG patch gather).  `owned_rows=(lo, hi)` restricts candidates to rows
    [lo, hi) — both must be static ints (the spatially-sharded path passes
    per-shard slab constants)."""
    H = dog.shape[2]
    lo, hi = owned_rows if owned_rows is not None else (0, H)
    return _detect_scores_impl(
        dog,
        ylo=max(1, int(lo)), yhi=min(H - 2, int(hi) - 1),
        thr=float(cfg.dog_threshold), edge_r=float(cfg.edge_threshold),
        subpixel=bool(cfg.subpixel),
        interpret=interpret,
    )
