"""Pallas TPU kernel: fused multi-level Gaussian pyramid + DoG for one octave.

TPU-native replacement for the per-level banded-matmul blur chain
(`PyramidCU::BuildPyramid` / `ProgramCU::FilterH/FilterV`, SURVEY.md §3.1 hot
loop 1 ⚠ — the reference runs one H and one V filter kernel per level with
every intermediate bouncing through texture memory).  The XLA formulation in
`frontend/pyramid.py` does the same through HBM: each of the S+2 incremental
blurs reads and writes the full plane twice (row pass + column pass), plus a
separate DoG subtraction — ~13 full-plane round trips per octave.  This
kernel processes the octave in row slabs: ONE DMA of the base slab (with a
cumulative-radius halo), all S+2 levels and all S+2 DoG planes computed in
VMEM, one write per output plane.

Both convolution directions are banded matmuls on the MXU (a VPU
shifted-FMA row pass was measured compute-bound: 27 f32 taps over the slab
cost more than the banded matmul's 8-14x zero-padding waste at MXU rates):

  - rows: one square [rows, rows] band matrix per level (rows = slab height
    including halo), contracted against the whole slab — out-of-band rows
    compute garbage-but-finite values that the shrinking valid region never
    reads;
  - columns: per-128-lane-tile [384, 128] band matrices (the dense-band
    tile geometry the XLA path measured fastest), with replicate-edge
    clamping folded into the boundary tiles' matrices;
  - precision: Mosaic has no HIGH dot, so the 3-pass bf16 f32-emulation is
    hand-rolled (hi*hi + lo*hi + hi*lo with hi/lo bf16 splits of both
    operands) — the same error class as the XLA path's HIGH banded matmuls.

Per-level replicate-edge semantics on rows: boundary slabs overwrite their
out-of-image margin rows with the edge row after each level, so level s+1's
taps read "replicate of blurred" exactly like the sequential XLA path (NOT
"blur of replicated base", which differs near borders).

Grid: (B, nty) row slabs, double-buffered manual DMA (same pattern as
ops/detect_scores.py).  Outputs are (gauss [B, L, H, W], dog [B, L-1, H, W]);
the implementation pads to tile geometry internally and slices the true dims.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["blur_octave_fused"]

import os as _os

_TW = int(_os.environ.get("SIFTGPU_PYR_TW", "128"))
                   # column-conv lane tile: [TW+256, TW] band per tile; 128
                   # keeps the band densest (the XLA path measured 128 beat
                   # 256/512 for the same reason — half the wasted MXU FLOPs)
                   # but costs more per-dot setup; sweep via env
_TH = int(_os.environ.get("SIFTGPU_PYR_TH", "128"))
                   # output rows per slab (multiple of 8; bounds the
                   # double-buffered 11-plane output block + slab buffers)

# Tile kinds for the column band matrices: interior tiles share one
# clip-free matrix; the first tile and the last TWO tiles may clamp column
# indices at an image edge (window reach is TW + 128 > W - c0 there).
_KINDS = 4  # 0: t==0, 1: interior, 2: t==ntx-2, 3: t==ntx-1


def _kind_of_tile(t: int, ntx: int) -> int:
    if t == 0:
        return 0
    if t == ntx - 1:
        return 3
    if t == ntx - 2:
        return 2
    return 1


def _split_hi_lo(x: np.ndarray):
    """hi/lo bf16 split of an f32 constant.  PURE numpy (ml_dtypes): this
    runs while an outer jit may be tracing, where any jnp op would produce
    a tracer that cannot be cached or converted back to numpy."""
    import ml_dtypes

    x = np.asarray(x, np.float32)
    hi = x.astype(ml_dtypes.bfloat16)
    lo = (x - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return hi, lo


def _col_band_matrices(taps_list, W: int, ntx: int):
    """[L-1, 4, TW+256, TW] column-conv band matrices (hi/lo bf16 pair),
    replicate padding folded into clamped column indices (same construction
    as pyramid._band_matrix, windowed).  Interior tiles are clip-free by
    the geometry bound W > ntx*TW - TW (Wo - W < 128)."""
    L1 = len(taps_list)
    A = np.zeros((L1, _KINDS, _TW + 256, _TW), np.float32)
    tile_of_kind = [0, 1, max(ntx - 2, 0), max(ntx - 1, 0)]
    jj = np.arange(_TW + 256)[:, None]
    cc = np.arange(_TW)[None, :]
    for s, taps in enumerate(taps_list):
        r = (len(taps) - 1) // 2
        assert r <= 128, r
        for kind in range(_KINDS):
            c0 = tile_of_kind[kind] * _TW
            for k in range(len(taps)):
                tgt = np.clip(c0 + cc + (k - r), 0, W - 1) - c0 + 128
                A[s, kind] += np.float32(taps[k]) * (jj == tgt)
    return _split_hi_lo(A)


def _row_band_matrices(taps_list, rows: int):
    """[L-1, rows, rows] square row-conv band matrices (hi/lo bf16 pair):
    M[i, j] = taps[j - i + r].  No clamping — margin rows are maintained by
    the slab's replicate invariant, and out-of-band boundary rows produce
    garbage-but-finite values outside every level's valid region."""
    L1 = len(taps_list)
    M = np.zeros((L1, rows, rows), np.float32)
    ii = np.arange(rows)[:, None]
    jj = np.arange(rows)[None, :]
    for s, taps in enumerate(taps_list):
        r = (len(taps) - 1) // 2
        d = jj - ii + r
        for k in range(len(taps)):
            M[s] += np.float32(taps[k]) * (d == k)
    return _split_hi_lo(M)


def _dot3(x, a_hi, a_lo, transpose_x=False):
    """3-pass bf16 emulation of an f32 matmul x @ A (HIGH class):
    hi*hi + lo*hi + hi*lo, f32 accumulation."""
    x_hi = x.astype(jnp.bfloat16)
    x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))
    f = functools.partial(
        jax.lax.dot_general, dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )
    return f(x_hi, a_hi) + (f(x_lo, a_hi) + f(x_hi, a_lo))


def _kernel(
    base_hbm, mhi_ref, mlo_ref, ahi_ref, alo_ref, gauss_ref, dog_ref,
    win, buf, tmp, sems,
    *, L, nty, ntx, TH, R8, SW, Wo, H, radii, cums,
):
    b = pl.program_id(0)
    ty = pl.program_id(1)
    n_total = pl.num_programs(0) * nty
    i = b * nty + ty
    slot = jax.lax.rem(i, 2)
    nslot = jax.lax.rem(i + 1, 2)
    rows = TH + 2 * R8

    def dma(bb, tt, dslot):
        return pltpu.make_async_copy(
            base_hbm.at[bb, pl.ds(tt * TH, rows), :],
            win.at[dslot], sems.at[dslot],
        )

    @pl.when(i == 0)
    def _warmup():
        dma(b, ty, slot).start()
        # NaN hygiene: the ping-pong buffers enter the band matmuls wholesale
        # (zero band coefficients still propagate NaN); one zero-fill on the
        # first grid step makes every later stale value finite
        buf[0] = jnp.zeros((rows, SW), jnp.float32)
        buf[1] = jnp.zeros((rows, SW), jnp.float32)

    t2 = jax.lax.rem(ty + 1, nty)
    b2 = b + (ty + 1 == nty).astype(jnp.int32)

    @pl.when(i + 1 < n_total)
    def _prefetch():
        dma(b2, t2, nslot).start()

    dma(b, ty, slot).wait()

    # slab-local row index of global image rows 0 / H-1 (static; only the
    # boundary slabs refresh margins)
    top_edge = R8
    bot_edge = H - 1 - (nty - 1) * TH + R8

    prev_g = win[slot, pl.ds(R8, TH), pl.ds(128, Wo)]
    gauss_ref[0, 0] = prev_g

    prev_buf = -1  # -1 => level 0 lives in win[slot]
    for s in range(1, L):
        lo, hi = cums[s], rows - cums[s]
        n = hi - lo

        # --- row conv: square band matmul over the whole slab (3-pass) ---
        cur = win[slot] if prev_buf < 0 else buf[prev_buf]
        # contraction over the slab's SUBLANE axis: M[rows, rows] @ cur
        tmp[:, :] = _row_dot3(mhi_ref[s - 1], mlo_ref[s - 1], cur)

        # --- col conv: banded matmul per lane tile into the pong buffer ---
        dst = (s - 1) % 2
        for t in range(ntx):
            kind = _kind_of_tile(t, ntx)
            wnd = tmp[:, pl.ds(t * _TW, _TW + 256)]
            buf[dst, :, pl.ds(128 + t * _TW, _TW)] = _dot3(
                wnd, ahi_ref[s - 1, kind], alo_ref[s - 1, kind]
            )

        # --- per-level replicate-edge refresh on boundary slabs ---
        if top_edge - lo > 0:
            @pl.when(ty == 0)
            def _top(dst=dst, lo=lo):
                buf[dst, pl.ds(lo, top_edge - lo), :] = jnp.broadcast_to(
                    buf[dst, pl.ds(top_edge, 1), :], (top_edge - lo, SW)
                )
        nbot = hi - (bot_edge + 1)
        if nbot > 0:
            @pl.when(ty == nty - 1)
            def _bot(dst=dst, nbot=nbot):
                buf[dst, pl.ds(bot_edge + 1, nbot), :] = jnp.broadcast_to(
                    buf[dst, pl.ds(bot_edge, 1), :], (nbot, SW)
                )

        g = buf[dst, pl.ds(R8, TH), pl.ds(128, Wo)]
        gauss_ref[0, s] = g
        dog_ref[0, s - 1] = g - prev_g
        prev_g = g
        prev_buf = dst


def _row_dot3(m_hi, m_lo, cur):
    """3-pass M @ cur with M pre-split (bf16 pair) and cur split here."""
    c_hi = cur.astype(jnp.bfloat16)
    c_lo = (cur - c_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))
    f = functools.partial(
        jax.lax.dot_general, dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )
    return f(m_hi, c_hi) + (f(m_hi, c_lo) + f(m_lo, c_hi))


@functools.partial(jax.jit, static_argnames=("taps_key", "interpret"))
def _blur_octave_impl(base, m_hi, m_lo, a_hi, a_lo, *, taps_key, interpret):
    taps_list = _TAPS_REGISTRY[taps_key]
    B, H, W = base.shape
    L = len(taps_list) + 1
    radii = tuple((len(t) - 1) // 2 for t in taps_list)
    cums = (0,) + tuple(int(c) for c in np.cumsum(radii))
    R8 = -(-cums[-1] // 8) * 8
    TH = min(_TH, -(-H // 8) * 8)
    nty = -(-H // TH)
    Wo = -(-W // 128) * 128
    ntx = -(-Wo // _TW)
    SW = ntx * _TW + 256
    rows = TH + 2 * R8

    # pre-pad: R8 replicate rows top/bottom (level-0 margin invariant) and
    # replicate lane fill (left apron + right fill to SW); edge-mode keeps
    # every slab lane finite
    bp = jnp.pad(base.astype(jnp.float32), ((0, 0), (R8, R8), (0, 0)),
                 mode="edge")
    bp = jnp.pad(bp, ((0, 0), (0, nty * TH + 2 * R8 - bp.shape[1]), (0, 0)),
                 mode="edge")
    bp = jnp.pad(bp, ((0, 0), (0, 0), (128, SW - 128 - W)), mode="edge")

    kern = functools.partial(
        _kernel, L=L, nty=nty, ntx=ntx, TH=TH, R8=R8, SW=SW, Wo=Wo, H=H,
        radii=radii, cums=cums,
    )
    g_spec = pl.BlockSpec((1, L, TH, Wo), lambda b, t: (b, 0, t, 0),
                          memory_space=pltpu.VMEM)
    d_spec = pl.BlockSpec((1, L - 1, TH, Wo), lambda b, t: (b, 0, t, 0),
                          memory_space=pltpu.VMEM)

    def const_spec(x):
        return pl.BlockSpec(x.shape, lambda b, t: (0,) * x.ndim,
                            memory_space=pltpu.VMEM)

    gauss, dog = pl.pallas_call(
        kern,
        grid=(B, nty),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  const_spec(m_hi), const_spec(m_lo),
                  const_spec(a_hi), const_spec(a_lo)],
        out_specs=[g_spec, d_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, L, nty * TH, Wo), jnp.float32),
            jax.ShapeDtypeStruct((B, L - 1, nty * TH, Wo), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, rows, SW), jnp.float32),   # DMA slabs
            pltpu.VMEM((2, rows, SW), jnp.float32),   # level ping-pong
            pltpu.VMEM((rows, SW), jnp.float32),      # row-conv temp
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(bp, m_hi, m_lo, a_hi, a_lo)
    return gauss[:, :, :H, :W], dog[:, :, :H, :W]


_TAPS_REGISTRY: dict = {}
_BAND_CACHE: dict = {}


def blur_octave_fused(base, taps_list, interpret: bool = False):
    """base: [B, H, W] octave base (already blurred to level 0's sigma).
    taps_list: per-level incremental Gaussian taps (numpy, from
    `SiftConfig.gaussian_taps`).  Returns (gauss [B, L, H, W],
    dog [B, L-1, H, W]) matching the sequential `blur_separable` chain to
    banded-matmul emulation error (HIGH class, low-1e-5)."""
    key = tuple(np.asarray(t, np.float32).tobytes() for t in taps_list)
    if key not in _TAPS_REGISTRY:
        _TAPS_REGISTRY[key] = tuple(np.asarray(t, np.float32) for t in taps_list)
    _, H, W = base.shape
    Wo = -(-W // 128) * 128
    ntx = -(-Wo // _TW)
    radii = [(len(t) - 1) // 2 for t in _TAPS_REGISTRY[key]]
    R8 = -(-sum(radii) // 8) * 8
    TH = min(_TH, -(-H // 8) * 8)
    rows = TH + 2 * R8
    bkey = (key, W, rows)
    if bkey not in _BAND_CACHE:
        # cache NUMPY (a jnp array built under an outer jit would cache a
        # tracer); jit treats the ndarray args as constant-shaped operands
        a_hi, a_lo = _col_band_matrices(_TAPS_REGISTRY[key], W, ntx)
        m_hi, m_lo = _row_band_matrices(_TAPS_REGISTRY[key], rows)
        _BAND_CACHE[bkey] = (m_hi, m_lo, a_hi, a_lo)
    m_hi, m_lo, a_hi, a_lo = (jnp.asarray(x) for x in _BAND_CACHE[bkey])
    return _blur_octave_impl(
        base, m_hi, m_lo, a_hi, a_lo, taps_key=key, interpret=interpret
    )
