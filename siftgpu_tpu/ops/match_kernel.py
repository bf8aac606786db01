"""Pallas TPU kernel: fused descriptor-match reduction (best-2 + col argmax).

TPU-native replacement for the *entire* `SiftMatchGPU` hot path —
`ProgramCU::MultiplyDescriptor` + `GetRowMatch`/`GetColMatch` (SURVEY.md
§2.4 items 7-8 ⚠) — in ONE kernel.  The XLA form materializes the [N0, N1]
f32 similarity matrix in HBM (1 GB at 16k x 16k) and re-reads it for every
argmax/knockout pass, so it runs at HBM speed (~8.5 ms at 16k).  Here each
[TM, TN] similarity tile lives only in VMEM: the MXU produces it, the VPU
immediately reduces it into running per-row (best, second, argbest) and
per-column (best-row) accumulators, and only O(N0 + N1) vectors ever reach
HBM.  The matmul rides the MXU in bf16: uint8 descriptor values (0..255)
are exact in bf16 (8 significand bits) and the 128-term integer dot stays
< 2^23, so f32 accumulation is bit-exact — single-pass bf16 IS the integer
dot, no recentering or multi-pass emulation needed.

Bit-parity contract with the XLA mirror (`frontend/match._u8_sim` + dense
selection): similarities are formed as `(dot * rn1[None, :]) * rn0[:, None]`
(same f32 rounding order), masked entries are -inf, row/column ties resolve
to the lowest index (argmax semantics) — the mirror and this kernel return
identical selections and identical f32 winner similarities.

Grid: (ni, nj) row tiles x column tiles, row-major (column index innermost).
Row accumulators reset at j == 0 and flush to [N0, 1] outputs at j == nj-1;
column accumulators live in a [nj, 1, TN] scratch merged across row tiles
(dynamic indexing on the major dim only — Mosaic allows no dynamic lane
offsets) and flush per visit, so the final (i == ni-1) flush wins.

GUIDED variant (`ProgramCU::MultiplyDescriptorG`, SURVEY.md §2.4 item 8 ⚠
"same kernel with H/F distance gating fused in"): optional per-row /
per-column gate operands — the homography-projected keypoint (px, py) and
the normalized epipolar-line coefficients — let each tile compute its
reprojection / symmetric-epipolar gate in VMEM and fold it into the
validity mask BEFORE the reduction, so the guided matcher keeps the
O(N0 + N1) HBM property (the [N0, N1] gate matrices never materialize).
All pairwise gate terms are rank-1 (row ⊗ col broadcasts): the O(N0 x N1)
part of both gates decomposes exactly, which is what makes the fusion
free — only O(N) projected coordinates enter the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["match_best2"]

# v5e deep-queue sweep (2026-08-21, ms, N x N uint8): 512x2048 vs 256x1024
# tiles: 8k 0.55/1.31, 16k 1.84/2.06, 32k 5.64/6.45 — large tiles amortize
# the per-step grid overhead; sim tile 512x2048 f32 = 4 MB VMEM still fits
# alongside the double-buffered input windows.
_TM = 512      # rows per tile
_TN = 2048     # columns per tile
# python literals, not jnp values: traced jnp constants would be captured
# by the kernel closure, which pallas_call rejects
_BIG = 2**30
_NEG = float("-inf")


def _kernel(*refs, ni, nj, gate, h2, fthr, ng):
    (d0_ref, d1_ref, rn0_ref, rn1_ref, m0_ref, m1_ref) = refs[:6]
    grefs = refs[6:6 + ng]
    bs_ref, ss_ref, bj_ref, ci_ref = refs[6 + ng:10 + ng]
    rbest_s, rsec_s, rj_s, cval_s, cidx_s = refs[10 + ng:]
    i = pl.program_id(0)
    j = pl.program_id(1)
    TM, TN = rbest_s.shape[0], cval_s.shape[2]

    # rhs-transposed contraction: d1 tiles arrive [TN, 128] (natural
    # descriptor layout) and the MXU contracts both lane dims — no XLA
    # [N1, 128] -> [128, N1] transpose prologue (a full relayout that cost
    # ~0.25 ms of the 16k program; 2.28 -> 2.02 ms end-to-end measured)
    dot = jax.lax.dot_general(
        d0_ref[...], d1_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [TM, TN]
    # same rounding order as the XLA mirror: (dot * rn1) * rn0
    sim = (dot * rn1_ref[...]) * rn0_ref[...]
    valid = (m0_ref[...] > 0) & (m1_ref[...] > 0)            # [TM,1]&[1,TN]
    if gate:
        # operand layout (see match_best2): H rows [px, py], F rows
        # [lax, lay, laz, x0x, x0y], then cols [x1, y1] (+ F cols
        # [lbx, lby, lbz]).  Same elementary-op order as the XLA mirror
        # gates (frontend/match._homography_gate/_epipolar_gate).
        k = 0
        if "h" in gate:
            px, py = grefs[k][...], grefs[k + 1][...]
            k += 2
        if "f" in gate:
            la_x, la_y, la_z = (grefs[k][...], grefs[k + 1][...],
                                grefs[k + 2][...])
            x0x, x0y = grefs[k + 3][...], grefs[k + 4][...]
            k += 5
        gx1, gy1 = grefs[k][...], grefs[k + 1][...]
        k += 2
        if "h" in gate:
            dx = px - gx1
            dy = py - gy1
            valid &= dx * dx + dy * dy < h2
        if "f" in gate:
            lb_x, lb_y, lb_z = (grefs[k][...], grefs[k + 1][...],
                                grefs[k + 2][...])
            da = jnp.abs(la_x * gx1 + la_y * gy1 + la_z)
            db = jnp.abs(x0x * lb_x + x0y * lb_y + lb_z)
            valid &= jnp.maximum(da, db) < fthr
    sim = jnp.where(valid, sim, _NEG)

    # ---- row side: best-2 + argbest within the tile, merged across j ----
    r1 = jnp.max(sim, axis=1, keepdims=True)                 # [TM, 1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (TM, TN), 1)
    ridx = jnp.min(jnp.where(sim == r1, cols, _BIG), axis=1, keepdims=True)
    r2 = jnp.max(jnp.where(cols == ridx, _NEG, sim), axis=1, keepdims=True)
    gidx = ridx + j * TN

    @pl.when(j == 0)
    def _reset_rows():
        rbest_s[...] = r1
        rsec_s[...] = r2
        rj_s[...] = gidx

    @pl.when(j > 0)
    def _merge_rows():
        best, sec, bj = rbest_s[...], rsec_s[...], rj_s[...]
        # disjoint-candidate top-2 merge; strict > keeps the earlier
        # (lower-index) winner on ties, matching dense argmax
        rbest_s[...] = jnp.maximum(best, r1)
        rsec_s[...] = jnp.maximum(jnp.maximum(sec, r2), jnp.minimum(best, r1))
        rj_s[...] = jnp.where(r1 > best, gidx, bj)

    @pl.when(j == nj - 1)
    def _flush_rows():
        bs_ref[...] = rbest_s[...]
        ss_ref[...] = rsec_s[...]
        bj_ref[...] = rj_s[...]

    # ---- column side: running argmax over rows, merged across i ----
    c1 = jnp.max(sim, axis=0, keepdims=True)                 # [1, TN]
    rows = jax.lax.broadcasted_iota(jnp.int32, (TM, TN), 0)
    ci = jnp.min(jnp.where(sim == c1, rows, _BIG), axis=0, keepdims=True)
    ci = ci + i * TM

    @pl.when(i == 0)
    def _reset_cols():
        cval_s[j] = c1
        cidx_s[j] = ci

    @pl.when(i > 0)
    def _merge_cols():
        old_v, old_i = cval_s[j], cidx_s[j]
        upd = c1 > old_v
        cval_s[j] = jnp.where(upd, c1, old_v)
        cidx_s[j] = jnp.where(upd, ci, old_i)

    # block (0, j) is revisited once per row tile; every visit flushes the
    # running value, so the final (i == ni-1) flush is the true argmax
    ci_ref[...] = cidx_s[j]


@functools.partial(
    jax.jit, static_argnames=("interpret", "tm", "tn", "gate", "h2", "fthr")
)
def _match_best2_impl(d0, d1, rn0, rn1, m0, m1, gate_rows=(), gate_cols=(),
                      *, gate="", h2=0.0, fthr=0.0, interpret, tm=_TM,
                      tn=_TN):
    _TM, _TN = tm, tn
    n0, n1 = d0.shape[0], d1.shape[0]
    p0 = (-n0) % _TM
    p1 = (-n1) % _TN
    d0b = jnp.pad(d0, ((0, p0), (0, 0))).astype(jnp.bfloat16)
    d1b = jnp.pad(d1, ((0, p1), (0, 0))).astype(jnp.bfloat16)   # [N1p, 128]
    rn0c = jnp.pad(rn0, (0, p0)).reshape(-1, 1)                  # [N0p, 1]
    m0c = jnp.pad(m0.astype(jnp.float32), (0, p0)).reshape(-1, 1)
    rn1r = jnp.pad(rn1, (0, p1)).reshape(1, -1)                  # [1, N1p]
    m1r = jnp.pad(m1.astype(jnp.float32), (0, p1)).reshape(1, -1)
    n0p, n1p = n0 + p0, n1 + p1
    ni, nj = n0p // _TM, n1p // _TN

    grow = [jnp.pad(g.astype(jnp.float32), (0, p0)).reshape(-1, 1)
            for g in gate_rows]
    gcol = [jnp.pad(g.astype(jnp.float32), (0, p1)).reshape(1, -1)
            for g in gate_cols]
    gate_ops = grow + gcol
    gate_specs = (
        [pl.BlockSpec((_TM, 1), lambda i, j: (i, 0)) for _ in grow]
        + [pl.BlockSpec((1, _TN), lambda i, j: (0, j)) for _ in gcol]
    )

    kern = functools.partial(_kernel, ni=ni, nj=nj, gate=gate, h2=h2,
                             fthr=fthr, ng=len(gate_ops))
    bs, ss, bj, ci = pl.pallas_call(
        kern,
        grid=(ni, nj),
        in_specs=[
            pl.BlockSpec((_TM, 128), lambda i, j: (i, 0)),
            pl.BlockSpec((_TN, 128), lambda i, j: (j, 0)),
            pl.BlockSpec((_TM, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((1, _TN), lambda i, j: (0, j)),
            pl.BlockSpec((_TM, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((1, _TN), lambda i, j: (0, j)),
        ] + gate_specs,
        out_specs=[
            pl.BlockSpec((_TM, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((_TM, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((_TM, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((1, _TN), lambda i, j: (0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n0p, 1), jnp.float32),
            jax.ShapeDtypeStruct((n0p, 1), jnp.float32),
            jax.ShapeDtypeStruct((n0p, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, n1p), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((_TM, 1), jnp.float32),
            pltpu.VMEM((_TM, 1), jnp.float32),
            pltpu.VMEM((_TM, 1), jnp.int32),
            pltpu.VMEM((nj, 1, _TN), jnp.float32),
            pltpu.VMEM((nj, 1, _TN), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(d0b, d1b, rn0c, rn1r, m0c, m1r, *gate_ops)
    return bs[:n0, 0], ss[:n0, 0], bj[:n0, 0], ci[0, :n1]


def match_best2(d0, d1, rn0, rn1, m0, m1, *, gate: str = "",
                gate_rows=(), gate_cols=(), h2: float = 0.0,
                fthr: float = 0.0, interpret: bool = False,
                tm: int = _TM, tn: int = _TN):
    """Fused best-2 match reduction on uint8 descriptors.

    d0: [N0, 128] uint8, d1: [N1, 128] uint8, rn0/rn1: [N] f32 reciprocal
    L2 norms, m0/m1: [N] bool validity masks.  Returns
    (bsim [N0], ssim [N0], bestj [N0] i32, col_best_i [N1] i32) — the
    per-row best/second similarities + argbest and the per-column best row,
    exactly as the dense XLA selection computes them (masked = -inf).

    Guided gating (`gate` in {"h", "f", "hf"}): `gate_rows` / `gate_cols`
    carry per-keypoint [N] f32 operands in this order —
      rows: H -> [px, py] (H-projected loc0, frontend/match._h_parts);
            F -> [la_x, la_y, la_z, x0x, x0y] (normalized epiline in
            image 1 + raw loc0, frontend/match._f_parts_rows);
      cols: [x1, y1] always, then F -> [lb_x, lb_y, lb_z]
            (frontend/match._f_parts_cols).
    `h2` = hdist_max^2 (squared-reprojection threshold), `fthr` =
    fdist_max (symmetric epipolar distance).  Pairs failing a gate are
    masked to -inf before the reduction, identically to the XLA mirror.
    """
    return _match_best2_impl(d0, d1, rn0, rn1, m0, m1,
                             tuple(gate_rows), tuple(gate_cols),
                             gate=gate, h2=h2, fthr=fthr,
                             interpret=interpret, tm=tm, tn=tn)
