"""Pallas TPU kernel: batched bilinear gradient sampling at per-keypoint
rotated grids — the descriptor stage's hot gather (SURVEY.md §2.4 item 6).

XLA lowers the per-sample bilinear gather to element gathers that run ~1000x
off HBM bandwidth on TPU (measured: 181 ms/frame at 640x480, 71% of the whole
pipeline).  This kernel does it the TPU way:

  - keypoint window coordinates ride in SMEM (scalar block per grid step);
  - each keypoint's gradient patch is DMA'd HBM -> VMEM with dynamic
    (tile-aligned) offsets, double-buffered ACROSS grid steps: block i+1's
    patches stream in while block i computes;
  - bilinear interpolation of all G^2 samples is dense work per patch: a
    [G^2, WIN_Y] x [WIN_Y, WIN_X] tent-weight matmul on the MXU (row
    interpolation) and a row-reduction against the column tents on the VPU —
    tent weights ARE linear interpolation, so results match the XLA gather
    path up to f32 reassociation (tests/test_pallas_ops.py).

Patch geometry: TPU DMA offsets must be tile-aligned (8 sublanes x 128
lanes), so window origins snap down to the tile grid and the window is sized
to cover the max descriptor radius (~40 px) from any center:
  rows: y0 = 8*floor((cy-44)/8),    96 rows -> margins >= 44
  cols: x0 = 128*floor((cx-64)/128), 256 cols -> margins >= 64
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["sample_gradients", "WIN_Y", "WIN_X", "BLK"]

WIN_Y = 96
WIN_X = 256
BLK = 8        # keypoints per grid step


def _kernel(cur_ref, nxt_ref, py_ref, px_ref,
            gx_hbm, gy_hbm, sgx_ref, sgy_ref, wxy, a_scr, b_scr, sems):
    """cur_ref/nxt_ref: [1, 3, BLK] SMEM scalars (plane, y0, x0) for the
    current and next keypoint blocks.  wxy: [2, BLK, WIN_Y, 2*WIN_X]
    double-buffered patch scratch (gx in cols [:WIN_X], gy in [WIN_X:])."""
    G2 = py_ref.shape[1]
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)
    nslot = jax.lax.rem(i + 1, 2)

    def dma(src, ref, k, dst, dslot, col0, sem_idx):
        p = ref[0, 0, k]
        y0 = pl.multiple_of(ref[0, 1, k], 8)
        x0 = pl.multiple_of(ref[0, 2, k], 128)
        return pltpu.make_async_copy(
            src.at[p, pl.ds(y0, WIN_Y), pl.ds(x0, WIN_X)],
            dst.at[dslot, k, :, pl.ds(col0, WIN_X)], sems.at[dslot, sem_idx],
        )

    @pl.when(i == 0)
    def _warmup():
        for k in range(BLK):
            dma(gx_hbm, cur_ref, k, wxy, 0, 0, 2 * k).start()
            dma(gy_hbm, cur_ref, k, wxy, 0, WIN_X, 2 * k + 1).start()

    @pl.when(i + 1 < nb)
    def _prefetch():
        for k in range(BLK):
            dma(gx_hbm, nxt_ref, k, wxy, nslot, 0, 2 * k).start()
            dma(gy_hbm, nxt_ref, k, wxy, nslot, WIN_X, 2 * k + 1).start()

    for k in range(BLK):
        dma(gx_hbm, cur_ref, k, wxy, slot, 0, 2 * k).wait()
        dma(gy_hbm, cur_ref, k, wxy, slot, WIN_X, 2 * k + 1).wait()

    # batched interpolation for the WHOLE block: per-keypoint work is only the
    # (2-D, Mosaic-friendly) tent construction; the matmul and reductions are
    # single large batched ops (the kernel was issue-overhead bound otherwise)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (G2, WIN_Y), 1).astype(jnp.float32)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (G2, WIN_X), 1).astype(jnp.float32)
    for k in range(BLK):
        y0f = cur_ref[0, 1, k].astype(jnp.float32)
        x0f = cur_ref[0, 2, k].astype(jnp.float32)
        pyl = py_ref[k, :].reshape(G2, 1) - y0f
        pxl = px_ref[k, :].reshape(G2, 1) - x0f
        a_scr[k] = jnp.maximum(1.0 - jnp.abs(pyl - rows_i), 0.0).astype(jnp.bfloat16)
        b_scr[k] = jnp.maximum(1.0 - jnp.abs(pxl - cols_i), 0.0)
    # bf16 batched matmul (f32 accumulate): ~0.4% relative rounding — far
    # below the descriptor's uint8 quantization step
    t = jax.lax.dot_general(
        a_scr[:, :, :], wxy[slot].astype(jnp.bfloat16),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                       # [BLK, G2, 2*WIN_X]
    Bm = b_scr[:, :, :]
    sgx_ref[:, :] = jnp.sum(t[:, :, :WIN_X] * Bm, axis=2)
    sgy_ref[:, :] = jnp.sum(t[:, :, WIN_X:] * Bm, axis=2)


@functools.partial(jax.jit, static_argnames=("interpret",))
def sample_gradients(
    gx: jax.Array, gy: jax.Array, plane: jax.Array,
    py: jax.Array, px: jax.Array, interpret: bool = False,
):
    """gx, gy: [P, H, W] gradient planes; plane: [N] int32 plane index per
    keypoint; py, px: [N, G2] absolute sample coordinates.  Returns
    (sgx, sgy): [N, G2] bilinear samples (0 where the sample tent falls
    entirely outside the DMA window, which only happens out of image)."""
    P, H, Wimg = gx.shape
    N, G2 = py.shape

    # bf16 window DMA (production stacks are bf16; covers f32 callers too)
    gx = gx.astype(jnp.bfloat16)
    gy = gy.astype(jnp.bfloat16)
    # pad planes so aligned window origins always fit: rows to a multiple of
    # 8 (>= WIN_Y), cols to a multiple of 128 (>= WIN_X)
    H2 = max(-(-H // 8) * 8, WIN_Y)
    W2 = max(-(-Wimg // 128) * 128, WIN_X)
    if (H2, W2) != (H, Wimg):
        gx = jnp.pad(gx, ((0, 0), (0, H2 - H), (0, W2 - Wimg)))
        gy = jnp.pad(gy, ((0, 0), (0, H2 - H), (0, W2 - Wimg)))
        H, Wimg = H2, W2

    pad = (-N) % BLK
    if pad:
        plane = jnp.pad(plane, (0, pad))
        py = jnp.pad(py, ((0, pad), (0, 0)))
        px = jnp.pad(px, ((0, pad), (0, 0)))
    Np = plane.shape[0]

    # tile-aligned window origin per keypoint (clamp bounds stay aligned
    # because H/Wimg are tile multiples)
    cy = jnp.mean(py, axis=1)
    cx = jnp.mean(px, axis=1)
    y0 = jnp.clip(
        (jnp.floor((cy - 44.0) / 8.0)).astype(jnp.int32) * 8, 0, H - WIN_Y
    )
    x0 = jnp.clip(
        (jnp.floor((cx - 64.0) / 128.0)).astype(jnp.int32) * 128, 0, Wimg - WIN_X
    )

    nb = Np // BLK

    # scalar records per block: [nb, 3, BLK] = (plane, y0, x0); `nxt` is the
    # same array shifted by one block (zero tail) for the prefetch pipeline
    scal = jnp.stack([plane.reshape(nb, BLK), y0.reshape(nb, BLK),
                      x0.reshape(nb, BLK)], axis=1)
    nxt = jnp.concatenate([scal[1:], jnp.zeros((1, 3, BLK), scal.dtype)])

    in_specs = [
        pl.BlockSpec((1, 3, BLK), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 3, BLK), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((BLK, G2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((BLK, G2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    out_specs = [
        pl.BlockSpec((BLK, G2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((BLK, G2), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    sgx, sgy = pl.pallas_call(
        _kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((Np, G2), jnp.float32),
            jax.ShapeDtypeStruct((Np, G2), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, BLK, WIN_Y, 2 * WIN_X), jnp.bfloat16),
            pltpu.VMEM((BLK, G2, WIN_Y), jnp.bfloat16),
            pltpu.VMEM((BLK, G2, WIN_X), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2 * BLK)),
        ],
        interpret=interpret,
    )(
        scal, nxt, py.astype(jnp.float32), px.astype(jnp.float32), gx, gy,
    )
    return sgx[:N], sgy[:N]
