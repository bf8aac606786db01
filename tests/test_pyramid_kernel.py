"""Parity of the fused multi-level pyramid kernel (ops/pyramid_kernel.py).

Interpret mode vs the sequential XLA chain: same per-level replicate-edge
semantics, all octaves, odd sizes.  The fused kernel's only numeric
divergence on a real TPU is the HIGH-precision column matmul emulation —
in interpret mode the matmuls are true f32, so agreement here is f32-ulp
class and any structural error (halo bookkeeping, margin refresh, tile
clamping) would show as a gross mismatch.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from siftgpu_tpu.core.config import SiftConfig
from siftgpu_tpu.frontend import pyramid
from siftgpu_tpu.oracle import fixtures


@pytest.mark.parametrize("hw", [(120, 160), (96, 130), (33, 47)])
def test_fused_octaves_match_sequential_chain(hw):
    H, W = hw
    cfg = SiftConfig(height=H, width=W, max_keypoints=256)
    img = fixtures.random_texture(H, W, seed=1)
    x = jnp.asarray(img[None])
    ref = pyramid.build_pyramid(x, cfg, octave_impl="xla")
    fus = pyramid.build_pyramid(x, cfg, octave_impl="fused_interpret")
    assert len(ref) == len(fus)
    for o, (a, b) in enumerate(zip(ref, fus)):
        assert a.gauss.shape == b.gauss.shape
        assert a.dog.shape == b.dog.shape
        dg = float(jnp.abs(a.gauss - b.gauss).max())
        dd = float(jnp.abs(a.dog - b.dog).max())
        # f32-ulp class; the DoG contrast threshold is 6.7e-3 — structural
        # errors (borders, halos, tiles) would be 1e-2+
        assert dg < 1e-5, (o, dg)
        assert dd < 1e-5, (o, dd)


def test_fused_batch_and_tail_rows():
    """Batched frames stay independent and non-multiple-of-slab heights
    (tail slab + bottom-edge replication) stay exact."""
    H, W = 150, 200  # H not a multiple of the 128-row slab
    cfg = SiftConfig(height=H, width=W, max_keypoints=256, num_octaves=2)
    a = fixtures.random_texture(H, W, seed=2)
    b = fixtures.warp_affine(a, np.eye(2), np.array([2.0, 1.0]))
    x = jnp.asarray(np.stack([a, b]))
    ref = pyramid.build_pyramid(x, cfg, octave_impl="xla")
    fus = pyramid.build_pyramid(x, cfg, octave_impl="fused_interpret")
    for aoc, boc in zip(ref, fus):
        assert float(jnp.abs(aoc.dog - boc.dog).max()) < 1e-5
    solo = pyramid.build_pyramid(x[1:], cfg, octave_impl="fused_interpret")
    for boc, soc in zip(fus, solo):
        np.testing.assert_array_equal(
            np.asarray(boc.dog[1]), np.asarray(soc.dog[0])
        )
