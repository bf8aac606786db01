"""Fused orientation+descriptor kernel parity vs the unfused XLA path
(interpret mode on CPU — SURVEY §5.2)."""

import jax.numpy as jnp
import numpy as np
import pytest

from siftgpu_tpu.core.config import SiftConfig
from siftgpu_tpu.frontend import detect, fused, orient, pyramid
from siftgpu_tpu.frontend.describe import compute_descriptors
from siftgpu_tpu.oracle import fixtures


def _real_keypoints(cfg, img):
    pyr = pyramid.build_pyramid(jnp.asarray(img[None]), cfg)
    oc = pyr[0]
    kp = detect.detect_octave(oc, cfg, 128)
    grads = orient.gradient_stack(oc.gauss, cfg)
    return oc, kp, grads


@pytest.mark.slow
def test_fused_matches_unfused_path():
    cfg = SiftConfig(height=120, width=160, max_keypoints=128)
    img = fixtures.random_texture(120, 160, seed=5, smooth=3)
    oc, kp, grads = _real_keypoints(cfg, img)
    B, K = kp.y.shape
    n = cfg.max_orientations

    # unfused reference
    theta_ref, valid_ref = orient.compute_orientations(grads, kp, cfg)

    def dup(a):
        return jnp.repeat(a[..., None], n, axis=-1).reshape(B, K * n)

    d_ref = compute_descriptors(
        grads, dup(kp.y), dup(kp.x), dup(kp.sigma),
        theta_ref.reshape(B, K * n), dup(kp.grad_level), cfg, sampler="xla",
    )

    th2, m2, d2 = fused.orient_describe_fused(grads, kp, cfg, interpret=True)

    nk = int(np.asarray(kp.mask).sum())
    assert nk > 20  # the fixture must actually exercise the kernel

    mask_ref = np.asarray(valid_ref.reshape(B, K * n))
    mask_fus = np.asarray(m2)
    th_ref = np.asarray(theta_ref.reshape(B, K * n))
    th_fus = np.asarray(th2)

    # validity flags agree except possibly borderline 2nd peaks (bf16 window)
    both = mask_ref & mask_fus
    agree = (mask_ref == mask_fus).mean()
    assert agree > 0.99, f"validity agreement {agree}"

    # angles agree on commonly-valid slots (circular difference)
    dth = np.abs(th_ref[both] - th_fus[both])
    dth = np.minimum(dth, 2 * np.pi - dth)
    assert np.quantile(dth, 0.98) < 1e-2, f"theta q98 {np.quantile(dth, 0.98)}"
    assert dth.max() < 0.2  # no peak mixups

    # descriptors agree to a few uint8 quantization steps on valid slots
    a = np.asarray(d_ref).astype(int)[both]
    b = np.asarray(d2).astype(int)[both]
    close_th = np.minimum(np.abs(th_ref[both] - th_fus[both]),
                          2 * np.pi - np.abs(th_ref[both] - th_fus[both])) < 1e-3
    diff = np.abs(a[close_th] - b[close_th])
    assert diff.max() <= 4
    assert (diff > 1).mean() < 0.02

    af = a[close_th].astype(np.float64)
    bf = b[close_th].astype(np.float64)
    cos = (af * bf).sum(1) / np.maximum(
        np.linalg.norm(af, axis=1) * np.linalg.norm(bf, axis=1), 1e-9
    )
    assert cos.min() > 0.999


@pytest.mark.slow
def test_fused_spatial_slab_offsets():
    """y0g/global_h handling: a slab cut from a taller image must mask
    orientation rows and descriptor samples exactly like the unfused path."""
    cfg = SiftConfig(height=96, width=160, max_keypoints=64)
    img = fixtures.random_texture(96, 160, seed=11, smooth=3)
    pyr = pyramid.build_pyramid(jnp.asarray(img[None]), cfg)
    oc = pyr[0]
    # pretend the 96-row plane is a slab starting at global row 16 of a
    # 112-row image (slab reaches the global bottom).  The real spatial path
    # guarantees halos cover every in-image sample; this synthetic slab has
    # none above row 16, so compare only keypoints whose support (descriptor
    # reach ~31 px) stays inside the slab.
    y0 = jnp.asarray(16, jnp.int32)
    grads = orient.gradient_stack(oc.gauss, cfg, y0=y0, global_h=112)
    kp = detect.detect_octave(oc, cfg, 64)

    theta_ref, valid_ref = orient.compute_orientations(grads, kp, cfg)
    B, K = kp.y.shape
    n = cfg.max_orientations

    def dup(a):
        return jnp.repeat(a[..., None], n, axis=-1).reshape(B, K * n)

    d_ref = compute_descriptors(
        grads, dup(kp.y), dup(kp.x), dup(kp.sigma),
        theta_ref.reshape(B, K * n), dup(kp.grad_level), cfg, sampler="xla",
    )
    th2, m2, d2 = fused.orient_describe_fused(grads, kp, cfg, interpret=True)

    interior = np.asarray(dup(kp.y)) >= 33.0
    mask_ref = np.asarray(valid_ref.reshape(B, K * n)) & interior
    mask_fus = np.asarray(m2) & interior
    assert (mask_ref == mask_fus).mean() > 0.98
    both = mask_ref & mask_fus
    assert both.sum() > 10
    th_r = np.asarray(theta_ref.reshape(B, K * n))[both]
    th_f = np.asarray(th2)[both]
    dth = np.minimum(np.abs(th_r - th_f), 2 * np.pi - np.abs(th_r - th_f))
    close = dth < 1e-3
    diff = np.abs(
        np.asarray(d_ref).astype(int)[both][close]
        - np.asarray(d2).astype(int)[both][close]
    )
    assert diff.max() <= 4


def test_fused_degenerate_flat_image():
    cfg = SiftConfig(height=64, width=64, max_keypoints=32)
    img = np.zeros((64, 64), np.float32) + 0.5
    oc, kp, grads = _real_keypoints(cfg, img)
    th2, m2, d2 = fused.orient_describe_fused(grads, kp, cfg, interpret=True)
    assert not bool(np.asarray(m2).any())


def test_bin_chunk_fast_matches_golden_body():
    """`_bin_chunk_fast` (circular-tent + single [G2, D*D] contraction, the
    fused-path binning) computes the SAME adjacent-bin soft-assign weights
    as the golden one-hot `_bin_chunk`; only the contraction association
    differs (one collapsed [G2, 16] matmul vs two [16, 4] einsums), so the
    uint8-quantized descriptors agree to at most one quantization step on
    the f32 path and on the bf16 accelerator variant."""
    from siftgpu_tpu.frontend import describe

    cfg = SiftConfig(height=64, width=96)
    G2 = cfg.descriptor_grid ** 2
    rng = np.random.default_rng(7)
    B, C = 2, 256
    sgx = jnp.asarray(rng.standard_normal((B, C, G2)).astype(np.float32))
    sgy = jnp.asarray(rng.standard_normal((B, C, G2)).astype(np.float32))
    th = jnp.asarray(rng.uniform(0, 2 * np.pi, (B, C)).astype(np.float32))

    ref = np.asarray(describe._bin_chunk(sgx, sgy, th, cfg))
    fast = np.asarray(describe._bin_chunk_fast(sgx, sgy, th, cfg, bf16=False))
    # raw pre-normalization values agree to f32 summation-order tolerance
    np.testing.assert_allclose(fast, ref, rtol=2e-5, atol=2e-5)

    q_ref = np.asarray(
        describe.finalize_descriptors(jnp.asarray(ref), cfg)).astype(int)
    for bf16 in (False, True):
        q = np.asarray(describe.finalize_descriptors(
            describe._bin_chunk_fast(sgx, sgy, th, cfg, bf16=bf16),
            cfg)).astype(int)
        d = np.abs(q - q_ref)
        assert d.max() <= 1, f"bf16={bf16}: max step {d.max()}"
        assert (d > 0).mean() < (0.05 if bf16 else 1e-3)
