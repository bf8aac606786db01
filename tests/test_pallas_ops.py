"""Pallas kernel parity vs the XLA reference paths (interpret mode on CPU —
SURVEY §5.2: interpret-mode parity catches OOB/race-style kernel bugs)."""

import jax
import jax.numpy as jnp
import numpy as np

from siftgpu_tpu.core.config import SiftConfig
from siftgpu_tpu.frontend import describe, orient, pyramid
from siftgpu_tpu.ops import desc_sampler
from siftgpu_tpu.oracle import fixtures
import pytest


def test_sample_gradients_matches_xla_bilinear():
    rng = np.random.default_rng(0)
    P, H, W = 6, 100, 120
    planes = jnp.asarray(rng.normal(0, 1, (P, H, W)), jnp.float32)
    N, G2 = 24, 256
    plane = jnp.asarray(rng.integers(0, P, N), jnp.int32)
    # clustered sample grids (like real descriptors), all in-bounds
    cy = rng.uniform(20, H - 20, N)
    cx = rng.uniform(20, W - 20, N)
    off = rng.uniform(-15, 15, (N, G2))
    off2 = rng.uniform(-15, 15, (N, G2))
    py = jnp.asarray(cy[:, None] + off, jnp.float32)
    px = jnp.asarray(cx[:, None] + off2, jnp.float32)

    sgx, sgy = desc_sampler.sample_gradients(
        planes, planes * 2.0, plane, py, px, interpret=True
    )

    # XLA reference bilinear
    y0 = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, H - 1)
    x0 = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    fy = py - y0
    fx = px - x0
    flat = planes.reshape(P, -1)

    def g(yi, xi):
        idx = yi * W + xi
        return jnp.take_along_axis(flat[plane], idx, axis=1)

    ref = (
        g(y0, x0) * (1 - fy) * (1 - fx) + g(y0, x1) * (1 - fy) * fx
        + g(y1, x0) * fy * (1 - fx) + g(y1, x1) * fy * fx
    )
    # kernel matmuls run in bf16 with f32 accumulation: ~0.4% relative
    ref = np.asarray(ref)
    tol = 5e-3 * max(1.0, np.abs(ref).max())
    np.testing.assert_allclose(np.asarray(sgx), ref, atol=tol)
    np.testing.assert_allclose(np.asarray(sgy), ref * 2.0, atol=2 * tol)


def test_descriptors_pallas_path_matches_xla_path():
    cfg = SiftConfig(height=96, width=128, max_keypoints=128)
    img = fixtures.random_texture(96, 128, seed=3)
    pyr = pyramid.build_pyramid(jnp.asarray(img[None]), cfg)
    oc = pyr[0]
    grads = orient.gradient_stack(oc.gauss, cfg)

    rng = np.random.default_rng(1)
    K = 40
    y = jnp.asarray(rng.uniform(6, 90, (1, K)), jnp.float32)
    x = jnp.asarray(rng.uniform(6, 122, (1, K)), jnp.float32)
    sig = jnp.asarray(rng.uniform(1.7, 3.1, (1, K)), jnp.float32)
    th = jnp.asarray(rng.uniform(0, 2 * np.pi, (1, K)), jnp.float32)
    gl = jnp.asarray(rng.integers(1, cfg.dog_levels + 1, (1, K)), jnp.int32)

    d_xla = describe.compute_descriptors(grads, y, x, sig, th, gl, cfg, sampler="xla")
    d_pls = describe.compute_descriptors(
        grads, y, x, sig, th, gl, cfg, sampler="pallas_interpret"
    )
    diff = np.abs(np.asarray(d_xla).astype(int) - np.asarray(d_pls).astype(int))
    assert diff.max() <= 3   # bf16 sampling: a few uint8 quantization steps
    assert (diff > 1).mean() < 0.01
    # descriptor direction essentially unchanged
    a = np.asarray(d_xla, np.float64).reshape(-1, 128)
    b = np.asarray(d_pls, np.float64).reshape(-1, 128)
    cos = (a * b).sum(1) / np.maximum(
        np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1), 1e-9
    )
    assert cos.min() > 0.9995


@pytest.mark.slow
def test_detect_scores_kernel_matches_xla_dense_path():
    """Fused detect-scores stencil (ops/detect_scores.py) must reproduce the
    XLA dense masks bit-for-bit, including owned-rows restriction, odd sizes,
    and zeroed tile padding; detect_octave output must be identical."""
    from siftgpu_tpu.frontend import detect
    from siftgpu_tpu.ops.detect_scores import detect_scores

    for H, W in [(64, 96), (57, 130)]:
        cfg = SiftConfig(height=H, width=W, max_keypoints=256)
        img = fixtures.random_texture(H, W, seed=3, smooth=2)
        pyr = pyramid.build_pyramid(jnp.asarray(img)[None], cfg)
        for oc in pyr[:2]:
            Hd, Wd = oc.dog.shape[-2:]
            for owned in (None, (5, Hd - 7)):
                xla6 = detect._dense_scores_xla(oc.dog, cfg, owned)
                pls6 = detect_scores(oc.dog, cfg, owned, interpret=True)
                He, We = xla6[0].shape[-2:]
                # score planes: bit-identical INCLUDING zeroed tile padding
                for a, b in zip(xla6[:2], pls6[:2]):
                    a, b = np.asarray(a), np.asarray(b)
                    assert np.array_equal(b[:, :, :He, :We], a)
                    assert b[:, :, He:, :].sum() == 0
                    assert b[:, :, :, We:].sum() == 0
                # record planes (val/off_l/off_y/off_x): same expressions,
                # but FMA contraction differs between the fused XLA program
                # and the kernel, so agreement is to f32 ulps, not bits
                for a, b in zip(xla6[2:], pls6[2:]):
                    a = np.asarray(a)[:, :, :Hd, :Wd]
                    b = np.asarray(b)[:, :, :Hd, :Wd]
                    np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)

                d1 = detect.detect_octave(
                    oc, cfg, 128, owned_rows=owned, scores_impl="xla"
                )
                d2 = detect.detect_octave(
                    oc, cfg, 128, owned_rows=owned,
                    scores_impl="pallas_interpret",
                )
                assert np.array_equal(np.asarray(d1.mask), np.asarray(d2.mask))
                m = np.asarray(d1.mask)
                for f in d1._fields:
                    v1 = np.asarray(getattr(d1, f))[m]
                    v2 = np.asarray(getattr(d2, f))[m]
                    if f in ("mask", "grad_level"):
                        assert np.array_equal(v1, v2), f
                    else:  # refined fields: ulp-level FMA divergence
                        np.testing.assert_allclose(
                            v1, v2, rtol=2e-4, atol=1e-5, err_msg=f
                        )


def test_grad_stencil_matches_xla_gradient_stack():
    """Fused gradient stencil (ops/grad_stencil.py) must match the XLA
    gradient_stack bit-for-bit within (h, w), zero-fill the tile padding, and
    reproduce the sharded-slab boundary-row factor."""
    from siftgpu_tpu.frontend import orient

    for H, W in [(64, 96), (57, 130)]:
        cfg = SiftConfig(height=H, width=W, max_keypoints=256)
        img = fixtures.random_texture(H, W, seed=3, smooth=2)
        pyr = pyramid.build_pyramid(jnp.asarray(img)[None], cfg)
        for oc in pyr[:2]:
            g1 = orient.gradient_stack(oc.gauss, cfg, impl="xla")
            g2 = orient.gradient_stack(oc.gauss, cfg, impl="pallas_interpret")
            h, w = g1.h, g1.w
            for a, b in ((g1.gx, g2.gx), (g1.gy, g2.gy)):
                a, b = np.asarray(a), np.asarray(b)
                assert np.array_equal(a[:, :, :h, :w], b[:, :, :h, :w])
                assert b[:, :, h:, :].sum() == 0
                assert b[:, :, :, w:].sum() == 0
            y0 = jnp.asarray(-3, jnp.int32)
            g3 = orient.gradient_stack(
                oc.gauss, cfg, y0=y0, global_h=h + 10, impl="xla"
            )
            g4 = orient.gradient_stack(
                oc.gauss, cfg, y0=y0, global_h=h + 10, impl="pallas_interpret"
            )
            assert np.array_equal(
                np.asarray(g3.gy)[:, :, :h, :w], np.asarray(g4.gy)[:, :, :h, :w]
            )


def test_match_kernel_matches_xla_selection():
    """Fused match-reduction kernel (ops/match_kernel.py, interpret mode)
    vs the dense XLA u8 selection: identical best/second similarities,
    argbest, and column-best rows — incl. masks, ragged sizes, exact-tie
    columns, and zero descriptors."""
    from siftgpu_tpu.frontend import match as M
    from siftgpu_tpu.ops.match_kernel import match_best2

    rng = np.random.default_rng(5)
    for n0, n1, seed in ((300, 1200, 0), (256, 1024, 1), (70, 130, 2)):
        d0 = rng.integers(0, 256, (n0, 128), dtype=np.uint8)
        d1 = rng.integers(0, 256, (n1, 128), dtype=np.uint8)
        d1[5] = d0[0]
        if n1 > 1025:
            d1[1025] = d0[0]  # exact duplicate across column tiles: tie-break
        d1[-1] = 0
        m0 = rng.random(n0) > 0.1
        m1 = rng.random(n1) > 0.1
        d0j, d1j = jnp.asarray(d0), jnp.asarray(d1)
        m0j, m1j = jnp.asarray(m0), jnp.asarray(m1)

        p0 = M._u8_parts(d0j)
        p1 = M._u8_parts(d1j)
        sim = M._u8_sim(p0, p1)
        sim = jnp.where(m0j[:, None] & m1j[None, :], sim, -jnp.inf)
        rb, rs, rj = M._best2_sim(sim)
        rc = jnp.argmax(sim, axis=0)

        bs, ss, bj, ci = match_best2(
            d0j, d1j, p0[1], p1[1], m0j, m1j, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(bs), np.asarray(rb))
        np.testing.assert_array_equal(np.asarray(bj), np.asarray(rj))
        np.testing.assert_array_equal(np.asarray(ci), np.asarray(rc))
        # second-best: masked rows are -inf in both
        np.testing.assert_array_equal(np.asarray(ss), np.asarray(rs))


def test_match_kernel_guided_matches_xla_gates():
    """Guided fused kernel (H/F gating computed per tile in VMEM,
    VERDICT r4 task 5) vs the dense XLA guided path: identical selection
    for H-only, F-only, and H+F gating — including cross-tile winners
    (small tm/tn force multi-tile grids) and rows fully gated out."""
    from siftgpu_tpu.frontend import match as M
    from siftgpu_tpu.ops.match_kernel import match_best2

    rng = np.random.default_rng(11)
    n0, n1 = 300, 900
    d0 = rng.integers(0, 256, (n0, 128), dtype=np.uint8)
    # first n0 of d1 = noisy copies of d0 rows (real correspondences)
    d1 = np.concatenate([
        np.clip(d0.astype(int) + rng.integers(-6, 7, (n0, 128)),
                0, 255).astype(np.uint8),
        rng.integers(0, 256, (n1 - n0, 128), dtype=np.uint8),
    ])
    loc0 = rng.uniform(0, 640, (n0, 2)).astype(np.float32)
    # loc1: first n0 follow a translation of loc0 (inliers), rest random
    t = np.array([12.0, -7.0], np.float32)
    loc1 = np.concatenate([
        loc0 + t, rng.uniform(0, 640, (n1 - n0, 2)),
    ]).astype(np.float32)
    H = np.array([[1, 0, t[0]], [0, 1, t[1]], [0, 0, 1]], np.float32)
    # rank-2 F from a random epipole cross matrix
    e = rng.uniform(-1, 1, 3)
    Ex = np.array([[0, -e[2], e[1]], [e[2], 0, -e[0]], [-e[1], e[0], 0]])
    F = (Ex @ rng.uniform(-1, 1, (3, 3))).astype(np.float32) * 1e-3
    m0 = rng.random(n0) > 0.05
    m1 = rng.random(n1) > 0.05
    d0j, d1j = jnp.asarray(d0), jnp.asarray(d1)
    m0j, m1j = jnp.asarray(m0), jnp.asarray(m1)
    l0j, l1j = jnp.asarray(loc0), jnp.asarray(loc1)
    cfg = M.MatchConfig(max_match=512, block_size=-1, use_pallas=False)

    p0 = M._u8_parts(d0j)
    p1 = M._u8_parts(d1j)

    for Hj, Fj, gate in (
        (jnp.asarray(H), None, "h"),
        (None, jnp.asarray(F), "f"),
        (jnp.asarray(H), jnp.asarray(F), "hf"),
    ):
        ref = M.guided_match_descriptors(
            d0j, d1j, l0j, l1j, H=Hj, F=Fj, mask0=m0j, mask1=m1j,
            hdist_max=24.0, fdist_max=8.0, cfg=cfg,
        )
        rows, cols = [], []
        if Hj is not None:
            rows += list(M._h_parts(l0j, Hj))
        if Fj is not None:
            rows += list(M._f_parts_rows(l0j, Fj))
        cols += [l1j[:, 0], l1j[:, 1]]
        if Fj is not None:
            cols += list(M._f_parts_cols(l1j, Fj))
        bs, ss, bj, ci = match_best2(
            d0j, d1j, p0[1], p1[1], m0j, m1j,
            gate=gate, gate_rows=rows, gate_cols=cols,
            h2=24.0 * 24.0, fthr=8.0, interpret=True, tm=128, tn=256,
        )
        got = M._finalize(bs, ss, bj, ci, cfg)
        assert int(got.count) == int(ref.count), gate
        np.testing.assert_array_equal(
            np.asarray(got.pairs), np.asarray(ref.pairs), err_msg=gate)
        np.testing.assert_allclose(
            np.asarray(got.dist), np.asarray(ref.dist), atol=1e-6)
        if gate == "h":   # the H-inlier structure must actually match
            assert int(ref.count) > 100
