"""Matcher parity vs the CPU oracle (BASELINE config 2 analog)."""

import jax.numpy as jnp
import numpy as np

from siftgpu_tpu.core.config import MatchConfig
from siftgpu_tpu.frontend import match as jmatch
from siftgpu_tpu.oracle import match_cpu


def _rand_desc(n, seed):
    rng = np.random.default_rng(seed)
    d = rng.random((n, 128)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = np.minimum(d, 0.35)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return np.clip(np.floor(512 * d + 0.5), 0, 255).astype(np.uint8)


def _noisy_copy(d, seed, noise=6):
    rng = np.random.default_rng(seed)
    return np.clip(
        d.astype(np.int32) + rng.integers(-noise, noise + 1, d.shape), 0, 255
    ).astype(np.uint8)


def _pairs_set(res):
    c = int(res.count)
    p = np.asarray(res.pairs[:c])
    return set(map(tuple, p.tolist()))


def test_match_parity_with_oracle():
    cfg = MatchConfig(max_match=256)
    d0 = _rand_desc(100, 1)
    # build d1: permuted noisy copies of d0 plus distractors
    perm = np.random.default_rng(2).permutation(100)
    d1 = np.concatenate([_noisy_copy(d0, 3)[perm], _rand_desc(60, 4)])
    ref = match_cpu.match(d0, d1, cfg)
    res = jmatch.match_descriptors(jnp.asarray(d0), jnp.asarray(d1), cfg=cfg)
    assert _pairs_set(res) == set(map(tuple, ref.tolist()))
    assert int(res.count) == len(ref) > 80
    # matched pairs should recover the permutation
    good = sum(1 for i, ji in ref if perm[ji] == i)
    assert good >= 0.95 * len(ref)


def test_match_respects_masks():
    cfg = MatchConfig(max_match=64)
    d0 = _rand_desc(32, 5)
    d1 = _noisy_copy(d0, 6)
    m0 = np.ones(32, bool)
    m0[:10] = False
    res = jmatch.match_descriptors(
        jnp.asarray(d0), jnp.asarray(d1), jnp.asarray(m0), None, cfg=cfg
    )
    p = np.asarray(res.pairs[: int(res.count)])
    assert (p[:, 0] >= 10).all()


def test_guided_match_homography_gate():
    cfg = MatchConfig(max_match=256, mutual_best=True)
    n = 64
    d0 = _rand_desc(n, 7)
    d1 = _noisy_copy(d0, 8)
    rng = np.random.default_rng(9)
    loc0 = rng.random((n, 2)).astype(np.float32) * 200
    H = np.array([[1, 0, 5.0], [0, 1, -3.0], [0, 0, 1]], np.float32)
    loc1 = loc0 + np.array([5.0, -3.0], np.float32)
    # perturb half the locations far away: gate must kill those pairs
    loc1_bad = loc1.copy()
    loc1_bad[: n // 2] += 500.0
    ref = match_cpu.guided_match(
        d0, d1, loc0, loc1_bad, H=H, hdist_max=8.0, cfg=cfg
    )
    res = jmatch.guided_match_descriptors(
        jnp.asarray(d0), jnp.asarray(d1), jnp.asarray(loc0), jnp.asarray(loc1_bad),
        H=jnp.asarray(H), hdist_max=8.0, cfg=cfg,
    )
    assert _pairs_set(res) == set(map(tuple, ref.tolist()))
    p = np.asarray(res.pairs[: int(res.count)])
    assert (p[:, 0] >= n // 2).all()
    assert int(res.count) > 0


def test_guided_match_epipolar_gate():
    cfg = MatchConfig(max_match=256)
    n = 48
    d0 = _rand_desc(n, 10)
    d1 = _noisy_copy(d0, 11)
    rng = np.random.default_rng(12)
    loc0 = rng.random((n, 2)).astype(np.float32) * 100
    # pure horizontal-translation stereo: F = [e]_x with e = (1, 0, 0)
    F = np.array([[0, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32)
    loc1 = loc0 + np.array([10.0, 0.0], np.float32)     # same row -> epipolar ok
    loc1_bad = loc1.copy()
    loc1_bad[: n // 3, 1] += 50.0                        # off-row -> gated out
    ref = match_cpu.guided_match(
        d0, d1, loc0, loc1_bad, F=F, fdist_max=2.0, cfg=cfg
    )
    res = jmatch.guided_match_descriptors(
        jnp.asarray(d0), jnp.asarray(d1), jnp.asarray(loc0), jnp.asarray(loc1_bad),
        F=jnp.asarray(F), fdist_max=2.0, cfg=cfg,
    )
    assert _pairs_set(res) == set(map(tuple, ref.tolist()))
    p = np.asarray(res.pairs[: int(res.count)])
    assert (p[:, 0] >= n // 3).all()


def test_streaming_matcher_matches_dense():
    """Blockwise streaming best-2 (MatchConfig.block_size) must reproduce
    the dense matcher exactly: pairs, count, distances — with masks, odd
    sizes not divisible by the block, and mutual-best on/off."""
    rng = np.random.default_rng(11)
    n0, n1 = 300, 517
    d0 = jnp.asarray(rng.integers(0, 255, (n0, 128)), jnp.uint8)
    d1 = jnp.asarray(rng.integers(0, 255, (n1, 128)), jnp.uint8)
    # duplicate some descriptors to exercise tie-breaking across blocks
    d1 = d1.at[400].set(d1[3])
    d1 = d1.at[101].set(d1[3])
    m0 = jnp.asarray(rng.random(n0) > 0.1)
    m1 = jnp.asarray(rng.random(n1) > 0.1)
    for mutual in (True, False):
        base = MatchConfig(max_match=512, mutual_best=mutual,
                           dist_max=1.4, ratio_max=0.97)
        ref = jmatch.match_descriptors_impl(d0, d1, m0, m1, base)
        for bs in (64, 128, 256):
            got = jmatch.match_descriptors_impl(
                d0, d1, m0, m1, base.replace(block_size=bs)
            )
            assert int(got.count) == int(ref.count)
            c = int(ref.count)
            np.testing.assert_array_equal(
                np.asarray(got.pairs[:c]), np.asarray(ref.pairs[:c])
            )
            np.testing.assert_allclose(
                np.asarray(got.dist[:c]), np.asarray(ref.dist[:c]),
                rtol=0, atol=1e-6,
            )


def test_streaming_guided_matches_dense_guided():
    """Guided matcher above block_size streams H/F gates per block — results
    must equal the dense guided path exactly (VERDICT r1 weak #7)."""
    rng = np.random.default_rng(21)
    n0, n1 = 120, 333
    d0 = _rand_desc(n0, 30)
    d1 = np.concatenate([_noisy_copy(d0, 31), _rand_desc(n1 - n0, 32)])
    loc0 = rng.random((n0, 2)).astype(np.float32) * 300
    loc1 = np.concatenate(
        [loc0 + np.array([4.0, -2.0], np.float32),
         rng.random((n1 - n0, 2)).astype(np.float32) * 300]
    )
    H = np.array([[1, 0, 4.0], [0, 1, -2.0], [0, 0, 1]], np.float32)
    F = np.array([[0, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32)
    for kw in (dict(H=jnp.asarray(H), hdist_max=6.0),
               dict(F=jnp.asarray(F), fdist_max=3.0),
               dict(H=jnp.asarray(H), hdist_max=6.0,
                    F=jnp.asarray(F), fdist_max=3.0)):
        dense = jmatch.guided_match_descriptors(
            jnp.asarray(d0), jnp.asarray(d1), jnp.asarray(loc0),
            jnp.asarray(loc1), cfg=MatchConfig(max_match=256), **kw
        )
        stream = jmatch.guided_match_descriptors(
            jnp.asarray(d0), jnp.asarray(d1), jnp.asarray(loc0),
            jnp.asarray(loc1), cfg=MatchConfig(max_match=256, block_size=64),
            **kw
        )
        c = int(dense.count)
        assert int(stream.count) == c and c > 0
        np.testing.assert_array_equal(
            np.asarray(stream.pairs[:c]), np.asarray(dense.pairs[:c])
        )
        # matmul tiling differs between [N0,N1] and [N0,Bc] shapes; arccos
        # amplifies the ~1e-7 similarity noise near sim~1 to ~1e-5 angle
        np.testing.assert_allclose(
            np.asarray(stream.dist[:c]), np.asarray(dense.dist[:c]), atol=5e-4
        )


def test_auto_streaming_policy_matches_dense():
    """block_size=0 (AUTO) engages streaming above stream_threshold with
    identical selection semantics; -1 forces dense."""
    import numpy as np

    from siftgpu_tpu.core.config import MatchConfig
    from siftgpu_tpu.frontend.match import _effective_block, match_descriptors_impl

    rng = np.random.default_rng(3)
    N = 640
    d0 = jnp.asarray(rng.integers(0, 256, (N, 128), dtype=np.uint8))
    d1 = jnp.asarray(rng.integers(0, 256, (N, 128), dtype=np.uint8))
    auto = MatchConfig(max_sift=N, max_match=N, stream_threshold=256,
                       stream_block=128)
    dense = MatchConfig(max_sift=N, max_match=N, block_size=-1)
    assert _effective_block(auto, N) == 128
    assert _effective_block(dense, N) == 0
    assert _effective_block(MatchConfig(), 4096) == 0    # at default threshold
    assert _effective_block(MatchConfig(), 16384) == 1024  # above -> stream
    import jax as _jax

    ra = _jax.jit(lambda a, b: match_descriptors_impl(a, b, cfg=auto))(d0, d1)
    rd = _jax.jit(lambda a, b: match_descriptors_impl(a, b, cfg=dense))(d0, d1)
    assert int(ra.count) == int(rd.count)
    np.testing.assert_array_equal(np.asarray(ra.pairs), np.asarray(rd.pairs))
    np.testing.assert_allclose(np.asarray(ra.dist), np.asarray(rd.dist), atol=1e-6)


def test_int8_path_matches_f32_path():
    """uint8 descriptors ride the exact-bf16 MXU path (one bf16 dot with
    f32 accumulation IS the integer dot — see frontend/match._u8_parts;
    VERDICT r3 task 1); the same data cast to f32 rides the old
    Precision.HIGHEST path.  Selection must be identical and the winner
    distances must agree to f32 rounding of the epilogue."""
    rng = np.random.default_rng(42)
    for n0, n1, seed in ((200, 333, 0), (64, 64, 1), (511, 130, 2)):
        d0 = _rand_desc(n0, 100 + seed)
        d1 = np.concatenate(
            [_noisy_copy(d0[: min(n0, n1)], 200 + seed),
             _rand_desc(max(0, n1 - n0), 300 + seed)]
        )[:n1]
        d1[-1] = 0  # zero descriptor: rsqrt guard path
        cfg = MatchConfig(max_match=512)
        ri = jmatch.match_descriptors(jnp.asarray(d0), jnp.asarray(d1), cfg=cfg)
        rf = jmatch.match_descriptors(
            jnp.asarray(d0, jnp.float32), jnp.asarray(d1, jnp.float32), cfg=cfg
        )
        assert int(ri.count) == int(rf.count) > 0
        assert _pairs_set(ri) == _pairs_set(rf)
        c = int(ri.count)
        np.testing.assert_allclose(
            np.asarray(ri.dist[:c]), np.asarray(rf.dist[:c]), atol=5e-4
        )
    # streaming int8 == dense int8, exactly (same ints, same selection)
    d0 = _rand_desc(300, 7)
    d1 = np.concatenate([_noisy_copy(d0, 8), _rand_desc(217, 9)])
    dense = jmatch.match_descriptors(
        jnp.asarray(d0), jnp.asarray(d1), cfg=MatchConfig(max_match=512)
    )
    stream = jmatch.match_descriptors(
        jnp.asarray(d0), jnp.asarray(d1),
        cfg=MatchConfig(max_match=512, block_size=128),
    )
    assert int(stream.count) == int(dense.count)
    np.testing.assert_array_equal(np.asarray(stream.pairs), np.asarray(dense.pairs))
