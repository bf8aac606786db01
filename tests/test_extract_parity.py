"""End-to-end extraction parity vs the CPU oracle (BASELINE config 1 analog)."""

import jax.numpy as jnp
import numpy as np
import pytest

from siftgpu_tpu import SiftConfig, extract_features_jit
from siftgpu_tpu.oracle import fixtures, sift_cpu

from helpers import angdiff, desc_cosine, features_to_numpy


@pytest.fixture(scope="module")
def parity_case():
    cfg = SiftConfig(height=80, width=96, max_keypoints=256)
    img = fixtures.random_texture(80, 96, seed=3)
    j = features_to_numpy(extract_features_jit(jnp.asarray(img[None]), cfg))
    o = sift_cpu.extract(img, cfg)
    return cfg, img, j, o


def _pair(o, j, pos_tol=0.5):
    used, pairs = set(), []
    for ia in range(len(o["x"])):
        d2 = (j["x"] - o["x"][ia]) ** 2 + (j["y"] - o["y"][ia]) ** 2
        cand = [c for c in np.where(d2 < pos_tol**2)[0] if c not in used]
        if not cand:
            continue
        td = np.array([angdiff(o["theta"][ia], j["theta"][c]) for c in cand])
        ib = cand[int(td.argmin())]
        used.add(ib)
        pairs.append((ia, ib))
    return pairs


def test_counts_match(parity_case):
    _, _, j, o = parity_case
    assert len(j["x"]) == len(o["x"]) > 20


def test_full_parity(parity_case):
    _, _, j, o = parity_case
    pairs = _pair(o, j)
    # repeatability target >= 95% (BASELINE.md); oracle-parity should be ~100%
    assert len(pairs) >= 0.99 * len(o["x"])
    tds = np.array([angdiff(o["theta"][ia], j["theta"][ib]) for ia, ib in pairs])
    # gradient stacks are bf16 storage since round 5 (halves the keypoint
    # engine's dominant window-DMA cost); the oracle keeps f32 gradients, so
    # orientation parity is quantile-class.  Measured on this fixture:
    # median 1.1e-4, q75 3.2e-4, q90 5.6e-3, max 3.5e-2 rad (2 deg) — the
    # tail comes from near-tie histogram peaks and stays far inside the
    # 10-deg orientation bin and the 45-deg descriptor bin; descriptor
    # cosine min 0.998.  End-to-end warp-inlier and OpenCV cross-checks
    # bound the behavioral impact.
    assert np.quantile(tds, 0.75) < 1e-3
    assert np.quantile(tds, 0.9) < 2e-2
    assert tds.max() < 0.05            # no peak mixups
    cos = np.array([desc_cosine(o["desc"][ia], j["desc"][ib]) for ia, ib in pairs])
    assert np.quantile(cos, 0.25) > 0.999
    assert cos.min() > 0.995
    sd = np.array([abs(o["sigma"][ia] - j["sigma"][ib]) for ia, ib in pairs])
    assert sd.max() < 1e-2


def test_masked_rows_are_padding(parity_case):
    cfg, img, _, _ = parity_case
    feats = extract_features_jit(jnp.asarray(img[None]), cfg)
    m = np.asarray(feats.mask[0])
    r = np.asarray(feats.response[0])
    # all valid rows sort before all invalid rows
    assert m[: m.sum()].all() and not m[m.sum() :].any()
    # ordered by response desc among valid entries
    rv = r[m]
    assert (np.diff(rv) <= 1e-9).all()


def test_batch_matches_single(parity_case):
    cfg, img, j, _ = parity_case
    img2 = fixtures.random_texture(80, 96, seed=11)
    batch = jnp.stack([jnp.asarray(img2), jnp.asarray(img)])
    feats = extract_features_jit(batch, cfg)
    m = np.asarray(feats.mask[1])
    x = np.asarray(feats.x[1])[m]
    assert len(x) == len(j["x"])
    np.testing.assert_allclose(np.sort(x), np.sort(j["x"]), atol=1e-4)


@pytest.mark.slow
def test_prefilter_is_output_preserving():
    """prefilter_candidates masks only candidates that can never reach the
    final top-K — extraction output must be bit-identical with a cap small
    enough that per-octave candidate caps saturate (the perf-relevant case)."""
    from siftgpu_tpu.frontend import detect, extract, pyramid

    cfg = SiftConfig(height=96, width=128, max_keypoints=32)
    img = jnp.asarray(fixtures.random_texture(96, 128, seed=11)[None])
    pyr = pyramid.build_pyramid(img, cfg)
    kps = detect.detect_pyramid(pyr, cfg)
    total_valid = sum(int(np.asarray(k.mask).sum()) for k in kps)
    assert total_valid > cfg.max_keypoints  # the filter actually engages

    kpf = extract.prefilter_candidates(kps, cfg)
    kept = sum(int(np.asarray(k.mask).sum()) for k in kpf)
    assert cfg.max_keypoints <= kept < total_valid

    def run(kp_list):
        parts = []
        for o, oc in enumerate(pyr):
            cand = extract.octave_candidates(oc, cfg, cfg.octave_cap(o), kp=kp_list[o])
            parts.append(extract.to_image_coords(cand, cfg, o, 1))
        return extract.assemble_features(parts, cfg)

    a = run(kps)
    b = run(kpf)
    for fa, fb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))


def test_first_octave_positive():
    """`-fo 1` semantics (reference `_octave_min` ⚠ SURVEY §5.6): the pyramid
    starts at a 2x-decimated input, so keypoints stay inside the image and the
    run equals an fo=0 run on the manually decimated image with coords/sigma
    doubled.  Regression test for the round-1 bug where -fo 1 produced
    keypoints at x >= width."""
    img = fixtures.random_texture(160, 128, seed=7, smooth=4)
    cfg1 = SiftConfig(height=160, width=128, max_keypoints=64, first_octave=1)
    f1 = features_to_numpy(extract_features_jit(jnp.asarray(img[None]), cfg1))
    assert len(f1["x"]) > 5
    assert (f1["x"] >= 0).all() and (f1["x"] < 128).all()
    assert (f1["y"] >= 0).all() and (f1["y"] < 160).all()

    ds = img[::2, ::2]
    cfg0 = SiftConfig(height=80, width=64, max_keypoints=64)
    f0 = features_to_numpy(extract_features_jit(jnp.asarray(ds[None]), cfg0))
    assert len(f0["x"]) == len(f1["x"])
    np.testing.assert_allclose(f1["x"], 2 * f0["x"], atol=1e-4)
    np.testing.assert_allclose(f1["y"], 2 * f0["y"], atol=1e-4)
    np.testing.assert_allclose(f1["sigma"], 2 * f0["sigma"], atol=1e-4)
    np.testing.assert_array_equal(f1["desc"], f0["desc"])

    # the oracle follows the identical convention
    o1 = sift_cpu.extract(img, cfg1)
    o0 = sift_cpu.extract(ds, cfg0)
    assert len(o1["x"]) == len(o0["x"]) > 5
    np.testing.assert_allclose(o1["x"], 2 * o0["x"], atol=1e-6)
    np.testing.assert_allclose(o1["sigma"], 2 * o0["sigma"], atol=1e-6)


def test_keep_sign_flag():
    """`-sign` parity (GlobalUtil::_KeepExtremumSign analog): with keep_sign
    the response carries the signed DoG value and minima download a negated
    sigma; everything else (selection, coords, descriptors) is unchanged."""
    base = SiftConfig(height=96, width=128, max_keypoints=64)
    img = jnp.asarray(fixtures.random_texture(96, 128, seed=5)[None])
    a = extract_features_jit(img, base)
    b = extract_features_jit(img, base.replace(keep_sign=True))

    am, bm = np.asarray(a.mask), np.asarray(b.mask)
    np.testing.assert_array_equal(am, bm)
    for f in ("x", "y", "theta"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f))[am], np.asarray(getattr(b, f))[bm]
        )
    np.testing.assert_array_equal(np.asarray(a.desc)[am], np.asarray(b.desc)[bm])
    # |signed outputs| == unsigned outputs
    np.testing.assert_allclose(
        np.abs(np.asarray(b.sigma)[bm]), np.asarray(a.sigma)[am], rtol=0, atol=0
    )
    np.testing.assert_array_equal(
        np.abs(np.asarray(b.response)[bm]), np.asarray(a.response)[am]
    )
    # sign consistency: sigma sign encodes the extremum polarity
    resp = np.asarray(b.response)[bm]
    sig = np.asarray(b.sigma)[bm]
    assert (resp < 0).any() and (resp > 0).any()  # both polarities present
    np.testing.assert_array_equal(np.sign(sig), np.sign(resp))
