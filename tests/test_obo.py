"""Octave-by-octave mode (`_ProcessOBO` analog, SURVEY §5.7): identical
outputs to the fused program with peak memory bounded by one octave."""

import jax
import jax.numpy as jnp
import numpy as np

from siftgpu_tpu import SiftConfig, extract_features_jit
from siftgpu_tpu.frontend import extract
from siftgpu_tpu.oracle import fixtures


def test_obo_matches_fused_extraction():
    img = fixtures.random_texture(160, 192, seed=9, smooth=3)
    cfg = SiftConfig(height=160, width=192, max_keypoints=512)
    a = extract_features_jit(jnp.asarray(img[None]), cfg)
    b = extract.extract_features_obo(jnp.asarray(img[None]), cfg)
    m = np.asarray(a.mask)
    np.testing.assert_array_equal(m, np.asarray(b.mask))
    # compare VALID slots only (masked tail slots carry unspecified padding)
    for field in ("x", "y", "sigma", "theta", "response"):
        va = np.asarray(getattr(a, field))[m]
        vb = np.asarray(getattr(b, field))[m]
        np.testing.assert_allclose(va, vb, atol=1e-5, err_msg=field)
    np.testing.assert_array_equal(
        np.asarray(a.desc)[m], np.asarray(b.desc)[m]
    )


def test_obo_flag_reaches_api():
    from siftgpu_tpu.core.flags import parse_flags

    assert parse_flags(["-obo"])["process_obo"] is True
    from siftgpu_tpu.pipeline.api import SiftTPU

    s = SiftTPU(["-obo", "-tc", "64"])
    img = fixtures.random_texture(80, 96, seed=3)
    assert s.run_sift(img)
    assert s.get_feature_num() > 0


def test_obo_peak_memory_is_below_fused():
    """Static XLA memory analysis: the largest per-octave OBO program must
    need less temp memory than the fused all-octaves program."""
    H, W = 512, 640
    cfg = SiftConfig(height=H, width=W, max_keypoints=2048)
    x = jnp.zeros((1, H, W), jnp.float32)

    fused = (
        extract_features_jit.lower(x, cfg).compile().memory_analysis()
    )
    base = extract._obo_prep_jit.lower(x, cfg).compile()
    peak_obo = base.memory_analysis().temp_size_in_bytes
    b = jnp.zeros((1, H, W), jnp.float32)
    for o in range(cfg.octaves):
        c = extract._obo_octave_jit.lower(b, cfg, o).compile()
        peak_obo = max(peak_obo, c.memory_analysis().temp_size_in_bytes)
        Hn, Wn = (b.shape[1] + 1) // 2, (b.shape[2] + 1) // 2
        b = jnp.zeros((1, Hn, Wn), jnp.float32)
    # XLA's scheduler already frees cross-octave buffers aggressively in the
    # fused program, so the structural bound (one octave's working set) shows
    # up as a measurable-but-moderate reduction (~13% at 512x640); the mode's
    # value is the HARD cap for batch/4K configs where the fused program's
    # peak is scheduler-dependent.
    assert peak_obo < 0.95 * fused.temp_size_in_bytes, (
        f"OBO peak {peak_obo / 1e6:.1f} MB "
        f"vs fused {fused.temp_size_in_bytes / 1e6:.1f} MB"
    )
