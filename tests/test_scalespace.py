import numpy as np

from siftgpu_tpu.core import scalespace
from siftgpu_tpu.core.config import SiftConfig


def test_level_sigmas_schedule():
    s = scalespace.level_sigmas(3, 1.6)
    assert len(s) == 6
    assert np.isclose(s[0], 1.6)
    assert np.isclose(s[3], 3.2)          # level S has 2x sigma (octave seed)
    assert np.all(np.diff(s) > 0)


def test_incremental_sigmas_compose():
    s = scalespace.level_sigmas(3, 1.6)
    inc = scalespace.incremental_sigmas(3, 1.6)
    acc = s[0]
    for i, d in enumerate(inc):
        acc = np.sqrt(acc**2 + d**2)
        assert np.isclose(acc, s[i + 1])


def test_gaussian_taps_normalized():
    t = scalespace.gaussian_taps(1.6)
    assert len(t) % 2 == 1
    assert np.isclose(t.sum(), 1.0, atol=1e-6)
    assert np.argmax(t) == len(t) // 2
    # radius cap
    t2 = scalespace.gaussian_taps(10.0, max_radius=5)
    assert len(t2) == 11


def test_config_static_geometry():
    cfg = SiftConfig(height=480, width=640)
    assert cfg.octave_shape(0) == (480, 640)
    assert cfg.octave_shape(1) == (240, 320)
    assert cfg.octaves >= 5
    assert cfg.descriptor_dim == 128
    assert cfg.descriptor_grid == 16
    # hashable (jit static arg requirement)
    hash(cfg)
    up = cfg.replace(first_octave=-1)
    assert up.base_shape == (960, 1280)
    assert up.octave_scale(0) == 0.5
