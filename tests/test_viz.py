"""Viewer-analog overlay rendering (TestWinGlut row, SURVEY §2.2)."""

import numpy as np

from siftgpu_tpu.core import image as imio
from siftgpu_tpu.pipeline import viz


def test_draw_keypoints_marks_scale_and_orientation():
    img = np.full((64, 80), 0.5, np.float32)
    out = viz.draw_keypoints(
        img, x=[40.0], y=[32.0], sigma=[4.0], theta=[0.0], scale_factor=3.0
    )
    assert out.shape == (64, 80, 3) and out.dtype == np.uint8
    green = (out[..., 1] > 200) & (out[..., 0] < 100)
    assert green.any()
    ys, xs = np.nonzero(green)
    # circle of radius 12 around (40, 32)
    r = np.hypot(ys - 32.0, xs - 40.0)
    assert abs(r.max() - 12.0) < 1.5 and abs(r.min() - 12.0) < 1.5
    # orientation tick (theta=0 -> towards +x) in yellow
    tick = (out[..., 0] > 200) & (out[..., 1] > 200) & (out[..., 2] < 120)
    tys, txs = np.nonzero(tick)
    assert tick.any() and (txs >= 40).all() and (np.abs(tys - 32) <= 1).all()


def test_draw_matches_side_by_side():
    a = np.zeros((40, 50), np.float32)
    b = np.zeros((48, 30), np.float32)
    kp0 = np.array([[10.0, 20.0, 2.0, 0.0]])
    kp1 = np.array([[5.0, 30.0, 2.0, 0.0]])
    out = viz.draw_matches(a, b, kp0, kp1, [[0, 0]])
    assert out.shape == (48, 80, 3)
    red = (out[..., 0] > 200) & (out[..., 1] < 120)
    ys, xs = np.nonzero(red)
    # line spans from (20, 10) to (30, 5 + 50)
    assert xs.min() <= 11 and xs.max() >= 54
    assert ys.min() >= 19 and ys.max() <= 31


def test_ppm_roundtrip(tmp_path):
    rgb = (np.random.default_rng(0).random((12, 17, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "x.ppm")
    imio.save_ppm(p, rgb)
    back = imio.load_pnm(p)
    np.testing.assert_array_equal(back, rgb)


def test_cli_split_flags_accepts_tc_variants():
    """Regression: -tc moved out of _VALUED into _TC; the CLI splitter must
    still forward `-tc N` (and -tc1/2/3) to parse_flags."""
    from siftgpu_tpu.pipeline.cli import _split_flags

    known, rest = _split_flags(["-tc", "256", "img.pgm", "-tc2", "99"])
    assert known == ["-tc", "256", "-tc2", "99"]
    assert rest == ["img.pgm"]
