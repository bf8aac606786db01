"""Native C++ loader parity vs the NumPy reference implementations."""

import numpy as np
import pytest

from siftgpu_tpu.core import image as imio
from siftgpu_tpu.core import native
from siftgpu_tpu.pipeline import siftio

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def _pgm(tmp_path, name, img):
    p = str(tmp_path / name)
    imio.save_pgm(p, img)
    return p


def test_native_load_matches_python(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.random((40, 56)).astype(np.float32)
    p = _pgm(tmp_path, "a.pgm", img)
    ref = imio.load_image(p)
    out = native.load_image(p)
    assert out is not None
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_native_ppm_color(tmp_path):
    rng = np.random.default_rng(1)
    rgb = (rng.random((16, 20, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "c.ppm")
    with open(p, "wb") as f:
        f.write(b"P6\n20 16\n255\n")
        f.write(rgb.tobytes())
    out = native.load_image(p)
    ref = imio.to_grayscale(rgb)
    np.testing.assert_allclose(out, ref, atol=2e-3)


def test_native_maxd_downsample(tmp_path):
    rng = np.random.default_rng(2)
    img = rng.random((64, 96)).astype(np.float32)
    p = _pgm(tmp_path, "d.pgm", img)
    out = native.load_image(p, maxd=30)
    loaded = imio.load_image(p)
    ref = imio.downsample_to_fit(loaded, 30)
    assert out.shape == ref.shape == (16, 24)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_native_batch_loader(tmp_path):
    rng = np.random.default_rng(3)
    paths = []
    imgs = []
    for i in range(6):
        img = rng.random((32, 40)).astype(np.float32)
        imgs.append(img)
        paths.append(_pgm(tmp_path, f"b{i}.pgm", img))
    paths.append(str(tmp_path / "missing.pgm"))
    batch, status = native.load_batch(paths, 32, 40, threads=3)
    assert batch.shape == (7, 32, 40)
    assert (status[:6] == 0).all() and status[6] != 0
    for i in range(6):
        np.testing.assert_allclose(
            batch[i], imio.load_image(paths[i]), atol=1e-6
        )


def test_native_binary_sift_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    keys = rng.random((17, 4)).astype(np.float32) * 100
    desc = rng.integers(0, 256, (17, 128)).astype(np.uint8)
    p = str(tmp_path / "n.sift")
    assert native.write_binary_sift(p, keys, desc)
    k2, d2 = siftio.read_binary_sift(p)
    np.testing.assert_allclose(k2, keys, atol=1e-6)
    np.testing.assert_array_equal(d2, desc)
