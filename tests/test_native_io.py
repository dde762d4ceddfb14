"""Native async frame writer (native/frameio.cpp via ctypes)."""

import os

import numpy as np
import pytest

from blackhole_tpu.viz import io as viz_io
from blackhole_tpu.viz import native_io


@pytest.fixture(scope="module")
def native():
    if not native_io.available():
        pytest.skip("libframeio.so not built and no toolchain")
    return True


def test_async_writer_png_ppm_roundtrip(native, tmp_path):
    rng = np.random.default_rng(0)
    img = rng.random((32, 48, 3)).astype(np.float32)
    with native_io.AsyncFrameWriter(48, 32, capacity=2) as fw:
        for k in range(6):
            fw.submit(img, str(tmp_path / f"f{k}.png"))
        fw.submit(img, str(tmp_path / "f.ppm"))
        fw.flush()
        assert fw.frames_written == 7
        assert fw.errors == 0
    for k in range(6):
        back = viz_io.read_image(str(tmp_path / f"f{k}.png"))
        np.testing.assert_allclose(back, img, atol=1 / 255 + 1e-6)
    back = viz_io.read_image(str(tmp_path / "f.ppm"))
    np.testing.assert_allclose(back, img, atol=1 / 255 + 1e-6)


def test_native_png_matches_python_encoder(native, tmp_path):
    """Native and pure-Python encoders must produce identical pixels."""
    rng = np.random.default_rng(1)
    img = rng.random((16, 16, 3)).astype(np.float32)
    viz_io.write_png(str(tmp_path / "py.png"), img)
    with native_io.AsyncFrameWriter(16, 16) as fw:
        fw.submit(img, str(tmp_path / "native.png"))
    a = viz_io.read_image(str(tmp_path / "py.png"))
    b = viz_io.read_image(str(tmp_path / "native.png"))
    np.testing.assert_array_equal(a, b)


def test_shape_mismatch_rejected(native):
    fw = native_io.AsyncFrameWriter(8, 8)
    try:
        with pytest.raises(ValueError):
            fw.submit(np.zeros((4, 4, 3)), "/tmp/never.png")
    finally:
        fw.close()


def test_backpressure_bounded_queue(native, tmp_path):
    """Submitting more frames than capacity must block (not drop) — all
    frames eventually land on disk."""
    img = np.zeros((64, 64, 3), np.float32)
    with native_io.AsyncFrameWriter(64, 64, capacity=1) as fw:
        for k in range(10):
            fw.submit(img, str(tmp_path / f"b{k}.png"))
        fw.flush()
        assert fw.frames_written == 10
    assert len(list(tmp_path.glob("b*.png"))) == 10
