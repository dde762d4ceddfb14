"""Tests for aux subsystems (profiling, logging, checkpoint) and viz
(effects, animation, IO)."""

import logging
import os

import jax.numpy as jnp
import numpy as np
import pytest

from blackhole_tpu.geom.types import BlackHole, Disk, Scene, SimConfig
from blackhole_tpu.utils import logging as bh_logging
from blackhole_tpu.utils import profiling
from blackhole_tpu.viz import animate, effects, io as viz_io


def test_timer_measure():
    t = profiling.Timer("t")
    out = t.measure(lambda x: x * 2, jnp.ones(8), repeats=2)
    assert len(t.samples) == 2
    assert np.allclose(np.asarray(out), 2.0)
    assert t.best <= t.mean or len(t.samples) == 1


def test_emit_metric_json(capsys):
    line = profiling.emit_metric("m", 1.5, "u", vs_baseline=2.0)
    import json

    rec = json.loads(line)
    assert rec == {"metric": "m", "value": 1.5, "unit": "u",
                   "vs_baseline": 2.0}


def test_throttled_logger():
    lg = bh_logging.get_logger("blackhole_tpu.test")
    records = []

    class Capture(logging.Handler):
        def emit(self, record):
            records.append(record)

    handler = Capture()
    lg.addHandler(handler)
    try:
        th = bh_logging.Throttled(lg, every=10)
        for _ in range(25):
            th.log(logging.INFO, "spam")
    finally:
        lg.removeHandler(handler)
    assert len(records) == 3  # calls 1, 11, 21


def test_starfield_and_overlay_shapes():
    sf = effects.starfield(32, 48)
    assert sf.shape == (32, 48, 3)
    assert float(sf.max()) <= 1.0 and float(sf.min()) >= 0.0
    rgb, alpha = effects.blackhole_overlay(32, 48, spin=0.9)
    assert rgb.shape == (32, 48, 3) and alpha.shape == (32, 48)
    # Shadow center is black and opaque.
    assert float(rgb[16, 24].max()) == 0.0
    assert float(alpha[16, 25]) == 1.0


def test_lensing_warp_preserves_range():
    img = effects.starfield(32, 32, density=0.05)
    warped = effects.lensing_warp(img)
    assert warped.shape == img.shape
    assert float(warped.min()) >= 0.0 and float(warped.max()) <= 1.0


def test_composite_preview():
    frame = effects.composite_preview(24, 24, spin=0.5, time=1.0)
    assert frame.shape == (24, 24, 3)
    assert np.all(np.isfinite(np.asarray(frame)))


def scene_small():
    return Scene(
        blackhole=BlackHole.create(1.0, 0.0),
        disk=Disk.create(6.0, 20.0),
        config=SimConfig.create(
            time_step=0.1, max_ray_distance=60.0, max_steps=60
        ),
        disk_enabled=True,
    )


def test_progressive_ladder():
    cam = animate.orbit_camera(35.0, 18.0, 0.0, 22.0)
    tiers = list(
        animate.render_progressive(
            scene_small(), cam, 32, 32,
            ladder=((8, 20), (4, 30)),
        )
    )
    assert [d for d, _ in tiers] == [8, 4]
    for _, img in tiers:
        assert img.shape == (32, 32, 3)


def test_orbit_animation_writes_frames(tmp_path):
    paths = animate.render_orbit_animation(
        scene_small(), str(tmp_path), n_frames=2, width=16, height=16
    )
    assert len(paths) == 2
    for p in paths:
        assert os.path.exists(p)


def test_image_io_roundtrip(tmp_path):
    img = np.random.default_rng(0).random((8, 8, 3)).astype(np.float32)
    p = str(tmp_path / "x.png")
    viz_io.write_image(p, img)
    back = viz_io.read_image(p)
    assert back.shape == (8, 8, 3)
    np.testing.assert_allclose(back, img, atol=1.0 / 255.0 + 1e-6)


def test_checkpoint_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from blackhole_tpu.utils import checkpoint

    state = {"params": {"a": jnp.arange(4.0)}, "step": jnp.int32(7)}
    checkpoint.save(str(tmp_path / "ck"), 3, state)
    step, restored = checkpoint.restore(
        str(tmp_path / "ck"), template=state
    )
    assert step == 3
    np.testing.assert_allclose(
        np.asarray(restored["params"]["a"]), np.arange(4.0)
    )
