"""Live viewer loop: progressive ladder, accumulation, live reconfig.

Drives blackhole_tpu.viz.viewer headlessly with a scripted command
stream — the renderer.cpp:269-861 frame-loop capabilities without a
window.
"""

import io

import numpy as np

from blackhole_tpu.viz import viewer


def test_viewer_progressive_then_accumulates():
    """With no input, frames walk the quality ladder (1/32 -> 1/2) and
    then accumulate at full resolution with rising frame index."""
    stats = viewer.run(
        viewer.ViewerState(steps=120), width=32, height=24,
        max_frames=7, commands=[], draw=False,
    )
    assert stats["frames"] == 7
    assert stats["tiers"][:5] == ["1/32", "1/16", "1/8", "1/4", "1/2"]
    assert stats["tiers"][5] == "full+1"
    assert stats["tiers"][6] == "full+2"


def test_viewer_param_change_resets_refinement():
    """A live parameter change must restart the ladder (the camera-move
    reset, renderer.cpp:838-861)."""
    cmds = [None, None, "spin 0.9", None][:]
    stats = viewer.run(
        viewer.ViewerState(steps=120), width=32, height=24,
        max_frames=5, commands=["", "", "spin 0.9", "", ""], draw=False,
    )
    assert stats["resets"] == 1
    # Frames 1-3 descend the ladder, frame 4 restarts at 1/32.
    assert stats["tiers"][3] == "1/32"


def test_viewer_quit_and_errors():
    stats = viewer.run(
        viewer.ViewerState(steps=120), width=32, height=24,
        max_frames=10, commands=["bogus 1", "quit"], draw=False,
    )
    assert stats["frames"] == 2  # stopped by quit, not max_frames


def test_viewer_draws_ansi():
    """Drawing mode emits truecolor half-block rows + a status bar."""
    out = io.StringIO()
    viewer.run(
        viewer.ViewerState(steps=120), width=16, height=12,
        max_frames=1, commands=[], draw=True, out=out,
    )
    text = out.getvalue()
    assert "▀" in text and "\x1b[38;2;" in text
    assert "shadow=" in text and "isco=" in text


def test_ansi_frame_shape():
    img = np.zeros((8, 4, 3))
    img[:4] = 1.0
    s = viewer.ansi_frame(img)
    assert len(s.splitlines()) == 4  # 2 pixel rows per char row


def test_viewer_particle_overlay():
    """'particles on' seeds a pool and splats it onto the frame — the
    reference physics-thread + GL point-sprite path
    (renderer.cpp:863-1006, 1105-1226)."""
    import io as io_mod

    out = io_mod.StringIO()
    stats = viewer.run(
        viewer.ViewerState(steps=100, particles=True, n_particles=64,
                           disk=True),
        width=24, height=16, max_frames=2, commands=[], draw=True,
        out=out,
    )
    assert stats["frames"] == 2
    assert "▀" in out.getvalue()


def test_particle_overlay_splats_visible_points():
    import jax.numpy as jnp

    from blackhole_tpu.geom.types import Camera
    from blackhole_tpu.viz import effects

    cam = Camera.create(
        position=(0.0, -30.0, 0.0), direction=(0.0, 1.0, 0.0),
        up=(0.0, 0.0, 1.0), fov_deg=40.0,
    )
    img = jnp.zeros((16, 16, 3))
    pos = jnp.array([[0.0, 0.0, 0.0],      # dead ahead -> center
                     [0.0, -40.0, 0.0]])   # behind the camera -> culled
    temps = jnp.array([8000.0, 8000.0])
    active = jnp.array([True, True])
    out = effects.particle_overlay(img, pos, temps, active, cam)
    assert float(out[8, 8].sum()) > 0.0
    assert float(out.sum()) == float(out[8, 8].sum())  # only one splat


def test_viewer_state_commands():
    st = viewer.ViewerState()
    assert st.apply("mass 2.0") == "changed" and st.mass == 2.0
    assert st.apply("az +15") == "changed" and st.azimuth == 15.0
    assert st.apply("az -5") == "changed" and st.azimuth == 10.0
    assert st.apply("disk off") == "changed" and st.disk is False
    assert st.apply("spin 1.5").startswith("error")
    assert st.apply("quit") == "quit"


def test_viewer_charge_and_sky_commands():
    st = viewer.ViewerState()
    assert st.apply("charge 0.5") == "changed" and st.charge == 0.5
    st.apply("spin 0.9")
    assert st.apply("charge 0.9").startswith("error")  # super-extremal
    assert st.apply("sky on") == "changed" and st.sky is True
    scene = st.scene()
    assert scene.env_map is not None
    assert float(scene.blackhole.charge) == 0.5
    assert st.apply("sky off") == "changed"
    assert st.scene().env_map is None


def test_viewer_runs_with_sky_and_charge():
    st = viewer.ViewerState(steps=60, charge=0.4, sky=True)
    stats = viewer.run(
        st, width=24, height=16, max_frames=3, commands=[], draw=False
    )
    assert stats["frames"] == 3
