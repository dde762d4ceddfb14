"""Browser render server (viz.server): HTTP surface + render thread.

The C19 interactive-frontend analog (renderer.cpp:269-861) without GL:
progressive PNG frames over HTTP + the viewer command grammar.
"""

import json
import time
import urllib.request

import pytest

from blackhole_tpu.viz import server as srv
from blackhole_tpu.viz.viewer import ViewerState


@pytest.fixture(scope="module")
def running_server():
    state = ViewerState(steps=60)
    httpd, rt = srv.serve(
        host="127.0.0.1", port=0, state=state, width=32, height=16,
        block=False,
    )
    port = httpd.server_address[1]
    # Wait for the first published frame (first jit ~ seconds on CPU).
    deadline = time.time() + 120
    while time.time() < deadline:
        if httpd.render_server.frame()[0]:
            break
        time.sleep(0.2)
    yield httpd, port
    httpd.render_server.stop()
    # Join the render thread before interpreter teardown: a daemon
    # thread killed mid-XLA-call can abort the process on exit.
    httpd.render_thread.join(timeout=60)
    httpd.shutdown()


def _get(port, path):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}{path}", timeout=30
    ) as r:
        return r.status, r.headers.get("Content-Type", ""), r.read()


def test_index_page(running_server):
    _, port = running_server
    status, ctype, body = _get(port, "/")
    assert status == 200 and ctype.startswith("text/html")
    assert b"blackhole_tpu" in body and b"/frame.png" in body


def test_frame_is_png(running_server):
    _, port = running_server
    status, ctype, body = _get(port, "/frame.png")
    assert status == 200 and ctype == "image/png"
    assert body[:8] == b"\x89PNG\r\n\x1a\n"


def test_state_reports_physics(running_server):
    _, port = running_server
    status, _, body = _get(port, "/state")
    s = json.loads(body)
    assert status == 200
    assert s["mass"] == 1.0 and 0 < s["shadow_radius"] < 10
    assert s["isco"] > 0 and s["seq"] >= 1


def test_command_roundtrip_and_refinement_reset(running_server):
    httpd, port = running_server
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/cmd", data=b"mass 1.5", method="POST"
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        assert json.loads(r.read())["action"] == "changed"
    _, _, body = _get(port, "/state")
    s = json.loads(body)
    assert s["mass"] == 1.5
    # Bad command surfaces an error, doesn't crash the server.
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/cmd", data=b"warp 9", method="POST"
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        assert json.loads(r.read())["action"].startswith("error")


def test_particles_overlay_renders(running_server):
    """Turning particles on must keep frames flowing (the overlay path
    steps the pool and splats sprites without crashing the thread)."""
    httpd, port = running_server
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/cmd", data=b"particles on",
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        assert json.loads(r.read())["action"] == "changed"
    seq0 = httpd.render_server.frame()[1]
    deadline = time.time() + 120
    while time.time() < deadline:
        if httpd.render_server.frame()[1] > seq0 + 1:
            break
        time.sleep(0.2)
    assert httpd.render_server.frame()[1] > seq0 + 1
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/cmd", data=b"particles off",
        method="POST",
    )
    urllib.request.urlopen(req, timeout=30).read()


def test_unknown_path_404(running_server):
    _, port = running_server
    try:
        _get(port, "/nope")
        raised = False
    except urllib.error.HTTPError as e:
        raised = e.code == 404
    assert raised
