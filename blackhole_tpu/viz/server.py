"""Browser frontend: a dependency-light HTTP render server.

The reference's flagship UX is a 1280x720 OpenGL window with ImGui
sliders (/root/reference/src/visualization/renderer.cpp:269-861, UI at
:739-836).  This is its TPU-host analog without any GL dependency: a
stdlib HTTP server streams progressively-refined PNG frames to a canvas
and maps the ImGui controls onto the same text-command grammar the
terminal viewer uses (viz.viewer.ViewerState.apply — mass/spin/fov/
orbit-camera/steps/disk/sky/particles).  The canvas is navigable like
the reference's window (renderer.cpp:815-817): drag to orbit, wheel to
zoom, WASD/arrow keys nudge azimuth/elevation, Q/E zoom — all mapped
onto the az/el/dist commands.

Architecture mirrors the reference's thread split (renderer.cpp:863-1006
physics thread + mutex/condvar double buffer):

* a RENDER thread owns the device: progressive quality ladder
  (animate.QUALITY_LADDER = the renderer.cpp:1289-1319 tiers), then
  full-resolution temporal accumulation (renderer.cpp:1691-1877),
  restarting whenever a parameter command lands;
* HTTP handler threads only read the latest encoded PNG under a lock
  (the double-buffered RenderData analog) and push commands onto the
  state — never touching JAX.

Run:  python -m blackhole_tpu.cli serve [--port 8000]
"""

from __future__ import annotations

import dataclasses
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from blackhole_tpu.metrics import derived
from blackhole_tpu.render import image as image_mod
from blackhole_tpu.viz import animate
from blackhole_tpu.viz.viewer import ViewerState


def _encode_png(frame: np.ndarray) -> bytes:
    """(H, W, 3) float [0,1] -> PNG bytes (PIL, which ships in the
    image; no GL/GUI dependency)."""
    from PIL import Image

    u8 = np.clip(np.asarray(frame) * 255.0, 0, 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(u8).save(buf, format="PNG")
    return buf.getvalue()


class RenderServer:
    """Shared state between the render thread and HTTP handlers."""

    def __init__(self, state: ViewerState | None = None,
                 width: int = 480, height: int = 270,
                 accum_frames: int = 32):
        self.state = state or ViewerState()
        self.width = width
        self.height = height
        self.accum_frames = accum_frames
        self._lock = threading.Lock()  # guards everything below
        self._png: bytes = b""
        self._seq = 0
        self._tier = "startup"
        self._render_ms = 0.0
        self._dirty = True  # restart the ladder (param change)
        self._running = True
        self._status = "ready"

    # ---- command side (HTTP handler threads) ----
    def apply(self, line: str) -> str:
        with self._lock:
            action = self.state.apply(line)
            if action == "changed":
                self._dirty = True
                self._status = f"applied: {line.strip()}"
            elif action.startswith("error"):
                self._status = action
            return action

    def frame(self):
        with self._lock:
            return self._png, self._seq, self._tier

    def stats(self) -> dict:
        with self._lock:
            s = self.state
            return {
                "mass": s.mass, "spin": s.spin, "charge": s.charge,
                "fov": s.fov, "distance": s.distance,
                "elevation": s.elevation, "azimuth": s.azimuth,
                "steps": s.steps, "disk": s.disk, "sky": s.sky,
                "particles": s.particles,
                "shadow_radius": float(derived.shadow_radius(s.mass, s.spin)),
                "isco": float(derived.isco_radius(s.mass, s.spin)),
                "seq": self._seq, "tier": self._tier,
                "render_ms": round(self._render_ms, 1),
                "status": self._status,
            }

    def stop(self):
        with self._lock:
            self._running = False

    # ---- render side (single background thread; owns JAX) ----
    def _publish(self, frame: np.ndarray, tier: str, dt: float):
        png = _encode_png(frame)
        with self._lock:
            self._png = png
            self._seq += 1
            self._tier = tier
            self._render_ms = dt * 1000.0

    def render_loop(self, max_frames: int | None = None):
        """Progressive render loop (the physics/render-thread analog).

        max_frames: stop after N published frames (tests); None = run
        until stop()."""
        frames = 0
        history = None
        accum_idx = 0
        jitter_idx = 0
        psystem = None  # lazy particle pool (physics-thread analog)
        ladder = iter(animate.QUALITY_LADDER)
        while True:
            with self._lock:
                if not self._running:
                    return
                if self._dirty:
                    ladder = iter(animate.QUALITY_LADDER)
                    history = None
                    accum_idx = 0
                    jitter_idx = 0
                    self._dirty = False
                scene = self.state.scene()
                camera = self.state.camera()
            t0 = time.perf_counter()
            tier = next(ladder, None)
            if tier is not None:
                divisor, steps = tier
                w = max(8, self.width // divisor)
                h = max(8, self.height // divisor)
                dt_scale = max(1.0, self.state.steps / max(steps, 20))
                cfg = dataclasses.replace(
                    scene.config, max_steps=max(steps, 20),
                    time_step=scene.config.time_step * dt_scale,
                )
                img = image_mod.render_image(
                    dataclasses.replace(scene, config=cfg), camera, w, h
                )
                frame = np.repeat(
                    np.repeat(np.asarray(img), self.height // h, 0),
                    self.width // w, 1,
                )[:self.height, :self.width]
                tier_label = f"1/{divisor}"
            else:
                import jax.numpy as jnp

                from blackhole_tpu.render import camera as cam_mod

                ox, oy = cam_mod.jitter_offsets(
                    jitter_idx, self.accum_frames
                )
                jitter_idx += 1
                origins, dirs = cam_mod.generate_rays(
                    camera, self.width, self.height, ox, oy
                )
                hit = image_mod.trace_rays_fast(
                    origins.reshape(-1, 3), dirs.reshape(-1, 3), scene
                )
                new = np.asarray(hit.color).reshape(
                    self.height, self.width, 3
                )
                if history is None:
                    history, accum_idx = new, 1
                else:
                    hist, idx = image_mod.temporal_accumulate(
                        jnp.asarray(history), jnp.asarray(new), accum_idx,
                        max_frames=self.accum_frames,
                    )
                    history, accum_idx = np.asarray(hist), int(idx)
                frame = history
                tier_label = f"full+{accum_idx}"
                if self.state.particles:
                    frame, psystem = self._overlay_particles(
                        frame, psystem, scene, camera
                    )
                else:
                    psystem = None
                if accum_idx >= self.accum_frames:
                    # Converged: idle until the next parameter change.
                    self._publish(frame, tier_label,
                                  time.perf_counter() - t0)
                    frames += 1
                    if max_frames is not None and frames >= max_frames:
                        return
                    while True:
                        with self._lock:
                            if not self._running or self._dirty:
                                break
                        time.sleep(0.05)
                    continue
            if tier is not None and self.state.particles:
                frame, psystem = self._overlay_particles(
                    frame, psystem, scene, camera
                )
            self._publish(frame, tier_label, time.perf_counter() - t0)
            frames += 1
            if max_frames is not None and frames >= max_frames:
                return

    def _overlay_particles(self, frame, psystem, scene, camera):
        """Step + splat the live disk-particle pool over the frame
        (viewer.run's overlay; renderer.cpp:1105-1226 analog)."""
        import jax
        import jax.numpy as jnp

        from blackhole_tpu.particles import dynamics, generators
        from blackhole_tpu.particles import system as psys_mod
        from blackhole_tpu.viz import effects

        if psystem is None:
            psystem = psys_mod.ParticleSystem.create(self.state.n_particles)
            psystem, _ = generators.create_accretion_disk(
                psystem, jax.random.PRNGKey(0), self.state.n_particles,
                scene.blackhole, scene.disk,
            )
        psystem = dynamics.update_particles(
            psystem, scene.blackhole, scene.config
        )
        frame = np.asarray(effects.particle_overlay(
            jnp.asarray(frame), psystem.position,
            psystem.temperature, psystem.active, camera,
        ))
        return frame, psystem


_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>blackhole_tpu</title>
<style>
 body{background:#0b0e14;color:#cdd6e3;font:14px system-ui;margin:0;
      display:flex;min-height:100vh}
 #view{flex:1;display:flex;align-items:center;justify-content:center}
 #frame{image-rendering:auto;max-width:100%;border:1px solid #222}
 #panel{width:300px;padding:14px;background:#11151f;overflow-y:auto}
 label{display:block;margin:10px 0 2px;color:#8fa1b8}
 input[type=range]{width:100%}
 .val{float:right;color:#e6edf6}
 #stats{margin-top:14px;font:12px ui-monospace,monospace;color:#7d8fa8;
        white-space:pre-line}
 #cmd{width:100%;box-sizing:border-box;background:#0b0e14;color:#cdd6e3;
      border:1px solid #333;padding:5px;margin-top:10px}
 h1{font-size:15px;margin:0 0 6px}
 .chk{margin:8px 0}
</style></head><body>
<div id="view"><img id="frame" alt="render"></div>
<div id="panel">
 <h1>blackhole_tpu</h1>
 <div style="font:12px ui-monospace,monospace;color:#7d8fa8">
   drag: orbit &nbsp; wheel: zoom &nbsp; WASD/arrows: orbit &nbsp;
   Q/E: zoom</div>
 <div id="sliders"></div>
 <div class="chk"><input type="checkbox" id="disk" checked>
   <label for="disk" style="display:inline">accretion disk</label></div>
 <div class="chk"><input type="checkbox" id="sky">
   <label for="sky" style="display:inline">lensed starfield</label></div>
 <div class="chk"><input type="checkbox" id="particles">
   <label for="particles" style="display:inline">particles</label></div>
 <input id="cmd" placeholder="command (e.g. charge 0.3) — enter">
 <div id="stats"></div>
</div>
<script>
const SLIDERS = [
 ["mass", 0.2, 3, 0.01], ["spin", 0, 0.998, 0.002],
 ["fov", 5, 90, 1], ["dist", 8, 120, 1],
 ["el", -89, 89, 1], ["az", -180, 180, 1], ["steps", 50, 2000, 10]];
const KEYMAP = {dist:"distance", el:"elevation", az:"azimuth"};
const box = document.getElementById("sliders");
for (const [name, lo, hi, st] of SLIDERS) {
  const l = document.createElement("label");
  l.textContent = name;
  const v = document.createElement("span");
  v.className = "val"; v.id = "v_" + name; l.appendChild(v);
  const r = document.createElement("input");
  r.type = "range"; r.min = lo; r.max = hi; r.step = st; r.id = name;
  r.oninput = () => { v.textContent = r.value; };
  // "=": absolute — az/el/dist treat a bare +/- as relative
  r.onchange = () => send(name + " =" + r.value);
  box.appendChild(l); box.appendChild(r);
}
for (const id of ["disk", "sky", "particles"]) {
  document.getElementById(id).onchange =
    (e) => send(id + " " + (e.target.checked ? "on" : "off"));
}
document.getElementById("cmd").addEventListener("keydown", (e) => {
  if (e.key === "Enter") { send(e.target.value); e.target.value = ""; }
});
async function send(line) {
  await fetch("/cmd", {method: "POST", body: line});
}
// --- camera navigation on the canvas (renderer.cpp:815-817 analog:
// the reference advertises mouse-look + WASD; here drag orbits,
// wheel zooms, WASD/arrows nudge, Q/E zoom) ---
const nav = {az: 0, el: 20, dist: 35, active: false, wt: 0, kt: 0};
const img = document.getElementById("frame");
img.style.cursor = "grab"; img.draggable = false;
let drag = null, lastSend = 0;
function wrapAz(a) {
  while (a > 180) a -= 360; while (a < -180) a += 360; return a;
}
function sendOrbit(throttle) {
  const now = Date.now();
  if (throttle && now - lastSend < 160) return;
  lastSend = now;
  send("az =" + nav.az.toFixed(1));
  send("el =" + nav.el.toFixed(1));
}
img.addEventListener("pointerdown", (e) => {
  drag = {x: e.clientX, y: e.clientY, az: nav.az, el: nav.el};
  nav.active = true; img.style.cursor = "grabbing";
  img.setPointerCapture(e.pointerId); e.preventDefault();
});
img.addEventListener("pointermove", (e) => {
  if (!drag) return;
  nav.az = wrapAz(drag.az + (e.clientX - drag.x) * 0.4);
  nav.el = Math.max(-89, Math.min(89,
    drag.el + (e.clientY - drag.y) * 0.4));
  sendOrbit(true);
});
img.addEventListener("pointerup", () => {
  if (!drag) return;
  drag = null; img.style.cursor = "grab";
  lastSend = 0; sendOrbit(false);
  setTimeout(() => { nav.active = false; }, 400);
});
img.addEventListener("wheel", (e) => {
  e.preventDefault(); nav.active = true;
  nav.dist = Math.max(8, Math.min(120,
    nav.dist * Math.exp(e.deltaY * 0.001)));
  const now = Date.now();
  if (now - lastSend > 160) {
    lastSend = now; send("dist =" + nav.dist.toFixed(1));
  }
  clearTimeout(nav.wt);
  nav.wt = setTimeout(() => {
    send("dist =" + nav.dist.toFixed(1)); nav.active = false;
  }, 250);
}, {passive: false});
document.addEventListener("keydown", (e) => {
  if (document.activeElement &&
      ["cmd"].includes(document.activeElement.id)) return;
  const k = e.key.toLowerCase();
  const step = e.shiftKey ? 15 : 5;
  let orbit = false, zoom = false;
  if (k === "a" || k === "arrowleft") { nav.az = wrapAz(nav.az - step); orbit = true; }
  else if (k === "d" || k === "arrowright") { nav.az = wrapAz(nav.az + step); orbit = true; }
  else if (k === "w" || k === "arrowup") { nav.el = Math.min(89, nav.el + step); orbit = true; }
  else if (k === "s" || k === "arrowdown") { nav.el = Math.max(-89, nav.el - step); orbit = true; }
  else if (k === "q" || k === "-") { nav.dist = Math.min(120, nav.dist * 1.12); zoom = true; }
  else if (k === "e" || k === "+" || k === "=") { nav.dist = Math.max(8, nav.dist / 1.12); zoom = true; }
  else return;
  e.preventDefault(); nav.active = true;
  if (orbit) { lastSend = 0; sendOrbit(false); }
  if (zoom) send("dist =" + nav.dist.toFixed(1));
  clearTimeout(nav.kt);
  nav.kt = setTimeout(() => { nav.active = false; }, 400);
});
let seq = -1;
async function poll() {
  try {
    const s = await (await fetch("/state")).json();
    if (!nav.active) {
      nav.az = s.azimuth; nav.el = s.elevation; nav.dist = s.distance;
    }
    for (const [name] of SLIDERS) {
      const r = document.getElementById(name);
      if (document.activeElement !== r) {
        r.value = s[KEYMAP[name] || name];
        document.getElementById("v_" + name).textContent =
          Number(r.value).toFixed(2).replace(/\\.?0+$/, "");
      }
    }
    document.getElementById("stats").textContent =
      `shadow ${s.shadow_radius.toFixed(2)} M   isco ${s.isco.toFixed(2)} M\\n` +
      `tier ${s.tier}   ${s.render_ms} ms/frame\\n${s.status}`;
    if (s.seq !== seq) {
      seq = s.seq;
      document.getElementById("frame").src = "/frame.png?seq=" + seq;
    }
  } catch (e) {}
  setTimeout(poll, 150);
}
poll();
</script></body></html>
"""


class _Handler(BaseHTTPRequestHandler):
    server_ref: RenderServer  # set by serve()

    def _send(self, code, body: bytes, ctype: str):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.send_header("Cache-Control", "no-store")
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802 (stdlib API)
        path = self.path.split("?")[0]
        if path == "/":
            self._send(200, _PAGE.encode(), "text/html; charset=utf-8")
        elif path == "/frame.png":
            png, seq, _ = self.server_ref.frame()
            if not png:
                self._send(503, b"no frame yet", "text/plain")
            else:
                self._send(200, png, "image/png")
        elif path == "/state":
            self._send(
                200, json.dumps(self.server_ref.stats()).encode(),
                "application/json",
            )
        else:
            self._send(404, b"not found", "text/plain")

    def do_POST(self):  # noqa: N802
        if self.path.split("?")[0] != "/cmd":
            self._send(404, b"not found", "text/plain")
            return
        n = int(self.headers.get("Content-Length", 0) or 0)
        line = self.rfile.read(n).decode("utf-8", "replace")
        action = self.server_ref.apply(line)
        self._send(200, json.dumps({"action": action}).encode(),
                   "application/json")

    def log_message(self, *args):  # quiet
        pass


def serve(host: str = "127.0.0.1", port: int = 8000,
          state: ViewerState | None = None, width: int = 480,
          height: int = 270, block: bool = True):
    """Start the render server.  Returns (httpd, render_thread).

    block=False (tests/embedding): caller drives/joins; the render loop
    still runs in its daemon thread."""
    rs = RenderServer(state, width, height)
    handler = type("BoundHandler", (_Handler,), {"server_ref": rs})
    httpd = ThreadingHTTPServer((host, port), handler)
    httpd.render_server = rs
    rt = threading.Thread(target=rs.render_loop, daemon=True)
    rt.start()
    httpd.render_thread = rt
    st = threading.Thread(target=httpd.serve_forever, daemon=True)
    st.start()
    if block:
        print(f"serving on http://{host}:{httpd.server_address[1]}/ "
              f"(ctrl-c to stop)")
        try:
            while True:
                time.sleep(1.0)
        except KeyboardInterrupt:
            pass
        finally:
            rs.stop()
            rt.join(timeout=60)  # don't kill a thread mid-XLA-call
            httpd.shutdown()
    return httpd, rt
