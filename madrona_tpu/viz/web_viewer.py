"""Interactive web viewer: flycam + sim controls over HTTP, stdlib-only.

The TPU replacement for the reference's GLFW/Vulkan viewer
(``src/viz/viewer.cpp`` — flycam, world switching, pause/single-step,
keyboard agent control): a display stack is wrong for a TPU host, so the
viewer serves a browser page instead. The page polls ``/frame.png``
(rendered by the batch raycaster with a free camera) and
``/topdown.png``, and posts key events that drive:

- flycam: W/A/S/D move, Q/E down/up, arrow keys yaw/pitch
  (viewer.cpp's CameraMoveSpeed-style controls)
- Space pause/resume, N single-step, R reset current world
- [ / ] switch world (viewer.cpp world index controls)
- optional env-specific agent control via ``key_to_inputs``

No dependencies beyond the stdlib http.server + the in-repo PNG encoder.
Start with ``WebViewer(...).serve()`` or see examples/viewer_demo.py.
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Dict, Optional

import numpy as np

from .viewer import render_topdown


def _png_bytes(img: np.ndarray) -> bytes:
    from .viewer import png_bytes

    return png_bytes(np.asarray(img))


def flycam_quat(yaw: float, pitch: float) -> np.ndarray:
    """Free-camera orientation quaternion (w,x,y,z): yaw around -z
    (screen-right positive), then pitch around +x."""
    cy, sy = np.cos(yaw / 2), np.sin(yaw / 2)
    cp, sp = np.cos(pitch / 2), np.sin(pitch / 2)
    qz = np.array([cy, 0.0, 0.0, -sy])
    qx = np.array([cp, sp, 0.0, 0.0])
    w1, x1, y1, z1 = qz
    w2, x2, y2, z2 = qx
    return np.array([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ])


def rgbd_panel(rgb: np.ndarray, depth: Optional[np.ndarray]) -> np.ndarray:
    """Compose one agent view into an [H, W or 2W, 3] float panel:
    RGB left, per-frame-normalized depth grayscale right (the RGBD
    overlay the reference viewer shows from its batch renderer,
    viewer.cpp's flyCamera/batchView toggle)."""
    rgb = np.asarray(rgb, np.float32)
    if depth is None:
        return rgb
    d = np.asarray(depth, np.float32)
    d = d / max(float(np.max(d)), 1e-6)
    return np.concatenate([rgb, np.repeat(d[..., None], 3, axis=-1)], axis=1)


_PAGE = """<!doctype html>
<html><head><title>madrona_tpu viewer</title><style>
body { background: #111; color: #ddd; font-family: monospace; }
img { image-rendering: pixelated; border: 1px solid #444; }
#hud { margin: 8px 0; }
#agents img { height: 128px; margin-right: 4px; }
</style></head><body>
<div id="hud">loading…</div>
<img id="cam" width="640" height="480">
<img id="top" width="480" height="480">
<div id="agents"></div>
<div>W/A/S/D move · Q/E down/up · arrows look · Space pause · N step ·
R reset · [ ] world</div>
<script>
let numViews = 0;
async function refresh() {
  const t = Date.now();
  document.getElementById('cam').src = '/frame.png?t=' + t;
  document.getElementById('top').src = '/topdown.png?t=' + t;
  const s = await (await fetch('/state')).json();
  document.getElementById('hud').textContent =
    `world ${s.world}  step ${s.step}  ` +
    (s.paused ? 'PAUSED' : 'running') +
    `  cam ${s.cam.map(v => v.toFixed(1))}`;
  if (s.num_views !== numViews) {
    numViews = s.num_views;
    const row = document.getElementById('agents');
    row.innerHTML = '';
    for (let v = 0; v < numViews; v++) {
      const im = document.createElement('img');
      im.id = 'agent' + v;
      row.appendChild(im);
    }
  }
  for (let v = 0; v < numViews; v++)
    document.getElementById('agent' + v).src = `/agent.png?v=${v}&t=${t}`;
}
setInterval(refresh, 100);
document.addEventListener('keydown', e => {
  fetch('/key?k=' + encodeURIComponent(e.key));
  if ([' ', 'ArrowUp', 'ArrowDown'].includes(e.key)) e.preventDefault();
});
</script></body></html>"""


class WebViewer:
    """Serve an interactive view of a running sim.

    Parameters
    ----------
    sim: models.base.Sim (or anything with .state, .step_fn())
    mesh: render.MeshTables for the RigidBody meshes
    render_obj: [N] int render object per body row
    body_arch: archetype holding Position/Rotation/Scale
    inputs_fn: () -> step inputs dict (defaults to all-zero int32 slots
        shaped like the env declares)
    key_to_inputs: optional (key, inputs) -> inputs hook for agent
        control (the viewer.cpp keyboard agent-control analogue)
    """

    def __init__(self, sim, mesh, render_obj, body_arch: str = "RigidBody",
                 width: int = 320, height: int = 240, fov_deg: float = 90.0,
                 inputs_fn: Optional[Callable[[], Dict]] = None,
                 key_to_inputs: Optional[Callable] = None,
                 world: int = 0, fps: float = 20.0,
                 body_mask=None,
                 rgb_key: str = "rgb", depth_key: str = "depth",
                 blas=None, materials=None):
        import jax
        import jax.numpy as jnp

        from ..render.raycast import RenderConfig, camera_rays, _trace_rays

        self.sim = sim
        self.world = world
        self.paused = False
        self.step_count = 0
        self.fps = fps
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self.cam_pos = np.array([0.0, -12.0, 6.0], np.float64)
        self.yaw = 0.0        # radians around +z; 0 looks along +y
        self.pitch = -0.3
        self.key_to_inputs = key_to_inputs
        self.body_arch = body_arch
        # step-output keys holding agent RGBD views ([W,V,H,Wd,3] /
        # [W,V,H,Wd]); populated by the env's render graph if any
        self.rgb_key = rgb_key
        self.depth_key = depth_key
        self.last_outputs: Dict = {}
        self._mesh = mesh
        self._render_obj = np.asarray(render_obj, np.int32)
        n = self._render_obj.shape[0]
        self._body_mask = (
            np.ones((n,), bool) if body_mask is None
            else np.asarray(body_mask, bool)
        )

        self._step = sim.step_fn()
        if inputs_fn is None:
            env = getattr(sim, "env", None)
            num_worlds = int(
                sim.state.tables[body_arch].columns["Position"].shape[0]
            )
            act_shape = getattr(env, "action_shape", ()) if env else ()

            def inputs_fn():
                return {
                    "action": jnp.zeros(
                        (num_worlds,) + act_shape, jnp.int32
                    ),
                    "reset": jnp.zeros((num_worlds,), jnp.int32),
                }

        self.inputs_fn = inputs_fn
        self.inputs = inputs_fn()

        cfg = RenderConfig(width=width, height=height, fov_deg=fov_deg)
        robj = jnp.asarray(self._render_obj)
        bmask = jnp.asarray(self._body_mask)

        if blas is not None:
            # BLAS flycam: imported meshes of real polycount with
            # materials/textures (the reference viewer renders the same
            # scene assets the batch renderer traces)
            from ..render.blas import trace_scene_blas

            def frame(pos, rot, scale, cam_pos, cam_rot):
                o, d = camera_rays(cfg, cam_pos, cam_rot)
                rgb, _ = trace_scene_blas(
                    cfg, blas, pos, rot, scale, robj, bmask,
                    o.reshape(-1, 3), d.reshape(-1, 3),
                    materials=materials,
                )
                return rgb.reshape(height, width, 3)
        else:
            def frame(pos, rot, scale, cam_pos, cam_rot):
                o, d = camera_rays(cfg, cam_pos, cam_rot)
                rgb, _ = _trace_rays(
                    cfg, mesh, pos, rot, scale, robj, bmask,
                    o.reshape(-1, 3), d.reshape(-1, 3),
                )
                return rgb.reshape(height, width, 3)

        self._frame = jax.jit(frame)
        self._jnp = jnp

    # ------------------------------------------------------------ control

    def handle_key(self, k: str) -> None:
        step_lin = 0.8
        step_ang = 0.12
        fwd = np.array(
            [np.sin(self.yaw), np.cos(self.yaw), 0.0]
        )
        right = np.array([np.cos(self.yaw), -np.sin(self.yaw), 0.0])
        with self._lock:
            if k == "w":
                self.cam_pos += fwd * step_lin
            elif k == "s":
                self.cam_pos -= fwd * step_lin
            elif k == "a":
                self.cam_pos -= right * step_lin
            elif k == "d":
                self.cam_pos += right * step_lin
            elif k == "q":
                self.cam_pos[2] -= step_lin
            elif k == "e":
                self.cam_pos[2] += step_lin
            elif k == "ArrowLeft":
                self.yaw -= step_ang
            elif k == "ArrowRight":
                self.yaw += step_ang
            elif k == "ArrowUp":
                self.pitch = min(self.pitch + step_ang, 1.5)
            elif k == "ArrowDown":
                self.pitch = max(self.pitch - step_ang, -1.5)
            elif k == " ":
                self.paused = not self.paused
            elif k == "n":
                self._advance_locked()
            elif k == "r":
                self._reset_world_locked()
            elif k == "[":
                self.world = max(0, self.world - 1)
            elif k == "]":
                self.world = min(self._num_worlds() - 1, self.world + 1)
            elif self.key_to_inputs is not None:
                self.inputs = self.key_to_inputs(k, self.inputs)

    def _num_worlds(self) -> int:
        t = self.sim.state.tables[self.body_arch]
        return int(t.columns["Position"].shape[0])

    def _advance_locked(self):
        state, outputs = self._step(self.sim.state, self.inputs)
        self.sim.state = state
        self.last_outputs = outputs or {}
        self.step_count += 1
        self.inputs = self.inputs_fn()   # one-shot inputs decay to zero

    def _reset_world_locked(self):
        jnp = self._jnp
        inp = dict(self.inputs)
        if "reset" in inp:
            inp["reset"] = (
                jnp.zeros_like(inp["reset"]).at[self.world].set(1)
            )
        state, outputs = self._step(self.sim.state, inp)
        self.sim.state = state
        self.last_outputs = outputs or {}
        self.step_count += 1

    def tick(self) -> None:
        """Advance one sim step if running (called by the loop thread)."""
        with self._lock:
            if not self.paused:
                self._advance_locked()

    # ------------------------------------------------------------- frames

    def _cam_quat(self) -> np.ndarray:
        return flycam_quat(self.yaw, self.pitch)

    def _num_views(self) -> int:
        rgb = self.last_outputs.get(self.rgb_key)
        return 0 if rgb is None or np.ndim(rgb) < 5 else int(rgb.shape[1])

    def frame_png(self) -> bytes:
        jnp = self._jnp
        with self._lock:
            t = self.sim.state.tables[self.body_arch]
            w = self.world
            img = self._frame(
                t.columns["Position"][w], t.columns["Rotation"][w],
                t.columns["Scale"][w],
                jnp.asarray(self.cam_pos, jnp.float32),
                jnp.asarray(self._cam_quat(), jnp.float32),
            )
        return _png_bytes(np.asarray(img))

    def agent_png(self, view: int = 0) -> bytes:
        """One agent camera's RGBD observation from the last step's
        outputs (RGB | normalized-depth side by side) — the reference
        viewer's batch-renderer view panel."""
        with self._lock:
            nv = self._num_views()
            if nv == 0:
                return _png_bytes(np.full((8, 8, 3), 0.15, np.float32))
            view = min(max(view, 0), nv - 1)
            rgb = np.asarray(
                self.last_outputs[self.rgb_key][self.world, view],
                np.float32,
            )
            d = self.last_outputs.get(self.depth_key)
            d = None if d is None else self.last_outputs[self.depth_key][
                self.world, view
            ]
            return _png_bytes(rgbd_panel(rgb, d))

    def topdown_png(self) -> bytes:
        with self._lock:
            t = self.sim.state.tables[self.body_arch]
            img = render_topdown(
                np.asarray(t.columns["Position"]),
                np.asarray(t.columns["Scale"]),
                world=self.world, res=256,
            )
        return _png_bytes(img)

    def state_json(self) -> bytes:
        with self._lock:
            return json.dumps({
                "world": self.world,
                "step": self.step_count,
                "paused": self.paused,
                "cam": list(self.cam_pos) + [self.yaw, self.pitch],
                "num_worlds": self._num_worlds(),
                "num_views": self._num_views(),
            }).encode()

    # ------------------------------------------------------------- server

    def make_server(self, port: int = 0) -> ThreadingHTTPServer:
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                path, _, query = self.path.partition("?")
                try:
                    if path == "/":
                        body, ctype = _PAGE.encode(), "text/html"
                    elif path == "/frame.png":
                        body, ctype = viewer.frame_png(), "image/png"
                    elif path == "/topdown.png":
                        body, ctype = viewer.topdown_png(), "image/png"
                    elif path == "/agent.png":
                        from urllib.parse import parse_qs

                        v = int(parse_qs(query).get("v", ["0"])[0])
                        body, ctype = viewer.agent_png(v), "image/png"
                    elif path == "/state":
                        body, ctype = viewer.state_json(), "application/json"
                    elif path == "/key":
                        from urllib.parse import parse_qs

                        k = parse_qs(query).get("k", [""])[0]
                        viewer.handle_key(k)
                        body, ctype = b"ok", "text/plain"
                    else:
                        self.send_error(404)
                        return
                except BrokenPipeError:
                    return
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Cache-Control", "no-store")
                self.end_headers()
                self.wfile.write(body)

        return ThreadingHTTPServer(("127.0.0.1", port), Handler)

    def serve(self, port: int = 8787) -> None:
        """Blocking: run the sim loop + HTTP server until Ctrl-C."""
        srv = self.make_server(port)
        print(f"viewer at http://127.0.0.1:{srv.server_address[1]}/")
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            while not self._stop.is_set():
                t0 = time.time()
                self.tick()
                dt = 1.0 / self.fps - (time.time() - t0)
                if dt > 0:
                    time.sleep(dt)
        except KeyboardInterrupt:
            pass
        finally:
            srv.shutdown()

    def stop(self) -> None:
        self._stop.set()
