"""Recorder playback: scrub a saved trajectory in the browser.

The offline half of the reference's viewer loop: ``viz::Recorder``
captures per-step state (``src/viz/recorder.cpp``) and the viewer
replays it. Here ``Recorder.save`` writes an .npz of ``[T, W, ...]``
arrays; ``PlaybackViewer`` serves a page with a step slider, play/pause,
world switching, the same flycam as the live ``WebViewer`` (re-rendering
any step through the batch raycaster when mesh tables are provided), a
top-down schematic, and the recorded per-agent RGBD views if the
trajectory captured them.

Endpoints are stateless in the step index (``?t=``) so scrubbing is
just image reloads; only the flycam lives server-side.

Usage::

    rec = Recorder(capture={"Position": ..., "Rotation": ..., ...})
    ... run sim, rec.record(state, outputs) each step ...
    PlaybackViewer(rec.stacked(), mesh=mesh, render_obj=robj).serve()
    # or later: PlaybackViewer(Recorder.load("ep.npz"), ...)
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional
from urllib.parse import parse_qs

import numpy as np

from .viewer import render_topdown
from .web_viewer import _png_bytes, flycam_quat, rgbd_panel

_PAGE = """<!doctype html>
<html><head><title>madrona_tpu playback</title><style>
body { background: #111; color: #ddd; font-family: monospace; }
img { image-rendering: pixelated; border: 1px solid #444; }
#hud { margin: 8px 0; }
#agents img { height: 128px; margin-right: 4px; }
#bar { width: 640px; }
</style></head><body>
<div id="hud">loading…</div>
<div><input type="range" id="bar" min="0" max="0" value="0">
<button id="play">play</button></div>
<img id="cam" width="640" height="480">
<img id="top" width="480" height="480">
<div id="agents"></div>
<div>W/A/S/D move · Q/E down/up · arrows look · [ ] world ·
,/. step back/fwd · Space play/pause</div>
<script>
let meta = null, t = 0, world = 0, playing = false;
const bar = document.getElementById('bar');
function show() {
  const n = Date.now();
  if (meta.has_cam)
    document.getElementById('cam').src = `/frame.png?t=${t}&w=${world}&n=${n}`;
  if (meta.has_topdown)
    document.getElementById('top').src = `/topdown.png?t=${t}&w=${world}&n=${n}`;
  for (let v = 0; v < meta.num_views; v++)
    document.getElementById('agent' + v).src =
      `/agent.png?t=${t}&w=${world}&v=${v}&n=${n}`;
  document.getElementById('hud').textContent =
    `step ${t}/${meta.steps - 1}  world ${world}` +
    (playing ? '  PLAYING' : '');
  bar.value = t;
}
async function boot() {
  meta = await (await fetch('/meta')).json();
  bar.max = meta.steps - 1;
  const row = document.getElementById('agents');
  for (let v = 0; v < meta.num_views; v++) {
    const im = document.createElement('img');
    im.id = 'agent' + v;
    row.appendChild(im);
  }
  if (!meta.has_cam) document.getElementById('cam').style.display = 'none';
  show();
}
bar.addEventListener('input', () => { t = +bar.value; show(); });
document.getElementById('play').addEventListener('click', () => {
  playing = !playing;
});
setInterval(() => {
  if (playing && meta) { t = (t + 1) % meta.steps; show(); }
}, 100);
document.addEventListener('keydown', async e => {
  if (!meta) return;
  if (e.key === '.') { t = Math.min(t + 1, meta.steps - 1); show(); }
  else if (e.key === ',') { t = Math.max(t - 1, 0); show(); }
  else if (e.key === ' ') { playing = !playing; e.preventDefault(); }
  else if (e.key === '[') { world = Math.max(world - 1, 0); show(); }
  else if (e.key === ']') {
    world = Math.min(world + 1, meta.num_worlds - 1); show();
  } else {
    await fetch('/key?k=' + encodeURIComponent(e.key));
    show();
    if (['ArrowUp', 'ArrowDown'].includes(e.key)) e.preventDefault();
  }
});
boot();
</script></body></html>"""


class PlaybackViewer:
    """Serve a recorded trajectory for scrubbing.

    Parameters
    ----------
    traj: dict of ``[T, ...]`` arrays (``Recorder.stacked()`` /
        ``Recorder.load``). Body state under ``pos_key``/``rot_key``/
        ``scale_key`` (each ``[T, W, N, ...]``) enables the flycam
        re-render (requires ``mesh`` + ``render_obj``) and the top-down
        view; ``rgb_key``/``depth_key`` (``[T, W, V, H, Wd, ...]``)
        enable the agent RGBD panels.
    mesh: render.MeshTables for re-rendering (optional)
    render_obj: [N] int render object per body row (with ``mesh``)
    """

    def __init__(self, traj: Dict[str, np.ndarray], mesh=None,
                 render_obj=None, body_mask=None,
                 width: int = 320, height: int = 240, fov_deg: float = 90.0,
                 pos_key: str = "Position", rot_key: str = "Rotation",
                 scale_key: str = "Scale",
                 rgb_key: str = "rgb", depth_key: str = "depth"):
        self.traj = {k: np.asarray(v) for k, v in traj.items()}
        self.pos_key, self.rot_key, self.scale_key = (
            pos_key, rot_key, scale_key
        )
        self.rgb_key, self.depth_key = rgb_key, depth_key
        self._lock = threading.Lock()
        self.cam_pos = np.array([0.0, -12.0, 6.0], np.float64)
        self.yaw = 0.0
        self.pitch = -0.3
        self.width, self.height = width, height

        self.steps = max(
            (int(v.shape[0]) for v in self.traj.values()), default=0
        )
        pos = self.traj.get(pos_key)
        rgb = self.traj.get(rgb_key)
        self.num_worlds = int(
            pos.shape[1] if pos is not None
            else rgb.shape[1] if rgb is not None else 1
        )
        self.num_views = int(
            rgb.shape[2]
        ) if rgb is not None and rgb.ndim >= 6 else 0

        self._frame = None
        if mesh is not None and render_obj is not None and pos is not None:
            import jax
            import jax.numpy as jnp

            from ..render.raycast import (
                RenderConfig, camera_rays, _trace_rays,
            )

            cfg = RenderConfig(width=width, height=height, fov_deg=fov_deg)
            robj = jnp.asarray(np.asarray(render_obj, np.int32))
            n = robj.shape[0]
            bmask = jnp.asarray(
                np.ones((n,), bool) if body_mask is None
                else np.asarray(body_mask, bool)
            )

            def frame(p, r, s, cam_pos, cam_rot):
                o, d = camera_rays(cfg, cam_pos, cam_rot)
                rgb_, _ = _trace_rays(
                    cfg, mesh, p, r, s, robj, bmask,
                    o.reshape(-1, 3), d.reshape(-1, 3),
                )
                return rgb_.reshape(height, width, 3)

            self._frame = jax.jit(frame)

    # ------------------------------------------------------------- frames

    def _clamp(self, t: int, w: int):
        return (
            min(max(t, 0), self.steps - 1),
            min(max(w, 0), self.num_worlds - 1),
        )

    def frame_png(self, t: int, world: int) -> bytes:
        import jax.numpy as jnp

        t, world = self._clamp(t, world)
        with self._lock:
            img = self._frame(
                jnp.asarray(self.traj[self.pos_key][t, world]),
                jnp.asarray(self.traj[self.rot_key][t, world]),
                jnp.asarray(self.traj[self.scale_key][t, world]),
                jnp.asarray(self.cam_pos, jnp.float32),
                jnp.asarray(flycam_quat(self.yaw, self.pitch), jnp.float32),
            )
        return _png_bytes(np.asarray(img))

    def topdown_png(self, t: int, world: int) -> bytes:
        t, world = self._clamp(t, world)
        img = render_topdown(
            self.traj[self.pos_key][t],
            self.traj[self.scale_key][t],
            world=world, res=256,
        )
        return _png_bytes(img)

    def agent_png(self, t: int, world: int, view: int) -> bytes:
        t, world = self._clamp(t, world)
        view = min(max(view, 0), self.num_views - 1)
        rgb = self.traj[self.rgb_key][t, world, view]
        d = self.traj.get(self.depth_key)
        d = None if d is None else d[t, world, view]
        return _png_bytes(rgbd_panel(rgb, d))

    def meta_json(self) -> bytes:
        return json.dumps({
            "steps": self.steps,
            "num_worlds": self.num_worlds,
            "num_views": self.num_views,
            "has_cam": self._frame is not None,
            "has_topdown": (self.pos_key in self.traj
                            and self.scale_key in self.traj),
            "keys": sorted(self.traj.keys()),
        }).encode()

    def handle_key(self, k: str) -> None:
        """Flycam subset of the live viewer's controls."""
        step_lin, step_ang = 0.8, 0.12
        fwd = np.array([np.sin(self.yaw), np.cos(self.yaw), 0.0])
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

    # ------------------------------------------------------------- server

    def make_server(self, port: int = 0) -> ThreadingHTTPServer:
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                path, _, query = self.path.partition("?")
                q = parse_qs(query)
                geti = lambda k: int(q.get(k, ["0"])[0])
                try:
                    if path == "/":
                        body, ctype = _PAGE.encode(), "text/html"
                    elif path == "/meta":
                        body, ctype = (
                            viewer.meta_json(), "application/json"
                        )
                    elif path == "/frame.png" and viewer._frame is not None:
                        body, ctype = (
                            viewer.frame_png(geti("t"), geti("w")),
                            "image/png",
                        )
                    elif path == "/topdown.png" and (
                        viewer.pos_key in viewer.traj
                        and viewer.scale_key in viewer.traj
                    ):
                        body, ctype = (
                            viewer.topdown_png(geti("t"), geti("w")),
                            "image/png",
                        )
                    elif path == "/agent.png" and viewer.num_views:
                        body, ctype = (
                            viewer.agent_png(
                                geti("t"), geti("w"), geti("v")
                            ),
                            "image/png",
                        )
                    elif path == "/key":
                        viewer.handle_key(q.get("k", [""])[0])
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

    def serve(self, port: int = 8788) -> None:
        """Blocking: serve until Ctrl-C."""
        srv = self.make_server(port)
        print(f"playback at http://127.0.0.1:{srv.server_address[1]}/")
        try:
            srv.serve_forever()
        except KeyboardInterrupt:
            srv.shutdown()
