"""Playback viewer + WebViewer RGBD-overlay tests (all over HTTP)."""

import http.client
import json
import threading

import numpy as np
import pytest


def _traj(T=4, W=2, N=3, V=2, H=6, Wd=8):
    rs = np.random.RandomState(3)
    pos = rs.rand(T, W, N, 3).astype(np.float32) * 4 - 2
    pos[..., 2] = np.abs(pos[..., 2])
    rot = np.zeros((T, W, N, 4), np.float32)
    rot[..., 0] = 1.0
    scale = np.ones((T, W, N, 3), np.float32) * 0.5
    rgb = rs.rand(T, W, V, H, Wd, 3).astype(np.float32)
    depth = rs.rand(T, W, V, H, Wd).astype(np.float32) * 10
    return {
        "Position": pos, "Rotation": rot, "Scale": scale,
        "rgb": rgb, "depth": depth,
    }


@pytest.fixture(scope="module")
def playback():
    from madrona_tpu.render import MeshRegistry
    from madrona_tpu.viz import PlaybackViewer

    reg = MeshRegistry()
    box = reg.add_box(0.5)
    mesh = reg.build()

    v = PlaybackViewer(
        _traj(), mesh=mesh, render_obj=[box, box, box],
        width=32, height=24,
    )
    srv = v.make_server(port=0)
    port = srv.server_address[1]
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    yield v, port
    srv.shutdown()


def _get(port, path):
    c = http.client.HTTPConnection("127.0.0.1", port, timeout=180)
    c.request("GET", path)
    r = c.getresponse()
    body = r.read()
    c.close()
    return r.status, r.getheader("Content-Type"), body


def test_meta_and_page(playback):
    v, port = playback
    st, ct, body = _get(port, "/")
    assert st == 200 and b"playback" in body
    meta = json.loads(_get(port, "/meta")[2])
    assert meta == {
        "steps": 4, "num_worlds": 2, "num_views": 2, "has_cam": True,
        "has_topdown": True,
        "keys": ["Position", "Rotation", "Scale", "depth", "rgb"],
    }


def test_scrub_frames(playback):
    v, port = playback
    seen = set()
    for t in (0, 3):
        for path in (
            f"/frame.png?t={t}&w=1",
            f"/topdown.png?t={t}&w=0",
            f"/agent.png?t={t}&w=0&v=1",
        ):
            st, ct, body = _get(port, path)
            assert st == 200 and ct == "image/png"
            assert body.startswith(b"\x89PNG")
            seen.add(body)
    # different steps render different pixels
    assert len(seen) == 6


def test_clamping_and_keys(playback):
    v, port = playback
    # out-of-range step/world/view clamp instead of erroring
    st, _, _ = _get(port, "/agent.png?t=99&w=99&v=99")
    assert st == 200
    cam0 = list(v.cam_pos)
    _get(port, "/key?k=w")
    assert v.cam_pos[1] > cam0[1]
    assert _get(port, "/nope")[0] == 404


def test_agent_panel_shapes():
    from madrona_tpu.viz.web_viewer import rgbd_panel

    rgb = np.zeros((6, 8, 3), np.float32)
    d = np.ones((6, 8), np.float32)
    panel = rgbd_panel(rgb, d)
    assert panel.shape == (6, 16, 3)
    assert np.all(panel[:, 8:] == 1.0)   # normalized depth fills right half
    assert rgbd_panel(rgb, None).shape == (6, 8, 3)


def test_webviewer_agent_overlay():
    """WebViewer serves last-step RGBD outputs without a live render
    graph (outputs injected directly)."""
    from madrona_tpu.viz.web_viewer import WebViewer

    v = object.__new__(WebViewer)   # endpoint-only surface under test
    v._lock = threading.Lock()
    v.rgb_key, v.depth_key = "rgb", "depth"
    v.world = 0
    v.last_outputs = {}
    assert v._num_views() == 0
    assert v.agent_png(0).startswith(b"\x89PNG")   # placeholder

    tr = _traj(T=1)
    v.last_outputs = {"rgb": tr["rgb"][0], "depth": tr["depth"][0]}
    assert v._num_views() == 2
    png = v.agent_png(1)
    assert png.startswith(b"\x89PNG")
