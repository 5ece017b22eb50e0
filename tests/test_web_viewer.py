"""Web viewer tests: endpoints, controls, and sim advancement over HTTP."""

import http.client
import json
import threading

import numpy as np
import pytest

from madrona_tpu.models.base import make_sim
from madrona_tpu.models.cartpole import Cartpole


@pytest.fixture(scope="module")
def viewer():
    # cartpole has no RigidBody archetype; build a minimal physics scene
    import jax.numpy as jnp

    from madrona_tpu.core.registry import ECSRegistry
    from madrona_tpu.core.state import StateManager
    from madrona_tpu.graph.builder import TaskGraphBuilder
    from madrona_tpu.graph.executor import Executor
    from madrona_tpu.physics import api as phys
    from madrona_tpu.physics.bodies import ObjectRegistry
    from madrona_tpu.physics.geo import box_hull
    from madrona_tpu.physics.xpbd import PhysicsConfig
    from madrona_tpu.render import MeshRegistry

    sm = StateManager()
    reg = ECSRegistry(sm)
    phys.register_types(reg, max_bodies=4)
    om = ObjectRegistry()
    obj = om.add_hull(box_hull((0.5, 0.5, 0.5)), mass=1.0)
    plane = om.add_plane()
    om = om.build()

    b = TaskGraphBuilder(sm, "step")
    phys.setup_physics_step_tasks(b, om, PhysicsConfig())
    graphs = {"step": b.build()}

    ex = Executor(sm, graphs, num_worlds=2, seed=0)

    # spawn: plane + 2 falling boxes per world
    import dataclasses as dc

    state = ex.state
    t = state.tables["RigidBody"]
    cols = dict(t.columns)
    pos = np.zeros((2, 4, 3), np.float32)
    pos[:, 1] = [0, 0, 2.0]
    pos[:, 2] = [0.2, 0, 4.0]
    cols["Position"] = jnp.asarray(pos)
    rot = np.zeros((2, 4, 4), np.float32)
    rot[..., 0] = 1
    cols["Rotation"] = jnp.asarray(rot)
    cols["Scale"] = jnp.ones((2, 4, 3), jnp.float32)
    oid = np.zeros((2, 4), np.int32)
    oid[:, 0] = plane
    oid[:, 1:3] = obj
    cols["ObjectID"] = jnp.asarray(oid)
    resp = np.zeros((2, 4), np.int32)
    resp[:, 0] = 2  # static
    cols["ResponseType"] = jnp.asarray(resp)
    tables = dict(state.tables)
    tables["RigidBody"] = dc.replace(
        t, columns=cols, num_rows=jnp.full((2,), 3, jnp.int32)
    )
    ex.state = dc.replace(state, tables=tables)

    class SimShim:
        env = None
        state = None

        def __init__(self, ex):
            self._ex = ex

        @property
        def state(self):
            return self._ex.state

        @state.setter
        def state(self, s):
            self._ex.state = s

        def step_fn(self):
            return self._ex.step_fn(("step",))

    reg_m = MeshRegistry()
    box = reg_m.add_box(0.5)
    quad = reg_m.add_quad(20.0)
    mesh = reg_m.build()

    from madrona_tpu.viz import WebViewer

    v = WebViewer(
        SimShim(ex), mesh, [quad, box, box, box],
        width=64, height=48,
        inputs_fn=lambda: {},
    )
    v.paused = True
    v._advance_locked()      # pre-warm the step compile off the HTTP path
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


def test_page_and_state(viewer):
    v, port = viewer
    st, ct, body = _get(port, "/")
    assert st == 200 and ct == "text/html" and b"viewer" in body
    st, ct, body = _get(port, "/state")
    s = json.loads(body)
    assert s["world"] == 0 and s["num_worlds"] == 2


def test_frame_and_topdown_png(viewer):
    v, port = viewer
    for path in ("/frame.png", "/topdown.png"):
        st, ct, body = _get(port, path)
        assert st == 200 and ct == "image/png"
        assert body.startswith(b"\x89PNG")


def test_keys_drive_camera_and_sim(viewer):
    v, port = viewer
    v.paused = False
    cam0 = list(v.cam_pos)
    _get(port, "/key?k=w")
    assert v.cam_pos[1] > cam0[1]
    _get(port, "/key?k=ArrowLeft")
    assert v.yaw != 0.0

    # pause toggling + single-step advances the sim
    _get(port, "/key?k=%20")
    assert v.paused
    s0 = json.loads(_get(port, "/state")[2])["step"]
    _get(port, "/key?k=n")
    s1 = json.loads(_get(port, "/state")[2])["step"]
    assert s1 == s0 + 1

    # world switch clamps
    _get(port, "/key?k=%5D")
    assert v.world == 1
    _get(port, "/key?k=%5D")
    assert v.world == 1
    _get(port, "/key?k=%5B")
    assert v.world == 0


def test_tick_advances_physics(viewer):
    v, port = viewer
    v.paused = False
    z0 = np.asarray(
        v.sim.state.tables["RigidBody"].columns["Position"]
    )[0, 1, 2]
    for _ in range(5):
        v.tick()
    z1 = np.asarray(
        v.sim.state.tables["RigidBody"].columns["Position"]
    )[0, 1, 2]
    assert z1 < z0        # the box is falling


def test_blas_tier_flycam_frame(viewer):
    """WebViewer(blas=...) renders the flycam through the device
    mesh-BVH walker (imported-asset scenes in the interactive viewer)."""
    import jax.numpy as jnp

    from madrona_tpu.assets.bvh import build_mesh_bvh
    from madrona_tpu.render.blas import bake_blas
    from madrona_tpu.viz import WebViewer

    v_mesh, _ = viewer
    sim = v_mesh.sim

    def box_mesh(h):
        c = np.asarray([
            [-h, -h, -h], [h, -h, -h], [h, h, -h], [-h, h, -h],
            [-h, -h, h], [h, -h, h], [h, h, h], [-h, h, h],
        ], np.float32)
        f = np.asarray([
            [0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
            [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
            [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7],
        ], np.int32)
        return c, f

    vq, fq = box_mesh(20.0)
    vb, fb = box_mesh(0.5)
    blas = bake_blas(
        [build_mesh_bvh(vq, fq), build_mesh_bvh(vb, fb)],
        colors=[(0.2, 0.7, 0.2), (0.8, 0.2, 0.2)],
    )
    v = WebViewer(
        sim, None, [0, 1, 1, 1], width=48, height=32,
        inputs_fn=lambda: {}, blas=blas,
    )
    v.paused = True
    png = v.frame_png()
    assert png[:8] == b"\x89PNG\r\n\x1a\n" and len(png) > 100
    # scene visible: the frame is not a constant sky
    img = np.asarray(
        v._frame(
            sim.state.tables["RigidBody"].columns["Position"][0],
            sim.state.tables["RigidBody"].columns["Rotation"][0],
            sim.state.tables["RigidBody"].columns["Scale"][0],
            jnp.asarray(v.cam_pos, jnp.float32),
            jnp.asarray(v._cam_quat(), jnp.float32),
        )
    )
    assert np.isfinite(img).all()
    assert img.reshape(-1, 3).std(axis=0).max() > 1e-3
