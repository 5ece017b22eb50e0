"""Pallas raycast megakernel (ops/raycast_pallas + render/kernel) vs the
XLA BLAS tier — the renderer analogue of the physics kernel parity
suite. The kernel is the production trace for batch-sim scenes
(render_views_blas auto-selects it); the BVH-walking XLA tier is the
oracle (reference semantics: bvh_raycast.cpp:225-925).

Known deviation: the kernel's shadow pass rejects self-intersection by
t_s > eps instead of the origin nudge along the normal
(bvh_raycast.cpp:898-912), so isolated pixels at shadow boundaries may
flip — the suite bounds the mismatch fraction instead of demanding
bit equality there. Depth/primary hits carry no such deviation and are
checked tightly.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from madrona_tpu.render import MeshRegistry, RenderConfig
from madrona_tpu.render.blas import render_views_blas
from madrona_tpu.render.lights import make_lights


def _scene(seed=0, w=2, n_box=4):
    """Floor quad + boxes + a ramp-ish mesh, random transforms."""
    reg = MeshRegistry()
    floor = reg.add_quad(20.0, color=(0.4, 0.4, 0.4), uv_tiles=4.0,
                         material=1)
    box = reg.add_box([0.6, 0.5, 0.7], color=(0.7, 0.3, 0.2), material=2)
    verts = [(-1, -1, 0), (1, -1, 0), (1, 1, 0), (-1, 1, 0), (0, 0, 1.2)]
    tris = [(0, 1, 4), (1, 2, 4), (2, 3, 4), (3, 0, 4), (0, 2, 1),
            (0, 3, 2)]
    pyr = reg.add_mesh(verts, tris, color=(0.2, 0.6, 0.3), material=0)
    blas = reg.build_blas()

    rs = np.random.RandomState(seed)
    i_n = 2 + n_box
    pos = np.zeros((w, i_n, 3), np.float32)
    rot = np.zeros((w, i_n, 4), np.float32)
    rot[..., 0] = 1.0
    scale = np.ones((w, i_n, 3), np.float32)
    obj = np.zeros((w, i_n), np.int32)
    obj[:, 0] = floor
    obj[:, 1] = pyr
    pos[:, 1, :2] = rs.uniform(-3, 3, (w, 2))
    for b in range(n_box):
        obj[:, 2 + b] = box
        pos[:, 2 + b, :2] = rs.uniform(-4, 4, (w, 2))
        pos[:, 2 + b, 2] = rs.uniform(0.5, 1.5, w)
        ang = rs.uniform(0, np.pi, w)
        rot[:, 2 + b, 0] = np.cos(ang / 2)
        rot[:, 2 + b, 3] = np.sin(ang / 2)
        scale[:, 2 + b] = rs.uniform(0.7, 1.4, (w, 1))
    mask = np.ones((w, i_n), bool)
    mask[:, -1] = False                        # one dead instance
    cam_pos = np.zeros((w, 2, 3), np.float32)
    cam_pos[:, :, 1] = -8.0
    cam_pos[:, :, 2] = 2.5
    cam_pos[:, 1, 0] = 3.0
    cam_rot = np.zeros((w, 2, 4), np.float32)
    cam_rot[..., 0] = 1.0                      # +y forward
    j = lambda a: jnp.asarray(a)
    return blas, (j(pos), j(rot), j(scale), j(obj), j(mask),
                  j(cam_pos), j(cam_rot))


def _both(cfg, blas, args, materials=None, lights=None):
    old = os.environ.get("MADRONA_TPU_RENDER_KERNEL")
    try:
        os.environ["MADRONA_TPU_RENDER_KERNEL"] = "0"
        ref = render_views_blas(cfg, blas, *args, materials=materials,
                                lights=lights)
        os.environ["MADRONA_TPU_RENDER_KERNEL"] = "1"
        got = render_views_blas(cfg, blas, *args, materials=materials,
                                lights=lights)
    finally:
        if old is None:
            os.environ.pop("MADRONA_TPU_RENDER_KERNEL", None)
        else:
            os.environ["MADRONA_TPU_RENDER_KERNEL"] = old
    return [np.asarray(x) for x in ref], [np.asarray(x) for x in got]


def test_kernel_matches_blas_flat_colors():
    blas, args = _scene(seed=0)
    cfg = RenderConfig(width=24, height=16, fov_deg=85.0, t_max=60.0,
                       shadows=False)
    (rgb0, dep0), (rgb1, dep1) = _both(cfg, blas, args)
    assert np.abs(dep0 - dep1).max() < 1e-3
    assert (np.abs(rgb0 - rgb1) > 0.02).mean() < 0.002


def test_kernel_matches_blas_shadows():
    blas, args = _scene(seed=1)
    cfg = RenderConfig(width=24, height=24, t_max=60.0, shadows=True)
    (rgb0, dep0), (rgb1, dep1) = _both(cfg, blas, args)
    assert np.abs(dep0 - dep1).max() < 1e-3
    # shadow-boundary pixels may flip (eps vs origin-nudge); bound them
    bad = (np.abs(rgb0 - rgb1) > 0.05).any(-1)
    assert bad.mean() < 0.01, bad.mean()


def test_kernel_matches_blas_materials_lights():
    from madrona_tpu.render.materials import bake_materials
    from madrona_tpu.assets.importer import ImportedMaterial, ImportedTexture

    n = 16
    yy, xx = np.mgrid[0:n, 0:n]
    img = np.empty((n, n, 4), np.uint8)
    img[..., :3] = np.where((((yy // 4) + (xx // 4)) % 2)[..., None] > 0,
                            220, 60)
    img[..., 3] = 255
    mats = [
        ImportedMaterial("floor", (1.0, 1.0, 1.0, 1.0), texture=0),
        ImportedMaterial("box", (0.8, 0.4, 0.2, 1.0)),
    ]
    materials = bake_materials(mats, [ImportedTexture("check", img)],
                               tex_size=n)
    blas, args = _scene(seed=2)
    w = args[0].shape[0]
    lights = make_lights(w, [
        {"direction": (0.4, -0.2, -1.0), "cast_shadow": True},
        {"direction": (-0.5, 0.5, -0.5)},
    ])
    cfg = RenderConfig(width=20, height=20, t_max=60.0, shadows=True)
    (rgb0, dep0), (rgb1, dep1) = _both(cfg, blas, args,
                                       materials=materials, lights=lights)
    assert np.abs(dep0 - dep1).max() < 1e-3
    bad = (np.abs(rgb0 - rgb1) > 0.05).any(-1)
    assert bad.mean() < 0.01, bad.mean()


def test_kernel_ineligible_spotlight_falls_back():
    """A spotlight must route to the XLA tier (identical outputs with
    the knob forced off vs auto)."""
    from madrona_tpu.render.kernel import kernel_eligible

    blas, args = _scene(seed=3)
    w = args[0].shape[0]
    lights = make_lights(w, [
        {"position": (0, 0, 6.0), "direction": (0, 0, -1),
         "cast_shadow": True},
    ])
    cfg = RenderConfig(width=8, height=8, t_max=60.0, shadows=True)
    assert not kernel_eligible(cfg, blas, lights, 0, args[0].shape[1])
    (rgb0, dep0), (rgb1, dep1) = _both(cfg, blas, args, lights=lights)
    assert (rgb0 == rgb1).all() and (dep0 == dep1).all()


def test_kernel_hide_seek_env_parity():
    """Whole-env check: hide&seek BLAS tier steps identically through
    both tiers (sim unaffected; render within tolerance)."""
    from madrona_tpu.models.base import make_sim
    from madrona_tpu.models.hide_seek import HideSeek

    hs = HideSeek(render_size=16, render_tier="blas")
    acts = hs.random_actions(np.random.RandomState(0), 3, 2)

    def run(knob):
        old = os.environ.get("MADRONA_TPU_RENDER_KERNEL")
        os.environ["MADRONA_TPU_RENDER_KERNEL"] = knob
        try:
            sim = make_sim(hs, num_worlds=2, seed=0)
            st = sim.state
            step = sim.step_fn()
            for t in range(3):
                st, o = step(st, {"action": acts[t],
                                  "reset": jnp.zeros((2,), jnp.int32)})
            return np.asarray(o["rgb"]), np.asarray(o["depth"])
        finally:
            if old is None:
                os.environ.pop("MADRONA_TPU_RENDER_KERNEL", None)
            else:
                os.environ["MADRONA_TPU_RENDER_KERNEL"] = old

    rgb0, dep0 = run("0")
    rgb1, dep1 = run("1")
    assert np.abs(dep0 - dep1).max() < 1e-3
    assert (np.abs(rgb0 - rgb1) > 0.05).any(-1).mean() < 0.01
