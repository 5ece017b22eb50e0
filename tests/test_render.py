"""Raycaster tests: golden scenes with analytically known depth/color."""

import jax
import jax.numpy as jnp
import numpy as np

from madrona_tpu.render import MeshRegistry, RenderConfig, render_views


def make_scene():
    reg = MeshRegistry()
    box = reg.add_box([1.0, 1.0, 1.0], color=(1.0, 0.0, 0.0))
    ground = reg.add_quad(100.0, color=(0.0, 1.0, 0.0))
    return reg.build(), box, ground


def test_center_ray_hits_box_at_exact_depth():
    mesh, box, ground = make_scene()
    cfg = RenderConfig(width=32, height=32, fov_deg=90.0)
    W = 2
    ident = jnp.array([1.0, 0, 0, 0])
    # camera at origin looking +y; unit box centered at y=5 -> front face
    # at y=4; ground at z=-2
    inst_pos = jnp.asarray([[[0, 5.0, 0], [0, 0, -2.0]]] * W)
    inst_rot = jnp.broadcast_to(ident, (W, 2, 4))
    inst_scale = jnp.ones((W, 2, 3))
    inst_obj = jnp.asarray([[box, ground]] * W)
    inst_mask = jnp.ones((W, 2), bool)
    cam_pos = jnp.zeros((W, 1, 3))
    cam_rot = jnp.broadcast_to(ident, (W, 1, 4))

    rgb, depth = jax.jit(
        lambda *a: render_views(cfg, mesh, *a)
    )(inst_pos, inst_rot, inst_scale, inst_obj, inst_mask, cam_pos, cam_rot)
    assert rgb.shape == (W, 1, 32, 32, 3)
    d_center = float(depth[0, 0, 16, 16])
    np.testing.assert_allclose(d_center, 4.0, atol=0.05)
    # center pixel is the red box (shaded)
    c = np.asarray(rgb[0, 0, 16, 16])
    assert c[0] > 0.2 and c[1] == 0.0 and c[2] == 0.0, c
    # top rows: sky
    np.testing.assert_allclose(
        np.asarray(rgb[0, 0, 0, 0]), [0.1, 0.2, 0.4], atol=1e-6
    )
    # bottom rows look at the ground (green)
    c_low = np.asarray(rgb[0, 0, 31, 16])
    assert c_low[1] > 0.2 and c_low[0] == 0.0, c_low
    # both worlds identical
    np.testing.assert_array_equal(np.asarray(rgb[0]), np.asarray(rgb[1]))


def test_instance_transforms_apply():
    mesh, box, ground = make_scene()
    cfg = RenderConfig(width=16, height=16)
    ident = jnp.array([1.0, 0, 0, 0])
    # scaled box (2x in z) centered at y=5, camera at origin
    inst_pos = jnp.asarray([[[0, 5.0, 0]]])
    inst_rot = jnp.broadcast_to(ident, (1, 1, 4))
    inst_scale = jnp.asarray([[[1.0, 1.0, 2.0]]])
    inst_obj = jnp.asarray([[box]])
    inst_mask = jnp.ones((1, 1), bool)
    cam_pos = jnp.asarray([[[0, 0, 2.5]]])  # above box top at z=2
    cam_rot = jnp.broadcast_to(ident, (1, 1, 4))
    rgb, depth = render_views(
        cfg, mesh, inst_pos, inst_rot, inst_scale, inst_obj, inst_mask,
        cam_pos, cam_rot,
    )
    # camera at z=2.5 looking +y: center ray passes just above the
    # box top (z=2) -> sky at center... center row hits nothing
    assert float(depth[0, 0, 8, 8]) == cfg.t_max
    # lower rows hit the scaled box
    assert float(depth[0, 0, 14, 8]) < cfg.t_max
    # masked instance disappears
    rgb2, depth2 = render_views(
        cfg, mesh, inst_pos, inst_rot, inst_scale, inst_obj,
        jnp.zeros((1, 1), bool), cam_pos, cam_rot,
    )
    assert float(depth2[0, 0, 14, 8]) == cfg.t_max


def test_obb_lidar_matches_box_mesh():
    """trace_rays_obb == tracing the box's 12-triangle mesh (f32): same
    enter-face hits, same exit-face behavior for inside-the-box rays."""
    import numpy as np

    from madrona_tpu.render import MeshRegistry
    from madrona_tpu.render.raycast import (
        RenderConfig, _trace_rays, trace_rays_obb,
    )
    from madrona_tpu.utils import math3d as m3

    rs = np.random.RandomState(5)
    n_i, n_r = 12, 256
    pos = jnp.asarray(rs.uniform(-6, 6, (n_i, 3)), jnp.float32)
    ax = rs.normal(size=(n_i, 3))
    ax /= np.linalg.norm(ax, axis=-1, keepdims=True)
    th = rs.uniform(0, np.pi, (n_i, 1))
    rot = jnp.asarray(
        np.concatenate([np.cos(th / 2), np.sin(th / 2) * ax], -1),
        jnp.float32,
    )
    half = jnp.asarray(rs.uniform(0.3, 2.0, (n_i, 3)), jnp.float32)
    mask = jnp.asarray(rs.rand(n_i) > 0.2)

    o = jnp.asarray(rs.uniform(-8, 8, (n_r, 3)), jnp.float32)
    d = rs.normal(size=(n_r, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True),
                    jnp.float32)
    t_max = 50.0

    depth_obb = np.asarray(trace_rays_obb(pos, rot, half, mask, o, d,
                                          t_max))

    mreg = MeshRegistry()
    mreg.add_box([1.0, 1.0, 1.0])
    mesh = mreg.build()
    cfg = RenderConfig(t_max=t_max, dtype="float32")
    _, depth_mesh = _trace_rays(
        cfg, mesh, pos, rot, half, jnp.zeros((n_i,), jnp.int32), mask,
        o, d,
    )
    depth_mesh = np.asarray(depth_mesh)
    # some rays start inside a box (exit-face semantics on both paths)
    np.testing.assert_allclose(depth_obb, depth_mesh, rtol=1e-4,
                               atol=1e-3)


def test_matmul_tracer_matches_mt():
    """The pinhole-factorized MXU tracer (RenderConfig.tracer="matmul")
    produces the same images as the elementwise Möller–Trumbore sweep,
    in f32 (tight) and bf16 (loose) — same scene, same cameras."""
    import dataclasses

    mesh, box, ground = make_scene()
    rs = np.random.RandomState(2)
    w_, i_, v_ = 2, 6, 3
    pos = rs.uniform(-4, 4, (w_, i_, 3)).astype(np.float32)
    pos[..., 2] = np.abs(pos[..., 2])
    pos[:, 0] = 0.0                                  # ground at origin
    ax = rs.normal(size=(w_, i_, 3))
    ax /= np.linalg.norm(ax, axis=-1, keepdims=True)
    th = rs.uniform(0, np.pi, (w_, i_, 1)).astype(np.float32)
    rot = np.concatenate([np.cos(th / 2), np.sin(th / 2) * ax],
                         -1).astype(np.float32)
    rot[:, 0] = [1, 0, 0, 0]
    scale = rs.uniform(0.5, 1.5, (w_, i_, 3)).astype(np.float32)
    obj = np.full((w_, i_), box, np.int32)
    obj[:, 0] = ground
    mask = np.ones((w_, i_), bool)
    cam_pos = rs.uniform(-6, 6, (w_, v_, 3)).astype(np.float32)
    cam_pos[..., 2] = np.abs(cam_pos[..., 2]) + 1.0
    cth = rs.uniform(0, np.pi, (w_, v_, 1)).astype(np.float32)
    cax = rs.normal(size=(w_, v_, 3))
    cax /= np.linalg.norm(cax, axis=-1, keepdims=True)
    cam_rot = np.concatenate([np.cos(cth / 2), np.sin(cth / 2) * cax],
                             -1).astype(np.float32)

    args = tuple(jnp.asarray(a) for a in
                 (pos, rot, scale, obj, mask, cam_pos, cam_rot))

    for dtype, rtol, pix_tol in (("float32", 1e-4, 0.01),
                                 ("bfloat16", 3e-2, 0.05)):
        cfg_mt = RenderConfig(width=24, height=16, dtype=dtype)
        cfg_mm = dataclasses.replace(cfg_mt, tracer="matmul")
        rgb_a, dep_a = jax.jit(
            lambda *a: render_views(cfg_mt, mesh, *a))(*args)
        rgb_b, dep_b = jax.jit(
            lambda *a: render_views(cfg_mm, mesh, *a))(*args)
        dep_a, dep_b = np.asarray(dep_a), np.asarray(dep_b)
        rgb_a, rgb_b = np.asarray(rgb_a), np.asarray(rgb_b)
        hit_both = (dep_a < cfg_mt.t_max - 1.0) & (dep_b < cfg_mt.t_max - 1.0)
        assert hit_both.mean() > 0.3
        # same hit/miss classification except silhouette-edge pixels
        agree = (dep_a < cfg_mt.t_max - 1.0) == (dep_b < cfg_mt.t_max - 1.0)
        assert agree.mean() > 1.0 - pix_tol
        rel = np.abs(dep_a[hit_both] - dep_b[hit_both]) / np.maximum(
            dep_a[hit_both], 1.0
        )
        assert np.quantile(rel, 0.99) < rtol * 10 + 1e-6, dtype
        np.testing.assert_allclose(
            np.median(rel), 0.0, atol=rtol, err_msg=dtype
        )
        # colors agree on interior hit pixels
        col_diff = np.abs(rgb_a - rgb_b).max(-1)
        assert (col_diff[hit_both] < 0.15).mean() > 1.0 - pix_tol
