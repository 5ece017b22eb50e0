"""physics.query.raycast_bodies vs analytic + OBB oracles (reference
broadphase.cpp:658-726 BVH::traceRay)."""

import jax.numpy as jnp
import numpy as np

from madrona_tpu.physics import query
from madrona_tpu.physics.bodies import ObjectRegistry
from madrona_tpu.physics.geo import box_hull
from madrona_tpu.physics.xpbd import BodyState
from madrona_tpu.render.raycast import trace_rays_obb


def _bodies(pos, rot, scale, obj_id, active=None):
    pos = jnp.asarray(pos, jnp.float32)
    w, n = pos.shape[:2]
    z3 = jnp.zeros((w, n, 3), jnp.float32)
    q0 = jnp.zeros((w, n, 4), jnp.float32).at[..., 0].set(1.0)
    return BodyState(
        pos=pos, rot=jnp.asarray(rot, jnp.float32),
        scale=jnp.asarray(scale, jnp.float32),
        vel=z3, omega=z3,
        obj_id=jnp.asarray(obj_id, jnp.int32),
        response=jnp.zeros((w, n), jnp.int32),
        ext_force=z3, ext_torque=z3,
        prev_x=pos, prev_q=q0, presolve_x=pos, presolve_q=q0,
        presolve_v=z3, presolve_w=z3,
        active=(jnp.ones((w, n), bool) if active is None
                else jnp.asarray(active, bool)),
    )


def _om_box_sphere_plane():
    reg = ObjectRegistry()
    box = reg.add_hull(box_hull((1.0, 1.0, 1.0)), mass=1.0)
    sph = reg.add_sphere(radius=1.0, mass=1.0)
    pln = reg.add_plane()
    return reg.build(), box, sph, pln


def test_hull_matches_obb_oracle():
    om, box, _, _ = _om_box_sphere_plane()
    rs = np.random.RandomState(0)
    w, n, r = 2, 5, 64
    pos = rs.uniform(-4, 4, (w, n, 3)).astype(np.float32)
    ax = rs.normal(size=(w, n, 3))
    ax /= np.linalg.norm(ax, axis=-1, keepdims=True)
    th = rs.uniform(0, np.pi, (w, n, 1)).astype(np.float32)
    rot = np.concatenate(
        [np.cos(th / 2), np.sin(th / 2) * ax], -1
    ).astype(np.float32)
    scale = rs.uniform(0.4, 1.8, (w, n, 3)).astype(np.float32)
    obj = np.full((w, n), box, np.int32)

    o = rs.uniform(-7, 7, (w, r, 3)).astype(np.float32)
    d = rs.normal(size=(w, r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    body = _bodies(pos, rot, scale, obj)
    t, row = query.raycast_bodies(
        body, om, jnp.asarray(o), jnp.asarray(d), 60.0
    )
    t = np.asarray(t)
    row = np.asarray(row)
    for wi in range(w):
        t_obb = np.asarray(trace_rays_obb(
            jnp.asarray(pos[wi]), jnp.asarray(rot[wi]),
            jnp.asarray(scale[wi]), jnp.ones((n,), bool),
            jnp.asarray(o[wi]), jnp.asarray(d[wi]), 60.0,
        ))
        np.testing.assert_allclose(t[wi], t_obb, rtol=1e-4, atol=1e-4)
        hit = t_obb < 59.0
        assert (row[wi][hit] >= 0).all()
        assert (row[wi][~hit] == -1).all()


def test_sphere_and_plane_analytic():
    om, box, sph, pln = _om_box_sphere_plane()
    # world: floor plane at z=0, unit sphere at (0, 5, 1)
    pos = np.zeros((1, 2, 3), np.float32)
    pos[0, 1] = [0, 5, 1]
    rot = np.zeros((1, 2, 4), np.float32)
    rot[..., 0] = 1
    obj = np.asarray([[pln, sph]], np.int32)
    body = _bodies(pos, rot, np.ones((1, 2, 3), np.float32), obj)

    o = jnp.asarray([[[0, 0, 1], [0, 0, 3]]], jnp.float32)
    d = jnp.asarray([[[0, 1, 0], [0, 0, -1]]], jnp.float32)
    t, row = query.raycast_bodies(body, om, o, d, 50.0)
    t = np.asarray(t)[0]
    row = np.asarray(row)[0]
    # ray 0: horizontal at sphere-center height -> sphere front at y=4
    np.testing.assert_allclose(t[0], 4.0, rtol=1e-5)
    assert row[0] == 1
    # ray 1: straight down from z=3 -> floor at t=3
    np.testing.assert_allclose(t[1], 3.0, rtol=1e-5)
    assert row[1] == 0


def test_exclude_row_and_inactive():
    om, box, _, _ = _om_box_sphere_plane()
    # two boxes stacked along the ray; excluding/deactivating the near
    # one exposes the far one
    pos = np.zeros((1, 2, 3), np.float32)
    pos[0, 0] = [0, 3, 0]
    pos[0, 1] = [0, 6, 0]
    rot = np.zeros((1, 2, 4), np.float32)
    rot[..., 0] = 1
    obj = np.full((1, 2), box, np.int32)
    o = jnp.asarray([[[0, 0, 0]]], jnp.float32)
    d = jnp.asarray([[[0, 1, 0]]], jnp.float32)

    body = _bodies(pos, rot, np.ones((1, 2, 3), np.float32), obj)
    t, row = query.raycast_bodies(body, om, o, d, 50.0)
    np.testing.assert_allclose(float(t[0, 0]), 2.0, rtol=1e-5)
    assert int(row[0, 0]) == 0

    t2, row2 = query.raycast_bodies(
        body, om, o, d, 50.0,
        exclude_row=jnp.asarray([[0]], jnp.int32),
    )
    np.testing.assert_allclose(float(t2[0, 0]), 5.0, rtol=1e-5)
    assert int(row2[0, 0]) == 1

    body3 = _bodies(pos, rot, np.ones((1, 2, 3), np.float32), obj,
                    active=np.asarray([[False, False]]))
    t3, row3 = query.raycast_bodies(body3, om, o, d, 50.0)
    assert float(t3[0, 0]) == 50.0 and int(row3[0, 0]) == -1


def test_aabb_overlap_query():
    om, box, sph, pln = _om_box_sphere_plane()
    # boxes at y = 0 and y = 10 (unit half-extent), sphere at y = 5
    pos = np.zeros((1, 3, 3), np.float32)
    pos[0, 1] = [0, 10, 0]
    pos[0, 2] = [0, 5, 0]
    rot = np.zeros((1, 3, 4), np.float32)
    rot[..., 0] = 1
    obj = np.asarray([[box, box, sph]], np.int32)
    body = _bodies(pos, rot, np.ones((1, 3, 3), np.float32), obj)

    q_lo = jnp.asarray([[[-0.5, -2.0, -0.5], [-0.5, 4.2, -0.5]]],
                       jnp.float32)
    q_hi = jnp.asarray([[[0.5, -0.9, 0.5], [0.5, 4.8, 0.5]]],
                       jnp.float32)
    m = np.asarray(query.aabb_overlap_bodies(body, om, q_lo, q_hi))
    # query 0 touches only box 0's AABB (y in [-1, 1])
    np.testing.assert_array_equal(m[0, 0], [True, False, False])
    # query 1 touches only the sphere's AABB (y in [4, 6])
    np.testing.assert_array_equal(m[0, 1], [False, False, True])

    # dead rows never match
    body2 = _bodies(pos, rot, np.ones((1, 3, 3), np.float32), obj,
                    active=np.asarray([[False, True, True]]))
    m2 = np.asarray(query.aabb_overlap_bodies(body2, om, q_lo, q_hi))
    assert not m2[0, 0].any()
