"""Physics tests: geometry, narrowphase golden cases, XPBD end-to-end.

Models the reference's test strategy (tests/gjk.cpp golden cases) plus the
richer pyramid SURVEY.md §4 calls for: kernel-level contact cases with
known answers, then whole-sim settle/bounce behavior.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madrona_tpu.physics import api, bodies, broadphase as bp, geo
from madrona_tpu.physics import narrowphase as nph
from madrona_tpu.physics.xpbd import BodyState, PhysicsConfig
from madrona_tpu.physics import xpbd
from madrona_tpu.utils import math3d as m3


# ---------------------------------------------------------------- geometry


def test_box_hull_structure():
    h = geo.box_hull([1.0, 2.0, 3.0])
    assert h.verts_mask.sum() == 8
    assert h.faces_mask.sum() == 6
    assert h.edges_mask.sum() == 12
    # face planes: outward normals, d = distance along normal
    for i in range(6):
        n = h.planes[i, :3]
        d = h.planes[i, 3]
        # all verts on or behind the plane
        dist = h.verts[h.verts_mask] @ n - d
        assert (dist <= 1e-5).all()
        assert np.isclose(np.linalg.norm(n), 1.0, atol=1e-6)


def test_convex_hull_from_points_recovers_cube():
    pts = np.array(
        [[x, y, z] for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)]
        + [[0, 0, 0], [0.5, 0.2, -0.3]]  # interior points get dropped
    )
    h = geo.convex_hull_from_points(pts)
    assert h.verts_mask.sum() == 8
    assert h.faces_mask.sum() == 6


def test_box_mass_properties():
    h = geo.box_hull([0.5, 1.0, 1.5])
    mass, com, inertia, _ = geo.hull_mass_properties(h, density=2.0)
    vol = 1.0 * 2.0 * 3.0
    assert np.isclose(mass, 2.0 * vol, rtol=1e-5)
    np.testing.assert_allclose(com, 0.0, atol=1e-6)
    expected = np.sort(
        2.0 * vol / 12.0 * np.array(
            [2.0**2 + 3.0**2, 1.0**2 + 3.0**2, 1.0**2 + 2.0**2]
        )
    )
    np.testing.assert_allclose(np.sort(inertia), expected, rtol=1e-4)


# ------------------------------------------------------------- narrowphase


def make_om():
    reg = bodies.ObjectRegistry()
    box = reg.add_box([0.5, 0.5, 0.5], mass=1.0)          # 0
    plane = reg.add_plane()                                # 1
    sphere = reg.add_sphere(0.5, mass=1.0)                 # 2
    big_box = reg.add_box([2.0, 2.0, 0.5], mass=0.0,
                          response=bodies.RESPONSE_STATIC) # 3
    return reg.build(), dict(box=0, plane=1, sphere=2, big_box=3)


def _hull_w(om, obj, pos, rot=None, scale=None):
    rot = jnp.asarray(rot if rot is not None else [1, 0, 0, 0], jnp.float32)
    scale = jnp.asarray(scale if scale is not None else [1, 1, 1], jnp.float32)
    return nph.hull_to_world(om, obj, jnp.asarray(pos, jnp.float32), rot, scale)


def test_hull_hull_face_contact_stacked_boxes():
    om, ids = make_om()
    # box A on top of box B, overlapping by 0.1
    ha = _hull_w(om, ids["box"], [0.0, 0.0, 0.9])
    hb = _hull_w(om, ids["box"], [0.0, 0.0, 0.0])
    c = jax.jit(nph.hull_hull_contact)(ha, hb)
    assert bool(c["valid"])
    assert int(c["num"]) == 4
    n = np.asarray(c["normal"])
    # normal along +/- z (face contact)
    assert abs(abs(n[2]) - 1.0) < 1e-5
    depths = np.asarray(c["points"][: int(c["num"])])
    dep = np.asarray(c["depths"])[:4]
    np.testing.assert_allclose(dep, 0.1, atol=1e-5)
    # contact points on the ref face plane (z=0.4 or z=0.5 depending on ref)
    z = np.asarray(c["points"])[:4, 2]
    assert np.allclose(z, z[0], atol=1e-5)


def test_hull_hull_separated():
    om, ids = make_om()
    ha = _hull_w(om, ids["box"], [0.0, 0.0, 2.0])
    hb = _hull_w(om, ids["box"], [0.0, 0.0, 0.0])
    c = jax.jit(nph.hull_hull_contact)(ha, hb)
    assert not bool(c["valid"])


def test_hull_hull_edge_contact():
    om, ids = make_om()
    # two boxes rotated 45deg about different axes, crossing like an X
    qa = m3.quat_axis_angle(jnp.array([1.0, 0.0, 0.0]), jnp.pi / 4)
    qb = m3.quat_axis_angle(jnp.array([0.0, 1.0, 0.0]), jnp.pi / 4)
    # offset so the closest features are edges
    ha = _hull_w(om, ids["box"], [0.0, 0.0, 1.30], rot=qa)
    hb = _hull_w(om, ids["box"], [0.0, 0.0, 0.0], rot=qb)
    c = jax.jit(nph.hull_hull_contact)(ha, hb)
    # boxes overlap slightly: diag half-height ~0.707 each
    assert bool(c["valid"])
    assert int(c["num"]) >= 1


def test_hull_plane_contact():
    om, ids = make_om()
    h = _hull_w(om, ids["box"], [0.0, 0.0, 0.45])  # sunk 0.05 into floor
    c = jax.jit(nph.hull_plane_contact)(
        h, jnp.zeros(3), jnp.array([1.0, 0, 0, 0])
    )
    assert bool(c["valid"])
    assert int(c["num"]) == 4
    np.testing.assert_allclose(np.asarray(c["normal"]), [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(c["depths"])[:4], 0.05, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c["points"])[:4, 2], 0.0, atol=1e-6)


def test_hull_plane_separated():
    om, ids = make_om()
    h = _hull_w(om, ids["box"], [0.0, 0.0, 0.55])
    c = jax.jit(nph.hull_plane_contact)(
        h, jnp.zeros(3), jnp.array([1.0, 0, 0, 0])
    )
    assert not bool(c["valid"])


def test_sphere_contacts():
    om, ids = make_om()
    # sphere-sphere overlapping by 0.2
    c = jax.jit(nph.sphere_sphere_contact)(
        jnp.array([0.0, 0, 0]), 0.5, jnp.array([0.8, 0, 0]), 0.5
    )
    assert bool(c["valid"])
    np.testing.assert_allclose(float(c["depths"][0]), 0.2, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(c["normal"]), [-1, 0, 0], atol=1e-6
    )  # ref(B) -> other(A)
    np.testing.assert_allclose(
        np.asarray(c["points"][0]), [0.3, 0, 0], atol=1e-6
    )  # on B's surface

    # sphere-plane
    c = jax.jit(nph.sphere_plane_contact)(
        jnp.array([0.0, 0, 0.4]), 0.5, jnp.zeros(3),
        jnp.array([1.0, 0, 0, 0]),
    )
    assert bool(c["valid"])
    np.testing.assert_allclose(float(c["depths"][0]), 0.1, atol=1e-6)

    # sphere-hull: sphere left of box, overlapping
    h = _hull_w(om, ids["box"], [0.0, 0.0, 0.0])
    c = jax.jit(nph.sphere_hull_contact)(
        jnp.array([-0.9, 0.0, 0.0]), 0.5, h
    )
    assert bool(c["valid"])
    np.testing.assert_allclose(float(c["depths"][0]), 0.1, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(c["normal"]), [-1, 0, 0], atol=1e-5
    )  # hull(ref) -> sphere
    np.testing.assert_allclose(
        np.asarray(c["points"][0]), [-0.5, 0, 0], atol=1e-5
    )


# ---------------------------------------------------------------- end2end


def make_world(om, rows):
    """BodyState for W=2 identical worlds from a list of body dicts."""
    n = len(rows)
    w = 2

    def arr(key, default, dim):
        vals = np.stack(
            [np.asarray(r.get(key, default), np.float32) for r in rows]
        )
        return jnp.asarray(np.tile(vals[None], (w, 1, 1) if dim else (w, 1)))

    zeros3 = [0.0, 0.0, 0.0]
    ident = [1.0, 0, 0, 0]
    return BodyState(
        pos=arr("pos", zeros3, True),
        rot=arr("rot", ident, True),
        scale=arr("scale", [1, 1, 1], True),
        vel=arr("vel", zeros3, True),
        omega=arr("omega", zeros3, True),
        obj_id=jnp.asarray(
            np.tile(
                np.array([r["obj"] for r in rows], np.int32)[None], (w, 1)
            )
        ),
        response=jnp.asarray(
            np.tile(
                np.array(
                    [r.get("response", bodies.RESPONSE_DYNAMIC) for r in rows],
                    np.int32,
                )[None],
                (w, 1),
            )
        ),
        ext_force=arr("f", zeros3, True),
        ext_torque=arr("tau", zeros3, True),
        prev_x=arr("pos", zeros3, True),
        prev_q=arr("rot", ident, True),
        presolve_x=arr("pos", zeros3, True),
        presolve_q=arr("rot", ident, True),
        presolve_v=arr("vel", zeros3, True),
        presolve_w=arr("omega", zeros3, True),
        active=jnp.ones((w, n), bool),
    )


_STEP_CACHE = {}


def run_steps(body, om, cfg, steps, caps=None):
    caps = caps or bp.CandidateCaps(hull_hull=8, hull_plane=8, sphere_any=8)
    key = (id(om), cfg.dt, cfg.substeps, caps.hull_hull)
    if key in _STEP_CACHE:
        step = _STEP_CACHE[key]
        for _ in range(steps):
            body = step(body)
        return body
    h = cfg.dt / cfg.substeps
    g = jnp.asarray(cfg.gravity, jnp.float32)

    @jax.jit
    def step(body):
        cands = bp.find_candidates(body, om, caps, cfg.dt)

        def substep(b, _):
            b = xpbd.integrate(b, om, h, g)
            contacts = api._narrowphase_all(b, om, cands)
            b, contacts = xpbd.solve_positions(b, contacts, om)
            b = xpbd.set_velocities(b, h)
            b = xpbd.solve_velocities(
                b, contacts, om, h, cfg.restitution,
                cfg.restitution_threshold,
            )
            return b, None

        body, _ = jax.lax.scan(substep, body, None, length=cfg.substeps)
        return body

    _STEP_CACHE[key] = step
    for _ in range(steps):
        body = step(body)
    return body


def test_free_fall_matches_analytic():
    # Drop from z0=1: XPBD reconstructs velocity as (x - x_prev)/h each
    # substep, so f32 cancellation noise scales with |x| (the reference
    # has the same property — see its setVelocities FIXME about energy
    # loss). Near the origin the integration matches symplectic Euler to
    # float precision.
    om, ids = make_om()
    body = make_world(om, [dict(obj=ids["box"], pos=[0, 0, 1.0])])
    cfg = PhysicsConfig(dt=1 / 60, substeps=4)
    body = run_steps(body, om, cfg, 30)
    t = 30 / 60
    n_sub = 30 * 4
    h = cfg.dt / cfg.substeps
    expected = 1.0 - 9.8 * h * h * (n_sub * (n_sub + 1) / 2)
    np.testing.assert_allclose(
        float(body.pos[0, 0, 2]), expected, rtol=0, atol=2e-4
    )
    np.testing.assert_allclose(
        float(body.vel[0, 0, 2]), -9.8 * t, rtol=1e-3
    )


def test_box_settles_on_plane():
    om, ids = make_om()
    body = make_world(
        om,
        [
            dict(obj=ids["plane"], response=bodies.RESPONSE_STATIC),
            dict(obj=ids["box"], pos=[0, 0, 1.0]),
        ],
    )
    cfg = PhysicsConfig(dt=1 / 60, substeps=4)
    body = run_steps(body, om, cfg, 120)
    z = float(body.pos[0, 1, 2])
    # box rests with bottom on plane: center at 0.5
    assert abs(z - 0.5) < 0.02, z
    v = np.asarray(body.vel[0, 1])
    assert np.linalg.norm(v) < 0.05
    # rotation stays near identity
    q = np.asarray(body.rot[0, 1])
    assert abs(abs(q[0]) - 1.0) < 1e-2


def test_box_stack_settles():
    om, ids = make_om()
    body = make_world(
        om,
        [
            dict(obj=ids["plane"], response=bodies.RESPONSE_STATIC),
            dict(obj=ids["box"], pos=[0, 0, 0.6]),
            dict(obj=ids["box"], pos=[0.0, 0.02, 1.7]),
        ],
    )
    cfg = PhysicsConfig(dt=1 / 60, substeps=4)
    body = run_steps(body, om, cfg, 180)
    z1 = float(body.pos[0, 1, 2])
    z2 = float(body.pos[0, 2, 2])
    assert abs(z1 - 0.5) < 0.05, z1
    assert abs(z2 - 1.5) < 0.1, z2


def test_sphere_bounces_with_restitution():
    om, ids = make_om()
    body = make_world(
        om,
        [
            dict(obj=ids["plane"], response=bodies.RESPONSE_STATIC),
            dict(obj=ids["sphere"], pos=[0, 0, 3.0]),
        ],
    )
    cfg = PhysicsConfig(dt=1 / 60, substeps=4)
    max_z_after_bounce = 0.0
    hit_ground = False
    for _ in range(150):
        body = run_steps(body, om, cfg, 1)
        z = float(body.pos[0, 1, 2])
        if z < 0.6:
            hit_ground = True
        if hit_ground:
            max_z_after_bounce = max(max_z_after_bounce, z)
    assert hit_ground
    # e=0.3: bounce height ~ e^2 * drop height (2.5m) = 0.22m above rest
    assert 0.55 < max_z_after_bounce < 1.2, max_z_after_bounce


def test_worlds_independent():
    om, ids = make_om()
    body = make_world(
        om,
        [
            dict(obj=ids["plane"], response=bodies.RESPONSE_STATIC),
            dict(obj=ids["box"], pos=[0, 0, 1.0]),
        ],
    )
    # world 1 gets a different starting height
    body = dataclasses.replace(
        body, pos=body.pos.at[1, 1, 2].set(2.0),
        prev_x=body.prev_x.at[1, 1, 2].set(2.0),
        presolve_x=body.presolve_x.at[1, 1, 2].set(2.0),
    )
    cfg = PhysicsConfig(dt=1 / 60, substeps=4)
    b10 = run_steps(body, om, cfg, 10)
    # both fall, world1 from higher -> strictly higher at t=10 steps
    assert float(b10.pos[1, 1, 2]) > float(b10.pos[0, 1, 2])


# ------------------------------------------------------------------ joints


def run_steps_with_joints(body, joints, om, cfg, steps):
    from madrona_tpu.physics import joints as jt

    caps = bp.CandidateCaps(hull_hull=8, hull_plane=8, sphere_any=8)
    h = cfg.dt / cfg.substeps
    g = jnp.asarray(cfg.gravity, jnp.float32)

    @jax.jit
    def step(body):
        cands = bp.find_candidates(body, om, caps, cfg.dt)

        def substep(b, _):
            b = xpbd.integrate(b, om, h, g)
            contacts = api._narrowphase_all(b, om, cands)
            b, contacts = xpbd.solve_positions(b, contacts, om)
            b = jt.solve_joints(b, joints, om)
            b = xpbd.set_velocities(b, h)
            b = xpbd.solve_velocities(
                b, contacts, om, h, cfg.restitution,
                cfg.restitution_threshold,
            )
            return b, None

        body, _ = jax.lax.scan(substep, body, None, length=cfg.substeps)
        return body

    for _ in range(steps):
        body = step(body)
    return body


def test_fixed_joint_holds_bodies_rigid():
    from madrona_tpu.physics import joints as jt

    om, ids = make_om()
    # two boxes side by side, falling freely, fixed-jointed at the gap
    body = make_world(
        om,
        [
            dict(obj=ids["box"], pos=[0.0, 0.0, 5.0]),
            dict(obj=ids["box"], pos=[1.2, 0.0, 5.0]),
        ],
    )
    joints = jt.empty_joints(2, 2)
    ident = jnp.array([1.0, 0, 0, 0], jnp.float32)
    joints = jt.make_fixed_joint(
        joints, 0, e1=0, e2=1,
        attach_q1=ident, attach_q2=ident,
        r1=jnp.array([0.6, 0, 0.0]), r2=jnp.array([-0.6, 0, 0.0]),
        separation=0.0,
    )
    cfg = PhysicsConfig(dt=1 / 60, substeps=4, gravity=(0, 0, -9.8))
    out = run_steps_with_joints(body, joints, om, cfg, 30)
    # attachment points coincide, relative orientation identity
    p1 = np.asarray(out.pos[0, 0])
    p2 = np.asarray(out.pos[0, 1])
    q1 = np.asarray(out.rot[0, 0])
    q2 = np.asarray(out.rot[0, 1])
    np.testing.assert_allclose(p2 - p1, [1.2, 0, 0], atol=5e-3)
    dot = abs(np.sum(q1 * q2))
    assert dot > 1.0 - 1e-4  # same orientation up to sign
    # and it actually fell
    assert p1[2] < 4.5


def test_hinge_joint_pendulum():
    from madrona_tpu.physics import joints as jt

    om, ids = make_om()
    # static anchor box at origin; dynamic box hung 1.2 below via hinge
    body = make_world(
        om,
        [
            dict(obj=ids["box"], pos=[0.0, 0.0, 0.0],
                 response=bodies.RESPONSE_STATIC),
            # offset horizontally so gravity makes it swing about the hinge
            dict(obj=ids["box"], pos=[1.2, 0.0, 0.0]),
        ],
    )
    joints = jt.empty_joints(2, 1)
    axis = jnp.array([0.0, 1.0, 0.0], jnp.float32)  # hinge about +y
    joints = jt.make_hinge_joint(
        joints, 0, e1=0, e2=1,
        a1_local=axis, a2_local=axis,
        r1=jnp.array([0.0, 0, 0.0]), r2=jnp.array([-1.2, 0, 0.0]),
    )
    cfg = PhysicsConfig(dt=1 / 60, substeps=4, gravity=(0, 0, -9.8))
    out = run_steps_with_joints(body, joints, om, cfg, 40)
    p = np.asarray(out.pos[0, 1])
    q = np.asarray(out.rot[0, 1])
    # attachment constraint: r2 in world frame must stay at the anchor
    r2_world = np.asarray(
        m3.quat_rotate(jnp.asarray(q), jnp.array([-1.2, 0, 0.0]))
    ) + p
    np.testing.assert_allclose(r2_world, [0, 0, 0], atol=2e-2)
    # swung downward (z dropped, still at distance 1.2 from anchor)
    assert p[2] < -0.3
    np.testing.assert_allclose(np.linalg.norm(p), 1.2, atol=2e-2)
    # motion stays in the xz-plane (hinge axis +y)
    assert abs(p[1]) < 1e-3
    # both worlds identical
    np.testing.assert_allclose(
        np.asarray(out.pos[1, 1]), p, atol=1e-6
    )


# --------------------------------------------------------------- TGS solver


def test_tgs_box_settles_on_plane():
    from madrona_tpu.physics import tgs as tgs_mod

    om, ids = make_om()
    body = make_world(
        om,
        [
            dict(obj=ids["plane"], response=bodies.RESPONSE_STATIC),
            dict(obj=ids["box"], pos=[0, 0, 1.0]),
        ],
    )
    cfg = PhysicsConfig(dt=1 / 60, substeps=4)
    caps = bp.CandidateCaps(hull_hull=8, hull_plane=8, sphere_any=8)
    h = cfg.dt / cfg.substeps
    g = jnp.asarray(cfg.gravity, jnp.float32)
    tcfg = tgs_mod.TGSConfig()

    @jax.jit
    def step(b):
        cands = bp.find_candidates(b, om, caps, cfg.dt)

        def sub(b, _):
            b = tgs_mod.substep(
                b, lambda bb: api._narrowphase_all(bb, om, cands),
                om, h, g, tcfg,
            )
            return b, None

        b, _ = jax.lax.scan(sub, b, None, length=cfg.substeps)
        return b

    for _ in range(90):
        body = step(body)
    z = float(body.pos[0, 1, 2])
    assert abs(z - 0.5) < 0.03, z         # resting on the plane
    v = np.asarray(body.vel[0, 1])
    assert np.linalg.norm(v) < 0.2, v     # settled
    assert np.isfinite(np.asarray(body.pos)).all()


def test_tgs_via_physics_config():
    """solver='tgs' through the full env pipeline (escape-room class)."""
    import dataclasses as dc

    from madrona_tpu.models.base import make_sim
    from madrona_tpu.models.escape_room import EscapeRoom

    env = EscapeRoom()
    env.cfg = dc.replace(env.cfg, solver="tgs")
    sim = make_sim(env, num_worlds=2, seed=0, donate=False)
    step = sim.step_fn()
    s = sim.state
    a = jnp.zeros((2, 2, 4), jnp.int32).at[..., 0].set(3).at[..., 2].set(2)
    for _ in range(10):
        s, o = step(s, {"action": a, "reset": jnp.zeros((2,), jnp.int32)})
    pos = np.asarray(s.tables["RigidBody"].columns["Position"])
    assert np.isfinite(pos).all()
    # agents stay on the floor and moved forward
    assert (pos[:, 19:, 2] > 0.4).all() and (pos[:, 19:, 2] < 1.2).all()
    assert (pos[:, 19:, 1] > 1.6).all()


def test_kinematic_on_static_no_nan():
    """A zero-inverse-mass (kinematic) body contacting a static floor
    must not NaN the solver: the pair passes broadphase (only
    static|static filters), the contact is valid, and the positional
    lambda's w1+w2 denominator is zero — the guarded division keeps
    every pose finite and unmoved."""
    import dataclasses as dc

    import jax.numpy as jnp

    from madrona_tpu.core.registry import ECSRegistry
    from madrona_tpu.core.state import StateManager
    from madrona_tpu.graph.builder import TaskGraphBuilder
    from madrona_tpu.graph.executor import Executor
    from madrona_tpu.physics import api as phys
    from madrona_tpu.physics import bodies
    from madrona_tpu.physics.bodies import ObjectRegistry
    from madrona_tpu.physics.geo import box_hull
    from madrona_tpu.physics.xpbd import PhysicsConfig

    sm = StateManager()
    reg = ECSRegistry(sm)
    phys.register_types(reg, max_bodies=2)
    om_r = ObjectRegistry()
    # mass=0 -> inv_m = 0, inv_i = 0: immovable hull
    kin = om_r.add_hull(box_hull((0.5, 0.5, 0.5)), mass=0.0)
    pln = om_r.add_plane()
    om = om_r.build()
    b = TaskGraphBuilder(sm, "step")
    phys.setup_physics_step_tasks(b, om, PhysicsConfig())
    ex = Executor(sm, {"step": b.build()}, num_worlds=2, seed=0,
                  donate=False)

    state = ex.state
    t = state.tables["RigidBody"]
    cols = dict(t.columns)
    pos = np.zeros((2, 2, 3), np.float32)
    pos[:, 1] = [0, 0, 0.3]          # kinematic box PENETRATING floor
    cols["Position"] = jnp.asarray(pos)
    rot = np.zeros((2, 2, 4), np.float32)
    rot[..., 0] = 1
    cols["Rotation"] = jnp.asarray(rot)
    cols["Scale"] = jnp.ones((2, 2, 3), jnp.float32)
    cols["ObjectID"] = jnp.asarray(
        np.tile([pln, kin], (2, 1)).astype(np.int32))
    cols["ResponseType"] = jnp.asarray(np.tile(
        [bodies.RESPONSE_STATIC, bodies.RESPONSE_KINEMATIC], (2, 1)
    ).astype(np.int32))
    tables = dict(state.tables)
    tables["RigidBody"] = dc.replace(
        t, columns=cols, num_rows=jnp.full((2,), 2, jnp.int32)
    )
    ex.state = dc.replace(state, tables=tables)

    for _ in range(5):
        ex.run(inputs={})
    p = np.asarray(ex.state.tables["RigidBody"].columns["Position"])
    q = np.asarray(ex.state.tables["RigidBody"].columns["Rotation"])
    assert np.isfinite(p).all() and np.isfinite(q).all()
    # the kinematic body stays exactly where it was put
    np.testing.assert_allclose(p[:, 1], [[0, 0, 0.3]] * 2, atol=1e-5)


def test_tgs_solves_joints():
    """solver='tgs' must enforce registered joints (they were silently
    dropped): a fixed joint between a static anchor and a hanging box
    keeps the box from falling."""
    import dataclasses as dc

    import jax.numpy as jnp

    from madrona_tpu.core.registry import ECSRegistry
    from madrona_tpu.core.state import StateManager
    from madrona_tpu.graph.builder import TaskGraphBuilder
    from madrona_tpu.graph.executor import Executor
    from madrona_tpu.physics import api as phys
    from madrona_tpu.physics import bodies, joints as jt
    from madrona_tpu.physics.bodies import ObjectRegistry
    from madrona_tpu.physics.geo import box_hull
    from madrona_tpu.physics.xpbd import PhysicsConfig

    w = 2
    sm = StateManager()
    reg = ECSRegistry(sm)
    phys.register_types(reg, max_bodies=2)
    phys.register_joint_types(reg, max_joints=1)
    om_r = ObjectRegistry()
    box = om_r.add_hull(box_hull((0.3, 0.3, 0.3)), mass=1.0)
    om = om_r.build()
    b = TaskGraphBuilder(sm, "step")
    phys.setup_physics_step_tasks(
        b, om, PhysicsConfig(solver="tgs")
    )
    ex = Executor(sm, {"step": b.build()}, num_worlds=w, seed=0,
                  donate=False)

    state = ex.state
    t = state.tables["RigidBody"]
    cols = dict(t.columns)
    pos = np.zeros((w, 2, 3), np.float32)
    pos[:, 0] = [0, 0, 5.0]                 # static anchor
    pos[:, 1] = [0, 0, 4.0]                 # hanging box
    cols["Position"] = jnp.asarray(pos)
    rot = np.zeros((w, 2, 4), np.float32)
    rot[..., 0] = 1
    cols["Rotation"] = jnp.asarray(rot)
    cols["Scale"] = jnp.ones((w, 2, 3), jnp.float32)
    cols["ObjectID"] = jnp.full((w, 2), box, jnp.int32)
    cols["ResponseType"] = jnp.asarray(np.tile(
        [bodies.RESPONSE_STATIC, bodies.RESPONSE_DYNAMIC], (w, 1)
    ).astype(np.int32))
    tables = dict(state.tables)
    tables["RigidBody"] = dc.replace(
        t, columns=cols, num_rows=jnp.full((w,), 2, jnp.int32)
    )
    state = dc.replace(state, tables=tables)
    # fixed joint: anchor bottom to box top, 1 unit apart
    jb = phys.joints_view(state)
    jb = dc.replace(
        jb,
        e1=jb.e1.at[:, 0].set(0), e2=jb.e2.at[:, 0].set(1),
        jtype=jb.jtype.at[:, 0].set(jt.JOINT_FIXED),
        r1=jb.r1.at[:, 0].set(jnp.asarray([0.0, 0, -0.5])),
        r2=jb.r2.at[:, 0].set(jnp.asarray([0.0, 0, 0.5])),
        attach_q1=jb.attach_q1.at[:, 0].set(
            jnp.asarray([1.0, 0, 0, 0])),
        attach_q2=jb.attach_q2.at[:, 0].set(
            jnp.asarray([1.0, 0, 0, 0])),
        active=jb.active.at[:, 0].set(True),
    )
    state = phys.write_joints(state, jb)
    ex.state = state

    for _ in range(30):
        ex.run(inputs={})
    p = np.asarray(ex.state.tables["RigidBody"].columns["Position"])
    assert np.isfinite(p).all()
    # without the joint the box free-falls ~5m in 1s; with it, it hangs
    # near z=4 (soft positional solve: allow slack)
    assert (p[:, 1, 2] > 3.0).all(), p[:, 1]
