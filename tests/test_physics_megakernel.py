"""Fused whole-physics-step megakernel vs the split path.

ops/physics_megakernel runs narrowphase (hh SAT + hull-plane + sphere
lanes) AND the substep loop in one Pallas call; interpret mode must
match the split path (XLA narrowphase at predicted poses + the solver
megakernel / XLA jacobi) on synthetic scenes and on the full env
pipelines. Tolerances follow test_solver_pallas.py (scatter-order
rounding over 4 stiff substeps)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madrona_tpu.physics import api as papi
from madrona_tpu.physics import bodies as pb
from madrona_tpu.physics import broadphase as bp
from madrona_tpu.physics import geo
from madrona_tpu.physics import joints as pj
from madrona_tpu.physics import xpbd
from madrona_tpu.physics.xpbd import BodyState, PhysicsConfig

W, N = 4, 10


def _make_om():
    reg = pb.ObjectRegistry()
    reg.add_plane()
    reg.add_hull(geo.box_hull((0.5, 0.5, 0.5)), mass=1.0)
    reg.add_hull(geo.box_hull((0.4, 0.8, 0.3)), mass=2.5)
    reg.add_sphere(0.45, mass=0.8)
    return reg.build()


def _scene(rs, om, spheres=True):
    """Plane floor + random dynamic boxes/spheres dropped close enough
    to generate hull-hull, hull-plane, and sphere-* candidates."""
    def q_rand(shape):
        q = rs.randn(*shape, 4).astype(np.float32)
        return q / np.linalg.norm(q, axis=-1, keepdims=True)

    pos = rs.uniform(-1.2, 1.2, (W, N, 3)).astype(np.float32)
    pos[..., 2] = rs.uniform(0.2, 1.4, (W, N)).astype(np.float32)
    pos[:, 0] = 0.0
    obj = rs.randint(1, 4 if spheres else 3, (W, N)).astype(np.int32)
    obj[:, 0] = 0                      # row 0: the floor plane
    resp = np.full((W, N), xpbd.RESPONSE_DYNAMIC, np.int32)
    resp[:, 0] = xpbd.RESPONSE_STATIC
    active = np.ones((W, N), bool)
    active[:, -1] = False
    rot = q_rand((W, N))
    rot[:, 0] = [1, 0, 0, 0]
    z3 = jnp.zeros((W, N, 3))
    z4 = jnp.zeros((W, N, 4))
    return BodyState(
        pos=jnp.asarray(pos), rot=jnp.asarray(rot),
        scale=jnp.ones((W, N, 3)),
        vel=jnp.asarray(0.5 * rs.randn(W, N, 3).astype(np.float32)),
        omega=jnp.asarray(0.3 * rs.randn(W, N, 3).astype(np.float32)),
        obj_id=jnp.asarray(obj), response=jnp.asarray(resp),
        ext_force=jnp.asarray(0.1 * rs.randn(W, N, 3).astype(np.float32)),
        ext_torque=jnp.asarray(
            0.1 * rs.randn(W, N, 3).astype(np.float32)
        ),
        prev_x=z3, prev_q=z4, presolve_x=z3, presolve_q=z4,
        presolve_v=z3, presolve_w=z3,
        active=jnp.asarray(active),
    )


def _rand_joints(rs):
    def q_rand(shape):
        q = rs.randn(*shape, 4).astype(np.float32)
        return q / np.linalg.norm(q, axis=-1, keepdims=True)

    J = 2
    e1 = rs.randint(1, N - 1, (W, J)).astype(np.int32)
    e2 = rs.randint(1, N - 1, (W, J)).astype(np.int32)
    e2 = np.where(e2 == e1, (e2 + 1) % (N - 1), e2)
    a1 = rs.randn(W, J, 3).astype(np.float32)
    a1 /= np.linalg.norm(a1, axis=-1, keepdims=True)
    a2 = rs.randn(W, J, 3).astype(np.float32)
    a2 /= np.linalg.norm(a2, axis=-1, keepdims=True)
    active = np.ones((W, J), bool)
    active[0, 0] = False
    return pj.Joints(
        e1=jnp.asarray(e1), e2=jnp.asarray(e2),
        jtype=jnp.asarray(rs.randint(0, 2, (W, J)).astype(np.int32)),
        r1=jnp.asarray(0.3 * rs.randn(W, J, 3).astype(np.float32)),
        r2=jnp.asarray(0.3 * rs.randn(W, J, 3).astype(np.float32)),
        attach_q1=jnp.asarray(q_rand((W, J))),
        attach_q2=jnp.asarray(q_rand((W, J))),
        separation=jnp.asarray(0.2 * rs.rand(W, J).astype(np.float32)),
        a1_local=jnp.asarray(a1), a2_local=jnp.asarray(a2),
        active=jnp.asarray(active),
    )


FIELDS = (
    "pos", "rot", "vel", "omega", "prev_x", "prev_q",
    "presolve_x", "presolve_q", "presolve_v", "presolve_w",
)

CAPS = bp.CandidateCaps(hull_hull=12, hull_plane=10, sphere_any=10)


def _split_step(body, cands, om, cfg, jbuf=None):
    """The reference composition: XLA narrowphase at predicted poses,
    then the solver megakernel (itself proven against the XLA path)."""
    h = cfg.dt / cfg.substeps
    g = jnp.asarray(cfg.gravity, jnp.float32)
    frozen = papi._narrowphase_all(
        xpbd.integrate(body, om, h, g), om, cands
    )
    return papi.megakernel_substeps(
        body, frozen, om, cfg, jbuf=jbuf, interpret=True
    )


@pytest.mark.parametrize("with_joints", [False, True])
@pytest.mark.parametrize("seed", [0, 7])
def test_fused_matches_split(with_joints, seed):
    rs = np.random.RandomState(seed)
    om = _make_om()
    body = _scene(rs, om)
    cfg = PhysicsConfig(
        substeps=4, jacobi_iters=2, narrowphase_once=True,
        megakernel_fused=True,
    )
    cands = bp.find_candidates(body, om, CAPS, cfg.dt)
    assert int(jnp.sum(cands.hh_num)) > 0, "scene must make hh pairs"
    assert int(jnp.sum(cands.hp_num)) > 0, "scene must make hp pairs"
    assert int(jnp.sum(cands.sp_num)) > 0, "scene must make sp pairs"
    jbuf = _rand_joints(rs) if with_joints else None

    ref = jax.jit(lambda b: _split_step(b, cands, om, cfg, jbuf))(body)
    got = jax.jit(
        lambda b: papi.megakernel_fused_step(
            b, cands, om, cfg, jbuf=jbuf, interpret=True
        )
    )(body)

    for f in FIELDS:
        np.testing.assert_allclose(
            np.asarray(getattr(got, f)), np.asarray(getattr(ref, f)),
            rtol=5e-3, atol=5e-4, err_msg=f,
        )


def test_fused_pair_chunking_invariant():
    """Chunked hh SAT sweeps must produce the same step output."""
    rs = np.random.RandomState(3)
    om = _make_om()
    body = _scene(rs, om)
    base = PhysicsConfig(
        substeps=2, jacobi_iters=1, narrowphase_once=True,
        megakernel_fused=True,
    )
    cands = bp.find_candidates(body, om, CAPS, base.dt)

    outs = []
    for chunk in (0, 4, 8):
        cfg = dataclasses.replace(base, fused_pair_chunk=chunk)
        outs.append(jax.jit(
            lambda b, c=cfg: papi.megakernel_fused_step(
                b, cands, om, c, interpret=True
            )
        )(body))
    for f in FIELDS:
        for o in outs[1:]:
            np.testing.assert_array_equal(
                np.asarray(getattr(o, f)),
                np.asarray(getattr(outs[0], f)), err_msg=f,
            )


def test_escape_room_fused_pipeline():
    """Full escape-room rollout: fused megakernel vs the default XLA
    path (same bar as test_escape_room_megakernel_pipeline)."""
    from madrona_tpu.models.base import make_sim
    from madrona_tpu.models.escape_room import EscapeRoom

    outs = {}
    for fused in (False, True):
        env = EscapeRoom()
        env.cfg = dataclasses.replace(
            env.cfg, megakernel=False, megakernel_fused=fused,
            narrowphase="xla",
        )
        sim = make_sim(env, num_worlds=2, seed=0, donate=False)
        step = sim.step_fn()
        s = sim.state
        rs = np.random.RandomState(0)
        acts = env.random_actions(rs, 10, 2)
        frames = []
        for t in range(10):
            s, o = step(
                s, {"action": acts[t], "reset": jnp.zeros((2,), jnp.int32)}
            )
            frames.append({k: np.asarray(v) for k, v in o.items()})
        outs[fused] = frames

    for t in range(10):
        for k in outs[False][t]:
            np.testing.assert_allclose(
                outs[True][t][k], outs[False][t][k],
                rtol=2e-3, atol=2e-4, err_msg=f"step {t} key {k}",
            )


def test_hide_seek_fused_pipeline():
    """Hide&seek: joints (grabs) + ResponseType switching (locks)
    through the fused kernel."""
    from madrona_tpu.models.base import make_sim
    from madrona_tpu.models.hide_seek import HideSeek

    env_a = HideSeek(pixels=False)
    env_a.cfg = dataclasses.replace(env_a.cfg, megakernel=False, megakernel_fused=False,
        narrowphase="xla")
    env_b = HideSeek(pixels=False)
    env_b.cfg = dataclasses.replace(env_b.cfg, megakernel=False, megakernel_fused=True,
        narrowphase="xla")
    sim_a = make_sim(env_a, num_worlds=2, seed=3, donate=False)
    sim_b = make_sim(env_b, num_worlds=2, seed=3, donate=False)
    step_a = sim_a.step_fn()
    step_b = sim_b.step_fn()
    s = sim_a.state
    rs = np.random.RandomState(1)
    # LOCKSTEP comparison: both paths step from the SAME state each
    # step (the XLA path drives), so kernel-vs-XLA ulp differences
    # cannot compound through the chaotic multi-contact sim — the
    # single-step bound stays tight
    for t in range(8):
        a = jnp.asarray(
            rs.randint(0, 2, (2, 4, 5)), jnp.int32
        ).at[..., 0].set(rs.randint(0, 4, (2, 4)))
        inp = {"action": a, "reset": jnp.zeros((2,), jnp.int32)}
        s_next, o_a = step_a(s, inp)
        _, o_b = step_b(s, inp)
        for k in o_a:
            np.testing.assert_allclose(
                np.asarray(o_b[k]), np.asarray(o_a[k]),
                rtol=1e-3, atol=2e-4, err_msg=f"step {t} key {k}",
            )
        s = s_next


def test_contacts_megakernel_matches_split_path():
    """narrowphase='pallas_mega' (contacts kernel -> planar solver
    inputs) must reproduce the split path (XLA/sublane narrowphase +
    W-major packing) bit-for-bit on the full escape-room pipeline: the
    kernel runs the same hh SAT (hh_sat_planes), the same plane-form hp
    lane, and the same avg/max-pen reduction. Candidate rows/counts are
    bit-exact; contact values carry 1-2 ulp of FMA-contraction rounding
    (plane-form vs vector-form fusion, the suite's fused-kernel
    tolerance class), so trajectories are compared to tight
    tolerances."""
    import numpy as np

    from madrona_tpu.models.base import make_sim
    from madrona_tpu.models.escape_room import EscapeRoom

    def run(narrowphase):
        env = EscapeRoom()
        env.cfg = dataclasses.replace(
            env.cfg, narrowphase=narrowphase, megakernel=True,
            narrowphase_once=True,
        )
        sim = make_sim(env, num_worlds=4, seed=9, donate=False)
        step = sim.step_fn()
        state = sim.state
        acts = env.random_actions(np.random.RandomState(4), 8, 4)
        outs = None
        for t in range(8):
            state, outs = step(state, {
                "action": acts[t],
                "reset": jnp.zeros((4,), jnp.int32),
            })
        pos = np.asarray(state.tables["RigidBody"].columns["Position"])
        vel = np.asarray(
            state.tables["RigidBody"].columns["Velocity"]["linear"]
        )
        return pos, vel, {k: np.asarray(v) for k, v in outs.items()}

    p1, v1, o1 = run("xla")
    p2, v2, o2 = run("pallas_mega")
    np.testing.assert_allclose(p1, p2, atol=2e-3, rtol=0)
    np.testing.assert_allclose(v1, v2, atol=2e-2, rtol=0)
    for k in ("reward", "done"):
        np.testing.assert_allclose(
            o1[k].astype(np.float64), o2[k].astype(np.float64),
            atol=1e-3, rtol=0, err_msg=k,
        )


def test_contacts_megakernel_buffers_match_split():
    """Direct contact-buffer parity: rows/num bit-exact; live-lane
    contact values within ulp-level FMA-contraction bounds."""
    import numpy as np

    from madrona_tpu.models.base import make_sim
    from madrona_tpu.models.escape_room import EscapeRoom
    from madrona_tpu.physics import api as papi
    from madrona_tpu.physics import broadphase as bpm
    from madrona_tpu.ops import physics_megakernel as fpk2

    env = EscapeRoom()
    sim = make_sim(env, num_worlds=4, seed=9, donate=False)
    step = sim.step_fn()
    state = sim.state
    acts = env.random_actions(np.random.RandomState(4), 6, 4)
    for t in range(6):
        state, _ = step(state, {
            "action": acts[t], "reset": jnp.zeros((4,), jnp.int32),
        })
    cfg = env.cfg
    om = env.om
    body = papi.body_state(sim.executor.sm, state)
    h = cfg.dt / cfg.substeps
    cands = bpm.find_candidates(body, om, env.caps, cfg.dt)
    pred = xpbd.integrate(body, om, h, jnp.asarray(cfg.gravity, jnp.float32))

    contacts = papi._narrowphase_all(pred, om, cands)
    avg, max_pen, zero = xpbd._avg_contacts_batch(
        contacts.points, contacts.num
    )
    ok = (contacts.num > 0) & (~zero)

    t2 = lambda a: jnp.transpose(a, (1, 0))
    nb_t = jnp.moveaxis(
        jnp.concatenate([pred.pos, pred.rot, pred.scale], -1), 0, -1
    )
    obj_t = jnp.moveaxis(body.obj_id.astype(jnp.float32), 0, -1)
    fnc = fpk2.make_contacts_kernel(
        om.hull_dims, body.pos.shape[1], om.hull_pack.shape[0],
        interpret=True,
    )
    ref_p, alt_p, con_p, pts_p, num_p = jax.jit(fnc)(
        t2(cands.hh[..., 0]), t2(cands.hh[..., 1]),
        t2(cands.hp[..., 0]), t2(cands.hp[..., 1]),
        nb_t, obj_t, om.hull_pack_planar,
    )
    np.testing.assert_array_equal(
        np.asarray(t2(ref_p)).astype(np.int32), np.asarray(contacts.ref)
    )
    np.testing.assert_array_equal(
        np.asarray(t2(alt_p)).astype(np.int32), np.asarray(contacts.alt)
    )
    np.testing.assert_array_equal(
        np.asarray(t2(num_p)), np.asarray(contacts.num)
    )
    con_ref = jnp.concatenate(
        [contacts.normal, avg, max_pen[..., None],
         ok.astype(jnp.float32)[..., None]], axis=-1,
    )
    con_ref_t = np.asarray(jnp.transpose(con_ref, (2, 1, 0)))
    okm = np.asarray(ok).T[None]                       # [1, C, W]
    d_con = np.where(okm, np.asarray(con_p) - con_ref_t, 0.0)
    assert np.abs(d_con).max() < 1e-4, np.abs(d_con).max()
    num_np = np.asarray(contacts.num).T                # [C, W]
    pts_ref_t = np.asarray(jnp.transpose(
        contacts.points.reshape(4, -1, 16), (2, 1, 0)
    ))
    live16 = np.repeat(
        np.stack([(k < num_np) for k in range(4)]), 4, axis=0
    )
    d_pts = np.where(live16 & okm, np.asarray(pts_p) - pts_ref_t, 0.0)
    assert np.abs(d_pts).max() < 1e-4, np.abs(d_pts).max()
