"""Whole-substep solver megakernel vs the XLA jacobi path.

The kernel replicates integrate / position solve / joint solve /
set_velocities / velocity solve op-for-op; interpret mode must match the
XLA path to float tolerance on synthetic scenes AND on the full escape
room pipeline (cfg.megakernel=True vs False)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madrona_tpu.physics import api as papi
from madrona_tpu.physics import bodies as pb
from madrona_tpu.physics import geo
from madrona_tpu.physics import joints as pj
from madrona_tpu.physics import xpbd
from madrona_tpu.physics.xpbd import BodyState, Contacts, PhysicsConfig


W, N, C, J = 4, 8, 6, 2


def _make_om():
    reg = pb.ObjectRegistry()
    reg.add_plane()
    reg.add_hull(geo.box_hull((0.5, 0.5, 0.5)), mass=1.0)
    reg.add_hull(geo.box_hull((0.4, 0.8, 0.3)), mass=2.5)
    return reg.build()


def _rand_state(rs, om):
    def q_rand(shape):
        q = rs.randn(*shape, 4).astype(np.float32)
        return q / np.linalg.norm(q, axis=-1, keepdims=True)

    pos = rs.uniform(-2, 2, (W, N, 3)).astype(np.float32)
    pos[..., 2] += 2.0
    obj = rs.randint(1, 3, (W, N)).astype(np.int32)
    obj[:, 0] = 0
    resp = np.full((W, N), xpbd.RESPONSE_DYNAMIC, np.int32)
    resp[:, 0] = xpbd.RESPONSE_STATIC
    active = np.ones((W, N), bool)
    active[:, -1] = False
    z3 = jnp.zeros((W, N, 3))
    z4 = jnp.zeros((W, N, 4))
    return BodyState(
        pos=jnp.asarray(pos), rot=jnp.asarray(q_rand((W, N))),
        scale=jnp.ones((W, N, 3)),
        vel=jnp.asarray(rs.randn(W, N, 3).astype(np.float32)),
        omega=jnp.asarray(0.5 * rs.randn(W, N, 3).astype(np.float32)),
        obj_id=jnp.asarray(obj), response=jnp.asarray(resp),
        ext_force=jnp.asarray(0.1 * rs.randn(W, N, 3).astype(np.float32)),
        ext_torque=jnp.asarray(0.1 * rs.randn(W, N, 3).astype(np.float32)),
        prev_x=z3, prev_q=z4, presolve_x=z3, presolve_q=z4,
        presolve_v=z3, presolve_w=z3,
        active=jnp.asarray(active),
    )


def _rand_contacts(rs):
    nrm = rs.randn(W, C, 3).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    pts = rs.uniform(-2, 2, (W, C, 4, 3)).astype(np.float32)
    dep = rs.uniform(-0.02, 0.08, (W, C, 4, 1)).astype(np.float32)
    ref = rs.randint(1, N - 1, (W, C)).astype(np.int32)   # dynamic refs
    alt = rs.randint(0, N - 1, (W, C)).astype(np.int32)
    alt = np.where(alt == ref, (alt + 1) % (N - 1), alt)
    num = rs.randint(0, 5, (W, C)).astype(np.int32)
    return Contacts(
        ref=jnp.asarray(ref), alt=jnp.asarray(alt),
        points=jnp.asarray(np.concatenate([pts, dep], axis=-1)),
        num=jnp.asarray(num), normal=jnp.asarray(nrm),
        lambda_n=jnp.zeros((W, C)),
    )


def _rand_joints(rs):
    def q_rand(shape):
        q = rs.randn(*shape, 4).astype(np.float32)
        return q / np.linalg.norm(q, axis=-1, keepdims=True)

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
        separation=jnp.asarray(
            0.2 * rs.rand(W, J).astype(np.float32)
        ),
        a1_local=jnp.asarray(a1), a2_local=jnp.asarray(a2),
        active=jnp.asarray(active),
    )


def _xla_substeps(body, contacts, om, cfg, jbuf=None):
    h = cfg.dt / cfg.substeps
    g = jnp.asarray(cfg.gravity, jnp.float32)

    def sub(body, _):
        body = xpbd.integrate(body, om, h, g)
        body, cts = xpbd.solve_positions_jacobi(
            body, contacts, om, cfg.jacobi_iters
        )
        if jbuf is not None:
            body = pj.solve_joints_jacobi(body, jbuf, om)
        body = xpbd.set_velocities(body, h)
        body = xpbd.solve_velocities_jacobi(
            body, cts, om, h, cfg.restitution, cfg.restitution_threshold
        )
        return body, None

    body, _ = jax.lax.scan(sub, body, None, length=cfg.substeps)
    return body


FIELDS = (
    "pos", "rot", "vel", "omega", "prev_x", "prev_q",
    "presolve_x", "presolve_q", "presolve_v", "presolve_w",
)


@pytest.mark.parametrize("with_joints", [False, True])
@pytest.mark.parametrize("substeps,iters,rtol,atol", [
    # single substep: only scatter-order rounding separates the paths
    (1, 1, 1e-4, 1e-5),
    # full depth: rounding amplifies through 4 stiff contact substeps
    (4, 2, 5e-3, 5e-4),
])
def test_megakernel_matches_xla_path(with_joints, substeps, iters,
                                     rtol, atol):
    rs = np.random.RandomState(42 + with_joints)
    om = _make_om()
    body = _rand_state(rs, om)
    contacts = _rand_contacts(rs)
    jbuf = _rand_joints(rs) if with_joints else None
    cfg = PhysicsConfig(
        substeps=substeps, jacobi_iters=iters, narrowphase_once=True
    )

    ref = jax.jit(
        lambda b: _xla_substeps(b, contacts, om, cfg, jbuf)
    )(body)
    got = jax.jit(
        lambda b: papi.megakernel_substeps(
            b, contacts, om, cfg, jbuf=jbuf, interpret=True
        )
    )(body)

    for f in FIELDS:
        np.testing.assert_allclose(
            np.asarray(getattr(got, f)), np.asarray(getattr(ref, f)),
            rtol=rtol, atol=atol, err_msg=f,
        )


def test_escape_room_megakernel_pipeline():
    from madrona_tpu.models.base import make_sim
    from madrona_tpu.models.escape_room import EscapeRoom

    outs = {}
    for mega in (False, True):
        env = EscapeRoom()
        env.cfg = dataclasses.replace(env.cfg, megakernel=mega)
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
        outs[mega] = frames

    for t in range(10):
        for k in outs[False][t]:
            np.testing.assert_allclose(
                outs[True][t][k], outs[False][t][k],
                rtol=2e-3, atol=2e-4, err_msg=f"step {t} key {k}",
            )


def test_hide_seek_megakernel_pipeline():
    """Hide&seek drives joints (grabs) + per-step ResponseType switching
    (locks) through the megakernel; outputs must match the XLA path."""
    from madrona_tpu.models.base import make_sim
    from madrona_tpu.models.hide_seek import HideSeek

    env_a = HideSeek(pixels=False)
    env_a.cfg = dataclasses.replace(env_a.cfg, megakernel=False)
    env_b = HideSeek(pixels=False)
    env_b.cfg = dataclasses.replace(env_b.cfg, megakernel=True)
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


@pytest.mark.parametrize("with_joints", [False, True])
def test_megakernel_dyn_range_matches_full(with_joints):
    """solver_dynamic_range specialization is EXACT: the split kernel
    (row 0 static outside the range, rows 1..7 solved) must equal the
    full kernel bitwise — one-hot gathers sum zeros except the matching
    row, and static rows receive zero delta under the static guard."""
    rs = np.random.RandomState(7 + with_joints)
    om = _make_om()
    body = _rand_state(rs, om)
    contacts = _rand_contacts(rs)
    jbuf = _rand_joints(rs) if with_joints else None
    cfg = PhysicsConfig(substeps=4, jacobi_iters=2, narrowphase_once=True)

    full = jax.jit(
        lambda b: papi.megakernel_substeps(
            b, contacts, om, cfg, jbuf=jbuf, interpret=True
        )
    )(body)
    cfg_s = dataclasses.replace(cfg, solver_dynamic_range=(1, N))
    split = jax.jit(
        lambda b: papi.megakernel_substeps(
            b, contacts, om, cfg_s, jbuf=jbuf, interpret=True
        )
    )(body)
    for f in FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(split, f)), np.asarray(getattr(full, f)),
            err_msg=f,
        )


def test_megakernel_loop_matches_xla_path():
    """megakernel_loop=True (lax.fori_loop substeps): same math/order as
    the unroll, but compiler reassociation + knife-edge friction
    branches make bitwise comparison against the unrolled kernel
    meaningless — validate against the XLA-path oracle with the same
    tolerances as the unrolled kernel's own test."""
    import dataclasses as _dc

    rs = np.random.RandomState(42)
    om = _make_om()
    body = _rand_state(rs, om)
    contacts = _rand_contacts(rs)
    cfg = PhysicsConfig(
        substeps=4, jacobi_iters=2, narrowphase_once=True,
        megakernel=True, megakernel_loop=True,
    )
    ref = jax.jit(
        lambda b: _xla_substeps(b, contacts, om, cfg)
    )(body)
    got = jax.jit(
        lambda b: papi.megakernel_substeps(
            b, contacts, om, cfg, tile_w=8, interpret=True
        )
    )(body)
    for f in FIELDS:
        np.testing.assert_allclose(
            np.asarray(getattr(got, f)), np.asarray(getattr(ref, f)),
            rtol=5e-3, atol=5e-4, err_msg=f,
        )


def test_megakernel_ref_static_lanes_exact():
    """solver_ref_dyn_lanes: contact lanes >= K whose ref row is static
    (outside the dyn range) have structurally-zero dyn masks, so
    skipping their ref-side gathers/scatters drops only exact-zero
    terms. On Mosaic the scatter reduces sequentially over lanes, so
    compiled results are bit-identical; interpret mode (XLA CPU) may
    pick a different reduction TREE for the shorter shape, which
    rounds live-lane partial sums differently by ulps — hence the
    tight tolerance here (substeps amplify ~1e-6)."""
    rs = np.random.RandomState(31)
    om = _make_om()
    body = _rand_state(rs, om)
    contacts = _rand_contacts(rs)
    k = 3
    ref = np.asarray(contacts.ref).copy()
    ref[:, k:] = 0                      # static floor row
    alt = np.asarray(contacts.alt).copy()
    alt[:, k:] = np.clip(alt[:, k:], 1, N - 1)
    contacts = dataclasses.replace(
        contacts, ref=jnp.asarray(ref), alt=jnp.asarray(alt)
    )
    cfg = PhysicsConfig(
        substeps=4, jacobi_iters=1, narrowphase_once=True,
        solver_dynamic_range=(1, N),
    )
    base = jax.jit(
        lambda b: papi.megakernel_substeps(
            b, contacts, om, cfg, interpret=True
        )
    )(body)
    cfg_k = dataclasses.replace(cfg, solver_ref_dyn_lanes=k)
    seg = jax.jit(
        lambda b: papi.megakernel_substeps(
            b, contacts, om, cfg_k, interpret=True
        )
    )(body)
    for f in FIELDS:
        np.testing.assert_allclose(
            np.asarray(getattr(seg, f)), np.asarray(getattr(base, f)),
            atol=1e-4, rtol=0, err_msg=f,
        )
