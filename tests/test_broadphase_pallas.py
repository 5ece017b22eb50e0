"""Pallas broadphase kernel vs the XLA all-pairs tier.

ops/broadphase_pallas must produce BIT-IDENTICAL Candidates to
physics/broadphase.py::find_candidates (same AABB transform, same
row-major triu compaction order, same sentinels/counts/overflow) so the
whole physics step stays exact across tiers. Runs in interpret mode on
the CPU backend (the suite's convention for kernel parity)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madrona_tpu.physics import bodies as pb
from madrona_tpu.physics import broadphase as bp
from madrona_tpu.physics import geo
from madrona_tpu.physics import xpbd
from madrona_tpu.physics.xpbd import BodyState

W, N = 8, 12
DT = 1.0 / 30.0


def _make_om(with_sphere=True):
    reg = pb.ObjectRegistry()
    reg.add_plane()
    reg.add_hull(geo.box_hull((0.5, 0.5, 0.5)), mass=1.0)
    reg.add_hull(geo.box_hull((0.4, 0.8, 0.3)), mass=2.5)
    if with_sphere:
        reg.add_sphere(0.45, mass=0.8)
    return reg.build()


def _scene(rs, om, n_obj_hi, crowded=False):
    def q_rand(shape):
        q = rs.randn(*shape, 4).astype(np.float32)
        return q / np.linalg.norm(q, axis=-1, keepdims=True)

    spread = 0.8 if crowded else 2.5
    pos = rs.uniform(-spread, spread, (W, N, 3)).astype(np.float32)
    pos[..., 2] = rs.uniform(0.0, 1.2 if crowded else 3.0, (W, N))
    pos[:, 0] = 0.0
    obj = rs.randint(1, n_obj_hi, (W, N)).astype(np.int32)
    obj[:, 0] = 0                       # row 0: the floor plane
    resp = np.full((W, N), xpbd.RESPONSE_DYNAMIC, np.int32)
    resp[:, 0] = xpbd.RESPONSE_STATIC
    resp[:, 1] = xpbd.RESPONSE_STATIC   # one static box (static|static skip)
    active = np.ones((W, N), bool)
    active[:, -2:] = rs.rand(W, 2) < 0.5   # some dead rows
    rot = q_rand((W, N))
    rot[:, 0] = [1, 0, 0, 0]
    z3 = jnp.zeros((W, N, 3))
    z4 = jnp.zeros((W, N, 4))
    return BodyState(
        pos=jnp.asarray(pos), rot=jnp.asarray(rot),
        scale=jnp.asarray(
            rs.uniform(0.5, 1.8, (W, N, 3)).astype(np.float32)
        ),
        vel=jnp.asarray(1.5 * rs.randn(W, N, 3).astype(np.float32)),
        omega=z3, obj_id=jnp.asarray(obj),
        response=jnp.asarray(resp),
        ext_force=z3, ext_torque=z3,
        prev_x=z3, prev_q=z4, presolve_x=z3, presolve_q=z4,
        presolve_v=z3, presolve_w=z3,
        active=jnp.asarray(active),
    )


def _assert_cands_equal(a: bp.Candidates, b: bp.Candidates):
    for f in ("hh", "hh_num", "hp", "hp_num", "sp", "sp_num", "sp_kind"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f)), err_msg=f
        )
    np.testing.assert_array_equal(
        np.asarray(a.overflow), np.asarray(b.overflow), err_msg="overflow"
    )


@pytest.mark.parametrize("crowded", [False, True])
@pytest.mark.parametrize("seed", [0, 1])
def test_matches_xla_all_pairs(seed, crowded):
    om = _make_om()
    body = _scene(np.random.RandomState(seed), om, n_obj_hi=4,
                  crowded=crowded)
    caps = bp.CandidateCaps(hull_hull=8, hull_plane=6, sphere_any=4)
    ref = find_ref(body, om, caps)
    got = bp.find_candidates_pallas(
        body, om, caps, DT, interpret=True
    )
    _assert_cands_equal(got, ref)


def find_ref(body, om, caps):
    return jax.jit(
        lambda b: bp.find_candidates(b, om, caps, DT)
    )(body)


def test_saturation_reported_identically():
    # tiny caps so every tier saturates; the kernel must clamp counts
    # and set overflow exactly like the XLA compact()
    om = _make_om()
    body = _scene(np.random.RandomState(3), om, n_obj_hi=4, crowded=True)
    caps = bp.CandidateCaps(hull_hull=2, hull_plane=1, sphere_any=1)
    ref = find_ref(body, om, caps)
    got = bp.find_candidates_pallas(body, om, caps, DT, interpret=True)
    _assert_cands_equal(got, ref)
    assert np.asarray(got.overflow).any()


def test_zero_sphere_cap():
    # sphere tier disabled (no sphere prims registered): cap 0 buffers
    om = _make_om(with_sphere=False)
    body = _scene(np.random.RandomState(5), om, n_obj_hi=3)
    caps = bp.CandidateCaps(hull_hull=8, hull_plane=6, sphere_any=0)
    ref = find_ref(body, om, caps)
    got = bp.find_candidates_pallas(body, om, caps, DT, interpret=True)
    _assert_cands_equal(got, ref)
    assert got.sp.shape == (W, 0, 2)


def test_step_bit_identical_across_tiers():
    # whole physics step: pallas broadphase tier vs all_pairs tier must
    # produce identical trajectories (candidates are bit-equal, so the
    # downstream narrowphase/solver see identical inputs)
    from madrona_tpu.models.base import make_sim
    from madrona_tpu.models.escape_room import EscapeRoom

    def run(tier):
        env = EscapeRoom()
        env.cfg = dataclasses.replace(env.cfg, broadphase=tier)
        sim = make_sim(env, num_worlds=4, seed=11, donate=False)
        step = sim.step_fn()
        state = sim.state
        acts = env.random_actions(np.random.RandomState(2), 10, 4)
        outs = None
        for t in range(10):
            state, outs = step(state, {
                "action": acts[t],
                "reset": jnp.zeros((4,), jnp.int32),
            })
        return state, outs

    s1, o1 = run("all_pairs")
    s2, o2 = run("pallas")
    for k in o1:
        np.testing.assert_array_equal(
            np.asarray(o1[k]), np.asarray(o2[k]), err_msg=k
        )
    p1 = np.asarray(s1.tables["RigidBody"].columns["Position"])
    p2 = np.asarray(s2.tables["RigidBody"].columns["Position"])
    np.testing.assert_array_equal(p1, p2)
