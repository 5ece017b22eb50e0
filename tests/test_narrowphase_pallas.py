"""Pallas hull-hull narrowphase vs the JAX path (interpret mode)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madrona_tpu.models.base import make_sim
from madrona_tpu.models.escape_room import EscapeRoom
from madrona_tpu.physics import api, broadphase as bp


@pytest.fixture(scope="module")
def scene():
    W = 4
    env = EscapeRoom()
    sim = make_sim(env, num_worlds=W, seed=3, donate=False)
    step = sim.step_fn()
    s = sim.state
    a = EscapeRoom.random_actions(np.random.RandomState(0), 6, W)
    for t in range(6):
        s, _ = step(s, {"action": a[t], "reset": jnp.zeros((W,), jnp.int32)})
    body = api.body_state(sim.executor.sm, s)
    cands = bp.find_candidates(body, env.om, env.caps, env.cfg.dt)
    return env, body, cands


def test_pallas_matches_jax_narrowphase(scene):
    env, body, cands = scene
    om = env.om
    # JAX reference: full narrowphase, slice the hh segment
    contacts = api._narrowphase_all(body, om, cands)
    P = env.caps.hull_hull
    ref_j = np.asarray(contacts.ref[:, :P])
    alt_j = np.asarray(contacts.alt[:, :P])
    num_j = np.asarray(contacts.num[:, :P])
    nrm_j = np.asarray(contacts.normal[:, :P])
    pts_j = np.asarray(contacts.points[:, :P])

    ref_p, alt_p, pts_p, num_p, nrm_p = api.narrowphase_hh_pallas(
        body, om, cands, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(ref_p), ref_j)
    np.testing.assert_array_equal(np.asarray(alt_p), alt_j)
    np.testing.assert_array_equal(np.asarray(num_p), num_j)
    active = num_j > 0
    np.testing.assert_allclose(
        np.asarray(nrm_p)[active], nrm_j[active], atol=2e-5
    )
    # compare manifold points only where live (slots beyond num are junk
    # in both paths)
    for w in range(pts_j.shape[0]):
        for p in range(P):
            k = num_j[w, p]
            if k > 0:
                np.testing.assert_allclose(
                    np.asarray(pts_p)[w, p, :k], pts_j[w, p, :k],
                    atol=3e-4,
                )


def test_pallas_sublane_matches_jax_narrowphase(scene):
    """Pairs-in-sublanes variant (pair axis padded to the pair tile)."""
    env, body, cands = scene
    om = env.om
    contacts = api._narrowphase_all(body, om, cands)
    P = env.caps.hull_hull
    ref_j = np.asarray(contacts.ref[:, :P])
    alt_j = np.asarray(contacts.alt[:, :P])
    num_j = np.asarray(contacts.num[:, :P])
    nrm_j = np.asarray(contacts.normal[:, :P])
    pts_j = np.asarray(contacts.points[:, :P])

    ref_p, alt_p, pts_p, num_p, nrm_p = api.narrowphase_hh_pallas(
        body, om, cands, interpret=True, sublane=True, pair_tile=8
    )
    np.testing.assert_array_equal(np.asarray(ref_p), ref_j)
    np.testing.assert_array_equal(np.asarray(alt_p), alt_j)
    np.testing.assert_array_equal(np.asarray(num_p), num_j)
    active = num_j > 0
    np.testing.assert_allclose(
        np.asarray(nrm_p)[active], nrm_j[active], atol=2e-5
    )
    for w in range(pts_j.shape[0]):
        for p in range(P):
            k = num_j[w, p]
            if k > 0:
                np.testing.assert_allclose(
                    np.asarray(pts_p)[w, p, :k], pts_j[w, p, :k],
                    atol=3e-4,
                )


def test_sublane_handles_edge_count_not_divisible_by_chunk():
    """A hull whose padded edge count is NOT a multiple of the edge
    chunk (square pyramid: 8 edges, chunk 3) must trace and match the
    XLA oracle — the short last chunk used to produce mismatched
    repeat/tile shapes and crash at trace time."""
    from madrona_tpu.physics.bodies import ObjectRegistry
    from madrona_tpu.physics.geo import convex_hull_from_points
    from madrona_tpu.physics.xpbd import BodyState

    pyr = convex_hull_from_points(np.asarray([
        [-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0], [0, 0, 1.4],
    ], np.float32))
    reg = ObjectRegistry()
    o = reg.add_hull(pyr, mass=1.0)
    om = reg.build()
    assert om.hull_dims[3] % 3 != 0, om.hull_dims   # the regression regime

    w, n = 2, 2
    pos = np.zeros((w, n, 3), np.float32)
    pos[:, 1] = [0.4, 0.3, 1.1]            # overlapping pyramids
    rot = np.zeros((w, n, 4), np.float32)
    rot[..., 0] = 1.0
    th = 0.4
    rot[:, 1] = [np.cos(th / 2), 0, 0, np.sin(th / 2)]
    z3 = jnp.zeros((w, n, 3), jnp.float32)
    q = jnp.asarray(rot)
    body = BodyState(
        pos=jnp.asarray(pos), rot=q, scale=jnp.ones((w, n, 3)),
        vel=z3, omega=z3, obj_id=jnp.full((w, n), o, jnp.int32),
        response=jnp.zeros((w, n), jnp.int32), ext_force=z3,
        ext_torque=z3, prev_x=jnp.asarray(pos), prev_q=q,
        presolve_x=jnp.asarray(pos), presolve_q=q, presolve_v=z3,
        presolve_w=z3, active=jnp.ones((w, n), bool),
    )
    caps = bp.CandidateCaps(hull_hull=4, hull_plane=2, sphere_any=2)
    cands = bp.find_candidates(body, om, caps, 1.0 / 30)
    assert (np.asarray(cands.hh_num) == 1).all()

    oracle = api._narrowphase_all(body, om, cands)
    P = caps.hull_hull
    ref_p, alt_p, pts_p, num_p, nrm_p = api.narrowphase_hh_pallas(
        body, om, cands, interpret=True, sublane=True, pair_tile=4,
    )
    np.testing.assert_array_equal(
        np.asarray(num_p), np.asarray(oracle.num[:, :P])
    )
    active = np.asarray(oracle.num[:, :P]) > 0
    assert active.any()
    np.testing.assert_allclose(
        np.asarray(nrm_p)[active],
        np.asarray(oracle.normal[:, :P])[active], atol=2e-5,
    )
