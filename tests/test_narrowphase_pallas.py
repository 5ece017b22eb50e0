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
