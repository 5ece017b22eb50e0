"""Edge-direction SAT tier (sat_tier="edge_dirs").

The direction-pair sweep replaces the Gauss-map edge-pair sweep
(physics/narrowphase.py query_edge_directions_dirs, kernel twin
ops/narrowphase_pallas._edge_query_dirs_s). Contracts tested here:

  * separated pairs: both tiers agree exactly on validity (support SAT
    over the direction family covers the full edge-edge axis set);
  * face-dominant contacts: identical manifolds (the face path is
    untouched — only the edge query differs);
  * true shallow edge-edge contact: both tiers find the same axis and
    witness edges (supporting edges = Gauss-map edges when separated or
    shallow);
  * XLA-vs-kernel parity in interpret mode at the dirs tier;
  * full escape-room pipeline: dirs-vs-pairs trajectories stay close
    (deep-penetration EE axes may differ — documented deviation).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madrona_tpu.models.base import make_sim
from madrona_tpu.models.escape_room import EscapeRoom
from madrona_tpu.physics import api, bodies as pb, broadphase as bp, geo


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


def _contacts(env, body, cands, sat_dirs):
    return api._narrowphase_all(body, env.om, cands, sat_dirs=sat_dirs)


def test_env_scene_dirs_close_to_pairs(scene):
    """Escape-room contact buffers: same live set, same counts, close
    values (face contacts identical; EE witness points may differ by
    which parallel edge was chosen, but normals/depths agree for the
    shallow contacts a stepped scene contains)."""
    env, body, cands = scene
    a = _contacts(env, body, cands, False)
    b = _contacts(env, body, cands, True)
    np.testing.assert_array_equal(np.asarray(a.num), np.asarray(b.num))
    np.testing.assert_array_equal(np.asarray(a.ref), np.asarray(b.ref))
    np.testing.assert_array_equal(np.asarray(a.alt), np.asarray(b.alt))
    live = np.asarray(a.num) > 0
    np.testing.assert_allclose(
        np.asarray(b.normal)[live], np.asarray(a.normal)[live], atol=1e-4
    )


def test_shallow_edge_edge_cross():
    """Two unit boxes crossing edge-on at 90°, overlapping shallowly:
    both tiers must report an edge contact with the same axis."""
    reg = pb.ObjectRegistry()
    reg.add_plane()
    reg.add_hull(geo.box_hull((0.5, 0.5, 0.5)), mass=1.0)
    om = reg.build()

    def mk(rot_b, dz):
        pos = jnp.asarray([[[0, 0, 0], [0, 0, 0.0], [0.35, 0, dz]]],
                          jnp.float32)
        rot = jnp.asarray([[[1, 0, 0, 0], [1, 0, 0, 0], rot_b]],
                          jnp.float32)
        z3 = jnp.zeros((1, 3, 3))
        z4 = jnp.zeros((1, 3, 4))
        from madrona_tpu.physics.xpbd import BodyState
        return BodyState(
            pos=pos, rot=rot, scale=jnp.ones((1, 3, 3)),
            vel=z3, omega=z3,
            obj_id=jnp.asarray([[0, 1, 1]], jnp.int32),
            response=jnp.asarray([[2, 0, 0]], jnp.int32),
            ext_force=z3, ext_torque=z3,
            prev_x=z3, prev_q=z4, presolve_x=z3, presolve_q=z4,
            presolve_v=z3, presolve_w=z3,
            active=jnp.ones((1, 3), bool),
        )

    # box B rotated 45° about x so its edge crosses A's edge;
    # dz brings the edges within shallow contact
    half = np.pi / 4
    rot_b = [np.cos(half / 2), np.sin(half / 2), 0, 0]
    body = mk(rot_b, 0.95)
    caps = bp.CandidateCaps(hull_hull=4, hull_plane=2, sphere_any=0)
    cands = bp.find_candidates(body, om, caps, 1 / 30.0)
    a = api._narrowphase_all(body, om, cands, sat_dirs=False)
    b = api._narrowphase_all(body, om, cands, sat_dirs=True)
    la = np.asarray(a.num)[0]
    lb = np.asarray(b.num)[0]
    np.testing.assert_array_equal(la, lb)
    live = la > 0
    if live.any():
        np.testing.assert_allclose(
            np.asarray(b.normal)[0][live], np.asarray(a.normal)[0][live],
            atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(b.points)[0][live], np.asarray(a.points)[0][live],
            atol=1e-3,
        )


def test_kernel_matches_xla_at_dirs_tier(scene):
    """hh sublane kernel with n_dirs vs the XLA dirs path — same parity
    contract as the edge-pairs tier's test."""
    env, body, cands = scene
    om = env.om
    contacts = _contacts(env, body, cands, True)
    P = env.caps.hull_hull
    ref_j = np.asarray(contacts.ref[:, :P])
    alt_j = np.asarray(contacts.alt[:, :P])
    num_j = np.asarray(contacts.num[:, :P])
    nrm_j = np.asarray(contacts.normal[:, :P])
    pts_j = np.asarray(contacts.points[:, :P])

    ref_p, alt_p, pts_p, num_p, nrm_p = api.narrowphase_hh_pallas(
        body, om, cands, interpret=True, sublane=True, pair_tile=8,
        sat_dirs=True,
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


def test_full_pipeline_dirs_vs_pairs_lockstep():
    """Single-step lockstep: the dirs tier's whole-step outputs stay
    close to the pairs tier's on the live env (shallow contacts)."""
    def make(tier):
        env = EscapeRoom()
        env.cfg = dataclasses.replace(env.cfg, sat_tier=tier)
        return env

    env_a = make("edge_pairs")
    env_b = make("edge_dirs")
    sim_a = make_sim(env_a, num_worlds=4, seed=11, donate=False)
    sim_b = make_sim(env_b, num_worlds=4, seed=11, donate=False)
    step_a = sim_a.step_fn()
    step_b = sim_b.step_fn()
    s = sim_a.state
    acts = EscapeRoom.random_actions(np.random.RandomState(2), 8, 4)
    for t in range(8):
        inp = {"action": acts[t], "reset": jnp.zeros((4,), jnp.int32)}
        s_next, o_a = step_a(s, inp)
        _, o_b = step_b(s, inp)
        for k in ("reward", "done", "self_obs"):
            np.testing.assert_allclose(
                np.asarray(o_b[k], np.float64),
                np.asarray(o_a[k], np.float64),
                atol=2e-3, rtol=0, err_msg=f"step {t} {k}",
            )
        s = s_next
