"""Escape Room env tests: determinism, movement, doors/buttons, grab,
reset regeneration, world independence.

The suite shares one compiled sim (module fixture); each test runs the
pure step function from the fixture's initial state so tests stay
independent without recompiles.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madrona_tpu.models.base import make_sim
from madrona_tpu.models import escape_room as er
from madrona_tpu.models.escape_room import EscapeRoom

W = 4


@pytest.fixture(scope="module")
def sim():
    return make_sim(EscapeRoom(), num_worlds=W, seed=7, donate=False)


def zero_actions():
    return {
        "action": jnp.zeros((W, er.N_AGENTS, 4), jnp.int32),
        "reset": jnp.zeros((W,), jnp.int32),
    }


def act(move_amount=0, move_angle=0, rotate=2, grab=0):
    a = jnp.zeros((W, er.N_AGENTS, 4), jnp.int32)
    a = a.at[..., 0].set(move_amount)
    a = a.at[..., 1].set(move_angle)
    a = a.at[..., 2].set(rotate)
    a = a.at[..., 3].set(grab)
    return {"action": a, "reset": jnp.zeros((W,), jnp.int32)}


def body_pos(state):
    return np.asarray(state.tables[er.RIGID_BODY].columns["Position"])


def test_determinism_across_fresh_sims(sim):
    sim2 = make_sim(EscapeRoom(), num_worlds=W, seed=7)
    step1 = sim.step_fn()
    step2 = sim2.step_fn()
    s1, s2 = sim.state, sim2.state
    rs = np.random.RandomState(0)
    acts = EscapeRoom.random_actions(rs, 5, W)
    for t in range(5):
        inp = {"action": acts[t], "reset": jnp.zeros((W,), jnp.int32)}
        s1, o1 = step1(s1, inp)
        s2, o2 = step2(s2, inp)
    for k in o1:
        np.testing.assert_array_equal(np.asarray(o1[k]), np.asarray(o2[k]))


def test_forward_action_moves_agents(sim):
    step = sim.step_fn()
    s = sim.state
    s, _ = step(s, zero_actions())  # consume initial reset
    y0 = body_pos(s)[:, er.ROW_AGENT0:, 1].copy()
    total_r = 0.0
    for _ in range(10):
        s, o = step(s, act(move_amount=3, move_angle=0))
        total_r = total_r + np.asarray(o["reward"])
    y1 = body_pos(s)[:, er.ROW_AGENT0:, 1]
    assert (y1 > y0 + 0.5).all(), (y0, y1)
    # cumulative reward reflects progress (beats the step penalty)
    assert total_r.mean() > 0.0
    # agents never tip (z stays near rest height) or leave the floor
    z = body_pos(s)[:, er.ROW_AGENT0:, 2]
    np.testing.assert_allclose(z, er.AGENT_Z, atol=0.1)


def test_buttons_open_door(sim):
    step = sim.step_fn()
    s, _ = step(sim.state, zero_actions())
    # teleport each agent onto one button of room 0
    bpos = np.asarray(s.singletons["ButtonPos"])     # [W, 6, 2]
    t = s.tables[er.RIGID_BODY]
    pos = t.columns["Position"]
    for a in range(2):
        target = jnp.asarray(
            np.concatenate(
                [bpos[:, a, :], np.full((W, 1), er.AGENT_Z)], axis=-1
            ),
            jnp.float32,
        )
        pos = pos.at[:, er.ROW_AGENT0 + a].set(target)
    tables = dict(s.tables)
    tables[er.RIGID_BODY] = dataclasses.replace(
        t, columns={**t.columns, "Position": pos}
    )
    s = dataclasses.replace(s, tables=tables)
    s, o = step(s, zero_actions())
    door_open = np.asarray(o["door_open"])
    assert (door_open[:, 0] == 1).all()
    assert (door_open[:, 1:] == 0).all()
    # door body teleported below the floor
    door_z = body_pos(s)[:, er.ROW_SEP0 + 2, 2]
    assert (door_z < -1.0).all()
    # stepping off closes it again
    t = s.tables[er.RIGID_BODY]
    pos = t.columns["Position"]
    for a in range(2):
        pos = pos.at[:, er.ROW_AGENT0 + a].set(
            jnp.asarray([0.0 + a, 1.5, er.AGENT_Z])
        )
    tables = dict(s.tables)
    tables[er.RIGID_BODY] = dataclasses.replace(
        t, columns={**t.columns, "Position": pos}
    )
    s = dataclasses.replace(s, tables=tables)
    s, o = step(s, zero_actions())
    assert (np.asarray(o["door_open"])[:, 0] == 0).all()


def test_grab_attaches_cube(sim):
    step = sim.step_fn()
    s, _ = step(sim.state, zero_actions())
    # place cube 0 right in front of agent 0 (facing +y)
    t = s.tables[er.RIGID_BODY]
    pos = t.columns["Position"]
    a0 = pos[:, er.ROW_AGENT0]
    front = a0 + jnp.asarray([0.0, 1.4, 0.0])
    pos = pos.at[:, er.ROW_CUBE0].set(
        front.at[:, 2].set(er.CUBE_Z)
    )
    tables = dict(s.tables)
    tables[er.RIGID_BODY] = dataclasses.replace(
        t, columns={**t.columns, "Position": pos}
    )
    s = dataclasses.replace(s, tables=tables)

    grab = act(grab=1)
    s, o = step(s, grab)
    grabbed = np.asarray(s.singletons["Grabbed"])
    assert (grabbed[:, 0] == er.ROW_CUBE0).all(), grabbed
    # hold and walk backward; the cube must follow
    cube_y0 = body_pos(s)[:, er.ROW_CUBE0, 1].copy()
    for _ in range(8):
        s, _ = step(s, act(move_amount=3, move_angle=4, grab=1))
    moved = cube_y0 - body_pos(s)[:, er.ROW_CUBE0, 1]
    agent_moved = cube_y0 - body_pos(s)[:, er.ROW_AGENT0, 1]
    assert (moved > 0.3).all(), (moved, agent_moved)
    # release
    s, _ = step(s, act(grab=0))
    assert (np.asarray(s.singletons["Grabbed"])[:, 0] == -1).all()


def test_episode_reset_regenerates_level(sim):
    step = sim.step_fn()
    s, _ = step(sim.state, zero_actions())
    door_x0 = np.asarray(s.singletons["DoorX"]).copy()
    # force a reset
    inp = zero_actions()
    inp["reset"] = jnp.ones((W,), jnp.int32)
    s, o = step(s, inp)
    door_x1 = np.asarray(s.singletons["DoorX"])
    assert not np.allclose(door_x0, door_x1)
    assert (np.asarray(s.singletons["EpisodeStep"]) == 1).all()
    # agents back at start
    apos = body_pos(s)[:, er.ROW_AGENT0:, :2]
    np.testing.assert_allclose(
        apos[:, 0], np.tile([-2.0, 1.5], (W, 1)), atol=0.5
    )
    # done after EPISODE_LEN steps
    s2, _ = step(sim.state, zero_actions())
    for t in range(er.EPISODE_LEN - 1):
        s2, o2 = step(s2, zero_actions())
    assert (np.asarray(o2["done"]) == 1).all()


def test_worlds_differ_and_stay_independent(sim):
    step = sim.step_fn()
    s, _ = step(sim.state, zero_actions())
    # per-world level layouts differ (independent RNG streams)
    dx = np.asarray(s.singletons["DoorX"])
    assert len({tuple(np.round(r, 4)) for r in dx}) > 1
    # stepping with different per-world actions only affects that world
    a = jnp.zeros((W, er.N_AGENTS, 4), jnp.int32)
    a = a.at[0, :, 0].set(3)  # world 0 moves, others idle
    s1, _ = step(s, {"action": a, "reset": jnp.zeros((W,), jnp.int32)})
    s2, _ = step(s, zero_actions())
    p1, p2 = body_pos(s1), body_pos(s2)
    assert not np.allclose(p1[0], p2[0])
    np.testing.assert_array_equal(p1[1:], p2[1:])


def test_flat_obs_concatenates_fields(sim):
    step = sim.step_fn()
    s, o = step(sim.state, zero_actions())
    flat = np.asarray(o["flat_obs"])
    w = flat.shape[0]
    parts = np.concatenate(
        [
            np.asarray(o["self_obs"]).reshape(w, er.N_AGENTS, -1),
            np.asarray(o["partner_obs"]).reshape(w, er.N_AGENTS, -1),
            np.asarray(o["entity_obs"]).reshape(w, er.N_AGENTS, -1),
            np.asarray(o["door_obs"]).reshape(w, er.N_AGENTS, -1),
            np.asarray(o["lidar"]).reshape(w, er.N_AGENTS, -1),
        ],
        axis=-1,
    )
    np.testing.assert_array_equal(flat, parts)


def test_candidate_caps_never_overflow_long_rollout():
    """Regression guard for the tightened candidate caps (hull_hull=8).

    Candidate-buffer saturation silently drops contacts for a step (the
    Candidates.overflow soft-failure contract), so the shipped caps must
    hold over a long seeded random-action rollout spanning multiple
    episodes (auto-reset regenerates levels at step 200). Measures TRUE
    occupancy with oversized caps and asserts every step fits the
    shipped caps — a future cap/behavior change that would overflow
    fails here instead of corrupting physics."""
    from madrona_tpu.physics import api as papi
    from madrona_tpu.physics import broadphase as bp

    worlds, steps = 16, 500
    env = EscapeRoom()
    sim = make_sim(env, num_worlds=worlds, seed=123, donate=False)
    step = sim.step_fn()
    shipped = env.caps
    big = bp.CandidateCaps(hull_hull=64, hull_plane=64, sphere_any=8)

    @jax.jit
    def occupancy(state):
        body = papi.body_state(sim.executor.sm, state)
        cands = bp.find_candidates(body, env.om, big, env.cfg.dt)
        return cands.hh_num, cands.hp_num, cands.sp_num, cands.overflow

    rs = np.random.RandomState(42)
    acts = env.random_actions(rs, steps, worlds)
    state = sim.state
    max_hh = max_hp = max_sp = 0
    for t in range(steps):
        hh, hp, sp, ovf = jax.device_get(occupancy(state))
        max_hh = max(max_hh, int(hh.max()))
        max_hp = max(max_hp, int(hp.max()))
        max_sp = max(max_sp, int(sp.max()))
        assert not ovf.any()
        assert int(hh.max()) <= shipped.hull_hull, (t, int(hh.max()))
        assert int(hp.max()) <= shipped.hull_plane, (t, int(hp.max()))
        assert int(sp.max()) <= shipped.sphere_any, (t, int(sp.max()))
        state, _ = step(state, {
            "action": acts[t],
            "reset": jnp.zeros((worlds,), jnp.int32),
        })
    # occupancy provenance for future cap tuning (visible with -s)
    print(f"max occupancy over {steps} steps x {worlds} worlds: "
          f"hh={max_hh}/{shipped.hull_hull} hp={max_hp}/{shipped.hull_plane} "
          f"sp={max_sp}/{shipped.sphere_any}")
