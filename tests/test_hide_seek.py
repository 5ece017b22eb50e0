"""Hide & Seek tests: visibility/occlusion, prep phase, locking, pixels."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from madrona_tpu.models.base import make_sim
from madrona_tpu.models import hide_seek as hs
from madrona_tpu.models.hide_seek import HideSeek

W = 2


@pytest.fixture(scope="module")
def sim():
    return make_sim(
        HideSeek(render_size=16), num_worlds=W, seed=5, donate=False
    )


def zero_acts():
    return {
        "action": jnp.zeros((W, hs.N_AGENTS, 5), jnp.int32),
        "reset": jnp.zeros((W,), jnp.int32),
    }


def set_positions(s, coords, yaws=None):
    """coords: {row: (x, y)}; yaws: {agent_idx: yaw}."""
    t = s.tables[hs.RIGID_BODY]
    pos = t.columns["Position"]
    rot = t.columns["Rotation"]
    for row, (x, y) in coords.items():
        z = hs.AGENT_Z if row >= hs.ROW_AGENT0 else hs.BOX_HALF
        pos = pos.at[:, row].set(jnp.asarray([x, y, z]))
    if yaws:
        for a, yaw in yaws.items():
            q = hs._yaw_quat(jnp.full((W,), yaw, jnp.float32))
            rot = rot.at[:, hs.ROW_AGENT0 + a].set(q)
    tables = dict(s.tables)
    tables[hs.RIGID_BODY] = dataclasses.replace(
        t, columns={**t.columns, "Position": pos, "Rotation": rot}
    )
    return dataclasses.replace(s, tables=tables)


def past_prep(s):
    singles = dict(s.singletons)
    singles["EpisodeStep"] = jnp.full((W,), hs.PREP_STEPS + 1, jnp.int32)
    return dataclasses.replace(s, singletons=singles)


def test_visibility_and_occlusion(sim):
    step = sim.step_fn()
    s, _ = step(sim.state, zero_acts())
    s = past_prep(s)
    # seeker 0 at origin facing +y; hider 0 straight ahead; boxes far away
    s = set_positions(
        s,
        {
            hs.ROW_AGENT0 + hs.N_HIDERS: (0.0, 0.0),       # seeker 0
            hs.ROW_AGENT0 + hs.N_HIDERS + 1: (-15.0, -15.0),
            hs.ROW_AGENT0: (0.0, 8.0),                     # hider 0
            hs.ROW_AGENT0 + 1: (15.0, -15.0),
            hs.ROW_BOX0: (10.0, 10.0),
            hs.ROW_BOX0 + 1: (-10.0, 10.0),
            hs.ROW_BOX0 + 2: (-10.0, -10.0),
        },
        yaws={hs.N_HIDERS: 0.0},  # seeker 0 faces +y
    )
    s2, o = step(s, zero_acts())
    vis = np.asarray(o["visible"])
    assert (vis[:, 0, 0] == 1).all(), vis
    # seekers saw a hider -> seekers positive reward, hiders negative
    r = np.asarray(o["reward"])
    assert (r[:, hs.N_HIDERS:] > 0).all() and (r[:, 0] < 0).all()

    # now put a box directly between them -> occluded
    s = set_positions(s, {hs.ROW_BOX0: (0.0, 4.0)})
    _, o = step(s, zero_acts())
    assert (np.asarray(o["visible"])[:, 0, 0] == 0).all()

    # facing away -> out of cone
    s = set_positions(
        s, {hs.ROW_BOX0: (10.0, 10.0)}, yaws={hs.N_HIDERS: np.pi}
    )
    _, o = step(s, zero_acts())
    assert (np.asarray(o["visible"])[:, 0, 0] == 0).all()


def test_prep_phase_freezes_seekers(sim):
    step = sim.step_fn()
    s, _ = step(sim.state, zero_acts())
    a = jnp.zeros((W, hs.N_AGENTS, 5), jnp.int32).at[..., 0].set(3)
    pos0 = np.asarray(
        s.tables[hs.RIGID_BODY].columns["Position"]
    )[:, hs.ROW_AGENT0:].copy()
    for _ in range(5):
        s, o = step(s, {"action": a, "reset": jnp.zeros((W,), jnp.int32)})
    pos1 = np.asarray(
        s.tables[hs.RIGID_BODY].columns["Position"]
    )[:, hs.ROW_AGENT0:]
    moved = np.linalg.norm(pos1[..., :2] - pos0[..., :2], axis=-1)
    assert (moved[:, :hs.N_HIDERS] > 0.2).all()          # hiders move
    assert (moved[:, hs.N_HIDERS:] < 1e-3).all()          # seekers frozen
    assert (np.asarray(o["reward"]) == 0).all()           # no reward in prep


def test_lock_makes_box_static(sim):
    step = sim.step_fn()
    s, _ = step(sim.state, zero_acts())
    s = past_prep(s)
    # hider 0 in front of box 0, locks it
    s = set_positions(
        s,
        {hs.ROW_AGENT0: (0.0, 0.0), hs.ROW_BOX0: (0.0, 1.6),
         hs.ROW_BOX0 + 1: (12.0, 12.0), hs.ROW_BOX0 + 2: (-12.0, 12.0),
         hs.ROW_AGENT0 + 1: (15, 15),
         hs.ROW_AGENT0 + 2: (-15, -15), hs.ROW_AGENT0 + 3: (-15, 15)},
        yaws={0: 0.0},
    )
    a = jnp.zeros((W, hs.N_AGENTS, 5), jnp.int32).at[:, 0, 4].set(1)
    s, _ = step(s, {"action": a, "reset": jnp.zeros((W,), jnp.int32)})
    assert (np.asarray(s.singletons["Locked"])[:, 0] == 1).all()
    resp = np.asarray(
        s.tables[hs.RIGID_BODY].columns["ResponseType"]
    )[:, hs.ROW_BOX0]
    assert (resp == 2).all()  # RESPONSE_STATIC
    # push it: box must not move
    box0 = np.asarray(
        s.tables[hs.RIGID_BODY].columns["Position"]
    )[:, hs.ROW_BOX0].copy()
    push = jnp.zeros((W, hs.N_AGENTS, 5), jnp.int32).at[:, 0, 0].set(3)
    for _ in range(8):
        s, _ = step(s, {"action": push, "reset": jnp.zeros((W,), jnp.int32)})
    box1 = np.asarray(
        s.tables[hs.RIGID_BODY].columns["Position"]
    )[:, hs.ROW_BOX0]
    np.testing.assert_allclose(box1, box0, atol=1e-5)


def test_pixels_deterministic(sim):
    step = sim.step_fn()
    s1, o1 = step(sim.state, zero_acts())
    s2, o2 = step(sim.state, zero_acts())
    np.testing.assert_array_equal(np.asarray(o1["rgb"]), np.asarray(o2["rgb"]))
    assert np.asarray(o1["rgb"]).shape == (W, hs.N_AGENTS, 16, 16, 3)
    assert np.isfinite(np.asarray(o1["depth"])).all()


def test_ramp_is_climbable():
    """Driving into a ramp's slope raises the agent (wedge hulls in the
    narrowphase hot path, not just boxes)."""
    s_im = make_sim(
        HideSeek(render_size=16, pixels=False), num_worlds=W, seed=2,
        donate=False,
    )
    step = s_im.step_fn()
    s, _ = step(s_im.state, {
        "action": jnp.zeros((W, hs.N_AGENTS, 5), jnp.int32),
        "reset": jnp.zeros((W,), jnp.int32),
    })
    s = past_prep(s)
    # ramp 0 ahead of hider 0 with its slope facing the agent (+x side
    # is the low edge; agent approaches from +x moving -x)
    t = s.tables[hs.RIGID_BODY]
    pos = t.columns["Position"]
    rot = t.columns["Rotation"]
    pos = pos.at[:, hs.ROW_RAMP0].set(jnp.asarray([0.0, 0.0, 0.0]))
    pos = pos.at[:, hs.ROW_AGENT0].set(
        jnp.asarray([2.5, 0.0, hs.AGENT_Z])
    )
    # clear everything else away
    for r in [hs.ROW_RAMP0 + 1, hs.ROW_BOX0, hs.ROW_BOX0 + 1,
              hs.ROW_BOX0 + 2, hs.ROW_AGENT0 + 1, hs.ROW_AGENT0 + 2,
              hs.ROW_AGENT0 + 3]:
        z = hs.AGENT_Z if r >= hs.ROW_AGENT0 else 1.0
        pos = pos.at[:, r].set(jnp.asarray([15.0, 15.0 - r, z]))
    # face -x: yaw with fwd=(-1, 0): fwd=(-sin, cos) -> yaw = pi/2
    rot = rot.at[:, hs.ROW_AGENT0].set(
        hs._yaw_quat(jnp.full((W,), jnp.pi / 2))
    )
    tables = dict(s.tables)
    tables[hs.RIGID_BODY] = dataclasses.replace(
        t, columns={**t.columns, "Position": pos, "Rotation": rot}
    )
    s = dataclasses.replace(s, tables=tables)

    a = jnp.zeros((W, hs.N_AGENTS, 5), jnp.int32).at[:, 0, 0].set(3)
    max_z = 0.0
    for _ in range(30):
        s, _ = step(s, {"action": a, "reset": jnp.zeros((W,), jnp.int32)})
        z = float(s.tables[hs.RIGID_BODY].columns["Position"][0, hs.ROW_AGENT0, 2])
        max_z = max(max_z, z)
    assert max_z > hs.AGENT_Z + 0.25, max_z  # climbed the slope


def test_team_owned_locks(sim):
    """A seeker cannot unlock a hider-locked box; the hider can."""
    step = sim.step_fn()
    s, _ = step(sim.state, zero_acts())
    s = past_prep(s)
    seeker = hs.N_HIDERS          # first seeker index
    s = set_positions(
        s,
        {hs.ROW_AGENT0: (0.0, 0.0), hs.ROW_BOX0: (0.0, 1.6),
         hs.ROW_BOX0 + 1: (12.0, 12.0), hs.ROW_BOX0 + 2: (-12.0, 12.0),
         hs.ROW_AGENT0 + 1: (15, 15),
         hs.ROW_AGENT0 + seeker: (0.0, 3.2),
         hs.ROW_AGENT0 + 3: (-15, 15)},
        yaws={0: 0.0, seeker: np.pi},   # seeker faces the box from +y
    )
    zero = jnp.zeros((W,), jnp.int32)
    # hider 0 locks box 0 -> owner code 1
    a = jnp.zeros((W, hs.N_AGENTS, 5), jnp.int32).at[:, 0, 4].set(1)
    s, _ = step(s, {"action": a, "reset": zero})
    assert (np.asarray(s.singletons["Locked"])[:, 0] == 1).all()
    # seeker tries to unlock -> still hider-locked
    a2 = jnp.zeros((W, hs.N_AGENTS, 5), jnp.int32).at[:, seeker, 4].set(1)
    s, _ = step(s, {"action": a2, "reset": zero})
    assert (np.asarray(s.singletons["Locked"])[:, 0] == 1).all()
    # hider unlocks its own lock
    s, _ = step(s, {"action": a, "reset": zero})
    assert (np.asarray(s.singletons["Locked"])[:, 0] == 0).all()
    # now the seeker locks it for its team -> owner code 2
    s, _ = step(s, {"action": a2, "reset": zero})
    assert (np.asarray(s.singletons["Locked"])[:, 0] == 2).all()
    resp = np.asarray(
        s.tables[hs.RIGID_BODY].columns["ResponseType"]
    )[:, hs.ROW_BOX0]
    assert (resp == 2).all()       # seeker-locked is still static


def test_pixels_with_tlas_culling():
    """The TLAS-culled pixel path steps, stays deterministic, and keeps
    foreground geometry (nearest-K cull)."""
    s_im = make_sim(
        HideSeek(render_size=16, tlas_max_instances=8), num_worlds=2,
        seed=4, donate=False,
    )
    step = s_im.step_fn()
    a = jnp.zeros((2, hs.N_AGENTS, 5), jnp.int32)
    s1, o1 = step(s_im.state, {"action": a, "reset": jnp.zeros((2,), jnp.int32)})
    s2, o2 = step(s_im.state, {"action": a, "reset": jnp.zeros((2,), jnp.int32)})
    np.testing.assert_array_equal(np.asarray(o1["rgb"]), np.asarray(o2["rgb"]))
    assert np.isfinite(np.asarray(o1["depth"])).all()
    # something visible: not every pixel is sky
    rgb = np.asarray(o1["rgb"])
    sky = np.asarray(HideSeek().rcfg.sky_color)
    assert (np.abs(rgb - sky).sum(-1) > 0.05).mean() > 0.1


def test_flat_obs_and_rollout_flat():
    """FlatObs mirrors its constituent exports; rollout_flat stacks to
    [T, W, A, D]."""
    import numpy as np
    from madrona_tpu.models.base import make_sim, rollout_flat
    from madrona_tpu.models import hide_seek as hs

    w = 2
    sim = make_sim(hs.HideSeek(pixels=False), num_worlds=w, seed=0,
                   donate=False)
    step = sim.step_fn()
    s = sim.state
    acts = hs.HideSeek.random_actions(np.random.RandomState(1), 4, w)
    for t in range(3):
        s, o = step(s, {"action": acts[t],
                        "reset": jnp.zeros((w,), jnp.int32)})
    flat = np.asarray(o["flat_obs"])
    a = hs.N_AGENTS
    d = (10 + a * 3 + hs.N_MOVABLE * 3 + hs.N_MOVABLE
         + hs.N_SEEKERS * hs.N_HIDERS)
    assert flat.shape == (w, a, d)
    np.testing.assert_array_equal(flat[..., :10], np.asarray(o["self_obs"]))
    vis = np.asarray(o["visible"]).reshape(w, 1, -1).astype(np.float32)
    np.testing.assert_array_equal(
        flat[..., -hs.N_SEEKERS * hs.N_HIDERS:],
        np.broadcast_to(vis, (w, a, vis.shape[-1])),
    )
    # rel-agent block has zeros on the self diagonal
    rel = flat[..., 10:10 + a * 3].reshape(w, a, a, 3)
    for i in range(a):
        np.testing.assert_array_equal(rel[:, i, i], 0.0)

    sim.state = s
    outs = rollout_flat(sim, {
        "action": acts, "reset": jnp.zeros((4, w), jnp.int32)
    })
    assert outs["flat_obs"].shape == (4, w, a, d)
    assert outs["done"].shape == (4, w)


def test_blas_render_tier_matches_dense_geometry():
    """render_tier="blas" traces the SAME registered meshes through the
    device mesh-BVH walker (render/blas.py) with per-object materials +
    a shadow-casting sun. Geometry is shared with the dense tier, so
    depth must agree tightly; rgb differs (textures/shadows) but the
    checkerboard floor must show intra-floor color variance the flat
    dense tier cannot produce."""
    a = jnp.zeros((2, hs.N_AGENTS, 5), jnp.int32)
    r = jnp.zeros((2,), jnp.int32)

    s_dense = make_sim(HideSeek(render_size=16), num_worlds=2, seed=7,
                       donate=False)
    s_blas = make_sim(HideSeek(render_size=16, render_tier="blas"),
                      num_worlds=2, seed=7, donate=False)
    _, od = s_dense.step_fn()(s_dense.state, {"action": a, "reset": r})
    _, ob = s_blas.step_fn()(s_blas.state, {"action": a, "reset": r})

    dd = np.asarray(od["depth"], np.float32)
    db = np.asarray(ob["depth"], np.float32)
    hit_both = np.isfinite(dd) & np.isfinite(db) & (dd < 1e9) & (db < 1e9)
    assert hit_both.mean() > 0.5          # agents mostly see the arena
    # dense tier traces bf16, BLAS tier f32: silhouette-edge pixels may
    # land on different surfaces; require 98% of hits to agree tightly
    rel = np.abs(dd[hit_both] - db[hit_both]) / np.maximum(db[hit_both], 1.0)
    assert (rel < 2e-2).mean() > 0.98
    assert np.median(rel) < 5e-3

    # determinism of the blas tier
    _, ob2 = s_blas.step_fn()(s_blas.state, {"action": a, "reset": r})
    np.testing.assert_array_equal(np.asarray(ob["rgb"]),
                                  np.asarray(ob2["rgb"]))

    # the checker floor: among floor-ish pixels (deep hits), the blas
    # tier has > 1 distinct shade per image while staying finite
    rgb = np.asarray(ob["rgb"], np.float32)
    assert np.isfinite(rgb).all()
    flat = rgb.reshape(2, hs.N_AGENTS, -1, 3)
    per_view_std = flat.std(axis=2).mean()
    assert per_view_std > 1e-3


def test_pixels_64x64_design_point():
    """The reference batch renderer's design point is 64x64 RGBD per
    agent (SURVEY §2.4; reference render config defaults). Run it with
    the production TLAS per-view cull: output shapes, finiteness,
    determinism, and a real scene (every view sees geometry)."""
    w = 2
    sim = make_sim(
        HideSeek(render_size=64, tlas_max_instances=8), num_worlds=w,
        seed=11, donate=False,
    )
    step = sim.step_fn()
    a = jnp.zeros((w, hs.N_AGENTS, 5), jnp.int32)
    r = jnp.zeros((w,), jnp.int32)
    _, o1 = step(sim.state, {"action": a, "reset": r})
    _, o2 = step(sim.state, {"action": a, "reset": r})
    rgb = np.asarray(o1["rgb"], np.float32)
    dep = np.asarray(o1["depth"], np.float32)
    assert rgb.shape == (w, hs.N_AGENTS, 64, 64, 3)
    assert dep.shape == (w, hs.N_AGENTS, 64, 64)
    assert np.isfinite(rgb).all() and np.isfinite(dep).all()
    np.testing.assert_array_equal(rgb, np.asarray(o2["rgb"]))
    # every agent camera is inside the arena: a real fraction of pixels
    # hit geometry (the rest is sky above the arena walls)
    t_max = HideSeek(render_size=64).rcfg.t_max
    hit = dep < t_max - 1.0
    assert hit.mean() > 0.4
    assert hit.reshape(w * hs.N_AGENTS, -1).mean(axis=1).min() > 0.1


def test_candidate_caps_never_overflow_long_rollout():
    """Regression guard for the candidate caps (hh=7, hp=9, sp=0).

    hp cap is the exact dynamic-body count (9) — every dynamic near the
    floor is a candidate, so demand can reach the cap but never exceed
    it; the old cap of 7 silently dropped floor contacts. Measures TRUE
    occupancy with oversized caps over a seeded random rollout and
    asserts every step fits the shipped caps (saturation would silently
    drop contacts — the Candidates.overflow soft-failure contract)."""
    import jax

    from madrona_tpu.physics import api as papi
    from madrona_tpu.physics import broadphase as bp

    worlds, steps = 16, 400
    env = HideSeek(pixels=False)
    sim = make_sim(env, num_worlds=worlds, seed=17, donate=False)
    step = sim.step_fn()
    shipped = env.caps
    big = bp.CandidateCaps(hull_hull=64, hull_plane=64, sphere_any=8)

    @jax.jit
    def occupancy(state):
        body = papi.body_state(sim.executor.sm, state)
        c = bp.find_candidates(body, env.om, big, env.cfg.dt)
        return c.hh_num, c.hp_num, c.sp_num

    acts = env.random_actions(np.random.RandomState(3), steps, worlds)
    state = sim.state
    max_hh = max_hp = max_sp = 0
    for t in range(steps):
        hh, hp, sp = jax.device_get(occupancy(state))
        max_hh = max(max_hh, int(hh.max()))
        max_hp = max(max_hp, int(hp.max()))
        max_sp = max(max_sp, int(sp.max()))
        assert int(hh.max()) <= shipped.hull_hull, (t, int(hh.max()))
        assert int(hp.max()) <= shipped.hull_plane, (t, int(hp.max()))
        assert int(sp.max()) <= shipped.sphere_any, (t, int(sp.max()))
        state, _ = step(state, {
            "action": acts[t],
            "reset": jnp.zeros((worlds,), jnp.int32),
        })
    print(f"max occupancy over {steps} steps x {worlds} worlds: "
          f"hh={max_hh}/{shipped.hull_hull} hp={max_hp}/{shipped.hull_plane} "
          f"sp={max_sp}/{shipped.sphere_any}")
