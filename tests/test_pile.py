"""Pile stress env: 256 bodies/world through the swept broadphase +
XPBD pipeline (the many-body regime VERDICT round 1 flagged as
unexercised; reference analogue: tree-broadphase worlds,
broadphase.cpp:487-1027)."""

import jax.numpy as jnp
import numpy as np
import pytest

from madrona_tpu.models.base import make_sim
from madrona_tpu.models.pile import Pile, N_STATIC, ARENA, WALL_H


@pytest.fixture(scope="module")
def settled():
    env = Pile(num_bodies=256, episode_len=200, body_obs=True)
    sim = make_sim(env, num_worlds=2, seed=0, donate=False)
    step = sim.step_fn()
    s = sim.state
    outs = []
    for t in range(120):
        a = jnp.zeros((2,), jnp.int32)
        s, o = step(s, {"action": a, "reset": jnp.zeros((2,), jnp.int32)})
        outs.append({k: np.asarray(v) for k, v in o.items()})
    return env, sim, s, outs


def test_pile_settles(settled):
    env, sim, s, outs = settled
    summ = outs[-1]["summary"]
    # all finite, bodies inside the container, settling after 4 s
    # (measured curve: rest_frac ~0.32 at t=120, mean speed decays
    # 5.5 -> 1.5; a 7-layer 256-body drop keeps jostling for a while
    # under Jacobi averaging — the invariants here are containment,
    # no explosion, and monotone settling)
    assert np.isfinite(outs[-1]["body_obs"]).all()
    pos = outs[-1]["body_obs"][..., :3]
    assert (np.abs(pos[..., 0]) < ARENA + 1.0).all()
    assert (np.abs(pos[..., 1]) < ARENA + 1.0).all()
    assert (pos[..., 2] > -1.0).all()           # nothing fell through
    assert (pos[..., 2] < 25.0).all()           # nothing exploded upward
    rest_frac = summ[:, 3]
    assert (rest_frac > 0.2).all(), rest_frac
    # settling is monotone-ish: late mean speed far below peak
    peak = max(o["summary"][:, 2].max() for o in outs[:40])
    late = summ[:, 2]
    assert (late < 0.35 * peak).all(), (peak, late)


def test_pile_no_broadphase_overflow(settled):
    env, sim, s, outs = settled
    assert all((o["summary"][:, 5] == 0).all() for o in outs)


def test_pile_shake_disturbs(settled):
    env, sim, s, outs = settled
    step = sim.step_fn()
    summ0 = np.asarray(s.singletons["Summary"])
    s2, o = step(
        s, {"action": jnp.full((2,), 1, jnp.int32),
            "reset": jnp.zeros((2,), jnp.int32)},
    )
    assert (o["summary"][:, 2] > summ0[:, 2] + 0.5).all()
    # shake costs reward
    assert (o["reward"] < 1.0).all()


def test_pile_deterministic():
    def run():
        sim = make_sim(Pile(num_bodies=64, episode_len=50),
                       num_worlds=2, seed=4, donate=False)
        step = sim.step_fn()
        s = sim.state
        rs = np.random.RandomState(0)
        for t in range(12):
            a = jnp.asarray(rs.randint(0, 5, (2,)), jnp.int32)
            s, o = step(
                s, {"action": a, "reset": jnp.zeros((2,), jnp.int32)}
            )
        return np.asarray(o["summary"])

    a, b = run(), run()
    np.testing.assert_array_equal(a, b)
