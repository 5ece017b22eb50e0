"""Cartpole end-to-end: trajectory equivalence vs a NumPy oracle.

This is the stage-3 North-Star checkpoint of SURVEY.md §7: the whole state
model (registration -> taskgraph -> jitted step -> export) validated
against an independent scalar implementation of the same dynamics + the
same threefry RNG stream.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from madrona_tpu.models import cartpole as cp
from madrona_tpu.models.base import make_sim, rollout
import np_rng


def numpy_oracle(num_worlds, actions, seed):
    """Scalar re-derivation of the env, including RNG key schedule."""
    # Reproduce the engine's key tree: base = split(key(seed), world);
    # step_key = split(base, step); node_key = split(step_key, node_id);
    # reset draws = split(node_key, i) for i in 0..3.
    base = np_rng.split_i(
        np.broadcast_to(np_rng.key(np.uint32(seed)), (num_worlds, 2)),
        np.arange(num_worlds, dtype=np.uint32),
    )

    s = np.zeros((num_worlds, 4), np.float32)
    done = np.ones(num_worlds, bool)
    ep = np.zeros(num_worlds, np.int32)
    T = actions.shape[0]
    obs_hist, rew_hist, done_hist = [], [], []
    for t in range(T):
        step_key = np_rng.split_i(base, np.full(num_worlds, t, np.uint32))
        node_key = np_rng.split_i(step_key, np.zeros(num_worlds, np.uint32))
        draws = np.stack(
            [
                np_rng.uniform(
                    np_rng.split_i(node_key, np.full(num_worlds, i, np.uint32))
                )
                for i in range(4)
            ],
            axis=-1,
        ) * 0.1 - 0.05
        just_reset = done.copy()
        s = np.where(just_reset[:, None], draws.astype(np.float32), s)
        ep = np.where(just_reset, 0, ep)

        # physics (skipped on reset step)
        x, x_dot, theta, theta_dot = s.T.copy()
        force = np.where(actions[t] > 0, cp.FORCE_MAG, -cp.FORCE_MAG)
        cos_t, sin_t = np.cos(theta), np.sin(theta)
        temp = (
            force + cp.POLE_MASS_LENGTH * theta_dot**2 * sin_t
        ) / cp.TOTAL_MASS
        theta_acc = (cp.GRAVITY * sin_t - cos_t * temp) / (
            cp.POLE_HALF_LENGTH
            * (4.0 / 3.0 - cp.MASS_POLE * cos_t**2 / cp.TOTAL_MASS)
        )
        x_acc = temp - cp.POLE_MASS_LENGTH * theta_acc * cos_t / cp.TOTAL_MASS
        new = np.stack(
            [
                x + cp.TAU * x_dot,
                x_dot + cp.TAU * x_acc,
                theta + cp.TAU * theta_dot,
                theta_dot + cp.TAU * theta_acc,
            ],
            axis=-1,
        ).astype(np.float32)
        s = np.where(just_reset[:, None], s, new)

        ep = ep + 1
        oob = (np.abs(s[:, 0]) > cp.X_LIMIT) | (
            np.abs(s[:, 2]) > cp.THETA_LIMIT
        )
        done = oob | (ep >= cp.EPISODE_LEN)
        obs_hist.append(s.copy())
        rew_hist.append(np.ones(num_worlds, np.float32))
        done_hist.append(done.astype(np.int32))
    return np.stack(obs_hist), np.stack(rew_hist), np.stack(done_hist)


def test_cartpole_matches_oracle_bitexact():
    num_worlds, T, seed = 8, 50, 17
    rs = np.random.RandomState(0)
    actions = rs.randint(0, 2, size=(T, num_worlds)).astype(np.int32)

    sim = make_sim(cp.Cartpole(), num_worlds=num_worlds, seed=seed)
    obs_list, rew_list, done_list = [], [], []
    for t in range(T):
        out = sim.step(
            {"action": jnp.asarray(actions[t]),
             "reset": jnp.zeros(num_worlds, jnp.int32)}
        )
        obs_list.append(np.asarray(out["obs"])[:, 0, :])
        rew_list.append(np.asarray(out["reward"]))
        done_list.append(np.asarray(out["done"]))

    o_obs, o_rew, o_done = numpy_oracle(num_worlds, actions, seed)
    np.testing.assert_array_equal(np.stack(done_list), o_done)
    np.testing.assert_array_equal(np.stack(rew_list), o_rew)
    # RNG streams are bit-exact (verified in test_rng); float trajectories
    # agree to 1 ulp — XLA contracts a*b-c into FMA, NumPy does not, so
    # exact bit equality across the two compilers is not defined. Integer
    # outputs (done/reward schedule) must still match exactly above.
    np.testing.assert_allclose(
        np.stack(obs_list), o_obs, rtol=0, atol=2e-6
    )


def test_cartpole_episodes_terminate_and_reset():
    num_worlds, T = 16, 300
    sim = make_sim(cp.Cartpole(), num_worlds=num_worlds, seed=3)
    # constant action drives the pole over the angle limit quickly
    acts = {
        "action": jnp.ones((T, num_worlds), jnp.int32),
        "reset": jnp.zeros((T, num_worlds), jnp.int32),
    }
    outs = rollout(sim, acts)
    done = np.asarray(outs["done"])
    assert done.any(), "constant action should terminate episodes"
    # after a done, the next obs must be inside the reset range
    obs = np.asarray(outs["obs"])[:, :, 0, :]
    t_idx, w_idx = np.nonzero(done[:-1])
    assert len(t_idx) > 0
    nxt = obs[t_idx + 1, w_idx]
    assert (np.abs(nxt) <= 0.05 + 1e-6).all()


def test_cartpole_forced_reset():
    num_worlds = 4
    sim = make_sim(cp.Cartpole(), num_worlds=num_worlds, seed=3)
    out1 = sim.step(
        {"action": jnp.zeros(num_worlds, jnp.int32),
         "reset": jnp.zeros(num_worlds, jnp.int32)}
    )
    forced = jnp.array([1, 0, 0, 0], jnp.int32)
    out2 = sim.step(
        {"action": jnp.zeros(num_worlds, jnp.int32), "reset": forced}
    )
    # world 0 re-drew (within reset range), world 1 integrated on
    assert np.abs(np.asarray(out2["obs"])[0]).max() <= 0.05 + 1e-6
