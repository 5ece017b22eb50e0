"""End-to-end learning smoke test: PPO on Cartpole improves the policy."""

import sys
import os

import jax
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


def test_ppo_improves():
    from train_ppo import PPOConfig, make_train

    cfg = PPOConfig()
    sim, update, pi_p, v_p = make_train(64, cfg, seed=1)
    state = sim.state
    rng = jax.random.PRNGKey(42)
    first = None
    for u in range(120):
        state, pi_p, v_p, rng, ep_len = update(state, pi_p, v_p, rng)
        if u == 10:
            first = float(ep_len)
    last = float(ep_len)
    assert np.isfinite(last)
    # random policy survives ~20 steps; learning should clearly beat it
    assert last > max(40.0, 1.5 * first), (first, last)
