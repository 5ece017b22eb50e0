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


def test_ppo_distributed_8dev_mesh():
    """Sharded PPO: worlds over the 8-device CPU mesh, params replicated;
    training still improves and params stay identical on every device."""
    import sys
    import os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                    "..", "examples"))
    import train_ppo_distributed as tpd

    ep_len, pi_p = tpd.main(["--worlds", "256", "--updates", "25"])
    assert ep_len > 25.0          # random policy is ~10-15

    # replicated params: every shard identical
    leaf = jax.tree_util.tree_leaves(pi_p)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(s, shards[0])
    assert len(leaf.sharding.device_set) == 8


def test_torch_reinforce_bridge():
    """Torch learner through TrainInterface.torch_step learns cartpole
    (the reference's external-learner consumption path)."""
    import train_ppo  # noqa: F401  (ensures examples on path)
    import train_torch_reinforce as ttr

    ep_len = ttr.main(["--worlds", "64", "--updates", "25",
                       "--horizon", "48"])
    assert ep_len > 40.0           # random policy is ~10-20


def test_vision_ppo_hide_seek_update():
    """One vision-PPO update on hide&seek pixels: the renderer's RGBD
    feeds a bf16 conv policy inside a single jitted update (sim + render
    + learner on device); params must move and stay finite."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from examples.train_ppo_pixels import VPPOConfig, make_train

    cfg = VPPOConfig(horizon=4, epochs=1)
    sim, update, state, obs, p = make_train(
        2, cfg, seed=0, render_size=16
    )
    zeros = jax.tree_util.tree_map(jnp.zeros_like, p)
    m = zeros
    v = jax.tree_util.tree_map(jnp.zeros_like, p)
    out = update(state, obs, p, m, v, jnp.float32(0),
                 jax.random.PRNGKey(1))
    state2, obs2, p2, m2, v2, t2, rng2, mean_rew = out
    assert np.isfinite(float(mean_rew))
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), p, p2
    )
    total = sum(jax.tree_util.tree_leaves(moved))
    assert total > 0.0
    for leaf in jax.tree_util.tree_leaves(p2):
        assert np.isfinite(np.asarray(leaf)).all()
