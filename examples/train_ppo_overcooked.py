#!/usr/bin/env python
"""PPO on Overcooked (cramped_room): the reference's flagship RL demo.

The reference README's headline result is Overcooked trained "to optimal
play in about two minutes" on one GPU (/root/reference/README.md:41,
madrona_rl_envs Colab). This is the TPU equivalent: parameter-shared
PPO over both agents, shaped rewards (overcooked_ai defaults), the env
step fused into the jitted update — watch mean deliveries/episode climb.

Usage: python examples/train_ppo_overcooked.py [--worlds 4096]
       [--updates 300]
"""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)


import argparse
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from madrona_tpu.models.base import make_sim
from madrona_tpu.models.overcooked import EPISODE_LEN, Overcooked

from train_ppo import PPOConfig, init_mlp, mlp


def make_train(num_worlds: int, cfg: PPOConfig, seed: int = 0):
    env = Overcooked(shaped_rewards=True)
    sim = make_sim(env, num_worlds=num_worlds, seed=seed)
    step_fn = sim.executor.step_fn(("step",))
    obs_dim = env.H * env.W * env.obs_channels
    n_act = 6

    key = jax.random.PRNGKey(seed)
    pi_params = init_mlp(key, [obs_dim, 128, 128, n_act])
    v_params = init_mlp(jax.random.fold_in(key, 1), [obs_dim, 128, 128, 1])

    def obs_of(state):
        return state.singletons["Obs"].reshape(num_worlds, 2, obs_dim)

    def rollout(carry, _):
        state, pi_p, v_p, rng = carry
        obs = obs_of(state)                                # [W, 2, D]
        rng, k = jax.random.split(rng)
        logits = mlp(pi_p, obs)                            # [W, 2, 6]
        act = jax.random.categorical(k, logits)
        logp = jnp.take_along_axis(
            jax.nn.log_softmax(logits), act[..., None], axis=-1
        )[..., 0]
        state, outs = step_fn(
            state,
            {"action": act.astype(jnp.int32),
             "reset": jnp.zeros((num_worlds,), jnp.int32)},
        )
        frame = dict(
            obs=obs, act=act, logp=logp,
            rew=jnp.broadcast_to(
                outs["reward"][:, None], (num_worlds, 2)
            ),
            done=jnp.broadcast_to(
                outs["done"].astype(jnp.float32)[:, None], (num_worlds, 2)
            ),
            val=mlp(v_p, obs)[..., 0],
            deliveries=outs["deliveries"],
            ep_done=outs["done"].astype(jnp.float32),
        )
        return (state, pi_p, v_p, rng), frame

    def gae(frames, last_val):
        def scan_back(carry, fr):
            adv = fr["rew"] + cfg.gamma * (1 - fr["done"]) * carry[1] \
                - fr["val"] + cfg.gamma * cfg.lam * (1 - fr["done"]) * carry[0]
            return (adv, fr["val"]), adv

        (_, _), advs = jax.lax.scan(
            scan_back, (jnp.zeros_like(last_val), last_val), frames,
            reverse=True,
        )
        return advs

    def loss_fn(params, batch):
        pi_p, v_p = params
        logits = mlp(pi_p, batch["obs"])
        logp_all = jax.nn.log_softmax(logits)
        logp = jnp.take_along_axis(
            logp_all, batch["act"][..., None], axis=-1
        )[..., 0]
        ratio = jnp.exp(logp - batch["logp"])
        adv = batch["adv"]
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)
        pg = -jnp.minimum(
            ratio * adv,
            jnp.clip(ratio, 1 - cfg.clip, 1 + cfg.clip) * adv,
        ).mean()
        v = mlp(v_p, batch["obs"])[..., 0]
        v_loss = jnp.mean((v - batch["ret"]) ** 2)
        ent = -jnp.sum(jnp.exp(logp_all) * logp_all, axis=-1).mean()
        return pg + cfg.vf_coef * v_loss - cfg.ent_coef * ent

    @jax.jit
    def update(state, pi_p, v_p, rng):
        (state, pi_p2, v_p2, rng), frames = jax.lax.scan(
            rollout, (state, pi_p, v_p, rng), None, length=cfg.horizon
        )
        adv = gae(frames, mlp(v_p, obs_of(state))[..., 0])
        batch = dict(
            obs=frames["obs"], act=frames["act"], logp=frames["logp"],
            adv=adv, ret=adv + frames["val"],
        )

        def adam_step(carry, t):
            params, m, v = carry
            grads = jax.grad(loss_fn)(params, batch)
            m = jax.tree_util.tree_map(
                lambda a, g: 0.9 * a + 0.1 * g, m, grads
            )
            v = jax.tree_util.tree_map(
                lambda a, g: 0.999 * a + 0.001 * g * g, v, grads
            )
            mh = jax.tree_util.tree_map(
                lambda a: a / (1 - 0.9 ** (t + 1.0)), m
            )
            vh = jax.tree_util.tree_map(
                lambda a: a / (1 - 0.999 ** (t + 1.0)), v
            )
            params = jax.tree_util.tree_map(
                lambda p, a, b: p - cfg.lr * a / (jnp.sqrt(b) + 1e-8),
                params, mh, vh,
            )
            return (params, m, v), None

        zeros = jax.tree_util.tree_map(jnp.zeros_like, (pi_p, v_p))
        ((pi_p, v_p), _, _), _ = jax.lax.scan(
            adam_step, ((pi_p, v_p), zeros, zeros),
            jnp.arange(cfg.epochs, dtype=jnp.float32),
        )
        # raw sums; the host accumulates across updates (episodes are
        # 400 steps, a rollout is `horizon` — most rollouts finish none)
        finished = jnp.sum(frames["ep_done"])
        delivered = jnp.sum(frames["deliveries"] * frames["ep_done"])
        return state, pi_p, v_p, rng, (delivered, finished)

    return sim, update, pi_params, v_params


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--worlds", type=int, default=4096)
    ap.add_argument("--updates", type=int, default=300)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--horizon", type=int, default=64)
    args = ap.parse_args(argv)

    cfg = dataclasses.replace(
        PPOConfig(), horizon=args.horizon, ent_coef=0.02, lr=5e-4
    )
    sim, update, pi_p, v_p = make_train(args.worlds, cfg, args.seed)
    state = sim.state
    rng = jax.random.PRNGKey(args.seed + 7)

    t0 = time.perf_counter()
    window = []
    per_ep = 0.0
    for u in range(args.updates):
        state, pi_p, v_p, rng, stats = update(state, pi_p, v_p, rng)
        window.append(stats)
        if (u + 1) % 50 == 0:
            jax.block_until_ready(stats)
            delivered = sum(float(d) for d, _ in window)
            finished = sum(float(f) for _, f in window)
            window = []
            per_ep = delivered / max(finished, 1.0)
            dt = time.perf_counter() - t0
            sps = (u + 1) * cfg.horizon * args.worlds / dt
            print(
                f"update {u+1:4d}  deliveries/episode {per_ep:5.2f}"
                f"  ({sps:,.0f} env-steps/s incl. learner)  {dt:.0f}s"
            )
    print("done in", round(time.perf_counter() - t0, 1), "s")
    return per_ep


if __name__ == "__main__":
    main()
