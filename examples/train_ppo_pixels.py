"""Vision PPO on hide&seek: RGBD pixel observations from the batch
renderer feeding a conv policy, sim + render + learner in ONE jitted
update.

This is the reference's headline use case — the batch renderer exists
to train agents from pixels at scale (reference README.md:5-16; the
raycaster outputs per-view RGBD tensors consumed directly by the
learner, bvh_raycast.cpp). On TPU the whole loop stays on device: the
rollout is a lax.scan over the sim's pure step fn (render graph
included), the conv encoder runs in bfloat16 on the MXU, and the PPO
update consumes the stacked [T, W*A, H, W, C] buffer without any host
round-trip.

Action space is hide&seek's multi-discrete (4, 8, 5, 2, 2): the policy
emits one categorical head per column; log-probs/entropies sum across
heads (standard multi-discrete PPO).

Run: python examples/train_ppo_pixels.py [--worlds 256] [--updates 50]
     [--render-size 16] [--tier dense|blas]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from madrona_tpu.models.base import make_sim
from madrona_tpu.models import hide_seek as hs


# ------------------------------------------------------------- network

def init_conv_net(key, h, w, c, n_heads, widths=(16, 32), hidden=128):
    """Tiny IMPALA-style encoder: two stride-2 3x3 convs + MLP trunk +
    one linear head per action column + a value head."""
    params = {}
    ks = jax.random.split(key, 8)
    c_in = c
    for i, c_out in enumerate(widths):
        params[f"conv{i}"] = {
            "w": jax.random.normal(ks[i], (3, 3, c_in, c_out))
            * jnp.sqrt(2.0 / (9 * c_in)),
            "b": jnp.zeros((c_out,)),
        }
        c_in = c_out
    hh, ww = h, w
    for _ in widths:
        hh, ww = (hh + 1) // 2, (ww + 1) // 2
    flat = hh * ww * widths[-1]
    params["fc"] = {
        "w": jax.random.normal(ks[4], (flat, hidden)) * jnp.sqrt(2.0 / flat),
        "b": jnp.zeros((hidden,)),
    }
    for j, n in enumerate(n_heads):
        params[f"pi{j}"] = {
            "w": jax.random.normal(
                jax.random.fold_in(ks[5], j), (hidden, n)
            ) * 0.01,
            "b": jnp.zeros((n,)),
        }
    params["v"] = {
        "w": jax.random.normal(ks[6], (hidden, 1)) * 1.0,
        "b": jnp.zeros((1,)),
    }
    return params


def encode(params, rgbd, n_heads):
    """rgbd [B, H, W, C] float -> (per-head logits list, value [B]).
    Convs run bf16 (MXU); heads/value in f32."""
    x = rgbd.astype(jnp.bfloat16)
    i = 0
    while f"conv{i}" in params:
        p = params[f"conv{i}"]
        x = jax.lax.conv_general_dilated(
            x, p["w"].astype(jnp.bfloat16),
            window_strides=(2, 2), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["b"].astype(jnp.bfloat16)
        x = jax.nn.relu(x)
        i += 1
    x = x.reshape(x.shape[0], -1).astype(jnp.float32)
    h = jnp.tanh(x @ params["fc"]["w"] + params["fc"]["b"])
    logits = [
        h @ params[f"pi{j}"]["w"] + params[f"pi{j}"]["b"]
        for j in range(len(n_heads))
    ]
    v = (h @ params["v"]["w"] + params["v"]["b"])[..., 0]
    return logits, v


def sample_multi(key, logits):
    """Sample one action per head; returns act [B, K], logp [B]."""
    acts, logps = [], []
    for j, lg in enumerate(logits):
        k = jax.random.fold_in(key, j)
        a = jax.random.categorical(k, lg)
        lp = jax.nn.log_softmax(lg)[jnp.arange(lg.shape[0]), a]
        acts.append(a)
        logps.append(lp)
    return jnp.stack(acts, -1).astype(jnp.int32), sum(logps)


def logp_entropy(logits, act):
    """act [B, K] -> (logp [B], entropy [B]) summed over heads."""
    lp_sum, ent_sum = 0.0, 0.0
    for j, lg in enumerate(logits):
        lsm = jax.nn.log_softmax(lg)
        lp_sum = lp_sum + jnp.take_along_axis(
            lsm, act[:, j][:, None], axis=-1
        )[..., 0]
        ent_sum = ent_sum - jnp.sum(jnp.exp(lsm) * lsm, axis=-1)
    return lp_sum, ent_sum


# ----------------------------------------------------------------- PPO

@dataclasses.dataclass(frozen=True)
class VPPOConfig:
    horizon: int = 16
    lr: float = 2.5e-4
    gamma: float = 0.99
    lam: float = 0.95
    clip: float = 0.2
    epochs: int = 2
    vf_coef: float = 0.5
    ent_coef: float = 0.01


def make_train(num_worlds, cfg, seed=0, render_size=16, tier="dense"):
    env = hs.HideSeek(
        render_size=render_size, pixels=True, render_tier=tier,
        tlas_max_instances=(8 if tier == "dense" else 0),
    )
    sim = make_sim(env, num_worlds=num_worlds, seed=seed)
    step_fn = sim.step_fn()
    n_heads = env.action_buckets
    a_n = hs.N_AGENTS
    b = num_worlds * a_n

    params = init_conv_net(
        jax.random.PRNGKey(seed), render_size, render_size, 4, n_heads
    )

    def obs_of(outs):
        rgb = outs["rgb"].reshape(b, render_size, render_size, 3)
        dep = outs["depth"].reshape(b, render_size, render_size, 1)
        dep = jnp.minimum(dep / env.rcfg.t_max, 1.0)
        return jnp.concatenate([rgb, dep], -1)

    def rollout_step(carry, _):
        state, prev_obs, p, rng = carry
        rng, k = jax.random.split(rng)
        logits, val = encode(p, prev_obs, n_heads)
        act, logp = sample_multi(k, logits)
        state, outs = step_fn(state, {
            "action": act.reshape(num_worlds, a_n, len(n_heads)),
            "reset": jnp.zeros((num_worlds,), jnp.int32),
        })
        rew = outs["reward"].reshape(b)
        done = jnp.repeat(outs["done"].astype(jnp.float32), a_n)
        frame = dict(obs=prev_obs, act=act, logp=logp, rew=rew,
                     done=done, val=val)
        return (state, obs_of(outs), p, rng), frame

    def gae(frames, last_val):
        def back(carry, fr):
            adv_next, v_next = carry
            nd = 1.0 - fr["done"]
            delta = fr["rew"] + cfg.gamma * nd * v_next - fr["val"]
            adv = delta + cfg.gamma * cfg.lam * nd * adv_next
            return (adv, fr["val"]), adv

        (_, _), advs = jax.lax.scan(
            back, (jnp.zeros_like(last_val), last_val), frames,
            reverse=True,
        )
        return advs

    def loss_fn(p, batch):
        logits, v = encode(p, batch["obs"], n_heads)
        lp, ent = logp_entropy(logits, batch["act"])
        ratio = jnp.exp(lp - batch["logp"])
        adv = batch["adv"]
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)
        pg = -jnp.minimum(
            ratio * adv,
            jnp.clip(ratio, 1 - cfg.clip, 1 + cfg.clip) * adv,
        ).mean()
        v_loss = jnp.mean((v - batch["ret"]) ** 2)
        return pg + cfg.vf_coef * v_loss - cfg.ent_coef * ent.mean()

    @jax.jit
    def update(state, first_obs, p, opt_m, opt_v, t_step, rng):
        (state, last_obs, p2, rng), frames = jax.lax.scan(
            rollout_step, (state, first_obs, p, rng), None,
            length=cfg.horizon,
        )
        _, last_val = encode(p, last_obs, n_heads)
        adv = gae(frames, last_val)
        flat = lambda a: a.reshape((-1,) + a.shape[2:])
        batch = dict(
            obs=flat(frames["obs"]), act=flat(frames["act"]),
            logp=flat(frames["logp"]), adv=flat(adv),
            ret=flat(adv + frames["val"]),
        )

        def adam(carry, i):
            p, m, v, t = carry
            g = jax.grad(loss_fn)(p, batch)
            m = jax.tree_util.tree_map(lambda a, b: 0.9 * a + 0.1 * b, m, g)
            v = jax.tree_util.tree_map(
                lambda a, b: 0.999 * a + 0.001 * b * b, v, g
            )
            t = t + 1.0
            mh = jax.tree_util.tree_map(lambda a: a / (1 - 0.9 ** t), m)
            vh = jax.tree_util.tree_map(lambda a: a / (1 - 0.999 ** t), v)
            p = jax.tree_util.tree_map(
                lambda w, a, b: w - cfg.lr * a / (jnp.sqrt(b) + 1e-8),
                p, mh, vh,
            )
            return (p, m, v, t), None

        (p, opt_m, opt_v, t_step), _ = jax.lax.scan(
            adam, (p, opt_m, opt_v, t_step), None, length=cfg.epochs
        )
        return (state, last_obs, p, opt_m, opt_v, t_step, rng,
                frames["rew"].mean())

    # initial obs: one zero-action step to populate the render outputs
    state, outs0 = step_fn(sim.state, {
        "action": jnp.zeros((num_worlds, a_n, len(n_heads)), jnp.int32),
        "reset": jnp.zeros((num_worlds,), jnp.int32),
    })
    return sim, update, state, obs_of(outs0), params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worlds", type=int, default=256)
    ap.add_argument("--updates", type=int, default=50)
    ap.add_argument("--render-size", type=int, default=16)
    ap.add_argument("--tier", default="dense", choices=("dense", "blas"))
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    cfg = VPPOConfig()
    sim, update, state, obs, p = make_train(
        args.worlds, cfg, args.seed, args.render_size, args.tier
    )
    zeros = jax.tree_util.tree_map(jnp.zeros_like, p)
    m, v, t = zeros, jax.tree_util.tree_map(jnp.zeros_like, p), jnp.float32(0)
    rng = jax.random.PRNGKey(args.seed + 7)

    t0 = time.perf_counter()
    for u in range(args.updates):
        state, obs, p, m, v, t, rng, mean_rew = update(
            state, obs, p, m, v, t, rng
        )
        if (u + 1) % 5 == 0:
            dt = time.perf_counter() - t0
            sps = (u + 1) * cfg.horizon * args.worlds / dt
            print(
                f"update {u+1:4d}  mean step reward {float(mean_rew):+.4f}"
                f"  ({sps:,.0f} env-steps/s incl. render + learner)"
            )
    print("done in", round(time.perf_counter() - t0, 1), "s")


if __name__ == "__main__":
    main()
