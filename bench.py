#!/usr/bin/env python
"""Benchmark: aggregate env-steps/s of the flagship environment.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "env_steps/s", "vs_baseline": N}

vs_baseline is measured against BASELINE.json's build target of 1M
aggregate env-steps/s per chip (Escape Room class). Runs on whatever
jax.default_backend() provides (TPU under the driver; CPU locally).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_STEPS_PER_SEC = 1_000_000.0


def pick_flagship():
    """Prefer the heaviest working env (escape_room > cartpole)."""
    try:
        from madrona_tpu.models.escape_room import EscapeRoom

        return "escape_room", EscapeRoom(), 8192, 200
    except Exception:
        from madrona_tpu.models.cartpole import Cartpole

        return "cartpole", Cartpole(), 16384, 500


def main():
    from madrona_tpu.models.base import make_sim, rollout

    name, env, num_worlds, steps = pick_flagship()
    sim = make_sim(env, num_worlds=num_worlds, seed=0)

    rs = np.random.RandomState(0)
    if hasattr(env, "random_actions"):
        acts = env.random_actions(rs, steps, num_worlds)
    else:
        n_act = getattr(env, "num_action_buckets", 2)
        act_shape = getattr(env, "action_shape", ())
        acts = jnp.asarray(
            rs.randint(0, n_act, (steps, num_worlds) + act_shape), jnp.int32
        )
    inputs = {
        "action": acts,
        "reset": jnp.zeros((steps, num_worlds), jnp.int32),
    }

    # warmup (compile)
    warm = {k: v[:2] for k, v in inputs.items()}
    rollout(sim, warm)
    jax.block_until_ready(sim.state.rng)

    t0 = time.perf_counter()
    outs = rollout(sim, inputs)
    jax.block_until_ready(outs["done"])
    dt = time.perf_counter() - t0

    total_env_steps = (steps) * num_worlds
    rate = total_env_steps / dt
    print(
        json.dumps(
            {
                "metric": f"{name}_env_steps_per_sec_{jax.default_backend()}",
                "value": round(rate, 1),
                "unit": "env_steps/s",
                "vs_baseline": round(rate / BASELINE_STEPS_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
