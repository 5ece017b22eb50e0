#!/usr/bin/env python
"""Weak-scaling measurement over the available devices.

On a pod slice this measures the BASELINE.json target (>=90% efficiency
at constant worlds/device); on a dev box, run with
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu to
validate the mechanism on virtual devices.

Usage: python scripts/weak_scaling.py [--worlds-per-device 512]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from madrona_tpu.utils.config import enable_compile_cache

enable_compile_cache()
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worlds-per-device", type=int, default=512)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--env", default="escape_room")
    ap.add_argument(
        "--cpu", action="store_true",
        help="force the CPU backend (the container sitecustomize pins "
        "JAX_PLATFORMS, so the env var alone is not enough)",
    )
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from madrona_tpu.models.base import make_sim
    from madrona_tpu.parallel import distributed as dist
    from madrona_tpu.parallel import mesh as pmesh

    if args.env == "escape_room":
        from madrona_tpu.models.escape_room import EscapeRoom as Env
    else:
        from madrona_tpu.models.cartpole import Cartpole as Env

    n_dev = len(jax.devices())
    counts = [c for c in (1, 2, 4, 8, 16, 32) if c <= n_dev]

    def make_step(num_worlds):
        env = Env()
        sim = make_sim(env, num_worlds=num_worlds, seed=0, donate=False)
        ndev = max(1, num_worlds // args.worlds_per_device)
        mesh = pmesh.make_mesh(jax.devices()[:ndev])
        state = pmesh.shard_state(sim.state, mesh)
        act_shape = getattr(env, "action_shape", ())
        inp = {
            "action": jnp.zeros((num_worlds,) + act_shape, jnp.int32),
            "reset": jnp.zeros((num_worlds,), jnp.int32),
        }
        inp = jax.device_put(inp, pmesh.input_shardings(inp, mesh))
        raw = sim.step_fn()

        def fn(s, i):
            s2, _ = raw(s, i)
            return s2

        return state, inp, fn

    res = dist.weak_scaling(
        make_step, args.worlds_per_device, counts, steps=args.steps
    )
    print(json.dumps(
        {
            "devices": counts,
            "steps_per_sec": {str(k): v for k, v in res["steps_per_sec"].items()},
            "efficiency": {str(k): round(v, 4) for k, v in res["efficiency"].items()},
        }
    ))


if __name__ == "__main__":
    main()
