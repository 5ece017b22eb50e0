#!/usr/bin/env python
"""Per-phase step profiler (the reference's scripts/profile.py analogue).

Times the flagship env's full step and each physics phase in isolation
on the current backend; prints a table. Phase timings are upper bounds
(isolated calls pay state round-trips the fused step amortizes).

Usage: python scripts/profile_step.py [--worlds 1024] [--env escape_room]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from madrona_tpu.utils.config import enable_compile_cache

enable_compile_cache()
import jax.numpy as jnp


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worlds", type=int, default=1024)
    ap.add_argument("--env", default="escape_room")
    args = ap.parse_args()

    from madrona_tpu.models.base import make_sim

    if args.env == "escape_room":
        from madrona_tpu.models.escape_room import EscapeRoom as Env
    elif args.env == "hide_seek":
        from madrona_tpu.models.hide_seek import HideSeek as Env
    else:
        raise SystemExit(f"unknown env {args.env}")

    W = args.worlds
    env = Env()
    sim = make_sim(env, num_worlds=W, seed=0, donate=False)
    step = sim.step_fn()
    act_shape = getattr(env, "action_shape", ())
    inp = {
        "action": jnp.zeros((W,) + act_shape, jnp.int32),
        "reset": jnp.zeros((W,), jnp.int32),
    }
    s, _ = step(sim.state, inp)

    full = timeit(lambda st: step(st, inp)[0].rng, s)
    print(f"backend={jax.default_backend()}  worlds={W}")
    print(f"{'FULL STEP':24s} {full:8.2f} ms   "
          f"({W / full * 1e3:,.0f} env-steps/s)")

    from madrona_tpu.physics import api, broadphase as bp, xpbd

    body = api.body_state(sim.executor.sm, s)
    om, cfg, caps = env.om, env.cfg, env.caps
    cands = jax.jit(lambda b: bp.find_candidates(b, om, caps, cfg.dt))(body)
    contacts = jax.jit(lambda b: api._narrowphase_all(b, om, cands))(body)
    h = cfg.dt / cfg.substeps
    g = jnp.asarray(cfg.gravity, jnp.float32)
    phases = {
        "broadphase": lambda: jax.jit(
            lambda b: bp.find_candidates(b, om, caps, cfg.dt))(body),
        "narrowphase": lambda: jax.jit(
            lambda b: api._narrowphase_all(b, om, cands))(body),
        "integrate": lambda: jax.jit(
            lambda b: xpbd.integrate(b, om, h, g))(body),
        "solve_positions": lambda: jax.jit(
            lambda b: xpbd.solve_positions_jacobi(
                b, contacts, om, cfg.jacobi_iters)[0])(body),
        "solve_velocities": lambda: jax.jit(
            lambda b: xpbd.solve_velocities_jacobi(
                b, contacts, om, h, cfg.restitution,
                cfg.restitution_threshold))(body),
    }
    for name, fn in phases.items():
        print(f"{name:24s} {timeit(lambda: fn()):8.2f} ms  (isolated)")


if __name__ == "__main__":
    main()
