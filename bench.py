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

from madrona_tpu.utils.config import enable_compile_cache

enable_compile_cache()
import jax.numpy as jnp
import numpy as np

BASELINE_STEPS_PER_SEC = 1_000_000.0


def pick_flagship():
    """Prefer the heaviest working env (escape_room > cartpole).

    World count chosen by measurement: the physics step is bandwidth-
    bound, so throughput peaks near 1k worlds on one v5e chip.
    MADRONA_TPU_BENCH_WORLDS overrides for sweeps."""
    import os

    worlds = int(os.environ.get("MADRONA_TPU_BENCH_WORLDS", "0"))
    which = os.environ.get("MADRONA_TPU_BENCH_ENV", "escape_room")
    # returns (display_name, tuned_table_key, env, num_worlds, steps) —
    # the table key is the base env name (tuned_configs.json keys by
    # env, not by the parameterized display string)
    if which == "hide_seek":
        # the reference's engine-scale design point: 16k hide&seek worlds
        # (tracing.hpp:26-28); sim-only, like the reference's headless
        # benchmark binary
        from madrona_tpu.models.hide_seek import HideSeek

        return ("hide_seek", "hide_seek", HideSeek(pixels=False),
                worlds or 16384, 200)
    if which == "hide_seek_pixels":
        from madrona_tpu.models.hide_seek import HideSeek

        k = int(os.environ.get("MADRONA_TPU_BENCH_TLAS_K", "0"))
        rs = int(os.environ.get("MADRONA_TPU_BENCH_RENDER_SIZE", "16"))
        tier = os.environ.get("MADRONA_TPU_BENCH_RENDER_TIER", "dense")
        suffix = "" if tier == "dense" else f"_{tier}"
        return (
            f"hide_seek_pixels{rs}{suffix}", "hide_seek",
            HideSeek(render_size=rs, tlas_max_instances=k,
                     render_tier=tier),
            worlds or 1024, 100,
        )
    if which == "pile":
        # many-body stress point: 256 bodies/world through the swept
        # broadphase tier (reference broadphase.cpp's regime)
        from madrona_tpu.models.pile import Pile

        nb = int(os.environ.get("MADRONA_TPU_BENCH_PILE_BODIES", "256"))
        return f"pile{nb}", "pile", Pile(num_bodies=nb), worlds or 64, 100
    if which == "cartpole":
        from madrona_tpu.models.cartpole import Cartpole

        return "cartpole", "cartpole", Cartpole(), worlds or 16384, 500
    try:
        from madrona_tpu.models.escape_room import EscapeRoom
        from madrona_tpu.utils.config import load_tuned

        # world count from the committed tuning table (measured sweep on
        # one v5e chip, 2026-08-19, chunk=8: 1024w 451.8k / 2048w 461.4k
        # / 4096w 449.8k env-steps/s -> 2048 peak); regenerate with
        # scripts/tune_kernels.py
        tuned_w = load_tuned("escape_room").get("bench_worlds", 2048)
        return ("escape_room", "escape_room", EscapeRoom(),
                worlds or tuned_w, 400)
    except Exception:
        from madrona_tpu.models.cartpole import Cartpole

        return "cartpole", "cartpole", Cartpole(), 16384, 500


def main():
    from madrona_tpu.models.base import make_sim, rollout

    name, table_key, env, num_worlds, steps = pick_flagship()
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

    # Measure the stepping loop itself (the reference's benchmark shape:
    # observations live on device each step for the learner; stacking
    # T x all-exports into rollout buffers is a learner-side choice and
    # is bandwidth-dominated by buffer padding, not simulation).
    #
    # MADRONA_TPU_BENCH_CHUNK=K > 1 wraps K steps in one lax.scan'd
    # device program (per-step outputs stacked [K, ...] — exactly what a
    # JAX-native learner's rollout collection consumes), so per-call
    # dispatch latency through the remote tunnel amortizes over K steps
    # instead of bounding throughput. The reference's analogue is CUDA
    # graph replay per step at ~us launch cost (cuda_exec.cpp:2756).
    import os

    # Default chunk=8: the learner-shaped rollout path (a JAX PPO
    # learner scans the step exactly like this). Measured on one v5e
    # chip 2026-08-19: per-step dispatch 444.8k vs chunk=8 461.4k
    # env-steps/s at 2048 worlds. chunk=1 restores per-step dispatch.
    from madrona_tpu.utils.config import load_tuned

    tuned_chunk = load_tuned(table_key).get("bench_chunk", 8)
    chunk = int(os.environ.get("MADRONA_TPU_BENCH_CHUNK", tuned_chunk))
    step = sim.step_fn()
    state = sim.state
    if chunk > 1:
        steps = (steps // chunk) * chunk
        n_chunks = steps // chunk
        chunked = {
            k: v[:steps].reshape((n_chunks, chunk) + v.shape[1:])
            for k, v in inputs.items()
        }
        per_call = [
            {k: v[i] for k, v in chunked.items()} for i in range(n_chunks)
        ]

        @jax.jit
        def run_chunk(state, inp):
            def body(s, one):
                s, o = step(s, one)
                return s, o

            return jax.lax.scan(body, state, inp)

        state, outs = run_chunk(state, per_call[0])
        state, outs = run_chunk(state, per_call[1])
        jax.block_until_ready(outs["done"])
        t0 = time.perf_counter()
        for i in range(2, n_chunks):
            state, outs = run_chunk(state, per_call[i])
        jax.block_until_ready(outs["done"])
        dt = time.perf_counter() - t0
        steps = steps - 2 * chunk
    else:
        per_step = [
            {k: v[t] for k, v in inputs.items()} for t in range(steps)
        ]
        # two-step warmup: the first call compiles for the initial-state
        # layouts, the second compiles the steady-state variant (XLA may
        # pick different output layouts, so step(step(s)) re-specializes)
        state, outs = step(state, per_step[0])
        state, outs = step(state, per_step[1])
        jax.block_until_ready(outs["done"])

        t0 = time.perf_counter()
        for t in range(2, steps):
            state, outs = step(state, per_step[t])
        jax.block_until_ready(outs["done"])
        dt = time.perf_counter() - t0
        steps = steps - 2

    total_env_steps = (steps) * num_worlds
    rate = total_env_steps / dt
    rec = {
        "metric": f"{name}_env_steps_per_sec_{jax.default_backend()}",
        "value": round(rate, 1),
        "unit": "env_steps/s",
        "vs_baseline": round(rate / BASELINE_STEPS_PER_SEC, 4),
    }
    # speed-of-light context (utils/roofline.py): render rows vs the
    # measured VPU issue ceiling (tight), sim rows vs the HBM state
    # floor (loose context — sims are compute-bound)
    from madrona_tpu.utils.roofline import bench_roofline

    rl = bench_roofline(name, num_worlds, rate, env=env)
    if rl:
        rec["roofline_model"] = rl["model"]
        rec["sol_env_steps_per_sec"] = rl["sol_env_steps_per_sec"]
        rec["pct_of_roofline"] = rl["pct_of_roofline"]
    print(json.dumps(rec))


if __name__ == "__main__":
    sys.exit(main())
