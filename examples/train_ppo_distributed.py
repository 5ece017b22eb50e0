#!/usr/bin/env python
"""Multi-chip / multi-host PPO: worlds sharded, params replicated.

Extends examples/train_ppo.py across a device mesh the TPU-native way
(SURVEY.md §5.8): the env step needs ZERO collectives (worlds are
independent and sharded over devices), and gradient sync falls out of
the shardings — the loss means over the sharded worlds axis, so XLA
inserts the psum that replicated-out params require. No NCCL-style
explicit allreduce calls anywhere.

Run single-host multi-chip:  python examples/train_ppo_distributed.py
Run on a virtual 8-dev CPU:  JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python examples/train_ppo_distributed.py --worlds 512 --updates 30
Multi-host pods: call madrona_tpu.parallel.distributed.initialize()
first (auto-detects on TPU pods); each host runs this same script.
"""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)


import argparse
import time

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from madrona_tpu.parallel import distributed as dist
from madrona_tpu.parallel import mesh as pmesh

from train_ppo import PPOConfig, make_train


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--worlds", type=int, default=1024)
    ap.add_argument("--updates", type=int, default=150)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    # multi-host: no-op single-process; auto-detects on TPU pods
    dist.initialize()

    mesh = dist.global_mesh()
    n_dev = len(jax.devices())
    if args.worlds % n_dev:
        raise SystemExit(f"--worlds must divide by {n_dev} devices")
    print(f"devices: {n_dev}  worlds/device: {args.worlds // n_dev}")

    cfg = PPOConfig()
    sim, update, pi_p, v_p = make_train(args.worlds, cfg, args.seed)

    # worlds sharded; params + rng replicated. Everything else is
    # sharding propagation: the rollout scan stays collective-free, the
    # grad means produce one psum per update.
    state_sh = pmesh.state_shardings(sim.state, mesh)
    rep = NamedSharding(mesh, P())
    state = jax.device_put(sim.state, state_sh)
    pi_p = jax.device_put(pi_p, rep)
    v_p = jax.device_put(v_p, rep)

    upd = jax.jit(
        update.__wrapped__,
        in_shardings=(state_sh, rep, rep, rep),
        out_shardings=(state_sh, rep, rep, rep, rep),
        donate_argnums=(0,),
    )

    rng = jax.device_put(jax.random.PRNGKey(args.seed + 100), rep)
    t0 = time.perf_counter()
    ep_len = None
    for u in range(args.updates):
        state, pi_p, v_p, rng, ep_len = upd(state, pi_p, v_p, rng)
        if (u + 1) % 10 == 0:
            jax.block_until_ready(ep_len)
            dt = time.perf_counter() - t0
            sps = (u + 1) * cfg.horizon * args.worlds / dt
            print(
                f"update {u+1:4d}  avg episode length ~{float(ep_len):6.1f}"
                f"  ({sps:,.0f} env-steps/s incl. learner, {n_dev} devices)"
            )
    print("done in", round(time.perf_counter() - t0, 1), "s")
    return float(ep_len), pi_p


if __name__ == "__main__":
    main()
