#!/usr/bin/env python
"""Torch learner on the madrona_tpu sim: the reference's consumption path.

The reference exports sim state as torch tensors for external RL stacks
(include/madrona/py/ — TrainInterface + dlpack bridge); this example
drives the same surface here: a torch policy (REINFORCE, CPU torch)
steps Cartpole through ``interop.TrainInterface.torch_step`` — sim
tensors arrive as torch tensors, actions go back in as torch tensors.

For production-scale training prefer the fused-jit examples
(train_ppo*.py): keeping the learner inside jit avoids the per-step
host hop this bridge pays by design. This example exists to prove the
torch path end-to-end.

Usage: python examples/train_torch_reinforce.py [--worlds 256]
       [--updates 60]
"""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)

import argparse
import time

import numpy as np
import torch

from madrona_tpu.interop import TrainInterface
from madrona_tpu.models.base import make_sim
from madrona_tpu.models.cartpole import Cartpole


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--worlds", type=int, default=256)
    ap.add_argument("--updates", type=int, default=60)
    ap.add_argument("--horizon", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    torch.manual_seed(args.seed)
    w = args.worlds
    sim = make_sim(Cartpole(), num_worlds=w, seed=args.seed, donate=False)
    ti = TrainInterface(sim)
    assert "action" in ti.step_inputs and "obs" in ti.step_outputs

    policy = torch.nn.Sequential(
        torch.nn.Linear(4, 64), torch.nn.Tanh(),
        torch.nn.Linear(64, 2),
    )
    opt = torch.optim.Adam(policy.parameters(), lr=1e-2)

    t0 = time.perf_counter()
    ep_len = 0.0
    for u in range(args.updates):
        logps, rews, dones = [], [], []
        obs = ti.step_outputs["obs"]
        obs_t = torch.as_tensor(np.asarray(obs))[:, 0, :]
        for _ in range(args.horizon):
            logits = policy(obs_t)
            dist = torch.distributions.Categorical(logits=logits)
            act = dist.sample()
            outs = ti.torch_step(
                action=act.to(torch.int32),
                reset=torch.zeros(w, dtype=torch.int32),
            )
            logps.append(dist.log_prob(act))
            rews.append(outs["reward"].clone())
            dones.append(outs["done"].to(torch.float32).clone())
            obs_t = outs["obs"][:, 0, :].to(torch.float32).clone()

        # reward-to-go with done masking
        ret = torch.zeros(w)
        loss = 0.0
        returns = []
        for r, d in zip(reversed(rews), reversed(dones)):
            ret = r + 0.99 * ret * (1.0 - d)
            returns.append(ret.clone())
        returns.reverse()
        rstack = torch.stack(returns)
        rstack = (rstack - rstack.mean()) / (rstack.std() + 1e-6)
        loss = -(torch.stack(logps) * rstack).mean()
        opt.zero_grad()
        loss.backward()
        opt.step()

        ep_len = 1.0 / max(torch.stack(dones).mean().item(), 1e-4)
        if (u + 1) % 10 == 0:
            print(
                f"update {u+1:3d}  avg episode length ~{ep_len:6.1f}  "
                f"({(u+1)*args.horizon*w/(time.perf_counter()-t0):,.0f} "
                "env-steps/s through the torch bridge)"
            )
    print("done in", round(time.perf_counter() - t0, 1), "s")
    return ep_len


if __name__ == "__main__":
    main()
