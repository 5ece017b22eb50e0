#!/usr/bin/env python
"""Op-level step profile via an XLA xplane trace (no per-phase compiles).

Captures a jax.profiler trace of the flagship step and prints the top
device ops by total self time — the practical way to see where a fused
TPU step spends HBM time, since isolating phases forces extra
materialization the fused step doesn't pay.

Usage: python scripts/xprof_step.py [--worlds 1024] [--env escape_room]
       [--steps 30] [--top 40]
"""

import argparse
import collections
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from madrona_tpu.utils.config import enable_compile_cache

enable_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worlds", type=int, default=1024)
    ap.add_argument("--env", default="escape_room")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--dir", default="/tmp/mtpu_xprof")
    args = ap.parse_args()

    from madrona_tpu.models.base import make_sim

    if args.env == "escape_room":
        from madrona_tpu.models.escape_room import EscapeRoom as Env
    elif args.env == "hide_seek":
        from madrona_tpu.models.hide_seek import HideSeek as Env
    elif args.env == "cartpole":
        from madrona_tpu.models.cartpole import Cartpole as Env
    elif args.env == "pile":
        from madrona_tpu.models.pile import Pile as Env
    else:
        raise SystemExit(f"unknown env {args.env}")

    w = args.worlds
    env = Env()
    sim = make_sim(env, num_worlds=w, seed=0, donate=False)
    step = sim.step_fn()
    act_shape = getattr(env, "action_shape", ())
    inp = {
        "action": jnp.zeros((w,) + act_shape, jnp.int32),
        "reset": jnp.zeros((w,), jnp.int32),
    }
    s, o = step(sim.state, inp)
    jax.block_until_ready(o["done"])
    print("compiled; tracing...", flush=True)

    os.makedirs(args.dir, exist_ok=True)
    with jax.profiler.trace(args.dir):
        for _ in range(args.steps):
            s, o = step(s, inp)
        jax.block_until_ready(o["done"])

    paths = sorted(
        glob.glob(os.path.join(args.dir, "**", "*.xplane.pb"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise SystemExit("no xplane capture found")
    summarize(paths[-1], args.top, args.steps)


def summarize(path, top, steps):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        ev_names = {i: m.name for i, m in plane.event_metadata.items()}

        def tally(pred):
            totals = collections.Counter()
            counts = collections.Counter()
            total_ns = 0
            for line in plane.lines:
                if not pred(line.name.lower()):
                    continue
                for ev in line.events:
                    name = ev_names.get(ev.metadata_id, "?")
                    dur = ev.duration_ps / 1e3
                    totals[name] += dur
                    counts[name] += 1
                    total_ns += dur
            return totals, counts, total_ns

        # module-level (whole-program) line
        totals, counts, total_ns = tally(
            lambda n: "step" not in n and "xla op" not in n
        )
        if totals:
            print(f"\n== plane: {plane.name} (total "
                  f"{total_ns/1e6/steps:.3f} ms/step over {steps} steps)")
            width = max(len(n) for n, _ in totals.most_common(top))
            for name, ns in totals.most_common(top):
                print(f"  {name:<{width}}  {ns/1e6/steps:8.4f} ms/step  "
                      f"x{counts[name]//steps}")

        # op-level self-time line ("XLA Ops"), the real breakdown.
        # copy-start/copy-done spans measure the ASYNC WINDOW (they
        # overlap compute), so bucket them separately from the real
        # compute ops.
        totals, counts, total_ns = tally(lambda n: "xla op" in n)
        if totals:
            is_async = lambda n: n.lstrip("%").startswith(
                ("copy-start", "copy-done", "send", "recv",
                 "all-reduce-start", "collective-permute-start")
            )
            compute = collections.Counter(
                {n: v for n, v in totals.items() if not is_async(n)}
            )
            async_ns = sum(v for n, v in totals.items() if is_async(n))
            comp_ns = sum(compute.values())
            print(f"\n-- op self-times: compute {comp_ns/1e6/steps:.3f}"
                  f" ms/step accounted; async-copy windows "
                  f"{async_ns/1e6/steps:.3f} ms/step (overlapped)")
            width = min(
                90, max(len(n) for n, _ in compute.most_common(top))
            )
            for name, ns in compute.most_common(top):
                print(f"  {name[:width]:<{width}}  {ns/1e6/steps:8.4f} "
                      f"ms/step  x{counts[name]//steps}")


if __name__ == "__main__":
    main()
