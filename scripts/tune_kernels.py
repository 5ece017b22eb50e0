#!/usr/bin/env python
"""Per-kernel tuned-config sweep (the PGO loop).

Runs bench.py as a subprocess across a kernel-knob grid on the CURRENT
backend, picks the fastest setting per environment, and rewrites
``madrona_tpu/tuned_configs.json`` — the committed table that
``utils.config.apply_tuned`` / ``bench.py`` replay at startup.

This is the TPU analogue of the reference's profile-guided launch
configs: ``src/mw/cuda_exec.cpp:2115-2203`` replays the fastest
per-kernel block config recorded by a ``scripts/profile.py`` sweep.
Here the knobs are Pallas tile shapes + harness shape (world count,
scan chunk) instead of CUDA block dims.

Usage (on hardware, nothing else running on the chip):
    python scripts/tune_kernels.py [--env escape_room] [--quick]
"""

import argparse
import itertools
import json
import os
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
TABLE = os.path.join(REPO, "madrona_tpu", "tuned_configs.json")

# knob grid per env: (config-field knobs, harness knobs). Values chosen
# around the known-feasible points; Mosaic VMEM cliffs documented in
# PhysicsConfig make wide grids pointless.
GRIDS = {
    "escape_room": {
        "megakernel_tile": [128, 256],
        "megakernel_loop": [False, True],
        "narrowphase_pair_tile": [8],
        "bench_worlds": [1024, 2048, 4096],
        "bench_chunk": [8, 16],
    },
    "hide_seek": {
        "megakernel_tile": [128],
        "narrowphase_pair_tile": [8],
        "bench_worlds": [2048, 8192, 16384],
        "bench_chunk": [8],
    },
    # many-body swept-broadphase tier: window + world count are the
    # effective knobs (reference regime: per-world AABB tree)
    "pile": {
        "broadphase_window": [48, 64, 80],
        "bench_worlds": [64, 128, 256],
        "bench_chunk": [8],
    },
}

QUICK_GRIDS = {
    "escape_room": {
        "megakernel_tile": [128],
        "megakernel_loop": [False],
        "narrowphase_pair_tile": [8],
        "bench_worlds": [2048],
        "bench_chunk": [8],
    },
}


def run_one(env_name, knobs, timeout=900):
    env = dict(os.environ)
    env["MADRONA_TPU_BENCH_ENV"] = env_name
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    for k, v in knobs.items():
        if k == "bench_worlds":
            env["MADRONA_TPU_BENCH_WORLDS"] = str(v)
        elif k == "bench_chunk":
            env["MADRONA_TPU_BENCH_CHUNK"] = str(v)
        else:
            env[f"MADRONA_TPU_{k.upper()}"] = (
                str(int(v)) if isinstance(v, bool) else str(v)
            )
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        return None
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and '"metric"' in line:
            try:
                return json.loads(line)["value"]
            except (ValueError, KeyError):
                pass
    return None


# harness-level knobs (world count / scan chunk) vs kernel knobs: a
# kernel tile that wins only at one world count must not be committed
# as unconditional, so the sweep is two-stage
BENCH_KEYS = ("bench_worlds", "bench_chunk")


def sweep(env_name, grid):
    """Two-stage sweep: (1) kernel knobs at one fixed bench point (the
    grid's first world count/chunk), (2) bench knobs with the stage-1
    kernel winners held fixed. Returns (best, rate, rows) where rows is
    the full per-combo record for the committed sweep artifact."""
    kernel_grid = {k: v for k, v in grid.items() if k not in BENCH_KEYS}
    bench_grid = {k: v for k, v in grid.items() if k in BENCH_KEYS}
    fixed_bench = {k: v[0] for k, v in bench_grid.items()}
    rows = []

    def measure(knobs):
        rate = run_one(env_name, knobs)
        rows.append({"knobs": dict(knobs), "rate": rate})
        tag = " ".join(f"{k}={v}" for k, v in knobs.items())
        print(f"  {tag}: "
              f"{'FAIL' if rate is None else f'{rate:,.0f} steps/s'}",
              flush=True)
        return rate

    kkeys = list(kernel_grid.keys())
    kbest, kbest_rate = None, -1.0
    for combo in itertools.product(*(kernel_grid[k] for k in kkeys)):
        knobs = dict(fixed_bench, **dict(zip(kkeys, combo)))
        rate = measure(knobs)
        if rate is not None and rate > kbest_rate:
            kbest, kbest_rate = knobs, rate
    if kbest is None:
        return None, -1.0, rows

    kernel_winner = {k: v for k, v in kbest.items() if k not in BENCH_KEYS}
    best, best_rate = kbest, kbest_rate
    bkeys = list(bench_grid.keys())
    for combo in itertools.product(*(bench_grid[k] for k in bkeys)):
        bench = dict(zip(bkeys, combo))
        if bench == fixed_bench:
            continue                     # already measured in stage 1
        knobs = dict(kernel_winner, **bench)
        rate = measure(knobs)
        if rate is not None and rate > best_rate:
            best, best_rate = knobs, rate
    return best, best_rate, rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", action="append", default=None)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax

    backend = jax.default_backend()
    backend = "cpu" if backend == "cpu" else "tpu"
    grids = QUICK_GRIDS if args.quick else GRIDS
    envs = args.env or list(grids.keys())

    table = {}
    if os.path.exists(TABLE):
        with open(TABLE) as f:
            table = json.load(f)

    import datetime

    sweep_path = TABLE.replace(".json", "_sweep.json")
    sweep_record = {}
    if os.path.exists(sweep_path):
        with open(sweep_path) as f:
            sweep_record = json.load(f)

    for env_name in envs:
        grid = grids.get(env_name)
        if grid is None:
            print(f"no grid for {env_name}, skipping")
            continue
        print(f"== {env_name} on {backend} ==", flush=True)
        best, rate, rows = sweep(env_name, grid)
        sweep_record.setdefault(env_name, {})[backend] = rows
        if best is None:
            print(f"  all settings failed; table unchanged")
            continue
        table.setdefault(env_name, {})[backend] = best
        table.setdefault("_meta", {}).update(
            generated_by="scripts/tune_kernels.py",
            date=str(datetime.date.today()),
            device=str(jax.devices()[0]),
        )
        print(f"  winner: {best} @ {rate:,.0f} steps/s")

    with open(TABLE, "w") as f:
        json.dump(table, f, indent=2)
        f.write("\n")
    # full per-combo record alongside the table (auditability: every
    # committed winner traces to its measured alternatives)
    with open(sweep_path, "w") as f:
        json.dump(sweep_record, f, indent=2)
        f.write("\n")
    print(f"wrote {TABLE} and {sweep_path}")


if __name__ == "__main__":
    main()
