#!/usr/bin/env python
"""Run the whole benchmark matrix as sequential bench.py subprocesses.

One row per configuration worth tracking round-over-round; each row is a
fresh interpreter so compile caches persist (enable_compile_cache) but
device state does not leak between configs. Prints a markdown table and
writes the raw JSON lines to ``bench_matrix.json``.

Usage:  python scripts/bench_matrix.py [--only substr] [--quick]
        (run on the TPU host; never concurrently with CPU pytest jobs —
        tunnel dispatch starvation reads ~3x low, see ROADMAP.md)
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (label, env-overrides). Rows ordered cheap-first so a flaky tunnel
# still yields the headline numbers early.
MATRIX = [
    ("escape_room split", {}),
    # the fused whole-step kernel fits the 16M scoped VMEM at tile 128
    # only with hh pair chunking (chunk 2); measured 1.007M steps/s —
    # the split path (broadphase+contacts+solver kernels) stays faster
    ("escape_room fused", {
        "MADRONA_TPU_MEGAKERNEL_FUSED": "1",
        "MADRONA_TPU_FUSED_PAIR_CHUNK": "2",
    }),
    ("escape_room split chunk8", {"MADRONA_TPU_BENCH_CHUNK": "8"}),
    ("hide_seek 16k", {"MADRONA_TPU_BENCH_ENV": "hide_seek"}),
    ("hide_seek 16k fused", {
        "MADRONA_TPU_BENCH_ENV": "hide_seek",
        "MADRONA_TPU_MEGAKERNEL_FUSED": "1",
    }),
    # SAT over unique edge DIRECTIONS (boxes: 144 -> 9 axis combos) —
    # round-4 VERDICT item 3: bench it, flip the default if it wins
    ("escape_room split edge_dirs", {"MADRONA_TPU_SAT_TIER": "edge_dirs"}),
    ("hide_seek 16k edge_dirs", {
        "MADRONA_TPU_BENCH_ENV": "hide_seek",
        "MADRONA_TPU_SAT_TIER": "edge_dirs",
    }),
    ("pile 256-body", {"MADRONA_TPU_BENCH_ENV": "pile"}),
    ("hs_pixels 16 cullK8", {
        "MADRONA_TPU_BENCH_ENV": "hide_seek_pixels",
        "MADRONA_TPU_BENCH_TLAS_K": "8",
    }),
    ("hs_pixels 64 cullK8", {
        "MADRONA_TPU_BENCH_ENV": "hide_seek_pixels",
        "MADRONA_TPU_BENCH_TLAS_K": "8",
        "MADRONA_TPU_BENCH_RENDER_SIZE": "64",
        "MADRONA_TPU_BENCH_WORLDS": "256",
    }),
    ("hs_pixels 64 cullK8 matmul", {
        "MADRONA_TPU_BENCH_ENV": "hide_seek_pixels",
        "MADRONA_TPU_BENCH_TLAS_K": "8",
        "MADRONA_TPU_BENCH_RENDER_SIZE": "64",
        "MADRONA_TPU_BENCH_WORLDS": "256",
        "MADRONA_TPU_TRACER": "matmul",
    }),
    ("hs_pixels 16 cullK8 matmul", {
        "MADRONA_TPU_BENCH_ENV": "hide_seek_pixels",
        "MADRONA_TPU_BENCH_TLAS_K": "8",
        "MADRONA_TPU_TRACER": "matmul",
    }),
    ("hs_pixels 64 blas", {
        "MADRONA_TPU_BENCH_ENV": "hide_seek_pixels",
        "MADRONA_TPU_BENCH_RENDER_TIER": "blas",
        "MADRONA_TPU_BENCH_RENDER_SIZE": "64",
        "MADRONA_TPU_BENCH_WORLDS": "256",
    }),
    ("hs_pixels 16 blas", {
        "MADRONA_TPU_BENCH_ENV": "hide_seek_pixels",
        "MADRONA_TPU_BENCH_RENDER_TIER": "blas",
        "MADRONA_TPU_BENCH_RENDER_SIZE": "16",
        "MADRONA_TPU_BENCH_WORLDS": "256",
    }),
]

# escape-room tuning sweeps (--sweep): VMEM pair-chunk knob +
# world-count scaling at the fused config
for _pc in (2, 3, 4):
    MATRIX.append((f"escape_room fused pc{_pc}", {
        "MADRONA_TPU_MEGAKERNEL_FUSED": "1",
        "MADRONA_TPU_FUSED_PAIR_CHUNK": str(_pc),
    }))
for _w in (2048, 4096):
    MATRIX.append((f"escape_room fused w{_w}", {
        "MADRONA_TPU_MEGAKERNEL_FUSED": "1",
        "MADRONA_TPU_BENCH_WORLDS": str(_w),
    }))

QUICK = {"escape_room split", "escape_room fused", "hide_seek 16k fused"}
SWEEP_PREFIXES = ("escape_room fused pc", "escape_room fused w")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="run rows whose label contains this substring")
    ap.add_argument("--quick", action="store_true",
                    help="headline rows only")
    ap.add_argument("--sweep", action="store_true",
                    help="include the tuning sweeps (pair-chunk, worlds)")
    ap.add_argument("--timeout", type=int, default=1800)
    args = ap.parse_args()

    # merge mode: a partial run (--only/--quick) must not clobber rows
    # from the last full run — preload and replace by label
    path = os.path.join(REPO, "bench_matrix.json")
    prior = []
    if os.path.exists(path):
        with open(path) as f:
            prior = [json.loads(l) for l in f if l.strip()]
    run_labels = {
        label for label, _ in MATRIX
        if (not args.only or args.only in label)
        and (not args.quick or label in QUICK)
        and (args.sweep or args.only or not label.startswith(SWEEP_PREFIXES))
    }
    rows = [r for r in prior if r["label"] not in run_labels]
    for label, extra in MATRIX:
        if args.only and args.only not in label:
            continue
        if args.quick and label not in QUICK:
            continue
        if (not args.sweep and not args.only
                and label.startswith(SWEEP_PREFIXES)):
            continue
        env = dict(os.environ)
        env.update(extra)
        env.setdefault("PYTHONPATH", REPO)
        t0 = time.time()
        try:
            out = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py")],
                env=env, capture_output=True, text=True,
                timeout=args.timeout, cwd=REPO,
            )
            line = [l for l in out.stdout.splitlines()
                    if l.startswith("{")]
            try:
                rec = json.loads(line[-1]) if line else {
                    "error": (out.stderr or out.stdout)[-500:]}
            except json.JSONDecodeError:
                rec = {"error": f"unparseable output: {line[-1][:300]}"}
        except subprocess.TimeoutExpired:
            rec = {"error": f"timeout {args.timeout}s"}
        rec["label"] = label
        rec["wall_s"] = round(time.time() - t0, 1)
        rows.append(rec)
        # flush incrementally: a later row's failure must not lose
        # hours of completed TPU rows
        with open(path, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        val = rec.get("value", rec.get("error", "?"))
        print(f"  {label:28s} -> {val}", flush=True)

    print("\n| config | env-steps/s | vs 1M target | wall s |")
    print("|---|---|---|---|")
    for r in rows:
        if "value" in r:
            print(f"| {r['label']} | {r['value']:,.0f} | "
                  f"{r.get('vs_baseline', 0):.3f} | {r.get('wall_s', '-')} |")
        else:
            print(f"| {r['label']} | ERROR: {r['error'][:80]} | | "
                  f"{r.get('wall_s', '-')} |")


if __name__ == "__main__":
    main()
