"""Multi-host runtime: jax.distributed glue + weak-scaling harness.

The reference has no scale-out (SURVEY.md §5.8 — single process, single
GPU); the TPU build's scale axis is worlds sharded over a pod slice.
This module is the runner glue: process initialization, the global
worlds mesh, per-host world allocation, and a weak-scaling measurement
used by the BASELINE.json target (>=90% efficiency to v5e-16). World
independence means a step involves ZERO collectives — scaling loss can
only come from compilation/dispatch skew, which is what the harness
measures.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import numpy as np

from . import mesh as _mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """jax.distributed.initialize wrapper.

    With explicit arguments, initializes that exact cluster. With NO
    arguments, defers to jax's own environment auto-detection (TPU pod
    metadata / cluster env vars) — and stays a no-op on plain
    single-process hosts where auto-detection finds no cluster."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif num_processes is None and coordinator_address is None:
        try:
            # jax auto-detects pods (GCE metadata, SLURM, etc.); raises
            # RuntimeError when no cluster environment is present
            jax.distributed.initialize()
        except (RuntimeError, ValueError):
            pass                       # single-process: nothing to do


def global_mesh(axis: str = _mesh.WORLD_AXIS):
    """Worlds mesh over every device of every host."""
    return _mesh.make_mesh(jax.devices(), axis=axis)


def worlds_per_host(num_worlds_global: int) -> int:
    n = jax.process_count()
    if num_worlds_global % n:
        raise ValueError(
            f"{num_worlds_global} worlds not divisible by {n} hosts"
        )
    return num_worlds_global // n


def weak_scaling(
    make_step: Callable[[int], Callable],
    worlds_per_device: int,
    device_counts,
    steps: int = 20,
) -> dict:
    """Throughput at each device count with constant per-device work.

    make_step(num_worlds) -> (state, inputs, fn) where fn(state, inputs)
    -> state-like (blocked on). Returns per-count steps/s and efficiency
    relative to the smallest count."""
    results = {}
    for n in device_counts:
        if n > len(jax.devices()):
            break
        w = worlds_per_device * n
        state, inputs, fn = make_step(w)
        out = fn(state, inputs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(out, inputs) if not isinstance(out, tuple) else fn(
                out[0], inputs
            )
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        results[n] = steps * w / dt
    if results:
        base_n = min(results)
        base = results[base_n] / base_n
        return {
            "steps_per_sec": results,
            "efficiency": {
                n: (v / n) / base for n, v in results.items()
            },
        }
    return {"steps_per_sec": {}, "efficiency": {}}
