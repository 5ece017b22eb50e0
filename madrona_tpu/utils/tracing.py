"""Tracing / profiling hooks.

TPU-native equivalent of the reference's three tracing mechanisms
(SURVEY.md §5.1): host event logging (``include/madrona/tracing.hpp``),
the on-device event ring (``mw_gpu/tracing.hpp``), and launch-graph
timing (``cuda_exec.cpp:2427-2525``). The translations:

  * per-node device visibility -> ``jax.named_scope`` annotations emitted
    by the taskgraph around every node (shows up per-node in XProf /
    ``jax.profiler.trace`` timelines; no event ring needed because the
    compiler owns scheduling),
  * host events -> :class:`HostEventLog` (monotonic-clock event list,
    dumped to JSON like the reference's per-thread trace files),
  * launch-graph timing -> :func:`time_step` (block_until_ready timing
    harness reporting per-step stats like MWCudaExecutor's destructor
    printout).

Opt-in like the reference's MADRONA_TRACING: set ``MADRONA_TPU_TRACING=1``
to enable host-event capture globally.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Callable, List, Optional, Tuple

import jax

ENABLED = os.environ.get("MADRONA_TPU_TRACING", "0") not in ("0", "")


class HostEventLog:
    """Reference HostEventLogging: (event, t_ns) pairs per process."""

    def __init__(self):
        self.events: List[Tuple[str, int]] = []

    def log(self, event: str):
        self.events.append((event, time.perf_counter_ns()))

    @contextlib.contextmanager
    def span(self, name: str):
        self.log(f"{name}:start")
        try:
            yield
        finally:
            self.log(f"{name}:end")

    def dump(self, path: Optional[str] = None) -> str:
        path = path or os.environ.get(
            "MADRONA_TPU_TRACE_NAME", "madrona_tpu_trace"
        ) + ".json"
        with open(path, "w") as f:
            json.dump(self.events, f)
        return path


GLOBAL_LOG = HostEventLog()


def node_scope(name: str):
    """Annotation wrapped around every taskgraph node at trace time —
    the per-node label surfaces in XProf exactly where the reference's
    device event ring recorded node start/finish."""
    return jax.named_scope(name)


def time_step(step_fn: Callable, state, inputs, iters: int = 20,
              warmup: int = 2):
    """Launch-graph-style timing: mean/min ms per step after warmup."""
    out = None
    for _ in range(warmup):
        state_out = step_fn(state, inputs)
        out = state_out
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = step_fn(state, inputs)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return {
        "mean_ms": 1e3 * sum(times) / len(times),
        "min_ms": 1e3 * min(times),
        "iters": iters,
    }


@contextlib.contextmanager
def xprof_trace(logdir: str):
    """jax.profiler.trace wrapper (view with xprof/tensorboard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
