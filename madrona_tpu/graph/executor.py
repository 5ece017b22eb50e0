"""Executor: owns SimState and the jitted step functions.

TPU-native equivalent of both reference entry points —
``TaskGraphExecutor`` (CPU, ``include/madrona/mw_cpu.hpp:57-110``) and
``MWCudaExecutor`` (GPU, ``include/madrona/mw_gpu.hpp:118-164``). The
reference needs two backends because device code must be NVRTC-compiled;
here one implementation runs on TPU and CPU alike because the "device
code" is the jitted step function itself, and the NVRTC pipeline + kernel
cache (``src/mw/cuda_exec.cpp:554-1013``) collapse into ``jax.jit`` + the
persistent XLA compilation cache.

``buildLaunchGraph([ids])`` (CUDA-graph composition of taskgraphs,
``src/mw/cuda_exec.cpp:2174-2313``) maps to :meth:`build_launch_graph`,
which composes several taskgraphs into one jitted function.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence

import jax

from ..core.state import SimState, StateManager
from .builder import TaskGraph


class Executor:
    def __init__(
        self,
        sm: StateManager,
        graphs: Dict[str, TaskGraph],
        num_worlds: int,
        seed: int = 0,
        init_fn: Optional[Callable[[StateManager, SimState], SimState]] = None,
        max_entities: Optional[int] = None,
        donate: bool = True,
        jit: bool = True,
    ):
        self.sm = sm
        self.num_worlds = num_worlds
        self.graphs = dict(graphs)
        self._donate = donate
        self._jit = jit

        state = sm.init_state(num_worlds, seed=seed, max_entities=max_entities)
        if init_fn is not None:
            init = lambda s: init_fn(sm, s)
            state = (jax.jit(init) if jit else init)(state)
        self.state = state

        self._step_fns: Dict[Any, Callable] = {}
        for name in self.graphs:
            self._step_fns[(name,)] = self._compile((name,))

    def _compile(self, graph_names: Sequence[str]) -> Callable:
        sm = self.sm
        graphs = [self.graphs[n] for n in graph_names]

        def step_fn(state: SimState, inputs: Dict[str, Any]):
            state = sm.apply_imports(state, inputs)
            for g in graphs:
                state = g.step(state)
            return state, sm.collect_exports(state)

        if not self._jit:
            return step_fn
        return jax.jit(step_fn, donate_argnums=(0,) if self._donate else ())

    # ------------------------------------------------------------------ api

    def build_launch_graph(self, graph_names: Sequence[str]) -> tuple:
        """Compose taskgraphs into one compiled launch (reference
        ``buildLaunchGraph``). Returns a key for :meth:`run`."""
        key = tuple(graph_names)
        if key not in self._step_fns:
            self._step_fns[key] = self._compile(key)
        return key

    def run(self, launch=("step",), inputs: Optional[Dict[str, Any]] = None):
        """One simulation step over all worlds (reference ``run()``).

        Returns the dict of exported tensors (device arrays, zero-copy).
        """
        if isinstance(launch, str):
            launch = (launch,)
        fn = self._step_fns.get(tuple(launch))
        if fn is None:
            fn = self._compile(tuple(launch))
            self._step_fns[tuple(launch)] = fn
        self.state, outputs = fn(self.state, inputs or {})
        return outputs

    def get_exported(self, slot: str):
        """Current value of an export slot (reference ``getExported``)."""
        return self.sm.collect_exports(self.state)[slot]

    # pure-functional access for training loops that scan over steps
    def step_fn(self, launch=("step",)) -> Callable:
        if isinstance(launch, str):
            launch = (launch,)
        key = tuple(launch)
        if key not in self._step_fns:
            self._step_fns[key] = self._compile(key)
        return self._step_fns[key]


# --------------------------------------------------------------------------
# Capacity-tier growth (the re-trace policy)


def _pad_axis1(arr, new_cap, fill):
    import jax.numpy as jnp

    pad = new_cap - arr.shape[1]
    if pad <= 0:
        return arr
    pad_shape = (arr.shape[0], pad) + arr.shape[2:]
    return jnp.concatenate(
        [arr, jnp.full(pad_shape, fill, arr.dtype)], axis=1
    )


def _grow_table(table, new_cap):
    import dataclasses as _dc

    def grow_col(col):
        if isinstance(col, dict):
            return {f: _pad_axis1(a, new_cap, 0) for f, a in col.items()}
        return _pad_axis1(col, new_cap, 0)

    cols = {c: grow_col(v) for c, v in table.columns.items()}
    eid = table.entity_id
    egen = table.entity_gen
    if eid.shape[1] > 0:
        eid = _pad_axis1(eid, new_cap, -1)
        egen = _pad_axis1(egen, new_cap, -1)
    return _dc.replace(
        table, columns=cols, entity_id=eid, entity_gen=egen,
    )


def _overflow_counts(self):
    """Max dropped-row count per archetype since the last check
    (one host sync; [W] maxima)."""
    import numpy as np

    out = {}
    for name, table in self.state.tables.items():
        v = int(np.max(np.asarray(table.overflow)))
        if v:
            out[name] = v
    return out


def _grow_archetype(self, name: str, new_capacity: int):
    """Re-tier one archetype: pad its table to ``new_capacity``, bump the
    registered spec, and drop compiled step fns so the next step
    re-traces at the new tier (the TPU equivalent of the reference's
    commit-on-demand table growth — here growth is an explicit re-jit,
    never a silent remap)."""
    import dataclasses as _dc

    spec = self.sm.archetypes[name]
    if new_capacity <= spec.capacity:
        raise ValueError(
            f"new capacity {new_capacity} <= current {spec.capacity}"
        )
    self.sm.archetypes[name] = _dc.replace(spec, capacity=new_capacity)
    tables = dict(self.state.tables)
    table = _grow_table(tables[name], new_capacity)
    # clear the overflow signal at the new tier
    import jax.numpy as jnp

    table = _dc.replace(
        table, overflow=jnp.zeros_like(table.overflow)
    )
    tables[name] = table
    self.state = _dc.replace(self.state, tables=tables)
    self._step_fns.clear()


def _maybe_grow(self, factor: int = 2):
    """Check overflow signals; re-tier any overflowed archetype so the
    next tier covers capacity + dropped (rounded up by ``factor``).
    Returns {arch: new_capacity}, empty when nothing overflowed. Costs
    one host readback per call; call between steps, NOT inside jit."""
    grown = {}
    for name, count in self.overflow_counts().items():
        spec = self.sm.archetypes[name]
        need = spec.capacity + count
        new_cap = max(spec.capacity, 1)   # capacity-0 archetype: seed 1
        while new_cap < need:
            new_cap *= factor
        self.grow_archetype(name, new_cap)
        grown[name] = new_cap
    return grown


Executor.overflow_counts = _overflow_counts
Executor.grow_archetype = _grow_archetype
Executor.maybe_grow = _maybe_grow
