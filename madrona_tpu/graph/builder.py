"""Taskgraph builder: stage ECS systems, compile to one XLA step function.

TPU-native equivalent of the reference taskgraph
(``include/madrona/taskgraph_builder.hpp:22-219``,
``src/core/taskgraph.cpp``, device twin ``src/mw/device/taskgraph.cpp``).
The key design translation (SURVEY.md §7): the reference *interprets* the
node list at runtime — CPU serially per world, GPU inside a megakernel with
dynamic work-stealing. Here the node list is applied **once at trace time**
to build a single jitted function; XLA then owns scheduling/fusion, which
is the TPU replacement for both the megakernel interpreter and the CUDA
launch graph (``buildLaunchGraph``, ``src/mw/cuda_exec.cpp:2174-2313``).

Node types (mirroring ``include/madrona/taskgraph_builder.hpp:128-219``):
  * parallel_for  — ParallelForNode: per-entity system over an archetype
  * for_worlds    — singleton-archetype ParallelFor: per-world system
  * clear_tmp     — ClearTmpNode
  * sort          — SortArchetypeNode (per-world key sort; the WorldID sort
                    of the GPU backend is a no-op here by construction)
  * compact       — CompactArchetypeNode
  * custom        — full-state transform (escape hatch; replaces the
                    reference's CustomParallelForNode warp-cooperative path)

RNG discipline: each node gets ``node_key = split(step_key, node_id)``;
each parallel_for invocation gets ``split(node_key[w], row)``. This gives
every (step, node, world, row) a unique, reproducible Threefry key — same
counter-based philosophy as the reference (include/madrona/rand.hpp), with
the split tree made explicit.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core import archetype as _arch
from ..core import entity_store as _estore
from ..core.state import SimState, StateManager
from ..utils import rng as _rng


@dataclasses.dataclass
class Ctx:
    """Per-invocation facade handed to systems (reference ``Context``,
    ``include/madrona/context.hpp:24-139``). Fields are traced values."""

    world_id: Any
    key: Any                      # threefry key for this invocation
    singletons: Dict[str, Any]    # read-only per-world singleton values
    row: Any = None               # row index (parallel_for only)
    entity: Any = None            # [2] int32 (gen, id) of this row
    is_valid: Any = None          # bool — row liveness (non-fixed archetypes)

    def singleton(self, name: str):
        return self.singletons[name]


@dataclasses.dataclass
class _Node:
    kind: str
    name: str
    deps: Tuple[int, ...]
    payload: dict


class TaskGraphID:
    """Opaque node handle (reference ``TaskGraphNodeID``)."""

    __slots__ = ("idx",)

    def __init__(self, idx: int):
        self.idx = idx


class TaskGraphBuilder:
    def __init__(self, sm: StateManager, name: str = "step"):
        self.sm = sm
        self.name = name
        self.nodes: List[_Node] = []

    # ------------------------------------------------------------------ api

    def _add(self, kind, name, deps, **payload) -> TaskGraphID:
        deps = tuple(d.idx for d in deps or ())
        for d in deps:
            if d >= len(self.nodes):
                raise ValueError("dependency on not-yet-added node")
        self.nodes.append(_Node(kind, name, deps, payload))
        return TaskGraphID(len(self.nodes) - 1)

    def parallel_for(
        self,
        fn: Callable,
        arch: str,
        read: Sequence[str],
        write: Sequence[str],
        deps: Sequence[TaskGraphID] = (),
        read_singletons: Sequence[str] = (),
        name: Optional[str] = None,
    ) -> TaskGraphID:
        """ParallelForNode: ``fn(ctx, *read_values) -> write_values``.

        ``fn`` sees one entity's component values (vmapped over rows then
        worlds); it returns the new values for ``write`` (a single value if
        one write, else a tuple in order). Rows beyond num_rows keep their
        old values automatically.
        """
        return self._add(
            "parallel_for",
            name or getattr(fn, "__name__", "parallel_for"),
            deps,
            fn=fn,
            arch=arch,
            read=tuple(read),
            write=tuple(write),
            read_singletons=tuple(read_singletons),
        )

    def for_worlds(
        self,
        fn: Callable,
        read: Sequence[str] = (),
        write: Sequence[str] = (),
        deps: Sequence[TaskGraphID] = (),
        name: Optional[str] = None,
    ) -> TaskGraphID:
        """Per-world system over singletons: ``fn(ctx, *read) -> write``.

        The reference expresses this as a ParallelFor over a one-row-per-
        world singleton archetype; here it is vmapped over the worlds axis.
        """
        return self._add(
            "for_worlds",
            name or getattr(fn, "__name__", "for_worlds"),
            deps,
            fn=fn,
            read=tuple(read),
            write=tuple(write),
        )

    def clear_tmp(self, arch: str, deps: Sequence[TaskGraphID] = ()):
        return self._add("clear_tmp", f"clear_tmp:{arch}", deps, arch=arch)

    def sort(
        self,
        arch: str,
        key_comp: Optional[str] = None,
        key_fn: Optional[Callable] = None,
        deps: Sequence[TaskGraphID] = (),
    ) -> TaskGraphID:
        """SortArchetypeNode: stable per-world sort of live rows by key.

        ``key_comp`` names a scalar int/float component; or ``key_fn(table
        columns dict) -> [W, C] keys``. Dead rows sort to the end.
        """
        return self._add(
            "sort", f"sort:{arch}", deps, arch=arch, key_comp=key_comp,
            key_fn=key_fn,
        )

    def compact(self, arch: str, deps: Sequence[TaskGraphID] = ()):
        return self._add("compact", f"compact:{arch}", deps, arch=arch)

    def custom(
        self,
        fn: Callable[[StateManager, SimState, Any], SimState],
        deps: Sequence[TaskGraphID] = (),
        name: Optional[str] = None,
    ) -> TaskGraphID:
        """Full-state node: ``fn(sm, state, node_key) -> state``."""
        return self._add(
            "custom", name or getattr(fn, "__name__", "custom"), deps, fn=fn
        )

    # ------------------------------------------------------------- compile

    def build(self) -> "TaskGraph":
        """Topo-validate and freeze (reference TaskGraphBuilder::build).

        Insertion order is already topological because deps may only point
        backwards; we keep it (stable, matches reference's sorted order
        semantics for equal priorities).
        """
        return TaskGraph(self.sm, self.name, list(self.nodes))


class TaskGraphManager:
    """Hands out named builders so one app declares several taskgraphs
    (reference ``TaskGraphManager::init(enum)``,
    ``include/madrona/taskgraph_builder.hpp:93-108`` — apps build e.g.
    separate init/step/render graphs and select one per ``run()``).

    Usage in an env's ``setup_graphs(self, mgr)``::

        step = mgr.init("step")
        step.parallel_for(...)
        render = mgr.init("render")
        render.custom(...)

    ``build_all()`` freezes every declared graph; the Executor takes the
    resulting dict and ``run(("step", "render"))`` composes them into one
    launch (the CUDA-graph ``buildLaunchGraph`` analogue).
    """

    def __init__(self, sm: StateManager):
        self.sm = sm
        self._builders: "dict[str, TaskGraphBuilder]" = {}

    def init(self, name: str) -> TaskGraphBuilder:
        if name in self._builders:
            raise ValueError(f"taskgraph {name!r} already declared")
        b = TaskGraphBuilder(self.sm, name)
        self._builders[name] = b
        return b

    def build_all(self) -> "dict[str, TaskGraph]":
        if not self._builders:
            raise ValueError("no taskgraphs declared")
        return {n: b.build() for n, b in self._builders.items()}


class TaskGraph:
    """A frozen node list, applied functionally to a SimState."""

    def __init__(self, sm: StateManager, name: str, nodes: List[_Node]):
        self.sm = sm
        self.name = name
        self.nodes = nodes

    def step(self, state: SimState) -> SimState:
        """Apply every node once. Pure; wrap in jax.jit at the call site
        (the executor does)."""
        step_key = _rng.split_i(
            state.rng, jnp.broadcast_to(state.step.astype(jnp.uint32), state.rng.shape[:-1])
        )  # [W, 2]
        for node_id, node in enumerate(self.nodes):
            node_key = _rng.split_i(
                step_key, jnp.full(step_key.shape[:-1], node_id, jnp.uint32)
            )
            # per-node annotation: surfaces in XProf timelines where the
            # reference's device tracing ring logged node start/finish
            with jax.named_scope(f"{self.name}.{node.name}"):
                state = self._run_node(node, state, node_key)
        return dataclasses.replace(state, step=state.step + 1)

    # ------------------------------------------------------------- internals

    def _run_node(self, node: _Node, state: SimState, node_key) -> SimState:
        kind = node.kind
        if kind == "parallel_for":
            return self._run_parallel_for(node, state, node_key)
        if kind == "for_worlds":
            return self._run_for_worlds(node, state, node_key)
        if kind == "clear_tmp":
            tables = dict(state.tables)
            tables[node.payload["arch"]] = _arch.clear(
                tables[node.payload["arch"]]
            )
            return dataclasses.replace(state, tables=tables)
        if kind == "sort":
            return self._run_sort(node, state)
        if kind == "compact":
            return self._run_compact(node, state)
        if kind == "custom":
            return node.payload["fn"](self.sm, state, node_key)
        raise ValueError(f"unknown node kind {kind!r}")

    def _run_parallel_for(self, node: _Node, state: SimState, node_key):
        p = node.payload
        arch_name = p["arch"]
        spec = self.sm.archetypes[arch_name]
        table = state.tables[arch_name]
        cap = spec.capacity
        w = table.num_rows.shape[0]
        fn = p["fn"]

        rows = jnp.arange(cap, dtype=jnp.int32)
        world_ids = jnp.arange(w, dtype=jnp.int32)
        mask = _arch.row_mask(table, cap)  # [W, C]
        read_vals = [table.columns[c] for c in p["read"]]
        singles = {s: state.singletons[s] for s in p["read_singletons"]}

        if spec.no_entities:
            ents = jnp.broadcast_to(
                jnp.full((2,), -1, jnp.int32), (w, cap, 2)
            )
        else:
            ents = jnp.stack([table.entity_gen, table.entity_id], axis=-1)

        def per_row(world_id, wkey, singles_w, row, ent, valid, *comps):
            ctx = Ctx(
                world_id=world_id,
                key=_rng.split_i(wkey, row.astype(jnp.uint32)),
                singletons=singles_w,
                row=row,
                entity=ent,
                is_valid=valid,
            )
            out = fn(ctx, *comps)
            if len(p["write"]) == 1 and not isinstance(out, tuple):
                out = (out,)
            return out

        inner = jax.vmap(
            per_row, in_axes=(None, None, None, 0, 0, 0) + (0,) * len(read_vals)
        )
        outer = jax.vmap(
            inner, in_axes=(0, 0, 0, None, 0, 0) + (0,) * len(read_vals)
        )
        outs = outer(world_ids, node_key, singles, rows, ents, mask, *read_vals)

        tables = dict(state.tables)
        new_cols = dict(table.columns)
        for comp_name, new_val in zip(p["write"], outs):
            old = table.columns[comp_name]
            if spec.fixed_rows:
                new_cols[comp_name] = _tree_cast(new_val, old)
            else:
                new_cols[comp_name] = _tree_where(mask, _tree_cast(new_val, old), old)
        tables[arch_name] = dataclasses.replace(table, columns=new_cols)
        return dataclasses.replace(state, tables=tables)

    def _run_for_worlds(self, node: _Node, state: SimState, node_key):
        p = node.payload
        fn = p["fn"]
        w = state.rng.shape[0]
        world_ids = jnp.arange(w, dtype=jnp.int32)
        read_vals = [state.singletons[s] for s in p["read"]]
        all_singles = state.singletons

        def per_world(world_id, wkey, singles_w, *vals):
            ctx = Ctx(world_id=world_id, key=wkey, singletons=singles_w)
            out = fn(ctx, *vals)
            if len(p["write"]) == 1 and not isinstance(out, tuple):
                out = (out,)
            return out

        outs = jax.vmap(per_world)(world_ids, node_key, all_singles, *read_vals)
        singles = dict(state.singletons)
        for name, new_val in zip(p["write"], outs):
            singles[name] = _tree_cast(new_val, singles[name])
        return dataclasses.replace(state, singletons=singles)

    def _run_sort(self, node: _Node, state: SimState):
        p = node.payload
        arch_name = p["arch"]
        table = state.tables[arch_name]
        spec = self.sm.archetypes[arch_name]
        cap = spec.capacity
        mask = _arch.row_mask(table, cap)
        if p["key_comp"] is not None:
            keys = table.columns[p["key_comp"]]
        else:
            keys = p["key_fn"](table.columns)
        keys = keys.astype(jnp.float32) if jnp.issubdtype(keys.dtype, jnp.floating) else keys
        big = (
            jnp.asarray(jnp.inf, keys.dtype)
            if jnp.issubdtype(keys.dtype, jnp.floating)
            else jnp.iinfo(keys.dtype).max
        )
        masked = jnp.where(mask, keys, big)
        order = jnp.argsort(masked, axis=1, stable=True).astype(jnp.int32)
        table = _arch.gather_rows(table, order)
        tables = dict(state.tables)
        tables[arch_name] = table
        state = dataclasses.replace(state, tables=tables)
        if not spec.no_entities:
            store = _estore.update_rows(
                state.entities, table.entity_id, table.entity_gen,
                _arch.row_mask(table, cap),
            )
            state = dataclasses.replace(state, entities=store)
        return state

    def _run_compact(self, node: _Node, state: SimState):
        """CompactArchetypeNode: stable live-first reorder. The dense-
        append invariant plus destroy_entities (ops.lifecycle, which
        compacts inline) keep tables contiguous already, so this is
        normally an idempotent pass — kept executable for API parity."""
        arch_name = node.payload["arch"]
        spec = self.sm.archetypes[arch_name]
        table = state.tables[arch_name]
        cap = spec.capacity
        live = _arch.row_mask(table, cap)
        order = jnp.argsort(~live, axis=1, stable=True).astype(jnp.int32)
        table = _arch.gather_rows(table, order)
        tables = dict(state.tables)
        tables[arch_name] = table
        state = dataclasses.replace(state, tables=tables)
        if not spec.no_entities:
            store = _estore.update_rows(
                state.entities, table.entity_id, table.entity_gen,
                _arch.row_mask(table, cap),
            )
            state = dataclasses.replace(state, entities=store)
        return state


def _tree_where(mask, new, old):
    def w(n, o):
        m = mask.reshape(mask.shape + (1,) * (n.ndim - mask.ndim))
        return jnp.where(m, n, o)

    return jax.tree_util.tree_map(w, new, old)


def _tree_cast(new, old):
    return jax.tree_util.tree_map(
        lambda n, o: jnp.asarray(n, o.dtype), new, old
    )
