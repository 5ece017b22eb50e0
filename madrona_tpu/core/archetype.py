"""Archetype tables: struct-of-arrays storage with a leading worlds axis.

TPU-native equivalent of ``Table`` (``include/madrona/table.hpp:25-56``,
``src/common/table.cpp``) and of the GPU backend's global
worldOffsets/worldCounts layout (``src/mw/device/state.cpp:176-258``).
Madrona-GPU keeps one table for all worlds and radix-sorts rows by WorldID
every step so each world's rows are contiguous; here the worlds axis is the
*leading array dimension*, so rows are world-contiguous **by construction**
and the WorldID sort node compiles to nothing.

Rows [0, num_rows[w]) of world w are live and dense. All mutation is
functional: helpers return new Table pytrees.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from .component import ArchetypeSpec, ComponentSpec


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Table:
    """One archetype's storage. A pytree of arrays.

    columns:    comp name -> array [W, C, ...] (or dict of field arrays)
    entity_id:  [W, C] int32 — id of the entity in each row (-1 if none)
    entity_gen: [W, C] int32 — generation of that entity
    num_rows:   [W] int32    — live row count per world
    overflow:   [W] int32    — rows dropped by appends since the last
                 host check (the re-trace signal: Executor.maybe_grow
                 reads it and re-jits at a larger capacity tier — the
                 TPU answer to the reference's VA-mapped table growth,
                 src/mw/device/state.cpp:29-60)
    """

    columns: Dict[str, Any]
    entity_id: jax.Array
    entity_gen: jax.Array
    num_rows: jax.Array
    overflow: jax.Array


def make_table(
    spec: ArchetypeSpec,
    comp_specs: Dict[str, ComponentSpec],
    num_worlds: int,
) -> Table:
    cap = spec.capacity
    lead = (num_worlds, cap)
    columns = {
        cname: comp_specs[cname].zeros(lead) for cname in spec.components
    }
    if spec.no_entities:
        eid = jnp.full((num_worlds, 0), -1, jnp.int32)
        egen = jnp.full((num_worlds, 0), -1, jnp.int32)
    else:
        eid = jnp.full(lead, -1, jnp.int32)
        egen = jnp.full(lead, -1, jnp.int32)
    if spec.fixed_rows:
        nrows = jnp.full((num_worlds,), cap, jnp.int32)
    else:
        nrows = jnp.zeros((num_worlds,), jnp.int32)
    return Table(
        columns=columns, entity_id=eid, entity_gen=egen, num_rows=nrows,
        overflow=jnp.zeros((num_worlds,), jnp.int32),
    )


def row_mask(table: Table, capacity: int) -> jax.Array:
    """[W, C] bool — True for live rows."""
    idx = jnp.arange(capacity, dtype=jnp.int32)[None, :]
    return idx < table.num_rows[:, None]


def clear(table: Table) -> Table:
    """Reset live-row counts to zero (ClearTmpNode equivalent,
    ``include/madrona/taskgraph_builder.hpp:150``). Data is left in place —
    reads are always masked by num_rows."""
    return dataclasses.replace(
        table, num_rows=jnp.zeros_like(table.num_rows)
    )


def append_rows(table: Table, values: Dict[str, Any], append_mask) -> Table:
    """Append one candidate row per world where ``append_mask`` is set.

    values[comp] has shape [W, ...] (one row per world). Rows land at each
    world's current num_rows. Overflow beyond capacity is dropped silently
    (the reference would grow the table; here the schema capacity is the
    contract — callers size temporaries for the worst case, as the
    reference's apps size ``maxDynamicObjects``).
    """
    w = table.num_rows.shape[0]
    cap = _capacity_of(table)
    ok = append_mask & (table.num_rows < cap)
    dest = jnp.where(ok, table.num_rows, cap)  # OOB -> dropped
    widx = jnp.arange(w)

    def scatter_col(col, val):
        return col.at[widx, dest].set(val, mode="drop")

    new_cols = {}
    for cname, col in table.columns.items():
        if isinstance(col, dict):
            new_cols[cname] = {
                f: scatter_col(a, values[cname][f]) for f, a in col.items()
            }
        else:
            new_cols[cname] = scatter_col(col, values[cname])
    dropped = append_mask & ~ok
    return dataclasses.replace(
        table,
        columns=new_cols,
        num_rows=table.num_rows + ok.astype(jnp.int32),
        overflow=table.overflow + dropped.astype(jnp.int32),
    )


def append_many(table: Table, values: Dict[str, Any], valid) -> Table:
    """Bulk append: values[comp] is [W, K, ...]; valid is [W, K] bool.

    Valid candidates are compacted (stable order) and written after each
    world's existing rows — the TPU-native replacement for per-thread
    ``makeTemporary`` calls: systems *emit* candidate rows, and this
    prefix-sum scatter packs them (analogous to the reference's
    atomic-append into tmp archetypes, but deterministic).
    """
    w, k = valid.shape
    cap = _capacity_of(table)
    valid_i = valid.astype(jnp.int32)
    # Exclusive prefix sum along K: position of each valid candidate.
    offs = jnp.cumsum(valid_i, axis=1) - valid_i
    dest = table.num_rows[:, None] + offs
    ok = valid & (dest < cap)
    dest_safe = jnp.where(ok, dest, cap)  # OOB -> dropped by mode="drop"
    widx = jnp.broadcast_to(jnp.arange(w)[:, None], (w, k))

    def scatter_col(col, val):
        return col.at[widx, dest_safe].set(val, mode="drop")

    new_cols = {}
    for cname, col in table.columns.items():
        if isinstance(col, dict):
            new_cols[cname] = {
                f: scatter_col(a, values[cname][f]) for f, a in col.items()
            }
        else:
            new_cols[cname] = scatter_col(col, values[cname])
    new_counts = jnp.minimum(
        table.num_rows + jnp.sum(ok.astype(jnp.int32), axis=1), cap
    )
    dropped = jnp.sum((valid & ~ok).astype(jnp.int32), axis=1)
    return dataclasses.replace(
        table, columns=new_cols, num_rows=new_counts,
        overflow=table.overflow + dropped,
    )


def gather_rows(table: Table, order) -> Table:
    """Reorder rows of every column by ``order`` ([W, C] int32 permutation).

    Used by sort/compact nodes (SortArchetypeNode / CompactArchetypeNode,
    ``include/madrona/taskgraph_builder.hpp:170-219``).
    """
    w = order.shape[0]
    widx = jnp.arange(w)[:, None]

    def g(col):
        return col[widx, order]

    new_cols = {}
    for cname, col in table.columns.items():
        if isinstance(col, dict):
            new_cols[cname] = {f: g(a) for f, a in col.items()}
        else:
            new_cols[cname] = g(col)
    eid = table.entity_id
    egen = table.entity_gen
    if eid.shape[1] > 0:
        eid = g(eid)
        egen = g(egen)
    return dataclasses.replace(
        table, columns=new_cols, entity_id=eid, entity_gen=egen
    )


def _capacity_of(table: Table) -> int:
    any_col = next(iter(table.columns.values()))
    if isinstance(any_col, dict):
        any_col = next(iter(any_col.values()))
    return any_col.shape[1]
