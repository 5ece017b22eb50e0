"""Entity destruction + table compaction.

TPU-native equivalent of ``Context::destroyEntityNow`` +
``RecycleEntitiesNode`` (``include/madrona/context.hpp``,
``src/mw/device/include/madrona/taskgraph.hpp:206-268``): destroyed
entities return their ids to the store's free list (generation bump), and
the archetype table compacts live rows to the front in one stable
gather — preserving the engine-wide dense-append invariant that
``parallel_for`` masking relies on. The reference interleaves deletion
marks with a device sort; here destruction is one masked-scatter +
argsort(stable) pass, batched over worlds.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core import archetype as _arch
from ..core import entity_store as _estore
from ..core.component import Entity
from ..core.state import SimState, StateManager


def destroy_entities(
    sm: StateManager, state: SimState, arch: str, entities, valid
) -> SimState:
    """Destroy up to K entities per world in archetype ``arch``.

    entities: [W, K, 2] (gen, id); valid: [W, K] bool. Invalid/stale
    handles are ignored (generation-checked like the reference)."""
    spec = sm.archetypes[arch]
    if spec.fixed_rows:
        raise ValueError(f"archetype {arch!r} has fixed rows")
    table = state.tables[arch]
    cap = spec.capacity
    w = valid.shape[0]
    store = state.entities

    e_arch, e_row, ok = _estore.lookup(store, jnp.asarray(entities))
    ok = ok & jnp.asarray(valid, bool) & (e_arch == sm.arch_index(arch))

    # mark dead rows
    widx = jnp.broadcast_to(jnp.arange(w)[:, None], ok.shape)
    safe_row = jnp.where(ok, e_row, cap)
    dead = jnp.zeros((w, cap + 1), bool).at[widx, safe_row].set(
        True, mode="drop"
    )[:, :cap]
    live = _arch.row_mask(table, cap) & (~dead)

    # stable compaction: live rows first, original order preserved
    order = jnp.argsort(~live, axis=1, stable=True).astype(jnp.int32)
    table = _arch.gather_rows(table, order)
    new_counts = jnp.sum(live.astype(jnp.int32), axis=1)
    table = dataclasses.replace(table, num_rows=new_counts)
    # wipe entity ids in now-dead tail slots
    tail = jnp.arange(cap)[None, :] >= new_counts[:, None]
    table = dataclasses.replace(
        table,
        entity_id=jnp.where(tail, -1, table.entity_id),
        entity_gen=jnp.where(tail, -1, table.entity_gen),
    )

    # free ids + remap surviving rows
    store = _estore.free(store, jnp.asarray(entities), ok)
    store = _estore.update_rows(
        store, table.entity_id, table.entity_gen,
        _arch.row_mask(table, cap),
    )

    tables = dict(state.tables)
    tables[arch] = table
    return dataclasses.replace(state, tables=tables, entities=store)
