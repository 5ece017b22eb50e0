"""Entity ID management: generations, Entity -> (archetype, row) lookup.

TPU-native equivalent of ``EntityStore``/``IDMap``
(``include/madrona/state.hpp:50-83``, ``include/madrona/impl/id_map.hpp``).
The reference uses lock-free free-list caches per thread; here allocation
is a deterministic batched stack pop (prefix-sum ranked), which is both
race-free and bit-reproducible — the TPU answer to the same problem.

All arrays carry a leading ``[num_worlds]`` axis: entity ids are
per-world-local (matching the CPU backend, where each world has its own
StateManager tables).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .component import Entity
from ..ops import scatter as _scatter


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EntityStore:
    gen: jax.Array        # [W, maxE] int32 — current generation per id
    arch: jax.Array       # [W, maxE] int32 — archetype index, -1 if free
    row: jax.Array        # [W, maxE] int32 — row within archetype table
    free_ids: jax.Array   # [W, maxE] int32 — stack of free ids
    free_top: jax.Array   # [W] int32 — number of free ids on the stack


def init(num_worlds: int, max_entities: int) -> EntityStore:
    ids = jnp.broadcast_to(
        jnp.arange(max_entities - 1, -1, -1, dtype=jnp.int32)[None, :],
        (num_worlds, max_entities),
    )
    return EntityStore(
        gen=jnp.zeros((num_worlds, max_entities), jnp.int32),
        arch=jnp.full((num_worlds, max_entities), -1, jnp.int32),
        row=jnp.full((num_worlds, max_entities), -1, jnp.int32),
        free_ids=ids,
        free_top=jnp.full((num_worlds,), max_entities, jnp.int32),
    )


def alloc(store: EntityStore, valid, arch_idx: int, base_row):
    """Allocate ids for up to K candidates per world.

    valid:    [W, K] bool — which candidates actually allocate
    base_row: [W] int32 — table row of the first candidate; candidate k's
              row is base_row + rank(k) among valid candidates (matching
              the dense-append convention of ``archetype.append_many``).

    Returns (store', entity [W, K, 2], row [W, K]) — invalid candidates get
    Entity.none().
    """
    w, k = valid.shape
    valid_i = valid.astype(jnp.int32)
    rank = jnp.cumsum(valid_i, axis=1) - valid_i          # [W, K]
    n_alloc = jnp.sum(valid_i, axis=1)                    # [W]
    enough = rank < store.free_top[:, None]
    ok = valid & enough

    # Pop: candidate with rank r takes free_ids[top - 1 - r].
    pos = store.free_top[:, None] - 1 - rank
    pos_c = jnp.clip(pos, 0, store.free_ids.shape[1] - 1)
    widx = jnp.broadcast_to(jnp.arange(w)[:, None], (w, k))
    new_ids = store.free_ids[widx, pos_c]                 # [W, K]

    rows = base_row[:, None] + rank                       # [W, K]
    gen_now = store.gen[widx, jnp.clip(new_ids, 0, None)]

    upd = lambda a, v: _scatter.masked_set_2d(a, widx, new_ids, v, ok)
    new_arch = upd(store.arch, jnp.full((w, k), arch_idx, jnp.int32))
    new_row = upd(store.row, rows)

    store = dataclasses.replace(
        store,
        arch=new_arch,
        row=new_row,
        free_top=store.free_top - jnp.minimum(n_alloc, store.free_top),
    )
    ent = jnp.where(
        ok[..., None],
        Entity.make(gen_now, new_ids),
        Entity.none((w, k)),
    )
    return store, ent, jnp.where(ok, rows, -1)


def free(store: EntityStore, entity, valid):
    """Free entities ([W, K, 2]) where valid; bumps generation.

    Mirrors ``EntityStore::freeEntity``/``bulkFree``: the id returns to the
    free stack and its generation increments so stale references fail
    :func:`lookup`.
    """
    w, k = valid.shape
    raw_id = Entity.id(entity)
    in_range = (raw_id >= 0) & (raw_id < store.gen.shape[1])
    eid = jnp.clip(raw_id, 0, store.gen.shape[1] - 1)
    widx = jnp.broadcast_to(jnp.arange(w)[:, None], (w, k))
    # Only free live, in-range, matching-generation ids (an
    # out-of-range id must not alias onto the clipped slot).
    live = valid & in_range & (
        store.gen[widx, eid] == Entity.gen(entity)
    ) & (Entity.gen(entity) >= 0)
    # Duplicate handles for the same id WITHIN this batch: only the
    # first occurrence frees (gen is read pre-bump, so without this a
    # doubled handle would push the id onto the free stack twice and
    # two later allocs would hand out the same id).
    same = (eid[:, :, None] == eid[:, None, :]) & live[:, :, None] & (
        live[:, None, :]
    )
    earlier = jnp.tril(jnp.ones((k, k), bool), k=-1)[None]
    live = live & ~jnp.any(same & earlier, axis=2)
    live_i = live.astype(jnp.int32)
    rank = jnp.cumsum(live_i, axis=1) - live_i
    pos = store.free_top[:, None] + rank

    new_free = _scatter.masked_set_2d(store.free_ids, widx, pos, eid, live)
    bump = lambda a, v: _scatter.masked_set_2d(a, widx, eid, v, live)
    return dataclasses.replace(
        store,
        gen=bump(store.gen, store.gen[widx, jnp.clip(eid, 0, None)] + 1),
        arch=bump(store.arch, jnp.full((w, k), -1, jnp.int32)),
        row=bump(store.row, jnp.full((w, k), -1, jnp.int32)),
        free_ids=new_free,
        free_top=store.free_top + jnp.sum(live_i, axis=1),
    )


def lookup(store: EntityStore, entity):
    """Entity [..., 2] with leading [W] axis -> (arch, row, valid).

    Mirrors ``EntityStore::getLoc`` + generation check.
    """
    eid = Entity.id(entity)
    egen = Entity.gen(entity)
    eid_c = jnp.clip(eid, 0, store.gen.shape[1] - 1)
    w = store.gen.shape[0]
    widx = jnp.arange(w).reshape((w,) + (1,) * (eid.ndim - 1))
    cur_gen = store.gen[widx, eid_c]
    valid = (
        (egen >= 0) & (eid >= 0) & (eid < store.gen.shape[1])
        & (cur_gen == egen)
    )
    arch = jnp.where(valid, store.arch[widx, eid_c], -1)
    row = jnp.where(valid, store.row[widx, eid_c], -1)
    return arch, row, valid


def update_rows(store: EntityStore, table_eid, table_egen, live_mask):
    """Re-point store.row after a table reorder (sort/compact).

    table_eid/table_egen: [W, C] the table's entity columns *after* the
    reorder; live_mask: [W, C]. Equivalent to the Loc re-map pass of
    ``SortArchetypeNode`` (``src/mw/device/sort_archetype.cpp``).
    """
    w, c = table_eid.shape
    widx = jnp.broadcast_to(jnp.arange(w)[:, None], (w, c))
    rows = jnp.broadcast_to(jnp.arange(c, dtype=jnp.int32)[None, :], (w, c))
    eid_c = jnp.clip(table_eid, 0, store.gen.shape[1] - 1)
    # generation check: a table row still carrying a STALE id (freed,
    # then re-allocated elsewhere) must not re-point the current
    # generation's row mapping
    ok = (
        live_mask & (table_eid >= 0)
        & (store.gen[widx, eid_c] == table_egen)
    )
    new_row = _scatter.masked_set_2d(store.row, widx, table_eid, rows, ok)
    return dataclasses.replace(store, row=new_row)
