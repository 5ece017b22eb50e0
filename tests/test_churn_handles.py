"""Held entity handles stay valid across destroy + spawn + sort churn.

Exercises the SortArchetypeNode ↔ EntityStore row-remap interaction the
reference performs in its sort pass (``src/mw/device/sort_archetype.cpp``
Loc re-map) under sustained churn: every step one original entity dies,
one new entity spawns, and the whole table is re-ordered by a shuffling
key — handles captured at t=0 must keep resolving to the row that holds
their payload, and destroyed handles must fail lookup forever (even
after id reuse).
"""

import jax
import jax.numpy as jnp
import numpy as np

from madrona_tpu.core.registry import ECSRegistry
from madrona_tpu.core.state import StateManager
from madrona_tpu.core import entity_store as es
from madrona_tpu.graph.builder import TaskGraphBuilder
from madrona_tpu.graph.executor import Executor
from madrona_tpu.ops.lifecycle import destroy_entities

W, K0, CAP = 3, 8, 32


def _build():
    sm = StateManager()
    reg = ECSRegistry(sm)
    reg.register_component("Val", (), jnp.float32)
    reg.register_archetype("Thing", ["Val"], capacity=CAP)
    reg.register_singleton("T", (), jnp.int32)
    reg.import_singleton("T", "t")

    def init_fn(sm, state):
        vals = (
            100.0 * jnp.arange(W, dtype=jnp.float32)[:, None]
            + jnp.arange(K0, dtype=jnp.float32)[None, :]
        )
        state, _ = sm.make_entities(
            state, "Thing", {"Val": vals}, jnp.ones((W, K0), bool)
        )
        return state

    def kill_original_t(sm, state, _key):
        """Destroy the original entity with index t (Val % 100 == t)."""
        t = state.singletons["T"]                       # [W]
        tab = state.tables["Thing"]
        val = tab.columns["Val"]                        # [W, CAP]
        live = (
            jnp.arange(CAP)[None, :] < tab.num_rows[:, None]
        )
        idx = jnp.round(val) % 100.0
        kill = live & (val < 1000.0) & (
            idx == t[:, None].astype(jnp.float32)
        )
        handles = jnp.stack([tab.entity_gen, tab.entity_id], axis=-1)
        return destroy_entities(sm, state, "Thing", handles, kill)

    def spawn_one(sm, state, _key):
        t = state.singletons["T"].astype(jnp.float32)   # [W]
        new_val = (
            1000.0 + 10.0 * t + jnp.arange(W, dtype=jnp.float32)
        )[:, None]
        state, _ = sm.make_entities(
            state, "Thing", {"Val": new_val}, jnp.ones((W, 1), bool)
        )
        return state

    b = TaskGraphBuilder(sm, "step")
    n0 = b.custom(kill_original_t, name="kill")
    n1 = b.custom(spawn_one, deps=[n0], name="spawn")
    b.sort(
        "Thing",
        key_fn=lambda cols: jnp.round(cols["Val"] * 37.0) % 101.0,
        deps=[n1],
    )
    ex = Executor(
        sm, {"step": b.build()}, num_worlds=W, init_fn=init_fn,
        donate=False,
    )
    return sm, ex


def test_handles_survive_churn_with_sort():
    sm, ex = _build()
    state = ex.state
    ents0 = np.asarray(
        jnp.stack(
            [
                state.tables["Thing"].entity_gen[:, :K0],
                state.tables["Thing"].entity_id[:, :K0],
            ],
            axis=-1,
        )
    )
    vals0 = np.asarray(state.tables["Thing"].columns["Val"])[:, :K0]

    for t in range(K0):
        ex.run(inputs={"t": jnp.full((W,), t, jnp.int32)})
        state = ex.state
        tab = state.tables["Thing"]
        nrows = np.asarray(tab.num_rows)
        # population is conserved: one killed, one spawned per step
        np.testing.assert_array_equal(nrows, K0)

        arch, row, ok = map(
            np.asarray, es.lookup(state.entities, jnp.asarray(ents0))
        )
        # originals 0..t are dead, t+1.. alive — in every world
        expect_alive = np.broadcast_to(
            np.arange(K0) > t, (W, K0)
        )
        np.testing.assert_array_equal(ok, expect_alive)
        # live handles resolve to the row holding their payload even
        # though the sort shuffled the table this step
        val_tab = np.asarray(tab.columns["Val"])
        for w in range(W):
            alive = np.nonzero(ok[w])[0]
            np.testing.assert_array_equal(
                val_tab[w, row[w, alive]], vals0[w, alive]
            )
            assert (row[w, alive] < nrows[w]).all()
        # table really is sorted by the shuffling key on live rows
        key = np.round(val_tab * 37.0) % 101.0
        for w in range(W):
            kk = key[w, : nrows[w]]
            assert (np.diff(kk) >= 0).all()

    # all originals dead at the end; their ids were reused by spawns,
    # so stale lookups must keep failing on the generation check
    _, _, ok = map(np.asarray, es.lookup(ex.state.entities,
                                         jnp.asarray(ents0)))
    assert not ok.any()


def test_churn_with_sort_deterministic():
    def run():
        sm, ex = _build()
        for t in range(5):
            ex.run(inputs={"t": jnp.full((W,), t, jnp.int32)})
        tab = ex.state.tables["Thing"]
        return (
            np.asarray(tab.columns["Val"]),
            np.asarray(tab.entity_id),
            np.asarray(ex.state.entities.free_top),
        )

    a, b_, c = run()
    a2, b2, c2 = run()
    np.testing.assert_array_equal(a, a2)
    np.testing.assert_array_equal(b_, b2)
    np.testing.assert_array_equal(c, c2)
