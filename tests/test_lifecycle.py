"""Entity destruction + compaction: dense invariant, id recycling,
stale-handle safety, world independence."""

import jax.numpy as jnp
import numpy as np

from madrona_tpu.core.registry import ECSRegistry
from madrona_tpu.core.state import StateManager
from madrona_tpu.core import entity_store as es
from madrona_tpu.ops.lifecycle import destroy_entities

W, K = 3, 6


def setup():
    sm = StateManager()
    reg = ECSRegistry(sm)
    reg.register_component("Val", (), jnp.float32)
    reg.register_archetype("Thing", ["Val"], capacity=16)
    state = sm.init_state(W, seed=0)
    vals = jnp.arange(W * K, dtype=jnp.float32).reshape(W, K)
    state, ents = sm.make_entities(
        state, "Thing", {"Val": vals}, jnp.ones((W, K), bool)
    )
    return sm, state, ents, vals


def test_destroy_compacts_and_recycles():
    sm, state, ents, vals = setup()
    t = state.tables["Thing"]
    assert (np.asarray(t.num_rows) == K).all()

    # destroy entities 1 and 3 in every world
    kill = ents[:, [1, 3]]
    state = destroy_entities(
        sm, state, "Thing", kill, jnp.ones((W, 2), bool)
    )
    t = state.tables["Thing"]
    assert (np.asarray(t.num_rows) == K - 2).all()
    # survivors compacted in order: vals 0, 2, 4, 5
    got = np.asarray(t.columns["Val"])[:, : K - 2]
    expect = np.asarray(vals)[:, [0, 2, 4, 5]]
    np.testing.assert_array_equal(got, expect)

    # destroyed handles fail lookup; survivors resolve to new rows
    _, _, ok_dead = es.lookup(state.entities, kill)
    assert not np.asarray(ok_dead).any()
    arch, row, ok = es.lookup(state.entities, ents[:, [0, 2, 4, 5]])
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(
        np.asarray(row), np.tile(np.arange(4), (W, 1))
    )

    # stale handle stays dead after id reuse (generation check)
    state2, new_ents = sm.make_entities(
        state, "Thing",
        {"Val": jnp.full((W, 2), 99.0)}, jnp.ones((W, 2), bool),
    )
    _, _, ok_stale = es.lookup(state2.entities, kill)
    assert not np.asarray(ok_stale).any()
    _, _, ok_new = es.lookup(state2.entities, new_ents)
    assert np.asarray(ok_new).all()


def test_destroy_masked_per_world():
    sm, state, ents, vals = setup()
    # only world 1 destroys anything
    valid = jnp.zeros((W, 1), bool).at[1, 0].set(True)
    state = destroy_entities(sm, state, "Thing", ents[:, [0]], valid)
    counts = np.asarray(state.tables["Thing"].num_rows)
    np.testing.assert_array_equal(counts, [K, K - 1, K])
    got = np.asarray(state.tables["Thing"].columns["Val"])
    np.testing.assert_array_equal(got[0, :K], np.asarray(vals)[0])
    np.testing.assert_array_equal(got[1, : K - 1], np.asarray(vals)[1, 1:])


def test_destroy_is_jittable():
    import jax

    sm, state, ents, _ = setup()

    @jax.jit
    def go(state, kill, valid):
        return destroy_entities(sm, state, "Thing", kill, valid)

    out = go(state, ents[:, [2]], jnp.ones((W, 1), bool))
    assert (np.asarray(out.tables["Thing"].num_rows) == K - 1).all()


def test_make_entities_no_phantom_on_capacity_overflow():
    """Candidates whose rows would overflow the table must get
    Entity.none and NO store entry (previously: live handles pointing
    past capacity), while the drop still feeds the overflow re-trace
    signal."""
    sm = StateManager()
    reg = ECSRegistry(sm)
    reg.register_component("V", (), jnp.float32)
    reg.register_archetype("Tiny", ["V"], capacity=4)
    state = sm.init_state(W, seed=0)
    state, e1 = sm.make_entities(
        state, "Tiny", {"V": jnp.zeros((W, 3))}, jnp.ones((W, 3), bool)
    )
    # 3 live; request 3 more -> only 1 fits
    state, e2 = sm.make_entities(
        state, "Tiny", {"V": jnp.ones((W, 3))}, jnp.ones((W, 3), bool)
    )
    assert (np.asarray(state.tables["Tiny"].num_rows) == 4).all()
    ok2 = np.asarray(es.lookup(state.entities, e2)[2])
    np.testing.assert_array_equal(ok2, [[True, False, False]] * W)
    rows2 = np.asarray(es.lookup(state.entities, e2)[1])
    assert (rows2[:, 0] == 3).all()
    assert (rows2[:, 1:] == -1).all()
    # the two dropped candidates count into the overflow signal
    assert (np.asarray(state.tables["Tiny"].overflow) == 2).all()


def test_free_duplicate_handles_in_one_batch():
    """Freeing the same handle twice in one batched call must free it
    ONCE (a doubled push would hand the id to two later allocations)."""
    sm, state, ents, _ = setup()
    top0 = np.asarray(state.entities.free_top)
    dup = ents[:, [2, 2]]                      # same entity twice
    store = es.free(state.entities, dup, jnp.ones((W, 2), bool))
    np.testing.assert_array_equal(
        np.asarray(store.free_top), top0 + 1
    )
    # the freed id appears exactly once in the live free region
    for w in range(W):
        free_ids = np.asarray(store.free_ids[w, :store.free_top[w]])
        assert (free_ids == int(ents[w, 2, 1])).sum() == 1


def test_lookup_and_free_reject_out_of_range_ids():
    sm, state, ents, _ = setup()
    max_e = state.entities.gen.shape[1]
    bogus = jnp.stack([
        jnp.zeros((W, 2), jnp.int32),          # gen 0 (matches fresh)
        jnp.asarray([[-5, max_e + 3]] * W, jnp.int32),
    ], axis=-1)
    _, _, ok = es.lookup(state.entities, bogus)
    assert not np.asarray(ok).any()
    top0 = np.asarray(state.entities.free_top)
    store = es.free(state.entities, bogus, jnp.ones((W, 2), bool))
    np.testing.assert_array_equal(np.asarray(store.free_top), top0)


def test_update_rows_ignores_stale_generation_ids():
    """A table row carrying a freed-then-reallocated id must not
    re-point the CURRENT generation's row mapping."""
    sm, state, ents, _ = setup()
    # free entity 0; its id returns to the stack with gen bumped
    state2_entities = es.free(
        state.entities, ents[:, [0]], jnp.ones((W, 1), bool)
    )
    old_id = ents[:, 0, 1]
    old_gen = ents[:, 0, 0]
    # fabricate a stale table: one row still holding (old_gen, old_id)
    table_eid = jnp.asarray(old_id)[:, None]
    table_egen = jnp.asarray(old_gen)[:, None]
    store3 = es.update_rows(
        state2_entities, table_eid, table_egen,
        jnp.ones((W, 1), bool),
    )
    # the stale remap must NOT have written row 0 over the freed slot
    widx = np.arange(W)
    np.testing.assert_array_equal(
        np.asarray(store3.row)[widx, np.asarray(old_id)],
        np.asarray(state2_entities.row)[widx, np.asarray(old_id)],
    )
