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
