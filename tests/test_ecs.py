"""ECS core tests: registration, entity lifecycle, tables, queries.

Models the reference's tests/state.cpp + tests/id_map.cpp patterns
(create/lookup/delete cycles, generation safety) against the batched
functional state.
"""

import jax
import jax.numpy as jnp
import numpy as np

from madrona_tpu import (
    ArchetypeSpec,
    ComponentSpec,
    ECSRegistry,
    Entity,
    StateManager,
    scalar,
    vec3,
)
from madrona_tpu.core import entity_store as es


def make_sm():
    sm = StateManager()
    reg = ECSRegistry(sm)
    reg.register_component("Position", (3,))
    reg.register_component("Health", (), jnp.int32)
    reg.register_component(
        "Velocity", fields={"linear": vec3(), "angular": vec3()}
    )
    reg.register_archetype("Agent", ["Position", "Health", "Velocity"], 8)
    reg.register_archetype("Obstacle", ["Position"], 4)
    reg.register_singleton("Score", (), jnp.float32)
    return sm


def test_registration_and_init():
    sm = make_sm()
    st = sm.init_state(num_worlds=3, seed=0)
    assert st.tables["Agent"].columns["Position"].shape == (3, 8, 3)
    assert st.tables["Agent"].columns["Velocity"]["linear"].shape == (3, 8, 3)
    assert st.singletons["Score"].shape == (3,)
    assert (np.asarray(st.tables["Agent"].num_rows) == 0).all()


def test_query_resolution():
    sm = make_sm()
    assert sm.query("Position") == ["Agent", "Obstacle"]
    assert sm.query("Position", "Health") == ["Agent"]


def test_make_entities_and_lookup():
    sm = make_sm()
    st = sm.init_state(num_worlds=2, seed=0)
    w, k = 2, 5
    values = {
        "Position": jnp.arange(w * k * 3, dtype=jnp.float32).reshape(w, k, 3),
        "Health": jnp.full((w, k), 100, jnp.int32),
        "Velocity": {
            "linear": jnp.ones((w, k, 3)),
            "angular": jnp.zeros((w, k, 3)),
        },
    }
    valid = jnp.array([[True] * 5, [True, True, True, False, False]])
    st, ents = sm.make_entities(st, "Agent", values, valid)

    assert list(np.asarray(st.tables["Agent"].num_rows)) == [5, 3]
    # invalid candidates got null entities
    assert bool(Entity.is_none(ents)[1, 3])
    arch, row, ok = es.lookup(st.entities, ents)
    ok = np.asarray(ok)
    assert ok[0].all() and ok[1, :3].all() and not ok[1, 3:].any()
    assert (np.asarray(arch)[np.asarray(ok)] == sm.arch_index("Agent")).all()
    # rows are dense 0..k-1
    assert list(np.asarray(row)[0]) == [0, 1, 2, 3, 4]


def test_free_and_generation_safety():
    sm = make_sm()
    st = sm.init_state(num_worlds=1, seed=0)
    values = {
        "Position": jnp.zeros((1, 4, 3)),
        "Health": jnp.zeros((1, 4), jnp.int32),
        "Velocity": {
            "linear": jnp.zeros((1, 4, 3)),
            "angular": jnp.zeros((1, 4, 3)),
        },
    }
    st, ents = sm.make_entities(st, "Agent", values, jnp.ones((1, 4), bool))
    store = st.entities
    # free entities 1 and 2
    mask = jnp.array([[False, True, True, False]])
    store2 = es.free(store, ents, mask)
    _, _, ok = es.lookup(store2, ents)
    assert list(np.asarray(ok)[0]) == [True, False, False, True]
    # stale references must stay invalid after id reuse
    top_before = int(store2.free_top[0])
    st2_store, new_ents, _ = es.alloc(
        store2, jnp.ones((1, 2), bool), 0, jnp.array([4], jnp.int32)
    )
    _, _, ok2 = es.lookup(st2_store, ents)
    assert list(np.asarray(ok2)[0]) == [True, False, False, True]
    # reused ids have bumped generation
    reused = np.asarray(new_ents)
    assert (reused[0, :, 0] >= 1).all()
    assert int(st2_store.free_top[0]) == top_before - 2


def test_temporaries_append_and_clear():
    sm = StateManager()
    reg = ECSRegistry(sm)
    reg.register_component("Pair", (2,), jnp.int32)
    reg.register_archetype("Candidates", ["Pair"], 16, temporary=True)
    st = sm.init_state(num_worlds=2, seed=0)

    vals = {"Pair": jnp.ones((2, 6, 2), jnp.int32)}
    valid = jnp.array(
        [[True, False, True, True, False, True],
         [False, False, False, False, False, True]]
    )
    st = sm.append_temporaries(st, "Candidates", vals, valid)
    assert list(np.asarray(st.tables["Candidates"].num_rows)) == [4, 1]
    # second append stacks after the first
    st = sm.append_temporaries(st, "Candidates", vals, valid)
    assert list(np.asarray(st.tables["Candidates"].num_rows)) == [8, 2]


def test_capacity_overflow_dropped():
    sm = StateManager()
    reg = ECSRegistry(sm)
    reg.register_component("X", (), jnp.int32)
    reg.register_archetype("T", ["X"], 4, temporary=True)
    st = sm.init_state(num_worlds=1, seed=0)
    vals = {"X": jnp.arange(10, dtype=jnp.int32)[None]}
    st = sm.append_temporaries(st, "T", vals, jnp.ones((1, 10), bool))
    assert int(st.tables["T"].num_rows[0]) == 4
    assert list(np.asarray(st.tables["T"].columns["X"][0])) == [0, 1, 2, 3]


def test_imports_exports():
    sm = make_sm()
    sm.export_column("Agent", "Position", "obs")
    sm.import_column("Agent", "Health", "hp_in")
    sm.export_singleton("Score", "score")
    st = sm.init_state(num_worlds=2)
    st = sm.apply_imports(st, {"hp_in": jnp.full((2, 8), 7, jnp.int32)})
    out = sm.collect_exports(st)
    assert out["obs"].shape == (2, 8, 3)
    assert (np.asarray(st.tables["Agent"].columns["Health"]) == 7).all()
    assert out["score"].shape == (2,)


def test_state_is_jittable_pytree():
    sm = make_sm()
    st = sm.init_state(num_worlds=2)

    @jax.jit
    def f(s):
        return s

    st2 = f(st)
    assert st2.tables["Agent"].columns["Position"].shape == (2, 8, 3)
