"""Taskgraph tests: node execution, masking, sorting, determinism.

Covers the golden "toy archetype churn" cases called for by SURVEY.md §7
build stage 2.
"""

import jax
import jax.numpy as jnp
import numpy as np

from madrona_tpu import ECSRegistry, Executor, StateManager, TaskGraphBuilder


def build_sim(num_worlds=4):
    sm = StateManager()
    reg = ECSRegistry(sm)
    reg.register_component("Pos", (), jnp.float32)
    reg.register_component("Vel", (), jnp.float32)
    reg.register_component("Key", (), jnp.int32)
    reg.register_archetype("Mover", ["Pos", "Vel", "Key"], 8)
    reg.register_singleton("StepCount", (), jnp.int32)
    reg.export_column("Mover", "Pos", "pos")
    return sm, reg


def movement(ctx, pos, vel):
    return pos + vel


def count(ctx, c):
    return c + 1


def init_fn(sm, state):
    w = 4
    k = 6
    values = {
        "Pos": jnp.tile(jnp.arange(k, dtype=jnp.float32)[None], (w, 1)),
        "Vel": jnp.ones((w, k), jnp.float32),
        "Key": jnp.tile(jnp.arange(k, 0, -1, dtype=jnp.int32)[None], (w, 1)),
    }
    state, _ = sm.make_entities(state, "Mover", values, jnp.ones((w, k), bool))
    return state


def test_parallel_for_and_masking():
    sm, reg = build_sim()
    b = TaskGraphBuilder(sm)
    n0 = b.parallel_for(movement, "Mover", ["Pos", "Vel"], ["Pos"])
    b.for_worlds(count, ["StepCount"], ["StepCount"], deps=[n0])
    ex = Executor(sm, {"step": b.build()}, num_worlds=4, init_fn=init_fn)

    out = ex.run()
    pos = np.asarray(out["pos"])
    # live rows moved by +1; dead rows (6..7) untouched (zero)
    np.testing.assert_allclose(pos[0, :6], np.arange(6) + 1.0)
    np.testing.assert_allclose(pos[0, 6:], 0.0)
    assert (np.asarray(ex.state.singletons["StepCount"]) == 1).all()
    out = ex.run()
    np.testing.assert_allclose(np.asarray(out["pos"])[0, :6], np.arange(6) + 2.0)
    assert int(ex.state.step) == 2


def test_sort_reorders_rows_and_entity_store():
    sm, reg = build_sim()
    b = TaskGraphBuilder(sm)
    b.sort("Mover", key_comp="Key")
    ex = Executor(sm, {"step": b.build()}, num_worlds=4, init_fn=init_fn)
    # entities created with Key = [6, 5, 4, 3, 2, 1]
    before = ex.state
    ids_before = np.asarray(before.tables["Mover"].entity_id[0, :6]).copy()
    ex.run()
    after = ex.state
    keys = np.asarray(after.tables["Mover"].columns["Key"][0, :6])
    assert list(keys) == [1, 2, 3, 4, 5, 6]
    # Pos column reordered consistently
    pos = np.asarray(after.tables["Mover"].columns["Pos"][0, :6])
    np.testing.assert_allclose(pos, [5, 4, 3, 2, 1, 0])
    # entity store rows re-pointed
    ids_after = np.asarray(after.tables["Mover"].entity_id[0, :6])
    rows = np.asarray(after.entities.row[0])
    for new_row, eid in enumerate(ids_after):
        assert rows[eid] == new_row
    assert set(ids_after) == set(ids_before)


def test_clear_tmp():
    sm = StateManager()
    reg = ECSRegistry(sm)
    reg.register_component("V", (), jnp.float32)
    reg.register_archetype("Tmp", ["V"], 8, temporary=True)
    b = TaskGraphBuilder(sm)
    b.clear_tmp("Tmp")

    def init(sm_, st):
        return sm_.append_temporaries(
            st, "Tmp", {"V": jnp.ones((2, 3))}, jnp.ones((2, 3), bool)
        )

    ex = Executor(sm, {"step": b.build()}, num_worlds=2, init_fn=init)
    assert list(np.asarray(ex.state.tables["Tmp"].num_rows)) == [3, 3]
    ex.run()
    assert list(np.asarray(ex.state.tables["Tmp"].num_rows)) == [0, 0]


def test_rng_keys_unique_and_deterministic():
    sm = StateManager()
    reg = ECSRegistry(sm)
    reg.register_component("K1", (2,), jnp.uint32)
    reg.register_component("K2", (2,), jnp.uint32)
    reg.register_archetype("E", ["K1", "K2"], 4, fixed_rows=True)

    def grab1(ctx, k1):
        return ctx.key

    def grab2(ctx, k2):
        return ctx.key

    b = TaskGraphBuilder(sm)
    b.parallel_for(grab1, "E", ["K1"], ["K1"])
    b.parallel_for(grab2, "E", ["K2"], ["K2"])
    ex1 = Executor(sm, {"step": b.build()}, num_worlds=3, seed=5)
    ex1.run()
    k1 = np.asarray(ex1.state.tables["E"].columns["K1"])
    k2 = np.asarray(ex1.state.tables["E"].columns["K2"])
    # all (world, row, node) keys distinct
    allk = np.concatenate([k1.reshape(-1, 2), k2.reshape(-1, 2)])
    assert len({tuple(r) for r in allk}) == len(allk)

    # deterministic across fresh executors
    sm2 = StateManager()
    reg2 = ECSRegistry(sm2)
    reg2.register_component("K1", (2,), jnp.uint32)
    reg2.register_component("K2", (2,), jnp.uint32)
    reg2.register_archetype("E", ["K1", "K2"], 4, fixed_rows=True)
    b2 = TaskGraphBuilder(sm2)
    b2.parallel_for(grab1, "E", ["K1"], ["K1"])
    b2.parallel_for(grab2, "E", ["K2"], ["K2"])
    ex2 = Executor(sm2, {"step": b2.build()}, num_worlds=3, seed=5)
    ex2.run()
    np.testing.assert_array_equal(
        k1, np.asarray(ex2.state.tables["E"].columns["K1"])
    )

    # different step -> different keys
    ex1.run()
    k1b = np.asarray(ex1.state.tables["E"].columns["K1"])
    assert (k1 != k1b).any()


def test_struct_component_in_parallel_for():
    sm = StateManager()
    reg = ECSRegistry(sm)
    reg.register_component(
        "Body", fields={"p": ((3,), jnp.float32), "v": ((3,), jnp.float32)}
    )
    reg.register_archetype("B", ["Body"], 4, fixed_rows=True)

    def integrate(ctx, body):
        return {"p": body["p"] + body["v"], "v": body["v"]}

    b = TaskGraphBuilder(sm)
    b.parallel_for(integrate, "B", ["Body"], ["Body"])

    def init(sm_, st):
        import dataclasses

        t = st.tables["B"]
        cols = dict(t.columns)
        cols["Body"] = {
            "p": jnp.zeros((2, 4, 3)),
            "v": jnp.ones((2, 4, 3)),
        }
        tables = dict(st.tables)
        tables["B"] = dataclasses.replace(t, columns=cols)
        return dataclasses.replace(st, tables=tables)

    ex = Executor(sm, {"step": b.build()}, num_worlds=2, init_fn=init)
    ex.run()
    ex.run()
    np.testing.assert_allclose(
        np.asarray(ex.state.tables["B"].columns["Body"]["p"]), 2.0
    )


def test_launch_graph_composition():
    sm, reg = build_sim()
    b1 = TaskGraphBuilder(sm, "move")
    b1.parallel_for(movement, "Mover", ["Pos", "Vel"], ["Pos"])
    b2 = TaskGraphBuilder(sm, "count")
    b2.for_worlds(count, ["StepCount"], ["StepCount"])
    ex = Executor(
        sm, {"move": b1.build(), "count": b2.build()}, num_worlds=4,
        init_fn=init_fn,
    )
    launch = ex.build_launch_graph(["move", "count"])
    ex.run(launch)
    assert (np.asarray(ex.state.singletons["StepCount"]) == 1).all()
    np.testing.assert_allclose(
        np.asarray(ex.state.tables["Mover"].columns["Pos"][0, :6]),
        np.arange(6) + 1.0,
    )


def test_taskgraph_manager_multi_graph_env():
    """Envs can declare multiple named graphs via setup_graphs (reference
    TaskGraphManager::init(enum), taskgraph_builder.hpp:93-108) and pick
    which compose a launch."""
    from madrona_tpu.graph.builder import TaskGraphManager
    from madrona_tpu.models.base import EnvBase, make_sim

    class TwoGraph(EnvBase):
        name = "twograph"
        default_launch = ("step", "extra")

        def register_types(self, reg):
            reg.register_component("Pos", (3,))
            reg.register_component("Vel", (3,))
            reg.register_archetype("Mover", ["Pos", "Vel"], capacity=8)
            reg.register_singleton("Hits", (), jnp.int32)
            reg.export_singleton("Hits", "hits")

        def setup_graphs(self, mgr: TaskGraphManager):
            s = mgr.init("step")
            s.parallel_for(movement, "Mover", ["Pos", "Vel"], ["Pos"])
            e = mgr.init("extra")
            e.for_worlds(lambda ctx, c: c + 1, ["Hits"], ["Hits"])

    sim = make_sim(TwoGraph(), num_worlds=4, jit=False)
    # default launch runs both graphs
    out = sim.step()
    assert (np.asarray(out["hits"]) == 1).all()
    # step-only launch skips the extra graph
    out = sim.step(launch=("step",))
    assert (np.asarray(out["hits"]) == 1).all()
    out = sim.step(launch=("extra",))
    assert (np.asarray(out["hits"]) == 2).all()
