"""Capacity-tier re-trace policy: overflow signal + archetype growth."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from madrona_tpu.core.registry import ECSRegistry
from madrona_tpu.core.state import StateManager
from madrona_tpu.graph.builder import TaskGraphBuilder
from madrona_tpu.graph.executor import Executor

W = 4


def _make_exec(cap=4, spawn_per_step=3):
    sm = StateManager()
    reg = ECSRegistry(sm)
    reg.register_component("Val", (), jnp.int32)
    reg.register_archetype("Things", ["Val"], capacity=cap)
    reg.register_singleton("Count", (), jnp.int32)
    reg.export_singleton("Count", "count")

    def spawn(sm_, state, key):
        k = spawn_per_step
        vals = {"Val": jnp.ones((W, k), jnp.int32)}
        state, _ = sm_.make_entities(
            state, "Things", vals, jnp.ones((W, k), bool)
        )
        singles = dict(state.singletons)
        singles["Count"] = state.tables["Things"].num_rows
        return dataclasses.replace(state, singletons=singles)

    b = TaskGraphBuilder(sm, "step")
    b.custom(spawn, name="spawn")
    return Executor(sm, {"step": b.build()}, num_worlds=W, seed=0,
                    max_entities=64, donate=False)


def test_overflow_signal_counts_drops():
    ex = _make_exec(cap=4, spawn_per_step=3)
    ex.run()
    assert ex.overflow_counts() == {}          # 3 <= 4 fits
    ex.run()                                   # 6 > 4: 2 dropped
    counts = ex.overflow_counts()
    assert counts == {"Things": 2}
    assert np.asarray(ex.get_exported("count")).tolist() == [4] * W


def test_maybe_grow_retraces_at_higher_tier():
    ex = _make_exec(cap=4, spawn_per_step=3)
    ex.run()
    ex.run()                                   # overflow 2
    grown = ex.maybe_grow()
    assert grown == {"Things": 8}              # 4 -> 8 covers 4+2
    assert ex.sm.archetypes["Things"].capacity == 8
    # data preserved across the re-tier
    t = ex.state.tables["Things"]
    assert t.columns["Val"].shape == (W, 8)
    assert np.asarray(t.num_rows).tolist() == [4] * W
    assert np.asarray(t.columns["Val"])[:, :4].tolist() == [[1] * 4] * W
    # next step runs at the new tier and fits
    ex.run()
    assert np.asarray(ex.get_exported("count")).tolist() == [7] * W
    assert ex.overflow_counts() == {}
    # overflow signal was cleared by the growth
    assert np.asarray(ex.state.tables["Things"].overflow).tolist() == [0] * W


def test_grow_rejects_shrink():
    ex = _make_exec()
    try:
        ex.grow_archetype("Things", 2)
        raise AssertionError("shrink accepted")
    except ValueError:
        pass
