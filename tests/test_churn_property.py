"""Stateful churn property test: random interleaved make / destroy /
sort / compact against a NumPy mirror of the EntityStore semantics.

The scripted churn tests (test_churn_handles.py) fix one scenario; this
one drives the REAL node code paths (Executor graph: destroy -> spawn ->
sort -> compact) with a seeded random op stream — including stale-handle
frees, double-frees inside one batch, and capacity-overflow spawns — and
checks the semantic invariants after every step:

  * every handle ever issued resolves (or fails) exactly as the mirror
    predicts, across arbitrary sort/compact shuffles;
  * live handles point at the row holding their payload;
  * row counts, free-stack level, and the overflow signal match;
  * live rows stay dense and sorted by the step's key.

Reference analogue: the sort pass's Loc re-map + generation-checked
EntityStore (``src/mw/device/sort_archetype.cpp``,
``include/madrona/impl/id_map.hpp``) under sustained churn.
"""

import jax.numpy as jnp
import numpy as np

from madrona_tpu.core import entity_store as es
from madrona_tpu.core.registry import ECSRegistry
from madrona_tpu.core.state import StateManager
from madrona_tpu.graph.builder import TaskGraphBuilder
from madrona_tpu.graph.executor import Executor
from madrona_tpu.ops.lifecycle import destroy_entities

W, CAP, KK, SK, STEPS = 3, 16, 6, 5, 24


def _build():
    sm = StateManager()
    reg = ECSRegistry(sm)
    reg.register_component("Val", (), jnp.float32)
    reg.register_archetype("Thing", ["Val"], capacity=CAP)
    reg.register_singleton("KillH", (KK, 2), jnp.int32)
    reg.register_singleton("SpawnV", (SK,), jnp.float32)
    reg.register_singleton("SpawnM", (SK,), jnp.int32)
    for name in ("KillH", "SpawnV", "SpawnM"):
        reg.import_singleton(name, name.lower())

    def kill(sm, state, _key):
        h = state.singletons["KillH"]               # [W, KK, 2]
        return destroy_entities(
            sm, state, "Thing", h, jnp.ones(h.shape[:2], bool)
        )

    def spawn(sm, state, _key):
        v = state.singletons["SpawnV"]              # [W, SK]
        m = state.singletons["SpawnM"] > 0
        state, _ = sm.make_entities(state, "Thing", {"Val": v}, m)
        return state

    b = TaskGraphBuilder(sm, "step")
    n0 = b.custom(kill, name="kill")
    n1 = b.custom(spawn, deps=[n0], name="spawn")
    # shuffling key: monotone-increasing Vals land in scrambled order,
    # so the permutation changes every step as the population churns
    n2 = b.sort(
        "Thing",
        key_fn=lambda cols: jnp.round(cols["Val"] * 37.0) % 101.0,
        deps=[n1],
    )
    b.compact("Thing", deps=[n2])
    ex = Executor(
        sm, {"step": b.build()}, num_worlds=W, init_fn=lambda sm, s: s,
        donate=False,
    )
    return sm, ex


def test_random_churn_matches_numpy_mirror():
    sm, ex = _build()
    rs = np.random.RandomState(20260820)
    max_e = np.asarray(ex.state.entities.gen).shape[1]

    # mirror: per world, {id: (gen, val)} of live entities, insertion-
    # ordered; every handle ever issued in `issued` with its val
    live = [dict() for _ in range(W)]
    issued = []                                     # (w, gen, id, val)
    next_val = 1.0
    cum_overflow = np.zeros((W,), np.int64)

    for t in range(STEPS):
        # --- choose kills: live handles, sometimes stale/dupe ---------
        killh = np.full((W, KK, 2), -1, np.int32)
        kills = [[] for _ in range(W)]
        for w in range(W):
            ids = list(live[w].keys())
            rs.shuffle(ids)
            n_kill = rs.randint(0, min(KK, len(ids)) + 1)
            sel = ids[:n_kill]
            slot = 0
            for i in sel:
                g, _v = live[w][i]
                killh[w, slot] = (g, i)
                kills[w].append(i)
                slot += 1
            # with leftover slots: stale handle (old gen) or duplicate
            if slot < KK and issued and rs.rand() < 0.7:
                ww, g, i, _v = issued[rs.randint(len(issued))]
                if ww == w and not (
                    i in live[w] and live[w][i][0] == g
                ):
                    killh[w, slot] = (g, i)          # stale: must no-op
                    slot += 1
            if slot < KK and kills[w] and rs.rand() < 0.5:
                i = kills[w][0]                      # duplicate in batch
                killh[w, slot] = (live[w][i][0], i)

        # --- choose spawns (may try to overflow capacity) -------------
        spawn_v = np.zeros((W, SK), np.float32)
        spawn_m = np.zeros((W, SK), np.int32)
        spawn_vals = [[] for _ in range(W)]
        for w in range(W):
            n_spawn = rs.randint(0, SK + 1)
            for k in range(n_spawn):
                spawn_v[w, k] = next_val
                spawn_m[w, k] = 1
                spawn_vals[w].append(next_val)
                next_val += 1.0

        ex.run(inputs={
            "killh": jnp.asarray(killh),
            "spawnv": jnp.asarray(spawn_v),
            "spawnm": jnp.asarray(spawn_m),
        })
        state = ex.state
        tab = state.tables["Thing"]
        store = state.entities
        val_t = np.asarray(tab.columns["Val"])
        eid_t = np.asarray(tab.entity_id)
        egen_t = np.asarray(tab.entity_gen)
        nrows = np.asarray(tab.num_rows)
        overflow = np.asarray(tab.overflow)

        # --- advance the mirror ---------------------------------------
        for w in range(W):
            for i in kills[w]:
                del live[w][i]
            for v in spawn_vals[w]:
                if len(live[w]) < CAP:
                    # id assignment is the store's business; discover it
                    # from the table below, then record
                    live[w][("pending", v)] = v
                else:
                    cum_overflow[w] += 1
            # resolve pending ids from the post-step table
            pend = [k for k in live[w] if isinstance(k, tuple)]
            for k in pend:
                v = live[w].pop(k)
                hit = np.nonzero(
                    (np.abs(val_t[w] - v) < 1e-6)
                    & (np.arange(CAP) < nrows[w])
                )[0]
                assert hit.size == 1, f"spawned val {v} not unique in table"
                r = hit[0]
                i, g = int(eid_t[w, r]), int(egen_t[w, r])
                assert i not in live[w], "live id collision"
                live[w][i] = (g, v)
                issued.append((w, g, i, v))

        # --- invariants -------------------------------------------------
        for w in range(W):
            assert nrows[w] == len(live[w]), (t, w)
            # free stack level: maxE - live ids
            assert np.asarray(store.free_top)[w] == max_e - len(live[w])
            # live rows dense + sorted by the step key + unique ids
            lv = val_t[w, : nrows[w]]
            key = np.round(lv * 37.0) % 101.0
            assert (np.diff(key) >= 0).all()
            assert len(set(eid_t[w, : nrows[w]].tolist())) == nrows[w]
            # dead tail slots carry no ids
            assert (eid_t[w, nrows[w]:] == -1).all()
        # overflow accumulates until Executor.maybe_grow clears it
        np.testing.assert_array_equal(overflow, cum_overflow)

        # every handle ever issued resolves exactly as the mirror says
        if issued:
            h = np.full((W, len(issued), 2), -1, np.int32)
            expect = np.zeros((W, len(issued)), bool)
            vals = np.zeros((W, len(issued)), np.float32)
            for j, (w, g, i, v) in enumerate(issued):
                h[w, j] = (g, i)
                alive = i in live[w] and live[w][i] == (g, v)
                expect[w, j] = alive
                vals[w, j] = v
            _, row, ok = map(
                np.asarray, es.lookup(store, jnp.asarray(h))
            )
            np.testing.assert_array_equal(ok, expect)
            for w in range(W):
                aj = np.nonzero(ok[w])[0]
                assert (row[w, aj] < nrows[w]).all()
                np.testing.assert_allclose(
                    val_t[w, row[w, aj]], vals[w, aj], rtol=0, atol=1e-6
                )
