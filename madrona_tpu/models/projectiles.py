"""Projectiles: entity-churn demonstration environment.

Not a reference-ecosystem env — this exercises the engine capability the
fixed-layout games don't: per-step entity creation and destruction under
static shapes (SURVEY.md §7 "hard parts": capacity + masked compaction
without host sync; reference analogue: makeEntityNow/destroyEntityNow +
RecycleEntitiesNode churn in tests/state.cpp).

Each step every world's emitter may spawn a projectile (Threefry-driven
Bernoulli) with a random velocity; projectiles fly ballistically and are
destroyed when they fall below the ground plane; the taskgraph sorts the
live set by height each step (exercising the sort node on a dynamic
archetype). Exports live counts and a fixed-capacity snapshot.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core.registry import ECSRegistry
from ..graph.builder import TaskGraphBuilder
from ..ops.lifecycle import destroy_entities
from ..utils import rng as _rng
from .base import EnvBase

CAPACITY = 32
SPAWN_PROB = 0.6
GRAVITY = -9.8
DT = 0.05


class Projectiles(EnvBase):
    name = "projectiles"
    num_agents = 1
    action_is_discrete = True
    action_shape = ()

    def register_types(self, reg: ECSRegistry):
        reg.register_component("PPos", (3,))
        reg.register_component("PVel", (3,))
        reg.register_archetype(
            "Projectile", ["PPos", "PVel"], capacity=CAPACITY
        )
        reg.register_singleton("Action", (), jnp.int32)
        reg.register_singleton("Reward", (), jnp.float32)
        reg.register_singleton("Done", (), jnp.int32)
        reg.register_singleton("Reset", (), jnp.int32)
        reg.register_singleton("LiveCount", (), jnp.int32)
        reg.register_singleton("TotalSpawned", (), jnp.int32)
        reg.register_singleton("TotalDestroyed", (), jnp.int32)

        reg.import_singleton("Action", "action")
        reg.import_singleton("Reset", "reset")
        reg.export_column("Projectile", "PPos", "positions")
        reg.export_singleton("LiveCount", "live")
        reg.export_singleton("Reward", "reward")
        reg.export_singleton("Done", "done")

    def setup_tasks(self, b: TaskGraphBuilder):
        n_spawn = b.custom(_spawn_system, name="proj_spawn")
        n_fly = b.parallel_for(
            _fly_system, "Projectile",
            read=["PPos", "PVel"], write=["PPos", "PVel"],
            deps=[n_spawn], name="proj_fly",
        )
        n_kill = b.custom(_despawn_system, deps=[n_fly], name="proj_despawn")
        n_sort = b.sort(
            "Projectile", key_fn=lambda cols: -cols["PPos"][..., 2],
            deps=[n_kill],
        )
        b.custom(_count_system, deps=[n_sort], name="proj_count")


def _spawn_system(sm, state, node_key):
    w = node_key.shape[0]
    u = _rng.sample_uniform(_rng.split_i(node_key, jnp.uint32(0)))
    vx = _rng.sample_uniform(_rng.split_i(node_key, jnp.uint32(1))) * 4 - 2
    vy = _rng.sample_uniform(_rng.split_i(node_key, jnp.uint32(2))) * 4 - 2
    vz = _rng.sample_uniform(_rng.split_i(node_key, jnp.uint32(3))) * 5 + 5
    spawn = (u < SPAWN_PROB)[:, None]              # [W, 1]
    vals = {
        "PPos": jnp.zeros((w, 1, 3)),
        "PVel": jnp.stack([vx, vy, vz], axis=-1)[:, None, :],
    }
    state, ents = sm.make_entities(state, "Projectile", vals, spawn)
    singles = dict(state.singletons)
    singles["TotalSpawned"] = (
        state.singletons["TotalSpawned"] + spawn[:, 0].astype(jnp.int32)
    )
    return dataclasses.replace(state, singletons=singles)


def _fly_system(ctx, pos, vel):
    vel = vel + jnp.asarray([0.0, 0.0, GRAVITY]) * DT
    pos = pos + vel * DT
    return pos, vel


def _despawn_system(sm, state, node_key):
    t = state.tables["Projectile"]
    below = t.columns["PPos"][..., 2] < 0.0
    from ..core import archetype as _arch

    live = _arch.row_mask(t, CAPACITY)
    kill = below & live
    ents = jnp.stack([t.entity_gen, t.entity_id], axis=-1)
    n_killed = jnp.sum(kill, axis=-1).astype(jnp.int32)
    state = destroy_entities(sm, state, "Projectile", ents, kill)
    singles = dict(state.singletons)
    singles["TotalDestroyed"] = singles["TotalDestroyed"] + n_killed
    return dataclasses.replace(state, singletons=singles)


def _count_system(sm, state, node_key):
    singles = dict(state.singletons)
    singles["LiveCount"] = state.tables["Projectile"].num_rows
    singles["Reward"] = singles["LiveCount"].astype(jnp.float32)
    singles["Done"] = jnp.zeros_like(singles["Done"])
    return dataclasses.replace(state, singletons=singles)
