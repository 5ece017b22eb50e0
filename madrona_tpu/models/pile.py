"""Pile: many-body debris stress environment (256+ bodies/world).

The example envs top out at ~21 bodies/world; this env exists to prove
the physics pipeline scales past that regime — the workload class the
reference serves with its per-world AABB tree broadphase
(``src/physics/broadphase.cpp:487-1027``; here the sweep-and-prune tier,
``physics/broadphase.py::find_candidates_swept``) rather than the
all-pairs tier the small envs use.

World: a static floor plane + 4 walls enclose ``num_bodies`` dynamic
bodies (boxes of two sizes + spheres) spawned in a lattice above the
floor with per-world random jitter/yaw; they fall and settle into a
pile. Action per world: 0 = none, 1-4 = lateral shake impulse (±x/±y)
applied to every dynamic body — an RL-shaped handle for exercising
imports. Reward: fraction of dynamic bodies at rest (speed below
``REST_SPEED``), minus a small shake penalty. Episode ends after
``episode_len`` steps.

Exports: ``summary`` [W, 6] (mean/max height, mean speed, rest
fraction, episode step, broadphase-overflow flag), ``reward``,
``done``; with ``body_obs=True`` additionally ``body_obs``
[W, num_bodies, 6] (pos + vel per dynamic body).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core.registry import ECSRegistry
from ..graph.builder import TaskGraphBuilder
from ..physics import api as papi
from ..physics import bodies, broadphase as bp
from ..physics.api import RIGID_BODY
from ..physics.xpbd import PhysicsConfig
from ..utils import rng as _rng
from ..utils.config import apply_tuned, env_override
from .base import EnvBase

DT = 1.0 / 30.0
SUBSTEPS = 4
ARENA = 12.0          # half-extent of the container
WALL_H = 6.0
REST_SPEED = 0.25
SHAKE_IMPULSE = 1.5   # m/s delta-v per shake action

N_STATIC = 5          # floor + 4 walls


def _make_objects():
    reg = bodies.ObjectRegistry()
    ids = {}
    ids["plane"] = reg.add_plane(mu_s=0.9, mu_d=0.7)
    ids["wall"] = reg.add_box(
        [1.0, 1.0, 1.0], mass=0.0, response=bodies.RESPONSE_STATIC
    )
    ids["box_s"] = reg.add_box([0.35] * 3, mass=0.8, mu_s=0.7, mu_d=0.5)
    ids["box_l"] = reg.add_box([0.55] * 3, mass=1.6, mu_s=0.7, mu_d=0.5)
    ids["sphere"] = reg.add_sphere(0.4, mass=1.0, mu_s=0.5, mu_d=0.4)
    return reg.build(), ids


class Pile(EnvBase):
    name = "pile"
    num_agents = 1
    action_is_discrete = True
    action_shape = ()
    action_buckets = (5,)

    def __init__(
        self,
        num_bodies: int = 256,
        episode_len: int = 100,
        body_obs: bool = False,
        # a settled 3D pile's x-slab population scales ~n^(2/3) (~40 at
        # 256 bodies); 80 keeps headroom against jitter without losing
        # the sweep's win over all-pairs
        broadphase_window: int = 80,
        caps: bp.CandidateCaps | None = None,
    ):
        self.num_bodies = num_bodies
        self.n_total = N_STATIC + num_bodies
        self.episode_len = episode_len
        self.body_obs = body_obs
        self.om, self.obj = _make_objects()
        # narrowphase per substep (narrowphase_once=False): frozen
        # contacts destabilize dense piles — a body falls through its
        # contact margin within one dt while stacked bodies land on it;
        # measured: k=3 lattice explodes frozen, settles per-substep
        # (matches the reference, which runs narrowphase every substep,
        # xpbd.cpp:1098-1130)
        self.cfg = env_override(apply_tuned(PhysicsConfig(
            dt=DT, substeps=SUBSTEPS,
            solver="jacobi", narrowphase_once=False,
            broadphase="swept", broadphase_window=broadphase_window,
            # box-box SAT over unique edge DIRECTIONS (9 axis combos
            # instead of 144 edge pairs): pile's hulls are all boxes,
            # so the per-substep narrowphase — the measured step
            # bottleneck at this scale (round 5: ~4.7 ms of a 70 ms
            # step per narrowphase) — shrinks dramatically
            sat_tier="edge_dirs",
        ), self.name))
        # contact budget: a settled pile averages ~3-5 touching
        # neighbours per body + one floor contact each; mid-drop peaks
        # higher. Caps sized from measured occupancy with the
        # cap-saturation overflow signal as the guard (summary[5] — the
        # settle suite asserts it stays 0 through the worst-case
        # 7-layer drop): hh 2n / sp 3n measured clean with ~2x
        # headroom; the old 4n/5n budget doubled the solver's contact
        # lanes (C scales step cost: 70 -> 37 ms/step at 64 worlds).
        self.caps = caps or bp.CandidateCaps(
            hull_hull=2 * num_bodies,
            hull_plane=num_bodies + 8,
            sphere_any=3 * num_bodies,
        )
        # lattice spawn: ceil-cube layout covering num_bodies slots
        side = int(np.ceil(num_bodies ** (1.0 / 3.0)))
        self._lattice_side = side

        # static per-row object/response tables
        self._obj_row = np.asarray(
            [self.obj["plane"]] + [self.obj["wall"]] * 4
            + [
                (self.obj["box_s"], self.obj["box_l"],
                 self.obj["sphere"])[i % 3]
                for i in range(num_bodies)
            ],
            np.int32,
        )
        self._resp_row = np.asarray(
            [bodies.RESPONSE_STATIC] * N_STATIC
            + [bodies.RESPONSE_DYNAMIC] * num_bodies,
            np.int32,
        )

    @staticmethod
    def random_actions(rs, steps, num_worlds):
        return jnp.asarray(
            rs.randint(0, 5, (steps, num_worlds)), jnp.int32
        )

    # ------------------------------------------------------------ registry

    def register_types(self, reg: ECSRegistry):
        papi.register_types(reg, max_bodies=self.n_total)
        sm = reg._sm
        sm.archetypes[RIGID_BODY] = dataclasses.replace(
            sm.archetypes[RIGID_BODY], fixed_rows=True
        )
        reg.register_singleton("Action", (), jnp.int32)
        reg.register_singleton("Reward", (), jnp.float32)
        reg.register_singleton("Done", (), jnp.int32)
        reg.register_singleton("Reset", (), jnp.int32)
        reg.register_singleton("EpisodeStep", (), jnp.int32)
        reg.register_singleton("Summary", (6,), jnp.float32)
        reg.register_singleton("BroadphaseOverflow", (), jnp.int32)
        if self.body_obs:
            reg.register_singleton(
                "BodyObs", (self.num_bodies, 6), jnp.float32
            )
            reg.export_singleton("BodyObs", "body_obs")
        reg.import_singleton("Action", "action")
        reg.import_singleton("Reset", "reset")
        reg.export_singleton("Summary", "summary")
        reg.export_singleton("Reward", "reward")
        reg.export_singleton("Done", "done")

    def setup_tasks(self, b: TaskGraphBuilder):
        n_reset = b.custom(self._reset_system, name="pile_reset")
        n_act = b.custom(
            self._action_system, deps=[n_reset], name="pile_actions"
        )
        n_phys = papi.setup_physics_step_tasks(
            b, self.om, self.cfg, self.caps, deps=[n_act]
        )
        b.custom(self._post_system, deps=[n_phys], name="pile_post")

    def init_worlds(self, sm, state):
        singles = dict(state.singletons)
        singles["Done"] = jnp.ones_like(singles["Done"])
        return dataclasses.replace(state, singletons=singles)

    # ------------------------------------------------------------- systems

    def _reset_system(self, sm, state, node_key):
        s = dict(state.singletons)
        need = (s["Done"] > 0) | (s["Reset"] > 0)
        w = need.shape[0]
        nb, nt = self.num_bodies, self.n_total
        side = self._lattice_side

        # lattice slot centers (static, density < packing so the initial
        # state has no deep interpenetration)
        slot = np.arange(nb)
        gx = slot % side
        gy = (slot // side) % side
        gz = slot // (side * side)
        pitch = min(1.6, (2 * ARENA - 3.0) / side)
        base = -0.5 * (side - 1) * pitch
        lx = (base + gx * pitch).astype(np.float32)
        ly = (base + gy * pitch).astype(np.float32)
        lz = (2.0 + gz * pitch).astype(np.float32)

        k1 = _rng.split_i(node_key, jnp.full((w,), 1, jnp.uint32))
        k2 = _rng.split_i(node_key, jnp.full((w,), 2, jnp.uint32))
        k3 = _rng.split_i(node_key, jnp.full((w,), 3, jnp.uint32))
        # per-world scalar draws broadcast over bodies via per-body
        # splits of the per-world key
        bidx = jnp.arange(nb, dtype=jnp.uint32)

        def body_draws(kw):
            kb = _rng.split_i(
                jnp.broadcast_to(kw[:, None, :], (w, nb, 2)).reshape(-1, 2),
                jnp.tile(bidx, (w,)),
            )
            return _rng.sample_uniform(kb).reshape(w, nb)

        jx = (body_draws(k1) - 0.5) * 0.6 * pitch
        jy = (body_draws(k2) - 0.5) * 0.6 * pitch
        yaw = body_draws(k3) * (2 * np.pi)

        pos = jnp.zeros((w, nt, 3), jnp.float32)
        scale = jnp.ones((w, nt, 3), jnp.float32)
        wall_cfg = [
            ((-ARENA - 1, 0), (1.0, ARENA + 2)),
            ((ARENA + 1, 0), (1.0, ARENA + 2)),
            ((0, -ARENA - 1), (ARENA + 2, 1.0)),
            ((0, ARENA + 1), (ARENA + 2, 1.0)),
        ]
        for i, ((cx, cy), (sx, sy)) in enumerate(wall_cfg):
            pos = pos.at[:, 1 + i].set(jnp.array([cx, cy, WALL_H / 2]))
            scale = scale.at[:, 1 + i].set(jnp.array([sx, sy, WALL_H / 2]))
        dyn_pos = jnp.stack(
            [lx[None] + jx, ly[None] + jy,
             jnp.broadcast_to(jnp.asarray(lz)[None], (w, nb))],
            axis=-1,
        )
        pos = pos.at[:, N_STATIC:].set(dyn_pos)

        half = jnp.stack(
            [jnp.cos(yaw / 2), jnp.zeros_like(yaw), jnp.zeros_like(yaw),
             jnp.sin(yaw / 2)], axis=-1
        )
        rot = jnp.zeros((w, nt, 4), jnp.float32).at[..., 0].set(1.0)
        rot = rot.at[:, N_STATIC:].set(half)

        t = state.tables[RIGID_BODY]
        c = dict(t.columns)
        zeros3 = jnp.zeros((w, nt, 3), jnp.float32)

        def pick(new, old):
            sel = need.reshape((w,) + (1,) * (old.ndim - 1))
            return jnp.where(sel, jnp.asarray(new, old.dtype), old)

        c["Position"] = pick(pos, c["Position"])
        c["Rotation"] = pick(rot, c["Rotation"])
        c["Scale"] = pick(scale, c["Scale"])
        c["ObjectID"] = pick(
            jnp.broadcast_to(
                jnp.asarray(self._obj_row)[None], (w, nt)
            ),
            c["ObjectID"],
        )
        c["ResponseType"] = pick(
            jnp.broadcast_to(
                jnp.asarray(self._resp_row)[None], (w, nt)
            ),
            c["ResponseType"],
        )
        c["Velocity"] = {
            "linear": pick(zeros3, c["Velocity"]["linear"]),
            "angular": pick(zeros3, c["Velocity"]["angular"]),
        }
        c["ExternalForce"] = pick(zeros3, c["ExternalForce"])
        c["ExternalTorque"] = pick(zeros3, c["ExternalTorque"])
        tables = dict(state.tables)
        tables[RIGID_BODY] = dataclasses.replace(t, columns=c)

        singles = dict(s)
        singles["EpisodeStep"] = jnp.where(need, 0, s["EpisodeStep"])
        singles["BroadphaseOverflow"] = jnp.where(
            need, 0, s["BroadphaseOverflow"]
        )
        return dataclasses.replace(
            state, tables=tables, singletons=singles
        )

    def _action_system(self, sm, state, node_key):
        s = state.singletons
        act = s["Action"]                                 # [W]
        w = act.shape[0]
        # shake: delta-v on every dynamic body; encoded as an impulse
        # through Velocity (mass-independent shake, like a ground jolt)
        dir_tbl = jnp.asarray(
            [[0.0, 0.0], [1.0, 0.0], [-1.0, 0.0],
             [0.0, 1.0], [0.0, -1.0]], jnp.float32
        )
        dv2 = dir_tbl[jnp.clip(act, 0, 4)] * SHAKE_IMPULSE   # [W, 2]
        t = state.tables[RIGID_BODY]
        c = dict(t.columns)
        vel = c["Velocity"]["linear"]
        dv = jnp.concatenate(
            [dv2, jnp.zeros((w, 1), jnp.float32)], axis=-1
        )[:, None, :]
        dyn = (c["ResponseType"] == bodies.RESPONSE_DYNAMIC)[..., None]
        c["Velocity"] = {
            "linear": jnp.where(dyn, vel + dv, vel),
            "angular": c["Velocity"]["angular"],
        }
        tables = dict(state.tables)
        tables[RIGID_BODY] = dataclasses.replace(t, columns=c)
        return dataclasses.replace(state, tables=tables)

    def _post_system(self, sm, state, node_key):
        s = dict(state.singletons)
        t = state.tables[RIGID_BODY]
        pos = t.columns["Position"]
        vel = t.columns["Velocity"]["linear"]
        omega = t.columns["Velocity"]["angular"]
        dyn = t.columns["ResponseType"] == bodies.RESPONSE_DYNAMIC

        speed = jnp.linalg.norm(vel, axis=-1) + jnp.linalg.norm(
            omega, axis=-1
        )
        at_rest = dyn & (speed < REST_SPEED)
        n_dyn = jnp.maximum(jnp.sum(dyn, axis=1), 1)
        rest_frac = jnp.sum(at_rest, axis=1) / n_dyn

        z = jnp.where(dyn, pos[..., 2], 0.0)
        mean_h = jnp.sum(z, axis=1) / n_dyn
        max_h = jnp.max(jnp.where(dyn, pos[..., 2], -jnp.inf), axis=1)
        mean_sp = jnp.sum(jnp.where(dyn, speed, 0.0), axis=1) / n_dyn

        ep = s["EpisodeStep"] + 1
        shake_pen = (s["Action"] > 0).astype(jnp.float32) * 0.05
        reward = rest_frac.astype(jnp.float32) - shake_pen
        done = ep >= self.episode_len

        # sticky window-saturation flag written by the physics node
        overflow = s["BroadphaseOverflow"].astype(jnp.float32)

        s["Summary"] = jnp.stack(
            [mean_h, max_h, mean_sp, rest_frac.astype(jnp.float32),
             ep.astype(jnp.float32), overflow], axis=-1
        )
        if self.body_obs:
            s["BodyObs"] = jnp.concatenate(
                [pos[:, N_STATIC:], vel[:, N_STATIC:]], axis=-1
            )
        s["Reward"] = reward
        s["Done"] = done.astype(jnp.int32)
        s["EpisodeStep"] = ep
        return dataclasses.replace(state, singletons=s)
