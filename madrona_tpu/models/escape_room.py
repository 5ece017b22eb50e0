"""Escape Room: the flagship physics environment.

Capability-parity target for the reference ecosystem's
``madrona_escape_room`` example (the canonical Madrona benchmark env,
``/root/reference/README.md:33-40``): a 3-room hallway per world, two
agents that must press floor buttons — by standing on them or dragging
movable cubes onto them — to open each room's door and progress to the
exit. Full XPBD physics (agents, cubes, walls, doors are rigid bodies),
grab via dynamically-activated fixed joints, egocentric polar
observations, per-agent progress reward, 200-step episodes with full
level regeneration from the per-(world, step) Threefry stream on reset.

TPU design notes (vs the reference env's CUDA/ECS implementation):
  * The body table has a fixed 21-row layout per world (fixed_rows
    archetype) — level regeneration rewrites positions/scales, never
    allocates, so every step is one static-shape jitted function.
  * Random wall/door geometry is expressed through the per-entity Scale
    component scaling unit hulls — no per-world asset variation.
  * Agents use yaw-only inertia (inv_inertia = [0, 0, izz]) so they can
    never tip over — replacing the reference's constraint fixup.
  * Grab = writing one of two pre-reserved fixed-joint slots (one per
    agent) in the JointBuffer singleton; release = deactivating it.

Axis convention: z up, +y is hallway depth ("forward"), x is width.
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
from ..physics import joints as jt
from ..physics.xpbd import PhysicsConfig
from ..render.raycast import trace_rays_obb
from ..utils import math3d as m3
from ..utils import rng as _rng
from .base import EnvBase

# ----------------------------------------------------------------- layout

N_ROOMS = 3
CUBES_PER_ROOM = 2
BUTTONS_PER_ROOM = 2
N_AGENTS = 2
N_CUBES = N_ROOMS * CUBES_PER_ROOM
N_BUTTONS = N_ROOMS * BUTTONS_PER_ROOM

ROOM_LEN = 20.0
WORLD_WIDTH = 18.0
HALL_LEN = N_ROOMS * ROOM_LEN          # 60
DOOR_GAP = 3.0                          # door opening width
WALL_HEIGHT = 2.0
BUTTON_RADIUS = 1.6

# body-table row map (fixed layout; see module docstring)
ROW_FLOOR = 0
ROW_LWALL = 1
ROW_RWALL = 2
ROW_BWALL = 3
ROW_SEP0 = 4                            # per room i: A, B, door
ROW_CUBE0 = ROW_SEP0 + 3 * N_ROOMS      # 13
ROW_AGENT0 = ROW_CUBE0 + N_CUBES        # 19
N_BODIES = ROW_AGENT0 + N_AGENTS        # 21

EPISODE_LEN = 200
DT = 0.04
SUBSTEPS = 4

MOVE_FORCE = 70.0                       # N at move_amount == 3
TURN_SPEED = 2.5                        # rad/s at |rotate - 2| == 2
GRAB_RANGE = 2.5                        # max distance hand -> cube center
MAX_SPEED = 9.0                         # agent linear speed clamp

AGENT_HALF = (0.4, 0.4, 0.8)
CUBE_HALF = 0.55
AGENT_Z = AGENT_HALF[2]
CUBE_Z = CUBE_HALF

PROGRESS_REWARD = 0.05                  # per unit of new max-y progress
STEP_PENALTY = 0.005
LIDAR_RAYS = 30                         # reference env: 30-sample lidar ring

RIGID_BODY = papi.RIGID_BODY


def _make_objects():
    reg = bodies.ObjectRegistry()
    ids = {}
    ids["plane"] = reg.add_plane(mu_s=1.0, mu_d=0.8)
    ids["wall"] = reg.add_box(
        [1.0, 1.0, 1.0], mass=0.0, response=bodies.RESPONSE_STATIC,
        mu_s=0.6, mu_d=0.6,
    )
    ids["cube"] = reg.add_box(
        [CUBE_HALF] * 3, mass=1.0, mu_s=0.8, mu_d=0.6,
    )
    # agent: yaw-only inertia so contacts can never tip it
    from ..physics import geo
    he = np.asarray(AGENT_HALF, np.float32)
    ex, ey, ez = (2 * he).tolist()
    izz = 1.0 * (ex * ex + ey * ey) / 12.0
    ids["agent"] = reg.add_hull(
        geo.box_hull(he), mass=1.0, mu_s=0.4, mu_d=0.3,
        inertia_diag=np.array([np.inf, np.inf, izz], np.float32),
    )
    return reg.build(), ids


# shared in utils.math3d (both envs use the same yaw-only heading)
_yaw_quat = m3.quat_yaw_only
_quat_yaw = m3.yaw_of_quat


class EscapeRoom(EnvBase):
    name = "escape_room"
    num_agents = N_AGENTS
    action_is_discrete = True
    # per-agent action: (move_amount 0-3, move_angle 0-7, rotate 0-4, grab 0-1)
    action_shape = (N_AGENTS, 4)
    action_buckets = (4, 8, 5, 2)

    def __init__(self):
        import jax

        from ..utils.config import apply_tuned, env_override

        self.om, self.obj = _make_objects()
        # knob precedence: constructor defaults below (measured once by
        # hand) < committed tuning table (scripts/tune_kernels.py, the
        # reference's cached-launch-config analogue) < MADRONA_TPU_* env
        self.cfg = env_override(apply_tuned(PhysicsConfig(
            dt=DT, substeps=SUBSTEPS, gravity=(0.0, 0.0, -9.8),
            # ONE position pass per substep — the reference's count
            # (solvePositions is a single ParallelForNode per substep,
            # src/physics/xpbd.cpp:1116-1119); the whole behavior suite
            # passes at 1, and the solve kernel is ~30% cheaper than
            # the round-1..3 default of 2
            jacobi_iters=1,
            # contacts once per step (Small-Steps style): 1.7x faster,
            # behavior covered by this env's test suite
            narrowphase_once=True,
            # whole-substep Pallas megakernel: measured 161.8k -> 389.3k
            # steps/s on one v5e chip; on CPU backends the XLA path is
            # the fast one (interpret-mode pallas is for parity tests)
            megakernel=jax.default_backend() != "cpu",
            # contacts megakernel: hh SAT + hull-plane lane + avg/max-pen
            # assembly in ONE kernel emitting the solver's planar buffers
            # (supersedes the round-3 pallas_sublane tier + XLA hp lane)
            narrowphase=(
                "pallas_mega" if jax.default_backend() != "cpu"
                else "xla"
            ),
            # VMEM-resident all-pairs broadphase + compaction kernel
            # (bit-identical candidates; kills the [W, 210]-pair XLA
            # intermediates that profiled at ~0.4 ms/step at 2048 worlds)
            broadphase=(
                "pallas" if jax.default_backend() != "cpu" else "all_pairs"
            ),
            # rows 0..12 (floor/walls/separators/doors) are always
            # RESPONSE_STATIC; only cubes+agents can move — the solver
            # kernel specializes its gather/scatter to these 8 rows
            solver_dynamic_range=(ROW_CUBE0, N_BODIES),
            # contact lanes >= hull_hull cap (8) are the hull-plane
            # segment, whose ref row is ALWAYS the static floor plane:
            # the solver kernel skips their per-substep ref-side
            # gathers/scatters (exact under the dyn-range split)
            solver_ref_dyn_lanes=8,
        ), self.name))
        # measured occupancy over random rollouts: max 3 hull-hull and 8
        # hull-plane candidates; 8 gives 2.6x headroom (overflow drops
        # contacts for a step — soft failure, surfaced via
        # Candidates.overflow) and exactly one narrowphase pair tile
        # sphere_any=0: this env has NO sphere prims, so the sphere lane
        # is disabled entirely — the contact buffer becomes C=16 (8 hh +
        # 8 hp), exactly two 8-sublane vregs per contact plane in the
        # solver kernel instead of three at C=17 (measured win on v5e)
        self.caps = bp.CandidateCaps(hull_hull=8, hull_plane=8, sphere_any=0)
        # lidar scene: walls/doors/cubes/partner as oriented boxes scaled
        # by the body Scale column (rows 1..N-1; the floor plane is not a
        # lidar target, matching the reference's horizontal ring). The
        # trace is the exact ray-OBB slab test (render/raycast.py::
        # trace_rays_obb) — every lidar target is a box, so the 12-tri
        # Möller–Trumbore sweep collapses to one slab test per
        # (box, ray); equivalence vs the mesh tracer is pinned by
        # tests/test_render.py::test_obb_lidar_matches_box_mesh.
        self._lidar_tmax = HALL_LEN * 2.0
        # TPU: trace in the Pallas lidar kernel (ops/lidar_pallas);
        # CPU: the XLA path is both faster and the kernel's oracle
        self._lidar_pallas = jax.default_backend() != "cpu"

    @staticmethod
    def random_actions(rs, steps, num_worlds):
        cols = [
            rs.randint(0, hi, (steps, num_worlds, N_AGENTS))
            for hi in EscapeRoom.action_buckets
        ]
        return jnp.asarray(np.stack(cols, axis=-1), jnp.int32)

    # ------------------------------------------------------------ registry

    def register_types(self, reg: ECSRegistry):
        papi.register_types(reg, max_bodies=N_BODIES)
        papi.register_joint_types(reg, max_joints=N_AGENTS)
        # make the RigidBody archetype fixed-layout (every row always live)
        sm = reg._sm
        spec = sm.archetypes[RIGID_BODY]
        sm.archetypes[RIGID_BODY] = dataclasses.replace(
            spec, fixed_rows=True
        )

        reg.register_singleton("Action", (N_AGENTS, 4), jnp.int32)
        reg.register_singleton("Reward", (N_AGENTS,), jnp.float32)
        reg.register_singleton("Done", (), jnp.int32)
        reg.register_singleton("Reset", (), jnp.int32)
        reg.register_singleton("EpisodeStep", (), jnp.int32)
        reg.register_singleton("Progress", (N_AGENTS,), jnp.float32)
        reg.register_singleton("Grabbed", (N_AGENTS,), jnp.int32)  # cube row or -1
        reg.register_singleton("ButtonPos", (N_BUTTONS, 2), jnp.float32)
        reg.register_singleton("ButtonPressed", (N_BUTTONS,), jnp.int32)
        reg.register_singleton("DoorOpen", (N_ROOMS,), jnp.int32)
        reg.register_singleton("DoorX", (N_ROOMS,), jnp.float32)

        # observations (computed by the obs system, exported zero-copy)
        reg.register_singleton("SelfObs", (N_AGENTS, 8), jnp.float32)
        reg.register_singleton("PartnerObs", (N_AGENTS, 3), jnp.float32)
        reg.register_singleton(
            "EntityObs", (N_AGENTS, N_CUBES + N_BUTTONS, 4), jnp.float32
        )
        reg.register_singleton("DoorObs", (N_AGENTS, N_ROOMS, 4), jnp.float32)
        reg.register_singleton("Lidar", (N_AGENTS, LIDAR_RAYS), jnp.float32)
        flat_dim = (
            8 + 3 + (N_CUBES + N_BUTTONS) * 4 + N_ROOMS * 4 + LIDAR_RAYS
        )
        reg.register_singleton(
            "FlatObs", (N_AGENTS, flat_dim), jnp.float32
        )

        reg.import_singleton("Action", "action")
        reg.import_singleton("Reset", "reset")
        reg.export_singleton("FlatObs", "flat_obs")
        reg.export_singleton("SelfObs", "self_obs")
        reg.export_singleton("PartnerObs", "partner_obs")
        reg.export_singleton("EntityObs", "entity_obs")
        reg.export_singleton("DoorObs", "door_obs")
        reg.export_singleton("Lidar", "lidar")
        reg.export_singleton("Reward", "reward")
        reg.export_singleton("Done", "done")
        reg.export_singleton("EpisodeStep", "steps_taken")
        reg.export_singleton("DoorOpen", "door_open")

    # --------------------------------------------------------------- tasks

    def setup_tasks(self, b: TaskGraphBuilder):
        n_reset = b.custom(self._reset_system, name="er_reset")
        n_act = b.custom(self._action_system, deps=[n_reset], name="er_actions")
        n_door = b.custom(self._door_system, deps=[n_act], name="er_doors")
        n_phys = papi.setup_physics_step_tasks(
            b, self.om, self.cfg, self.caps, deps=[n_door]
        )
        b.custom(self._post_system, deps=[n_phys], name="er_post")

    def init_worlds(self, sm, state):
        singles = dict(state.singletons)
        singles["Done"] = jnp.ones_like(singles["Done"])  # force first reset
        return dataclasses.replace(state, singletons=singles)

    # ------------------------------------------------------------- systems

    def _reset_system(self, sm, state, node_key):
        """Regenerate done/reset worlds from the RNG stream: door x
        positions, button/cube placements, agents at start."""
        need = (state.singletons["Done"] > 0) | (
            state.singletons["Reset"] > 0
        )
        w = need.shape[0]

        draws = []
        for i in range(3 + 2 * N_BUTTONS + 2 * N_CUBES):
            k = _rng.split_i(node_key, jnp.full((w,), i, jnp.uint32))
            draws.append(_rng.sample_uniform(k))
        di = iter(draws)

        x_lim = WORLD_WIDTH / 2.0
        door_x = jnp.stack(
            [next(di) * (WORLD_WIDTH - 2 * DOOR_GAP) - (x_lim - DOOR_GAP)
             for _ in range(N_ROOMS)], axis=-1
        )  # [W, 3]
        def room_xy(room):
            x = next(di) * (WORLD_WIDTH - 5.0) - (x_lim - 2.5)
            y = room * ROOM_LEN + 2.5 + next(di) * (ROOM_LEN - 6.0)
            return jnp.stack([x, y], axis=-1)

        button_pos = jnp.stack(
            [room_xy(i // BUTTONS_PER_ROOM) for i in range(N_BUTTONS)],
            axis=1,
        )  # [W, 6, 2]
        cube_xy = jnp.stack(
            [room_xy(i // CUBES_PER_ROOM) for i in range(N_CUBES)], axis=1
        )  # [W, 6, 2]

        # ---- assemble the fresh body layout [W, 21, ...]
        pos = jnp.zeros((w, N_BODIES, 3), jnp.float32)
        scale = jnp.ones((w, N_BODIES, 3), jnp.float32)
        # floor at origin (infinite plane, +z normal)
        # side walls
        pos = pos.at[:, ROW_LWALL].set(
            jnp.array([-(x_lim + 1.0), HALL_LEN / 2, WALL_HEIGHT / 2])
        )
        pos = pos.at[:, ROW_RWALL].set(
            jnp.array([x_lim + 1.0, HALL_LEN / 2, WALL_HEIGHT / 2])
        )
        wall_side_scale = jnp.array(
            [1.0, HALL_LEN / 2 + 1.0, WALL_HEIGHT / 2]
        )
        scale = scale.at[:, ROW_LWALL].set(wall_side_scale)
        scale = scale.at[:, ROW_RWALL].set(wall_side_scale)
        # back wall
        pos = pos.at[:, ROW_BWALL].set(
            jnp.array([0.0, -1.0, WALL_HEIGHT / 2])
        )
        scale = scale.at[:, ROW_BWALL].set(
            jnp.array([x_lim, 1.0, WALL_HEIGHT / 2])
        )
        # separators + doors
        for i in range(N_ROOMS):
            y = (i + 1) * ROOM_LEN
            dx = door_x[:, i]
            a_lo, a_hi = -x_lim, dx - DOOR_GAP / 2
            b_lo, b_hi = dx + DOOR_GAP / 2, x_lim
            ra, rb, rd = ROW_SEP0 + 3 * i, ROW_SEP0 + 3 * i + 1, ROW_SEP0 + 3 * i + 2
            pos = pos.at[:, ra].set(
                jnp.stack(
                    [(a_lo + a_hi) / 2, jnp.full_like(dx, y),
                     jnp.full_like(dx, WALL_HEIGHT / 2)], axis=-1
                )
            )
            scale = scale.at[:, ra].set(
                jnp.stack(
                    [(a_hi - a_lo) / 2, jnp.full_like(dx, 0.4),
                     jnp.full_like(dx, WALL_HEIGHT / 2)], axis=-1
                )
            )
            pos = pos.at[:, rb].set(
                jnp.stack(
                    [(b_lo + b_hi) / 2, jnp.full_like(dx, y),
                     jnp.full_like(dx, WALL_HEIGHT / 2)], axis=-1
                )
            )
            scale = scale.at[:, rb].set(
                jnp.stack(
                    [(b_hi - b_lo) / 2, jnp.full_like(dx, 0.4),
                     jnp.full_like(dx, WALL_HEIGHT / 2)], axis=-1
                )
            )
            pos = pos.at[:, rd].set(
                jnp.stack(
                    [dx, jnp.full_like(dx, y),
                     jnp.full_like(dx, WALL_HEIGHT / 2)], axis=-1
                )
            )
            scale = scale.at[:, rd].set(
                jnp.array([DOOR_GAP / 2 - 0.05, 0.35, WALL_HEIGHT / 2])
            )
        # cubes
        cube_pos = jnp.concatenate(
            [cube_xy, jnp.full((w, N_CUBES, 1), CUBE_Z)], axis=-1
        )
        pos = pos.at[:, ROW_CUBE0:ROW_CUBE0 + N_CUBES].set(cube_pos)
        # agents at the hallway start
        for a in range(N_AGENTS):
            pos = pos.at[:, ROW_AGENT0 + a].set(
                jnp.array([-2.0 + 4.0 * a, 1.5, AGENT_Z])
            )

        rot = jnp.zeros((w, N_BODIES, 4), jnp.float32).at[..., 0].set(1.0)
        # agents face +y (yaw 0 == fwd) already; identity rotation
        obj_id = jnp.asarray(
            np.array(
                [self.obj["plane"]]
                + [self.obj["wall"]] * 3
                + [self.obj["wall"]] * (3 * N_ROOMS)
                + [self.obj["cube"]] * N_CUBES
                + [self.obj["agent"]] * N_AGENTS,
                np.int32,
            )
        )
        obj_id = jnp.broadcast_to(obj_id[None], (w, N_BODIES))
        response = jnp.asarray(
            np.array(
                [bodies.RESPONSE_STATIC] * (4 + 3 * N_ROOMS)
                + [bodies.RESPONSE_DYNAMIC] * (N_CUBES + N_AGENTS),
                np.int32,
            )
        )
        response = jnp.broadcast_to(response[None], (w, N_BODIES))

        t = state.tables[RIGID_BODY]
        c = dict(t.columns)
        sel = need[:, None, None]

        def pick(new, old):
            return jnp.where(
                sel if new.ndim == 3 else need[:, None], new, old
            )

        zeros3 = jnp.zeros((w, N_BODIES, 3), jnp.float32)
        c["Position"] = pick(pos, c["Position"])
        c["Rotation"] = pick(rot, c["Rotation"])
        c["Scale"] = pick(scale, c["Scale"])
        c["ObjectID"] = pick(obj_id, c["ObjectID"])
        c["ResponseType"] = pick(response, c["ResponseType"])
        c["Velocity"] = {
            "linear": pick(zeros3, c["Velocity"]["linear"]),
            "angular": pick(zeros3, c["Velocity"]["angular"]),
        }
        c["ExternalForce"] = pick(zeros3, c["ExternalForce"])
        c["ExternalTorque"] = pick(zeros3, c["ExternalTorque"])

        tables = dict(state.tables)
        tables[RIGID_BODY] = dataclasses.replace(t, columns=c)

        singles = dict(state.singletons)
        singles["EpisodeStep"] = jnp.where(
            need, 0, state.singletons["EpisodeStep"]
        )
        singles["Progress"] = jnp.where(
            need[:, None],
            jnp.full((w, N_AGENTS), 1.5, jnp.float32),
            state.singletons["Progress"],
        )
        singles["Grabbed"] = jnp.where(
            need[:, None], -1, state.singletons["Grabbed"]
        )
        singles["ButtonPos"] = jnp.where(
            need[:, None, None], button_pos, state.singletons["ButtonPos"]
        )
        singles["DoorX"] = jnp.where(
            need[:, None], door_x, state.singletons["DoorX"]
        )
        # deactivate grab joints of reset worlds
        jb = dict(state.singletons[papi.JOINT_BUFFER])
        jb["active"] = jnp.where(
            need[:, None], False, jb["active"]
        )
        singles[papi.JOINT_BUFFER] = jb
        return dataclasses.replace(state, tables=tables, singletons=singles)

    def _action_system(self, sm, state, node_key):
        """Decode discrete actions -> external force/torque on agent rows;
        manage grab joints (activate on grab=1, release on grab=0)."""
        act = state.singletons["Action"]              # [W, A, 4]
        t = state.tables[RIGID_BODY]
        pos = t.columns["Position"]                   # [W, 21, 3]
        rotq = t.columns["Rotation"]
        w = act.shape[0]

        a_pos = pos[:, ROW_AGENT0:ROW_AGENT0 + N_AGENTS]      # [W, A, 3]
        a_rot = rotq[:, ROW_AGENT0:ROW_AGENT0 + N_AGENTS]     # [W, A, 4]
        yaw = _quat_yaw(a_rot)                                # [W, A]

        move_amount = act[..., 0].astype(jnp.float32) / 3.0
        move_angle = act[..., 1].astype(jnp.float32) * (jnp.pi / 4.0)
        turn = (act[..., 2].astype(jnp.float32) - 2.0) / 2.0
        grab = act[..., 3] > 0

        # move_angle is relative to facing; angle 0 = forward (+y local)
        ang = yaw + move_angle
        f = MOVE_FORCE * move_amount
        force = jnp.stack(
            [-f * jnp.sin(ang), f * jnp.cos(ang), jnp.zeros_like(f)],
            axis=-1,
        )
        # rotation is velocity-controlled: the action sets agent omega_z
        # directly (no torque integration — a torque impulse would spin
        # forever since nothing damps free rotation)
        ext_f = t.columns["ExternalForce"]
        ext_f = ext_f.at[:, ROW_AGENT0:ROW_AGENT0 + N_AGENTS].set(force)
        omega = t.columns["Velocity"]["angular"]
        omega = omega.at[:, ROW_AGENT0:ROW_AGENT0 + N_AGENTS].set(
            jnp.stack(
                [jnp.zeros_like(turn), jnp.zeros_like(turn),
                 TURN_SPEED * turn], axis=-1,
            )
        )

        # ---- grab handling
        grabbed = state.singletons["Grabbed"]        # [W, A] cube row or -1
        cube_pos = pos[:, ROW_CUBE0:ROW_CUBE0 + N_CUBES]      # [W, 6, 3]
        fwd = jnp.stack(
            [-jnp.sin(yaw), jnp.cos(yaw), jnp.zeros_like(yaw)], axis=-1
        )
        hand = a_pos + fwd * 0.8                             # [W, A, 3]
        d2 = jnp.sum(
            (cube_pos[:, None, :, :] - hand[:, :, None, :]) ** 2, axis=-1
        )  # [W, A, C]
        # a cube already held by anyone is not grabbable
        held_any = jnp.any(
            grabbed[:, :, None]
            == (ROW_CUBE0 + jnp.arange(N_CUBES))[None, None, :],
            axis=1,
        )  # [W, C]
        d2 = jnp.where(held_any[:, None, :], jnp.inf, d2)
        nearest = jnp.argmin(d2, axis=-1)                    # [W, A]
        near_ok = jnp.take_along_axis(
            d2, nearest[..., None], axis=-1
        )[..., 0] <= GRAB_RANGE**2

        want_new = grab & (grabbed < 0) & near_ok
        # agent 0 wins ties on the same cube (sequential claim)
        claim0 = want_new[:, 0]
        same = (nearest[:, 1] == nearest[:, 0]) & claim0
        want_new = want_new.at[:, 1].set(want_new[:, 1] & ~same)

        new_grabbed = jnp.where(
            want_new, ROW_CUBE0 + nearest,
            jnp.where(grab, grabbed, -1),
        )

        # write the per-agent fixed-joint slots
        jb = papi.joints_view(state)
        widx = jnp.arange(w)
        for a in range(N_AGENTS):
            row = new_grabbed[:, a]
            on = row >= 0
            srow = jnp.clip(row, 0, N_BODIES - 1)
            q1 = a_rot[:, a]
            q2 = rotq[widx, srow]
            x1 = a_pos[:, a]
            x2 = pos[widx, srow]
            # lock current relative pose: o1 = q1*aq1 == q2 -> aq1 = q1^-1 q2
            aq1 = m3.quat_normalize(m3.quat_mul(m3.quat_inv(q1), q2))
            aq2 = jnp.broadcast_to(
                jnp.array([1.0, 0, 0, 0], jnp.float32), (w, 4)
            )
            mid = 0.5 * (x1 + x2)
            r1 = m3.quat_rotate(m3.quat_inv(q1), mid - x1)
            r2 = m3.quat_rotate(m3.quat_inv(q2), mid - x2)
            # keep previous joint params where the grab persists
            fresh = want_new[:, a]
            def keep(new, old):
                sel = fresh.reshape((w,) + (1,) * (new.ndim - 1))
                return jnp.where(sel, new, old)
            jb = dataclasses.replace(
                jb,
                e1=jb.e1.at[:, a].set(
                    jnp.where(on, ROW_AGENT0 + a, -1)
                ),
                e2=jb.e2.at[:, a].set(jnp.where(on, srow, -1)),
                jtype=jb.jtype.at[:, a].set(jt.JOINT_FIXED),
                r1=jb.r1.at[:, a].set(keep(r1, jb.r1[:, a])),
                r2=jb.r2.at[:, a].set(keep(r2, jb.r2[:, a])),
                attach_q1=jb.attach_q1.at[:, a].set(
                    keep(aq1, jb.attach_q1[:, a])
                ),
                attach_q2=jb.attach_q2.at[:, a].set(
                    keep(aq2, jb.attach_q2[:, a])
                ),
                separation=jb.separation.at[:, a].set(0.0),
                active=jb.active.at[:, a].set(on),
            )

        state = papi.write_joints(state, jb)
        tables = dict(state.tables)
        cols = dict(t.columns)
        cols["ExternalForce"] = ext_f
        cols["Velocity"] = {
            "linear": t.columns["Velocity"]["linear"], "angular": omega,
        }
        tables[RIGID_BODY] = dataclasses.replace(
            state.tables[RIGID_BODY], columns=cols
        )
        singles = dict(state.singletons)
        singles["Grabbed"] = new_grabbed
        return dataclasses.replace(state, tables=tables, singletons=singles)

    def _door_system(self, sm, state, node_key):
        """Buttons are pressed while any agent or cube stands on them; a
        room's door is open iff all its buttons are pressed. Doors are
        static bodies teleported below the floor while open."""
        t = state.tables[RIGID_BODY]
        pos = t.columns["Position"]
        bpos = state.singletons["ButtonPos"]          # [W, 6, 2]

        press_rows = jnp.concatenate(
            [pos[:, ROW_CUBE0:ROW_CUBE0 + N_CUBES],
             pos[:, ROW_AGENT0:ROW_AGENT0 + N_AGENTS]], axis=1
        )  # [W, 8, 3]
        d2 = jnp.sum(
            (press_rows[:, None, :, :2] - bpos[:, :, None, :]) ** 2,
            axis=-1,
        )  # [W, 6, 8]
        low = press_rows[:, None, :, 2] < 1.8
        pressed = jnp.any((d2 <= BUTTON_RADIUS**2) & low, axis=-1)  # [W, 6]
        pressed_i = pressed.astype(jnp.int32)
        open_ = jnp.all(
            pressed.reshape(pressed.shape[0], N_ROOMS, BUTTONS_PER_ROOM),
            axis=-1,
        )  # [W, 3]

        door_rows = ROW_SEP0 + 3 * jnp.arange(N_ROOMS) + 2
        door_z = jnp.where(open_, -5.0, WALL_HEIGHT / 2)       # [W, 3]
        new_pos = pos.at[:, door_rows, 2].set(door_z)

        tables = dict(state.tables)
        cols = dict(t.columns)
        cols["Position"] = new_pos
        tables[RIGID_BODY] = dataclasses.replace(t, columns=cols)
        singles = dict(state.singletons)
        singles["ButtonPressed"] = pressed_i
        singles["DoorOpen"] = open_.astype(jnp.int32)
        return dataclasses.replace(state, tables=tables, singletons=singles)

    def _post_system(self, sm, state, node_key):
        """Post-physics: clamp agent speed, compute observations, reward,
        done."""
        t = state.tables[RIGID_BODY]
        pos = t.columns["Position"]
        rotq = t.columns["Rotation"]
        vel = t.columns["Velocity"]["linear"]
        w = pos.shape[0]

        # agent speed clamp (keeps the solver in a friendly regime)
        a_sl = slice(ROW_AGENT0, ROW_AGENT0 + N_AGENTS)
        a_vel = vel[:, a_sl]
        speed = jnp.linalg.norm(a_vel[..., :2], axis=-1, keepdims=True)
        scale_v = jnp.minimum(1.0, MAX_SPEED / jnp.maximum(speed, 1e-6))
        a_vel = a_vel.at[..., :2].multiply(scale_v)
        vel = vel.at[:, a_sl].set(a_vel)

        a_pos = pos[:, a_sl]                                  # [W, A, 3]
        a_rot = rotq[:, a_sl]
        yaw = _quat_yaw(a_rot)

        def egocentric(target_xy):
            """(dist, sin, cos) of target rel to agent facing. Accepts
            [W, A, 2] or [W, A, K, 2] targets."""
            extra = target_xy.ndim - 3
            a_xy = a_pos[..., :2].reshape(
                (w, N_AGENTS) + (1,) * extra + (2,)
            )
            yw = yaw.reshape((w, N_AGENTS) + (1,) * extra)
            rel = target_xy - a_xy
            dist = jnp.linalg.norm(rel, axis=-1)
            world_ang = jnp.arctan2(-rel[..., 0], rel[..., 1])
            loc = world_ang - yw
            return dist, jnp.sin(loc), jnp.cos(loc)

        # self obs
        grabbed = state.singletons["Grabbed"]
        steps = state.singletons["EpisodeStep"]
        self_obs = jnp.stack(
            [
                a_pos[..., 0] / (WORLD_WIDTH / 2),
                a_pos[..., 1] / HALL_LEN,
                a_pos[..., 2],
                jnp.sin(yaw),
                jnp.cos(yaw),
                a_vel[..., 0] / MAX_SPEED,
                a_vel[..., 1] / MAX_SPEED,
                (grabbed >= 0).astype(jnp.float32),
            ],
            axis=-1,
        )

        # partner obs (other agent, egocentric)
        other = a_pos[:, ::-1, :2]
        d, s, c = egocentric(other)
        partner_obs = jnp.stack([d / HALL_LEN, s, c], axis=-1)

        # entity obs: cubes then buttons
        cube_xy = pos[:, ROW_CUBE0:ROW_CUBE0 + N_CUBES, :2]
        but_xy = state.singletons["ButtonPos"]
        ent_xy = jnp.concatenate([cube_xy, but_xy], axis=1)   # [W, 12, 2]
        d, s, c = egocentric(ent_xy[:, None, :, :].repeat(N_AGENTS, 1))
        ent_flag = jnp.concatenate(
            [
                jnp.zeros((w, N_CUBES), jnp.float32),
                state.singletons["ButtonPressed"].astype(jnp.float32),
            ],
            axis=-1,
        )
        entity_obs = jnp.stack(
            [d / HALL_LEN, s, c,
             jnp.broadcast_to(ent_flag[:, None, :], d.shape)], axis=-1
        )

        # door obs
        door_xy = jnp.stack(
            [state.singletons["DoorX"],
             (jnp.arange(N_ROOMS, dtype=jnp.float32) + 1.0)[None, :]
             .repeat(w, 0) * ROOM_LEN], axis=-1
        )
        d, s, c = egocentric(door_xy[:, None, :, :].repeat(N_AGENTS, 1))
        door_obs = jnp.stack(
            [d / HALL_LEN, s, c,
             jnp.broadcast_to(
                 state.singletons["DoorOpen"].astype(jnp.float32)[:, None, :],
                 d.shape,
             )], axis=-1
        )

        # lidar: 30-ray horizontal ring per agent against all solid
        # bodies (walls/doors/cubes/agents as scaled oriented boxes; open
        # doors sit below the ring so rays pass through) — the
        # reference env's lidarSystem, via the exact ray-OBB slab test
        lidar_rows = jnp.arange(1, N_BODIES)      # skip the floor plane
        inst_pos = pos[:, lidar_rows]
        inst_rot = rotq[:, lidar_rows]
        inst_scale = t.columns["Scale"][:, lidar_rows]
        # cubes/agents are unit boxes scaled by Scale==1; use their true
        # half extents
        half = jnp.asarray(
            [1.0] * (ROW_CUBE0 - 1) + [CUBE_HALF] * N_CUBES
            + [1.0] * N_AGENTS, jnp.float32,
        )
        agent_he = jnp.asarray(AGENT_HALF, jnp.float32)
        inst_scale = inst_scale * half[None, :, None]
        inst_scale = inst_scale.at[:, -N_AGENTS:].set(agent_he[None, None, :])

        ang = (
            yaw[..., None]
            + jnp.arange(LIDAR_RAYS) * (2 * jnp.pi / LIDAR_RAYS)
        )  # [W, A, R]
        dirs = jnp.stack(
            [-jnp.sin(ang), jnp.cos(ang), jnp.zeros_like(ang)], axis=-1
        )                                              # [W, A, R, 3]
        # self-exclusion per agent via the instance mask (the reference
        # lidarSystem skips the caster entity); instance i = body row
        # i+1 (the floor plane is row 0 and not a lidar target)
        self_mask_np = ~(
            np.arange(1, N_BODIES)[None, :]
            == (ROW_AGENT0 + np.arange(N_AGENTS))[:, None]
        )                                              # [A, N-1]

        if self._lidar_pallas:
            # VMEM-resident Pallas trace (ops/lidar_pallas) — bit-matches
            # the XLA slab-test path below, without its [W,A,I,R,3]-class
            # HBM intermediates (measured ~0.45 -> ~0.06 ms/step on v5e)
            from ..ops.lidar_pallas import lidar_obb

            depth = lidar_obb(
                inst_pos, inst_rot, inst_scale, self_mask_np,
                a_pos, dirs, self._lidar_tmax, interpret=False,
            )
        else:
            self_mask = jnp.asarray(self_mask_np)
            origins = jnp.broadcast_to(
                a_pos[:, :, None, :], (w, N_AGENTS, LIDAR_RAYS, 3)
            )

            def per_world(ip, ir, isc, origins_w, dirs_w):
                return jax.vmap(
                    lambda m, o, d: trace_rays_obb(
                        ip, ir, isc, m, o, d, self._lidar_tmax
                    )
                )(self_mask, origins_w, dirs_w)

            depth = jax.vmap(per_world)(
                inst_pos, inst_rot, inst_scale, origins, dirs
            )                                          # [W, A, R]
        lidar = jnp.minimum(depth / HALL_LEN, 1.0)

        # reward: new max-y progress per agent, minus step penalty
        prev = state.singletons["Progress"]
        cur_y = a_pos[..., 1]
        new_prog = jnp.maximum(prev, cur_y)
        reward = PROGRESS_REWARD * (new_prog - prev) - STEP_PENALTY

        ep = steps + 1
        done = ep >= EPISODE_LEN

        tables = dict(state.tables)
        cols = dict(t.columns)
        cols["Velocity"] = {"linear": vel, "angular": t.columns["Velocity"]["angular"]}
        tables[RIGID_BODY] = dataclasses.replace(t, columns=cols)
        singles = dict(state.singletons)
        singles["SelfObs"] = self_obs
        singles["PartnerObs"] = partner_obs
        singles["EntityObs"] = entity_obs
        singles["DoorObs"] = door_obs
        singles["Lidar"] = lidar
        # learner-friendly flat view: one [A, D] vector per agent, so a
        # T-step rollout stacks to [T, W, A, D] with no per-field
        # trailing-dim tile padding (the exports above stay for parity)
        w_ = self_obs.shape[0]
        singles["FlatObs"] = jnp.concatenate(
            [
                self_obs.reshape(w_, N_AGENTS, -1),
                partner_obs.reshape(w_, N_AGENTS, -1),
                entity_obs.reshape(w_, N_AGENTS, -1),
                door_obs.reshape(w_, N_AGENTS, -1),
                lidar.reshape(w_, N_AGENTS, -1),
            ],
            axis=-1,
        )
        singles["Progress"] = new_prog
        singles["Reward"] = reward
        singles["EpisodeStep"] = ep
        singles["Done"] = done.astype(jnp.int32)
        return dataclasses.replace(state, tables=tables, singletons=singles)
