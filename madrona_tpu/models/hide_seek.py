"""Hide & Seek: team-based physics env with pixel observations.

Capability-parity target for the reference ecosystem's ``gpu_hideseek``
example (``/root/reference/README.md:36-39``, the engine-scale design
point of 16k worlds — tracing.hpp:26-28): hiders and seekers in a walled
arena with movable boxes and climbable ramps, both grabbable and
team-lockable (a lock is owned by the locking team; only that team can
unlock); a prep phase where only hiders act; per-step team rewards
driven by occlusion-aware visibility; per-agent RGBD camera
observations rendered by the batch raycaster.

Simplifications vs the full game (documented): visibility =
line-of-sight ray + ±60° facing cone instead of the reference's
view-frustum test chain.

Actions per agent: (move_amount 0-3, move_angle 0-7, rotate 0-4,
grab 0-1, lock 0-1). Agents 0..NH-1 are hiders, the rest seekers.
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
from ..render import MeshRegistry, RenderConfig, RenderingSystem
from ..render.raycast import _trace_rays
from ..utils import math3d as m3
from ..utils import rng as _rng
from .base import EnvBase

N_HIDERS = 2
N_SEEKERS = 2
N_AGENTS = N_HIDERS + N_SEEKERS
N_BOXES = 3
N_RAMPS = 2
N_MOVABLE = N_BOXES + N_RAMPS     # grab/lock targets (boxes then ramps)

ARENA = 20.0            # arena half-width
WALL_H = 3.0
BOX_HALF = 0.9
AGENT_HALF = (0.4, 0.4, 0.8)
AGENT_Z = AGENT_HALF[2]

# body rows
ROW_FLOOR = 0
ROW_WALL0 = 1           # 4 walls
ROW_BOX0 = 5
ROW_RAMP0 = ROW_BOX0 + N_BOXES           # 8
ROW_AGENT0 = ROW_RAMP0 + N_RAMPS         # 10
N_BODIES = ROW_AGENT0 + N_AGENTS         # 14

# ramp wedge: 22 deg slope rising toward -x (gpu_hideseek's movable ramp)
RAMP_L, RAMP_W, RAMP_H = 1.2, 1.1, 1.0


def _wedge_geo():
    from ..physics import geo
    l, w, h = RAMP_L, RAMP_W, RAMP_H
    verts = np.array(
        [
            [-l, -w, 0], [l, -w, 0], [l, w, 0], [-l, w, 0],  # base
            [-l, -w, h], [-l, w, h],                          # top edge
        ],
        np.float32,
    )
    faces = [
        (0, 3, 2, 1),      # bottom (outward -z)
        (0, 1, 4),         # -y side triangle... adjusted below
        (2, 3, 5),         # +y side triangle
        (1, 2, 5, 4),      # slope
        (0, 4, 5, 3),      # back (-x)
    ]
    return verts, faces

EPISODE_LEN = 240
PREP_STEPS = 96
DT = 0.04
SUBSTEPS = 4
MOVE_FORCE = 70.0
TURN_SPEED = 2.5
GRAB_RANGE = 2.5
MAX_SPEED = 9.0
VIS_COS = 0.5           # ±60° seeker facing cone

RIGID_BODY = papi.RIGID_BODY


# shared in utils.math3d (both envs use the same yaw-only heading)
_yaw_quat = m3.quat_yaw_only
_quat_yaw = m3.yaw_of_quat


def _make_objects():
    reg = bodies.ObjectRegistry()
    ids = {}
    ids["plane"] = reg.add_plane(mu_s=1.0, mu_d=0.8)
    ids["wall"] = reg.add_box(
        [1.0, 1.0, 1.0], mass=0.0, response=bodies.RESPONSE_STATIC
    )
    ids["box"] = reg.add_box([BOX_HALF] * 3, mass=1.2, mu_s=0.8, mu_d=0.6)
    from ..physics import geo
    rverts, rfaces = _wedge_geo()
    ids["ramp"] = reg.add_hull(
        geo.build_hull(rverts, rfaces), mass=1.5, mu_s=0.7, mu_d=0.5,
    )
    he = np.asarray(AGENT_HALF, np.float32)
    izz = ((2 * he[0]) ** 2 + (2 * he[1]) ** 2) / 12.0
    ids["agent"] = reg.add_hull(
        geo.box_hull(he), mass=1.0, mu_s=0.4, mu_d=0.3,
        inertia_diag=np.array([np.inf, np.inf, izz], np.float32),
    )
    return reg.build(), ids


def _make_meshes():
    """Register hide&seek's render objects once; material slots 1..6
    line up with ``_make_materials`` (floor gets the checker texture).
    Both tiers (dense tracer / BLAS tracer) bake from this registry."""
    reg = MeshRegistry()
    ids = {}
    ids["plane"] = reg.add_quad(
        ARENA * 2, color=(0.45, 0.45, 0.45), uv_tiles=8.0, material=1
    )
    ids["wall"] = reg.add_box([1.0, 1.0, 1.0], color=(0.6, 0.6, 0.2),
                              material=2)
    ids["box"] = reg.add_box([BOX_HALF] * 3, color=(0.55, 0.3, 0.1),
                             material=3)
    rverts, rfaces = _wedge_geo()
    tris = []
    for fc in rfaces:
        for k in range(1, len(fc) - 1):
            tris.append((fc[0], fc[k], fc[k + 1]))
    ids["ramp"] = reg.add_mesh(rverts, tris, color=(0.7, 0.55, 0.2),
                               material=4)
    ids["hider"] = reg.add_box(AGENT_HALF, color=(0.1, 0.4, 0.9),
                               material=5)
    ids["seeker"] = reg.add_box(AGENT_HALF, color=(0.9, 0.15, 0.1),
                                material=6)
    return reg, ids


def _make_materials(tex_size: int = 32):
    """Per-object pbr materials + a checkerboard floor texture for the
    BLAS render tier (the reference's per-leaf material path,
    bvh_raycast.cpp:776-790; bake asset_processor.cpp:155-254)."""
    from ..assets.importer import ImportedMaterial, ImportedTexture
    from ..render.materials import bake_materials

    n = tex_size
    yy, xx = np.mgrid[0:n, 0:n]
    check = (((yy // (n // 4)) + (xx // (n // 4))) % 2).astype(np.uint8)
    img = np.empty((n, n, 4), np.uint8)
    img[..., :3] = np.where(check[..., None] > 0, 200, 90)
    img[..., 3] = 255
    mats = [
        ImportedMaterial("floor", (1.0, 1.0, 1.0, 1.0),
                         roughness=0.9, texture=0),
        ImportedMaterial("wall", (0.6, 0.6, 0.2, 1.0), roughness=0.8),
        ImportedMaterial("box", (0.55, 0.3, 0.1, 1.0), roughness=0.7),
        ImportedMaterial("ramp", (0.7, 0.55, 0.2, 1.0), roughness=0.7),
        ImportedMaterial("hider", (0.1, 0.4, 0.9, 1.0), roughness=0.4),
        ImportedMaterial("seeker", (0.9, 0.15, 0.1, 1.0), roughness=0.4),
    ]
    return bake_materials(
        mats, [ImportedTexture("checker", img)], tex_size=tex_size
    )


class HideSeek(EnvBase):
    name = "hide_seek"
    num_agents = N_AGENTS
    action_is_discrete = True
    action_shape = (N_AGENTS, 5)
    action_buckets = (4, 8, 5, 2, 2)

    def __init__(self, render_size: int = 32, pixels: bool = True,
                 tlas_max_instances: int = 0,
                 render_tier: str = "dense"):
        self.om, self.obj = _make_objects()
        mesh_reg, self.mobj = _make_meshes()
        self.mesh = mesh_reg.build()
        self.pixels = pixels
        if render_tier not in ("dense", "blas"):
            raise ValueError(f"unknown render_tier {render_tier!r}")
        self.render_tier = render_tier
        import jax

        from ..utils.config import apply_tuned, env_override

        # NOTE: the tuned row is keyed by the base env name and was
        # measured sim-only (pixels=False); pixels/render-tier variants
        # inherit it — the PHYSICS kernel knobs it carries are
        # render-independent (the renderer's own knobs live in rcfg and
        # are swept separately by scripts/bench_matrix.py)
        self.cfg = env_override(apply_tuned(PhysicsConfig(
            dt=DT, substeps=SUBSTEPS, narrowphase_once=True,
            # one position pass per substep — the reference's count
            # (see escape_room); behavior suite green at 1
            jacobi_iters=1,
            # whole-substep megakernel + sublane narrowphase kernel on
            # accelerators (see escape_room): 417k -> 535k steps/s at
            # 2048 worlds on one v5e chip
            megakernel=jax.default_backend() != "cpu",
            # contacts megakernel (see escape_room): narrowphase + the
            # contact assembly in one kernel, planar outputs
            narrowphase=(
                "pallas_mega" if jax.default_backend() != "cpu"
                else "xla"
            ),
            # rows 0-4 (floor + walls) are always RESPONSE_STATIC;
            # only boxes/ramps/agents move
            solver_dynamic_range=(ROW_BOX0, N_BODIES),
            # lanes >= hull_hull cap (7) = the hull-plane segment:
            # ref is always the static floor (see escape_room)
            solver_ref_dyn_lanes=7,
            # VMEM-resident all-pairs broadphase kernel (bit-identical
            # candidates; see escape_room)
            broadphase=(
                "pallas" if jax.default_backend() != "cpu" else "all_pairs"
            ),
        ), self.name))
        # hp cap = 9 == the env's dynamic-body count (3 boxes + 2 ramps
        # + 4 agents): every dynamic near the floor is an hp candidate,
        # so 9 is the exact demand ceiling — the old cap of 7 could
        # silently drop floor contacts (measured max occupancy 9 over a
        # 400-step random rollout; hh max 3). sphere_any=0: no sphere
        # prims. Total C = 7 + 9 = 16 = two 8-sublane vregs per contact
        # plane in the solver kernel (see escape_room).
        self.caps = bp.CandidateCaps(hull_hull=7, hull_plane=9, sphere_any=0)
        self.rcfg = RenderConfig(
            width=render_size, height=render_size, fov_deg=90.0,
            t_max=4 * ARENA, dtype="bfloat16",
            shadows=(render_tier == "blas"),
        )
        render_obj = (
            [self.mobj["plane"], *( [self.mobj["wall"]] * 4 ),
             *( [self.mobj["box"]] * N_BOXES ),
             *( [self.mobj["ramp"]] * N_RAMPS ),
             *( [self.mobj["hider"]] * N_HIDERS ),
             *( [self.mobj["seeker"]] * N_SEEKERS )]
        )
        blas = materials = None
        if render_tier == "blas" and pixels:
            # per-object material render path: checkerboard floor
            # texture + pbr colors + a shadow-casting sun, through the
            # device mesh-BVH tracer (bvh_raycast.cpp:776-925)
            blas = mesh_reg.build_blas()
            materials = _make_materials()
            self._light_specs = [
                {"direction": (0.3, -0.4, -1.0), "cast_shadow": True},
            ]
        self.rsys = RenderingSystem(
            self.mesh, self.rcfg, RIGID_BODY, render_obj,
            camera_rows=list(range(ROW_AGENT0, ROW_AGENT0 + N_AGENTS)),
            camera_offset=(0.0, 0.3, 0.6),
            # >0: per-view TLAS top-K cull — bounds the [K, T, R] trace
            # tensors so the pixel path scales past ~1k worlds
            tlas_max_instances=tlas_max_instances,
            blas=blas, materials=materials,
            lights_fn=(
                (lambda state: self._lights_for(state))
                if blas is not None else None
            ),
        )

    def _lights_for(self, state):
        """[W, L] light table sized from the live state (cached per W —
        the table is static, only its world-batch shape depends on the
        executor)."""
        from ..render import make_lights

        import jax

        w = state.singletons["Done"].shape[0]
        cached = getattr(self, "_lights_cache", None)
        if cached is None or cached.direction.shape[0] != w:
            # concrete even when first called inside a jit trace (the
            # table is a compile-time constant, not per-step data)
            with jax.ensure_compile_time_eval():
                cached = make_lights(w, self._light_specs)
            self._lights_cache = cached
        return cached

    @staticmethod
    def random_actions(rs, steps, num_worlds):
        cols = [
            rs.randint(0, hi, (steps, num_worlds, N_AGENTS))
            for hi in HideSeek.action_buckets
        ]
        return jnp.asarray(np.stack(cols, axis=-1), jnp.int32)

    # ------------------------------------------------------------ registry

    def register_types(self, reg: ECSRegistry):
        papi.register_types(reg, max_bodies=N_BODIES)
        papi.register_joint_types(reg, max_joints=N_AGENTS)
        sm = reg._sm
        sm.archetypes[RIGID_BODY] = dataclasses.replace(
            sm.archetypes[RIGID_BODY], fixed_rows=True
        )
        reg.register_singleton("Action", (N_AGENTS, 5), jnp.int32)
        reg.register_singleton("Reward", (N_AGENTS,), jnp.float32)
        reg.register_singleton("Done", (), jnp.int32)
        reg.register_singleton("Reset", (), jnp.int32)
        reg.register_singleton("EpisodeStep", (), jnp.int32)
        reg.register_singleton("Grabbed", (N_AGENTS,), jnp.int32)
        reg.register_singleton("Locked", (N_MOVABLE,), jnp.int32)
        reg.register_singleton("SelfObs", (N_AGENTS, 10), jnp.float32)
        reg.register_singleton("Visible", (N_SEEKERS, N_HIDERS), jnp.int32)
        # learner-friendly flat per-agent vector (see escape_room
        # FlatObs): self(10) + rel agents (A*3) + rel movables (M*3)
        # + locked (M) + visibility (S*H)
        flat_dim = (
            10 + N_AGENTS * 3 + N_MOVABLE * 3 + N_MOVABLE
            + N_SEEKERS * N_HIDERS
        )
        reg.register_singleton(
            "FlatObs", (N_AGENTS, flat_dim), jnp.float32
        )

        reg.import_singleton("Action", "action")
        reg.import_singleton("Reset", "reset")
        reg.export_singleton("SelfObs", "self_obs")
        reg.export_singleton("FlatObs", "flat_obs")
        reg.export_singleton("Reward", "reward")
        reg.export_singleton("Done", "done")
        reg.export_singleton("Visible", "visible")
        if self.pixels:
            self.rsys.register_types(reg)

    def setup_tasks(self, b: TaskGraphBuilder):
        n_reset = b.custom(self._reset_system, name="hs_reset")
        n_act = b.custom(self._action_system, deps=[n_reset], name="hs_actions")
        n_phys = papi.setup_physics_step_tasks(
            b, self.om, self.cfg, self.caps, deps=[n_act]
        )
        b.custom(self._post_system, deps=[n_phys], name="hs_post")

    def setup_graphs(self, mgr):
        """Separate "step" (sim) and "render" (raycast) graphs — the
        reference pattern of one taskgraph per enum selected at run time
        (``include/madrona/taskgraph_builder.hpp:93-108``; the CUDA
        renderer likewise runs as its own graph, ``buildRenderGraph``,
        ``src/mw/cuda_exec.cpp:2527-2700``). A learner that only needs
        state obs can launch ("step",) and skip the raycast entirely."""
        self.setup_tasks(mgr.init("step"))
        if self.pixels:
            self.rsys.setup_tasks(mgr.init("render"))
            self.default_launch = ("step", "render")

    def init_worlds(self, sm, state):
        singles = dict(state.singletons)
        singles["Done"] = jnp.ones_like(singles["Done"])
        return dataclasses.replace(state, singletons=singles)

    # ------------------------------------------------------------- systems

    def _reset_system(self, sm, state, node_key):
        s = dict(state.singletons)
        need = (s["Done"] > 0) | (s["Reset"] > 0)
        w = need.shape[0]

        draws = []
        for i in range(2 * N_MOVABLE + 2 * N_HIDERS + N_AGENTS):
            k = _rng.split_i(node_key, jnp.full((w,), i, jnp.uint32))
            draws.append(_rng.sample_uniform(k))
        di = iter(draws)
        span = ARENA - 3.0

        pos = jnp.zeros((w, N_BODIES, 3), jnp.float32)
        scale = jnp.ones((w, N_BODIES, 3), jnp.float32)
        # walls at x/y = ±ARENA
        wall_cfg = [
            ((-ARENA - 1, 0), (1.0, ARENA + 2)),
            ((ARENA + 1, 0), (1.0, ARENA + 2)),
            ((0, -ARENA - 1), (ARENA + 2, 1.0)),
            ((0, ARENA + 1), (ARENA + 2, 1.0)),
        ]
        for i, ((cx, cy), (sx, sy)) in enumerate(wall_cfg):
            pos = pos.at[:, ROW_WALL0 + i].set(
                jnp.array([cx, cy, WALL_H / 2])
            )
            scale = scale.at[:, ROW_WALL0 + i].set(
                jnp.array([sx, sy, WALL_H / 2])
            )
        for i in range(N_BOXES):
            bx = next(di) * 2 * span - span
            by = next(di) * 2 * span - span
            pos = pos.at[:, ROW_BOX0 + i].set(
                jnp.stack([bx, by, jnp.full_like(bx, BOX_HALF)], axis=-1)
            )
        for i in range(N_RAMPS):
            rx = next(di) * 2 * span - span
            ry = next(di) * 2 * span - span
            pos = pos.at[:, ROW_RAMP0 + i].set(
                jnp.stack([rx, ry, jnp.zeros_like(rx)], axis=-1)
            )
        # hiders random; seekers in the corner
        yaw = jnp.zeros((w, N_AGENTS), jnp.float32)
        for a in range(N_HIDERS):
            ax = next(di) * 2 * span - span
            ay = next(di) * 2 * span - span
            pos = pos.at[:, ROW_AGENT0 + a].set(
                jnp.stack([ax, ay, jnp.full_like(ax, AGENT_Z)], axis=-1)
            )
        for a in range(N_SEEKERS):
            pos = pos.at[:, ROW_AGENT0 + N_HIDERS + a].set(
                jnp.array([-ARENA + 2.0 + 2 * a, -ARENA + 2.0, AGENT_Z])
            )
        for a in range(N_AGENTS):
            yaw = yaw.at[:, a].set(next(di) * 2 * jnp.pi)
        rot = jnp.zeros((w, N_BODIES, 4), jnp.float32).at[..., 0].set(1.0)
        rot = rot.at[:, ROW_AGENT0:].set(_yaw_quat(yaw))

        obj_row = jnp.asarray(
            [self.obj["plane"]] + [self.obj["wall"]] * 4
            + [self.obj["box"]] * N_BOXES + [self.obj["ramp"]] * N_RAMPS
            + [self.obj["agent"]] * N_AGENTS,
            jnp.int32,
        )
        resp_row = jnp.asarray(
            [bodies.RESPONSE_STATIC] * 5
            + [bodies.RESPONSE_DYNAMIC] * (N_MOVABLE + N_AGENTS),
            jnp.int32,
        )

        t = state.tables[RIGID_BODY]
        c = dict(t.columns)
        zeros3 = jnp.zeros((w, N_BODIES, 3), jnp.float32)

        def pick(new, old):
            sel = need.reshape((w,) + (1,) * (old.ndim - 1))
            return jnp.where(sel, jnp.asarray(new, old.dtype), old)

        c["Position"] = pick(pos, c["Position"])
        c["Rotation"] = pick(rot, c["Rotation"])
        c["Scale"] = pick(scale, c["Scale"])
        c["ObjectID"] = pick(
            jnp.broadcast_to(obj_row[None], (w, N_BODIES)), c["ObjectID"]
        )
        c["ResponseType"] = pick(
            jnp.broadcast_to(resp_row[None], (w, N_BODIES)),
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
        singles["Grabbed"] = jnp.where(need[:, None], -1, s["Grabbed"])
        singles["Locked"] = jnp.where(need[:, None], 0, s["Locked"])
        jb = dict(s[papi.JOINT_BUFFER])
        jb["active"] = jnp.where(need[:, None], False, jb["active"])
        singles[papi.JOINT_BUFFER] = jb
        return dataclasses.replace(state, tables=tables, singletons=singles)

    def _action_system(self, sm, state, node_key):
        s = dict(state.singletons)
        act = s["Action"]                            # [W, A, 5]
        t = state.tables[RIGID_BODY]
        pos = t.columns["Position"]
        rotq = t.columns["Rotation"]
        w = act.shape[0]
        widx = jnp.arange(w)

        # prep phase: seekers frozen
        in_prep = s["EpisodeStep"] < PREP_STEPS
        agent_on = jnp.concatenate(
            [
                jnp.ones((w, N_HIDERS), bool),
                jnp.broadcast_to((~in_prep)[:, None], (w, N_SEEKERS)),
            ],
            axis=1,
        )

        a_pos = pos[:, ROW_AGENT0:]
        a_rot = rotq[:, ROW_AGENT0:]
        yaw = _quat_yaw(a_rot)
        move_amount = act[..., 0].astype(jnp.float32) / 3.0 * agent_on
        move_angle = act[..., 1].astype(jnp.float32) * (jnp.pi / 4.0)
        turn = (act[..., 2].astype(jnp.float32) - 2.0) / 2.0 * agent_on
        grab = (act[..., 3] > 0) & agent_on
        lock = (act[..., 4] > 0) & agent_on

        ang = yaw + move_angle
        f = MOVE_FORCE * move_amount
        force = jnp.stack(
            [-f * jnp.sin(ang), f * jnp.cos(ang), jnp.zeros_like(f)], axis=-1
        )
        ext_f = t.columns["ExternalForce"].at[:, ROW_AGENT0:].set(force)
        omega = t.columns["Velocity"]["angular"].at[:, ROW_AGENT0:].set(
            jnp.stack(
                [jnp.zeros_like(turn), jnp.zeros_like(turn),
                 TURN_SPEED * turn], axis=-1,
            )
        )

        # nearest movable (box or ramp) in front (shared grab/lock targets)
        box_pos = pos[:, ROW_BOX0:ROW_BOX0 + N_MOVABLE]
        fwd = jnp.stack(
            [-jnp.sin(yaw), jnp.cos(yaw), jnp.zeros_like(yaw)], axis=-1
        )
        hand = a_pos + fwd * 0.8
        d2 = jnp.sum(
            (box_pos[:, None, :, :] - hand[:, :, None, :]) ** 2, axis=-1
        )  # [W, A, B]
        nearest = jnp.argmin(d2, axis=-1)
        near_ok = jnp.take_along_axis(d2, nearest[..., None], -1)[..., 0] <= GRAB_RANGE**2

        # ---- team-owned lock toggle (one agent per box per step; lowest
        # agent wins). Locked stores the owning team + 1 (0 = unlocked,
        # 1 = hider-locked, 2 = seeker-locked); only the owning team can
        # unlock — the full game's mechanic (mujoco-worldgen hide&seek
        # LockObjWrapper team ownership).
        locked = s["Locked"]
        want_lock = lock & near_ok
        # one-hot select/update instead of [widx, tgt] gathers/scatters:
        # XLA's TPU scatter re-reads the operand per row (see
        # xpbd._gather_packed note); one-hots keep this on dense VPU ops
        for a in range(N_AGENTS):
            team_code = 1 if a < N_HIDERS else 2
            tgt = nearest[:, a]
            do = want_lock[:, a]
            oh = jax.nn.one_hot(tgt, N_MOVABLE, dtype=locked.dtype)
            cur = jnp.sum(oh * locked, axis=1)
            new = jnp.where(
                cur == 0, team_code,                  # lock for my team
                jnp.where(cur == team_code, 0, cur),  # unlock own; else hold
            )
            locked = jnp.where(
                (do[:, None]) & (oh > 0), new[:, None], locked
            )
            # only the first locker acts on a box this step
            same = want_lock & (nearest == tgt[:, None])
            later = jnp.arange(N_AGENTS)[None, :] > a
            want_lock = want_lock & ~(same & later & do[:, None])
        resp = t.columns["ResponseType"]
        box_resp = jnp.where(
            locked > 0, bodies.RESPONSE_STATIC, bodies.RESPONSE_DYNAMIC
        )
        resp = resp.at[:, ROW_BOX0:ROW_BOX0 + N_MOVABLE].set(box_resp)

        # ---- grab joints (locked boxes not grabbable)
        grabbed = s["Grabbed"]
        held_any = jnp.any(
            grabbed[:, :, None]
            == (ROW_BOX0 + jnp.arange(N_MOVABLE))[None, None, :], axis=1
        )
        d2m = jnp.where(held_any[:, None, :], jnp.inf, d2)
        nearest_g = jnp.argmin(d2m, axis=-1)
        oh_g = jax.nn.one_hot(nearest_g, N_MOVABLE, dtype=jnp.float32)
        locked_g = jnp.einsum(
            "wam,wm->wa", oh_g, locked.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        ok_g = (
            jnp.take_along_axis(d2m, nearest_g[..., None], -1)[..., 0]
            <= GRAB_RANGE**2
        ) & ~(locked_g > 0.5)
        want_new = grab & (grabbed < 0) & ok_g
        # sequential claim: earlier agents win contested boxes
        for a in range(N_AGENTS):
            same = want_new & (nearest_g == nearest_g[:, a][:, None])
            later = jnp.arange(N_AGENTS)[None, :] > a
            want_new = want_new & ~(same & later & want_new[:, a][:, None])
        new_grabbed = jnp.where(
            want_new, ROW_BOX0 + nearest_g, jnp.where(grab, grabbed, -1)
        )

        jb = papi.joints_view(state)
        # grabbed-body pose fetch as one-hot einsums (not [widx, srow]
        # gathers — the same TPU gather pathology as above)
        pose_blk = jnp.concatenate([pos, rotq], axis=-1)     # [W, N, 7]
        for a in range(N_AGENTS):
            row = new_grabbed[:, a]
            on = row >= 0
            srow = jnp.clip(row, 0, N_BODIES - 1)
            oh_s = jax.nn.one_hot(srow, N_BODIES, dtype=jnp.float32)
            blk = jnp.einsum(
                "wn,wnf->wf", oh_s, pose_blk,
                preferred_element_type=jnp.float32,
            )
            q1 = a_rot[:, a]
            q2 = blk[:, 3:7]
            x1 = a_pos[:, a]
            x2 = blk[:, 0:3]
            aq1 = m3.quat_normalize(m3.quat_mul(m3.quat_inv(q1), q2))
            aq2 = jnp.broadcast_to(jnp.array([1.0, 0, 0, 0]), (w, 4))
            mid = 0.5 * (x1 + x2)
            r1 = m3.quat_rotate(m3.quat_inv(q1), mid - x1)
            r2 = m3.quat_rotate(m3.quat_inv(q2), mid - x2)
            fresh = want_new[:, a]
            keep = lambda new, old: jnp.where(
                fresh.reshape((w,) + (1,) * (new.ndim - 1)), new, old
            )
            jb = dataclasses.replace(
                jb,
                e1=jb.e1.at[:, a].set(jnp.where(on, ROW_AGENT0 + a, -1)),
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
                active=jb.active.at[:, a].set(on),
            )
        state = papi.write_joints(state, jb)

        tables = dict(state.tables)
        cols = dict(t.columns)
        cols["ExternalForce"] = ext_f
        cols["ResponseType"] = resp
        cols["Velocity"] = {
            "linear": t.columns["Velocity"]["linear"], "angular": omega,
        }
        tables[RIGID_BODY] = dataclasses.replace(
            state.tables[RIGID_BODY], columns=cols
        )
        singles = dict(state.singletons)
        singles["Grabbed"] = new_grabbed
        singles["Locked"] = locked
        return dataclasses.replace(state, tables=tables, singletons=singles)

    def _post_system(self, sm, state, node_key):
        s = dict(state.singletons)
        t = state.tables[RIGID_BODY]
        pos = t.columns["Position"]
        rotq = t.columns["Rotation"]
        vel = t.columns["Velocity"]["linear"]
        w = pos.shape[0]

        a_sl = slice(ROW_AGENT0, ROW_AGENT0 + N_AGENTS)
        a_vel = vel[:, a_sl]
        speed = jnp.linalg.norm(a_vel[..., :2], axis=-1, keepdims=True)
        a_vel = a_vel.at[..., :2].multiply(
            jnp.minimum(1.0, MAX_SPEED / jnp.maximum(speed, 1e-6))
        )
        vel = vel.at[:, a_sl].set(a_vel)

        a_pos = pos[:, a_sl]
        a_rot = rotq[:, a_sl]
        yaw = _quat_yaw(a_rot)

        # ---- visibility: seeker -> hider LOS + facing cone
        seeker_pos = a_pos[:, N_HIDERS:]
        seeker_yaw = yaw[:, N_HIDERS:]
        hider_pos = a_pos[:, :N_HIDERS]
        to_h = hider_pos[:, None, :, :] - seeker_pos[:, :, None, :]
        dist = jnp.linalg.norm(to_h, axis=-1)
        dir_ = to_h / jnp.maximum(dist[..., None], 1e-6)
        fwd = jnp.stack(
            [-jnp.sin(seeker_yaw), jnp.cos(seeker_yaw),
             jnp.zeros_like(seeker_yaw)], axis=-1,
        )
        in_cone = jnp.sum(
            dir_ * fwd[:, :, None, :], axis=-1
        ) > VIS_COS

        # occlusion rays vs boxes + walls (not floor/agents)
        occ_rows = jnp.arange(ROW_WALL0, ROW_RAMP0 + N_RAMPS)
        inst_obj = jnp.broadcast_to(
            jnp.asarray(
                [self.mobj["wall"]] * 4 + [self.mobj["box"]] * N_BOXES
                + [self.mobj["ramp"]] * N_RAMPS,
                jnp.int32,
            )[None],
            (w, 4 + N_MOVABLE),
        )
        inst_mask = jnp.ones((w, 4 + N_MOVABLE), bool)

        los_cfg = dataclasses.replace(self.rcfg, dtype="float32")

        def per_world(ip, ir, isc, io, im, origins, dirs, dists):
            _, depth = _trace_rays(
                los_cfg, self.mesh, ip, ir, isc, io, im, origins, dirs
            )
            return depth > dists - 0.5   # nothing closer than the hider

        clear = jax.vmap(per_world)(
            pos[:, occ_rows], rotq[:, occ_rows],
            t.columns["Scale"][:, occ_rows], inst_obj, inst_mask,
            (seeker_pos[:, :, None, :] + 0 * to_h).reshape(w, -1, 3),
            dir_.reshape(w, -1, 3),
            dist.reshape(w, -1),
        ).reshape(w, N_SEEKERS, N_HIDERS)
        visible = in_cone & clear                      # [W, S, H]

        in_prep = s["EpisodeStep"] < PREP_STEPS
        any_seen = jnp.any(visible, axis=(1, 2))
        hider_r = jnp.where(any_seen, -1.0, 1.0)
        seeker_r = -hider_r
        reward = jnp.concatenate(
            [
                jnp.broadcast_to(hider_r[:, None], (w, N_HIDERS)),
                jnp.broadcast_to(seeker_r[:, None], (w, N_SEEKERS)),
            ],
            axis=1,
        )
        reward = jnp.where(in_prep[:, None], 0.0, reward)

        grabbed = s["Grabbed"]
        self_obs = jnp.concatenate(
            [
                a_pos / ARENA,
                jnp.sin(yaw)[..., None], jnp.cos(yaw)[..., None],
                a_vel / MAX_SPEED,
                (grabbed >= 0).astype(jnp.float32)[..., None],
                jnp.broadcast_to(
                    in_prep.astype(jnp.float32)[:, None, None],
                    (w, N_AGENTS, 1),
                ),
            ],
            axis=-1,
        )

        ep = s["EpisodeStep"] + 1
        tables = dict(state.tables)
        cols = dict(t.columns)
        cols["Velocity"] = {
            "linear": vel, "angular": t.columns["Velocity"]["angular"]
        }
        tables[RIGID_BODY] = dataclasses.replace(t, columns=cols)
        singles = dict(s)
        singles["SelfObs"] = self_obs
        singles["Visible"] = visible.astype(jnp.int32)
        # flat per-agent learner vector (rollouts stack to [T, W, A, D])
        mov_pos = pos[:, ROW_BOX0:ROW_BOX0 + N_MOVABLE]       # [W, M, 3]
        rel_agents = (
            a_pos[:, None, :, :] - a_pos[:, :, None, :]
        ).reshape(w, N_AGENTS, -1) / ARENA
        rel_mov = (
            mov_pos[:, None, :, :] - a_pos[:, :, None, :]
        ).reshape(w, N_AGENTS, -1) / ARENA
        locked_b = jnp.broadcast_to(
            s["Locked"].astype(jnp.float32)[:, None, :],
            (w, N_AGENTS, N_MOVABLE),
        )
        vis_b = jnp.broadcast_to(
            visible.astype(jnp.float32).reshape(w, 1, -1),
            (w, N_AGENTS, N_SEEKERS * N_HIDERS),
        )
        singles["FlatObs"] = jnp.concatenate(
            [self_obs, rel_agents, rel_mov, locked_b, vis_b], axis=-1
        )
        singles["Reward"] = reward
        singles["EpisodeStep"] = ep
        singles["Done"] = (ep >= EPISODE_LEN).astype(jnp.int32)
        return dataclasses.replace(state, tables=tables, singletons=singles)
