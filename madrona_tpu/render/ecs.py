"""RenderingSystem: ECS glue that mirrors sim state into render inputs.

TPU-native equivalent of the reference render ECS
(``src/render/ecs_system.cpp:486-600``, ``include/madrona/render/ecs.hpp:
153-218``): the reference maintains InstanceData / PerspectiveCameraData
SoA archetypes sorted by (MortonCode, WorldID) for the downstream
renderer. Here instances are *views* of the RigidBody table columns (the
sort exists to give the GPU renderer coherent memory access; the dense
[W, I] layout already is coherent), and cameras are derived from agent
body rows each step by a taskgraph node.

Usage: ``RenderingSystem.register_types`` + ``setup_tasks(deps=[...])``
after the physics node; the render node writes the RGBD outputs into
exported singletons.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp

from ..core.registry import ECSRegistry
from ..core.state import SimState, StateManager
from ..graph.builder import TaskGraphBuilder
from ..utils import math3d as m3
from .mesh import MeshTables
from .raycast import RenderConfig, render_views


class RenderingSystem:
    """Per-env renderer wiring (reference RenderingSystem::registerTypes /
    setupTasks / attachEntityToView)."""

    def __init__(
        self,
        mesh: MeshTables,
        cfg: RenderConfig,
        body_arch: str,
        render_obj_of_body,         # [N] int: render object per body row
        camera_rows: Sequence[int],  # body rows that carry a camera
        camera_offset=(0.0, 0.0, 0.0),
        exclude_self: bool = True,   # each view drops its own body row
        body_mask=None,              # [N] bool: rows that render
        tlas_max_instances: int = 0,  # >0: per-view top-K TLAS cull tier
        blas=None,                   # BlasTables: device mesh-BVH tier
        materials=None,              # MaterialTables for the BLAS tier
        lights=None,                 # lights.Lights [W, L] (static)
        lights_fn=None,              # or fn(state) -> Lights (dynamic)
    ):
        self.mesh = mesh
        self.cfg = cfg
        # MADRONA_TPU_BLAS_WIDE=1|bf16 attaches the 4-wide collapse to
        # any BLAS tier centrally (bench/tuning knob; hits identical)
        import os as _os

        wide_env = _os.environ.get("MADRONA_TPU_BLAS_WIDE", "")
        if blas is not None and wide_env and getattr(blas, "wide", None) is None:
            from .blas import with_wide

            blas = with_wide(
                blas,
                aabb_dtype=("bfloat16" if wide_env in ("bf16", "bfloat16")
                            else "float32"),
            )
        self.blas = blas
        self.materials = materials
        self.lights = lights
        self.lights_fn = lights_fn
        self.body_arch = body_arch
        self.render_obj = jnp.asarray(render_obj_of_body, jnp.int32)
        self.camera_rows = tuple(camera_rows)
        self.camera_offset = jnp.asarray(camera_offset, jnp.float32)
        n = self.render_obj.shape[0]
        self.body_mask = (
            jnp.ones((n,), bool) if body_mask is None
            else jnp.asarray(body_mask, bool)
        )
        # [V, N] per-view mask: an ego camera must not trace its own
        # body (the camera eye sits inside/at the agent mesh, so a
        # shared mask renders the inside of the agent's own head).
        view_mask = jnp.broadcast_to(
            self.body_mask[None, :], (len(self.camera_rows), n)
        )
        if exclude_self:
            own = (
                jnp.arange(n)[None, :]
                == jnp.asarray(self.camera_rows, jnp.int32)[:, None]
            )
            view_mask = view_mask & ~own
        self.view_mask = view_mask
        self.tlas_max_instances = tlas_max_instances

    def register_types(self, reg: ECSRegistry):
        v = len(self.camera_rows)
        h, w = self.cfg.height, self.cfg.width
        reg.register_singleton("RGBOut", (v, h, w, 3), jnp.float32)
        reg.register_singleton("DepthOut", (v, h, w), jnp.float32)
        reg.export_singleton("RGBOut", "rgb")
        reg.export_singleton("DepthOut", "depth")
        if self.tlas_max_instances > 0:
            # true per-view frustum overlap count: the cull tier's
            # overflow signal (cull is exact while overlap <= K)
            reg.register_singleton("TlasOverlap", (v,), jnp.int32)
            reg.export_singleton("TlasOverlap", "tlas_overlap")

    def setup_tasks(self, b: TaskGraphBuilder, deps=()):
        return b.custom(self._render_node, deps=deps, name="render_views")

    # ------------------------------------------------------------- node

    def _render_node(self, sm: StateManager, state: SimState, node_key):
        t = state.tables[self.body_arch]
        pos = t.columns["Position"]               # [W, N, 3]
        rot = t.columns["Rotation"]
        scale = t.columns["Scale"]
        w = pos.shape[0]

        cam_rows = jnp.asarray(self.camera_rows)
        cam_pos = pos[:, cam_rows] + m3.quat_rotate(
            rot[:, cam_rows], self.camera_offset[None, None, :]
        )
        cam_rot = rot[:, cam_rows]

        # [W, V, N]: per-view (self-excluding) visibility
        inst_mask = jnp.broadcast_to(
            self.view_mask[None, :, :], (w,) + self.view_mask.shape
        )
        inst_obj = jnp.broadcast_to(self.render_obj[None, :], pos.shape[:2])
        if self.blas is not None:
            # device BVH traversal tier: imported meshes of real
            # polycount (reference TLAS->BLAS walk,
            # bvh_raycast.cpp:225-520); materials/textures/shadows
            # sampled per hit (:776-912)
            from .blas import render_views_blas

            lights = (
                self.lights_fn(state) if self.lights_fn is not None
                else self.lights
            )
            out = render_views_blas(
                self.cfg, self.blas, pos, rot, scale, inst_obj,
                inst_mask, cam_pos, cam_rot,
                materials=self.materials, lights=lights,
                max_instances_per_view=self.tlas_max_instances,
            )
            singles = dict(state.singletons)
            if self.tlas_max_instances > 0:
                rgb, depth, overlap = out
                if "TlasOverlap" in singles:
                    singles["TlasOverlap"] = overlap.astype(jnp.int32)
            else:
                rgb, depth = out
            singles["RGBOut"] = rgb
            singles["DepthOut"] = depth
            return dataclasses.replace(state, singletons=singles)
        if self.tlas_max_instances > 0:
            from .tlas import render_views_tlas

            rgb, depth, overlap = render_views_tlas(
                self.cfg, self.mesh, pos, rot, scale, inst_obj, inst_mask,
                cam_pos, cam_rot,
                max_instances_per_view=self.tlas_max_instances,
            )
        else:
            overlap = None
            rgb, depth = render_views(
                self.cfg, self.mesh, pos, rot, scale, inst_obj, inst_mask,
                cam_pos, cam_rot,
            )
        singles = dict(state.singletons)
        singles["RGBOut"] = rgb
        singles["DepthOut"] = depth
        if overlap is not None and "TlasOverlap" in singles:
            singles["TlasOverlap"] = overlap.astype(jnp.int32)
        return dataclasses.replace(state, singletons=singles)

    # ------------------------------------------------------- adaptive K

    def maybe_grow_tlas(self, executor, margin: float = 1.0) -> int:
        """Adaptive cull-K (the capacity-tier pattern,
        ``Executor.maybe_grow``): if any view's true frustum overlap
        exceeded the current K, raise K to the observed max (times
        ``margin``, rounded up to a multiple of 4) and drop the
        executor's compiled step fns so the next call re-traces at the
        new tier. Returns the new K (unchanged if no overflow).

        Costs one host sync; call between rollouts, not per step.
        """
        if self.tlas_max_instances <= 0:
            return self.tlas_max_instances
        import numpy as np

        seen = int(
            np.max(np.asarray(executor.state.singletons["TlasOverlap"]))
        )
        if seen <= self.tlas_max_instances:
            return self.tlas_max_instances
        new_k = int(-(-int(seen * margin) // 4) * 4)
        # K beyond the instance count is meaningless (and top_k rejects
        # k > N): at that point the cull selects everything
        new_k = min(new_k, int(self.render_obj.shape[0]))
        self.tlas_max_instances = new_k
        executor._step_fns.clear()
        return new_k
