"""Batch renderer: mesh tables, raycaster, render-ECS glue.

TPU equivalent of the reference's render subsystem (src/render/,
src/mw/device/bvh*.cpp) — see module docstrings for design notes.
"""

from .mesh import MeshRegistry, MeshTables, MAX_TRIS
from .raycast import RenderConfig, render_views, camera_rays
from .ecs import RenderingSystem
from .tlas import (
    TLAS, build_tlas, tlas_candidates, render_views_tlas,
    instance_world_aabbs, object_aabbs,
)
from .blas import (
    BlasTables, bake_blas, bake_assets_blas, render_views_blas,
    trace_rays_blas, trace_scene_blas,
)
from .materials import MaterialTables, bake_materials, sample_materials
from .lights import Lights, make_lights

__all__ = [
    "Lights", "make_lights",
    "MeshRegistry", "MeshTables", "MAX_TRIS",
    "RenderConfig", "render_views", "camera_rays", "RenderingSystem",
    "TLAS", "build_tlas", "tlas_candidates", "render_views_tlas",
    "instance_world_aabbs", "object_aabbs",
    "BlasTables", "bake_blas", "bake_assets_blas", "render_views_blas",
    "trace_rays_blas", "trace_scene_blas",
    "MaterialTables", "bake_materials", "sample_materials",
]
