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

__all__ = [
    "MeshRegistry", "MeshTables", "MAX_TRIS",
    "RenderConfig", "render_views", "camera_rays", "RenderingSystem",
    "TLAS", "build_tlas", "tlas_candidates", "render_views_tlas",
    "instance_world_aabbs", "object_aabbs",
]
