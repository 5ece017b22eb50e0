"""Batch renderer: mesh tables, raycaster, render-ECS glue.

TPU equivalent of the reference's render subsystem (src/render/,
src/mw/device/bvh*.cpp) — see module docstrings for design notes.
"""

from .mesh import MeshRegistry, MeshTables, MAX_TRIS
from .raycast import RenderConfig, render_views, camera_rays
from .ecs import RenderingSystem

__all__ = [
    "MeshRegistry", "MeshTables", "MAX_TRIS",
    "RenderConfig", "render_views", "camera_rays", "RenderingSystem",
]
