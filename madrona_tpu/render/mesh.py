"""Render meshes: padded triangle tables per render object.

TPU-native equivalent of the reference's mesh BVH data
(``include/madrona/mesh_bvh.hpp:20-212``, built offline by
``src/common/mesh_bvh_builder.cpp``). Design translation: the reference
bakes a quantized wide BVH per mesh because its scenes mix large
triangle meshes; the batch-sim envs render low-poly game geometry
(boxes, ramps, planes — tens of triangles), where masked brute-force
intersection over a padded [T, 3, 3] table is faster on the VPU than
divergent tree traversal (SURVEY.md §7 "raycaster" row). Meshes beyond
the pad budget belong in an LBVH path (see render/raycast.py note).
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax.numpy as jnp
import numpy as np

MAX_TRIS = 32


@dataclasses.dataclass
class MeshTables:
    """All registered render objects as stacked device arrays."""

    tri_v0: jnp.ndarray      # [O, T, 3]
    tri_e1: jnp.ndarray      # [O, T, 3] (v1 - v0)
    tri_e2: jnp.ndarray      # [O, T, 3] (v2 - v0)
    tri_mask: jnp.ndarray    # [O, T]
    tri_color: jnp.ndarray   # [O, T, 3]
    num_objects: int = 0


class MeshRegistry:
    """Build-time accumulator of render meshes (AssetImporter-lite)."""

    def __init__(self):
        self._rows: List[dict] = []

    def add_mesh(self, verts, tris, color=(0.8, 0.8, 0.8),
                 tri_colors=None, uv=None, material=0) -> int:
        """``uv``: optional [V, 2] vertex UVs and ``material``: material
        slot (imported id + 1; 0 = default) — carried through to the
        BLAS tier bake (``build_blas``); the dense tier ignores them."""
        verts = np.asarray(verts, np.float32)
        tris = np.asarray(tris, np.int32)
        if len(tris) > MAX_TRIS:
            raise ValueError(
                f"mesh has {len(tris)} tris > MAX_TRIS={MAX_TRIS}"
            )
        v0 = verts[tris[:, 0]]
        e1 = verts[tris[:, 1]] - v0
        e2 = verts[tris[:, 2]] - v0
        if tri_colors is None:
            tri_colors = np.tile(np.asarray(color, np.float32), (len(tris), 1))
        self._rows.append(dict(
            v0=v0, e1=e1, e2=e2, colors=tri_colors,
            verts=verts, tris=tris,
            uv=None if uv is None else np.asarray(uv, np.float32),
            material=int(material),
        ))
        return len(self._rows) - 1

    def build_blas(self, leaf_size: int = 4):
        """Bake the SAME registered objects into the device mesh-BVH
        tier (``render/blas.py::BlasTables``) so an env can flip from
        the dense tracer to the BLAS tracer without re-declaring
        geometry — object ids stay aligned across both tiers (the
        reference keeps one object table feeding both its procedural
        and mesh paths)."""
        from ..assets.bvh import build_mesh_bvh
        from .blas import bake_blas

        if not self._rows:
            raise ValueError("no meshes registered")
        bvhs = [
            build_mesh_bvh(r["verts"], r["tris"], leaf_size=leaf_size)
            for r in self._rows
        ]
        return bake_blas(
            bvhs,
            tri_colors=[r["colors"] for r in self._rows],
            uvs=[r["uv"] for r in self._rows],
            materials=[r["material"] for r in self._rows],
        )

    def add_box(self, half_extents, color=(0.8, 0.8, 0.8),
                uv=None, material=0) -> int:
        hx, hy, hz = np.broadcast_to(
            np.asarray(half_extents, np.float32), (3,)
        )
        v = np.array(
            [
                [sx * hx, sy * hy, sz * hz]
                for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)
            ],
            np.float32,
        )
        # 12 triangles, outward winding
        quads = [
            (0, 1, 3, 2), (4, 6, 7, 5),   # -x, +x
            (0, 4, 5, 1), (2, 3, 7, 6),   # -y, +y
            (0, 2, 6, 4), (1, 5, 7, 3),   # -z, +z
        ]
        tris = []
        for a, b, c, d in quads:
            tris += [(a, b, c), (a, c, d)]
        return self.add_mesh(v, tris, color, uv=uv, material=material)

    def add_quad(self, size=100.0, color=(0.5, 0.5, 0.5),
                 uv_tiles: float = 0.0, material=0) -> int:
        """A ground quad in the local z=0 plane (the raster stand-in for
        the infinite collision plane). ``uv_tiles`` > 0 assigns wrapped
        UVs spanning that many texture repeats across the quad."""
        s = float(size)
        v = np.array(
            [[-s, -s, 0], [s, -s, 0], [s, s, 0], [-s, s, 0]], np.float32
        )
        uv = None
        if uv_tiles > 0:
            t = float(uv_tiles)
            uv = np.array([[0, 0], [t, 0], [t, t], [0, t]], np.float32)
        return self.add_mesh(v, [(0, 1, 2), (0, 2, 3)], color,
                             uv=uv, material=material)

    def build(self) -> MeshTables:
        if not self._rows:
            raise ValueError("no meshes registered")
        t = max(len(r["v0"]) for r in self._rows)

        def pad(x, n):
            out = np.zeros((n,) + x.shape[1:], x.dtype)
            out[: len(x)] = x
            return out

        return MeshTables(
            tri_v0=jnp.asarray(
                np.stack([pad(r["v0"], t) for r in self._rows])
            ),
            tri_e1=jnp.asarray(
                np.stack([pad(r["e1"], t) for r in self._rows])
            ),
            tri_e2=jnp.asarray(
                np.stack([pad(r["e2"], t) for r in self._rows])
            ),
            tri_mask=jnp.asarray(
                np.stack(
                    [
                        pad(np.ones(len(r["v0"]), bool), t)
                        for r in self._rows
                    ]
                )
            ),
            tri_color=jnp.asarray(
                np.stack(
                    [pad(np.asarray(r["colors"], np.float32), t)
                     for r in self._rows]
                )
            ),
            num_objects=len(self._rows),
        )
