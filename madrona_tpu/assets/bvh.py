"""Mesh BVH: native SAH build + verification/query helpers.

Reference parity: ``MeshBVHBuilder::build`` (src/common/
mesh_bvh_builder.cpp, embree SAH) producing the traversal structure of
``include/madrona/mesh_bvh.hpp``. The native builder
(madrona_tpu/native/importer.cpp) emits a binary SAH BVH; this module
wraps it as numpy/jnp arrays and provides a host-side ray query used to
validate the build (the batch raycaster's device path uses dense
triangle tables for the small meshes the example envs ship — the BVH
serves large imported assets and the planned wide-traversal tier).
"""

from __future__ import annotations

import dataclasses
import ctypes

import numpy as np

from .. import native


@dataclasses.dataclass
class MeshBVH:
    node_min: np.ndarray    # [N, 3]
    node_max: np.ndarray    # [N, 3]
    left: np.ndarray        # [N] child / leaf first-tri
    right: np.ndarray       # [N] child / -count if leaf
    tri_order: np.ndarray   # [T]
    positions: np.ndarray   # [V, 3]
    indices: np.ndarray     # [T, 3]

    @property
    def num_nodes(self) -> int:
        return len(self.left)

    def is_leaf(self, i: int) -> bool:
        return self.right[i] < 0

    # --------------------------------------------------- host-side query

    def trace_ray(self, origin, direction, t_max=1e30):
        """Stack-based nearest-hit query (host; validation/tooling)."""
        o = np.asarray(origin, np.float64)
        d = np.asarray(direction, np.float64)
        inv = np.divide(
            1.0, d, out=np.full(3, 1e30), where=np.abs(d) > 1e-12
        )
        best_t, best_tri = t_max, -1
        stack = [0]
        while stack:
            n = stack.pop()
            t0 = (self.node_min[n] - o) * inv
            t1 = (self.node_max[n] - o) * inv
            lo = np.minimum(t0, t1).max()
            hi = np.maximum(t0, t1).min()
            if hi < max(lo, 0.0) or lo > best_t:
                continue
            if self.is_leaf(n):
                first, count = self.left[n], -self.right[n]
                for k in range(first, first + count):
                    ti = self.tri_order[k]
                    tri = self.indices[ti]
                    v0 = self.positions[tri[0]]
                    e1 = self.positions[tri[1]] - v0
                    e2 = self.positions[tri[2]] - v0
                    p = np.cross(d, e2)
                    det = e1 @ p
                    if abs(det) < 1e-12:
                        continue
                    tvec = o - v0
                    u = (tvec @ p) / det
                    q = np.cross(tvec, e1)
                    v = (d @ q) / det
                    t = (e2 @ q) / det
                    if 0 <= u and 0 <= v and u + v <= 1 and 1e-9 < t < best_t:
                        best_t, best_tri = t, int(ti)
            else:
                stack.append(int(self.left[n]))
                stack.append(int(self.right[n]))
        return best_t, best_tri


def build_mesh_bvh(positions, indices, leaf_size: int = 4) -> MeshBVH:
    """Bake a BVH with the native builder (MeshBVHBuilder::build)."""
    lib = native.load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    pos = np.ascontiguousarray(positions, np.float32)
    idx = np.ascontiguousarray(indices, np.int32)
    nt = len(idx)
    out = lib.bvh_build(
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(pos),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), nt,
        leaf_size,
    )
    try:
        nn = out.contents.num_nodes
        bvh = MeshBVH(
            node_min=np.ctypeslib.as_array(
                out.contents.node_min, shape=(nn, 3)
            ).copy(),
            node_max=np.ctypeslib.as_array(
                out.contents.node_max, shape=(nn, 3)
            ).copy(),
            left=np.ctypeslib.as_array(
                out.contents.node_left, shape=(nn,)
            ).copy(),
            right=np.ctypeslib.as_array(
                out.contents.node_right, shape=(nn,)
            ).copy(),
            tri_order=np.ctypeslib.as_array(
                out.contents.tri_order, shape=(nt,)
            ).copy(),
            positions=pos,
            indices=idx,
        )
    finally:
        lib.bvh_free(out)
    return bvh
