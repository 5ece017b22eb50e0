"""Navmesh: triangle nav queries, alias-table sampling, shortest paths.

TPU-native equivalent of the reference navmesh
(``include/madrona/navmesh.hpp``, ``src/common/navmesh.cpp`` —
initFromPolygons triangulation + adjacency, alias-table uniform area
sampling, BFS/Dijkstra traversal with a binary-heap PathFindQueue).

Design translation: construction stays host-side NumPy (assets are
baked once); queries become fixed-shape array ops so they run inside
jitted systems — sampling uses the same alias-table method keyed by the
engine's Threefry stream, point location is a masked point-in-triangle
sweep, and shortest paths are a dense Bellman-Ford relaxation over the
triangle adjacency (V-1 fixed iterations replaces the heap: the
per-world mesh is small and fixed, so a [T] relaxation vectorizes over
worlds where a heap cannot).
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from . import rng as _rng

SENTINEL = np.uint32(0xFFFFFFFF)


@dataclasses.dataclass
class Navmesh:
    """Baked navmesh tables (device arrays; static per app)."""

    verts: jnp.ndarray        # [V, 3]
    tris: jnp.ndarray         # [T, 3] vertex indices
    adjacency: jnp.ndarray    # [T, 3] neighbor tri per edge (-1 none)
    centroids: jnp.ndarray    # [T, 3]
    alias_tau: jnp.ndarray    # [T] alias-table thresholds
    alias_idx: jnp.ndarray    # [T] alias targets
    areas: jnp.ndarray        # [T]

    @property
    def num_tris(self) -> int:
        return self.tris.shape[0]

    # ----------------------------------------------------------- sampling

    def sample_point(self, key):
        """Uniform-by-area point (samplePointAndPoly, navmesh.inl).
        key: engine threefry key [2]. Returns (point [3], tri index)."""
        k1 = _rng.split_i(key, jnp.uint32(0))
        k2 = _rng.split_i(key, jnp.uint32(1))
        k3 = _rng.split_i(key, jnp.uint32(2))
        t = self.num_tris
        u = _rng.sample_uniform(k1)
        slot = jnp.minimum((u * t).astype(jnp.int32), t - 1)
        take_alias = _rng.sample_uniform(k2) > self.alias_tau[slot]
        tri = jnp.where(take_alias, self.alias_idx[slot], slot)
        # uniform barycentric (sqrt method)
        u1 = _rng.sample_uniform(k3)
        u2 = _rng.sample_uniform(_rng.split_i(key, jnp.uint32(3)))
        su = jnp.sqrt(u1)
        a, b, c = (self.verts[self.tris[tri, i]] for i in range(3))
        pt = (1 - su) * a + su * (1 - u2) * b + su * u2 * c
        return pt, tri

    # ----------------------------------------------------------- location

    def locate(self, point):
        """Triangle containing the (projected) point; nearest centroid as
        fallback. Masked sweep over all tris (no BVH needed at nav-mesh
        scale)."""
        a = self.verts[self.tris[:, 0]][:, :2]
        b = self.verts[self.tris[:, 1]][:, :2]
        c = self.verts[self.tris[:, 2]][:, :2]
        p = point[:2][None, :]

        def edge(p0, p1):
            d = p1 - p0
            return d[:, 0] * (p[:, 1] - p0[:, 1]) - d[:, 1] * (
                p[:, 0] - p0[:, 0]
            )

        e0, e1, e2 = edge(a, b), edge(b, c), edge(c, a)
        inside = ((e0 >= 0) & (e1 >= 0) & (e2 >= 0)) | (
            (e0 <= 0) & (e1 <= 0) & (e2 <= 0)
        )
        d2 = jnp.sum((self.centroids - point[None, :]) ** 2, axis=-1)
        score = jnp.where(inside, -1.0, d2)
        return jnp.argmin(score)

    # -------------------------------------------------------------- paths

    def shortest_dists(self, start_tri):
        """Centroid-graph distances from start_tri to every triangle
        (replaces dijkstrasFromPoly; dense relaxation, T-1 iters)."""
        t = self.num_tris
        nbr = self.adjacency                          # [T, 3]
        w_edge = jnp.where(
            nbr >= 0,
            jnp.linalg.norm(
                self.centroids[jnp.clip(nbr, 0)] - self.centroids[:, None, :],
                axis=-1,
            ),
            jnp.inf,
        )
        dist0 = jnp.full((t,), jnp.inf).at[start_tri].set(0.0)

        def relax(_, dist):
            via = dist[jnp.clip(nbr, 0)] + w_edge     # [T, 3]
            via = jnp.where(nbr >= 0, via, jnp.inf)
            return jnp.minimum(dist, jnp.min(via, axis=-1))

        return jax.lax.fori_loop(0, t - 1, relax, dist0)

    def next_hop(self, start_tri, goal_tri):
        """First adjacency step of the shortest start->goal path (the
        query pattern bfsFromPoly serves in the reference's envs).

        Minimizes edge_weight(start, n) + dist(n, goal) — dist alone
        would greedily pick a nearer-to-goal neighbor across a long
        edge and leave the true shortest path. Returns ``start_tri``
        when already at the goal OR when the goal is unreachable (all
        candidates infinite) — never a -1 adjacency sentinel."""
        dist_from_goal = self.shortest_dists(goal_tri)
        nbr = self.adjacency[start_tri]
        w_edge = jnp.linalg.norm(
            self.centroids[jnp.clip(nbr, 0)]
            - self.centroids[start_tri][None, :], axis=-1,
        )
        cand = jnp.where(
            nbr >= 0,
            w_edge + dist_from_goal[jnp.clip(nbr, 0)],
            jnp.inf,
        )
        best = jnp.argmin(cand)
        done = (start_tri == goal_tri) | ~jnp.isfinite(cand[best])
        return jnp.where(done, start_tri, nbr[best])


def build_navmesh(
    poly_vertices, poly_idxs, poly_sizes=None
) -> Navmesh:
    """initFromPolygons equivalent: fan-triangulate convex polygons,
    derive edge adjacency, build the alias table (navmesh.cpp:123+)."""
    verts = np.asarray(poly_vertices, np.float32)
    if poly_sizes is None:  # already triangles
        tris = np.asarray(poly_idxs, np.int64).reshape(-1, 3)
    else:
        tris = []
        off = 0
        flat = np.asarray(poly_idxs, np.int64)
        for sz in poly_sizes:
            for k in range(1, sz - 1):
                tris.append((flat[off], flat[off + k], flat[off + k + 1]))
            off += sz
        tris = np.asarray(tris, np.int64)

    t = len(tris)
    # adjacency via shared (undirected) edges
    edge_map = {}
    adjacency = np.full((t, 3), -1, np.int64)
    for ti, (i, j, k) in enumerate(tris):
        for e, (a, b) in enumerate(((i, j), (j, k), (k, i))):
            key = (min(a, b), max(a, b))
            if key in edge_map:
                tj, ej = edge_map[key]
                adjacency[ti, e] = tj
                adjacency[tj, ej] = ti
            else:
                edge_map[key] = (ti, e)

    # areas + alias table (Vose)
    va = verts[tris[:, 0]]
    vb = verts[tris[:, 1]]
    vc = verts[tris[:, 2]]
    areas = 0.5 * np.linalg.norm(
        np.cross(vb - va, vc - va), axis=-1
    ).astype(np.float64)
    p = areas / areas.sum() * t
    tau = np.ones(t, np.float32)
    alias = np.arange(t, dtype=np.int64)
    small = [i for i in range(t) if p[i] < 1.0]
    large = [i for i in range(t) if p[i] >= 1.0]
    p = p.copy()
    while small and large:
        s = small.pop()
        l = large.pop()
        tau[s] = p[s]
        alias[s] = l
        p[l] = p[l] - (1.0 - p[s])
        (small if p[l] < 1.0 else large).append(l)

    centroids = (va + vb + vc) / 3.0
    return Navmesh(
        verts=jnp.asarray(verts),
        tris=jnp.asarray(tris, jnp.int32),
        adjacency=jnp.asarray(adjacency, jnp.int32),
        centroids=jnp.asarray(centroids, jnp.float32),
        alias_tau=jnp.asarray(tau),
        alias_idx=jnp.asarray(alias, jnp.int32),
        areas=jnp.asarray(areas, jnp.float32),
    )
