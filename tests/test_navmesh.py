"""Navmesh: triangulation/adjacency, alias sampling statistics,
point location, shortest paths on a known grid mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from madrona_tpu.utils import navmesh as nm
from madrona_tpu.utils import rng as _rng


def grid_mesh(nx=4, ny=2):
    """nx x ny unit-square grid in the z=0 plane as quads."""
    verts = np.array(
        [[x, y, 0.0] for y in range(ny + 1) for x in range(nx + 1)],
        np.float32,
    )
    idx = lambda x, y: y * (nx + 1) + x
    polys, sizes = [], []
    for y in range(ny):
        for x in range(nx):
            polys += [idx(x, y), idx(x + 1, y), idx(x + 1, y + 1),
                      idx(x, y + 1)]
            sizes.append(4)
    return nm.build_navmesh(verts, polys, sizes)


def test_build_and_adjacency():
    mesh = grid_mesh()
    assert mesh.num_tris == 4 * 2 * 2
    adj = np.asarray(mesh.adjacency)
    # every triangle from a fan-split quad touches its twin
    assert ((adj >= -1) & (adj < mesh.num_tris)).all()
    for ti in range(mesh.num_tris):
        for n in adj[ti]:
            if n >= 0:
                assert ti in adj[n], (ti, n)


def test_alias_sampling_uniform_by_area():
    mesh = grid_mesh()
    k0 = _rng.key(jnp.uint32(0))
    keys = jax.vmap(lambda i: _rng.split_i(k0, i))(
        jnp.arange(4000, dtype=jnp.uint32)
    )
    pts, tris = jax.jit(jax.vmap(mesh.sample_point))(keys)
    pts = np.asarray(pts)
    assert (pts[:, 0] >= 0).all() and (pts[:, 0] <= 4).all()
    assert (pts[:, 1] >= 0).all() and (pts[:, 1] <= 2).all()
    # equal-area triangles -> roughly equal counts
    counts = np.bincount(np.asarray(tris), minlength=mesh.num_tris)
    assert counts.min() > 4000 / mesh.num_tris * 0.6, counts


def test_locate_and_path():
    mesh = grid_mesh()
    start = mesh.locate(jnp.asarray([0.2, 0.2, 0.0]))
    goal = mesh.locate(jnp.asarray([3.8, 1.8, 0.0]))
    assert int(start) != int(goal)
    dists = np.asarray(mesh.shortest_dists(goal))
    assert np.isfinite(dists).all()          # fully connected
    assert dists[int(goal)] == 0.0
    # walking next_hop strictly decreases distance-to-goal
    cur = start
    for _ in range(mesh.num_tris):
        if int(cur) == int(goal):
            break
        nxt = mesh.next_hop(cur, goal)
        assert dists[int(nxt)] < dists[int(cur)]
        cur = nxt
    assert int(cur) == int(goal)
