"""Rigid-body object registry: the ObjectManager equivalent.

TPU-native re-design of ``ObjectManager`` / ``RigidBodyMetadata``
(``include/madrona/physics.hpp:99-157``) + the loader
(``src/physics/physics_loader.cpp``): all registered object types' collision
primitives and mass data are packed into stacked device arrays indexed by
ObjectID, shared (read-only) by every world. One primitive per object
(compound bodies = future extension; the reference's example envs are all
single-primitive too).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from . import geo

RESPONSE_DYNAMIC = 0
RESPONSE_KINEMATIC = 1
RESPONSE_STATIC = 2


@dataclasses.dataclass
class ObjectManager:
    """Static (per-app, not per-world) object tables, as device arrays."""

    prim_type: jnp.ndarray        # [O] i32 (geo.TYPE_*)
    sphere_radius: jnp.ndarray    # [O] f32
    # hull tables (zeros for non-hull objects)
    hull_verts: jnp.ndarray       # [O, MAX_VERTS, 3]
    hull_verts_mask: jnp.ndarray  # [O, MAX_VERTS]
    hull_planes: jnp.ndarray      # [O, MAX_FACES, 4]
    hull_faces_mask: jnp.ndarray  # [O, MAX_FACES]
    hull_face_verts: jnp.ndarray  # [O, MAX_FACES, MAX_FACE_VERTS]
    hull_edges: jnp.ndarray       # [O, MAX_EDGES, 2]
    hull_edge_faces: jnp.ndarray  # [O, MAX_EDGES, 2]
    hull_edges_mask: jnp.ndarray  # [O, MAX_EDGES]
    # gather-free derived tables (local frame), precomputed at build():
    # TPU dynamic gathers are slow, so the narrowphase reads positions
    # directly instead of chasing vert/face indices per lane.
    hull_edge_p1: jnp.ndarray     # [O, E, 3] edge start positions
    hull_edge_p2: jnp.ndarray     # [O, E, 3] edge end positions
    hull_edge_n1: jnp.ndarray     # [O, E, 3] adjacent face normal 1
    hull_edge_n2: jnp.ndarray     # [O, E, 3] adjacent face normal 2
    hull_face_polys: jnp.ndarray      # [O, F, FV, 3] face polygon verts
    hull_face_poly_mask: jnp.ndarray  # [O, F, FV] bool
    # every hull constant flattened into one [O, K] float row, so the
    # narrowphase fetches a lane's whole hull with ONE gather (many
    # small [.., 3]-trailing gathers each pad 3 -> 128 lanes on TPU)
    hull_pack: jnp.ndarray            # [O, K] f32
    hull_pack_planar: jnp.ndarray     # [O, K] f32 (component-planar)
    hull_dims: tuple                  # static (V, F, FV, E)
    # per-object scalar params packed for one-hot lookup: inv_mass(1),
    # inv_inertia(3), mu_s(1), mu_d(1), aabb_min(3), aabb_max(3),
    # sphere_radius(1), prim_type(1 as float)
    body_pack: jnp.ndarray            # [O, 14] f32

    def obj_params(self, obj_id):
        """Per-body object params via one-hot einsum (tiny-table gathers
        like inv_mass[obj_id] each cost ~1 ms on TPU for [W,N] index
        sets; one MXU einsum against the packed block is ~free)."""
        import jax

        oh = jax.nn.one_hot(obj_id, self.body_pack.shape[0])
        blk = jnp.einsum(
            "...o,op->...p", oh, self.body_pack,
            preferred_element_type=jnp.float32,
        )
        return dict(
            inv_m=blk[..., 0], inv_i=blk[..., 1:4],
            mu_s=blk[..., 4], mu_d=blk[..., 5],
            aabb_min=blk[..., 6:9], aabb_max=blk[..., 9:12],
            sphere_radius=blk[..., 12],
            prim_type=blk[..., 13].astype(jnp.int32),
        )
    # metadata (RigidBodyMetadata)
    inv_mass: jnp.ndarray         # [O] f32
    inv_inertia: jnp.ndarray      # [O, 3] f32 (diagonal, principal frame)
    mu_s: jnp.ndarray             # [O] f32
    mu_d: jnp.ndarray             # [O] f32
    local_aabb_min: jnp.ndarray   # [O, 3]
    local_aabb_max: jnp.ndarray   # [O, 3]
    # unique edge DIRECTIONS (geo.unique_edge_dirs): the edge-edge SAT
    # axis family deduped by parallel class — boxes collapse 12 edges
    # to 3 directions, so the direction-pair sweep is D_a*D_b axes
    # instead of E_a*E_b (PhysicsConfig.sat_tier="edge_dirs")
    hull_edge_dirs: jnp.ndarray = None        # [O, D, 3] unit, local
    hull_edge_dirs_mask: jnp.ndarray = None   # [O, D] bool
    hull_edge_dir_id: jnp.ndarray = None      # [O, E] i32
    # flat per-object dirs row for one-hot fetch on the XLA path:
    # dirs.flat (3D) | mask (D) | edge dir id (E)
    hull_dirs_pack: jnp.ndarray = None        # [O, 4D + E] f32
    n_edge_dirs: int = 0                      # D (static)

    @property
    def num_objects(self) -> int:
        return self.prim_type.shape[0]


def _edge_pts(h: geo.HullData, end: int) -> np.ndarray:
    return h.verts[h.edges[:, end]].astype(np.float32)


def _edge_normals(h: geo.HullData, side: int) -> np.ndarray:
    return h.planes[h.edge_faces[:, side], :3].astype(np.float32)


def _face_polys(h: geo.HullData) -> np.ndarray:
    idx = np.clip(h.face_verts, 0, None)
    return h.verts[idx].astype(np.float32)  # [F, FV, 3]


def _pack_hull_planar(h: geo.HullData, dir_tabs=None) -> np.ndarray:
    """Component-planar variant of _pack_hull: every vector table is
    stored as x-block | y-block | z-block so kernels can take contiguous
    2-D slices (Mosaic cannot slice interior dims of >=3-D tiles).
    Order mirrors narrowphase_pallas._unpack_hull_s."""
    def planar(arr):  # [X, 3] -> [3*X] as x|y|z blocks
        return np.concatenate(
            [arr[:, 0], arr[:, 1], arr[:, 2]]
        ).astype(np.float32)

    fp = _face_polys(h)            # [F, FV, 3]
    f, fv, _ = fp.shape
    parts = [
        planar(h.verts), h.verts_mask.astype(np.float32),
        planar(h.planes[:, :3]), h.faces_mask.astype(np.float32),
        planar(_edge_pts(h, 0)), planar(_edge_pts(h, 1)),
        planar(_edge_normals(h, 0)), planar(_edge_normals(h, 1)),
        h.edges_mask.astype(np.float32),
        planar(fp.reshape(f * fv, 3)),
        (h.face_verts >= 0).astype(np.float32).reshape(-1),
    ]
    if dir_tabs is not None:
        # appended AFTER every legacy block so existing offsets hold:
        # unique edge dirs (planar 3*D) | dirs mask (D) | edge dir id (E)
        d, m, ids = dir_tabs
        parts += [
            planar(d), m.astype(np.float32), ids.astype(np.float32),
        ]
    return np.concatenate(parts).astype(np.float32)


def _pack_hull(h: geo.HullData) -> np.ndarray:
    """Flatten one hull's tables into the [K] float row read by
    narrowphase.hull_to_world (same slot order as its unpacker)."""
    parts = [
        h.verts.reshape(-1), h.verts_mask.astype(np.float32),
        h.planes[:, :3].reshape(-1), h.faces_mask.astype(np.float32),
        _edge_pts(h, 0).reshape(-1), _edge_pts(h, 1).reshape(-1),
        _edge_normals(h, 0).reshape(-1), _edge_normals(h, 1).reshape(-1),
        h.edges_mask.astype(np.float32),
        _face_polys(h).reshape(-1),
        (h.face_verts >= 0).astype(np.float32).reshape(-1),
    ]
    return np.concatenate(parts).astype(np.float32)


class ObjectRegistry:
    """Build-time accumulator; ``build()`` packs device arrays."""

    def __init__(self):
        self._rows: List[dict] = []

    def _add(self, **row) -> int:
        self._rows.append(row)
        return len(self._rows) - 1

    def add_sphere(
        self, radius: float, mass: float = 1.0,
        mu_s: float = 0.5, mu_d: float = 0.5,
        response: int = RESPONSE_DYNAMIC,
    ) -> int:
        r = float(radius)
        inv_m = 0.0 if response == RESPONSE_STATIC or mass == 0 else 1.0 / mass
        # solid sphere inertia: 2/5 m r^2
        i = 0.4 * mass * r * r
        inv_i = 0.0 if inv_m == 0.0 else 1.0 / i
        return self._add(
            prim_type=geo.TYPE_SPHERE, radius=r, hull=None,
            inv_mass=inv_m, inv_inertia=np.full(3, inv_i, np.float32),
            mu_s=mu_s, mu_d=mu_d,
            aabb=(np.full(3, -r, np.float32), np.full(3, r, np.float32)),
        )

    def add_plane(self, mu_s: float = 0.5, mu_d: float = 0.5) -> int:
        """The infinite z=0 plane primitive (normal +z in local frame),
        positioned/oriented by the entity's transform. Always static."""
        big = 1e9
        return self._add(
            prim_type=geo.TYPE_PLANE, radius=0.0, hull=None,
            inv_mass=0.0, inv_inertia=np.zeros(3, np.float32),
            mu_s=mu_s, mu_d=mu_d,
            aabb=(
                np.array([-big, -big, -big], np.float32),
                np.array([big, big, 0.0], np.float32),
            ),
        )

    def add_hull(
        self, hull: geo.HullData, mass: float = 1.0,
        mu_s: float = 0.5, mu_d: float = 0.5,
        response: int = RESPONSE_DYNAMIC,
        inertia_diag: Optional[np.ndarray] = None,
    ) -> int:
        if response == RESPONSE_STATIC or mass == 0:
            inv_m = 0.0
            inv_i = np.zeros(3, np.float32)
        else:
            inv_m = 1.0 / mass
            if inertia_diag is None:
                m_unit, _com, evals, _ = geo.hull_mass_properties(hull, 1.0)
                inertia_diag = evals * (mass / m_unit)
            inv_i = (1.0 / np.maximum(np.asarray(inertia_diag), 1e-12)).astype(
                np.float32
            )
        v = hull.verts[hull.verts_mask]
        return self._add(
            prim_type=geo.TYPE_HULL, radius=0.0, hull=hull,
            inv_mass=inv_m, inv_inertia=inv_i, mu_s=mu_s, mu_d=mu_d,
            aabb=(v.min(axis=0), v.max(axis=0)),
        )

    def add_box(
        self, half_extents, mass: float = 1.0,
        mu_s: float = 0.5, mu_d: float = 0.5,
        response: int = RESPONSE_DYNAMIC,
    ) -> int:
        he = np.broadcast_to(np.asarray(half_extents, np.float32), (3,))
        if response == RESPONSE_STATIC or mass == 0:
            inertia = None
        else:
            # analytic box inertia
            ex, ey, ez = (2 * he).tolist()
            inertia = (
                np.array(
                    [ey * ey + ez * ez, ex * ex + ez * ez, ex * ex + ey * ey],
                    np.float32,
                )
                * mass
                / 12.0
            )
        return self.add_hull(
            geo.box_hull(he), mass=mass, mu_s=mu_s, mu_d=mu_d,
            response=response, inertia_diag=inertia,
        )

    def build(self) -> ObjectManager:
        n = len(self._rows)
        if n == 0:
            raise ValueError("no objects registered")
        z_hull = geo.build_hull(
            np.array(
                [[0, 0, 0], [1e-4, 0, 0], [0, 1e-4, 0], [0, 0, 1e-4]],
                np.float32,
            ),
            [[0, 2, 1], [0, 1, 3], [1, 2, 3], [2, 0, 3]],
        )

        def stack(get):
            return np.stack([get(r) for r in self._rows])

        hull_of = lambda r: r["hull"] if r["hull"] is not None else z_hull

        # Trim hull tables to the tightest live counts across all
        # registered objects (padded MAX_* capacities are a per-app
        # worst case; box-only apps get 8/6/12 instead of 16/12/24 —
        # the SAT narrowphase cost is quadratic in the edge count).
        hulls = [hull_of(r) for r in self._rows]
        nv = max(int(h.verts_mask.sum()) for h in hulls)
        nf = max(int(h.faces_mask.sum()) for h in hulls)
        ne = max(int(h.edges_mask.sum()) for h in hulls)
        nfv = max(
            int((h.face_verts >= 0).sum(axis=1).max()) for h in hulls
        )
        trimmed = {
            id(h): dataclasses.replace(
                h,
                verts=h.verts[:nv], verts_mask=h.verts_mask[:nv],
                planes=h.planes[:nf], faces_mask=h.faces_mask[:nf],
                face_verts=h.face_verts[:nf, :nfv],
                edges=h.edges[:ne], edge_faces=h.edge_faces[:ne],
                edges_mask=h.edges_mask[:ne],
            )
            for h in hulls
        }
        hull_of = lambda r: trimmed[
            id(r["hull"] if r["hull"] is not None else z_hull)
        ]
        # unique edge directions — HULL-typed rows only (the zero-hull
        # placeholder of planes/spheres is a triangulated box whose
        # diagonal edges would inflate the app-wide direction count D,
        # and non-hull rows never enter the hull-hull SAT)
        dirs_of = {}
        for r in self._rows:
            h = hull_of(r)
            if r["prim_type"] == geo.TYPE_HULL and id(h) not in dirs_of:
                dirs_of[id(h)] = geo.unique_edge_dirs(h)
        nd = max(
            [1] + [len(d) for d, _ in dirs_of.values()]
        )

        def dir_tabs(r):
            d, ids = dirs_of.get(
                id(hull_of(r)),
                (np.zeros((0, 3), np.float32), np.zeros(ne, np.int32)),
            )
            pad = np.zeros((nd, 3), np.float32)
            pad[: len(d)] = d
            m = np.zeros(nd, bool)
            m[: len(d)] = True
            return pad, m, ids.astype(np.int32)

        om = ObjectManager(
            prim_type=jnp.asarray(stack(lambda r: np.int32(r["prim_type"]))),
            sphere_radius=jnp.asarray(
                stack(lambda r: np.float32(r["radius"]))
            ),
            hull_verts=jnp.asarray(stack(lambda r: hull_of(r).verts)),
            hull_verts_mask=jnp.asarray(
                stack(lambda r: hull_of(r).verts_mask)
            ),
            hull_planes=jnp.asarray(stack(lambda r: hull_of(r).planes)),
            hull_faces_mask=jnp.asarray(
                stack(lambda r: hull_of(r).faces_mask)
            ),
            hull_face_verts=jnp.asarray(
                stack(lambda r: hull_of(r).face_verts)
            ),
            hull_edges=jnp.asarray(stack(lambda r: hull_of(r).edges)),
            hull_edge_faces=jnp.asarray(
                stack(lambda r: hull_of(r).edge_faces)
            ),
            hull_edges_mask=jnp.asarray(
                stack(lambda r: hull_of(r).edges_mask)
            ),
            hull_edge_p1=jnp.asarray(
                stack(lambda r: _edge_pts(hull_of(r), 0))
            ),
            hull_edge_p2=jnp.asarray(
                stack(lambda r: _edge_pts(hull_of(r), 1))
            ),
            hull_edge_n1=jnp.asarray(
                stack(lambda r: _edge_normals(hull_of(r), 0))
            ),
            hull_edge_n2=jnp.asarray(
                stack(lambda r: _edge_normals(hull_of(r), 1))
            ),
            hull_face_polys=jnp.asarray(
                stack(lambda r: _face_polys(hull_of(r)))
            ),
            hull_face_poly_mask=jnp.asarray(
                stack(lambda r: hull_of(r).face_verts >= 0)
            ),
            hull_pack=jnp.asarray(stack(lambda r: _pack_hull(hull_of(r)))),
            hull_pack_planar=jnp.asarray(
                stack(lambda r: _pack_hull_planar(
                    hull_of(r), dir_tabs(r)
                ))
            ),
            hull_dims=(nv, nf, nfv, ne),
            hull_edge_dirs=jnp.asarray(stack(lambda r: dir_tabs(r)[0])),
            hull_edge_dirs_mask=jnp.asarray(
                stack(lambda r: dir_tabs(r)[1])
            ),
            hull_edge_dir_id=jnp.asarray(stack(lambda r: dir_tabs(r)[2])),
            hull_dirs_pack=jnp.asarray(stack(lambda r: np.concatenate([
                dir_tabs(r)[0].reshape(-1),
                dir_tabs(r)[1].astype(np.float32),
                dir_tabs(r)[2].astype(np.float32),
            ]).astype(np.float32))),
            n_edge_dirs=nd,
            body_pack=jnp.asarray(
                stack(
                    lambda r: np.concatenate([
                        [np.float32(r["inv_mass"])],
                        np.asarray(r["inv_inertia"], np.float32),
                        [np.float32(r["mu_s"]), np.float32(r["mu_d"])],
                        np.asarray(r["aabb"][0], np.float32),
                        np.asarray(r["aabb"][1], np.float32),
                        [np.float32(r["radius"]),
                         np.float32(r["prim_type"])],
                    ])
                )
            ),
            inv_mass=jnp.asarray(stack(lambda r: np.float32(r["inv_mass"]))),
            inv_inertia=jnp.asarray(
                stack(lambda r: np.asarray(r["inv_inertia"], np.float32))
            ),
            mu_s=jnp.asarray(stack(lambda r: np.float32(r["mu_s"]))),
            mu_d=jnp.asarray(stack(lambda r: np.float32(r["mu_d"]))),
            local_aabb_min=jnp.asarray(
                stack(lambda r: np.asarray(r["aabb"][0], np.float32))
            ),
            local_aabb_max=jnp.asarray(
                stack(lambda r: np.asarray(r["aabb"][1], np.float32))
            ),
        )
        return om
