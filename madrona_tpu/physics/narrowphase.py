"""Narrowphase: batched SAT contact generation for candidate pairs.

TPU-native re-design of ``src/physics/narrowphase.cpp`` (1,964 LoC,
warp-cooperative). The reference dispatches per candidate pair on
``typeA | typeB`` (Sphere=1, Hull=2, Plane=4 — narrowphase.cpp:96-103,
1752-1760) and runs SAT with half-edge traversal; here every candidate
lane computes fixed-shape masked reductions over padded hull tables and
the pair type selects between results — the vmapped equivalent of the
megakernel's 32-threads-per-pair cooperative scheme.

Algorithm parity with the reference:
  * face query: max over A's faces of (min over B's verts of signed dist)
    (queryFaceDirections, narrowphase.cpp:339-365)
  * edge query: Gauss-map Minkowski-face prune then edge-pair distance
    (isMinkowskiFace/edgeDistance/queryEdgeDirections, :367-567)
  * face manifold: clip incident face (most anti-normal face of the other
    hull) against ref-face side planes, keep points below ref plane,
    project onto it (createFaceContact, :881-989); reduce to <=4 points by
    the Gregorius area heuristic (buildFaceContactManifold, :771-879)
  * edge manifold: closest point on A's edge, depth=-separation
    (createEdgeContact, :1070-1108)
  * hull-plane / sphere-plane: plane is always the reference
    (doSATPlane :740-769, SpherePlane :1420-1460)

Contact convention (one deliberate deviation, documented): contact points
lie on the REF body's surface and the normal points ref -> other, so the
XPBD positional solve separates the pair. The reference follows this for
plane/face/edge contacts but emits sphere-sphere/sphere-hull contacts
with the point on the *other* body and a flipped normal
(narrowphase.cpp:1310-1330 vs 1534); we emit the consistent orientation
for all pair types.

Output: fixed-capacity per-world contact buffer — the TPU equivalent of
``makeTemporary`` contact rows (addManifoldContacts, :1140-1167).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..utils import math3d as m3
from . import geo

# Manifold/clipping buffer sizes: clipping an 8-gon against 8 side planes
# can at most double the vertex count per pass is bounded overall by
# nA + nB; 16 covers MAX_FACE_VERTS * 2.
CLIP_BUF = 16
NEG_BIG = -3.0e38
BIG = 3.0e38


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class HullW:
    """One hull transformed to world space (padded arrays)."""

    verts: jnp.ndarray       # [V, 3]
    verts_mask: jnp.ndarray  # [V]
    planes_n: jnp.ndarray    # [F, 3]
    planes_d: jnp.ndarray    # [F]
    faces_mask: jnp.ndarray  # [F]
    face_verts: jnp.ndarray  # [F, FV]
    edges: jnp.ndarray       # [E, 2]
    edge_faces: jnp.ndarray  # [E, 2]
    edges_mask: jnp.ndarray  # [E]
    center: jnp.ndarray      # [3]


def hull_to_world(om, obj_idx, pos, rot, scale) -> HullW:
    """Transform object obj_idx's hull into world frame.

    Equivalent of makeHullState (narrowphase.cpp:151-223): verts scaled,
    rotated, translated; plane normals re-derived to stay valid under
    non-uniform scale (n' ~ R @ (n / scale)).
    """
    verts_l = om.hull_verts[obj_idx] * scale[None, :]
    verts = m3.quat_rotate(rot[None, :], verts_l) + pos[None, :]
    n_l = om.hull_planes[obj_idx, :, :3] / jnp.maximum(scale[None, :], 1e-12)
    n_w = m3.quat_rotate(rot[None, :], n_l)
    n_w = m3.normalize(n_w)
    # plane d from a representative on-face vertex
    rep_v = jnp.clip(om.hull_face_verts[obj_idx, :, 0], 0, None)
    rep_pt = verts[rep_v]
    d_w = jnp.sum(n_w * rep_pt, axis=-1)
    vm = om.hull_verts_mask[obj_idx]
    denom = jnp.maximum(jnp.sum(vm), 1)
    center = jnp.sum(jnp.where(vm[:, None], verts, 0.0), axis=0) / denom
    return HullW(
        verts=verts,
        verts_mask=vm,
        planes_n=n_w,
        planes_d=d_w,
        faces_mask=om.hull_faces_mask[obj_idx],
        face_verts=om.hull_face_verts[obj_idx],
        edges=om.hull_edges[obj_idx],
        edge_faces=om.hull_edge_faces[obj_idx],
        edges_mask=om.hull_edges_mask[obj_idx],
        center=center,
    )


def _support_dist(plane_n, plane_d, verts, verts_mask):
    """min over verts of signed distance below plane (per plane).

    plane_n [F,3], plane_d [F]; verts [V,3]. Returns [F] min distances —
    the inner loop of queryFaceDirections.
    """
    d = verts @ plane_n.T - plane_d[None, :]  # [V, F]
    d = jnp.where(verts_mask[:, None], d, BIG)
    return jnp.min(d, axis=0)


def query_face_directions(a: HullW, b: HullW):
    """(max separation, face idx) of A's faces vs B's verts."""
    seps = _support_dist(a.planes_n, a.planes_d, b.verts, b.verts_mask)
    seps = jnp.where(a.faces_mask, seps, NEG_BIG)
    idx = jnp.argmax(seps)
    return seps[idx], idx


def _is_minkowski_face(na1, na2, nb1, nb2):
    """Gauss-map arc intersection test (narrowphase.cpp:367-380).
    Vectorized over leading axes."""
    bxa = jnp.cross(na2, na1)
    dxc = jnp.cross(nb2, nb1)
    cba = jnp.sum(nb1 * bxa, axis=-1)
    dba = jnp.sum(nb2 * bxa, axis=-1)
    adc = jnp.sum(na1 * dxc, axis=-1)
    bdc = jnp.sum(na2 * dxc, axis=-1)
    return (cba * dba < 0.0) & (adc * bdc < 0.0) & (cba * bdc > 0.0)


def query_edge_directions(a: HullW, b: HullW):
    """(max separation, edge idx A, edge idx B, normal) over Gauss-map-
    valid edge pairs (queryEdgeDirections, narrowphase.cpp:464-567)."""
    ea_p1 = a.verts[a.edges[:, 0]]            # [Ea, 3]
    ea_p2 = a.verts[a.edges[:, 1]]
    eb_p1 = b.verts[b.edges[:, 0]]            # [Eb, 3]
    eb_p2 = b.verts[b.edges[:, 1]]
    na1 = a.planes_n[a.edge_faces[:, 0]]      # [Ea, 3]
    na2 = a.planes_n[a.edge_faces[:, 1]]
    nb1 = b.planes_n[b.edge_faces[:, 0]]
    nb2 = b.planes_n[b.edge_faces[:, 1]]

    # pairwise [Ea, Eb]
    mink = _is_minkowski_face(
        na1[:, None, :], na2[:, None, :], -nb1[None, :, :], -nb2[None, :, :]
    )
    dir_a = (ea_p2 - ea_p1)[:, None, :]
    dir_b = (eb_p2 - eb_p1)[None, :, :]
    cr = jnp.cross(dir_a, dir_b)
    len2 = jnp.sum(cr * cr, axis=-1)
    ok = mink & (len2 > 1e-12) & a.edges_mask[:, None] & b.edges_mask[None, :]
    inv_len = jax.lax.rsqrt(jnp.maximum(len2, 1e-30))
    n = cr * inv_len[..., None]
    # orient away from A's center
    to_edge = ea_p1[:, None, :] - a.center[None, None, :]
    flip = jnp.sum(n * to_edge, axis=-1) < 0.0
    n = jnp.where(flip[..., None], -n, n)
    sep = jnp.sum(n * (eb_p1[None, :, :] - ea_p1[:, None, :]), axis=-1)
    sep = jnp.where(ok, sep, NEG_BIG)
    flat = jnp.argmax(sep)
    ia, ib = flat // sep.shape[1], flat % sep.shape[1]
    return sep[ia, ib], ia, ib, n[ia, ib]


def _find_incident_face(h: HullW, ref_normal):
    """Most anti-parallel face (findIncidentFace, narrowphase.cpp:569)."""
    dots = h.planes_n @ ref_normal
    dots = jnp.where(h.faces_mask, dots, BIG)
    return jnp.argmin(dots)


def _face_polygon(h: HullW, face_idx):
    """([FV, 3] verts, [FV] mask) of one face, in stored CCW order."""
    idx = h.face_verts[face_idx]
    mask = idx >= 0
    pts = h.verts[jnp.clip(idx, 0, None)]
    return pts, mask


def _clip_polygon_fixed(poly, poly_mask, plane_n, plane_d):
    """One Sutherland-Hodgman pass with fixed [CLIP_BUF] buffers.

    Matches clipPolygon (narrowphase.cpp:617-654): keeps the region with
    signed distance <= 0. Returns (new_poly, new_mask).
    """
    count = jnp.sum(poly_mask.astype(jnp.int32))
    k = poly.shape[0]
    idx = jnp.arange(k)
    prev_idx = jnp.where(idx == 0, jnp.maximum(count - 1, 0), idx - 1)
    v2 = poly
    v1 = poly[prev_idx]
    d2 = v2 @ plane_n - plane_d
    d1 = v1 @ plane_n - plane_d

    t = d1 / jnp.where(jnp.abs(d1 - d2) > 1e-12, d1 - d2, 1.0)
    inter = v1 + t[:, None] * (v2 - v1)

    live = poly_mask
    keep_v2 = live & (d2 <= 0.0)
    emit_inter = live & ((d1 <= 0.0) != (d2 <= 0.0))
    # per input vertex, up to 2 outputs: [intersection?, v2?]
    out_pts = jnp.stack([inter, v2], axis=1).reshape(2 * k, 3)
    out_ok = jnp.stack([emit_inter, keep_v2], axis=1).reshape(2 * k)
    # compact to CLIP_BUF
    pos = jnp.cumsum(out_ok.astype(jnp.int32)) - out_ok.astype(jnp.int32)
    dest = jnp.where(out_ok, pos, CLIP_BUF)
    new_poly = jnp.zeros((CLIP_BUF + 1, 3), poly.dtype)
    new_poly = new_poly.at[dest].set(out_pts, mode="drop")[:CLIP_BUF]
    new_count = jnp.sum(out_ok.astype(jnp.int32))
    new_mask = jnp.arange(CLIP_BUF) < new_count
    return new_poly, new_mask


def _reduce_manifold(points, depths, mask, normal):
    """Select <=4 contact points (buildFaceContactManifold heuristic):
    first valid point; farthest from it; max |triangle area|; most
    negative-area-extending fourth. Fixed-shape version of
    narrowphase.cpp:771-879."""
    n_pts = jnp.sum(mask.astype(jnp.int32))

    def few_case():
        # keep first 4 valid (compact)
        posi = jnp.cumsum(mask.astype(jnp.int32)) - mask.astype(jnp.int32)
        dest = jnp.where(mask, posi, CLIP_BUF)
        pts4 = jnp.zeros((CLIP_BUF + 1, 3), points.dtype)
        pts4 = pts4.at[dest].set(points, mode="drop")[:4]
        dep4 = jnp.zeros((CLIP_BUF + 1,), depths.dtype)
        dep4 = dep4.at[dest].set(depths, mode="drop")[:4]
        return pts4, dep4, jnp.minimum(n_pts, 4)

    def reduce_case():
        first = jnp.argmax(mask)
        p0 = points[first]
        d0 = depths[first]
        dist2 = jnp.sum((points - p0) ** 2, axis=-1)
        dist2 = jnp.where(mask, dist2, NEG_BIG)
        i1 = jnp.argmax(dist2)
        p1, d1 = points[i1], depths[i1]
        ba = p1 - p0
        bc = points - p1
        signed = jnp.sum(normal * jnp.cross(ba[None, :], bc), axis=-1)
        area = jnp.abs(signed)
        area = jnp.where(mask, area, NEG_BIG)
        i2 = jnp.argmax(area)
        p2, d2 = points[i2], depths[i2]
        # ensure CCW
        flip = signed[i2] < 0
        q0 = jnp.where(flip, p1, p0)
        q1 = jnp.where(flip, p0, p1)
        e0, e1 = jnp.where(flip, d1, d0), jnp.where(flip, d0, d1)
        ba2 = q1 - q0
        cb = p2 - q1
        ac = q0 - p2
        aq = q0[None, :] - points
        qc = points - p2[None, :]
        abq = jnp.sum(normal * jnp.cross(ba2[None, :], aq), axis=-1)
        bcq = jnp.sum(normal * jnp.cross(cb[None, :], qc), axis=-1)
        caq = jnp.sum(normal * jnp.cross(aq, ac[None, :]), axis=-1)
        qarea = jnp.minimum(abq, jnp.minimum(bcq, caq))
        qarea = jnp.where(mask, qarea, BIG)
        i3 = jnp.argmin(qarea)
        p3, d3 = points[i3], depths[i3]
        pts4 = jnp.stack([q0, q1, p2, p3])
        dep4 = jnp.stack([e0, e1, d2, d3])
        return pts4, dep4, jnp.int32(4)

    return jax.lax.cond(n_pts <= 4, few_case, reduce_case)


def face_contact_manifold(ref: HullW, ref_face, ref_n, ref_d, other: HullW):
    """Clip other's incident face against ref face side planes; project
    survivors onto the ref plane. Returns (points4 [4,3], depths4 [4],
    num_points, normal)."""
    inc_face = _find_incident_face(other, ref_n)
    poly, poly_mask = _face_polygon(other, inc_face)
    # pad to CLIP_BUF
    poly = jnp.concatenate(
        [poly, jnp.zeros((CLIP_BUF - poly.shape[0], 3), poly.dtype)]
    )
    poly_mask = jnp.concatenate(
        [poly_mask, jnp.zeros((CLIP_BUF - poly_mask.shape[0],), bool)]
    )
    # compact the input (face verts are already contiguous, but be safe)
    ref_pts, ref_mask = _face_polygon(ref, ref_face)
    fv = ref_pts.shape[0]
    count = jnp.sum(ref_mask.astype(jnp.int32))

    def clip_step(i, carry):
        poly, poly_mask = carry
        cur = ref_pts[i]
        nxt = ref_pts[jnp.where(i + 1 >= count, 0, i + 1)]
        edge = nxt - cur
        side_n = jnp.cross(edge, ref_n)
        side_d = jnp.dot(side_n, cur)

        def do(_):
            return _clip_polygon_fixed(poly, poly_mask, side_n, side_d)

        return jax.lax.cond(i < count, do, lambda _: (poly, poly_mask), None)

    poly, poly_mask = jax.lax.fori_loop(0, fv, clip_step, (poly, poly_mask))

    # keep points below ref plane, project onto it
    d = poly @ ref_n - ref_d
    below = poly_mask & (d <= 0.0)
    proj = poly - d[:, None] * ref_n[None, :]
    depths = -d
    pts4, dep4, npts = _reduce_manifold(proj, depths, below, ref_n)
    return pts4, dep4, npts, ref_n


def hull_hull_contact(a: HullW, b: HullW):
    """Full SAT + manifold for one hull pair (doSAT + generateContacts).

    Returns dict(valid, ref_is_a, points [4,3], depths [4], num, normal).
    """
    sep_a, face_a = query_face_directions(a, b)
    sep_b, face_b = query_face_directions(b, a)
    sep_e, ea, eb, n_e = query_edge_directions(a, b)
    separated = (sep_a > 0.0) | (sep_b > 0.0) | (sep_e > 0.0)

    is_face = (sep_a > sep_e) | (sep_b > sep_e)
    a_is_ref = sep_a >= sep_b

    def face_case(_):
        def a_ref(_):
            pts, dep, n_pts, nrm = face_contact_manifold(
                a, face_a, a.planes_n[face_a], a.planes_d[face_a], b
            )
            return pts, dep, n_pts, nrm, jnp.bool_(True)

        def b_ref(_):
            pts, dep, n_pts, nrm = face_contact_manifold(
                b, face_b, b.planes_n[face_b], b.planes_d[face_b], a
            )
            return pts, dep, n_pts, nrm, jnp.bool_(False)

        return jax.lax.cond(a_is_ref, a_ref, b_ref, None)

    def edge_case(_):
        # closest point on A's edge to B's edge (createEdgeContact)
        pa1 = a.verts[a.edges[ea, 0]]
        pa2 = a.verts[a.edges[ea, 1]]
        pb1 = b.verts[b.edges[eb, 0]]
        pb2 = b.verts[b.edges[eb, 1]]
        v1 = pa2 - pa1
        v2 = pb2 - pb1
        v21 = pb1 - pa1
        d22 = jnp.dot(v2, v2)
        d11 = jnp.dot(v1, v1)
        d21 = jnp.dot(v2, v1)
        d211 = jnp.dot(v21, v1)
        d212 = jnp.dot(v21, v2)
        denom = d21 * d21 - d22 * d11
        s_par = jnp.float32(0.0)
        t_par = (d11 * s_par - d211) / jnp.where(
            jnp.abs(d21) > 1e-12, d21, 1.0
        )
        s_gen = (d212 * d21 - d22 * d211) / denom
        degenerate = jnp.abs(denom) < 1e-5
        s = jnp.where(degenerate, s_par, s_gen)
        s = jnp.clip(s, 0.0, 1.0)
        contact = pa1 + s * v1
        pts = jnp.zeros((4, 3), jnp.float32).at[0].set(contact)
        dep = jnp.zeros((4,), jnp.float32).at[0].set(-sep_e)
        return pts, dep, jnp.int32(1), n_e, jnp.bool_(True)

    pts, dep, n_pts, nrm, ref_is_a = jax.lax.cond(
        is_face, face_case, edge_case, None
    )
    valid = (~separated) & (n_pts > 0)
    return dict(
        valid=valid, ref_is_a=ref_is_a, points=pts, depths=dep,
        num=jnp.where(valid, n_pts, 0), normal=nrm,
    )


def hull_plane_contact(h: HullW, plane_pos, plane_rot):
    """Hull vs infinite plane (doSATPlane). Plane is ref; normal = plane
    +z in world. Returns same dict shape (ref_is_a == False meaning the
    plane — caller maps to its body index)."""
    n = m3.quat_rotate(plane_rot, jnp.array([0.0, 0.0, 1.0]))
    d = jnp.dot(n, plane_pos)
    vd = h.verts @ n - d
    vd_masked = jnp.where(h.verts_mask, vd, BIG)
    separation = jnp.min(vd_masked)

    inc_face = _find_incident_face(h, n)
    poly, poly_mask = _face_polygon(h, inc_face)
    pd = poly @ n - d
    below = poly_mask & (pd <= 0.0)
    proj = poly - pd[:, None] * n[None, :]
    depths = -pd
    # pad to CLIP_BUF for the shared reducer
    pad = CLIP_BUF - poly.shape[0]
    proj = jnp.concatenate([proj, jnp.zeros((pad, 3), proj.dtype)])
    depths = jnp.concatenate([depths, jnp.zeros((pad,), depths.dtype)])
    below = jnp.concatenate([below, jnp.zeros((pad,), bool)])
    pts4, dep4, npts = _reduce_manifold(proj, depths, below, n)
    valid = (separation <= 0.0) & (npts > 0)
    return dict(
        valid=valid, ref_is_a=jnp.bool_(False), points=pts4, depths=dep4,
        num=jnp.where(valid, npts, 0), normal=n,
    )


def sphere_sphere_contact(a_pos, a_r, b_pos, b_r):
    """Point on ref(B)'s surface, normal ref->other (see module docstring
    re: deviation from narrowphase.cpp:1290-1330)."""
    to_b = b_pos - a_pos
    dist = jnp.sqrt(jnp.maximum(jnp.sum(to_b * to_b), 1e-30))
    n_ab = to_b / dist
    up = jnp.array([0.0, 0.0, 1.0])
    n_ab = jnp.where(dist > 1e-12, n_ab, up)
    penetration = a_r + b_r - dist
    n = -n_ab                      # ref(B) -> other(A)
    pt = b_pos + b_r * n           # on B's surface toward A
    pts = jnp.zeros((4, 3)).at[0].set(pt)
    dep = jnp.zeros((4,)).at[0].set(penetration)
    valid = penetration >= 0.0
    return dict(
        valid=valid, ref_is_a=jnp.bool_(False), points=pts, depths=dep,
        num=jnp.where(valid, 1, 0), normal=n,
    )


def sphere_plane_contact(s_pos, s_r, plane_pos, plane_rot):
    """SpherePlane (narrowphase.cpp:1420-1460): plane is ref."""
    n = m3.quat_rotate(plane_rot, jnp.array([0.0, 0.0, 1.0]))
    d = jnp.dot(n, plane_pos)
    t = jnp.dot(n, s_pos) - d
    penetration = s_r - t
    pt = s_pos - t * n
    pts = jnp.zeros((4, 3)).at[0].set(pt)
    dep = jnp.zeros((4,)).at[0].set(penetration)
    valid = penetration >= 0.0
    return dict(
        valid=valid, ref_is_a=jnp.bool_(False), points=pts, depths=dep,
        num=jnp.where(valid, 1, 0), normal=n,
    )


def sphere_hull_contact(s_pos, s_r, h: HullW):
    """Sphere vs hull via exact closest-point enumeration over the padded
    face polygons (replaces the reference's GJK + deep-SAT fallback,
    narrowphase.cpp:1332-1418; exact for our bounded hull sizes)."""
    # signed distances to all face planes
    fd = h.planes_n @ s_pos - h.planes_d
    fd_masked = jnp.where(h.faces_mask, fd, NEG_BIG)
    max_fd = jnp.max(fd_masked)
    inside = max_fd <= 0.0

    # closest point on hull surface: consider per-face projected point
    # clamped into the face polygon via edge/vertex checks. Enumerate:
    # (1) per-vertex distance, (2) per-edge segment closest point,
    # (3) per-face plane projection if it lies inside the face.
    vdist2 = jnp.sum((h.verts - s_pos) ** 2, axis=-1)
    vdist2 = jnp.where(h.verts_mask, vdist2, BIG)
    vi = jnp.argmin(vdist2)
    best_pt = h.verts[vi]
    best_d2 = vdist2[vi]

    e1 = h.verts[h.edges[:, 0]]
    e2 = h.verts[h.edges[:, 1]]
    ev = e2 - e1
    tt = jnp.sum((s_pos - e1) * ev, axis=-1) / jnp.maximum(
        jnp.sum(ev * ev, axis=-1), 1e-12
    )
    tt = jnp.clip(tt, 0.0, 1.0)
    ept = e1 + tt[:, None] * ev
    ed2 = jnp.sum((ept - s_pos) ** 2, axis=-1)
    ed2 = jnp.where(h.edges_mask, ed2, BIG)
    ei = jnp.argmin(ed2)
    best_pt = jnp.where(ed2[ei] < best_d2, ept[ei], best_pt)
    best_d2 = jnp.minimum(ed2[ei], best_d2)

    # face interior projections: point - d*n inside all side planes
    proj = s_pos[None, :] - fd[:, None] * h.planes_n  # [F, 3]

    def inside_face(f_idx):
        pts, mask = _face_polygon(h, f_idx)
        count = jnp.sum(mask.astype(jnp.int32))
        nxt = jnp.roll(jnp.arange(pts.shape[0]), -1)
        nxt = jnp.where(nxt >= count, 0, nxt)
        edges = pts[nxt] - pts
        side_n = jnp.cross(edges, h.planes_n[f_idx][None, :])
        sd = jnp.sum(side_n * (proj[f_idx][None, :] - pts), axis=-1)
        ok = jnp.all(jnp.where(mask, sd <= 1e-7, True))
        return ok

    f_inside = jax.vmap(inside_face)(jnp.arange(h.planes_n.shape[0]))
    f_ok = f_inside & h.faces_mask & (fd > 0.0)
    f_d2 = jnp.where(f_ok, fd * fd, BIG)
    fi = jnp.argmin(f_d2)
    best_pt = jnp.where(f_d2[fi] < best_d2, proj[fi], best_pt)
    best_d2 = jnp.minimum(f_d2[fi], best_d2)

    dist = jnp.sqrt(jnp.maximum(best_d2, 1e-30))
    to_sphere = (s_pos - best_pt) / dist
    # deep case: face of least penetration
    deep_face = jnp.argmax(fd_masked)
    deep_n = h.planes_n[deep_face]
    n = jnp.where(inside, deep_n, to_sphere)      # ref(hull) -> sphere
    depth = jnp.where(inside, -max_fd + s_r, s_r - dist)
    pt = jnp.where(
        inside, s_pos - (fd_masked[deep_face]) * deep_n, best_pt
    )
    pts = jnp.zeros((4, 3)).at[0].set(pt)
    dep = jnp.zeros((4,)).at[0].set(depth)
    valid = depth >= 0.0
    return dict(
        valid=valid, ref_is_a=jnp.bool_(False), points=pts, depths=dep,
        num=jnp.where(valid, 1, 0), normal=n,
    )
