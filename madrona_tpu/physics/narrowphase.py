"""Narrowphase: batched SAT contact generation for candidate pairs.

TPU-native re-design of ``src/physics/narrowphase.cpp`` (1,964 LoC,
warp-cooperative). The reference dispatches per candidate pair on
``typeA | typeB`` (Sphere=1, Hull=2, Plane=4 — narrowphase.cpp:96-103,
1752-1760) and runs SAT with half-edge traversal; here every candidate
lane computes fixed-shape masked reductions over padded hull tables and
the pair type selects between results — the vmapped equivalent of the
megakernel's 32-threads-per-pair cooperative scheme.

TPU execution-shape rules this module follows (dynamic gathers and
scatters are the slowest ops on the VPU):
  * No per-lane index chasing. ObjectManager precomputes position-valued
    tables (edge endpoints, edge face normals, face polygons) so every
    hull query is an elementwise transform + masked reduction.
  * No iterative Sutherland-Hodgman clipping. The clipped polygon's
    vertex set is computed directly: incident-face vertices inside the
    ref side planes, plus incident-edge x side-plane intersections that
    lie inside the region — a fixed [FV + FV*FV] candidate set.
  * Scalar per-lane selections (argmax winners) become one-hot
    reductions, not gathers.

Algorithm parity with the reference:
  * face query: max over A's faces of (min over B's verts of signed dist)
    (queryFaceDirections, narrowphase.cpp:339-365)
  * edge query: Gauss-map Minkowski-face prune then edge-pair distance
    (isMinkowskiFace/edgeDistance/queryEdgeDirections, :367-567)
  * face manifold: clipped incident polygon against ref-face side planes,
    points kept below ref plane, projected onto it (createFaceContact,
    :881-989); reduced to <=4 points by the Gregorius heuristics
    (buildFaceContactManifold, :771-879) via masked argmax picks.
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
for all pair types. Manifold point *order* may differ from the
reference's clip order (the reducer picks are order-insensitive).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..utils import math3d as m3

NEG_BIG = -3.0e38
BIG = 3.0e38


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class HullW:
    """One hull transformed to world space (gather-free padded arrays)."""

    verts: jnp.ndarray           # [V, 3]
    verts_mask: jnp.ndarray      # [V]
    planes_n: jnp.ndarray        # [F, 3]
    planes_d: jnp.ndarray        # [F]
    faces_mask: jnp.ndarray      # [F]
    edge_p1: jnp.ndarray         # [E, 3] world edge endpoints
    edge_p2: jnp.ndarray         # [E, 3]
    edge_n1: jnp.ndarray         # [E, 3] world adjacent-face normals
    edge_n2: jnp.ndarray         # [E, 3]
    edges_mask: jnp.ndarray      # [E]
    face_polys: jnp.ndarray      # [F, FV, 3] world face polygons
    face_poly_mask: jnp.ndarray  # [F, FV]
    center: jnp.ndarray          # [3]
    # edge-direction SAT tier (sat_tier="edge_dirs"): unique edge
    # directions in world frame (scaled+rotated, unnormalized), their
    # mask, and each edge's direction id
    edge_dirs: jnp.ndarray = None        # [D, 3]
    edge_dirs_mask: jnp.ndarray = None   # [D]
    edge_dir_id: jnp.ndarray = None      # [E]


def hull_to_world(om, obj_idx, pos, rot, scale) -> HullW:
    """Transform object obj_idx's hull into world frame.

    Equivalent of makeHullState (narrowphase.cpp:151-223): positions are
    scaled/rotated/translated; normals re-derived to stay valid under
    non-uniform scale (n' ~ R @ (n / scale)).

    All hull constants arrive via ONE fetch of the packed [K] row
    (om.hull_pack) — unpacking is slicing, which fuses; per-table gathers
    would each materialize a [.., 3]-trailing buffer (42x lane padding
    under TPU tiling)."""
    row = om.hull_pack[obj_idx]               # [K]
    return hull_row_to_world(row, om.hull_dims, pos, rot, scale)


def hull_row_to_world(row, dims, pos, rot, scale,
                      need_edges: bool = True, dirs_row=None,
                      n_dirs: int = 0) -> HullW:
    """hull_to_world from a pre-fetched packed row (callers batch the
    row fetch as a one-hot einsum — see api._narrowphase_all).

    need_edges=False skips the edge-table transforms (hull-plane and
    sphere-plane queries never touch them — ~40% of the transform
    work)."""
    v, f, fv, e = dims

    def cut(k, shape=None):
        nonlocal off
        out = row[off:off + k]
        off += k
        return out if shape is None else out.reshape(shape)

    off = 0
    verts_l = cut(v * 3, (v, 3))
    vm = cut(v) > 0.5
    planes_nl = cut(f * 3, (f, 3))
    faces_mask = cut(f) > 0.5
    edge_p1l = cut(e * 3, (e, 3))
    edge_p2l = cut(e * 3, (e, 3))
    edge_n1l = cut(e * 3, (e, 3))
    edge_n2l = cut(e * 3, (e, 3))
    edges_mask = cut(e) > 0.5
    face_polys_l = cut(f * fv * 3, (f, fv, 3))
    face_poly_mask = cut(f * fv, (f, fv)) > 0.5

    def xform_pt(p):
        return m3.quat_rotate(rot, p * scale) + pos

    def xform_n(n):
        return m3.normalize(
            m3.quat_rotate(rot, n / jnp.maximum(scale, 1e-12))
        )

    verts = xform_pt(verts_l)
    n_w = xform_n(planes_nl)
    face_polys = xform_pt(face_polys_l)
    # plane d from the face's first polygon vertex (always live)
    d_w = jnp.sum(n_w * face_polys[:, 0, :], axis=-1)
    denom = jnp.maximum(jnp.sum(vm), 1)
    center = jnp.sum(jnp.where(vm[:, None], verts, 0.0), axis=0) / denom
    dirs_kw = {}
    if dirs_row is not None and n_dirs:
        d = n_dirs
        dirs_l = dirs_row[: 3 * d].reshape(d, 3)
        dirs_kw = dict(
            # scaled edge direction = S*d then rotate (NOT the normal
            # transform); unnormalized — axes normalize post-cross
            edge_dirs=m3.quat_rotate(rot, dirs_l * scale),
            edge_dirs_mask=dirs_row[3 * d : 4 * d] > 0.5,
            edge_dir_id=dirs_row[4 * d : 4 * d + e],
        )
    return HullW(**dirs_kw,
        verts=verts,
        verts_mask=vm,
        planes_n=n_w,
        planes_d=d_w,
        faces_mask=faces_mask,
        edge_p1=xform_pt(edge_p1l) if need_edges else edge_p1l,
        edge_p2=xform_pt(edge_p2l) if need_edges else edge_p2l,
        edge_n1=xform_n(edge_n1l) if need_edges else edge_n1l,
        edge_n2=xform_n(edge_n2l) if need_edges else edge_n2l,
        edges_mask=edges_mask,
        face_polys=face_polys,
        face_poly_mask=face_poly_mask,
        center=center,
    )


def _onehot_pick(values, idx):
    """values [K, ...] selected at scalar idx without a gather."""
    k = values.shape[0]
    oh = (jnp.arange(k) == idx).astype(values.dtype)
    return jnp.sum(
        oh.reshape((k,) + (1,) * (values.ndim - 1)) * values, axis=0
    )


def _support_dist(plane_n, plane_d, verts, verts_mask):
    """min over verts of signed distance below each plane.

    plane_n [F,3], plane_d [F]; verts [V,3]. Returns [F] — the inner
    loop of queryFaceDirections, as a broadcast reduction (no matmul:
    a [V,3]x[3,F] dot would hit the MXU with 97% padding)."""
    d = (
        jnp.sum(verts[:, None, :] * plane_n[None, :, :], axis=-1)
        - plane_d[None, :]
    )  # [V, F]
    d = jnp.where(verts_mask[:, None], d, BIG)
    return jnp.min(d, axis=0)


def query_face_directions(a: HullW, b: HullW):
    """(max separation, face idx) of A's faces vs B's verts."""
    seps = _support_dist(a.planes_n, a.planes_d, b.verts, b.verts_mask)
    seps = jnp.where(a.faces_mask, seps, NEG_BIG)
    idx = jnp.argmax(seps)
    return jnp.max(seps), idx


def _v3(arr):
    """[K, 3] -> component tuple ([K], [K], [K]).

    The E*E edge-combination tensors are the narrowphase's biggest data
    ([W, P, E2(, 3)] under the vmap); keeping a trailing 3-vector axis
    makes every cross/dot a pad/slice/transpose at an XLA fusion
    boundary (measured: dozens of 113 MB pad/copy ops per step). Scalar
    component planes keep the whole chain in one elementwise fusion."""
    return arr[..., 0], arr[..., 1], arr[..., 2]


def _v3cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _v3dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _v3sub(a, b):
    return a[0] - b[0], a[1] - b[1], a[2] - b[2]


def query_edge_directions(a: HullW, b: HullW):
    """(max separation, edge normal, A edge endpoints, B edge endpoints)
    over Gauss-map-valid edge pairs (queryEdgeDirections,
    narrowphase.cpp:464-567).

    The Ea x Eb combination space is flattened to one trailing axis and
    computed on scalar component planes (see _v3); combinations are
    built by structured repeat/tile, never gathers; winner extraction is
    one-hot."""
    ea, eb = a.edge_p1.shape[0], b.edge_p1.shape[0]

    def rep_a(v):
        return tuple(jnp.repeat(x, eb, axis=0) for x in v)

    def rep_b(v):
        return tuple(jnp.tile(x, ea) for x in v)

    def neg(v):
        return tuple(-x for x in v)

    ea_p1, ea_p2 = rep_a(_v3(a.edge_p1)), rep_a(_v3(a.edge_p2))
    eb_p1, eb_p2 = rep_b(_v3(b.edge_p1)), rep_b(_v3(b.edge_p2))

    # Gauss-map arc test (isMinkowskiFace, narrowphase.cpp:367-380)
    na1, na2 = rep_a(_v3(a.edge_n1)), rep_a(_v3(a.edge_n2))
    nb1, nb2 = neg(rep_b(_v3(b.edge_n1))), neg(rep_b(_v3(b.edge_n2)))
    bxa = _v3cross(na2, na1)
    dxc = _v3cross(nb2, nb1)
    cba = _v3dot(nb1, bxa)
    dba = _v3dot(nb2, bxa)
    adc = _v3dot(na1, dxc)
    bdc = _v3dot(na2, dxc)
    mink = (cba * dba < 0.0) & (adc * bdc < 0.0) & (cba * bdc > 0.0)

    cr = _v3cross(_v3sub(ea_p2, ea_p1), _v3sub(eb_p2, eb_p1))
    len2 = _v3dot(cr, cr)
    ok = (
        mink & (len2 > 1e-12)
        & jnp.repeat(a.edges_mask, eb) & jnp.tile(b.edges_mask, ea)
    )
    inv_len = jax.lax.rsqrt(jnp.maximum(len2, 1e-30))
    n = tuple(c * inv_len for c in cr)
    # orient away from A's center
    cx, cy, cz = a.center[0], a.center[1], a.center[2]
    to_edge = (ea_p1[0] - cx, ea_p1[1] - cy, ea_p1[2] - cz)
    flip = jnp.where(_v3dot(n, to_edge) < 0.0, -1.0, 1.0)
    n = tuple(c * flip for c in n)
    sep = _v3dot(n, _v3sub(eb_p1, ea_p1))
    sep = jnp.where(ok, sep, NEG_BIG)
    win = jnp.argmax(sep)
    oh = (jnp.arange(sep.shape[0]) == win).astype(sep.dtype)

    def pick3(v):
        return jnp.stack([jnp.sum(oh * c, axis=0) for c in v])

    return (
        jnp.max(sep), pick3(n),
        pick3(ea_p1), pick3(ea_p2), pick3(eb_p1), pick3(eb_p2),
    )


def _incident_face_poly(h: HullW, ref_normal):
    """Polygon of the most anti-parallel face (findIncidentFace,
    narrowphase.cpp:569), selected one-hot."""
    dots = jnp.sum(h.planes_n * ref_normal[None, :], axis=-1)
    dots = jnp.where(h.faces_mask, dots, BIG)
    idx = jnp.argmin(dots)
    poly = _onehot_pick(h.face_polys, idx)          # [FV, 3]
    oh = (jnp.arange(h.face_polys.shape[0]) == idx)
    mask = jnp.sum(
        jnp.where(oh[:, None], h.face_poly_mask, False), axis=0
    ).astype(bool)
    return poly, mask


def _poly_next(poly, mask):
    """next-vertex array of a contiguously-packed masked polygon:
    next[i] = poly[i+1] for i < count-1, next[count-1] = poly[0]."""
    count = jnp.sum(mask.astype(jnp.int32))
    rolled = jnp.roll(poly, -1, axis=0)
    is_last = jnp.arange(poly.shape[0]) == (count - 1)
    return jnp.where(is_last[:, None], poly[0], rolled)


def _reduce_manifold(points, depths, mask, normal):
    """Select <=4 contact points (buildFaceContactManifold heuristics,
    narrowphase.cpp:771-879): first valid; farthest from it; max
    |triangle area|; most negative-area-extending fourth. Every pick is
    a masked argmax + one-hot read; already-picked points are masked
    out, so for <=4 live inputs the picks enumerate them exactly."""
    k = points.shape[0]
    idx = jnp.arange(k)
    n_pts = jnp.sum(mask.astype(jnp.int32))

    avail = mask
    i0 = jnp.argmax(avail)
    p0 = _onehot_pick(points, i0)
    d0 = _onehot_pick(depths, i0)
    avail = avail & (idx != i0)

    dist2 = jnp.where(avail, jnp.sum((points - p0) ** 2, axis=-1), NEG_BIG)
    i1 = jnp.argmax(dist2)
    p1 = _onehot_pick(points, i1)
    d1 = _onehot_pick(depths, i1)
    avail = avail & (idx != i1)

    ba = p1 - p0
    signed = jnp.sum(normal * jnp.cross(ba[None, :], points - p1), axis=-1)
    area = jnp.where(avail, jnp.abs(signed), NEG_BIG)
    i2 = jnp.argmax(area)
    p2 = _onehot_pick(points, i2)
    d2 = _onehot_pick(depths, i2)
    s2 = _onehot_pick(signed, i2)
    avail = avail & (idx != i2)

    # ensure CCW winding for the fourth-point test
    flip = s2 < 0
    q0 = jnp.where(flip, p1, p0)
    q1 = jnp.where(flip, p0, p1)
    e0 = jnp.where(flip, d1, d0)
    e1 = jnp.where(flip, d0, d1)
    ba2 = q1 - q0
    cb = p2 - q1
    ac = q0 - p2
    aq = q0[None, :] - points
    qc = points - p2[None, :]
    abq = jnp.sum(normal * jnp.cross(ba2[None, :], aq), axis=-1)
    bcq = jnp.sum(normal * jnp.cross(cb[None, :], qc), axis=-1)
    caq = jnp.sum(normal * jnp.cross(aq, ac[None, :]), axis=-1)
    qarea = jnp.minimum(abq, jnp.minimum(bcq, caq))
    qarea = jnp.where(avail, qarea, BIG)
    i3 = jnp.argmin(qarea)
    p3 = _onehot_pick(points, i3)
    d3 = _onehot_pick(depths, i3)

    pts4 = jnp.stack([q0, q1, p2, p3])
    dep4 = jnp.stack([e0, e1, d2, d3])
    num = jnp.minimum(n_pts, 4)
    return pts4, dep4, num


def _clipped_poly_candidates(inc_poly, inc_mask, ref_poly, ref_mask, ref_n):
    """Vertex set of the incident polygon clipped by the ref face's side
    planes, computed directly (no iterative clip): incident verts inside
    all side planes + incident-edge x side-plane intersections inside the
    region. Returns (points [FV + FV*FV, 3], valid mask)."""
    fv_i = inc_poly.shape[0]
    fv_r = ref_poly.shape[0]

    # side planes of the ref face (normal points out of the polygon)
    ref_nxt = _poly_next(ref_poly, ref_mask)
    side_n = jnp.cross(ref_nxt - ref_poly, ref_n[None, :])   # [FVr, 3]
    side_d = jnp.sum(side_n * ref_poly, axis=-1)
    side_live = ref_mask

    def inside_all(pts):
        """pts [..., 3] -> inside every live side plane."""
        sd = (
            jnp.sum(pts[..., None, :] * side_n, axis=-1) - side_d
        )  # [..., FVr]
        return jnp.all(jnp.where(side_live, sd <= 1e-6, True), axis=-1)

    # (1) incident verts inside the region
    v_ok = inc_mask & inside_all(inc_poly)

    # (2) incident edge x side plane intersections
    inc_nxt = _poly_next(inc_poly, inc_mask)
    inc_count = jnp.sum(inc_mask.astype(jnp.int32))
    edge_live = inc_mask & (inc_count >= 2)
    # flattened [FVi * FVr]
    p1 = jnp.repeat(inc_poly, fv_r, axis=0)
    p2 = jnp.repeat(inc_nxt, fv_r, axis=0)
    e_live = jnp.repeat(edge_live, fv_r)
    sn = jnp.tile(side_n, (fv_i, 1))
    sd_ = jnp.tile(side_d, fv_i)
    s_live = jnp.tile(side_live, fv_i)
    g1 = jnp.sum(p1 * sn, axis=-1) - sd_
    g2 = jnp.sum(p2 * sn, axis=-1) - sd_
    crosses = (g1 > 0.0) != (g2 > 0.0)
    t = g1 / jnp.where(jnp.abs(g1 - g2) > 1e-12, g1 - g2, 1.0)
    inter = p1 + t[:, None] * (p2 - p1)
    i_ok = e_live & s_live & crosses & inside_all(inter)

    points = jnp.concatenate([inc_poly, inter], axis=0)
    ok = jnp.concatenate([v_ok, i_ok], axis=0)
    return points, ok


def face_contact_manifold(ref_poly, ref_mask, ref_n, ref_d, other: HullW):
    """Clip other's incident face against the ref face's side planes;
    keep points below the ref plane, project onto it. Returns
    (points4 [4,3], depths4 [4], num, normal)."""
    inc_poly, inc_mask = _incident_face_poly(other, ref_n)
    pts, ok = _clipped_poly_candidates(
        inc_poly, inc_mask, ref_poly, ref_mask, ref_n
    )
    d = jnp.sum(pts * ref_n[None, :], axis=-1) - ref_d
    below = ok & (d <= 0.0)
    proj = pts - d[:, None] * ref_n[None, :]
    pts4, dep4, npts = _reduce_manifold(proj, -d, below, ref_n)
    return pts4, dep4, npts, ref_n


def query_edge_directions_dirs(a: HullW, b: HullW):
    """Edge query over unique DIRECTION pairs — the XLA twin of
    ops/narrowphase_pallas._edge_query_dirs_s (same op order for kernel
    parity; see its docstring for the algorithm and the documented
    deep-penetration deviation from the Gauss-map pair sweep)."""
    da = a.edge_dirs                                    # [D, 3]
    db = b.edge_dirs
    d = da.shape[0]
    ax = jnp.cross(da[:, None, :], db[None, :, :])      # [D, D, 3]
    len2 = jnp.sum(ax * ax, axis=-1)
    ok = (
        a.edge_dirs_mask[:, None] & b.edge_dirs_mask[None, :]
        & (len2 > 1e-12)
    )
    inv = jax.lax.rsqrt(jnp.maximum(len2, 1e-30))
    n = ax * inv[..., None]
    c_ab = b.center - a.center
    flip = jnp.where(jnp.sum(n * c_ab, axis=-1) < 0.0, -1.0, 1.0)
    n = n * flip[..., None]
    dots_a = jnp.einsum("ijk,vk->ijv", n, a.verts)
    dots_b = jnp.einsum("ijk,vk->ijv", n, b.verts)
    max_a = jnp.max(jnp.where(a.verts_mask, dots_a, NEG_BIG), axis=-1)
    min_b = jnp.min(jnp.where(b.verts_mask, dots_b, BIG), axis=-1)
    sep = jnp.where(ok, min_b - max_a, NEG_BIG)         # [D, D]

    best = jnp.argmax(sep.reshape(-1))                  # i-major, like
    i_star = best // d                                  # the kernel's
    j_star = best % d                                   # loop order
    sep_e = sep.reshape(-1)[best]
    n_e = _onehot_pick(n.reshape(-1, 3), best)

    def witness(h, dir_star, pick_max):
        mid = 0.5 * (h.edge_p1 + h.edge_p2)             # [E, 3]
        score = jnp.sum(mid * n_e[None, :], axis=-1)
        if not pick_max:
            score = -score
        usable = (
            (jnp.abs(h.edge_dir_id - dir_star) < 0.5) & h.edges_mask
        )
        score = jnp.where(usable, score, NEG_BIG)
        e_star = jnp.argmax(score)
        return (
            _onehot_pick(h.edge_p1, e_star),
            _onehot_pick(h.edge_p2, e_star),
        )

    pa1, pa2 = witness(a, i_star, True)
    pb1, pb2 = witness(b, j_star, False)
    return sep_e, n_e, pa1, pa2, pb1, pb2


def hull_hull_contact(a: HullW, b: HullW):
    """Full SAT + manifold for one hull pair (doSAT + generateContacts).

    Returns dict(valid, ref_is_a, points [4,3], depths [4], num, normal).
    Both the face and edge manifolds are computed unconditionally and
    selected by mask (uniform control flow; a lax.cond would lower to the
    same select under vmap but with worse fusion)."""
    sep_a, face_a = query_face_directions(a, b)
    sep_b, face_b = query_face_directions(b, a)
    if a.edge_dirs is not None:
        sep_e, n_e, pa1, pa2, pb1, pb2 = query_edge_directions_dirs(a, b)
        # face preference under near-ties: the DIRECTION family contains
        # axes numerically equal to face normals (e.g. an axis-aligned
        # box pair yields cross products along the coordinate axes), so
        # sep_e can EXACTLY equal a face separation; a strict > would
        # then misclassify a face/edge-on-face contact as a 1-point
        # edge contact (round-5 fix; the reference applies the same
        # face bias in its SAT, narrowphase.cpp doSAT). The Gauss-map
        # pair tier keeps the strict compare — its axis family is
        # disjoint from face normals, preserving golden parity.
        face_bias = 1e-5
        is_face = (sep_a >= sep_e - face_bias) | (
            sep_b >= sep_e - face_bias
        )
    else:
        sep_e, n_e, pa1, pa2, pb1, pb2 = query_edge_directions(a, b)
        is_face = (sep_a > sep_e) | (sep_b > sep_e)
    separated = (sep_a > 0.0) | (sep_b > 0.0) | (sep_e > 0.0)
    a_is_ref = sep_a >= sep_b

    # ---- face manifold with ref = argmax-separation hull (tree-select)
    sel = lambda x, y: jnp.where(a_is_ref, x, y)
    ref_face = jnp.where(a_is_ref, face_a, face_b)
    ref_polys = jax.tree_util.tree_map(sel, a.face_polys, b.face_polys)
    ref_poly = _onehot_pick(ref_polys, ref_face)
    ref_pmask = jnp.sum(
        jnp.where(
            (jnp.arange(ref_polys.shape[0]) == ref_face)[:, None],
            sel(a.face_poly_mask, b.face_poly_mask), False,
        ), axis=0,
    ).astype(bool)
    ref_n = _onehot_pick(sel(a.planes_n, b.planes_n), ref_face)
    ref_d = _onehot_pick(sel(a.planes_d, b.planes_d), ref_face)
    other = jax.tree_util.tree_map(
        lambda x, y: jnp.where(a_is_ref, y, x), a, b
    )
    f_pts, f_dep, f_num, f_nrm = face_contact_manifold(
        ref_poly, ref_pmask, ref_n, ref_d, other
    )

    # ---- edge manifold: closest point on A's winning edge
    # (createEdgeContact, narrowphase.cpp:1070-1108)
    v1 = pa2 - pa1
    v2 = pb2 - pb1
    v21 = pb1 - pa1
    d22 = jnp.sum(v2 * v2)
    d11 = jnp.sum(v1 * v1)
    d21 = jnp.sum(v2 * v1)
    d211 = jnp.sum(v21 * v1)
    d212 = jnp.sum(v21 * v2)
    denom = d21 * d21 - d22 * d11
    s_gen = (d212 * d21 - d22 * d211) / jnp.where(
        jnp.abs(denom) > 1e-12, denom, 1.0
    )
    s_par = -d211 / jnp.where(jnp.abs(d21) > 1e-12, d21, 1.0)
    degenerate = jnp.abs(denom) < 1e-5
    s = jnp.clip(jnp.where(degenerate, s_par, s_gen), 0.0, 1.0)
    e_contact = pa1 + s * v1

    pts = jnp.where(
        is_face, f_pts,
        jnp.zeros((4, 3), jnp.float32).at[0].set(e_contact),
    )
    dep = jnp.where(
        is_face, f_dep, jnp.zeros((4,), jnp.float32).at[0].set(-sep_e)
    )
    n_pts = jnp.where(is_face, f_num, 1)
    nrm = jnp.where(is_face, f_nrm, n_e)
    ref_is_a = jnp.where(is_face, a_is_ref, jnp.bool_(True))

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
    vd = jnp.sum(h.verts * n[None, :], axis=-1) - d
    vd_masked = jnp.where(h.verts_mask, vd, BIG)
    separation = jnp.min(vd_masked)

    poly, poly_mask = _incident_face_poly(h, n)
    pd = jnp.sum(poly * n[None, :], axis=-1) - d
    below = poly_mask & (pd <= 0.0)
    proj = poly - pd[:, None] * n[None, :]
    pts4, dep4, npts = _reduce_manifold(proj, -pd, below, n)
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
    hull tables (replaces the reference's GJK + deep-SAT fallback,
    narrowphase.cpp:1332-1418; exact for our bounded hull sizes)."""
    # signed distances to all face planes
    fd = jnp.sum(h.planes_n * s_pos[None, :], axis=-1) - h.planes_d
    fd_masked = jnp.where(h.faces_mask, fd, NEG_BIG)
    max_fd = jnp.max(fd_masked)
    inside = max_fd <= 0.0

    # closest surface point: vertices, edge segments, face interiors
    vdist2 = jnp.sum((h.verts - s_pos) ** 2, axis=-1)
    vdist2 = jnp.where(h.verts_mask, vdist2, BIG)
    vi = jnp.argmin(vdist2)
    best_pt = _onehot_pick(h.verts, vi)
    best_d2 = jnp.min(vdist2)

    ev = h.edge_p2 - h.edge_p1
    tt = jnp.sum((s_pos - h.edge_p1) * ev, axis=-1) / jnp.maximum(
        jnp.sum(ev * ev, axis=-1), 1e-12
    )
    tt = jnp.clip(tt, 0.0, 1.0)
    ept = h.edge_p1 + tt[:, None] * ev
    ed2 = jnp.sum((ept - s_pos) ** 2, axis=-1)
    ed2 = jnp.where(h.edges_mask, ed2, BIG)
    ei = jnp.argmin(ed2)
    e_best = _onehot_pick(ept, ei)
    e_d2 = jnp.min(ed2)
    best_pt = jnp.where(e_d2 < best_d2, e_best, best_pt)
    best_d2 = jnp.minimum(e_d2, best_d2)

    # face interior projections: s - fd*n inside all of the face's side
    # planes ([F, FV] flattened test over the precomputed polygons)
    proj = s_pos[None, :] - fd[:, None] * h.planes_n       # [F, 3]
    poly_nxt = jax.vmap(_poly_next)(h.face_polys, h.face_poly_mask)
    side_n = jnp.cross(
        poly_nxt - h.face_polys, h.planes_n[:, None, :]
    )  # [F, FV, 3]
    sd = jnp.sum(side_n * (proj[:, None, :] - h.face_polys), axis=-1)
    f_inside = jnp.all(
        jnp.where(h.face_poly_mask, sd <= 1e-7, True), axis=-1
    )
    f_ok = f_inside & h.faces_mask & (fd > 0.0)
    f_d2 = jnp.where(f_ok, fd * fd, BIG)
    fi = jnp.argmin(f_d2)
    f_best = _onehot_pick(proj, fi)
    f_d2min = jnp.min(f_d2)
    best_pt = jnp.where(f_d2min < best_d2, f_best, best_pt)
    best_d2 = jnp.minimum(f_d2min, best_d2)

    dist = jnp.sqrt(jnp.maximum(best_d2, 1e-30))
    to_sphere = (s_pos - best_pt) / dist
    # deep case: face of least penetration
    deep_face = jnp.argmax(fd_masked)
    deep_n = _onehot_pick(h.planes_n, deep_face)
    n = jnp.where(inside, deep_n, to_sphere)      # ref(hull) -> sphere
    depth = jnp.where(inside, -max_fd + s_r, s_r - dist)
    pt = jnp.where(inside, s_pos - max_fd * deep_n, best_pt)
    pts = jnp.zeros((4, 3)).at[0].set(pt)
    dep = jnp.zeros((4,)).at[0].set(depth)
    valid = depth >= 0.0
    return dict(
        valid=valid, ref_is_a=jnp.bool_(False), points=pts, depths=dep,
        num=jnp.where(valid, 1, 0), normal=n,
    )
