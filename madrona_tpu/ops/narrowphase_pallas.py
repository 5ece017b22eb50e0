"""Pallas TPU kernel: hull-hull SAT narrowphase.

The megakernel-style tier of the narrowphase (SURVEY.md §7): profiling
showed the XLA path spends ~73% of an escape-room step here — not in
FLOPs but in HBM traffic, because the [W, P, E2]-class intermediates
cross fusion boundaries. This kernel computes one candidate slot for a
tile of worlds entirely in VMEM: body/hull fetches are one-hot masked
sums (TPU has no per-lane dynamic indexing), every vector quantity lives
as scalar component planes [X, TILE_W], and the only HBM traffic is the
packed inputs and the 22-float contact record per (world, slot).

Algorithm identical to physics/narrowphase.py hull_hull_contact (same
face/edge SAT, same direct clipped-polygon candidates, same 4-point
reduction); outputs match the JAX path lane-for-lane, which the test
suite checks in interpret mode.

Status: correctness-proven on real TPU (PhysicsConfig.narrowphase=
"pallas") but currently ~1.4x slower than the tuned XLA path — the
(world-tile x pair) grid leaves per-pair scalar ops on 1 of 8 sublanes.
The winning mapping is pairs-in-sublanes ([P_tile, TW] planes for
scalars, [P_tile, X, TW] for tables), which needs an axis-generalized
rewrite of the helpers; until then the XLA path stays the default.

Mosaic lowering notes baked into this file (all measured, not guessed):
no i1 repeat/tile/concatenate/select-on-bool-values and no i1
reductions over sublanes — boolean data routes through f32 at those
points; .at[i].set lowers to an unsupported scatter — use concatenate.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_BIG = -3.0e38
BIG = 3.0e38

# ---------------------------------------------------------------- helpers
# vectors = tuples of [X.., TW] component planes


def _vadd(a, b):
    return tuple(x + y for x, y in zip(a, b))


def _vsub(a, b):
    return tuple(x - y for x, y in zip(a, b))


def _vscale(a, s):
    return tuple(x * s for x in a)


def _vdot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _vcross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _vwhere(m, a, b):
    return tuple(jnp.where(m, x, y) for x, y in zip(a, b))


def _qrot(q, v):
    """quat rotate: q = (w, x, y, z) planes; v = 3 planes."""
    qw, qx, qy, qz = q
    uv = _vcross((qx, qy, qz), v)
    uuv = _vcross((qx, qy, qz), uv)
    return tuple(
        v[i] + 2.0 * (qw * uv[i] + uuv[i]) for i in range(3)
    )


def _pick_rows(win, k):
    """Row selection by per-lane winner index win [TW] over tables
    [K, ..., TW] (one-hot masked sum — no per-lane gathers on TPU)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)
    m2 = iota == win[None, :]

    def pick(tbl):
        m = m2.reshape(
            (k,) + (1,) * (tbl.ndim - 2) + (tbl.shape[-1],)
        ).astype(tbl.dtype)
        return jnp.sum(m * tbl, axis=0)

    return pick


def _argmax_pick(score, *planes):
    """score [K, TW]: per-lane argmax row; returns (max, picked planes)."""
    win = jnp.argmax(score, axis=0)                     # [TW]
    pick = _pick_rows(win, score.shape[0])
    return jnp.max(score, axis=0), tuple(pick(p) for p in planes)


def _argmin_pick(score, *planes):
    mx, picked = _argmax_pick(-score, *planes)
    return -mx, picked


def _hull_unpack(hrow, dims):
    """hrow [K, TW] -> dict of component planes (order = bodies._pack_hull)."""
    v, f, fv, e = dims
    off = 0

    def cut(n, shape):
        nonlocal off
        out = hrow[off:off + n].reshape(shape + (hrow.shape[-1],))
        off += n
        return out

    h = {}
    verts = cut(v * 3, (v, 3))
    h["verts"] = (verts[:, 0], verts[:, 1], verts[:, 2])
    h["verts_mask"] = cut(v, (v,)) > 0.5
    pn = cut(f * 3, (f, 3))
    h["planes_n"] = (pn[:, 0], pn[:, 1], pn[:, 2])
    h["faces_mask"] = cut(f, (f,)) > 0.5
    for name in ("edge_p1", "edge_p2", "edge_n1", "edge_n2"):
        arr = cut(e * 3, (e, 3))
        h[name] = (arr[:, 0], arr[:, 1], arr[:, 2])
    h["edges_mask"] = cut(e, (e,)) > 0.5
    polys = cut(f * fv * 3, (f, fv, 3))
    h["face_polys"] = (polys[..., 0, :], polys[..., 1, :], polys[..., 2, :])
    h["face_poly_mask"] = cut(f * fv, (f, fv)) > 0.5
    return h


def _hull_to_world(h, pos, rot, scale):
    """Transform unpacked hull planes to world (makeHullState)."""
    out = {}
    inv_s = tuple(1.0 / jnp.maximum(s, 1e-12) for s in scale)

    def xf_pts(p):
        scaled = tuple(p[i] * scale[i][None] for i in range(3))
        r = _qrot(tuple(q[None] for q in rot), scaled)
        return tuple(r[i] + pos[i][None] for i in range(3))

    def xf_n(nrm):
        sc = tuple(nrm[i] * inv_s[i][None] for i in range(3))
        r = _qrot(tuple(q[None] for q in rot), sc)
        ln = jnp.sqrt(jnp.maximum(_vdot(r, r), 1e-30))
        return tuple(x / ln for x in r)

    out["verts"] = xf_pts(h["verts"])
    out["verts_mask"] = h["verts_mask"]
    out["planes_n"] = xf_n(h["planes_n"])
    out["faces_mask"] = h["faces_mask"]
    for name in ("edge_p1", "edge_p2"):
        out[name] = xf_pts(h[name])
    for name in ("edge_n1", "edge_n2"):
        out[name] = xf_n(h[name])
    out["edges_mask"] = h["edges_mask"]
    # face polys: [F, FV, TW] per component -> transform with extra dim
    fp = h["face_polys"]
    scaled = tuple(fp[i] * scale[i][None, None] for i in range(3))
    r = _qrot(tuple(q[None, None] for q in rot), scaled)
    out["face_polys"] = tuple(r[i] + pos[i][None, None] for i in range(3))
    out["face_poly_mask"] = h["face_poly_mask"]
    # plane d from first poly vertex
    p0 = tuple(out["face_polys"][i][:, 0] for i in range(3))
    out["planes_d"] = _vdot(out["planes_n"], p0)
    # center
    vm = h["verts_mask"].astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(vm, axis=0), 1.0)
    out["center"] = tuple(
        jnp.sum(jnp.where(h["verts_mask"], out["verts"][i], 0.0), axis=0)
        / denom
        for i in range(3)
    )
    return out


def _support_sep(hull_a, hull_b):
    """[F, TW] min-over-verts signed distance of B verts below A faces,
    masked -> (max separation [TW], per-face seps [F, TW])."""
    na = hull_a["planes_n"]
    vb = hull_b["verts"]
    # [F, V, TW]
    d = (
        na[0][:, None] * vb[0][None]
        + na[1][:, None] * vb[1][None]
        + na[2][:, None] * vb[2][None]
        - hull_a["planes_d"][:, None]
    )
    d = jnp.where(hull_b["verts_mask"][None], d, BIG)
    seps = jnp.min(d, axis=1)
    seps = jnp.where(hull_a["faces_mask"], seps, NEG_BIG)
    return jnp.max(seps, axis=0), seps


def _edge_query(a, b, e):
    """Flattened Gauss-map edge query -> (sep [TW], normal 3x[TW],
    winner endpoints)."""
    rep_a = lambda v: tuple(jnp.repeat(x, e, axis=0) for x in v)
    rep_b = lambda v: tuple(jnp.tile(x, (e, 1)) for x in v)
    neg = lambda v: tuple(-x for x in v)

    ea_p1, ea_p2 = rep_a(a["edge_p1"]), rep_a(a["edge_p2"])
    eb_p1, eb_p2 = rep_b(b["edge_p1"]), rep_b(b["edge_p2"])
    na1, na2 = rep_a(a["edge_n1"]), rep_a(a["edge_n2"])
    nb1, nb2 = neg(rep_b(b["edge_n1"])), neg(rep_b(b["edge_n2"]))

    bxa = _vcross(na2, na1)
    dxc = _vcross(nb2, nb1)
    cba = _vdot(nb1, bxa)
    dba = _vdot(nb2, bxa)
    adc = _vdot(na1, dxc)
    bdc = _vdot(na2, dxc)
    mink = (cba * dba < 0.0) & (adc * bdc < 0.0) & (cba * bdc > 0.0)

    cr = _vcross(_vsub(ea_p2, ea_p1), _vsub(eb_p2, eb_p1))
    len2 = _vdot(cr, cr)
    # repeat/tile on i1 masks hits an unsupported Mosaic truncation;
    # route the masks through f32
    em_a = jnp.repeat(a["edges_mask"].astype(jnp.float32), e, axis=0) > 0.5
    em_b = jnp.tile(b["edges_mask"].astype(jnp.float32), (e, 1)) > 0.5
    ok = mink & (len2 > 1e-12) & em_a & em_b
    inv_len = jax.lax.rsqrt(jnp.maximum(len2, 1e-30))
    n = tuple(c * inv_len for c in cr)
    to_edge = tuple(ea_p1[i] - a["center"][i][None] for i in range(3))
    flip = jnp.where(_vdot(n, to_edge) < 0.0, -1.0, 1.0)
    n = tuple(c * flip for c in n)
    sep = _vdot(n, _vsub(eb_p1, ea_p1))
    sep = jnp.where(ok, sep, NEG_BIG)

    planes = n + ea_p1 + ea_p2 + eb_p1 + eb_p2
    mx, picked = _argmax_pick(sep, *planes)
    return mx, picked[0:3], picked[3:6], picked[6:9], picked[9:12], picked[12:15]


def _poly_next(poly, mask, fv):
    """next-live-vertex planes of a packed polygon ([FV, TW] comps)."""
    count = jnp.sum(mask.astype(jnp.int32), axis=0)
    iota = jax.lax.broadcasted_iota(jnp.int32, (fv, 1), 0)
    is_last = iota == (count[None, :] - 1)
    rolled = tuple(
        jnp.concatenate([p[1:], p[:1]], axis=0) for p in poly
    )
    return tuple(
        jnp.where(is_last, poly[i][0][None], rolled[i]) for i in range(3)
    )


def _reduce4(pts, depths, mask, normal, k):
    """4-point manifold reduction (masked argmax picks). pts: 3x[K, TW];
    returns (pts4 3x[4, TW] stacked as [4,(3+1),TW] layout pieces)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)
    n_pts = jnp.sum(mask.astype(jnp.int32), axis=0)

    def pick(score, avail, *planes):
        score = jnp.where(avail, score, NEG_BIG)
        win = jnp.argmax(score, axis=0)
        m = (iota == win[None, :]).astype(jnp.float32)
        vals = tuple(jnp.sum(m * p, axis=0) for p in planes)
        return win, vals

    avail = mask
    w0, (p0x, p0y, p0z, d0) = pick(
        jnp.where(avail, 1.0, 0.0), avail, *pts, depths
    )
    avail = avail & (iota != w0[None, :])

    dist2 = (
        (pts[0] - p0x[None]) ** 2 + (pts[1] - p0y[None]) ** 2
        + (pts[2] - p0z[None]) ** 2
    )
    w1, (p1x, p1y, p1z, d1) = pick(dist2, avail, *pts, depths)
    avail = avail & (iota != w1[None, :])

    ba = (p1x - p0x, p1y - p0y, p1z - p0z)
    bc = (pts[0] - p1x[None], pts[1] - p1y[None], pts[2] - p1z[None])
    cr = _vcross(tuple(x[None] for x in ba), bc)
    signed = (
        normal[0][None] * cr[0] + normal[1][None] * cr[1]
        + normal[2][None] * cr[2]
    )
    w2, (p2x, p2y, p2z, d2, s2) = pick(
        jnp.abs(signed), avail, *pts, depths, signed
    )
    avail = avail & (iota != w2[None, :])

    flip = s2 < 0
    q0 = _vwhere(flip, (p1x, p1y, p1z), (p0x, p0y, p0z))
    q1 = _vwhere(flip, (p0x, p0y, p0z), (p1x, p1y, p1z))
    e0 = jnp.where(flip, d1, d0)
    e1 = jnp.where(flip, d0, d1)

    ba2 = _vsub(q1, q0)
    cb = _vsub((p2x, p2y, p2z), q1)
    ac = _vsub(q0, (p2x, p2y, p2z))
    aq = tuple(q0[i][None] - pts[i] for i in range(3))
    qc = tuple(pts[i] - (p2x, p2y, p2z)[i][None] for i in range(3))
    abq = _vdot(
        tuple(n[None] for n in normal),
        _vcross(tuple(x[None] for x in ba2), aq),
    )
    bcq = _vdot(
        tuple(n[None] for n in normal),
        _vcross(tuple(x[None] for x in cb), qc),
    )
    caq = _vdot(
        tuple(n[None] for n in normal),
        _vcross(aq, tuple(x[None] for x in ac)),
    )
    qarea = jnp.minimum(abq, jnp.minimum(bcq, caq))
    w3, (p3x, p3y, p3z, d3) = pick(-qarea, avail, *pts, depths)

    pts4 = (
        jnp.stack([q0[0], q1[0], p2x, p3x]),
        jnp.stack([q0[1], q1[1], p2y, p3y]),
        jnp.stack([q0[2], q1[2], p2z, p3z]),
    )
    dep4 = jnp.stack([e0, e1, d2, d3])
    return pts4, dep4, jnp.minimum(n_pts, 4)


def _face_manifold(ref_poly, ref_mask, ref_n, ref_d, other, dims):
    """Clipped-polygon candidates + reduce (face_contact_manifold)."""
    v, f, fv, e = dims
    # incident face of `other`
    dots = _vdot(
        other["planes_n"], tuple(n[None] for n in ref_n)
    )
    dots = jnp.where(other["faces_mask"], dots, BIG)
    _, inc = _argmin_pick(
        dots,
        *[other["face_polys"][i] for i in range(3)],     # [F, FV, TW]
        other["face_poly_mask"].astype(jnp.float32),
    )
    inc_poly = (inc[0], inc[1], inc[2])                  # [FV, TW]
    inc_mask = inc[3] > 0.5

    # ref side planes
    ref_nxt = _poly_next(ref_poly, ref_mask, fv)
    side_n = _vcross(
        _vsub(ref_nxt, ref_poly), tuple(n[None] for n in ref_n)
    )
    side_d = _vdot(side_n, ref_poly)
    side_live = ref_mask

    def inside_all(p):
        # p: 3 comps [K, TW] -> [K, TW] all live side planes satisfied
        sd = (
            side_n[0][None] * p[0][:, None]
            + side_n[1][None] * p[1][:, None]
            + side_n[2][None] * p[2][:, None]
            - side_d[None]
        )  # [K, FVr, TW]
        # i1 reductions over sublanes hit Mosaic truncation limits;
        # reduce in f32 instead
        ok_f = jnp.where(
            side_live[None], (sd <= 1e-6).astype(jnp.float32), 1.0
        )
        return jnp.min(ok_f, axis=1) > 0.5

    v_ok = inc_mask & inside_all(inc_poly)

    inc_nxt = _poly_next(inc_poly, inc_mask, fv)
    inc_count = jnp.sum(inc_mask.astype(jnp.int32), axis=0)
    edge_live = inc_mask & (inc_count[None] >= 2)
    rep_i = lambda x: jnp.repeat(x, fv, axis=0)
    rep_s = lambda x: jnp.tile(x, (fv, 1))
    p1 = tuple(rep_i(inc_poly[i]) for i in range(3))
    p2 = tuple(rep_i(inc_nxt[i]) for i in range(3))
    e_live = rep_i(edge_live.astype(jnp.float32)) > 0.5
    sn = tuple(rep_s(side_n[i]) for i in range(3))
    sd_ = rep_s(side_d)
    s_live = rep_s(side_live.astype(jnp.float32)) > 0.5
    g1 = _vdot(p1, sn) - sd_
    g2 = _vdot(p2, sn) - sd_
    crosses = (g1 > 0.0) != (g2 > 0.0)
    t = g1 / jnp.where(jnp.abs(g1 - g2) > 1e-12, g1 - g2, 1.0)
    inter = tuple(p1[i] + t * (p2[i] - p1[i]) for i in range(3))
    i_ok = e_live & s_live & crosses & inside_all(inter)

    cand = tuple(
        jnp.concatenate([inc_poly[i], inter[i]], axis=0) for i in range(3)
    )
    # concatenate in f32 (i1 concat is unsupported in Mosaic)
    ok = jnp.concatenate(
        [v_ok.astype(jnp.float32), i_ok.astype(jnp.float32)], axis=0
    ) > 0.5

    d = _vdot(cand, tuple(n[None] for n in ref_n)) - ref_d[None]
    below = ok & (d <= 0.0)
    proj = tuple(cand[i] - d * ref_n[i][None] for i in range(3))
    return _reduce4(proj, -d, below, ref_n, fv + fv * fv)


# ------------------------------------------------------------------ kernel


def _hh_kernel(dims, n_bodies, n_obj, nb_ref, obj_ref, pairs_ref,
               pack_ref, out_ref):
    v, f, fv, e = dims
    n = n_bodies
    rows_a = pairs_ref[0, 0, :]
    rows_b = pairs_ref[0, 1, :]
    valid_pair = rows_a < n
    ra = jnp.clip(rows_a, 0, n - 1)
    rb = jnp.clip(rows_b, 0, n - 1)

    pick_a = _pick_rows(ra, n)
    pick_b = _pick_rows(rb, n)
    blk_a = pick_a(nb_ref[:])        # [10, TW]  (nb transposed [N, 10, W])
    blk_b = pick_b(nb_ref[:])
    obj_a = pick_a(obj_ref[:]).astype(jnp.int32)
    obj_b = pick_b(obj_ref[:]).astype(jnp.int32)

    tw = rows_a.shape[0]
    k = pack_ref.shape[1]
    # hull rows: one-hot over O (static loop, O tiny)
    hrow_a = jnp.zeros((k, tw), jnp.float32)
    hrow_b = jnp.zeros((k, tw), jnp.float32)
    for o in range(n_obj):
        row = pack_ref[o, :][:, None]
        hrow_a = hrow_a + jnp.where((obj_a == o)[None, :], row, 0.0)
        hrow_b = hrow_b + jnp.where((obj_b == o)[None, :], row, 0.0)

    def split_blk(blk):
        pos = (blk[0], blk[1], blk[2])
        rot = (blk[3], blk[4], blk[5], blk[6])
        scale = (blk[7], blk[8], blk[9])
        return pos, rot, scale

    pa, qa, sa = split_blk(blk_a)
    pb, qb, sb = split_blk(blk_b)
    ha = _hull_to_world(_hull_unpack(hrow_a, dims), pa, qa, sa)
    hb = _hull_to_world(_hull_unpack(hrow_b, dims), pb, qb, sb)

    sep_a, seps_a = _support_sep(ha, hb)
    sep_b, seps_b = _support_sep(hb, ha)
    sep_e, n_e, pa1, pa2, pb1, pb2 = _edge_query(ha, hb, e)
    separated = (sep_a > 0.0) | (sep_b > 0.0) | (sep_e > 0.0)

    is_face = (sep_a > sep_e) | (sep_b > sep_e)
    a_is_ref = sep_a >= sep_b

    # select ref data (per lane)
    sel = lambda x, y: jnp.where(a_is_ref, x, y)
    seln = lambda x, y: tuple(
        jnp.where(a_is_ref[None], xi, yi) for xi, yi in zip(x, y)
    )
    ref_seps = jnp.where(a_is_ref[None], seps_a, seps_b)
    ref_face = jnp.argmax(ref_seps, axis=0)
    pick_f = _pick_rows(ref_face, f)

    sel_fp = lambda i: jnp.where(
        a_is_ref[None, None], ha["face_polys"][i], hb["face_polys"][i]
    )
    ref_poly = tuple(pick_f(sel_fp(i)) for i in range(3))   # [FV, TW]
    ref_pm = jnp.where(
        a_is_ref[None, None],
        ha["face_poly_mask"].astype(jnp.float32),
        hb["face_poly_mask"].astype(jnp.float32),
    )
    ref_mask = pick_f(ref_pm) > 0.5
    ref_n = tuple(
        pick_f(
            jnp.where(a_is_ref[None], ha["planes_n"][i], hb["planes_n"][i])
        )
        for i in range(3)
    )
    ref_d = pick_f(jnp.where(a_is_ref[None], ha["planes_d"], hb["planes_d"]))

    def sel_other(key):
        # select the non-ref hull's data; i1 selects are unsupported in
        # Mosaic, so boolean leaves route through f32
        val_a, val_b = ha[key], hb[key]
        if isinstance(val_a, tuple):
            cond = (
                a_is_ref[None, None]
                if val_a[0].ndim == 3 else a_is_ref[None]
            )
            return tuple(
                jnp.where(cond, vb, va) for va, vb in zip(val_a, val_b)
            )
        cond = a_is_ref.reshape((1,) * (val_a.ndim - 1) + (-1,))
        if val_a.dtype == jnp.bool_:
            return jnp.where(
                cond, val_b.astype(jnp.float32), val_a.astype(jnp.float32)
            ) > 0.5
        return jnp.where(cond, val_b, val_a)

    other = {
        key: sel_other(key)
        for key in ("planes_n", "faces_mask", "face_polys", "face_poly_mask")
    }

    f_pts, f_dep, f_num = _face_manifold(
        ref_poly, ref_mask, ref_n, ref_d, other, dims
    )

    # edge contact
    v1 = _vsub(pa2, pa1)
    v2 = _vsub(pb2, pb1)
    v21 = _vsub(pb1, pa1)
    d22 = _vdot(v2, v2)
    d11 = _vdot(v1, v1)
    d21 = _vdot(v2, v1)
    d211 = _vdot(v21, v1)
    d212 = _vdot(v21, v2)
    denom = d21 * d21 - d22 * d11
    s_gen = (d212 * d21 - d22 * d211) / jnp.where(
        jnp.abs(denom) > 1e-12, denom, 1.0
    )
    s_par = -d211 / jnp.where(jnp.abs(d21) > 1e-12, d21, 1.0)
    s = jnp.clip(
        jnp.where(jnp.abs(denom) < 1e-5, s_par, s_gen), 0.0, 1.0
    )
    e_contact = tuple(pa1[i] + s * v1[i] for i in range(3))

    # compose the 22-float record: ref, alt, num, normal(3), pts 4x(3+1)
    n_pts = jnp.where(is_face, f_num, 1)
    valid = valid_pair & (~separated) & (n_pts > 0)
    # i1-valued select is unsupported in Mosaic: edge contacts always
    # use A as ref, so ref_is_a = is_face ? a_is_ref : True
    ref_is_a = (~is_face) | a_is_ref
    out_ref_row = jnp.where(ref_is_a, rows_a, rows_b).astype(jnp.float32)
    out_alt_row = jnp.where(ref_is_a, rows_b, rows_a).astype(jnp.float32)
    out_ref_row = jnp.where(valid, out_ref_row, float(n))
    out_alt_row = jnp.where(valid, out_alt_row, float(n))
    nrm_out = _vwhere(is_face[None], tuple(x[None] for x in ref_n),
                      tuple(x[None] for x in n_e))

    zero3 = jnp.zeros_like(f_dep[:3])
    e_px = jnp.concatenate([e_contact[0][None], zero3], axis=0)
    e_py = jnp.concatenate([e_contact[1][None], zero3], axis=0)
    e_pz = jnp.concatenate([e_contact[2][None], zero3], axis=0)
    e_d = jnp.concatenate([(-sep_e)[None], zero3], axis=0)
    px = jnp.where(is_face[None], f_pts[0], e_px)
    py = jnp.where(is_face[None], f_pts[1], e_py)
    pz = jnp.where(is_face[None], f_pts[2], e_pz)
    pd = jnp.where(is_face[None], f_dep, e_d)

    rec = jnp.concatenate(
        [
            out_ref_row[None], out_alt_row[None],
            jnp.where(valid, n_pts, 0).astype(jnp.float32)[None],
            nrm_out[0], nrm_out[1], nrm_out[2],
            px, py, pz, pd,
        ],
        axis=0,
    )  # [3 + 3 + 16, TW] = [22, TW]
    out_ref[0] = rec


def make_hh_narrowphase(dims, n_bodies, n_obj, tile_w: int = 256,
                        interpret: bool = False):
    """Build the jitted hull-hull narrowphase.

    Returns fn(nb_t [N,10,W], obj_t [N,W] f32, pairs_t [P,2,W] i32,
    hull_pack [O,K]) -> record [P, 22, W] f32."""
    kern = functools.partial(_hh_kernel, dims, n_bodies, n_obj)

    def run(nb_t, obj_t, pairs_t, hull_pack):
        n, _, w = nb_t.shape
        p = pairs_t.shape[0]
        tw = min(tile_w, w)
        grid = (pl.cdiv(w, tw), p)
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (n, 10, tw), lambda wi, pi: (0, 0, wi),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (n, tw), lambda wi, pi: (0, wi),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 2, tw), lambda wi, pi: (pi, 0, wi),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 22, tw), lambda wi, pi: (pi, 0, wi),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((p, 22, w), jnp.float32),
            interpret=interpret,
        )(nb_t, obj_t, pairs_t, hull_pack)

    return run


# ---------------------------------------------------------------------------
# Pairs-in-sublanes variant (EXPERIMENTAL): the (world-tile x pair) grid
# above leaves per-pair scalars on 1 of 8 sublanes; here a pair-tile
# rides the sublane axis — every array is [PT, X.., TW] with reductions
# over the X axis, so scalar math runs as dense [PT, TW] tiles. Same
# record layout/algorithm; takes the component-PLANAR hull pack
# (om.hull_pack_planar).
#
# Status: compiles and matches the grid kernel (up to argmax tie order
# on parallel box edges — physically equivalent contacts) at small
# configs (W=256, P=12, PT=12). Additional Mosaic findings encoded here:
# interior dims of >=3-D tiles cannot be sliced (hence the planar pack
# and the split rows_a/rows_b inputs), and the full E^2 working set
# exceeds scoped VMEM (hence the chunked edge query + PT=8 tiling, which
# needs P padded to a multiple of 8). Remaining blocker this round:
# multi-minute Mosaic compiles at larger grids through the remote
# compile tunnel made timing/tuning impractical; the grid kernel and the
# XLA path remain the supported tiers.
# ---------------------------------------------------------------------------


def _pick_ax1(win, k):
    """win [PT, TW] -> pick rows of tables [PT, K, .., TW] (one-hot)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, k, 1), 1)
    m2 = iota == win[:, None, :]

    def pick(tbl):
        m = m2.reshape(
            (tbl.shape[0], k) + (1,) * (tbl.ndim - 3) + (tbl.shape[-1],)
        ).astype(tbl.dtype)
        return jnp.sum(m * tbl, axis=1)

    return pick


def _argmax_ax1(score, *planes):
    """score [PT, K, TW] -> (max [PT, TW], picked planes)."""
    win = jnp.argmax(score, axis=1)
    pick = _pick_ax1(win, score.shape[1])
    return jnp.max(score, axis=1), tuple(pick(p) for p in planes)


def _argmin_ax1(score, *planes):
    mx, picked = _argmax_ax1(-score, *planes)
    return -mx, picked


def _unpack_hull_s(hrow, dims, n_dirs=0):
    """hrow [PT, K, TW] (component-PLANAR layout, bodies._pack_hull_planar)
    -> component planes with a leading pair axis. Only contiguous 2-D
    slices (Mosaic cannot slice interior dims of >=3-D tiles)."""
    v, f, fv, e = dims
    off = 0

    def cut(n):
        nonlocal off
        out = hrow[:, off:off + n]
        off += n
        return out

    def cut3(n, shape=None):
        x, y, z = cut(n), cut(n), cut(n)
        if shape is not None:
            pt, _, tw = hrow.shape
            x = x.reshape((pt,) + shape + (tw,))
            y = y.reshape((pt,) + shape + (tw,))
            z = z.reshape((pt,) + shape + (tw,))
        return (x, y, z)

    h = {}
    h["verts"] = cut3(v)
    h["verts_mask"] = cut(v) > 0.5
    h["planes_n"] = cut3(f)
    h["faces_mask"] = cut(f) > 0.5
    for name in ("edge_p1", "edge_p2", "edge_n1", "edge_n2"):
        h[name] = cut3(e)
    h["edges_mask"] = cut(e) > 0.5
    h["face_polys"] = cut3(f * fv, (f, fv))   # each [PT, F, FV, TW]
    h["face_poly_mask"] = hrow[:, off:off + f * fv].reshape(
        (hrow.shape[0], f, fv, hrow.shape[-1])
    ) > 0.5
    off += f * fv
    if n_dirs:
        # appended dir block (bodies._pack_hull_planar dir_tabs tail):
        # unique edge directions + mask + per-edge dir id
        h["edge_dirs"] = cut3(n_dirs)
        h["edge_dirs_mask"] = cut(n_dirs) > 0.5
        h["edge_dir_id"] = cut(e)
    return h


def _world_s(h, pos, rot, scale):
    """Transform to world; pos/rot/scale are tuples of [PT, TW] planes;
    tables are [PT, X(, Y), TW]."""
    out = {}
    inv_s = tuple(1.0 / jnp.maximum(s, 1e-12) for s in scale)

    def bshape(tbl):
        # broadcast a [PT, TW] scalar over table mid axes
        return (tbl.shape[0],) + (1,) * (tbl.ndim - 2) + (tbl.shape[-1],)

    def xf_pts(p):
        scaled = tuple(
            p[i] * scale[i].reshape(bshape(p[i])) for i in range(3)
        )
        r = _qrot(tuple(q.reshape(bshape(p[0])) for q in rot), scaled)
        return tuple(
            r[i] + pos[i].reshape(bshape(p[i])) for i in range(3)
        )

    def xf_n(nrm):
        sc = tuple(
            nrm[i] * inv_s[i].reshape(bshape(nrm[i])) for i in range(3)
        )
        r = _qrot(tuple(q.reshape(bshape(nrm[0])) for q in rot), sc)
        ln = jnp.sqrt(jnp.maximum(_vdot(r, r), 1e-30))
        return tuple(x / ln for x in r)

    out["verts"] = xf_pts(h["verts"])
    out["verts_mask"] = h["verts_mask"]
    out["planes_n"] = xf_n(h["planes_n"])
    out["faces_mask"] = h["faces_mask"]
    for name in ("edge_p1", "edge_p2"):
        out[name] = xf_pts(h[name])
    for name in ("edge_n1", "edge_n2"):
        out[name] = xf_n(h[name])
    out["edges_mask"] = h["edges_mask"]
    out["face_polys"] = xf_pts(h["face_polys"])
    out["face_poly_mask"] = h["face_poly_mask"]
    p0 = tuple(out["face_polys"][i][:, :, 0] for i in range(3))
    out["planes_d"] = _vdot(out["planes_n"], p0)
    vm = h["verts_mask"].astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(vm, axis=1), 1.0)
    out["center"] = tuple(
        jnp.sum(jnp.where(h["verts_mask"], out["verts"][i], 0.0), axis=1)
        / denom
        for i in range(3)
    )
    if "edge_dirs" in h:
        # direction of a scaled edge: S*d then rotate (NOT the normal
        # transform); left unnormalized — the SAT axis is normalized
        # after the cross product anyway
        d = h["edge_dirs"]
        sc = tuple(
            d[i] * scale[i].reshape(bshape(d[i])) for i in range(3)
        )
        out["edge_dirs"] = _qrot(
            tuple(q.reshape(bshape(d[0])) for q in rot), sc
        )
        out["edge_dirs_mask"] = h["edge_dirs_mask"]
        out["edge_dir_id"] = h["edge_dir_id"]
    return out


def _support_sep_s(a, b):
    na = a["planes_n"]
    vb = b["verts"]
    d = (
        na[0][:, :, None] * vb[0][:, None]
        + na[1][:, :, None] * vb[1][:, None]
        + na[2][:, :, None] * vb[2][:, None]
        - a["planes_d"][:, :, None]
    )  # [PT, F, V, TW]
    d = jnp.where(b["verts_mask"][:, None], d, BIG)
    seps = jnp.min(d, axis=2)
    seps = jnp.where(a["faces_mask"], seps, NEG_BIG)
    return jnp.max(seps, axis=1), seps


def _edge_query_s(a, b, e, chunk: int = 3):
    """Edge query with the A-edge axis processed in chunks (a full
    [PT, E*E, TW] working set of ~35 live planes exceeds VMEM; chunking
    keeps ~chunk*E combos live while a running arg-best merges chunks)."""
    neg = lambda v: tuple(-x for x in v)
    pt, _, tw = a["edge_p1"][0].shape

    best_sep = jnp.full((pt, tw), NEG_BIG)
    best_planes = tuple(jnp.zeros((pt, tw)) for _ in range(15))

    for c0 in range(0, e, chunk):
        # last chunk may be short (e % chunk != 0): size BOTH sides by
        # the actual width or the broadcast shapes diverge (A repeats
        # cw*e combos, B must tile by cw, not chunk)
        cw = min(chunk, e - c0)
        ca = lambda v: tuple(
            jnp.repeat(x[:, c0:c0 + cw], e, axis=1) for x in v
        )
        cb = lambda v: tuple(jnp.tile(x, (1, cw, 1)) for x in v)
        ea_p1, ea_p2 = ca(a["edge_p1"]), ca(a["edge_p2"])
        eb_p1, eb_p2 = cb(b["edge_p1"]), cb(b["edge_p2"])
        na1, na2 = ca(a["edge_n1"]), ca(a["edge_n2"])
        nb1, nb2 = neg(cb(b["edge_n1"])), neg(cb(b["edge_n2"]))

        bxa = _vcross(na2, na1)
        dxc = _vcross(nb2, nb1)
        cba = _vdot(nb1, bxa)
        dba = _vdot(nb2, bxa)
        adc = _vdot(na1, dxc)
        bdc = _vdot(na2, dxc)
        mink = (cba * dba < 0.0) & (adc * bdc < 0.0) & (cba * bdc > 0.0)

        cr = _vcross(_vsub(ea_p2, ea_p1), _vsub(eb_p2, eb_p1))
        len2 = _vdot(cr, cr)
        em_a = jnp.repeat(
            a["edges_mask"].astype(jnp.float32)[:, c0:c0 + cw],
            e, axis=1,
        ) > 0.5
        em_b = jnp.tile(
            b["edges_mask"].astype(jnp.float32), (1, cw, 1)
        ) > 0.5
        ok = mink & (len2 > 1e-12) & em_a & em_b
        inv_len = jax.lax.rsqrt(jnp.maximum(len2, 1e-30))
        n = tuple(c * inv_len for c in cr)
        to_edge = tuple(
            ea_p1[i] - a["center"][i][:, None, :] for i in range(3)
        )
        flip = jnp.where(_vdot(n, to_edge) < 0.0, -1.0, 1.0)
        n = tuple(c * flip for c in n)
        sep = _vdot(n, _vsub(eb_p1, ea_p1))
        sep = jnp.where(ok, sep, NEG_BIG)
        planes = n + ea_p1 + ea_p2 + eb_p1 + eb_p2
        mx, picked = _argmax_ax1(sep, *planes)
        better = mx > best_sep
        best_planes = tuple(
            jnp.where(better, new_p, old_p)
            for new_p, old_p in zip(picked, best_planes)
        )
        best_sep = jnp.where(better, mx, best_sep)

    p = best_planes
    return (best_sep, p[0:3], p[3:6], p[6:9], p[9:12], p[12:15])


def _edge_query_dirs_s(a, b, e, n_dirs):
    """Edge query over unique DIRECTION pairs (PhysicsConfig.sat_tier=
    "edge_dirs"): the edge-edge SAT axis family is {cross(da, db)} over
    edge directions, so D_a*D_b axes (box-box: 9) replace the E_a*E_b
    Gauss-map pair sweep (144) — the reference iterates edge pairs with
    a per-pair Minkowski-face test (src/physics/narrowphase.cpp doSAT),
    which a masked TPU sweep pays for in full. Separation per axis is
    support-based (min_B - max_A along the unit axis, exact SAT);
    witness edges are the supporting edges of the winning direction
    class. For separated pairs this equals the Gauss-map result; for
    deep penetration the winning axis may differ from the reference's
    (documented deviation; behavior suites validate).

    Returns the same tuple as _edge_query_s: (sep, n, pa1, pa2, pb1,
    pb2)."""
    pt, _, tw = a["edge_p1"][0].shape

    best_sep = jnp.full((pt, tw), NEG_BIG)
    best = tuple(jnp.zeros((pt, tw)) for _ in range(5))  # n(3), i, j

    c_ab = _vsub(b["center"], a["center"])               # [PT, TW]
    va = a["verts"]                                      # [PT, V, TW]
    vb = b["verts"]
    va_mask = a["verts_mask"]
    vb_mask = b["verts_mask"]

    for i in range(n_dirs):
        da = tuple(x[:, i] for x in a["edge_dirs"])      # [PT, TW]
        ma = a["edge_dirs_mask"][:, i]
        for j in range(n_dirs):
            db = tuple(x[:, j] for x in b["edge_dirs"])
            mb = b["edge_dirs_mask"][:, j]
            ax = _vcross(da, db)
            len2 = _vdot(ax, ax)
            ok = ma & mb & (len2 > 1e-12)
            inv = jax.lax.rsqrt(jnp.maximum(len2, 1e-30))
            n = tuple(c * inv for c in ax)
            # orient outward from A (toward B's center)
            flip = jnp.where(_vdot(n, c_ab) < 0.0, -1.0, 1.0)
            n = tuple(c * flip for c in n)
            nb3 = tuple(x[:, None, :] for x in n)        # [PT, 1, TW]
            dots_a = _vdot(nb3, va)                      # [PT, V, TW]
            dots_b = _vdot(nb3, vb)
            max_a = jnp.max(jnp.where(va_mask, dots_a, NEG_BIG), axis=1)
            min_b = jnp.min(jnp.where(vb_mask, dots_b, BIG), axis=1)
            sep = jnp.where(ok, min_b - max_a, NEG_BIG)
            better = sep > best_sep
            cand = n + (jnp.float32(i) * jnp.ones_like(sep),
                        jnp.float32(j) * jnp.ones_like(sep))
            best = tuple(
                jnp.where(better, c, o) for c, o in zip(cand, best)
            )
            best_sep = jnp.where(better, sep, best_sep)

    n = best[0:3]
    i_star = best[3]
    j_star = best[4]

    def witness(h, dir_star, axis, pick_max):
        """Supporting edge of the winning direction class along the
        (oriented) axis: among edges with dir id == dir_star, the one
        whose midpoint is extremal."""
        mid = tuple(
            0.5 * (h["edge_p1"][k] + h["edge_p2"][k]) for k in range(3)
        )
        axb = tuple(x[:, None, :] for x in axis)
        score = _vdot(axb, mid)                          # [PT, E, TW]
        if not pick_max:
            score = -score
        in_class = (
            jnp.abs(h["edge_dir_id"] - dir_star[:, None, :]) < 0.5
        )
        usable = in_class & h["edges_mask"]
        score = jnp.where(usable, score, NEG_BIG)
        _, picked = _argmax_ax1(
            score, *(h["edge_p1"] + h["edge_p2"])
        )
        return picked[0:3], picked[3:6]

    pa1, pa2 = witness(a, i_star, n, True)
    pb1, pb2 = witness(b, j_star, n, False)
    return best_sep, n, pa1, pa2, pb1, pb2


def _poly_next_s(poly, mask, fv):
    count = jnp.sum(mask.astype(jnp.int32), axis=1)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, fv, 1), 1)
    is_last = iota == (count[:, None, :] - 1)
    rolled = tuple(
        jnp.concatenate([p[:, 1:], p[:, :1]], axis=1) for p in poly
    )
    return tuple(
        jnp.where(is_last, poly[i][:, :1], rolled[i]) for i in range(3)
    )


def _reduce4_s(pts, depths, mask, normal, k):
    """4-point reduction, [PT, K, TW] inputs, axis-1 picks."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, k, 1), 1)
    n_pts = jnp.sum(mask.astype(jnp.int32), axis=1)

    def pick(score, avail, *planes):
        score = jnp.where(avail, score, NEG_BIG)
        win = jnp.argmax(score, axis=1)
        p = _pick_ax1(win, k)
        return win, tuple(p(pl) for pl in planes)

    nrm_b = tuple(x[:, None, :] for x in normal)
    avail = mask
    w0, (p0x, p0y, p0z, d0) = pick(
        jnp.where(avail, 1.0, 0.0), avail, *pts, depths
    )
    avail = avail & (iota != w0[:, None, :])

    dist2 = (
        (pts[0] - p0x[:, None]) ** 2 + (pts[1] - p0y[:, None]) ** 2
        + (pts[2] - p0z[:, None]) ** 2
    )
    w1, (p1x, p1y, p1z, d1) = pick(dist2, avail, *pts, depths)
    avail = avail & (iota != w1[:, None, :])

    ba = (p1x - p0x, p1y - p0y, p1z - p0z)
    bc = tuple(pts[i] - (p1x, p1y, p1z)[i][:, None] for i in range(3))
    cr = _vcross(tuple(x[:, None] for x in ba), bc)
    signed = _vdot(nrm_b, cr)
    w2, (p2x, p2y, p2z, d2, s2) = pick(
        jnp.abs(signed), avail, *pts, depths, signed
    )
    avail = avail & (iota != w2[:, None, :])

    flip = s2 < 0
    q0 = _vwhere(flip, (p1x, p1y, p1z), (p0x, p0y, p0z))
    q1 = _vwhere(flip, (p0x, p0y, p0z), (p1x, p1y, p1z))
    e0 = jnp.where(flip, d1, d0)
    e1 = jnp.where(flip, d0, d1)

    ba2 = _vsub(q1, q0)
    cb = _vsub((p2x, p2y, p2z), q1)
    ac = _vsub(q0, (p2x, p2y, p2z))
    aq = tuple(q0[i][:, None] - pts[i] for i in range(3))
    qc = tuple(pts[i] - (p2x, p2y, p2z)[i][:, None] for i in range(3))
    abq = _vdot(nrm_b, _vcross(tuple(x[:, None] for x in ba2), aq))
    bcq = _vdot(nrm_b, _vcross(tuple(x[:, None] for x in cb), qc))
    caq = _vdot(nrm_b, _vcross(aq, tuple(x[:, None] for x in ac)))
    qarea = jnp.minimum(abq, jnp.minimum(bcq, caq))
    w3, (p3x, p3y, p3z, d3) = pick(-qarea, avail, *pts, depths)

    pts4 = (
        jnp.stack([q0[0], q1[0], p2x, p3x], axis=1),
        jnp.stack([q0[1], q1[1], p2y, p3y], axis=1),
        jnp.stack([q0[2], q1[2], p2z, p3z], axis=1),
    )
    dep4 = jnp.stack([e0, e1, d2, d3], axis=1)
    return pts4, dep4, jnp.minimum(n_pts, 4)


def _face_manifold_s(ref_poly, ref_mask, ref_n, ref_d, other, dims):
    v, f, fv, e = dims
    dots = _vdot(other["planes_n"], tuple(x[:, None] for x in ref_n))
    dots = jnp.where(other["faces_mask"], dots, BIG)
    _, inc = _argmin_ax1(
        dots, *[other["face_polys"][i] for i in range(3)],
        other["face_poly_mask"].astype(jnp.float32),
    )
    inc_poly = (inc[0], inc[1], inc[2])            # [PT, FV, TW]
    inc_mask = inc[3] > 0.5

    ref_nxt = _poly_next_s(ref_poly, ref_mask, fv)
    side_n = _vcross(
        _vsub(ref_nxt, ref_poly), tuple(x[:, None] for x in ref_n)
    )
    side_d = _vdot(side_n, ref_poly)
    side_live = ref_mask

    def inside_all(p):
        sd = (
            side_n[0][:, None] * p[0][:, :, None]
            + side_n[1][:, None] * p[1][:, :, None]
            + side_n[2][:, None] * p[2][:, :, None]
            - side_d[:, None]
        )  # [PT, K, FVr, TW]
        ok_f = jnp.where(
            side_live[:, None], (sd <= 1e-6).astype(jnp.float32), 1.0
        )
        return jnp.min(ok_f, axis=2) > 0.5

    v_ok = inc_mask & inside_all(inc_poly)

    inc_nxt = _poly_next_s(inc_poly, inc_mask, fv)
    inc_count = jnp.sum(inc_mask.astype(jnp.int32), axis=1)
    edge_live = inc_mask & (inc_count[:, None, :] >= 2)
    rep_i = lambda x: jnp.repeat(x, fv, axis=1)
    rep_s = lambda x: jnp.tile(x, (1, fv, 1))
    p1 = tuple(rep_i(inc_poly[i]) for i in range(3))
    p2 = tuple(rep_i(inc_nxt[i]) for i in range(3))
    e_live = rep_i(edge_live.astype(jnp.float32)) > 0.5
    sn = tuple(rep_s(side_n[i]) for i in range(3))
    sd_ = rep_s(side_d)
    s_live = rep_s(side_live.astype(jnp.float32)) > 0.5
    g1 = _vdot(p1, sn) - sd_
    g2 = _vdot(p2, sn) - sd_
    crosses = (g1 > 0.0) != (g2 > 0.0)
    t = g1 / jnp.where(jnp.abs(g1 - g2) > 1e-12, g1 - g2, 1.0)
    inter = tuple(p1[i] + t * (p2[i] - p1[i]) for i in range(3))
    i_ok = e_live & s_live & crosses & inside_all(inter)

    cand = tuple(
        jnp.concatenate([inc_poly[i], inter[i]], axis=1) for i in range(3)
    )
    ok = jnp.concatenate(
        [v_ok.astype(jnp.float32), i_ok.astype(jnp.float32)], axis=1
    ) > 0.5
    d = _vdot(cand, tuple(x[:, None] for x in ref_n)) - ref_d[:, None]
    below = ok & (d <= 0.0)
    proj = tuple(cand[i] - d * ref_n[i][:, None] for i in range(3))
    return _reduce4_s(proj, -d, below, ref_n, fv + fv * fv)


def hh_sat_planes(dims, n_bodies, n_obj, rows_a, rows_b, nb, obj, pack,
                  n_dirs=0):
    """The SAT body of the sublane kernel as a pure planes->planes
    function, reusable from other kernels (the fused physics-step
    megakernel calls it per pair chunk — ops/physics_megakernel.py).

    rows_a/rows_b [PT, TW] i32; nb [N, 10, TW] (pos|rot|scale);
    obj [N, TW] f32 object ids; pack [O, K] planar hull pack.
    Returns dict: ref/alt [PT, TW] f32 (sentinel n when invalid),
    num [PT, TW] f32, nrm 3x[PT, TW], px/py/pz/pd each [PT, 4, TW].
    """
    v, f, fv, e = dims
    n = n_bodies
    valid_pair = rows_a < n
    ra = jnp.clip(rows_a, 0, n - 1)
    rb = jnp.clip(rows_b, 0, n - 1)

    iota_n = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)

    def fetch(rows):
        m = (iota_n == rows[None]).astype(jnp.float32)  # [N, PT, TW]
        blk = jnp.sum(
            m[:, :, None, :] * nb[:, None, :, :], axis=0
        )  # [PT, 10, TW]
        ob = jnp.sum(m * obj[:, None, :], axis=0)       # [PT, TW]
        return blk, ob.astype(jnp.int32)

    blk_a, obj_a = fetch(ra)
    blk_b, obj_b = fetch(rb)

    pt, _, tw = blk_a.shape
    k = pack.shape[1]
    hrow_a = jnp.zeros((pt, k, tw), jnp.float32)
    hrow_b = jnp.zeros((pt, k, tw), jnp.float32)
    for o in range(n_obj):
        row = pack[o, :][None, :, None]
        hrow_a = hrow_a + jnp.where((obj_a == o)[:, None, :], row, 0.0)
        hrow_b = hrow_b + jnp.where((obj_b == o)[:, None, :], row, 0.0)

    def split_blk(blk):
        pos = (blk[:, 0], blk[:, 1], blk[:, 2])
        rot = (blk[:, 3], blk[:, 4], blk[:, 5], blk[:, 6])
        scale = (blk[:, 7], blk[:, 8], blk[:, 9])
        return pos, rot, scale

    pa, qa, sa = split_blk(blk_a)
    pb, qb, sb = split_blk(blk_b)
    ha = _world_s(_unpack_hull_s(hrow_a, dims, n_dirs), pa, qa, sa)
    hb = _world_s(_unpack_hull_s(hrow_b, dims, n_dirs), pb, qb, sb)

    sep_a, seps_a = _support_sep_s(ha, hb)
    sep_b, seps_b = _support_sep_s(hb, ha)
    import os as _os
    if _os.environ.get("MADRONA_TPU_SKIP_EDGE_QUERY"):
        # DEBUG/profiling only: face-only SAT (wrong physics for
        # edge-edge contacts; used to attribute kernel time). Loud by
        # design — a stale env var silently corrupts physics, and a
        # cached jit trace won't notice the var changing afterwards.
        import warnings as _warnings
        _warnings.warn(
            "MADRONA_TPU_SKIP_EDGE_QUERY is set: edge-edge SAT is "
            "DISABLED in this trace (face-only SAT, wrong physics). "
            "Profiling only — unset it for any real run; already-"
            "compiled traces keep this behavior until re-traced.",
            stacklevel=2,
        )
        z = jnp.zeros_like(sep_a)
        zv = (z, z, z)
        sep_e, n_e, pa1, pa2, pb1, pb2 = (
            jnp.full_like(sep_a, NEG_BIG), zv, zv, zv, zv, zv
        )
    elif n_dirs:
        sep_e, n_e, pa1, pa2, pb1, pb2 = _edge_query_dirs_s(
            ha, hb, e, n_dirs
        )
    else:
        sep_e, n_e, pa1, pa2, pb1, pb2 = _edge_query_s(ha, hb, e)
    separated = (sep_a > 0.0) | (sep_b > 0.0) | (sep_e > 0.0)
    if n_dirs:
        # dirs-tier face preference under near-ties — see
        # physics/narrowphase.py hull_hull_contact (round-5 fix)
        is_face = (sep_a >= sep_e - 1e-5) | (sep_b >= sep_e - 1e-5)
    else:
        is_face = (sep_a > sep_e) | (sep_b > sep_e)
    a_is_ref = sep_a >= sep_b

    ref_seps = jnp.where(a_is_ref[:, None, :], seps_a, seps_b)
    ref_face = jnp.argmax(ref_seps, axis=1)
    pick_f = _pick_ax1(ref_face, f)

    c2 = a_is_ref[:, None, :]
    c3 = a_is_ref[:, None, None, :]
    ref_poly = tuple(
        pick_f(jnp.where(c3, ha["face_polys"][i], hb["face_polys"][i]))
        for i in range(3)
    )
    ref_mask = pick_f(
        jnp.where(
            c3, ha["face_poly_mask"].astype(jnp.float32),
            hb["face_poly_mask"].astype(jnp.float32),
        )
    ) > 0.5
    ref_n = tuple(
        pick_f(jnp.where(c2, ha["planes_n"][i], hb["planes_n"][i]))
        for i in range(3)
    )
    ref_d = pick_f(jnp.where(c2, ha["planes_d"], hb["planes_d"]))

    def sel_other(key):
        val_a, val_b = ha[key], hb[key]
        if isinstance(val_a, tuple):
            cond = c3 if val_a[0].ndim == 4 else c2
            return tuple(
                jnp.where(cond, vb, va) for va, vb in zip(val_a, val_b)
            )
        cond = c3 if val_a.ndim == 4 else c2
        if val_a.dtype == jnp.bool_:
            return jnp.where(
                cond, val_b.astype(jnp.float32), val_a.astype(jnp.float32)
            ) > 0.5
        return jnp.where(cond, val_b, val_a)

    other = {
        key: sel_other(key)
        for key in ("planes_n", "faces_mask", "face_polys", "face_poly_mask")
    }
    f_pts, f_dep, f_num = _face_manifold_s(
        ref_poly, ref_mask, ref_n, ref_d, other, dims
    )

    v1 = _vsub(pa2, pa1)
    v2 = _vsub(pb2, pb1)
    v21 = _vsub(pb1, pa1)
    d22 = _vdot(v2, v2)
    d11 = _vdot(v1, v1)
    d21 = _vdot(v2, v1)
    d211 = _vdot(v21, v1)
    d212 = _vdot(v21, v2)
    denom = d21 * d21 - d22 * d11
    s_gen = (d212 * d21 - d22 * d211) / jnp.where(
        jnp.abs(denom) > 1e-12, denom, 1.0
    )
    s_par = -d211 / jnp.where(jnp.abs(d21) > 1e-12, d21, 1.0)
    s = jnp.clip(jnp.where(jnp.abs(denom) < 1e-5, s_par, s_gen), 0.0, 1.0)
    e_contact = tuple(pa1[i] + s * v1[i] for i in range(3))

    n_pts = jnp.where(is_face, f_num, 1)
    valid = valid_pair & (~separated) & (n_pts > 0)
    ref_is_a = (~is_face) | a_is_ref
    out_ref_row = jnp.where(ref_is_a, rows_a, rows_b).astype(jnp.float32)
    out_alt_row = jnp.where(ref_is_a, rows_b, rows_a).astype(jnp.float32)
    out_ref_row = jnp.where(valid, out_ref_row, float(n))
    out_alt_row = jnp.where(valid, out_alt_row, float(n))
    nrm_out = _vwhere(is_face[:, None, :],
                      tuple(x[:, None, :] for x in ref_n),
                      tuple(x[:, None, :] for x in n_e))

    zero3 = jnp.zeros_like(f_dep[:, :3])
    e_px = jnp.concatenate([e_contact[0][:, None], zero3], axis=1)
    e_py = jnp.concatenate([e_contact[1][:, None], zero3], axis=1)
    e_pz = jnp.concatenate([e_contact[2][:, None], zero3], axis=1)
    e_d = jnp.concatenate([(-sep_e)[:, None], zero3], axis=1)
    isf = is_face[:, None, :]
    px = jnp.where(isf, f_pts[0], e_px)
    py = jnp.where(isf, f_pts[1], e_py)
    pz = jnp.where(isf, f_pts[2], e_pz)
    pd = jnp.where(isf, f_dep, e_d)

    return dict(
        ref=out_ref_row, alt=out_alt_row,
        num=jnp.where(valid, n_pts, 0).astype(jnp.float32),
        nrm=(nrm_out[0][:, 0], nrm_out[1][:, 0], nrm_out[2][:, 0]),
        px=px, py=py, pz=pz, pd=pd,
    )


def _hh_kernel_sublane(dims, n_bodies, n_obj, n_dirs, rows_a_ref,
                       rows_b_ref, nb_ref, obj_ref, pack_ref, out_ref):
    # pairs arrive as two [PT, TW] blocks (removing the middle dim of a
    # [PT, 2, TW] tile is an unsupported Mosaic relayout)
    c = hh_sat_planes(
        dims, n_bodies, n_obj, rows_a_ref[:], rows_b_ref[:],
        nb_ref[:], obj_ref[:], pack_ref[:], n_dirs=n_dirs,
    )
    rec = jnp.concatenate(
        [
            c["ref"][:, None], c["alt"][:, None], c["num"][:, None],
            c["nrm"][0][:, None], c["nrm"][1][:, None],
            c["nrm"][2][:, None],
            c["px"], c["py"], c["pz"], c["pd"],
        ],
        axis=1,
    )  # [PT, 22, TW]
    out_ref[:] = rec


def make_hh_narrowphase_sublane(dims, n_bodies, n_obj, pair_tile: int = 0,
                                tile_w: int = 128, interpret: bool = False,
                                vmem_limit_mb: int = 0, n_dirs: int = 0):
    """Pairs-in-sublanes kernel builder (see module note). Returns
    fn(nb_t [N,10,W], obj_t [N,W] f32, pairs_t [P,2,W] i32, hull_pack)
    -> record [P, 22, W] f32. n_dirs > 0 selects the edge-direction
    SAT tier (_edge_query_dirs_s)."""
    kern = functools.partial(
        _hh_kernel_sublane, dims, n_bodies, n_obj, n_dirs
    )

    def run(nb_t, obj_t, pairs_t, hull_pack):
        n, _, w = nb_t.shape
        p = pairs_t.shape[0]
        pt = pair_tile or p
        tw = min(tile_w, w)
        rows_a_t = pairs_t[:, 0, :]
        rows_b_t = pairs_t[:, 1, :]
        grid = (pl.cdiv(w, tw), pl.cdiv(p, pt))
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (pt, tw), lambda wi, pi: (pi, wi),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (pt, tw), lambda wi, pi: (pi, wi),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (n, 10, tw), lambda wi, pi: (0, 0, wi),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (n, tw), lambda wi, pi: (0, wi),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (pt, 22, tw), lambda wi, pi: (pi, 0, wi),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((p, 22, w), jnp.float32),
            interpret=interpret,
            **(
                {"compiler_params": pltpu.CompilerParams(
                    vmem_limit_bytes=vmem_limit_mb * 1024 * 1024
                )}
                if vmem_limit_mb and not interpret else {}
            ),
        )(rows_a_t, rows_b_t, nb_t, obj_t, hull_pack)

    return run
