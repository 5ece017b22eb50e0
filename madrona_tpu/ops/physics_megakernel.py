"""Fused whole-physics-step Pallas TPU megakernel.

One ``pallas_call`` per step runs: predicted-pose integrate ->
narrowphase (hull-hull SAT + hull-plane + sphere lanes) -> the whole
XPBD substep loop. This is the full analogue of the reference's
megakernel taskgraph execution (``src/mw/device/megakernel.cpp`` runs
narrowphase AND solver nodes in one persistent kernel; SURVEY.md §2.2):
round 1 split them into two kernels (ops/narrowphase_pallas +
ops/solver_pallas) with the contact records and the hp/sp lanes
round-tripping HBM through an XLA assembly stage between them. Here the
contact buffers never leave VMEM: the only HBM traffic is the packed
body state/params/candidates in and the solved state out.

Math parity: every phase is the SAME function the split kernels run —
``narrowphase_pallas.hh_sat_planes`` for hull-hull,
``solver_pallas._integrate/_position_solve/..`` for the solve — plus
plane-form ports of the cheap XLA lanes (``physics/narrowphase.py``
hull_plane_contact:501-521, sphere_*_contact:523-623) written with the
identical op order. The test suite checks the fused step against the
split path (XLA narrowphase + solver megakernel) in interpret mode.

Candidates still come from the XLA broadphase (physics/broadphase.py):
compaction is a one-hot MXU einsum there, which a VMEM kernel cannot
beat; the candidate row buffers are tiny ([P, W] i32).

Layout: identical to solver_pallas — worlds on lanes, field axes lead.
The fused extras: aux planes [4, N, W] carry per-body scale xyz +
sphere table radius (narrowphase needs them; the solver does not), and
the candidate buffers arrive as split row blocks (Mosaic cannot peel
the middle dim of a [P, 2, W] tile).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import narrowphase_pallas as npk
from . import solver_pallas as spk

BIG = npk.BIG
NEG_BIG = npk.NEG_BIG

# aux planes: 0:3 scale | 3 sphere table radius (unscaled)
AUX_F = 4


# ------------------------------------------------------------- lane fetch


def _fetch(rows, planes, n):
    """One-hot gather of per-body planes onto pair lanes.

    rows [PT, TW] i32 (pre-clipped to [0, n)); planes: tuple of
    [N, TW]; returns tuple of [PT, TW]."""
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)
    m = (iota_n == rows[None]).astype(jnp.float32)      # [N, PT, TW]
    return tuple(jnp.sum(m * p[:, None, :], axis=0) for p in planes)


def _fetch_hrow(obj_rows, pack, n_obj):
    """Hull pack row per pair lane: obj_rows [PT, TW] i32 -> hrow
    [PT, K, TW] (same loop as hh_sat_planes' fetch — bit parity)."""
    pt, tw = obj_rows.shape
    k = pack.shape[1]
    hrow = jnp.zeros((pt, k, tw), jnp.float32)
    for o in range(n_obj):
        row = pack[o, :][None, :, None]
        hrow = hrow + jnp.where((obj_rows == o)[:, None, :], row, 0.0)
    return hrow


# ------------------------------------------------------- hull-plane lane


def _hp_contacts(dims, n, n_obj, rows_h, rows_p, comps, obj, pack):
    """Plane-form hull_plane_contact (physics/narrowphase.py:501-521)
    over hp candidate lanes. comps: 10 planes [N, TW] (pos|rot|scale) at
    predicted poses; obj [N, TW] f32. Returns the same field dict as
    hh_sat_planes."""
    v, f, fv, e = dims
    valid_pair = rows_h < n
    rh = jnp.clip(rows_h, 0, n - 1)
    rp = jnp.clip(rows_p, 0, n - 1)

    hc = _fetch(rh, comps + (obj,), n)
    pc = _fetch(rp, comps[:7], n)
    hx, hq, hs = hc[0:3], hc[3:7], hc[7:10]
    obj_h = hc[10].astype(jnp.int32)
    px, pq = pc[0:3], pc[3:7]

    hrow = _fetch_hrow(obj_h, pack, n_obj)
    h = npk._world_s(npk._unpack_hull_s(hrow, dims), hx, hq, hs)

    zero = jnp.zeros_like(pq[0])
    n_pl = npk._qrot(pq, (zero, zero, jnp.ones_like(zero)))
    d = npk._vdot(n_pl, px)

    nb = tuple(x[:, None] for x in n_pl)                # [PT, 1, TW]
    vd = npk._vdot(h["verts"], nb) - d[:, None]
    vd_m = jnp.where(h["verts_mask"], vd, BIG)
    separation = jnp.min(vd_m, axis=1)

    dots = npk._vdot(h["planes_n"], nb)
    dots = jnp.where(h["faces_mask"], dots, BIG)
    _, inc = npk._argmin_ax1(
        dots, *[h["face_polys"][i] for i in range(3)],
        h["face_poly_mask"].astype(jnp.float32),
    )
    poly = (inc[0], inc[1], inc[2])                     # [PT, FV, TW]
    pmask = inc[3] > 0.5

    pd = npk._vdot(poly, nb) - d[:, None]
    below = pmask & (pd <= 0.0)
    proj = tuple(poly[i] - pd * n_pl[i][:, None] for i in range(3))
    pts4, dep4, npts = npk._reduce4_s(proj, -pd, below, n_pl, fv)

    valid = valid_pair & (separation <= 0.0) & (npts > 0)
    sent = jnp.float32(n)
    return dict(
        ref=jnp.where(valid, rows_p.astype(jnp.float32), sent),
        alt=jnp.where(valid, rows_h.astype(jnp.float32), sent),
        num=jnp.where(valid, npts, 0).astype(jnp.float32),
        nrm=n_pl,
        px=pts4[0], py=pts4[1], pz=pts4[2], pd=dep4,
    )


# ---------------------------------------------------------- sphere lane


def _sphere_hull_planes(dims, ps, radius, h):
    """Plane-form sphere_hull_contact (physics/narrowphase.py:559-623):
    exact closest point over verts/edges/face interiors + deep case."""
    v, f, fv, e = dims
    psb = tuple(x[:, None] for x in ps)                 # [PT, 1, TW]

    fd = npk._vdot(h["planes_n"], psb) - h["planes_d"]  # [PT, F, TW]
    fd_m = jnp.where(h["faces_mask"], fd, NEG_BIG)
    max_fd = jnp.max(fd_m, axis=1)
    inside = max_fd <= 0.0

    vdist2 = (
        (h["verts"][0] - psb[0]) ** 2 + (h["verts"][1] - psb[1]) ** 2
        + (h["verts"][2] - psb[2]) ** 2
    )
    vdist2 = jnp.where(h["verts_mask"], vdist2, BIG)
    best_d2, best_pt = npk._argmin_ax1(vdist2, *h["verts"])

    ev = npk._vsub(h["edge_p2"], h["edge_p1"])
    to_s = tuple(psb[i] - h["edge_p1"][i] for i in range(3))
    tt = npk._vdot(to_s, ev) / jnp.maximum(npk._vdot(ev, ev), 1e-12)
    tt = jnp.clip(tt, 0.0, 1.0)
    ept = tuple(h["edge_p1"][i] + tt * ev[i] for i in range(3))
    ed2 = (
        (ept[0] - psb[0]) ** 2 + (ept[1] - psb[1]) ** 2
        + (ept[2] - psb[2]) ** 2
    )
    ed2 = jnp.where(h["edges_mask"], ed2, BIG)
    e_d2, e_best = npk._argmin_ax1(ed2, *ept)
    closer = e_d2 < best_d2
    best_pt = npk._vwhere(closer, e_best, best_pt)
    best_d2 = jnp.minimum(e_d2, best_d2)

    # face interior projections
    proj = tuple(psb[i] - fd * h["planes_n"][i] for i in range(3))
    # [PT, F, TW]
    poly = h["face_polys"]                              # [PT, F, FV, TW]
    mask = h["face_poly_mask"]
    count = jnp.sum(mask.astype(jnp.int32), axis=2)     # [PT, F, TW]
    iota_fv = jax.lax.broadcasted_iota(jnp.int32, (1, 1, fv, 1), 2)
    is_last = iota_fv == (count[:, :, None, :] - 1)
    rolled = tuple(
        jnp.concatenate([p[:, :, 1:], p[:, :, :1]], axis=2) for p in poly
    )
    nxt = tuple(
        jnp.where(is_last, poly[i][:, :, :1], rolled[i]) for i in range(3)
    )
    nrm_f = tuple(x[:, :, None] for x in h["planes_n"])  # [PT, F, 1, TW]
    side_n = npk._vcross(npk._vsub(nxt, poly), nrm_f)
    sd = npk._vdot(side_n, tuple(
        proj[i][:, :, None] - poly[i] for i in range(3)
    ))                                                  # [PT, F, FV, TW]
    ok_f = jnp.where(mask, (sd <= 1e-7).astype(jnp.float32), 1.0)
    f_inside = jnp.min(ok_f, axis=2) > 0.5              # [PT, F, TW]
    f_ok = f_inside & h["faces_mask"] & (fd > 0.0)
    f_d2 = jnp.where(f_ok, fd * fd, BIG)
    f_d2min, f_best = npk._argmin_ax1(f_d2, *proj)
    closer = f_d2min < best_d2
    best_pt = npk._vwhere(closer, f_best, best_pt)
    best_d2 = jnp.minimum(f_d2min, best_d2)

    dist = jnp.sqrt(jnp.maximum(best_d2, 1e-30))
    to_sphere = tuple((ps[i] - best_pt[i]) / dist for i in range(3))
    _, deep = npk._argmax_ax1(fd_m, *h["planes_n"])
    nrm = npk._vwhere(inside, deep, to_sphere)
    depth = jnp.where(inside, -max_fd + radius, radius - dist)
    pt = npk._vwhere(
        inside,
        tuple(ps[i] - max_fd * deep[i] for i in range(3)),
        best_pt,
    )
    valid = depth >= 0.0
    return dict(valid=valid, pt=pt, depth=depth, nrm=nrm)


def _sp_contacts(dims, n, n_obj, rows_s, rows_o, kind, comps, obj, rad,
                 pack, type_plane, type_hull):
    """Plane-form sp_lane (physics/api.py sp_lane + narrowphase.py
    sphere_*_contact): SS/SP/SH selected per lane by the second prim's
    type code."""
    valid_pair = rows_s < n
    rs = jnp.clip(rows_s, 0, n - 1)
    ro = jnp.clip(rows_o, 0, n - 1)

    sc = _fetch(rs, comps + (rad,), n)
    oc = _fetch(ro, comps + (obj, rad), n)
    ps, ss = sc[0:3], sc[7:10]
    radius = sc[10] * ss[0]
    po, qo, so = oc[0:3], oc[3:7], oc[7:10]
    obj_o = oc[10].astype(jnp.int32)
    rad_o = oc[11] * so[0]

    # --- sphere-sphere
    to_b = npk._vsub(po, ps)
    dist = jnp.sqrt(jnp.maximum(npk._vdot(to_b, to_b), 1e-30))
    n_ab = tuple(x / dist for x in to_b)
    zero = jnp.zeros_like(dist)
    n_ab = npk._vwhere(
        dist > 1e-12, n_ab, (zero, zero, jnp.ones_like(dist))
    )
    pen_ss = radius + rad_o - dist
    n_ss = tuple(-x for x in n_ab)
    pt_ss = tuple(po[i] + rad_o * n_ss[i] for i in range(3))
    ok_ss = pen_ss >= 0.0

    # --- sphere-plane
    n_sp = npk._qrot(qo, (zero, zero, jnp.ones_like(zero)))
    d_pl = npk._vdot(n_sp, po)
    t = npk._vdot(n_sp, ps) - d_pl
    pen_sp = radius - t
    pt_sp = tuple(ps[i] - t * n_sp[i] for i in range(3))
    ok_sp = pen_sp >= 0.0

    # --- sphere-hull
    hrow = _fetch_hrow(obj_o, pack, n_obj)
    h = npk._world_s(npk._unpack_hull_s(hrow, dims), po, qo, so)
    sh = _sphere_hull_planes(dims, ps, radius, h)

    is_plane = kind == type_plane
    is_hull = kind == type_hull
    pick = lambda p, hh, ss_: jnp.where(
        is_plane, p, jnp.where(is_hull, hh, ss_)
    )
    pickv = lambda p, hh, ss_: npk._vwhere(
        is_plane, p, npk._vwhere(is_hull, hh, ss_)
    )
    nrm = pickv(n_sp, sh["nrm"], n_ss)
    pt = pickv(pt_sp, sh["pt"], pt_ss)
    pen = pick(pen_sp, sh["depth"], pen_ss)
    ok = pick(
        ok_sp.astype(jnp.float32),
        sh["valid"].astype(jnp.float32),
        ok_ss.astype(jnp.float32),
    ) > 0.5
    valid = ok & valid_pair

    z3 = jnp.zeros((pt[0].shape[0], 3, pt[0].shape[1]), jnp.float32)
    mk = lambda x: jnp.concatenate([x[:, None], z3], axis=1)
    sent = jnp.float32(n)
    return dict(
        ref=jnp.where(valid, rows_o.astype(jnp.float32), sent),
        alt=jnp.where(valid, rows_s.astype(jnp.float32), sent),
        num=jnp.where(valid, 1, 0).astype(jnp.float32),
        nrm=nrm,
        px=mk(pt[0]), py=mk(pt[1]), pz=mk(pt[2]), pd=mk(pen),
    )


# ----------------------------------------------------------------- kernel


def _fused_kernel(dims, n_bodies, n_obj, n_joints, substeps, iters, h,
                  gravity, restitution, restitution_threshold, loop,
                  pair_chunk, type_plane, type_hull, n_dirs, *refs):
    n = n_bodies
    if n_joints > 0:
        (state_ref, aux_ref, param_ref, obj_ref, hh_a_ref, hh_b_ref,
         hp_h_ref, hp_p_ref, sp_s_ref, sp_o_ref, sp_k_ref, pack_ref,
         je1_ref, je2_ref, jnt_ref, out_ref) = refs
    else:
        (state_ref, aux_ref, param_ref, obj_ref, hh_a_ref, hh_b_ref,
         hp_h_ref, hp_p_ref, sp_s_ref, sp_o_ref, sp_k_ref, pack_ref,
         out_ref) = refs

    sp_ = state_ref[:]                               # [STATE_F, N, TW]
    pp = param_ref[:]                                # [PARAM_F, N, TW]
    ax = aux_ref[:]                                  # [AUX_F, N, TW]
    obj = obj_ref[:]                                 # [N, TW] f32
    pack = pack_ref[:]

    st = dict(
        x=(sp_[0], sp_[1], sp_[2]),
        q=(sp_[3], sp_[4], sp_[5], sp_[6]),
        v=(sp_[7], sp_[8], sp_[9]),
        w=(sp_[10], sp_[11], sp_[12]),
    )
    pr = dict(
        inv_m=pp[0], inv_i=(pp[1], pp[2], pp[3]),
        mu_s=pp[4], mu_d=pp[5],
        dynamic=pp[6] > 0.5, moving=pp[7] > 0.5, static=pp[8] > 0.5,
        ext_f=(pp[9], pp[10], pp[11]), ext_t=(pp[12], pp[13], pp[14]),
        active=pp[15] > 0.5,
        inv_m_raw=pp[16], inv_i_raw=(pp[17], pp[18], pp[19]),
    )

    # ---- narrowphase at predicted poses (frozen per step — the
    # narrowphase_once contract, xpbd "Small Steps" style)
    pred = spk._integrate(st, pr, h, gravity)
    comps = pred["x"] + pred["q"] + (ax[0], ax[1], ax[2])
    nb = jnp.stack(comps, axis=1)                    # [N, 10, TW]

    def cat_lane(parts, key):
        vals = [p[key] for p in parts]
        if isinstance(vals[0], tuple):
            return tuple(
                jnp.concatenate([v[i] for v in vals], axis=0)
                for i in range(len(vals[0]))
            )
        return jnp.concatenate(vals, axis=0)

    hh_a = hh_a_ref[:]
    hh_b = hh_b_ref[:]
    p_hh = hh_a.shape[0]
    chunk = pair_chunk or p_hh
    hh_parts = []
    for c0 in range(0, p_hh, chunk):
        hh_parts.append(npk.hh_sat_planes(
            dims, n, n_obj,
            hh_a[c0:c0 + chunk], hh_b[c0:c0 + chunk], nb, obj, pack,
            n_dirs=n_dirs,
        ))

    hp = _hp_contacts(
        dims, n, n_obj, hp_h_ref[:], hp_p_ref[:], comps, obj, pack
    )
    spc = _sp_contacts(
        dims, n, n_obj, sp_s_ref[:], sp_o_ref[:], sp_k_ref[:],
        comps, obj, ax[3], pack, type_plane, type_hull,
    )

    parts = hh_parts + [hp, spc]
    ref_rows = cat_lane(parts, "ref").astype(jnp.int32)   # [C, TW]
    alt_rows = cat_lane(parts, "alt").astype(jnp.int32)
    num = cat_lane(parts, "num").astype(jnp.int32)
    nrm = cat_lane(parts, "nrm")                          # 3 x [C, TW]
    px = cat_lane(parts, "px")                            # [C, 4, TW]
    py = cat_lane(parts, "py")
    pz = cat_lane(parts, "pz")
    pd = cat_lane(parts, "pd")

    # ---- avg contact + max penetration (xpbd._avg_contacts_batch)
    pd_k = [pd[:, k] for k in range(4)]
    live = [jnp.asarray(k, jnp.int32) < num for k in range(4)]
    wgt = [jnp.where(live[k], pd_k[k], 0.0) for k in range(4)]
    total = wgt[0] + wgt[1] + wgt[2] + wgt[3]
    zero = total == 0.0
    inv_tot = 1.0 / jnp.where(zero, 1.0, total)
    avg = tuple(
        sum((wgt[k] * inv_tot) * comp[:, k] for k in range(4))
        for comp in (px, py, pz)
    )
    max_pen = jnp.maximum(
        jnp.maximum(
            jnp.where(live[0], pd_k[0], NEG_BIG),
            jnp.where(live[1], pd_k[1], NEG_BIG),
        ),
        jnp.maximum(
            jnp.where(live[2], pd_k[2], NEG_BIG),
            jnp.where(live[3], pd_k[3], NEG_BIG),
        ),
    )
    ok = (num > 0) & (~zero)
    con = dict(nrm=nrm, avg=avg, pen=max_pen, ok=ok, num=num)
    pts = []
    for k in range(4):
        pts += [px[:, k], py[:, k], pz[:, k], pd_k[k]]

    iota_n = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)
    m_ref = (iota_n == jnp.clip(ref_rows, 0, n - 1)[:, None, :]).astype(
        jnp.float32
    )
    m_alt = (iota_n == jnp.clip(alt_rows, 0, n - 1)[:, None, :]).astype(
        jnp.float32
    )
    masks = (m_ref, m_alt)

    # hoisted per-contact-side params (round-3 solver signature): inv
    # masses / friction never change during the step, so gather once.
    # The fused path runs the solve over ALL rows (no dyn_range static
    # split), so the static contributions are None; sentinel lanes are
    # clipped onto row n-1 but every solve application is gated by
    # con["ok"], so the hoisted values on dead lanes are never used.
    def _prm_side(mask):
        return dict(
            inv_m=spk._gather(mask, pp[0]),
            inv_i=spk._gv(mask, (pp[1], pp[2], pp[3])),
            mu_s=spk._gather(mask, pp[4]),
            mu_d=spk._gather(mask, pp[5]),
        )

    prm = (_prm_side(m_ref), _prm_side(m_alt))
    stats = (None, None)

    jmasks = jn = jprm = jstats = None
    if n_joints > 0:
        je1 = je1_ref[:]
        je2 = je2_ref[:]
        m_j1 = (iota_n == jnp.clip(je1, 0, n - 1)[:, None, :]).astype(
            jnp.float32
        )
        m_j2 = (iota_n == jnp.clip(je2, 0, n - 1)[:, None, :]).astype(
            jnp.float32
        )
        jmasks = (m_j1, m_j2)
        jprm = (_prm_side(m_j1), _prm_side(m_j2))
        jstats = (None, None)
        jp = jnt_ref[:]
        jn = dict(
            r1=(jp[0], jp[1], jp[2]), r2=(jp[3], jp[4], jp[5]),
            aq1=(jp[6], jp[7], jp[8], jp[9]),
            aq2=(jp[10], jp[11], jp[12], jp[13]),
            sep=jp[14],
            a1l=(jp[15], jp[16], jp[17]), a2l=(jp[18], jp[19], jp[20]),
            ok=jp[21] > 0.5, is_fixed=jp[22] > 0.5,
        )

    g = gravity

    def substep_once(st):
        st = spk._integrate(st, pr, h, g)
        subs = (
            spk._side_sub(m_ref, st, None),
            spk._side_sub(m_alt, st, None),
        )
        st, lam_n = spk._position_solve(
            st, pr, masks, con, iters, prm, subs, stats
        )
        if n_joints > 0:
            st = spk._joint_solve(st, pr, jmasks, jn, jprm, jstats)
        st = spk._set_velocities(st, pr, h)
        st = spk._velocity_solve(
            st, pr, masks, con, pts, lam_n, h, restitution,
            restitution_threshold, prm, subs, stats,
        )
        return st

    if loop and substeps > 1:
        z1 = jnp.zeros_like(sp_[0])
        st = dict(
            st,
            prev_x=(z1,) * 3, prev_q=(z1,) * 4,
            psx=(z1,) * 3, psq=(z1,) * 4,
            psv=(z1,) * 3, psw=(z1,) * 3,
        )
        st = jax.lax.fori_loop(
            0, substeps, lambda _, s: substep_once(s), st
        )
    else:
        for _ in range(substeps):
            st = substep_once(st)

    planes = (
        st["x"] + st["q"] + st["v"] + st["w"]
        + st["prev_x"] + st["prev_q"] + st["psx"] + st["psq"]
        + st["psv"] + st["psw"]
    )
    out_ref[:] = jnp.stack(planes, axis=0)


def make_fused_step(dims, n_bodies, n_obj, substeps, iters, h, gravity,
                    restitution, restitution_threshold,
                    type_plane, type_hull,
                    n_joints: int = 0, tile_w: int = 128,
                    interpret: bool = False, loop: bool = False,
                    pair_chunk: int = 0, vmem_limit_mb: int = 0,
                    n_dirs: int = 0):
    """Build the jitted fused physics-step kernel.

    fn(state_t [STATE_F,N,W], aux_t [AUX_F,N,W], param_t [PARAM_F,N,W],
       obj_t [N,W] f32, hh_a [P_hh,W] i32, hh_b, hp_h [P_hp,W], hp_p,
       sp_s [P_s,W], sp_o, sp_kind, pack [O,K]
       [, je1 [J,W] i32, je2, jnt_t [JNT_F,J,W]]) -> out [OUT_F, N, W]
    """
    kern = functools.partial(
        _fused_kernel, dims, n_bodies, n_obj, n_joints, substeps, iters,
        float(h), tuple(float(x) for x in gravity), float(restitution),
        float(restitution_threshold), loop, pair_chunk,
        int(type_plane), int(type_hull), int(n_dirs),
    )

    def run(state_t, aux_t, param_t, obj_t, hh_a, hh_b, hp_h, hp_p,
            sp_s, sp_o, sp_kind, pack,
            je1_t=None, je2_t=None, jnt_t=None):
        n = state_t.shape[1]
        w = state_t.shape[2]
        tw = min(tile_w, w)
        grid = (pl.cdiv(w, tw),)
        wspec = lambda lead: pl.BlockSpec(
            lead + (tw,), (lambda wi: (0,) * len(lead) + (wi,)),
            memory_space=pltpu.VMEM,
        )
        in_specs = [
            wspec((spk.STATE_F, n)),
            wspec((AUX_F, n)),
            wspec((spk.PARAM_F, n)),
            wspec((n,)),
            wspec((hh_a.shape[0],)),
            wspec((hh_b.shape[0],)),
            wspec((hp_h.shape[0],)),
            wspec((hp_p.shape[0],)),
            wspec((sp_s.shape[0],)),
            wspec((sp_o.shape[0],)),
            wspec((sp_kind.shape[0],)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        args = [state_t, aux_t, param_t, obj_t, hh_a, hh_b, hp_h, hp_p,
                sp_s, sp_o, sp_kind, pack]
        if n_joints > 0:
            j = je1_t.shape[0]
            in_specs += [wspec((j,)), wspec((j,)), wspec((spk.JNT_F, j))]
            args += [je1_t, je2_t, jnt_t]
        extra = {}
        if vmem_limit_mb and not interpret:
            extra["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
            )
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=in_specs,
            out_specs=wspec((spk.OUT_F, n)),
            out_shape=jax.ShapeDtypeStruct(
                (spk.OUT_F, n, w), jnp.float32
            ),
            interpret=interpret,
            **extra,
        )(*args)

    return run


# --------------------------------------------------- contacts megakernel


def _contacts_kernel(dims, n, n_obj, n_dirs, hh_a_ref, hh_b_ref,
                     hp_h_ref, hp_p_ref, nb_ref, obj_ref, pack_ref,
                     ref_out, alt_out, con_out, pts_out, num_out):
    """Narrowphase (hh SAT + hull-plane lane) + contact reduction in one
    kernel, emitting the solver megakernel's planar inputs directly.

    Replaces the split path's XLA tail (hp one-hot pair gathers,
    xpbd._avg_contacts_batch, the [W, C, 22]-class concats and the
    W-major<->planar transposes) — the narrowphase record never leaves
    VMEM in W-major form. Math identical to the split path: hh via
    npk.hh_sat_planes (the proven sublane kernel), hp via _hp_contacts
    (plane-form port of physics/narrowphase.py hull_plane_contact), and
    the same avg/max-pen reduction the fused kernel runs (bit parity
    with xpbd._avg_contacts_batch)."""
    nb3 = nb_ref[:]                                   # [N, 10, TW]
    obj = obj_ref[:]                                  # [N, TW]
    pack = pack_ref[:]

    hh = npk.hh_sat_planes(
        dims, n, n_obj, hh_a_ref[:], hh_b_ref[:], nb3, obj, pack,
        n_dirs=n_dirs,
    )
    comps = tuple(nb3[:, i] for i in range(10))
    hp = _hp_contacts(
        dims, n, n_obj, hp_h_ref[:], hp_p_ref[:], comps, obj, pack
    )

    def cat(key):
        vals = [p[key] for p in (hh, hp)]
        if isinstance(vals[0], tuple):
            return tuple(
                jnp.concatenate([v[i] for v in vals], axis=0)
                for i in range(len(vals[0]))
            )
        return jnp.concatenate(vals, axis=0)

    ref = cat("ref")                                  # [C, TW] f32
    alt = cat("alt")
    num = cat("num").astype(jnp.int32)
    nrm = cat("nrm")                                  # 3 x [C, TW]
    px = cat("px")                                    # [C, 4, TW]
    py = cat("py")
    pz = cat("pz")
    pd = cat("pd")

    # avg contact + max penetration (same op order as the fused kernel
    # == xpbd._avg_contacts_batch)
    pd_k = [pd[:, k] for k in range(4)]
    live = [jnp.asarray(k, jnp.int32) < num for k in range(4)]
    wgt = [jnp.where(live[k], pd_k[k], 0.0) for k in range(4)]
    total = wgt[0] + wgt[1] + wgt[2] + wgt[3]
    zero = total == 0.0
    inv_tot = 1.0 / jnp.where(zero, 1.0, total)
    avg = tuple(
        sum((wgt[k] * inv_tot) * comp[:, k] for k in range(4))
        for comp in (px, py, pz)
    )
    max_pen = jnp.maximum(
        jnp.maximum(
            jnp.where(live[0], pd_k[0], NEG_BIG),
            jnp.where(live[1], pd_k[1], NEG_BIG),
        ),
        jnp.maximum(
            jnp.where(live[2], pd_k[2], NEG_BIG),
            jnp.where(live[3], pd_k[3], NEG_BIG),
        ),
    )
    ok = ((num > 0) & (~zero)).astype(jnp.float32)

    ref_out[:] = ref
    alt_out[:] = alt
    num_out[:] = num
    con_out[:] = jnp.stack(
        [nrm[0], nrm[1], nrm[2], avg[0], avg[1], avg[2], max_pen, ok],
        axis=0,
    )                                                 # [CON_F, C, TW]
    pts_rows = []
    for k in range(4):
        pts_rows += [px[:, k], py[:, k], pz[:, k], pd_k[k]]
    pts_out[:] = jnp.stack(pts_rows, axis=0)          # [PTS_F, C, TW]


def make_contacts_kernel(dims, n_bodies, n_obj, tile_w: int = 128,
                         interpret: bool = False, vmem_limit_mb: int = 0,
                         n_dirs: int = 0):
    """Build the narrowphase+assembly kernel.

    fn(hh_a [PH, W] i32, hh_b, hp_h [PP, W] i32, hp_p,
       nb_t [N, 10, W] f32 (pos|rot|scale at PREDICTED poses),
       obj_t [N, W] f32, pack [O, K])
    -> (ref [C, W] f32, alt [C, W] f32, con [CON_F, C, W],
        pts [PTS_F, C, W], num [C, W] i32)   with C = PH + PP,
    exactly the planar inputs of ops/solver_pallas.make_substep_solver.
    """
    kern = functools.partial(
        _contacts_kernel, dims, n_bodies, n_obj, n_dirs
    )

    def run(hh_a, hh_b, hp_h, hp_p, nb_t, obj_t, pack):
        n, _, w = nb_t.shape
        ph = hh_a.shape[0]
        pp = hp_h.shape[0]
        c = ph + pp
        tw = min(tile_w, w)
        grid = (pl.cdiv(w, tw),)
        wspec = lambda lead: pl.BlockSpec(
            lead + (tw,), (lambda wi: (0,) * len(lead) + (wi,)),
            memory_space=pltpu.VMEM,
        )
        extra = {}
        if vmem_limit_mb and not interpret:
            extra["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
            )
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                wspec((ph,)), wspec((ph,)), wspec((pp,)), wspec((pp,)),
                wspec((n, 10)), wspec((n,)),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=[
                wspec((c,)), wspec((c,)), wspec((spk.CON_F, c)),
                wspec((spk.PTS_F, c)), wspec((c,)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((c, w), jnp.float32),
                jax.ShapeDtypeStruct((c, w), jnp.float32),
                jax.ShapeDtypeStruct((spk.CON_F, c, w), jnp.float32),
                jax.ShapeDtypeStruct((spk.PTS_F, c, w), jnp.float32),
                jax.ShapeDtypeStruct((c, w), jnp.int32),
            ],
            interpret=interpret,
            **extra,
        )(hh_a, hh_b, hp_h, hp_p, nb_t, obj_t, pack)

    return run
