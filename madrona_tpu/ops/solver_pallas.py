"""Pallas TPU megakernel: the whole XPBD substep loop, VMEM-resident.

The true analogue of the reference's GPU megakernel execution
(SURVEY.md §2.2 — the taskgraph interpreter keeps per-substep state hot
instead of round-tripping device memory between node kernels,
``src/mw/device/megakernel.cpp``): this kernel runs
``integrate -> position solve (Jacobi iters) -> set_velocities ->
velocity solve`` for ALL substeps of one step inside a single
``pallas_call``, with the body state, contact buffers, and the one-hot
contact->body masks living in VMEM throughout. The XLA path
(physics/xpbd.py jacobi solver) executes the same math as ~25 HBM-bound
ops per substep; here the only HBM traffic is one read of the packed
state/contacts and one write of the final state.

Math parity: every phase replicates physics/xpbd.py bit-for-bit
(integrate, _local_contacts, _solve_contact/_apply_positional_update,
set_velocities, solve_velocities_jacobi) — the test suite checks the
kernel against the XLA path in interpret mode, and the XLA path against
the Gauss-Seidel oracle.

Layout (pairs-in-sublanes convention of ops/narrowphase_pallas.py):
worlds ride the lane axis; contacts/bodies ride sublanes; every vector
quantity is a tuple of scalar component planes. Field axes LEAD
([F, N, W]) because Mosaic cannot slice interior dims of >=3-D tiles.
Contact masks are built once per kernel instance and reused across all
substeps (contacts are frozen per step: PhysicsConfig.narrowphase_once).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# state pack layout (leading field axis)
#   0:3 pos | 3:7 rot | 7:10 vel | 10:13 omega
STATE_F = 13
# output adds solver scratch for write_back parity:
#   13:16 prev_x | 16:20 prev_q | 20:23 presolve_x | 23:27 presolve_q
#   27:30 presolve_v | 30:33 presolve_w
OUT_F = 33
# params: 0 inv_m (static-masked, solver) | 1:4 inv_i (masked) | 4 mu_s
#   | 5 mu_d | 6 dynamic | 7 moving | 8 static | 9:12 ext_force
#   | 12:15 ext_torque | 15 active | 16 inv_m_raw (integrate)
#   | 17:20 inv_i_raw
PARAM_F = 20
# contacts: 0:3 normal | 3:6 avg_pt | 6 max_pen | 7 ok
CON_F = 8
# points: 4 x (xyz + depth)
PTS_F = 16
# joints: 0:3 r1 | 3:6 r2 | 6:10 attach_q1 | 10:14 attach_q2 | 14 sep
#   | 15:18 a1_local | 18:21 a2_local | 21 ok | 22 is_fixed
JNT_F = 23


# ------------------------------------------------------------ plane math


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


def _qmul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return (
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    )


def _qinv(q):
    return (q[0], -q[1], -q[2], -q[3])


def _qrot(q, v):
    u = (q[1], q[2], q[3])
    uv = _vcross(u, v)
    uuv = _vcross(u, uv)
    return tuple(v[i] + 2.0 * (q[0] * uv[i] + uuv[i]) for i in range(3))


def _qnormalize(q):
    l2 = q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3]
    inv = 1.0 / jnp.sqrt(jnp.maximum(l2, 1e-30))
    return tuple(x * inv for x in q)


def _pure_mul(v, q):
    """quat_mul((0, v), q)."""
    return _qmul((jnp.zeros_like(v[0]), v[0], v[1], v[2]), q)


def _ginv_mass(t_axis, r_axis, inv_m):
    return inv_m + _vdot(t_axis, r_axis)


# --------------------------------------------------------- gather/scatter


def _gather(mask, plane):
    """mask [C, N, TW]; plane [N, TW] -> [C, TW]."""
    return jnp.sum(mask * plane[None], axis=1)


def _gv(mask, v):
    return tuple(_gather(mask, p) for p in v)


def _scatter(mask, plane_c):
    """mask [C, N, TW]; plane_c [C, TW] -> [N, TW]."""
    return jnp.sum(mask * plane_c[:, None], axis=0)


# --- static-ref-segment variants: contact lanes >= ``live`` carry a
# GUARANTEED-static ref row, whose dyn-range mask rows are structurally
# all-zero (mk_dyn of a row outside [d0, d1) matches nothing), so the
# gather prefix + an exact zero tail / the scatter prefix are identical
# to the full contraction at a fraction of the cost. Exact by
# construction; only enabled under solver_dynamic_range.


def _gather_seg(mask, live, plane):
    c = mask.shape[0]
    if live >= c:
        return _gather(mask, plane)
    g = _gather(mask[:live], plane)
    return jnp.concatenate(
        [g, jnp.zeros((c - live,) + g.shape[1:], g.dtype)], axis=0
    )


def _gv_seg(mask, live, v):
    return tuple(_gather_seg(mask, live, p) for p in v)


def _scatter_seg(mask, live, plane_c):
    if live >= mask.shape[0]:
        return _scatter(mask, plane_c)
    return _scatter(mask[:live], plane_c[:live])


# ----------------------------------------------------------------- phases


def _integrate(st, pr, h, g):
    """xpbd.integrate on planes (same op order). Uses the RAW (not
    static-masked) inverse masses, exactly like xpbd.integrate."""
    dyn = pr["dynamic"]
    mov = pr["moving"]
    stat = pr["static"]
    inv_m = pr["inv_m_raw"]
    inv_i = pr["inv_i_raw"]

    v = tuple(
        st["v"][i] + jnp.where(dyn, h * g[i], 0.0) for i in range(3)
    )
    v = tuple(v[i] + h * inv_m * pr["ext_f"][i] for i in range(3))
    x = tuple(st["x"][i] + h * v[i] for i in range(3))

    inertia = tuple(
        jnp.where(ii == 0.0, 0.0, 1.0 / jnp.where(ii == 0.0, 1.0, ii))
        for ii in inv_i
    )
    q_inv = _qinv(st["q"])
    tau_l = _qrot(q_inv, pr["ext_t"])
    w_l = _qrot(q_inv, st["w"])
    i_w_l = tuple(inertia[i] * w_l[i] for i in range(3))
    coriolis = _vcross(w_l, i_w_l)
    w_l = tuple(
        w_l[i] + h * inv_i[i] * (tau_l[i] - coriolis[i]) for i in range(3)
    )
    omega = _qrot(st["q"], w_l)

    half = _vscale(omega, 0.5 * h)
    q = _qnormalize(_vadd(st["q"], _qmul(
        (jnp.zeros_like(half[0]), half[0], half[1], half[2]), st["q"]
    )))

    x = _vwhere(mov, x, st["x"])
    q_out = _vwhere(mov, q, st["q"])
    v_out = _vwhere(mov, v, tuple(jnp.zeros_like(p) for p in v))
    w_out = _vwhere(mov, omega, tuple(jnp.zeros_like(p) for p in omega))

    return dict(
        x=x, q=q_out,
        v=_vwhere(stat, st["v"], v_out),
        w=_vwhere(stat, st["w"], w_out),
        prev_x=st["x"], prev_q=st["q"],
        psx=x, psq=q_out, psv=v_out, psw=w_out,
    )


def _local_contacts_pl(psq1, psx1, psq2, psx2, avg, pen, nrm):
    contact2 = tuple(avg[i] - nrm[i] * pen for i in range(3))
    r1 = _qrot(_qinv(psq1), _vsub(avg, psx1))
    r2 = _qrot(_qinv(psq2), _vsub(contact2, psx2))
    return r1, r2


def _apply_positional_pl(x1, x2, q1, q2, r1, r2, im1, im2, ii1, ii2,
                         nrm, c):
    n_l1 = _qrot(_qinv(q1), nrm)
    n_l2 = _qrot(_qinv(q2), nrm)
    t1 = _vcross(r1, n_l1)
    t2 = _vcross(r2, n_l2)
    ra1 = tuple(ii1[i] * t1[i] for i in range(3))
    ra2 = tuple(ii2[i] * t2[i] for i in range(3))
    w1 = _ginv_mass(t1, ra1, im1)
    w2 = _ginv_mass(t2, ra2, im2)
    # immovable-pair guard (matches xpbd._apply_positional_update)
    den = w1 + w2
    lam = jnp.where(den > 0, -c / jnp.where(den > 0, den, 1.0), 0.0)
    x1 = tuple(x1[i] + lam * im1 * nrm[i] for i in range(3))
    x2 = tuple(x2[i] - lam * im2 * nrm[i] for i in range(3))
    half = 0.5 * lam
    dq1 = _qrot(q1, _vscale(ra1, half))
    dq2 = _qrot(q2, _vscale(ra2, half))
    q1 = _qnormalize(_vadd4(q1, _pure_mul(dq1, q1)))
    q2 = _qnormalize(_vsub4(q2, _pure_mul(dq2, q2)))
    return x1, x2, q1, q2, lam


def _vadd4(a, b):
    return tuple(x + y for x, y in zip(a, b))


def _vsub4(a, b):
    return tuple(x - y for x, y in zip(a, b))


def _solve_contact_pl(b1, b2, r1, r2, nrm, mu_s):
    """handleContactConstraint on planes: returns dx1 dx2 dq-updated
    (x1..q2) + lambda_n."""
    x1, q1 = b1["x"], b1["q"]
    x2, q2 = b2["x"], b2["q"]
    p1 = _vadd(_qrot(q1, r1), x1)
    p2 = _vadd(_qrot(q2, r2), x2)
    d = _vdot(_vsub(p1, p2), nrm)
    penetrating = d > 0.0

    nx1, nx2, nq1, nq2, lam_n = _apply_positional_pl(
        x1, x2, q1, q2, r1, r2, b1["inv_m"], b2["inv_m"],
        b1["inv_i"], b2["inv_i"], nrm, d,
    )
    x1 = _vwhere(penetrating, nx1, x1)
    x2 = _vwhere(penetrating, nx2, x2)
    q1 = _vwhere(penetrating, nq1, q1)
    q2 = _vwhere(penetrating, nq2, q2)
    lam_n = jnp.where(penetrating, lam_n, 0.0)

    p1_hat = _vadd(_qrot(b1["prev_q"], r1), b1["prev_x"])
    p2_hat = _vadd(_qrot(b2["prev_q"], r2), b2["prev_x"])
    p1 = _vadd(_qrot(q1, r1), x1)
    p2 = _vadd(_qrot(q2, r2), x2)
    dp = _vsub(_vsub(p1, p1_hat), _vsub(p2, p2_hat))
    dpn = _vdot(dp, nrm)
    dpt = tuple(dp[i] - dpn * nrm[i] for i in range(3))
    t_mag = jnp.sqrt(jnp.maximum(_vdot(dpt, dpt), 1e-30))
    t_world = tuple(p / t_mag for p in dpt)

    t_l1 = _qrot(_qinv(q1), t_world)
    t_l2 = _qrot(_qinv(q2), t_world)
    ft1 = _vcross(r1, t_l1)
    ft2 = _vcross(r2, t_l2)
    fr1 = tuple(b1["inv_i"][i] * ft1[i] for i in range(3))
    fr2 = tuple(b2["inv_i"][i] * ft2[i] for i in range(3))
    w1 = _ginv_mass(ft1, fr1, b1["inv_m"])
    w2 = _ginv_mass(ft2, fr2, b2["inv_m"])
    den_t = w1 + w2
    lam_t = jnp.where(
        den_t > 0, -t_mag / jnp.where(den_t > 0, den_t, 1.0), 0.0
    )
    apply_f = penetrating & (t_mag > 0.0) & (lam_t > lam_n * mu_s)
    fx1 = tuple(x1[i] + lam_t * b1["inv_m"] * t_world[i] for i in range(3))
    fx2 = tuple(x2[i] - lam_t * b2["inv_m"] * t_world[i] for i in range(3))
    half = 0.5 * lam_t
    dq1 = _qrot(q1, _vscale(fr1, half))
    dq2 = _qrot(q2, _vscale(fr2, half))
    fq1 = _qnormalize(_vadd4(q1, _pure_mul(dq1, q1)))
    fq2 = _qnormalize(_vsub4(q2, _pure_mul(dq2, q2)))
    x1 = _vwhere(apply_f, fx1, x1)
    x2 = _vwhere(apply_f, fx2, x2)
    q1 = _vwhere(apply_f, fq1, q1)
    q2 = _vwhere(apply_f, fq2, q2)
    return x1, x2, q1, q2, lam_n


def _vaddn(a, b):
    """a + b where b may be None (no static contribution)."""
    return a if b is None else tuple(x + y for x, y in zip(a, b))


def _side_sub(mask, st, stat, live=None):
    """Per-substep side constants: prev/presolve gathers, hoisted out of
    the position iterations + velocity solve (set once by _integrate).
    ``stat`` carries the static-row contributions (see _substep_kernel);
    static rows' prev/presolve pose equals their constant pose, and their
    presolve velocity is exactly zero (integrate's moving guard).
    ``live``: static-ref-segment prefix length (see _gather_seg)."""
    if live is None:
        live = mask.shape[0]
    sx = stat["x"] if stat is not None else None
    sq = stat["q"] if stat is not None else None
    return dict(
        prev_x=_vaddn(_gv_seg(mask, live, st["prev_x"]), sx),
        prev_q=_vaddn(_gv_seg(mask, live, st["prev_q"]), sq),
        psx=_vaddn(_gv_seg(mask, live, st["psx"]), sx),
        psq=_vaddn(_gv_seg(mask, live, st["psq"]), sq),
        psv=_gv_seg(mask, live, st["psv"]),
        psw=_gv_seg(mask, live, st["psw"]),
    )


def _position_solve(st, pr, masks, con, iters, prm, subs, stats,
                    ref_live=None):
    """solve_positions_jacobi on planes; returns (st, lam_total [C, TW]).

    prm: hoisted per-contact-side params (inv_m/inv_i/mu — constant all
    step); subs: per-substep side constants (_side_sub); stats: static-
    row contributions for the changing x/q gathers (None = no split);
    ref_live: static-ref-segment prefix (see _gather_seg)."""
    m_ref, m_alt = masks
    prm1, prm2 = prm
    sub1, sub2 = subs
    s1, s2 = stats
    nrm, avg, pen, ok = con["nrm"], con["avg"], con["pen"], con["ok"]
    okf = ok.astype(jnp.float32)
    lam_total = jnp.zeros_like(pen)
    stat_d = pr["static"]
    c_all = m_ref.shape[0]
    if ref_live is None:
        ref_live = c_all

    for _ in range(iters):
        def side(mask, p, sub, s, live):
            return dict(
                x=_vaddn(_gv_seg(mask, live, st["x"]),
                         None if s is None else s["x"]),
                q=_vaddn(_gv_seg(mask, live, st["q"]),
                         None if s is None else s["q"]),
                prev_x=sub["prev_x"], prev_q=sub["prev_q"],
                psx=sub["psx"], psq=sub["psq"],
                inv_m=p["inv_m"], inv_i=p["inv_i"], mu_s=p["mu_s"],
            )

        b1 = side(m_ref, prm1, sub1, s1, ref_live)
        b2 = side(m_alt, prm2, sub2, s2, c_all)
        r1, r2 = _local_contacts_pl(
            b1["psq"], b1["psx"], b2["psq"], b2["psx"], avg, pen, nrm
        )
        mu_s = 0.5 * (b1["mu_s"] + b2["mu_s"])
        x1, x2, q1, q2, lam_n = _solve_contact_pl(b1, b2, r1, r2, nrm, mu_s)
        lam_total = lam_total + jnp.where(ok, lam_n, 0.0)

        d1 = _vsub(x1, b1["x"]) + _vsub4(q1, b1["q"])     # 7 planes
        d2 = _vsub(x2, b2["x"]) + _vsub4(q2, b2["q"])
        cnt = _scatter_seg(m_ref, ref_live, okf) + _scatter(m_alt, okf)
        cnt = jnp.maximum(cnt, 1.0)
        mean = tuple(
            (_scatter_seg(m_ref, ref_live, jnp.where(ok, d1[i], 0.0))
             + _scatter(m_alt, jnp.where(ok, d2[i], 0.0))) / cnt
            for i in range(7)
        )
        x = tuple(st["x"][i] + mean[i] for i in range(3))
        q = _qnormalize(tuple(st["q"][i] + mean[3 + i] for i in range(4)))
        # static rows are exactly invariant (they receive zero delta; the
        # guard also skips the quaternion renormalization so a static
        # body's rotation never drifts — mirrored in the XLA path)
        st = dict(
            st,
            x=_vwhere(stat_d, st["x"], x),
            q=_vwhere(stat_d, st["q"], q),
        )
    return st, lam_total


def _norm3(v):
    return jnp.sqrt(_vdot(v, v))


def _compute_angular_pl(q1, q2, ii1, ii2, n1, n2, theta):
    """computeAngularUpdate on planes (joints.py:141-154)."""
    lra1 = tuple(ii1[i] * n1[i] for i in range(3))
    lra2 = tuple(ii2[i] * n2[i] for i in range(3))
    w1 = _vdot(n1, lra1)
    w2 = _vdot(n2, lra2)
    denom = w1 + w2
    dl = -theta / jnp.where(denom == 0.0, 1.0, denom)
    dl = jnp.where(denom == 0.0, 0.0, dl)
    half = 0.5 * dl
    u1 = _qrot(q1, _vscale(lra1, half))
    u2 = _qrot(q2, _vscale(lra2, half))
    return u1, u2


def _apply_angular_pl(q1, q2, u1, u2):
    q1 = _qnormalize(_vadd4(q1, _pure_mul(u1, q1)))
    q2 = _qnormalize(_vsub4(q2, _pure_mul(u2, q2)))
    return q1, q2


def _orientation_constraint_pl(q1, q2, aq1, aq2, ii1, ii2):
    o1 = _qnormalize(_qmul(q1, aq1))
    o2 = _qnormalize(_qmul(q2, aq2))
    diff = _qmul(o1, _qinv(o2))
    delta_q = (2.0 * diff[1], 2.0 * diff[2], 2.0 * diff[3])
    mag = _norm3(delta_q)
    ok = mag > 0.0
    n = tuple(p / jnp.where(ok, mag, 1.0) for p in delta_q)
    n1 = _qrot(_qinv(q1), n)
    n2 = _qrot(_qinv(q2), n)
    u1, u2 = _compute_angular_pl(q1, q2, ii1, ii2, n1, n2, mag)
    nq1, nq2 = _apply_angular_pl(q1, q2, u1, u2)
    return _vwhere(ok, nq1, q1), _vwhere(ok, nq2, q2)


def _axis_constraint_pl(q1, q2, a1l, a2l, ii1, ii2):
    axis1 = _qrot(q1, a1l)
    axis2 = _qrot(q2, a2l)
    delta_q = _vcross(axis1, axis2)
    mag = _norm3(delta_q)
    ok = mag > 0.0
    n = tuple(p / jnp.where(ok, mag, 1.0) for p in delta_q)
    n1 = _qrot(_qinv(q1), n)
    n2 = _qrot(_qinv(q2), n)
    u1, u2 = _compute_angular_pl(q1, q2, ii1, ii2, n1, n2, mag)
    nq1, nq2 = _apply_angular_pl(q1, q2, u1, u2)
    return _vwhere(ok, nq1, q1), _vwhere(ok, nq2, q2)


def _joint_solve(st, pr, jmasks, jn, jprm, jstats):
    """solve_joints_jacobi on planes (joints.py:278-351)."""
    m1, m2 = jmasks
    jprm1, jprm2 = jprm
    js1, js2 = jstats
    ok = jn["ok"]
    okf = ok.astype(jnp.float32)
    stat_d = pr["static"]

    def side(mask, p, s):
        return dict(
            x=_vaddn(_gv(mask, st["x"]), None if s is None else s["x"]),
            q=_vaddn(_gv(mask, st["q"]), None if s is None else s["q"]),
            inv_m=p["inv_m"], inv_i=p["inv_i"],
        )

    b1 = side(m1, jprm1, js1)
    b2 = side(m2, jprm2, js2)
    x1, q1 = b1["x"], b1["q"]
    x2, q2 = b2["x"], b2["q"]
    ii1, ii2 = b1["inv_i"], b2["inv_i"]

    fq1, fq2 = _orientation_constraint_pl(
        q1, q2, jn["aq1"], jn["aq2"], ii1, ii2
    )
    r1w_f = _vadd(_qrot(fq1, jn["r1"]), x1)
    r2w_f = _vadd(_qrot(fq2, jn["r2"]), x2)
    delta_r = _vsub(r2w_f, r1w_f)
    axes_rot = _qnormalize(_qmul(fq1, jn["aq1"]))
    fwd = (0.0, 1.0, 0.0)
    right = (1.0, 0.0, 0.0)
    a1 = _qrot(axes_rot, fwd)
    b1_axis = _qrot(axes_rot, right)
    c1 = _vcross(a1, b1_axis)
    a_sep = _vdot(delta_r, a1)
    b_sep = _vdot(delta_r, b1_axis)
    c_sep = _vdot(delta_r, c1)
    fixed_corr = tuple(
        -(a_sep - jn["sep"]) * a1[i] - b_sep * b1_axis[i] - c_sep * c1[i]
        for i in range(3)
    )

    hq1, hq2 = _axis_constraint_pl(
        q1, q2, jn["a1l"], jn["a2l"], ii1, ii2
    )
    r1w_h = _vadd(_qrot(hq1, jn["r1"]), x1)
    r2w_h = _vadd(_qrot(hq2, jn["r2"]), x2)
    hinge_corr = _vsub(r1w_h, r2w_h)

    is_fixed = jn["is_fixed"]
    nq1 = _vwhere(is_fixed, fq1, hq1)
    nq2 = _vwhere(is_fixed, fq2, hq2)
    corr = _vwhere(is_fixed, fixed_corr, hinge_corr)

    mag = _norm3(corr)
    has_c = mag > 0.0
    n_dir = tuple(p / jnp.where(has_c, mag, 1.0) for p in corr)
    ux1, ux2, uq1, uq2, _lam = _apply_positional_pl(
        x1, x2, nq1, nq2, jn["r1"], jn["r2"], b1["inv_m"], b2["inv_m"],
        ii1, ii2, n_dir, mag,
    )
    ux1 = _vwhere(has_c, ux1, x1)
    ux2 = _vwhere(has_c, ux2, x2)
    uq1 = _vwhere(has_c, uq1, nq1)
    uq2 = _vwhere(has_c, uq2, nq2)

    d1 = _vsub(ux1, x1) + _vsub4(uq1, q1)             # 7 planes
    d2 = _vsub(ux2, x2) + _vsub4(uq2, q2)
    cnt = _scatter(m1, okf) + _scatter(m2, okf)
    cnt = jnp.maximum(cnt, 1.0)
    mean = tuple(
        (_scatter(m1, jnp.where(ok, d1[i], 0.0))
         + _scatter(m2, jnp.where(ok, d2[i], 0.0))) / cnt
        for i in range(7)
    )
    x = tuple(st["x"][i] + mean[i] for i in range(3))
    q = _qnormalize(tuple(st["q"][i] + mean[3 + i] for i in range(4)))
    return dict(
        st,
        x=_vwhere(stat_d, st["x"], x),
        q=_vwhere(stat_d, st["q"], q),
    )


def _set_velocities(st, pr, h):
    v = tuple((st["x"][i] - st["prev_x"][i]) / h for i in range(3))
    dq = _qmul(st["q"], _qinv(st["prev_q"]))
    same = (
        (st["q"][0] == st["prev_q"][0]) & (st["q"][1] == st["prev_q"][1])
        & (st["q"][2] == st["prev_q"][2]) & (st["q"][3] == st["prev_q"][3])
    )
    w = tuple((2.0 / h) * dq[1 + i] for i in range(3))
    w = _vwhere(dq[0] > 0.0, w, tuple(-p for p in w))
    w = _vwhere(same, tuple(jnp.zeros_like(p) for p in w), w)
    keep = pr["static"] | ~pr["active"]
    return dict(
        st,
        v=_vwhere(keep, st["v"], v),
        w=_vwhere(keep, st["w"], w),
    )


def _velocity_solve(st, pr, masks, con, pts, lam_n, h, restitution,
                    restitution_threshold, prm, subs, stats,
                    ref_live=None):
    """solve_velocities_jacobi on planes."""
    m_ref, m_alt = masks
    prm1, prm2 = prm
    sub1, sub2 = subs
    s1, s2 = stats
    nrm, avg, pen, ok = con["nrm"], con["avg"], con["pen"], con["ok"]
    okf = ok.astype(jnp.float32)
    c_all = m_ref.shape[0]
    if ref_live is None:
        ref_live = c_all

    def side(mask, p, sub, s, live):
        sv = None if s is None else s["v"]
        sw = None if s is None else s["w"]
        sq = None if s is None else s["q"]
        return dict(
            q=_vaddn(_gv_seg(mask, live, st["q"]), sq),
            v=_vaddn(_gv_seg(mask, live, st["v"]), sv),
            w=_vaddn(_gv_seg(mask, live, st["w"]), sw),
            psx=sub["psx"], psq=sub["psq"],
            psv=sub["psv"], psw=sub["psw"],
            inv_m=p["inv_m"], inv_i=p["inv_i"], mu_d=p["mu_d"],
        )

    b1 = side(m_ref, prm1, sub1, s1, ref_live)
    b2 = side(m_alt, prm2, sub2, s2, c_all)
    mu_d = 0.5 * (b1["mu_d"] + b2["mu_d"])

    r1, r2 = _local_contacts_pl(
        b1["psq"], b1["psx"], b2["psq"], b2["psx"], avg, pen, nrm
    )
    r1_pre = _qrot(b1["psq"], r1)
    r2_pre = _qrot(b2["psq"], r2)
    v_bar = _vsub(
        _vadd(b1["psv"], _vcross(b1["psw"], r1_pre)),
        _vadd(b2["psv"], _vcross(b2["psw"], r2_pre)),
    )
    vn_bar = _vdot(nrm, v_bar)

    v1, w1 = b1["v"], b1["w"]
    v2, w2 = b2["v"], b2["w"]
    q1, q2 = b1["q"], b2["q"]

    r1_world = _qrot(q1, r1)
    r2_world = _qrot(q2, r2)
    rt1 = _vcross(r1, _qrot(_qinv(q1), nrm))
    rt2 = _vcross(r2, _qrot(_qinv(q2), nrm))
    v_now = _vsub(
        _vadd(v1, _vcross(w1, r1_world)), _vadd(v2, _vcross(w2, r2_world))
    )
    vn = _vdot(nrm, v_now)
    e = jnp.where(
        jnp.abs(vn_bar) <= restitution_threshold, 0.0, restitution
    )
    rest_mag = jnp.minimum(-e * vn_bar, 0.0) - vn
    rr1 = tuple(b1["inv_i"][i] * rt1[i] for i in range(3))
    rr2 = tuple(b2["inv_i"][i] * rt2[i] for i in range(3))
    gw1 = _ginv_mass(rt1, rr1, b1["inv_m"])
    gw2 = _ginv_mass(rt2, rr2, b2["inv_m"])
    den_r = gw1 + gw2
    imp = jnp.where(
        ok & (den_r > 0),
        rest_mag / jnp.where(den_r > 0, den_r, 1.0), 0.0,
    )
    dv1 = _vscale(nrm, imp * b1["inv_m"])
    dv2 = tuple(-p for p in _vscale(nrm, imp * b2["inv_m"]))
    dw1 = _qrot(q1, _vscale(rr1, imp))
    dw2 = tuple(-p for p in _qrot(q2, _vscale(rr2, imp)))

    # dynamic friction per manifold point (4 static iterations)
    pt_pen = [pts[4 * i + 3] for i in range(4)]
    num = con["num"]
    live = [jnp.asarray(i, jnp.int32) < num for i in range(4)]
    pen_sum = sum(
        jnp.where(live[i], pt_pen[i], 0.0) for i in range(4)
    )
    has_pen = pen_sum > 0.0

    fdv1 = (0.0, 0.0, 0.0)
    fdv2 = (0.0, 0.0, 0.0)
    fdw1 = (0.0, 0.0, 0.0)
    fdw2 = (0.0, 0.0, 0.0)
    for i in range(4):
        cp = (pts[4 * i], pts[4 * i + 1], pts[4 * i + 2])
        pen_i = pt_pen[i]
        rr1_i, rr2_i = _local_contacts_pl(
            b1["psq"], b1["psx"], b2["psq"], b2["psx"], cp, pen_i, nrm
        )
        rw1 = _qrot(q1, rr1_i)
        rw2 = _qrot(q2, rr2_i)
        lam_pt = lam_n * (pen_i / jnp.where(has_pen, pen_sum, 1.0))

        v_rel = _vsub(
            _vadd(v1, _vcross(_vadd(w1, dw1), rw1)),
            _vadd(v2, _vcross(_vadd(w2, dw2), rw2)),
        )
        v_rel = _vadd(v_rel, _vsub(dv1, dv2))
        vn_f = _vdot(nrm, v_rel)
        vt = tuple(v_rel[k] - nrm[k] * vn_f for k in range(3))
        vt_len = jnp.sqrt(jnp.maximum(_vdot(vt, vt), 1e-30))
        has_t = vt_len > 1e-15
        t_dir = tuple(p / vt_len for p in vt)
        t_l1 = _qrot(_qinv(q1), t_dir)
        t_l2 = _qrot(_qinv(q2), t_dir)
        fta1 = _vcross(rr1_i, t_l1)
        fta2 = _vcross(rr2_i, t_l2)
        fra1 = tuple(b1["inv_i"][k] * fta1[k] for k in range(3))
        fra2 = tuple(b2["inv_i"][k] * fta2[k] for k in range(3))
        fw1 = _ginv_mass(fta1, fra1, b1["inv_m"])
        fw2 = _ginv_mass(fta2, fra2, b2["inv_m"])
        den_f = fw1 + fw2
        inv_scale = jnp.where(
            den_f > 0, 1.0 / jnp.where(den_f > 0, den_f, 1.0), 0.0
        )
        # deliberate double inv_scale (reference xpbd.cpp:834-842)
        dyn_mag = mu_d * jnp.abs(lam_pt) * inv_scale / h
        corrected = -jnp.minimum(dyn_mag, vt_len)
        f_imp = corrected * inv_scale
        f_imp = jnp.where(ok & live[i] & has_pen & has_t, f_imp, 0.0)
        fdv1 = _vadd(fdv1, _vscale(t_dir, f_imp * b1["inv_m"]))
        fdv2 = _vsub(fdv2, _vscale(t_dir, f_imp * b2["inv_m"]))
        fdw1 = _vadd(fdw1, _qrot(q1, _vscale(fra1, f_imp)))
        fdw2 = _vsub(fdw2, _qrot(q2, _vscale(fra2, f_imp)))

    d1 = _vadd(dv1, fdv1) + _vadd(dw1, fdw1)          # 6 planes
    d2 = _vadd(dv2, fdv2) + _vadd(dw2, fdw2)
    cnt = _scatter_seg(m_ref, ref_live, okf) + _scatter(m_alt, okf)
    cnt = jnp.maximum(cnt, 1.0)
    mean = tuple(
        (_scatter_seg(m_ref, ref_live, jnp.where(ok, d1[i], 0.0))
         + _scatter(m_alt, jnp.where(ok, d2[i], 0.0))) / cnt
        for i in range(6)
    )
    return dict(
        st,
        v=tuple(st["v"][i] + mean[i] for i in range(3)),
        w=tuple(st["w"][i] + mean[3 + i] for i in range(3)),
    )


# ------------------------------------------------------------------ kernel


def _substep_kernel(n_bodies, n_joints, substeps, iters, h, gravity,
                    restitution, restitution_threshold, loop, dyn_range,
                    ref_dyn_lanes, *refs):
    n = n_bodies
    if n_joints > 0:
        (state_ref, param_ref, ref_ref, alt_ref, con_ref, pts_ref,
         num_ref, je1_ref, je2_ref, jnt_ref, out_ref) = refs
    else:
        (state_ref, param_ref, ref_ref, alt_ref, con_ref, pts_ref,
         num_ref, out_ref) = refs
    sp = state_ref[:]                                # [STATE_F, N, TW]
    pp = param_ref[:]                                # [PARAM_F, N, TW]

    # ---- dynamic-row split (solver_dynamic_range): the solve state,
    # per-iteration gathers, and mean scatters cover only the rows that
    # can ever move; rows outside [d0, d1) are REQUIRED to be
    # RESPONSE_STATIC and contribute to contacts through contributions
    # computed ONCE (their state never changes — exact, since one-hot
    # gathers sum zeros except the matching row).
    d0, d1 = dyn_range if dyn_range is not None else (0, n)
    nd = d1 - d0
    split = nd < n

    dsl = lambda i: sp[i][d0:d1]
    st = dict(
        x=(dsl(0), dsl(1), dsl(2)),
        q=(dsl(3), dsl(4), dsl(5), dsl(6)),
        v=(dsl(7), dsl(8), dsl(9)),
        w=(dsl(10), dsl(11), dsl(12)),
    )
    psl = lambda i: pp[i][d0:d1]
    pr = dict(
        inv_m=psl(0), inv_i=(psl(1), psl(2), psl(3)),
        mu_s=psl(4), mu_d=psl(5),
        dynamic=psl(6) > 0.5, moving=psl(7) > 0.5, static=psl(8) > 0.5,
        ext_f=(psl(9), psl(10), psl(11)),
        ext_t=(psl(12), psl(13), psl(14)),
        active=psl(15) > 0.5,
        inv_m_raw=psl(16), inv_i_raw=(psl(17), psl(18), psl(19)),
    )

    rows_ref = ref_ref[:]
    rows_alt = alt_ref[:]
    iota_d = jax.lax.broadcasted_iota(jnp.int32, (1, nd, 1), 1)
    mk_dyn = lambda rows: (
        iota_d == (rows - d0)[:, None, :]
    ).astype(jnp.float32)
    m_ref = mk_dyn(rows_ref)
    m_alt = mk_dyn(rows_alt)
    masks = (m_ref, m_alt)

    # hoisted per-contact params: inv masses / friction never change
    # during the step, so gather them once over ALL rows (the sentinel
    # row n matches nothing and yields exact zeros — discarded via ok)
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)
    mk_full = lambda rows: (iota_n == rows[:, None, :]).astype(jnp.float32)
    full_ref = mk_full(rows_ref)
    full_alt = mk_full(rows_alt)

    def prm_side(mask):
        return dict(
            inv_m=_gather(mask, pp[0]),
            inv_i=_gv(mask, (pp[1], pp[2], pp[3])),
            mu_s=_gather(mask, pp[4]),
            mu_d=_gather(mask, pp[5]),
        )

    prm = (prm_side(full_ref), prm_side(full_alt))

    # static-row contributions: constant per kernel instance
    if split:
        def mk_stat(rows, full):
            out = ((rows < d0) | (rows >= d1)).astype(jnp.float32)
            return full * out[:, None, :]

        def stat_side(mask):
            return dict(
                x=_gv(mask, (sp[0], sp[1], sp[2])),
                q=_gv(mask, (sp[3], sp[4], sp[5], sp[6])),
                v=_gv(mask, (sp[7], sp[8], sp[9])),
                w=_gv(mask, (sp[10], sp[11], sp[12])),
            )

        stats = (
            stat_side(mk_stat(rows_ref, full_ref)),
            stat_side(mk_stat(rows_alt, full_alt)),
        )
    else:
        stats = (None, None)

    cp = con_ref[:]                                  # [CON_F, C, TW]
    num = num_ref[:]                                 # [C, TW] i32
    con = dict(
        nrm=(cp[0], cp[1], cp[2]),
        avg=(cp[3], cp[4], cp[5]),
        pen=cp[6],
        ok=cp[7] > 0.5,
        num=num,
    )
    ptsp = pts_ref[:]                                # [PTS_F, C, TW]
    pts = [ptsp[i] for i in range(PTS_F)]

    jmasks = jn = jprm = jstats = None
    if n_joints > 0:
        je1 = je1_ref[:]
        je2 = je2_ref[:]
        m_j1 = mk_dyn(je1)
        m_j2 = mk_dyn(je2)
        jmasks = (m_j1, m_j2)
        jf1 = mk_full(je1)
        jf2 = mk_full(je2)
        jprm = (prm_side(jf1), prm_side(jf2))
        if split:
            jstats = (
                stat_side(mk_stat(je1, jf1)),
                stat_side(mk_stat(je2, jf2)),
            )
        else:
            jstats = (None, None)
        jp = jnt_ref[:]                              # [JNT_F, J, TW]
        jn = dict(
            r1=(jp[0], jp[1], jp[2]), r2=(jp[3], jp[4], jp[5]),
            aq1=(jp[6], jp[7], jp[8], jp[9]),
            aq2=(jp[10], jp[11], jp[12], jp[13]),
            sep=jp[14],
            a1l=(jp[15], jp[16], jp[17]), a2l=(jp[18], jp[19], jp[20]),
            ok=jp[21] > 0.5, is_fixed=jp[22] > 0.5,
        )

    g = gravity

    # static-ref segment: lanes >= ref_dyn_lanes carry a guaranteed-
    # static ref row; under the split their dyn masks are structurally
    # zero, so the per-substep ref-side gathers/scatters shrink to the
    # live prefix (exact — see _gather_seg). Only sound with the split
    # (without it, a static row's pose must still be gathered).
    ref_live = (
        ref_dyn_lanes if (split and ref_dyn_lanes) else None
    )

    def substep_once(st):
        st = _integrate(st, pr, h, g)
        subs = (
            _side_sub(m_ref, st, stats[0], live=ref_live),
            _side_sub(m_alt, st, stats[1]),
        )
        st, lam_n = _position_solve(
            st, pr, masks, con, iters, prm, subs, stats,
            ref_live=ref_live,
        )
        if n_joints > 0:
            st = _joint_solve(st, pr, jmasks, jn, jprm, jstats)
        st = _set_velocities(st, pr, h)
        st = _velocity_solve(
            st, pr, masks, con, pts, lam_n, h, restitution,
            restitution_threshold, prm, subs, stats,
            ref_live=ref_live,
        )
        return st

    if loop and substeps > 1:
        # rolled substeps: same math/order as the unroll (bit parity),
        # ~substeps x smaller instruction stream + scratch liveness.
        # Pre-seed the solver-scratch keys so the carry pytree is
        # stable (the first _integrate overwrites them all).
        z1 = jnp.zeros_like(st["x"][0])
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
    if split:
        # reassemble full rows: static rows are exactly their inputs
        # (prev/presolve pose = the constant pose; presolve vel = 0,
        # integrate's moving guard)
        src = (
            [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12]   # x q v w
            + [0, 1, 2, 3, 4, 5, 6]                      # prev_x prev_q
            + [0, 1, 2, 3, 4, 5, 6]                      # psx psq
            + [None] * 6                                 # psv psw = 0
        )
        zfull = jnp.zeros_like(sp[0])
        full_planes = []
        for k, dp in enumerate(planes):
            s = sp[src[k]] if src[k] is not None else zfull
            # Mosaic rejects zero-size vector segments
            parts = [p for p in (s[:d0], dp, s[d1:]) if p.shape[0] > 0]
            full_planes.append(jnp.concatenate(parts, axis=0))
        planes = tuple(full_planes)
    out_ref[:] = jnp.stack(planes, axis=0)


def make_substep_solver(n_bodies, n_contacts, substeps, iters, h, gravity,
                        restitution, restitution_threshold,
                        n_joints: int = 0,
                        tile_w: int = 128, interpret: bool = False,
                        loop: bool = False,
                        vmem_limit_mb: int = 0,
                        dyn_range=None,
                        ref_dyn_lanes: int = 0):
    """Build the jitted whole-substep solver.

    fn(state_t [STATE_F,N,W], param_t [PARAM_F,N,W], ref_t [C,W] i32,
       alt_t [C,W] i32, con_t [CON_F,C,W], pts_t [PTS_F,C,W],
       num_t [C,W] i32[, je1_t [J,W] i32, je2_t [J,W] i32,
       jnt_t [JNT_F,J,W]]) -> out [OUT_F, N, W]

    dyn_range=(d0, d1): only rows in [d0, d1) can move; every row
    outside MUST be RESPONSE_STATIC in all worlds at all times (the
    env's contract — e.g. escape room walls). The solve then runs on
    the dynamic subset with one-time static contributions: exact, and
    ~(N/D)x cheaper on the dominant gather/scatter contractions.

    ref_dyn_lanes=K (>0, requires dyn_range): contact lanes >= K carry
    a GUARANTEED-static ref row (the env's contract — e.g. the
    hull-plane segment, whose ref is always the floor plane), so the
    per-substep ref-side gathers/scatters cover only the first K lanes.
    """
    if dyn_range is not None:
        d0, d1 = dyn_range
        if not (0 <= d0 < d1 <= n_bodies):
            raise ValueError(f"bad dyn_range {dyn_range} for N={n_bodies}")
        dyn_range = (int(d0), int(d1))
    kern = functools.partial(
        _substep_kernel, n_bodies, n_joints, substeps, iters, float(h),
        tuple(float(x) for x in gravity), float(restitution),
        float(restitution_threshold), loop, dyn_range,
        int(ref_dyn_lanes),
    )

    def run(state_t, param_t, ref_t, alt_t, con_t, pts_t, num_t,
            je1_t=None, je2_t=None, jnt_t=None):
        n = state_t.shape[1]
        w = state_t.shape[2]
        c = ref_t.shape[0]
        tw = min(tile_w, w)
        grid = (pl.cdiv(w, tw),)
        wspec = lambda lead: pl.BlockSpec(
            lead + (tw,), (lambda wi: (0,) * len(lead) + (wi,)),
            memory_space=pltpu.VMEM,
        )
        in_specs = [
            wspec((STATE_F, n)),
            wspec((PARAM_F, n)),
            wspec((c,)),
            wspec((c,)),
            wspec((CON_F, c)),
            wspec((PTS_F, c)),
            wspec((c,)),
        ]
        args = [state_t, param_t, ref_t, alt_t, con_t, pts_t, num_t]
        if n_joints > 0:
            j = je1_t.shape[0]
            in_specs += [wspec((j,)), wspec((j,)), wspec((JNT_F, j))]
            args += [je1_t, je2_t, jnt_t]
        extra = {}
        if vmem_limit_mb and not interpret:
            # the default scoped-VMEM budget is conservative; tiles
            # beyond 128 lanes need an explicit cap raise (bounded by
            # the physical ~16MB/core minus Mosaic's own scratch)
            extra["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
            )
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=in_specs,
            out_specs=wspec((OUT_F, n)),
            out_shape=jax.ShapeDtypeStruct((OUT_F, n, w), jnp.float32),
            interpret=interpret,
            **extra,
        )(*args)

    return run
