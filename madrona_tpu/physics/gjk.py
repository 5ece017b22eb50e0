"""GJK distance queries: signed-volume simplex solver + fixed-iteration loop.

TPU-native re-design of the reference's GJK (``src/physics/gjk.hpp``,
697 LoC — Montanari signed-volume sub-algorithm with the reference's
deviations: degenerate-determinant faces are re-tested, and the extra
"not in paper" face checks are kept). The control flow translation: all
sub-simplex cases are computed unconditionally and selected by masks
(branchless), and the outer loop runs a fixed iteration count under
``lax.fori_loop`` with a convergence mask — the vmappable equivalent of
the reference's early-exit while loop.

Used for: distance queries between convex hulls (the reference uses it
as the hull-hull deep-contact check) and point-to-hull queries
(hullClosestPointToOriginGJK). The SAT narrowphase does not need it, but
it is part of the engine's public geometry toolkit and the reference's
unit-test surface (tests/gjk.cpp).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

FLT_MAX = 3.0e38


def _len2(v):
    return jnp.sum(v * v, axis=-1)


def _compare_signs(a, b):
    return ((a > 0) & (b > 0)) | ((a < 0) & (b < 0))


def solve1(y0):
    return y0, _len2(y0), jnp.array([1.0, 0.0, 0.0, 0.0])


def solve2(y0, y1):
    """S1D (gjkSolve2Simplex, gjk.hpp:187-256). Returns (v, vLen2,
    lambdas in Y order [l_y0, l_y1, 0, 0])."""
    s1, s2 = y1, y0
    t = s2 - s1
    t_len2 = jnp.maximum(_len2(t), 1e-30)

    mus = s1 - s2                       # per-coordinate mu
    i_star = jnp.argmax(jnp.abs(mus))
    mu_max = mus[i_star]
    s1_i = s1[i_star]
    s2_i = s2[i_star]

    po_i = (jnp.dot(s2, t) / t_len2) * (s1_i - s2_i) + s2_i
    c1 = po_i - s2_i
    c2 = s1_i - po_i

    inside = _compare_signs(mu_max, c1) & _compare_signs(mu_max, c2)
    lambda2 = c2 / jnp.where(mu_max == 0, 1.0, mu_max)
    v_in = s1 + t * lambda2
    v = jnp.where(inside, v_in, s1)
    lams = jnp.where(
        inside,
        jnp.stack([lambda2, 1.0 - lambda2, 0.0, 0.0]),
        jnp.array([0.0, 1.0, 0.0, 0.0]),
    )
    return v, _len2(v), lams


def _tri_c(po, a, b):
    return (
        po[0] * a[1] + po[1] * b[0] + a[0] * b[1]
        - po[0] * b[1] - po[1] * a[0] - b[0] * a[1]
    )


def solve3(y0, y1, y2):
    """S2D (gjkSolve3Simplex, gjk.hpp:259-394)."""
    s1, s2, s3 = y2, y1, y0
    n = jnp.cross(s2 - s1, s3 - s1)
    n_len2 = jnp.maximum(_len2(n), 1e-30)
    po = jnp.dot(s1, n) * n / n_len2

    def minor(i, j):
        # 2D coordinates dropping axis k
        keep = [(1, 2), (0, 2), (0, 1)][i][j]
        return keep

    # cofactors eliminating each coordinate row
    def m_cof(drop):
        a, b = [(1, 2), (0, 2), (0, 1)][drop]
        return (
            s2[a] * s3[b] - s3[a] * s2[b]
            - s1[a] * s3[b] + s3[a] * s1[b]
            + s1[a] * s2[b] - s2[a] * s1[b]
        )

    m14, m24, m34 = m_cof(0), m_cof(1), m_cof(2)
    mabs = jnp.stack([jnp.abs(m14), jnp.abs(m24), jnp.abs(m34)])
    drop = jnp.argmax(mabs)
    mu_max = jnp.stack([m14, m24, m34])[drop]

    def proj2(p):
        planes = jnp.stack(
            [jnp.stack([p[1], p[2]]), jnp.stack([p[0], p[2]]),
             jnp.stack([p[0], p[1]])]
        )
        return planes[drop]

    s1_2, s2_2, s3_2, po_2 = proj2(s1), proj2(s2), proj2(s3), proj2(po)
    c1 = _tri_c(po_2, s2_2, s3_2)
    c2 = _tri_c(po_2, s3_2, s1_2)
    c3 = _tri_c(po_2, s1_2, s2_2)

    cs1 = _compare_signs(mu_max, c1)
    cs2 = _compare_signs(mu_max, c2)
    cs3 = _compare_signs(mu_max, c3)
    inside = cs1 & cs2 & cs3

    safe_mu = jnp.where(mu_max == 0, 1.0, mu_max)
    l2 = c2 / safe_mu
    l3 = c3 / safe_mu
    l1 = 1.0 - l2 - l3
    v_face = s1 * l1 + s2 * l2 + s3 * l3
    lam_face = jnp.stack([l3, l2, l1, 0.0])

    # sub-cases (tested when the corresponding sign check fails)
    v_a, d_a, lam_a = solve2(y0, y2)
    lam_a = jnp.stack([lam_a[0], 0.0, lam_a[1], 0.0])
    v_b, d_b, lam_b = solve2(y1, y2)
    lam_b = jnp.stack([0.0, lam_b[0], lam_b[1], 0.0])
    v_c, d_c, lam_c = solve2(y0, y1)

    d_a = jnp.where(cs2, FLT_MAX, d_a)
    d_b = jnp.where(cs3, FLT_MAX, d_b)
    d_c = jnp.where(cs1, FLT_MAX, d_c)
    ds = jnp.stack([d_a, d_b, d_c])
    vs = jnp.stack([v_a, v_b, v_c])
    lams = jnp.stack([lam_a, lam_b, lam_c])
    best = jnp.argmin(ds)

    v = jnp.where(inside, v_face, vs[best])
    d = jnp.where(inside, _len2(v_face), ds[best])
    lam = jnp.where(inside, lam_face, lams[best])
    return v, d, lam


def solve4(y0, y1, y2, y3):
    """S3D (gjkSolve4Simplex, gjk.hpp:396-540)."""
    s1, s2, s3, s4 = y3, y2, y1, y0

    det3 = lambda a, b, c: jnp.dot(a, jnp.cross(b, c))
    c41 = -det3(s2, s3, s4)
    c42 = det3(s1, s3, s4)
    c43 = -det3(s1, s2, s4)
    c44 = det3(s1, s2, s3)
    det_m = c41 + c42 + c43 + c44

    cs = [
        _compare_signs(det_m, c41), _compare_signs(det_m, c42),
        _compare_signs(det_m, c43), _compare_signs(det_m, c44),
    ]
    inside = cs[0] & cs[1] & cs[2] & cs[3]

    safe = jnp.where(det_m == 0, 1.0, det_m)
    l1 = c41 / safe
    l2 = c42 / safe
    l3 = c43 / safe
    l4 = 1.0 - l1 - l2 - l3
    v_in = s1 * l1 + s2 * l2 + s3 * l3 + s4 * l4
    lam_in = jnp.stack([l4, l3, l2, l1])

    v_a, d_a, lam_a = solve3(y0, y1, y3)
    lam_a = jnp.stack([lam_a[0], lam_a[1], 0.0, lam_a[2]])
    v_b, d_b, lam_b = solve3(y0, y2, y3)
    lam_b = jnp.stack([lam_b[0], 0.0, lam_b[1], lam_b[2]])
    v_c, d_c, lam_c = solve3(y1, y2, y3)
    lam_c = jnp.stack([0.0, lam_c[0], lam_c[1], lam_c[2]])
    v_d, d_d, lam_d = solve3(y0, y1, y2)

    d_a = jnp.where(cs[1], FLT_MAX, d_a)
    d_b = jnp.where(cs[2], FLT_MAX, d_b)
    d_c = jnp.where(cs[3], FLT_MAX, d_c)
    d_d = jnp.where(cs[0], FLT_MAX, d_d)
    ds = jnp.stack([d_a, d_b, d_c, d_d])
    vs = jnp.stack([v_a, v_b, v_c, v_d])
    lams = jnp.stack([lam_a, lam_b, lam_c, lam_d])
    best = jnp.argmin(ds)

    v = jnp.where(inside, v_in, vs[best])
    d = jnp.where(inside, _len2(v_in), ds[best])
    lam = jnp.where(inside, lam_in, lams[best])
    return v, d, lam


def _solve_simplex(ys, n_y):
    """Dispatch on live simplex size (branchless select over all four)."""
    v1, d1, l1 = solve1(ys[0])
    v2, d2, l2 = solve2(ys[0], ys[1])
    v3, d3, l3 = solve3(ys[0], ys[1], ys[2])
    v4, d4, l4 = solve4(ys[0], ys[1], ys[2], ys[3])
    vs = jnp.stack([v1, v2, v3, v4])
    ds = jnp.stack([d1, d2, d3, d4])
    ls = jnp.stack([l1, l2, l3, l4])
    i = jnp.clip(n_y - 1, 0, 3)
    return vs[i], ds[i], ls[i]


def gjk_distance(support_fn, init_v, max_iters: int = 24,
                 err_tolerance2: float = 1e-10):
    """Distance from the origin to a convex set given by ``support_fn``.

    support_fn(d) -> the set's support point maximizing dot(p, -d) (the
    reference convention: w = support in direction v toward the origin).
    Returns (dist2, v). Fixed-iteration loop with a convergence mask
    (the vmappable translation of GJK::computeDistance2, gjk.hpp:543+).
    """
    ys0 = jnp.zeros((4, 3))
    state = dict(
        v=init_v, ys=ys0, n_y=jnp.int32(0),
        v_len2=jnp.float32(FLT_MAX), done=jnp.bool_(False),
    )

    def body(_, st):
        w = support_fn(st["v"])
        # termination: v . w close enough to |v|^2 (no progress)
        v_len2 = _len2(st["v"])
        progress = v_len2 - jnp.dot(st["v"], w)
        converged = progress <= jnp.maximum(
            err_tolerance2, 1e-8 * v_len2
        )
        # insert w at the front (reference pushes then compacts)
        ys = jnp.concatenate([w[None], st["ys"][:3]], axis=0)
        n_y = jnp.minimum(st["n_y"] + 1, 4)
        v, d, lams = _solve_simplex(ys, n_y)
        # keep only contributing points (lambda > 0), compacted
        keep = (lams > 0.0) & (jnp.arange(4) < n_y)
        order = jnp.argsort(~keep)  # True(keep) first, stable
        ys_c = ys[order]
        lams_c = lams[order]
        n_keep = jnp.sum(keep.astype(jnp.int32))
        # enclosed origin: full simplex survives with v ~ 0
        enclosed = (n_keep == 4) | (d <= err_tolerance2)
        done = st["done"] | converged | enclosed
        upd = lambda new, old: jnp.where(st["done"], old, new)
        return dict(
            v=upd(v, st["v"]),
            ys=upd(ys_c, st["ys"]),
            n_y=upd(n_keep, st["n_y"]),
            v_len2=upd(jnp.where(enclosed, 0.0, d), st["v_len2"]),
            done=done,
        )

    st = jax.lax.fori_loop(0, max_iters, body, state)
    return st["v_len2"], st["v"]


def hull_support(verts, mask):
    """Support function for a vertex cloud: max dot along -v (reference
    convention; see gjk_distance)."""

    def fn(v):
        dots = jnp.sum(verts * (-v)[None, :], axis=-1)
        dots = jnp.where(mask, dots, -FLT_MAX)
        return verts[jnp.argmax(dots)]

    return fn


def hull_closest_point_to_origin(verts, mask, max_iters: int = 24):
    """hullClosestPointToOriginGJK equivalent: (dist2, closest point)."""
    start = verts[jnp.argmax(mask)]
    return gjk_distance(hull_support(verts, mask), start, max_iters)


def hull_hull_distance2(a_verts, a_mask, b_verts, b_mask,
                        max_iters: int = 24):
    """Squared distance between two convex vertex clouds (0 if
    intersecting) via GJK on the Minkowski difference A - B."""
    sa = hull_support(a_verts, a_mask)
    sb = hull_support(b_verts, b_mask)

    def support(v):
        return sa(v) - sb(-v)

    init = a_verts[jnp.argmax(a_mask)] - b_verts[jnp.argmax(b_mask)]
    d2, _ = gjk_distance(support, init, max_iters)
    return d2
