"""Physics-side ray queries against rigid bodies.

TPU-native equivalent of the broadphase BVH's ray trace
(``src/physics/broadphase.cpp:658-726`` ``BVH::traceRay`` +
``traceRayIntoLeaf/Plane`` — apps use it for grab rays and mouse
picking). The reference walks the per-world AABB tree and runs an exact
primitive test per leaf; here every (body, ray) lane runs the exact
test directly — body counts in the engine's regime (tens per world)
make a masked dense sweep cheaper than a divergent walk, the same
trade the batch raycaster makes (``render/raycast.py``).

Exact tests per primitive type:
- hull:   convex clip — the ray is moved to the body's scaled-local
  frame (t-parameterization preserved), then clipped against the
  UNSCALED local half-planes (``om.hull_planes``).
- sphere: analytic quadratic (world frame; uniform scale assumed for
  spheres, matching the narrowphase's sphere lanes).
- plane:  one half-plane clip against the body's rotated +z plane.

All f32, nearest hit wins, row -1 on miss.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import math3d as m3
from . import geo

BIG = 3.0e38


def aabb_overlap_bodies(body, om, q_lo, q_hi, active=None):
    """Bodies whose world AABB intersects each query AABB.

    The broadphase tree's overlap query (``broadphase.cpp:930-1027``
    ``findIntersectingEntry`` — apps use it for trigger volumes /
    region queries) as a dense masked test over (query, body) lanes.

    q_lo/q_hi: [W, Q, 3]. Returns mask [W, Q, N] bool (dead body rows
    are False).
    """
    from . import broadphase as bp

    act = body.active if active is None else active
    lo, hi = bp.world_aabbs(body, om, expansion_dt=0.0)    # [W, N, 3]
    sep = jnp.any(
        (q_hi[:, :, None, :] < lo[:, None, :, :])
        | (q_lo[:, :, None, :] > hi[:, None, :, :]),
        axis=-1,
    )                                                      # [W, Q, N]
    return ~sep & act[:, None, :]


def raycast_bodies(body, om, origins, dirs, t_max,
                   exclude_row=None, active=None):
    """Nearest body hit per ray.

    body: xpbd.BodyState ([W, N, ...]); origins/dirs: [W, R, 3] (dirs
    need not be unit — t is in units of |dir|); exclude_row: optional
    [W, R] i32 body row each ray ignores (-1 = none; the reference
    passes the grabbing agent's own entity); active: optional [W, N]
    bool overriding ``body.active``.

    Returns (t [W, R] f32 — t_max on miss, row [W, R] i32 — -1 on miss).
    """
    w, n = body.obj_id.shape
    r = origins.shape[1]
    act = body.active if active is None else active

    # per-body object tables via one-hot (tiny O, MXU-friendly)
    n_obj = om.prim_type.shape[0]
    oh = jax.nn.one_hot(body.obj_id, n_obj)               # [W, N, O]
    ptype = (
        jnp.einsum("wno,o->wn", oh, om.prim_type.astype(jnp.float32))
        + 0.5
    ).astype(jnp.int32)
    radius = jnp.einsum("wno,o->wn", oh, om.sphere_radius)
    planes = jnp.einsum(
        "wno,ofk->wnfk", oh, om.hull_planes,
        preferred_element_type=jnp.float32,
    )                                                     # [W, N, F, 4]
    fmask = jnp.einsum(
        "wno,of->wnf", oh, om.hull_faces_mask.astype(jnp.float32)
    ) > 0.5

    # rays into each body's scaled-local frame: [W, N, R, 3]
    inv_q = m3.quat_inv(body.rot)                          # [W, N, 4]
    s = jnp.maximum(body.scale, 1e-12)
    o_l = m3.quat_rotate(
        inv_q[:, :, None, :],
        origins[:, None, :, :] - body.pos[:, :, None, :],
    ) / s[:, :, None, :]
    d_l = m3.quat_rotate(inv_q[:, :, None, :], dirs[:, None, :, :]) / (
        s[:, :, None, :]
    )

    # ---- hull: clip [W, N, R] rays against [W, N, F] local half-planes
    nrm = planes[..., :3]                                  # [W, N, F, 3]
    dof = planes[..., 3]                                   # [W, N, F]
    denom = jnp.einsum("wnfk,wnrk->wnfr", nrm, d_l)        # [W, N, F, R]
    numer = dof[..., None] - jnp.einsum("wnfk,wnrk->wnfr", nrm, o_l)
    tf = numer / jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
    live_f = fmask[..., None]
    # denom > 0: exiting (upper bound); denom < 0: entering (lower);
    # |denom| ~ 0: parallel — miss if outside that half-plane
    lower = jnp.where(live_f & (denom < -1e-12), tf, jnp.float32(-BIG))
    upper = jnp.where(live_f & (denom > 1e-12), tf, jnp.float32(BIG))
    outside_par = live_f & (jnp.abs(denom) <= 1e-12) & (numer < 0.0)
    t_in = jnp.max(lower, axis=2)                          # [W, N, R]
    t_out = jnp.min(upper, axis=2)
    hull_ok = (
        (t_in <= t_out)
        & ~jnp.any(outside_par, axis=2)
        & (t_out > 1e-3)
    )
    # inside-the-hull rays hit the exit face (mesh-trace semantics,
    # matching render/raycast.trace_rays_obb)
    t_hull = jnp.where(t_in > 1e-3, t_in, t_out)
    t_hull = jnp.where(hull_ok & (t_hull > 1e-3), t_hull, BIG)

    # ---- sphere: analytic in world frame (uniform scale: use scale.x)
    rad_w = radius * body.scale[..., 0]                    # [W, N]
    oc = origins[:, None, :, :] - body.pos[:, :, None, :]  # [W, N, R, 3]
    dw = dirs[:, None, :, :]
    a = jnp.sum(dw * dw, axis=-1)
    b2 = jnp.sum(oc * dw, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - (rad_w**2)[..., None]
    disc = b2 * b2 - a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = (-b2 - sq) / jnp.maximum(a, 1e-12)
    t1 = (-b2 + sq) / jnp.maximum(a, 1e-12)
    t_sph = jnp.where(t0 > 1e-3, t0, t1)
    t_sph = jnp.where((disc >= 0.0) & (t_sph > 1e-3), t_sph, BIG)

    # ---- plane: the body's +z half-space boundary
    pn = m3.quat_rotate(body.rot, jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0], jnp.float32), body.pos.shape
    ))                                                     # [W, N, 3]
    dn = jnp.sum(dirs[:, None, :, :] * pn[:, :, None, :], axis=-1)
    on = jnp.sum(
        (origins[:, None, :, :] - body.pos[:, :, None, :])
        * pn[:, :, None, :], axis=-1,
    )
    t_pln = -on / jnp.where(jnp.abs(dn) > 1e-12, dn, 1e-12)
    t_pln = jnp.where(
        (jnp.abs(dn) > 1e-12) & (t_pln > 1e-3), t_pln, BIG
    )

    t_all = jnp.where(
        ptype[..., None] == geo.TYPE_HULL, t_hull,
        jnp.where(
            ptype[..., None] == geo.TYPE_SPHERE, t_sph,
            jnp.where(ptype[..., None] == geo.TYPE_PLANE, t_pln, BIG),
        ),
    )                                                      # [W, N, R]
    t_all = jnp.where(act[..., None], t_all, BIG)
    if exclude_row is not None:
        rows_n = jax.lax.broadcasted_iota(jnp.int32, (w, n, r), 1)
        t_all = jnp.where(
            rows_n == exclude_row[:, None, :], BIG, t_all
        )
    t_all = jnp.where(t_all < t_max, t_all, BIG)

    row = jnp.argmin(t_all, axis=1).astype(jnp.int32)      # [W, R]
    t_best = jnp.min(t_all, axis=1)
    miss = t_best >= BIG
    return (
        jnp.where(miss, jnp.float32(t_max), t_best),
        jnp.where(miss, -1, row),
    )
