"""TGS-Soft solver: soft-constraint velocity-level alternative to XPBD.

Reference parity: ``src/physics/tgs.cpp`` (Solver::TGS,
setupTGSSolverTasks) — which in the reference snapshot is a registration
skeleton with stubbed solve passes (tgs.cpp:59-76), inspired by Erin
Catto's Solver2D solve_tgs_soft. This module implements the working
scheme: per substep, integrate velocities, solve contact impulses at the
velocity level with a soft Baumgarte bias (mass-spring-damper gains from
contact hertz/zeta), apply friction bounded by the accumulated normal
impulse, then integrate positions; a bias-free relax pass removes the
injected bias energy. Execution shape matches the Jacobi XPBD path: all
contacts in parallel, packed one-hot scatter (see xpbd.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..utils import math3d as m3
from . import xpbd as _x


@dataclasses.dataclass(frozen=True)
class TGSConfig:
    contact_hertz: float = 30.0
    contact_zeta: float = 10.0
    friction: bool = True


def _soft_params(hertz, zeta, h):
    """Solver2D soft-constraint coefficients (biasRate, massScale,
    impulseScale)."""
    omega = 2.0 * jnp.pi * hertz
    a1 = 2.0 * zeta + h * omega
    a2 = h * omega * a1
    a3 = 1.0 / (1.0 + a2)
    return omega / a1, a2 * a3, a3


def solve_contacts_velocity(
    body: _x.BodyState, contacts: _x.Contacts, om, h: float,
    cfg: TGSConfig, use_bias: bool,
):
    """One velocity-impulse pass over all contacts (Jacobi application).

    Returns (body, accumulated normal impulses [W, C])."""
    ref, alt = contacts.ref, contacts.alt
    num = contacts.num
    active = num > 0
    nrm = contacts.normal
    n = body.pos.shape[1]

    avg, max_pen, zero = _x._avg_contacts_batch(contacts.points, contacts.num)
    ok = active & (~zero)

    packed = _x.pack_bodies(body, om)
    b1 = _x._gather_packed(packed, ref)
    b2 = _x._gather_packed(packed, alt)

    r1 = avg - b1["x"]
    r2 = (avg - nrm * max_pen[..., None]) - b2["x"]

    v1, w1 = b1["v"], b1["w"]
    v2, w2 = b2["v"], b2["w"]

    # normal points ref(1) -> other(2): separating speed is the other
    # body's velocity along n relative to ref
    v_rel = (v2 + jnp.cross(w2, r2)) - (v1 + jnp.cross(w1, r1))
    vn = jnp.sum(nrm * v_rel, axis=-1)

    # effective mass along the normal
    rn1 = jnp.cross(r1, nrm)
    rn2 = jnp.cross(r2, nrm)
    k_n = (
        b1["inv_m"] + b2["inv_m"]
        + jnp.sum(rn1 * (b1["inv_i"] * rn1), axis=-1)
        + jnp.sum(rn2 * (b2["inv_i"] * rn2), axis=-1)
    )
    inv_k = jnp.where(k_n > 0, 1.0 / jnp.maximum(k_n, 1e-12), 0.0)

    bias_rate, mass_scale, imp_scale = _soft_params(
        cfg.contact_hertz, cfg.contact_zeta, h
    )
    sep = -max_pen  # negative when penetrating
    bias = jnp.where(use_bias, jnp.minimum(0.0, sep) * bias_rate, 0.0)
    scale = jnp.where(use_bias, mass_scale, 1.0)

    lam = -scale * inv_k * (vn + bias)
    lam = jnp.maximum(lam, 0.0)            # no pulling (no warm start)
    lam = jnp.where(ok, lam, 0.0)

    # push body 2 along +n, body 1 along -n
    dv1 = -nrm * (lam * b1["inv_m"])[..., None]
    dv2 = nrm * (lam * b2["inv_m"])[..., None]
    dw1 = -(b1["inv_i"] * jnp.cross(r1, nrm)) * lam[..., None]
    dw2 = (b2["inv_i"] * jnp.cross(r2, nrm)) * lam[..., None]

    if cfg.friction:
        mu = 0.5 * (b1["mu_d"] + b2["mu_d"])
        v_rel2 = (
            (v2 + dv2 + jnp.cross(w2 + dw2, r2))
            - (v1 + dv1 + jnp.cross(w1 + dw1, r1))
        )
        vt = v_rel2 - nrm * jnp.sum(nrm * v_rel2, axis=-1, keepdims=True)
        vt_len = jnp.sqrt(jnp.maximum(jnp.sum(vt * vt, axis=-1), 1e-30))
        t_dir = vt / vt_len[..., None]
        rt1 = jnp.cross(r1, t_dir)
        rt2 = jnp.cross(r2, t_dir)
        k_t = (
            b1["inv_m"] + b2["inv_m"]
            + jnp.sum(rt1 * (b1["inv_i"] * rt1), axis=-1)
            + jnp.sum(rt2 * (b2["inv_i"] * rt2), axis=-1)
        )
        lam_t = jnp.clip(
            vt_len / jnp.maximum(k_t, 1e-12), 0.0, mu * lam
        )
        lam_t = jnp.where(ok & (vt_len > 1e-10), lam_t, 0.0)
        # oppose body 2's tangential motion relative to body 1
        dv1 = dv1 + t_dir * (lam_t * b1["inv_m"])[..., None]
        dv2 = dv2 - t_dir * (lam_t * b2["inv_m"])[..., None]
        dw1 = dw1 + (b1["inv_i"] * rt1) * lam_t[..., None]
        dw2 = dw2 - (b2["inv_i"] * rt2) * lam_t[..., None]

    rows2 = jnp.concatenate([ref, alt], axis=1)
    ok2 = jnp.concatenate([ok, ok], axis=1)
    d1 = jnp.concatenate([dv1, dw1], axis=-1)
    d2 = jnp.concatenate([dv2, dw2], axis=-1)
    mean = _x._scatter_avg_packed(
        rows2, jnp.concatenate([d1, d2], axis=1), ok2, n
    )
    body = dataclasses.replace(
        body,
        vel=body.vel + mean[..., :3],
        omega=body.omega + mean[..., 3:6],
    )
    return body, lam


def integrate_velocities(body: _x.BodyState, om, h: float, gravity):
    """integrateVelocities (tgs.cpp:93-140): forces -> velocities only."""
    g = jnp.asarray(gravity, jnp.float32)
    params = om.obj_params(body.obj_id)
    from .bodies import RESPONSE_DYNAMIC, RESPONSE_STATIC

    dynamic = body.response == RESPONSE_DYNAMIC
    static = body.response == RESPONSE_STATIC
    moving = (~static) & body.active
    v = body.vel + jnp.where(dynamic[..., None], h * g[None, None, :], 0.0)
    v = v + h * params["inv_m"][..., None] * body.ext_force
    w = body.omega + h * params["inv_i"] * body.ext_torque
    return dataclasses.replace(
        body,
        vel=jnp.where(moving[..., None], v, body.vel),
        omega=jnp.where(moving[..., None], w, body.omega),
    )


def integrate_positions(body: _x.BodyState, h: float):
    from .bodies import RESPONSE_STATIC

    static = body.response == RESPONSE_STATIC
    moving = (~static) & body.active
    x = body.pos + h * body.vel
    half = 0.5 * h * body.omega
    dq = jnp.concatenate([jnp.zeros_like(half[..., :1]), half], axis=-1)
    q = m3.quat_normalize(body.rot + m3.quat_mul(dq, body.rot))
    return dataclasses.replace(
        body,
        pos=jnp.where(moving[..., None], x, body.pos),
        rot=jnp.where(moving[..., None], q, body.rot),
    )


def substep(body, contacts_fn, om, h, gravity, cfg: TGSConfig,
            jbuf=None):
    """One TGS substep: integrate vel -> biased solve -> integrate pos ->
    joint positional pass -> relax (bias-free) pass.

    ``jbuf``: optional joints view — TGS itself is velocity-level, so
    joints are enforced with the XPBD positional solve after position
    integration (the reference's TGS is partial and has no joint path;
    silently dropping registered joints made grabs a no-op under
    solver='tgs')."""
    body = integrate_velocities(body, om, h, gravity)
    contacts = contacts_fn(body)
    body, _ = solve_contacts_velocity(body, contacts, om, h, cfg, True)
    body = integrate_positions(body, h)
    if jbuf is not None:
        from . import joints as _joints

        body = _joints.solve_joints_jacobi(body, jbuf, om)
    body, _ = solve_contacts_velocity(body, contacts, om, h, cfg, False)
    return body
