"""Joint constraints: Fixed + Hinge, solved inside the XPBD position pass.

TPU-native equivalent of the reference's joint system
(``include/madrona/physics.hpp:63-93`` JointConstraint,
``src/physics/xpbd.cpp:552-718`` applyJointOrientationConstraint /
applyJointAxisConstraint / handleJointConstraint, factories
``src/physics/physics.cpp:255-307`` makeFixedJoint / makeHingeJoint).

Design translation: the reference stores joints as rows of a dedicated
JointConstraint archetype and solves them serially after contacts in each
substep's solvePositions. Here joints live in a fixed-capacity per-world
buffer ``[W, J, ...]``; the solve is a ``lax.fori_loop`` over joint slots
with all worlds advancing in lockstep — identical per-world ordering
semantics, parallel across worlds. Bodies are referenced by row index in
the RigidBody table (rows are stable: this engine never WorldID-sorts).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..utils import math3d as m3
from .xpbd import (
    RESPONSE_STATIC,
    BodyState,
    _apply_positional_update,
    _gather_body,
    _pure,
    _scatter_pose,
)

JOINT_FIXED = 0
JOINT_HINGE = 1

# world axes (reference math.hpp:374-376: up=+z, fwd=+y, right=+x)
FWD = jnp.array([0.0, 1.0, 0.0], jnp.float32)
RIGHT = jnp.array([1.0, 0.0, 0.0], jnp.float32)
UP = jnp.array([0.0, 0.0, 1.0], jnp.float32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Joints:
    """Fixed-capacity per-world joint buffer: [W, J, ...] arrays."""

    e1: jax.Array          # [W, J] i32 body row (< 0 or >= N = inactive)
    e2: jax.Array          # [W, J] i32
    jtype: jax.Array       # [W, J] i32 (JOINT_FIXED / JOINT_HINGE)
    r1: jax.Array          # [W, J, 3] attach point, body-1 local frame
    r2: jax.Array          # [W, J, 3]
    # fixed-joint data
    attach_q1: jax.Array   # [W, J, 4]
    attach_q2: jax.Array   # [W, J, 4]
    separation: jax.Array  # [W, J]
    # hinge-joint data
    a1_local: jax.Array    # [W, J, 3] hinge axis, body-1 local
    a2_local: jax.Array    # [W, J, 3]
    active: jax.Array      # [W, J] bool

    @property
    def capacity(self) -> int:
        return self.e1.shape[1]


def empty_joints(num_worlds: int, cap: int) -> Joints:
    """An all-inactive joint buffer (the app scatters joints in at init)."""
    w, j = num_worlds, cap
    ident = jnp.zeros((w, j, 4), jnp.float32).at[..., 0].set(1.0)
    return Joints(
        e1=jnp.full((w, j), -1, jnp.int32),
        e2=jnp.full((w, j), -1, jnp.int32),
        jtype=jnp.zeros((w, j), jnp.int32),
        r1=jnp.zeros((w, j, 3), jnp.float32),
        r2=jnp.zeros((w, j, 3), jnp.float32),
        attach_q1=ident,
        attach_q2=ident,
        separation=jnp.zeros((w, j), jnp.float32),
        a1_local=jnp.zeros((w, j, 3), jnp.float32),
        a2_local=jnp.zeros((w, j, 3), jnp.float32),
        active=jnp.zeros((w, j), bool),
    )


def make_fixed_joint(
    joints: Joints, slot: int, e1, e2, attach_q1, attach_q2, r1, r2,
    separation=0.0, worlds=None,
) -> Joints:
    """Write a fixed joint into ``slot`` (reference makeFixedJoint,
    physics.cpp:255-279). Scalar/per-world args broadcast over worlds;
    ``worlds`` optionally masks which worlds get the joint."""
    return _set_slot(
        joints, slot, e1, e2, JOINT_FIXED,
        r1=r1, r2=r2, attach_q1=attach_q1, attach_q2=attach_q2,
        separation=separation, worlds=worlds,
    )


def make_hinge_joint(
    joints: Joints, slot: int, e1, e2, a1_local, a2_local, r1, r2,
    worlds=None,
) -> Joints:
    """Write a hinge joint into ``slot`` (reference makeHingeJoint,
    physics.cpp:281-307; b1/b2 axes are stored but unused by the solver,
    so they are dropped here)."""
    return _set_slot(
        joints, slot, e1, e2, JOINT_HINGE,
        r1=r1, r2=r2, a1_local=a1_local, a2_local=a2_local, worlds=worlds,
    )


def _set_slot(joints, slot, e1, e2, jtype, worlds=None, **fields):
    w = joints.e1.shape[0]

    def bc(val, like):
        val = jnp.asarray(val, like.dtype)
        return jnp.broadcast_to(val, (w,) + like.shape[2:])

    on = jnp.ones((w,), bool) if worlds is None else jnp.asarray(worlds, bool)
    upd = dict(
        e1=bc(e1, joints.e1), e2=bc(e2, joints.e2),
        jtype=bc(jtype, joints.jtype), active=on,
    )
    for k, v in fields.items():
        upd[k] = bc(v, getattr(joints, k))
    out = {}
    for f in dataclasses.fields(joints):
        cur = getattr(joints, f.name)
        if f.name in upd:
            sel = on.reshape((w,) + (1,) * (cur.ndim - 2))
            out[f.name] = cur.at[:, slot].set(
                jnp.where(sel, upd[f.name], cur[:, slot])
            )
        else:
            out[f.name] = cur
    return Joints(**out)


def _compute_angular_update(q1, q2, inv_i1, inv_i2, n1, n2, theta):
    """computeAngularUpdate (xpbd.cpp:289-312): returns the pure-quat
    updates to add/subtract."""
    lra1 = inv_i1 * n1
    lra2 = inv_i2 * n2
    w1 = jnp.sum(n1 * lra1, axis=-1)
    w2 = jnp.sum(n2 * lra2, axis=-1)
    denom = w1 + w2
    dl = -theta / jnp.where(denom == 0.0, 1.0, denom)
    dl = jnp.where(denom == 0.0, 0.0, dl)
    half = 0.5 * dl
    upd1 = _pure(m3.quat_rotate(q1, half[..., None] * lra1))
    upd2 = _pure(m3.quat_rotate(q2, half[..., None] * lra2))
    return upd1, upd2


def _apply_angular_update(q1, q2, upd1, upd2):
    q1 = m3.quat_normalize(q1 + m3.quat_mul(upd1, q1))
    q2 = m3.quat_normalize(q2 - m3.quat_mul(upd2, q2))
    return q1, q2


def _joint_orientation_constraint(q1, q2, aq1, aq2, inv_i1, inv_i2):
    """applyJointOrientationConstraint (xpbd.cpp:551-578)."""
    o1 = m3.quat_normalize(m3.quat_mul(q1, aq1))
    o2 = m3.quat_normalize(m3.quat_mul(q2, aq2))
    diff = m3.quat_mul(o1, m3.quat_inv(o2))
    delta_q = 2.0 * diff[..., 1:4]
    mag = jnp.linalg.norm(delta_q, axis=-1)
    ok = mag > 0.0
    n = delta_q / jnp.where(ok, mag, 1.0)[..., None]
    n1 = m3.quat_rotate(m3.quat_inv(q1), n)
    n2 = m3.quat_rotate(m3.quat_inv(q2), n)
    u1, u2 = _compute_angular_update(q1, q2, inv_i1, inv_i2, n1, n2, mag)
    nq1, nq2 = _apply_angular_update(q1, q2, u1, u2)
    q1 = jnp.where(ok[..., None], nq1, q1)
    q2 = jnp.where(ok[..., None], nq2, q2)
    return q1, q2


def _joint_axis_constraint(q1, q2, a1_local, a2_local, inv_i1, inv_i2):
    """applyJointAxisConstraint (xpbd.cpp:580-605)."""
    axis1 = m3.quat_rotate(q1, a1_local)
    axis2 = m3.quat_rotate(q2, a2_local)
    delta_q = jnp.cross(axis1, axis2)
    mag = jnp.linalg.norm(delta_q, axis=-1)
    ok = mag > 0.0
    n = delta_q / jnp.where(ok, mag, 1.0)[..., None]
    n1 = m3.quat_rotate(m3.quat_inv(q1), n)
    n2 = m3.quat_rotate(m3.quat_inv(q2), n)
    u1, u2 = _compute_angular_update(q1, q2, inv_i1, inv_i2, n1, n2, mag)
    nq1, nq2 = _apply_angular_update(q1, q2, u1, u2)
    q1 = jnp.where(ok[..., None], nq1, q1)
    q2 = jnp.where(ok[..., None], nq2, q2)
    return q1, q2


def solve_joints(body: BodyState, joints: Joints, om) -> BodyState:
    """Gauss-Seidel joint solve, slot order per world — the joint half of
    solvePositions (xpbd.cpp:727-736, handleJointConstraint :607-718)."""
    jcap = joints.capacity
    n = body.pos.shape[1]

    def step(j, body):
        e1 = joints.e1[:, j]
        e2 = joints.e2[:, j]
        ok = joints.active[:, j] & (e1 >= 0) & (e1 < n) & (e2 >= 0) & (e2 < n)
        jt = joints.jtype[:, j]
        r1 = joints.r1[:, j]
        r2 = joints.r2[:, j]

        b1 = _gather_body(body, om, e1)
        b2 = _gather_body(body, om, e2)
        x1, x2, q1, q2 = b1["x"], b2["x"], b1["q"], b2["q"]
        inv_m1, inv_m2 = b1["inv_m"], b2["inv_m"]
        inv_i1, inv_i2 = b1["inv_i"], b2["inv_i"]

        # --- Fixed branch
        fq1, fq2 = _joint_orientation_constraint(
            q1, q2, joints.attach_q1[:, j], joints.attach_q2[:, j],
            inv_i1, inv_i2,
        )
        r1w_f = m3.quat_rotate(fq1, r1) + x1
        r2w_f = m3.quat_rotate(fq2, r2) + x2
        delta_r = r2w_f - r1w_f
        axes_rot = m3.quat_normalize(m3.quat_mul(fq1, joints.attach_q1[:, j]))
        a1 = m3.quat_rotate(axes_rot, FWD)
        b1_axis = m3.quat_rotate(axes_rot, RIGHT)
        c1 = jnp.cross(a1, b1_axis)
        a_sep = jnp.sum(delta_r * a1, axis=-1)
        b_sep = jnp.sum(delta_r * b1_axis, axis=-1)
        c_sep = jnp.sum(delta_r * c1, axis=-1)
        fixed_corr = (
            -(a_sep - joints.separation[:, j])[..., None] * a1
            - b_sep[..., None] * b1_axis
            - c_sep[..., None] * c1
        )

        # --- Hinge branch
        hq1, hq2 = _joint_axis_constraint(
            q1, q2, joints.a1_local[:, j], joints.a2_local[:, j],
            inv_i1, inv_i2,
        )
        r1w_h = m3.quat_rotate(hq1, r1) + x1
        r2w_h = m3.quat_rotate(hq2, r2) + x2
        # Sign note: xpbd.cpp:694 writes `pos_correction = r2_world -
        # r1_world`, but applyPositionalUpdate applies -c to body 1
        # (xpbd.cpp:225-251), so that sign *increases* separation — the
        # fixed-joint branch (:673-687) negates its deltas for exactly this
        # reason. We use the converging sign (r1w - r2w), matching the
        # fixed branch and the XPBD paper.
        hinge_corr = r1w_h - r2w_h

        is_fixed = jt == JOINT_FIXED
        q1 = jnp.where(is_fixed[..., None], fq1, hq1)
        q2 = jnp.where(is_fixed[..., None], fq2, hq2)
        corr = jnp.where(is_fixed[..., None], fixed_corr, hinge_corr)

        mag = jnp.linalg.norm(corr, axis=-1)
        has_c = mag > 0.0
        n_dir = corr / jnp.where(has_c, mag, 1.0)[..., None]
        nx1, nx2, nq1, nq2, _ = _apply_positional_update(
            x1, x2, q1, q2, r1, r2, inv_m1, inv_m2, inv_i1, inv_i2,
            n_dir, mag, 0.0,
        )
        apply = has_c
        x1 = jnp.where(apply[..., None], nx1, x1)
        x2 = jnp.where(apply[..., None], nx2, x2)
        q1 = jnp.where(apply[..., None], nq1, q1)
        q2 = jnp.where(apply[..., None], nq2, q2)

        body = _scatter_pose(body, e1, x1, q1, ok)
        body = _scatter_pose(body, e2, x2, q2, ok)
        return body

    return jax.lax.fori_loop(0, jcap, step, body)


def solve_joints_jacobi(body: BodyState, joints: Joints, om,
                        params=None) -> BodyState:
    """Vectorized joint solve: all slots at once against a body snapshot,
    averaged scatter (same per-joint math as solve_joints; Jacobi
    application order — see xpbd.py solver-mode note)."""
    from .xpbd import pack_bodies, _gather_packed, _scatter_avg_packed

    n = body.pos.shape[1]
    e1, e2 = joints.e1, joints.e2                       # [W, J]
    ok = joints.active & (e1 >= 0) & (e1 < n) & (e2 >= 0) & (e2 < n)
    jtp = joints.jtype
    r1, r2 = joints.r1, joints.r2

    packed = pack_bodies(body, om, params)
    b1 = _gather_packed(packed, e1)
    b2 = _gather_packed(packed, e2)
    x1, x2, q1, q2 = b1["x"], b2["x"], b1["q"], b2["q"]
    inv_m1, inv_m2 = b1["inv_m"], b2["inv_m"]
    inv_i1, inv_i2 = b1["inv_i"], b2["inv_i"]

    fq1, fq2 = _joint_orientation_constraint(
        q1, q2, joints.attach_q1, joints.attach_q2, inv_i1, inv_i2
    )
    r1w_f = m3.quat_rotate(fq1, r1) + x1
    r2w_f = m3.quat_rotate(fq2, r2) + x2
    delta_r = r2w_f - r1w_f
    axes_rot = m3.quat_normalize(m3.quat_mul(fq1, joints.attach_q1))
    a1 = m3.quat_rotate(axes_rot, FWD)
    b1_axis = m3.quat_rotate(axes_rot, RIGHT)
    c1 = jnp.cross(a1, b1_axis)
    a_sep = jnp.sum(delta_r * a1, axis=-1)
    b_sep = jnp.sum(delta_r * b1_axis, axis=-1)
    c_sep = jnp.sum(delta_r * c1, axis=-1)
    fixed_corr = (
        -(a_sep - joints.separation)[..., None] * a1
        - b_sep[..., None] * b1_axis
        - c_sep[..., None] * c1
    )

    hq1, hq2 = _joint_axis_constraint(
        q1, q2, joints.a1_local, joints.a2_local, inv_i1, inv_i2
    )
    r1w_h = m3.quat_rotate(hq1, r1) + x1
    r2w_h = m3.quat_rotate(hq2, r2) + x2
    hinge_corr = r1w_h - r2w_h          # converging sign (see solve_joints)

    is_fixed = jtp == JOINT_FIXED
    nq1 = jnp.where(is_fixed[..., None], fq1, hq1)
    nq2 = jnp.where(is_fixed[..., None], fq2, hq2)
    corr = jnp.where(is_fixed[..., None], fixed_corr, hinge_corr)

    mag = jnp.linalg.norm(corr, axis=-1)
    has_c = mag > 0.0
    n_dir = corr / jnp.where(has_c, mag, 1.0)[..., None]
    ux1, ux2, uq1, uq2, _ = _apply_positional_update(
        x1, x2, nq1, nq2, r1, r2, inv_m1, inv_m2, inv_i1, inv_i2,
        n_dir, mag, 0.0,
    )
    sel = has_c[..., None]
    ux1 = jnp.where(sel, ux1, x1)
    ux2 = jnp.where(sel, ux2, x2)
    uq1 = jnp.where(sel, uq1, nq1)
    uq2 = jnp.where(sel, uq2, nq2)

    rows2 = jnp.concatenate([e1, e2], axis=1)
    ok2 = jnp.concatenate([ok, ok], axis=1)
    d1 = jnp.concatenate([ux1 - x1, uq1 - q1], axis=-1)
    d2 = jnp.concatenate([ux2 - x2, uq2 - q2], axis=-1)
    mean = _scatter_avg_packed(
        rows2, jnp.concatenate([d1, d2], axis=1), ok2, n
    )
    # static rows are exactly invariant (see solve_positions_jacobi)
    static = (body.response == RESPONSE_STATIC)[..., None]
    pos = jnp.where(static, body.pos, body.pos + mean[..., :3])
    rot = jnp.where(
        static, body.rot, m3.quat_normalize(body.rot + mean[..., 3:7])
    )
    return dataclasses.replace(body, pos=pos, rot=rot)
