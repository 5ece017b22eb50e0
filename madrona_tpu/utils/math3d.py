"""Batched 3D math: vectors, quaternions, AABBs.

TPU-native equivalent of the reference's hand-rolled SIMD math layer
(``include/madrona/math.hpp:1-385`` + ``math.inl``). Instead of scalar
``Vector3``/``Quat`` structs, every op here is a ``jnp`` function over
arrays whose last axis is the vector/quaternion dimension, so one call
covers ``[num_worlds, num_entities]`` batches and XLA maps it onto the VPU.

Conventions (identical to the reference):
  * vectors: shape ``[..., 3]``
  * quaternions: shape ``[..., 4]`` ordered ``(w, x, y, z)``
  * AABBs: pair of ``[..., 3]`` arrays ``(pMin, pMax)`` (kept as a tuple or
    stacked ``[..., 2, 3]`` via :func:`aabb_stack`)
"""

from __future__ import annotations

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Vectors


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def length2(v):
    return jnp.sum(v * v, axis=-1)


def length(v):
    return jnp.sqrt(length2(v))


def normalize(v, eps=0.0):
    """Unit vector; mirrors Vector3::normalize (rsqrt of squared length)."""
    l2 = length2(v)
    inv = jnp.where(l2 > eps, 1.0 / jnp.sqrt(jnp.maximum(l2, 1e-30)), 0.0)
    return v * inv[..., None]


def safe_normalize(v, fallback=None):
    l2 = length2(v)
    good = l2 > 1e-12
    inv = 1.0 / jnp.sqrt(jnp.where(good, l2, 1.0))
    out = v * inv[..., None]
    if fallback is None:
        fallback = jnp.zeros_like(v)
    return jnp.where(good[..., None], out, fallback)


def vec(x, y, z, dtype=jnp.float32):
    return jnp.array([x, y, z], dtype=dtype)


# ---------------------------------------------------------------------------
# Quaternions — (w, x, y, z), matching Quat{w,x,y,z} in the reference


def quat_identity(shape=(), dtype=jnp.float32):
    q = jnp.zeros(tuple(shape) + (4,), dtype)
    return q.at[..., 0].set(1.0)


def quat(w, x, y, z, dtype=jnp.float32):
    return jnp.array([w, x, y, z], dtype=dtype)


def quat_mul(a, b):
    """Hamilton product a*b (reference Quat::operator*)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_inv(q):
    """Inverse for unit quaternions = conjugate (reference Quat::inv)."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], q.dtype)


def quat_rotate(q, v):
    """Rotate vector(s) v by quaternion(s) q (reference Quat::rotateVec).

    Uses the standard 2-cross expansion: v + 2*w*(u x v) + 2*(u x (u x v)).
    """
    u = q[..., 1:4]
    w = q[..., 0:1]
    uv = jnp.cross(u, v)
    uuv = jnp.cross(u, uv)
    return v + 2.0 * (w * uv + uuv)


def quat_rotate_inv(q, v):
    return quat_rotate(quat_inv(q), v)


def quat_normalize(q):
    l2 = jnp.sum(q * q, axis=-1, keepdims=True)
    return q / jnp.sqrt(jnp.maximum(l2, 1e-30))


def quat_from_angular(omega, dt):
    """First-order quaternion delta from angular velocity over dt.

    Matches the XPBD integrator's update
    (reference src/physics/xpbd.cpp rotation integration):
      q' = normalize(q + 0.5*dt * (0,omega) * q)
    The caller composes: quat_normalize(q + dt*0.5*quat_mul(pure(omega), q)).
    """
    zero = jnp.zeros_like(omega[..., :1])
    return jnp.concatenate([zero, omega], axis=-1) * (0.5 * dt)


def quat_axis_angle(axis, angle):
    axis = normalize(jnp.asarray(axis, jnp.float32))
    half = jnp.asarray(angle, jnp.float32) / 2.0
    c = jnp.cos(half)
    s = jnp.sin(half)
    return jnp.concatenate(
        [jnp.broadcast_to(c, axis[..., :1].shape), axis * s[..., None]], axis=-1
    )


def quat_to_mat3(q):
    """3x3 rotation matrix, rows-last: shape [..., 3, 3]."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


# ---------------------------------------------------------------------------
# AABBs


def aabb_invalid(shape=(), dtype=jnp.float32):
    """(pMin=+inf, pMax=-inf) — identity for merge (AABB::invalid())."""
    big = jnp.finfo(dtype).max
    pmin = jnp.full(tuple(shape) + (3,), big, dtype)
    pmax = jnp.full(tuple(shape) + (3,), -big, dtype)
    return pmin, pmax


def aabb_merge(a, b):
    """Union of two AABBs (AABB::merge)."""
    return jnp.minimum(a[0], b[0]), jnp.maximum(a[1], b[1])


def aabb_expand(box, amount):
    return box[0] - amount, box[1] + amount


def aabb_contains(outer, inner):
    return jnp.all((outer[0] <= inner[0]) & (inner[1] <= outer[1]), axis=-1)


def aabb_overlaps(a, b):
    """Boolean overlap test (AABB::overlaps)."""
    return jnp.all((a[0] <= b[1]) & (b[0] <= a[1]), axis=-1)


def aabb_from_points(pts, mask=None):
    """AABB over a point set along axis -2; masked points are ignored."""
    if mask is not None:
        big = jnp.finfo(pts.dtype).max
        lo = jnp.where(mask[..., None], pts, big)
        hi = jnp.where(mask[..., None], pts, -big)
    else:
        lo = hi = pts
    return jnp.min(lo, axis=-2), jnp.max(hi, axis=-2)


def aabb_transform(box, pos, rot, scale=None):
    """Transform an AABB by (scale, rotation, translation).

    Equivalent to AABB::applyTRS in the reference: uses the
    center/extent absolute-rotation-matrix trick to avoid transforming all
    8 corners.
    """
    pmin, pmax = box
    center = (pmin + pmax) * 0.5
    extent = (pmax - pmin) * 0.5
    if scale is not None:
        center = center * scale
        extent = extent * jnp.abs(scale)
    m = quat_to_mat3(rot)
    new_center = jnp.einsum("...ij,...j->...i", m, center) + pos
    new_extent = jnp.einsum("...ij,...j->...i", jnp.abs(m), extent)
    return new_center - new_extent, new_center + new_extent


def aabb_ray_hit(box, origin, inv_dir, t_max):
    """Slab test; returns (hit, t_near). Vectorized over leading axes."""
    t0 = (box[0] - origin) * inv_dir
    t1 = (box[1] - origin) * inv_dir
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (tmin <= tmax) & (tmax >= 0.0) & (tmin <= t_max)
    return hit, jnp.maximum(tmin, 0.0)

def quat_yaw_only(yaw):
    """Quaternion for a pure rotation about +z (the envs' agent-heading
    convention)."""
    half = 0.5 * yaw
    z = jnp.zeros_like(yaw)
    return jnp.stack([jnp.cos(half), z, z, jnp.sin(half)], axis=-1)


def yaw_of_quat(q):
    """Heading angle of a yaw-only quaternion (2*atan2(z, w)); for
    general quaternions this is the twist about +z only when roll and
    pitch are zero — the envs constrain agents that way."""
    return 2.0 * jnp.arctan2(q[..., 3], q[..., 0])

