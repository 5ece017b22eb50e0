"""Pallas lidar kernel vs the XLA slab-test path (trace_rays_obb).

The kernel replicates the slab test op-for-op; only FMA-contraction
differences between the two compilations separate them (~1 ulp), so
interpret mode must match the vmapped XLA path to float32 tolerance."""

import jax
import jax.numpy as jnp
import numpy as np

from madrona_tpu.ops.lidar_pallas import lidar_obb
from madrona_tpu.render.raycast import trace_rays_obb
from madrona_tpu.utils import math3d as m3

W, I, A, R = 4, 7, 2, 30
T_MAX = 50.0


def _scene(rs):
    pos = rs.uniform(-8, 8, (W, I, 3)).astype(np.float32)
    q = rs.randn(W, I, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    half = rs.uniform(0.2, 3.0, (W, I, 3)).astype(np.float32)
    a_pos = rs.uniform(-6, 6, (W, A, 3)).astype(np.float32)
    ang = rs.uniform(0, 2 * np.pi, (W, A, R)).astype(np.float32)
    dirs = np.stack(
        [-np.sin(ang), np.cos(ang), 0.1 * rs.randn(W, A, R)], axis=-1
    ).astype(np.float32)
    mask = np.ones((A, I), bool)
    mask[0, 2] = False
    mask[1, 5] = False
    return (
        jnp.asarray(pos), jnp.asarray(q), jnp.asarray(half),
        mask, jnp.asarray(a_pos), jnp.asarray(dirs),
    )


def test_lidar_kernel_matches_xla():
    rs = np.random.RandomState(11)
    pos, rot, half, mask, a_pos, dirs = _scene(rs)

    got = jax.jit(
        lambda p, r, h, o, d: lidar_obb(
            p, r, h, mask, o, d, T_MAX, interpret=True
        )
    )(pos, rot, half, a_pos, dirs)

    origins = jnp.broadcast_to(a_pos[:, :, None, :], (W, A, R, 3))
    maskj = jnp.asarray(mask)

    def per_world(ip, ir, ih, ow, dw):
        return jax.vmap(
            lambda m, o, d: trace_rays_obb(ip, ir, ih, m, o, d, T_MAX)
        )(maskj, ow, dw)

    ref = jax.jit(jax.vmap(per_world))(pos, rot, half, origins, dirs)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_lidar_kernel_inside_box_exit_face():
    """Ray starting inside a box reports the exit face (slab max)."""
    pos = jnp.zeros((1, 1, 3))
    rot = jnp.asarray([[[1.0, 0, 0, 0]]])
    half = jnp.asarray([[[2.0, 3.0, 1.0]]])
    mask = np.ones((1, 1), bool)
    a_pos = jnp.asarray([[[0.5, 0.0, 0.0]]])
    dirs = jnp.asarray([[[[1.0, 0.0, 0.0]]]])
    got = lidar_obb(pos, rot, half, mask, a_pos, dirs, T_MAX,
                    interpret=True)
    np.testing.assert_allclose(np.asarray(got)[0, 0, 0], 1.5, rtol=1e-6)
