"""Pallas TPU lidar kernel: N-ray OBB ring trace, VMEM-resident.

The XLA path (render/raycast.py::trace_rays_obb under a double vmap)
materializes ~[W, A, I, R, 3] f32 intermediates in HBM — ~30 MB per
elementwise stage at the escape-room design point (2048 worlds, 2
agents, 20 boxes, 30 rays), which made lidar ~0.45 ms/step of pure
bandwidth. Here the whole trace runs on one [R, TW]-plane working set
in VMEM: worlds ride lanes, rays ride sublanes, and the instance loop
is unrolled with per-instance scalars broadcast from [1, TW] planes.

Math parity: identical op sequence to trace_rays_obb (same slab test,
same guards); only FMA-contraction differences between the two
compilations separate them (~1 ulp; pinned to f32 tolerance by
tests/test_lidar_pallas.py).

Reference analogue: the lidarSystem of the example envs traces 30 rays
per agent against the scene BVH inside the megakernel
(`/root/reference/README.md:33-40` ecosystem envs; engine-side tracing
via broadphase::BVH::traceRay, src/physics/broadphase.cpp:608-700).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# inst plane layout: 0:3 pos | 3:7 rot | 7:10 half extents
INST_F = 10


def _qrot_inv(q, v):
    """rotate v by conj(q): v + 2*(w*(u x v) + u x (u x v)), u negated."""
    w, x, y, z = q[0], -q[1], -q[2], -q[3]
    u = (x, y, z)
    uv = (
        u[1] * v[2] - u[2] * v[1],
        u[2] * v[0] - u[0] * v[2],
        u[0] * v[1] - u[1] * v[0],
    )
    uuv = (
        u[1] * uv[2] - u[2] * uv[1],
        u[2] * uv[0] - u[0] * uv[2],
        u[0] * uv[1] - u[1] * uv[0],
    )
    return tuple(v[i] + 2.0 * (w * uv[i] + uuv[i]) for i in range(3))


def _lidar_kernel(n_inst, n_rays, n_agents, t_max, self_mask,
                  inst_ref, orig_ref, dir_ref, out_ref):
    per = n_rays // n_agents
    inst = inst_ref[:]                               # [INST_F, I, TW]
    og = orig_ref[:]                                 # [3, A, TW]
    dr = dir_ref[:]                                  # [3, R, TW]
    tw = dr.shape[-1]

    d = (dr[0], dr[1], dr[2])                        # [R, TW] planes
    best = jnp.full((n_rays, tw), t_max, jnp.float32)

    for i in range(n_inst):
        p = tuple(inst[c, i:i + 1] for c in range(3))        # [1, TW]
        q = tuple(inst[3 + c, i:i + 1] for c in range(4))
        half = tuple(
            jnp.maximum(inst[7 + c, i:i + 1], 1e-12) for c in range(3)
        )
        # per-agent origin transform (all rays of one agent share it)
        o_l_a = []
        for a in range(n_agents):
            oa = tuple(og[c, a:a + 1] - p[c] for c in range(3))
            ol = _qrot_inv(q, oa)
            o_l_a.append(tuple(ol[c] / half[c] for c in range(3)))
        o_l = tuple(
            jnp.concatenate(
                [jnp.broadcast_to(o_l_a[a][c], (per, tw))
                 for a in range(n_agents)], axis=0,
            )
            for c in range(3)
        )                                            # [R, TW] planes
        dl = _qrot_inv(q, d)
        d_l = tuple(dl[c] / half[c] for c in range(3))
        inv_d = tuple(
            jnp.where(jnp.abs(c_) > 1e-12, 1.0 / c_, 1e30) for c_ in d_l
        )
        t0 = tuple((-1.0 - o_l[c]) * inv_d[c] for c in range(3))
        t1 = tuple((1.0 - o_l[c]) * inv_d[c] for c in range(3))
        lo = jnp.maximum(
            jnp.minimum(t0[0], t1[0]),
            jnp.maximum(jnp.minimum(t0[1], t1[1]),
                        jnp.minimum(t0[2], t1[2])),
        )
        hi = jnp.minimum(
            jnp.maximum(t0[0], t1[0]),
            jnp.minimum(jnp.maximum(t0[1], t1[1]),
                        jnp.maximum(t0[2], t1[2])),
        )
        t = jnp.where(lo > 1e-3, lo, hi)   # inside-the-box -> exit face
        hit = (hi >= jnp.maximum(lo, 0.0)) & (t > 1e-3) & (t < t_max)
        # static per-(ray, instance) self-exclusion: rays of blocked
        # agents occupy contiguous sublane ranges, so the mask is iota
        # range tests (Pallas kernels cannot capture constant arrays)
        blocked = [a for a in range(n_agents) if not self_mask[a][i]]
        if blocked:
            r_iota = jax.lax.broadcasted_iota(jnp.int32, (n_rays, tw), 0)
            for a in blocked:
                hit = hit & ~(
                    (r_iota >= a * per) & (r_iota < (a + 1) * per)
                )
        best = jnp.minimum(best, jnp.where(hit, t, t_max))

    out_ref[:] = best


def make_lidar_obb(n_inst, n_rays, n_agents, t_max, self_mask,
                   tile_w: int = 128, interpret: bool = False):
    """Build the jitted lidar tracer.

    fn(inst_t [INST_F, I, W], orig_t [3, A, W], dir_t [3, R, W])
      -> depth [R, W] (t_max on miss)

    self_mask: static [A, I] bool — instance i visible to agent a's
    rays (the reference lidarSystem skips the caster entity).
    """
    assert n_rays % n_agents == 0
    kern = functools.partial(
        _lidar_kernel, n_inst, n_rays, n_agents, float(t_max),
        tuple(tuple(bool(x) for x in row) for row in np.asarray(self_mask)),
    )

    def run(inst_t, orig_t, dir_t):
        w = inst_t.shape[2]
        tw = min(tile_w, w)
        grid = (pl.cdiv(w, tw),)
        wspec = lambda lead: pl.BlockSpec(
            lead + (tw,), (lambda wi: (0,) * len(lead) + (wi,)),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                wspec((INST_F, n_inst)),
                wspec((3, n_agents)),
                wspec((3, n_rays)),
            ],
            out_specs=wspec((n_rays,)),
            out_shape=jax.ShapeDtypeStruct((n_rays, w), jnp.float32),
            interpret=interpret,
        )(inst_t, orig_t, dir_t)

    return run


def lidar_obb(inst_pos, inst_rot, inst_half, self_mask, origins, dirs,
              t_max, interpret=None):
    """Batched-world convenience wrapper matching the XLA lidar shapes.

    inst_pos/inst_rot/inst_half: [W, I, ...]; self_mask [A, I] static
    bool (numpy); origins [W, A, 3] (per-agent shared ray origin);
    dirs [W, A, R, 3]. Returns depth [W, A, R].
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    w, n_inst = inst_pos.shape[:2]
    n_agents, per = dirs.shape[1], dirs.shape[2]
    n_rays = n_agents * per

    inst_t = jnp.transpose(
        jnp.concatenate([inst_pos, inst_rot, inst_half], axis=-1),
        (2, 1, 0),
    )                                                # [INST_F, I, W]
    orig_t = jnp.transpose(origins, (2, 1, 0))       # [3, A, W]
    dir_t = jnp.transpose(
        dirs.reshape(w, n_rays, 3), (2, 1, 0)
    )                                                # [3, R, W]
    fn = make_lidar_obb(
        n_inst, n_rays, n_agents, t_max, self_mask,
        tile_w=min(128, w), interpret=interpret,
    )
    depth = fn(inst_t, orig_t, dir_t)                # [R, W]
    return jnp.transpose(depth, (1, 0)).reshape(w, n_agents, per)
