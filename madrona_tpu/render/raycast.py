"""Batch raycaster: per-agent RGBD views of every world, pure JAX.

TPU-native equivalent of the reference's CUDA batch ray tracer
(``src/mw/device/bvh_raycast.cpp:940-1029`` persistent raycast kernel +
the LBVH TLAS build chain ``src/mw/device/bvh.cpp``). Design
translation (SURVEY.md §7): divergent BVH traversal is TPU-hostile, so
the tracer is a dense masked intersection sweep — every (world, view,
pixel) ray tests every live instance's padded triangle set
(Moller-Trumbore on scalar component planes), and the nearest hit wins
by masked min-reduction. For the engine's low-poly batch-sim scenes
(tens of instances x <=32 tris) this is a handful of fused VPU ops per
ray; large scenes would add an instance-AABB prefilter / LBVH tier.

Outputs match the reference's RGBD convention: float RGB in [0,1]
(lambert-shaded albedo) + linear depth, background = sky color with
depth = t_max.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import math3d as m3
from .mesh import MeshTables


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    width: int = 64
    height: int = 64
    fov_deg: float = 90.0
    t_max: float = 200.0
    sky_color: tuple = (0.1, 0.2, 0.4)
    light_dir: tuple = (0.3, -0.3, -0.9)   # directional light (world)
    ambient: float = 0.35
    # "bfloat16" halves the tracer's bandwidth (the [I, T, R] test
    # tensors dominate) at ~1% depth/uv error — plenty for small visual
    # observations; keep "float32" for golden tests / LOS queries.
    dtype: str = "float32"
    # "mt": elementwise Möller–Trumbore sweep (VPU). "matmul": the
    # pinhole factorization — per-(instance, tri) constant rows
    # contracted against ray directions, one [T·3, 3] @ [3, R] einsum
    # per instance, so the dominant FLOPs ride the MXU (bf16 in, f32
    # accum). Identical hits modulo fp order; env knob
    # MADRONA_TPU_TRACER overrides at trace time.
    tracer: str = "mt"
    # shadow rays (BLAS tier only): one occlusion trace toward the light
    # per primary hit (reference MADRONA_RT_SHADOWS,
    # bvh_raycast.cpp:898-912). Roughly doubles trace cost.
    shadows: bool = False
    shadow_ambient: float = 0.25   # light scale inside shadow
    # BLAS tier walker: "auto" picks the one-hot (MXU) walk for
    # small/medium tables on accelerators and the gather walk
    # otherwise; "onehot" / "gather" / "wide" force a tier.
    blas_walker: str = "auto"
    # BLAS tier: rays per sequential chunk within a view (bounds the
    # (instance, ray, stack) device working set — one 64x64 view over
    # a whole world batch allocates ~30 GB unchunked). 0 = auto: whole
    # view when <= 1024 rays, else 1024-ray chunks. Must divide h*w.
    ray_chunk: int = 0


def resolve_tracer(cfg: RenderConfig) -> str:
    """The dense-tier tracer variant for this trace: cfg.tracer, with
    the MADRONA_TPU_TRACER env var taking precedence (read at trace
    time — the bench/tuning knob). Single source of truth for
    render_views and render_views_tlas."""
    import os as _os

    return _os.environ.get("MADRONA_TPU_TRACER", cfg.tracer)


def camera_rays(cfg: RenderConfig, cam_pos, cam_rot):
    """Ray origins/dirs for one camera. cam_rot: world-from-camera quat;
    camera looks along +y (the engine's forward), x right, z up —
    matching the reference's view convention (render/ecs.hpp cameras
    face the entity's rotation)."""
    h, w = cfg.height, cfg.width
    aspect = w / h
    half = jnp.tan(jnp.deg2rad(cfg.fov_deg) * 0.5)
    xs = (jnp.arange(w) + 0.5) / w * 2.0 - 1.0        # [-1, 1]
    zs = 1.0 - (jnp.arange(h) + 0.5) / h * 2.0
    px = jnp.broadcast_to(xs[None, :], (h, w)) * half * aspect
    pz = jnp.broadcast_to(zs[:, None], (h, w)) * half
    d_local = jnp.stack(
        [px, jnp.ones_like(px), pz], axis=-1
    )  # [h, w, 3] (+y forward)
    d_world = m3.quat_rotate(cam_rot[None, None, :], d_local)
    d_world = d_world / jnp.linalg.norm(d_world, axis=-1, keepdims=True)
    o = jnp.broadcast_to(cam_pos[None, None, :], (h, w, 3))
    return o, d_world


def _trace_rays(cfg, mesh: MeshTables, inst_pos, inst_rot, inst_scale,
                inst_obj, inst_mask, origins, dirs):
    """Nearest-hit trace. origins/dirs: [R, 3] rays; instances: [I, ...].
    Returns (rgb [R, 3], depth [R])."""
    ctype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    # move rays into each instance's local frame (component planes)
    inv_q = m3.quat_inv(inst_rot)                     # [I, 4]
    o_l = m3.quat_rotate(
        inv_q[:, None, :], origins[None, :, :] - inst_pos[:, None, :]
    ) / jnp.maximum(inst_scale[:, None, :], 1e-12)     # [I, R, 3]
    d_l = m3.quat_rotate(inv_q[:, None, :], dirs[None, :, :]) / jnp.maximum(
        inst_scale[:, None, :], 1e-12
    )

    # gather per-instance triangle tables via one-hot (tiny O)
    oh = jax.nn.one_hot(inst_obj, mesh.tri_v0.shape[0])   # [I, O]
    pick = lambda tbl: jnp.einsum(
        "io,otk->itk", oh, tbl.reshape(tbl.shape[0], tbl.shape[1], -1),
        preferred_element_type=jnp.float32,
    ).reshape((oh.shape[0],) + tbl.shape[1:])
    v0 = pick(mesh.tri_v0).astype(ctype)              # [I, T, 3]
    e1 = pick(mesh.tri_e1).astype(ctype)
    e2 = pick(mesh.tri_e2).astype(ctype)
    col = pick(mesh.tri_color)
    tmask = jnp.einsum(
        "io,ot->it", oh, mesh.tri_mask.astype(jnp.float32)
    ) > 0.5

    # Moller-Trumbore, broadcast [I, T, R] on scalar planes
    def comp(a):  # [., ., 3] -> 3 planes with trailing R axis
        return a[..., 0:1], a[..., 1:2], a[..., 2:3]

    o_l = o_l.astype(ctype)
    d_l = d_l.astype(ctype)
    ox, oy, oz = (o_l[:, None, :, 0], o_l[:, None, :, 1], o_l[:, None, :, 2])
    dx, dy, dz = (d_l[:, None, :, 0], d_l[:, None, :, 1], d_l[:, None, :, 2])
    v0x, v0y, v0z = comp(v0)
    e1x, e1y, e1z = comp(e1)
    e2x, e2y, e2z = comp(e2)

    # p = d x e2   (explicit cross products; shapes broadcast to [I, T, R])
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    # q = t x e1
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det

    eps_det = 1e-9 if ctype == jnp.float32 else 1e-5
    hit = (
        (jnp.abs(det) > eps_det)
        & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > 1e-3) & (t < cfg.t_max)
        & tmask[..., None]
        & inst_mask[:, None, None]
    )
    t_hit = jnp.where(hit, t, ctype(cfg.t_max)).astype(jnp.float32)

    # shading inputs: geometric normal per (I, T)
    nx = (e1y * e2z - e1z * e2y)[..., 0]
    ny = (e1z * e2x - e1x * e2z)[..., 0]
    nz = (e1x * e2y - e1y * e2x)[..., 0]
    n_l = jnp.stack([nx, ny, nz], axis=-1)            # [I, T, 3]
    return _pick_shade(
        cfg, t_hit, n_l.astype(jnp.float32), col, inst_rot, inst_scale
    )


def _pick_shade(cfg, t_hit, n_l, col, inst_rot, inst_scale):
    """Winner selection + lambert shading shared by the tracer variants.

    t_hit [I, T, R] f32 (t_max where missed), n_l [I, T, 3] local-frame
    geometric normals, col [I, T, 3]. Returns (rgb [R, 3], depth [R]).
    """
    r = t_hit.shape[-1]
    t_flat = t_hit.reshape(-1, r)
    win = jnp.argmin(t_flat, axis=0)                  # [R]
    depth = jnp.min(t_flat, axis=0)
    oh_win = jax.nn.one_hot(win, t_flat.shape[0], dtype=jnp.float32)  # [R, IT]

    # normals back to world (rotate, undo scale direction-style)
    n_w = m3.quat_rotate(
        inst_rot[:, None, :],
        n_l / jnp.maximum(inst_scale[:, None, :], 1e-12),
    )
    n_w = n_w / jnp.maximum(
        jnp.linalg.norm(n_w, axis=-1, keepdims=True), 1e-12
    )
    light = -jnp.asarray(np.asarray(
        np.array(cfg.light_dir) / np.linalg.norm(cfg.light_dir)
    ), jnp.float32)
    lam = jnp.abs(jnp.sum(n_w * light, axis=-1))      # [I, T]
    shade = cfg.ambient + (1 - cfg.ambient) * lam
    rgb_it = col * shade[..., None]                   # [I, T, 3]
    rgb_flat = rgb_it.reshape(-1, 3)
    rgb = jnp.einsum(
        "rk,kc->rc", oh_win, rgb_flat, preferred_element_type=jnp.float32
    )
    sky = jnp.asarray(cfg.sky_color, jnp.float32)
    missed = depth >= cfg.t_max
    rgb = jnp.where(missed[:, None], sky[None, :], rgb)
    return rgb, depth


def _trace_rays_matmul(cfg, mesh: MeshTables, inst_pos, inst_rot,
                       inst_scale, inst_obj, inst_mask, origin, dirs):
    """Pinhole-factorized tracer: all rays share ``origin`` [3], so the
    Möller–Trumbore numerators become per-(instance, tri) CONSTANT
    vectors contracted against ray directions —

        det   = d · (e2 × e1)
        u·det = d · (e2 × (o_l - v0))
        v·det = d · ((o_l - v0) × e1)
        t·det = e2 · ((o_l - v0) × e1)        (ray-independent!)

    i.e. one ``[T*3, 3] @ [3, R]`` matmul per instance (batched einsum),
    which puts the dominant FLOPs on the MXU in bfloat16 instead of the
    VPU's f32 elementwise sweep. Hits match :func:`_trace_rays` modulo
    fp contraction order (tests/test_render.py pins equivalence).
    """
    ctype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    inv_q = m3.quat_inv(inst_rot)                     # [I, 4]
    scale = jnp.maximum(inst_scale, 1e-12)
    o_l = m3.quat_rotate(inv_q, origin[None, :] - inst_pos) / scale  # [I, 3]
    d_l = m3.quat_rotate(inv_q[:, None, :], dirs[None, :, :]) / (
        scale[:, None, :]
    )                                                 # [I, R, 3]

    oh = jax.nn.one_hot(inst_obj, mesh.tri_v0.shape[0])
    pick = lambda tbl: jnp.einsum(
        "io,otk->itk", oh, tbl.reshape(tbl.shape[0], tbl.shape[1], -1),
        preferred_element_type=jnp.float32,
    ).reshape((oh.shape[0],) + tbl.shape[1:])
    v0 = pick(mesh.tri_v0)                            # [I, T, 3]
    e1 = pick(mesh.tri_e1)
    e2 = pick(mesh.tri_e2)
    col = pick(mesh.tri_color)
    tmask = jnp.einsum(
        "io,ot->it", oh, mesh.tri_mask.astype(jnp.float32)
    ) > 0.5

    tvec = o_l[:, None, :] - v0                       # [I, T, 3]
    c_det = jnp.cross(e2, e1)
    c_u = jnp.cross(e2, tvec)
    c_v = jnp.cross(tvec, e1)
    t_num = jnp.sum(e2 * c_v, axis=-1)                # [I, T]
    coef = jnp.stack([c_det, c_u, c_v], axis=2)       # [I, T, 3, 3]

    # the MXU contraction: [I, T*3, 3] @ [I, 3, R]
    vals = jnp.einsum(
        "itck,irk->itcr", coef.astype(ctype), d_l.astype(ctype),
        preferred_element_type=jnp.float32,
    )                                                 # [I, T, 3, R]
    det = vals[:, :, 0]
    eps_det = 1e-9 if ctype == jnp.float32 else 1e-5
    inv_det = jnp.where(jnp.abs(det) > eps_det, 1.0 / det, 0.0)
    u = vals[:, :, 1] * inv_det
    v = vals[:, :, 2] * inv_det
    t = t_num[..., None] * inv_det

    hit = (
        (jnp.abs(det) > eps_det)
        & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > 1e-3) & (t < cfg.t_max)
        & tmask[..., None]
        & inst_mask[:, None, None]
    )
    t_hit = jnp.where(hit, t, cfg.t_max)
    n_l = jnp.cross(e1, e2)                           # = -c_det
    return _pick_shade(cfg, t_hit, n_l, col, inst_rot, inst_scale)


def trace_rays_obb(inst_pos, inst_rot, inst_half, inst_mask,
                   origins, dirs, t_max):
    """Nearest-hit distances against oriented boxes via the exact slab
    test — the lidar fast path (reference lidarSystem traces the scene
    BVH; the example envs' lidar targets are all boxes, so the 12-tri
    Möller–Trumbore sweep collapses to one slab test per (box, ray)).

    Semantics match tracing the box's triangle mesh: rays starting
    inside a box hit its exit face (t = slab max), otherwise the enter
    face (t = slab min); hits require t > 1e-3. All f32.

    inst_pos/inst_rot/inst_half: [I, ...] box centers / world-from-local
    quats / half extents; inst_mask [I]; origins/dirs [R, 3] (dirs need
    not be unit — t is in units of |dir|). Returns depth [R] (t_max on
    miss).
    """
    inv_q = m3.quat_inv(inst_rot)                               # [I, 4]
    half = jnp.maximum(inst_half, 1e-12)
    o_l = m3.quat_rotate(
        inv_q[:, None, :], origins[None, :, :] - inst_pos[:, None, :]
    ) / half[:, None, :]                                        # [I, R, 3]
    d_l = m3.quat_rotate(inv_q[:, None, :], dirs[None, :, :]) / (
        half[:, None, :]
    )
    inv_d = jnp.where(jnp.abs(d_l) > 1e-12, 1.0 / d_l, 1e30)
    t0 = (-1.0 - o_l) * inv_d
    t1 = (1.0 - o_l) * inv_d
    lo = jnp.max(jnp.minimum(t0, t1), axis=-1)                  # [I, R]
    hi = jnp.min(jnp.maximum(t0, t1), axis=-1)
    t = jnp.where(lo > 1e-3, lo, hi)        # inside-the-box -> exit face
    hit = (hi >= jnp.maximum(lo, 0.0)) & (t > 1e-3) & (t < t_max)
    hit = hit & inst_mask[:, None]
    depth = jnp.where(hit, t, jnp.float32(t_max))
    return jnp.min(depth, axis=0)


def render_views(cfg: RenderConfig, mesh: MeshTables, inst_pos, inst_rot,
                 inst_scale, inst_obj, inst_mask, cam_pos, cam_rot):
    """Render all camera views of all worlds.

    instances: [W, I, ...]; cameras: [W, V, ...]; inst_mask either
    [W, I] (shared across views) or [W, V, I] (per-view — e.g. each
    ego camera excluding its own body). Returns
    (rgb [W, V, H, Wpx, 3], depth [W, V, H, Wpx]).
    """
    h, w = cfg.height, cfg.width
    n_views = cam_pos.shape[1]
    tracer = resolve_tracer(cfg)
    if inst_mask.ndim == 2:
        inst_mask = jnp.broadcast_to(
            inst_mask[:, None, :],
            (inst_mask.shape[0], n_views, inst_mask.shape[1]),
        )

    from .kernel import kernel_eligible, render_views_kernel

    if kernel_eligible(cfg, mesh, None, 0, inst_pos.shape[1]):
        # Pallas raycast megakernel tier (ops/raycast_pallas): the
        # dense tracer's math in one VMEM-resident kernel; MeshTables'
        # padded tri tables serve as the flat geometry directly (pad
        # tris are degenerate -> never hit). Same (rgb, depth) contract.
        return render_views_kernel(
            cfg, mesh, inst_pos, inst_rot, inst_scale, inst_obj,
            inst_mask, cam_pos, cam_rot,
        )

    def per_cam(ip, ir, isc, io, im, cp, cr):
        o, d = camera_rays(cfg, cp, cr)
        if tracer == "matmul":
            # pinhole: every ray of this view shares origin cp
            rgb, dep = _trace_rays_matmul(
                cfg, mesh, ip, ir, isc, io, im, cp, d.reshape(-1, 3),
            )
        else:
            rgb, dep = _trace_rays(
                cfg, mesh, ip, ir, isc, io, im,
                o.reshape(-1, 3), d.reshape(-1, 3),
            )
        return rgb.reshape(h, w, 3), dep.reshape(h, w)

    per_world = jax.vmap(
        lambda ip, ir, isc, io, ims, cps, crs: jax.vmap(
            lambda im, cp, cr: per_cam(ip, ir, isc, io, im, cp, cr)
        )(ims, cps, crs)
    )
    return per_world(
        inst_pos, inst_rot, inst_scale, inst_obj, inst_mask,
        cam_pos, cam_rot,
    )
