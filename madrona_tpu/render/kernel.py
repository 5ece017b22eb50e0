"""Glue for the Pallas raycast megakernel (ops/raycast_pallas).

Builds the per-(world, view) triangle setup planes the kernel consumes
and reshapes its per-ray rgb/depth planes into the same contract as the
XLA tiers (``render/blas.py::trace_scene_blas`` /
``render/raycast.py::render_views``). Everything per-pixel — trace,
shadow occlusion, material/texture sampling, shade/sky compose —
happens inside the kernel (XLA-side gathers at 4M-ray scale measured
~60 ms per texture tap; round 5).

The reference analogue is the setup the persistent raycast kernel reads
(``src/mw/device/bvh_raycast.cpp:940-1029`` + the TLAS/BLAS tables it
walks); here the "acceleration structure" is the flat per-view triangle
list itself — for batch-sim scenes (tens of instances × tens of tris)
the whole scene fits VMEM, so the optimal TPU structure is no tree at
all. Meshes past ``MAX_FLAT_TRIS`` fall back to the BVH-walking tiers.

Eligibility (``kernel_eligible``): flat tri count within budget, lights
either absent or all-directional with at most one shadow-caster (the
kernel's factorized shadow pass needs a single shared light direction;
spotlights fall back to the XLA tier), and no per-view cull requested
(the cull tier composes in a later revision).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import math3d as m3
from ..ops import raycast_pallas as rpk


MAX_FLAT_TRIS = 2048
SHADOW_EPS = 2e-2


def _static_lights_info(lights, want_shadows):
    """Host-side light-table analysis. Returns (ok, shadow_idx) where
    shadow_idx is the single shadow-casting light slot or -1. Lights
    tables are concrete (built from static specs), so np.asarray is
    safe; a traced table returns ok=False (fall back to XLA tier)."""
    if lights is None:
        return True, -1
    try:
        spot = np.asarray(lights.is_spot)
        active = np.asarray(lights.active)
        cast = np.asarray(lights.cast_shadow)
    except Exception:
        return False, -1
    if (spot & active).any():
        return False, -1
    if not want_shadows:
        return True, -1
    sh = active & cast
    # shadow set must be the same slot across worlds, and at most one
    per_slot = sh.any(axis=0) if sh.ndim == 2 else sh
    idx = np.nonzero(per_slot)[0]
    if len(idx) > 1:
        return False, -1
    if len(idx) == 1 and sh.ndim == 2 and not (
        sh[:, idx[0]] == sh[0, idx[0]]
    ).all():
        return False, -1
    return True, int(idx[0]) if len(idx) else -1


def kernel_eligible(cfg, blas, lights, max_instances_per_view, n_inst):
    """Static gate for the megakernel tier. Resolved per trace;
    MADRONA_TPU_RENDER_KERNEL=0|1 forces (``auto`` default)."""
    import os

    knob = os.environ.get("MADRONA_TPU_RENDER_KERNEL",
                          getattr(cfg, "kernel", "auto"))
    if knob in ("0", "off"):
        return False
    # max_instances_per_view > 0 is fine: the kernel traces the FULL
    # instance set (strictly more exact than cull-then-trace) and the
    # caller reports the overlap count separately (view_overlap_counts)
    t_all = n_inst * blas.tri_v0.shape[1]
    if t_all > MAX_FLAT_TRIS and knob not in ("1", "force"):
        return False
    ok, _ = _static_lights_info(lights, bool(cfg.shadows))
    return ok


def _world_tris(blas, inst_pos, inst_rot, inst_scale, inst_obj):
    """Per-world world-space triangle planes, flattened over
    (instance, tri). Returns dict of [IT, ...] arrays (single world)."""
    o = blas.tri_v0.shape[0]
    oh = jax.nn.one_hot(inst_obj, o)                   # [I, O]
    pick = lambda tbl: jnp.einsum(
        "io,otk->itk", oh, tbl.reshape(o, tbl.shape[1], -1),
        preferred_element_type=jnp.float32,
    ).reshape((oh.shape[0],) + tbl.shape[1:])
    v0 = pick(blas.tri_v0)                             # [I, T, 3]
    e1 = pick(blas.tri_e1)
    e2 = pick(blas.tri_e2)
    col = pick(blas.tri_color)
    scale = jnp.maximum(inst_scale, 1e-12)[:, None, :]
    v0w = inst_pos[:, None, :] + m3.quat_rotate(
        inst_rot[:, None, :], v0 * scale
    )
    e1w = m3.quat_rotate(inst_rot[:, None, :], e1 * scale)
    e2w = m3.quat_rotate(inst_rot[:, None, :], e2 * scale)
    flat = lambda a: a.reshape((-1,) + a.shape[2:])
    out = dict(v0=flat(v0w), e1=flat(e1w), e2=flat(e2w), col=flat(col))
    if getattr(blas, "tri_uv", None) is not None:
        uv = pick(blas.tri_uv.reshape(o, blas.tri_uv.shape[1], 6))
        out["uv"] = flat(uv)                           # [IT, 6]
        mat = jnp.einsum(
            "io,ot->it", oh, blas.tri_mat.astype(jnp.float32)
        )
        out["mat"] = flat(mat[..., None])[:, 0]        # [IT]
    return out


def _view_setup(tris, view_mask_tri, cam_pos, cam_rot, shadow_dir,
                t_pad):
    """Setup planes for ONE (world, view): [PS, T_pad]."""
    v0, e1, e2 = tris["v0"], tris["e1"], tris["e2"]
    it = v0.shape[0]
    r = m3.quat_to_mat3(cam_rot)                       # [3, 3] world<-cam
    mask = view_mask_tri.astype(jnp.float32)[:, None]

    cdet = jnp.cross(e2, e1)
    tvec = cam_pos[None, :] - v0
    cu = jnp.cross(e2, tvec)
    cv = jnp.cross(tvec, e1)
    s = jnp.sum(e2 * cv, axis=-1, keepdims=True)
    a_r = (cdet @ r) * mask                            # A' = Rᵀ A (rows)
    b_r = (cu @ r) * mask
    c_r = (cv @ r) * mask
    s = s * mask

    rows = [a_r, b_r, c_r, s]                          # 10 planes
    if shadow_dir is not None:
        pvec = jnp.cross(
            jnp.broadcast_to(shadow_dir[None, :], e2.shape), e2
        )
        det_s = jnp.sum(e1 * pvec, axis=-1, keepdims=True)
        sds = jnp.sign(det_s)
        ads = jnp.abs(det_s) * mask
        qdir = jnp.cross(e1, jnp.broadcast_to(shadow_dir[None, :],
                                              e1.shape))
        n_t = jnp.cross(e1, e2)
        cu_s = jnp.sum(tvec * pvec, axis=-1, keepdims=True) * sds
        cv_s = jnp.sum(tvec * qdir, axis=-1, keepdims=True) * sds
        ct_s = jnp.sum(tvec * n_t, axis=-1, keepdims=True) * sds
        rows += [
            cu_s, (pvec * sds) @ r,
            cv_s, (qdir * sds) @ r,
            ct_s, (n_t * sds) @ r,
            ads, ads * SHADOW_EPS,
        ]                                              # +14 = 24
    else:
        rows += [jnp.zeros((it, 14), jnp.float32)]
    setup = jnp.concatenate(rows, axis=-1)             # [IT, PS]
    return jnp.pad(setup, ((0, t_pad - it), (0, 0)))   # [T_pad, PS]


def _tri_attrs(tris, lam_b, lam_s, materials, t_pad):
    """Per-tri attribute planes shared by all views of a world:
    [T_pad, FA]."""
    it = tris["v0"].shape[0]
    zero = jnp.zeros((it,), jnp.float32)
    if materials is not None and "uv" in tris:
        m_tab = materials.base_color.shape[0]
        m_id = jnp.clip(tris["mat"].astype(jnp.int32), 0, m_tab - 1)
        oh = jax.nn.one_hot(m_id, m_tab)
        base = jnp.einsum(
            "tm,mk->tk", oh, materials.base_color[:, :3],
            preferred_element_type=jnp.float32,
        )
        tex = jnp.einsum(
            "tm,m->t", oh, materials.tex_id.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        uv = tris["uv"]
        uv0 = uv[:, 0:2]
        du1 = uv[:, 2:4] - uv[:, 0:2]
        du2 = uv[:, 4:6] - uv[:, 0:2]
    else:
        base = jnp.zeros((it, 3), jnp.float32)
        tex = jnp.full((it,), -1.0)
        uv0 = jnp.zeros((it, 2), jnp.float32)
        du1 = du2 = uv0
    attrs = jnp.stack(
        [lam_b, lam_s,
         base[:, 0], base[:, 1], base[:, 2], tex,
         uv0[:, 0], uv0[:, 1], du1[:, 0], du1[:, 1], du2[:, 0],
         du2[:, 1],
         tris["col"][:, 0], tris["col"][:, 1], tris["col"][:, 2],
         zero],
        axis=-1,
    )                                                  # [IT, FA]
    return jnp.pad(attrs, ((0, t_pad - it), (0, 0))).T  # [FA, T_pad]


def _local_dir_grid(cfg):
    """The constant normalized pixel-direction grid [R_pad, 8] in
    raster order (mirrors raycast.camera_rays before rotation)."""
    h, w = cfg.height, cfg.width
    aspect = w / h
    half = float(np.tan(np.deg2rad(cfg.fov_deg) * 0.5))
    xs = (np.arange(w) + 0.5) / w * 2.0 - 1.0
    zs = 1.0 - (np.arange(h) + 0.5) / h * 2.0
    px = np.broadcast_to(xs[None, :], (h, w)) * half * aspect
    pz = np.broadcast_to(zs[:, None], (h, w)) * half
    d = np.stack(
        [px, np.ones_like(px), pz], axis=-1
    ).reshape(-1, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    r = d.shape[0]
    r_pad = -(-r // 128) * 128
    out = np.zeros((8, r_pad), np.float32)
    out[:3, :r] = d.T
    if r_pad > r:
        out[:3, r:] = d[0][:, None]                    # harmless pad rays
    return jnp.asarray(out), r


def _pack_atlas(materials):
    """[A, S, S, 3] -> [3*S, A*S]: rows = channel-block-major texel
    column (c*S + x), cols = layer-major texel row (a*S + y) — the
    kernel's separable-fetch layout."""
    if materials is None:
        return jnp.zeros((8, 128), jnp.float32), 8
    a = materials.atlas                                # [A, S(y), S(x), 3]
    s = a.shape[1]
    packed = jnp.transpose(a, (3, 2, 0, 1)).reshape(
        3 * s, a.shape[0] * s
    )
    return packed, s


def _light_rows(lights, n_hat, shadow_idx):
    """Per-tri lambert rows for one world: (lam_base, lam_shadow,
    shadow_dir|None). ``n_hat`` [IT, 3] world normals."""
    l = lights.capacity
    lam_b = jnp.zeros((n_hat.shape[0],), jnp.float32)
    lam_s = jnp.zeros_like(lam_b)
    shadow_dir = None
    for i in range(l):
        ldir = -lights.direction[i]                    # toward the light
        ndl = jnp.sum(n_hat * ldir[None, :], axis=-1)
        lam = jnp.clip(ndl, 0.0, 1.0) * lights.intensity[i]
        lam = jnp.where(lights.active[i], lam, 0.0)
        if i == shadow_idx:
            lam_s = lam_s + lam
            shadow_dir = ldir
        else:
            lam_b = lam_b + lam
    return lam_b, lam_s, shadow_dir


def render_views_kernel(
    cfg, blas, inst_pos, inst_rot, inst_scale, inst_obj, inst_mask,
    cam_pos, cam_rot, materials=None, lights=None, interpret=None,
):
    """Megakernel-tier analogue of render_views_blas (same contract:
    rgb [W, V, H, Wpx, 3], depth [W, V, H, Wpx]); ``inst_mask`` must
    already be [W, V, I]."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    w, i_n = inst_pos.shape[:2]
    n_views = cam_pos.shape[1]
    h, wd = cfg.height, cfg.width
    t_tab = blas.tri_v0.shape[1]
    it = i_n * t_tab
    t_pad = -(-it // 8) * 8

    use_lights = lights is not None
    use_materials = (materials is not None
                     and getattr(blas, "tri_uv", None) is not None)
    _, shadow_idx = _static_lights_info(lights, bool(cfg.shadows))
    fixed_light = jnp.asarray(
        -np.array(cfg.light_dir) / np.linalg.norm(cfg.light_dir),
        jnp.float32,
    )
    want_shadows = bool(cfg.shadows) and (
        (use_lights and shadow_idx >= 0) or not use_lights
    )

    dl, n_rays = _local_dir_grid(cfg)
    atlas, tex_size = _pack_atlas(materials if use_materials else None)

    def per_world(ip, ir, isc, io, ims, lt, cps, crs):
        tris = _world_tris(blas, ip, ir, isc, io)
        n_t = jnp.cross(tris["e1"], tris["e2"])
        n_hat = n_t / jnp.maximum(
            jnp.linalg.norm(n_t, axis=-1, keepdims=True), 1e-12
        )
        if use_lights:
            lam_b, lam_s, sdir = _light_rows(
                lt, n_hat, shadow_idx if want_shadows else -1
            )
            if not want_shadows:
                sdir = None
        else:
            lam_b = jnp.abs(jnp.sum(n_hat * fixed_light[None], axis=-1))
            lam_s = jnp.zeros_like(lam_b)
            sdir = fixed_light if want_shadows else None
        mask_t = jnp.repeat(ims, t_tab, axis=-1)       # [V, IT]
        attrs = _tri_attrs(
            tris, lam_b, lam_s, materials if use_materials else None,
            t_pad,
        )

        setup = jax.vmap(
            lambda vm, cp, cr: _view_setup(tris, vm, cp, cr, sdir, t_pad)
        )(mask_t, cps, crs)                            # [V, PS, T]
        return setup, jnp.broadcast_to(
            attrs[None], (n_views,) + attrs.shape
        )

    if lights is None:
        setup, attrs = jax.vmap(
            lambda ip, ir, isc, io, ims, cps, crs: per_world(
                ip, ir, isc, io, ims, None, cps, crs
            )
        )(inst_pos, inst_rot, inst_scale, inst_obj, inst_mask,
          cam_pos, cam_rot)
    else:
        setup, attrs = jax.vmap(per_world)(
            inst_pos, inst_rot, inst_scale, inst_obj, inst_mask,
            lights, cam_pos, cam_rot,
        )
    wv = w * n_views
    setup = setup.reshape(wv, t_pad, rpk.PS)
    attrs = attrs.reshape(wv, rpk.FA, t_pad)

    fn = make_trace_cached(
        it, n_rays, float(cfg.t_max), want_shadows, bool(use_lights),
        bool(use_materials), float(cfg.ambient),
        float(cfg.shadow_ambient), tuple(cfg.sky_color), int(tex_size),
        t_pad, int(dl.shape[1]), bool(interpret),
        # f32 compute: v5e Mosaic rejects bf16 comparisons ("Target
        # does not support this comparison") and bf16 mask layouts
        # ((16,128) i1) break the reduce-consumer relayouts, so the
        # bf16 plane-halving is not available on this target; the
        # dtype knob stays for future targets.
        "float32",
    )
    out = fn(setup, attrs, dl, atlas)                  # [WV, PO, R_pad]
    out = out[:, :, :n_rays].reshape(w, n_views, rpk.PO, h, wd)
    rgb = jnp.moveaxis(out[:, :, rpk.O_R:rpk.O_B + 1], 2, -1)
    depth = out[:, :, rpk.O_T]
    return rgb, depth


@functools.lru_cache(maxsize=32)
def make_trace_cached(n_tris, n_rays, t_max, shadows, use_lights,
                      use_materials, ambient, shadow_ambient, sky,
                      tex_size, t_pad, r_pad, interpret, dtype_str):
    # largest tile <= 2048 dividing the padded ray count: fewer grid
    # cells amortize per-cell overhead (measured 22.2 -> 18.9 ms at the
    # 64px/256-world design point); [T, 2048] plane sets still fit VMEM
    # at MAX_FLAT_TRIS-scale scenes
    tile_r = next(
        tr for tr in (2048, 1024, 512, 256, 128) if r_pad % tr == 0
    )
    dtype = jnp.bfloat16 if dtype_str == "bfloat16" else jnp.float32
    return rpk.make_raytrace(
        n_tris, n_rays, t_max, shadows=shadows, use_lights=use_lights,
        use_materials=use_materials, ambient=ambient,
        shadow_ambient=shadow_ambient, sky=sky, tex_size=tex_size,
        dtype=dtype, tile_r=tile_r, interpret=interpret,
    )


def view_overlap_counts(obj_lo, obj_hi, inst_pos, inst_rot, inst_scale,
                        inst_obj, inst_mask, cam_pos, cam_rot, cfg):
    """[W, V] per-view frustum overlap counts — the cull tier's
    overflow-signal contract (render/tlas.py::cull_view_topk), computed
    WITHOUT tracing a culled set: the megakernel traces the full
    instance list, so the count is purely informational (callers keep
    the adaptive-K maybe_grow_tlas machinery working unchanged)."""
    from .tlas import cull_view_topk, instance_world_aabbs

    h, w = cfg.height, cfg.width

    def per_world(ip, ir, isc, io, ims, cps, crs):
        lo, hi = instance_world_aabbs(obj_lo, obj_hi, ip, ir, isc, io)
        return jax.vmap(
            lambda im, cp, cr: cull_view_topk(
                lo, hi, im, cp, cr, 1, cfg.fov_deg, w / h, cfg.t_max
            )[2]
        )(ims, cps, crs)

    return jax.vmap(per_world)(
        inst_pos, inst_rot, inst_scale, inst_obj, inst_mask,
        cam_pos, cam_rot,
    )
