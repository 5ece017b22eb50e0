"""Pallas TPU raycast megakernel: the whole per-view render in VMEM.

TPU-native equivalent of the reference's persistent raycast megakernel
(``src/mw/device/bvh_raycast.cpp:940-1029`` — one resident CUDA kernel
that walks TLAS+BLAS per pixel and shades, materials/shadows included,
:776-925). A per-lane BVH walk is the wrong shape for the VPU (serial
trips, per-lane gathers measured ~100x slow), so the kernel re-derives
the math around three TPU facts:

1. **Pinhole factorization.** Every ray of a view shares its origin, so
   Möller–Trumbore collapses to per-triangle constant vectors
   (``render/raycast.py::_trace_rays_matmul`` derivation):

       det   = d · A      A = R_cᵀ (e2 × e1)
       u·det = d · B      B = R_cᵀ (e2 × (o - v0))
       v·det = d · C      C = R_cᵀ ((o - v0) × e1)
       t·det = s          s = e2 · ((o - v0) × e1)    (ray-independent)

   with the camera rotation R_c folded INTO A/B/C so ``d`` is the
   CONSTANT local pixel-direction grid shared by every (world, view).
   Each quantity is 3 broadcast-FMAs per (tri, ray) — no gathers, no
   traversal, no per-view ray tensors in HBM.

2. **Directional shadow factorization.** Shadow rays toward a
   directional light share their *direction*, so the same three
   quantities become affine in the primary hit distance t:

       X(r, t) = c_t + t_r · (P_t · d_r)

   i.e. one extra FMA each after reusing the primary mat-formulation.
   Occlusion = any triangle passing the sign-folded validity tests at
   t_s > eps (the eps replaces the reference's origin nudge along the
   normal — bvh_raycast.cpp:898-912; documented deviation bounded by
   tests/test_raycast_kernel.py).

3. **Separable texture fetch.** Bilinear atlas sampling is two one-hot
   contractions per tap — a row-slab matmul on the MXU, then a masked
   sublane-reduce column select — instead of per-ray gathers (XLA
   lowers those to ~60 ms per tap at 4M rays; measured, round 5). The
   final shade/sky compose also happens in-kernel, so the ONLY HBM
   traffic per (view, ray-tile) is the setup/attr blocks in and
   [PO, TR] rgb+depth planes out.

Layout (chosen by vreg accounting, round 5): compute planes are
[T tris (SUBLANES), R rays (LANES)] — per-RAY quantities then live as
[1, R] rows at R/128 vregs apiece (the first cut had rays on sublanes,
which made every per-ray op cost a full 64-vreg column; measured 2x
whole-kernel cost). Per-tri setup values broadcast from [T, 1] lane
columns, nearest-hit is a sublane-axis min, and the first-winner
one-hot feeds a [FA, T] @ [T, R] attribute fetch on the MXU. Grid =
(world·view, ray tiles); setup stays resident across a view's tiles.

``dtype``: jnp.bfloat16 halves the vreg footprint of the dominant
[T, R] planes (the envs' RenderConfig.dtype already opts into bf16 for
the XLA tracer — same ~1e-2 relative hit tolerance); float32 is the
golden/oracle mode.

Setup lane columns (PS = 24, f32):
  0:3  A      3:6  B      6:9  C      9  s
  10   cu'    11:14 Pu'   (shadow u numerator, sign(det_s)-folded)
  14   cv'    15:18 Pv'
  18   ct'    19:22 Pt'
  22   ad_s (|det_s|; 0 disables the row)
  23   eps*ad_s (precomputed shadow-t threshold)
Attr rows (FA = 16): lam_base, lam_shadow, base_r, base_g, base_b,
  tex_id (-1 = untextured), uv0x, uv0y, duv1x, duv1y, duv2x, duv2y,
  flat_r, flat_g, flat_b, pad.
Out planes (PO = 8): r, g, b, depth, occ, u, v, pad.
Dead triangles (pad / masked instances) carry all-zero setup rows:
det == 0 fails the |det| > eps test and t == 0 fails t > t_min, so no
extra masking is needed in-kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PS = 24        # setup planes
FA = 16        # attribute planes
PO = 8         # output planes

# output plane indices (shared with render/kernel.py)
O_R, O_G, O_B, O_T, O_OCC, O_U, O_V = 0, 1, 2, 3, 4, 5, 6

# attr plane indices
A_LAMB, A_LAMS = 0, 1
A_BR, A_BG, A_BB, A_TEX = 2, 3, 4, 5
A_UV0X, A_UV0Y, A_DU1X, A_DU1Y, A_DU2X, A_DU2Y = 6, 7, 8, 9, 10, 11
A_FR, A_FG, A_FB = 12, 13, 14


def _sample_atlas(atlas, tex_id, uvx, uvy, tex_size):
    """Bilinear GL_REPEAT fetch for [1, R] uv rows.

    atlas: [3*S, A*S] (rows = channel-block-major texel column c*S+x,
    cols = layer-major texel row a*S+y — transposed for the
    [3S, AS] @ [AS, R] slab matmul). Returns 3 [1, R] channels (1.0
    where tex_id < 0). Mirrors materials.py::sample_materials texel
    math exactly.
    """
    s = tex_size
    a_rows = atlas.shape[1]
    r = uvx.shape[1]
    frac = lambda z: z - jnp.floor(z)
    x = frac(uvx) * s - 0.5
    y = (1.0 - frac(uvy)) * s - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    wrap = lambda v: v - s * jnp.floor(v / s)
    base = jnp.maximum(tex_id, 0.0) * s
    rows = [wrap(y0) + base, wrap(y0 + 1.0) + base]     # [1, R] each
    cols = [wrap(x0), wrap(x0 + 1.0)]
    wts = [
        (1 - fx) * (1 - fy), fx * (1 - fy),
        (1 - fx) * fy, fx * fy,
    ]  # order: (y0,x0), (y0,x1), (y1,x0), (y1,x1)

    row_iota = jax.lax.broadcasted_iota(
        jnp.int32, (a_rows, r), 0
    ).astype(jnp.float32)
    col_iota = jax.lax.broadcasted_iota(
        jnp.int32, (s, r), 0
    ).astype(jnp.float32)
    out = [None, None, None]
    for yi, yrow in enumerate(rows):
        oh_y = (row_iota == yrow).astype(jnp.float32)   # [A*S, R]
        slab = jnp.dot(
            atlas, oh_y, preferred_element_type=jnp.float32
        )                                               # [3*S, R]
        for xi, xcol in enumerate(cols):
            w = wts[yi * 2 + xi]
            oh_x = (col_iota == xcol).astype(jnp.float32)  # [S, R]
            for c in range(3):
                v = jnp.sum(
                    oh_x * slab[c * s:(c + 1) * s, :], axis=0,
                    keepdims=True,
                )
                out[c] = v * w if out[c] is None else out[c] + v * w
    untex = tex_id < 0.0
    return tuple(jnp.where(untex, 1.0, out[c]) for c in range(3))


def _raycast_kernel(t_max, t_min, eps_det, shadows,
                    use_lights, use_materials, ambient, shadow_ambient,
                    sky, tex_size, dtype,
                    setup_ref, attrs_ref, dl_ref, atlas_ref, out_ref):
    su = setup_ref[0]                                  # [T, PS] f32
    col_t = lambda p: su[:, p:p + 1].astype(dtype)     # [T, 1]
    dl = dl_ref[:].astype(dtype)                       # [8, R]
    dlx, dly, dlz = dl[0:1, :], dl[1:2, :], dl[2:3, :]  # [1, R]

    # primary Möller–Trumbore, factorized: [T, R] broadcast FMAs
    det = col_t(0) * dlx + col_t(1) * dly + col_t(2) * dlz
    uu = col_t(3) * dlx + col_t(4) * dly + col_t(5) * dlz
    vv = col_t(6) * dlx + col_t(7) * dly + col_t(8) * dlz
    ad = jnp.abs(det)
    sd = jnp.sign(det)
    pu = uu * sd
    pv = vv * sd
    inv = jnp.where(ad > eps_det, 1.0 / det, 0.0)
    t = col_t(9) * inv
    hit = (
        (ad > eps_det) & (pu >= 0.0) & (pv >= 0.0) & (pu + pv <= ad)
        & (t > t_min) & (t < t_max)
    )
    t_hit = jnp.where(hit, t, dtype(t_max))
    t_best = jnp.min(t_hit, axis=0, keepdims=True)      # [1, R]

    # first-winner one-hot: lowest tri index among the min-t hits (ties
    # at shared mesh edges resolve like the XLA argmin tier).
    # Mosaic layout rule: the sublane-reduce results (t_best, win) are
    # REPLICATED — feed them through elementwise ARITHMETIC (subtract)
    # before comparing; a direct bool compare against a replicated
    # operand fails relayout ("replicated in destination but not in
    # source", hit round 5).
    idx = jax.lax.broadcasted_iota(jnp.int32, t_hit.shape, 0)
    is_min = hit & ((t_hit - t_best) <= 0.0)
    big = t_hit.shape[0] + 1
    win = jnp.min(jnp.where(is_min, idx, big), axis=0, keepdims=True)
    win_oh = is_min & ((idx - win) == 0)                # [T, R]
    ohf = win_oh.astype(dtype)

    # attribute fetch: [FA, T] @ [T, R] on the MXU
    fetched = jnp.dot(
        attrs_ref[0].astype(dtype), ohf,
        preferred_element_type=jnp.float32,
    )                                                   # [FA, R]
    frow = lambda k: fetched[k:k + 1, :]

    if use_materials:
        # winner barycentrics (sublane-masked sum; one lane survives)
        u_win = jnp.sum(
            jnp.where(win_oh, uu * inv, dtype(0.0)), axis=0,
            keepdims=True,
        ).astype(jnp.float32)
        v_win = jnp.sum(
            jnp.where(win_oh, vv * inv, dtype(0.0)), axis=0,
            keepdims=True,
        ).astype(jnp.float32)
    else:
        u_win = v_win = jnp.zeros(t_best.shape, jnp.float32)

    if shadows:
        # shadow quantities are affine in t_best (shared light
        # direction); setup columns are pre-folded by sign(det_s)
        m1 = col_t(11) * dlx + col_t(12) * dly + col_t(13) * dlz
        m2 = col_t(15) * dlx + col_t(16) * dly + col_t(17) * dlz
        m3 = col_t(19) * dlx + col_t(20) * dly + col_t(21) * dlz
        pu_s = col_t(10) + t_best * m1
        pv_s = col_t(14) + t_best * m2
        ts_s = col_t(18) + t_best * m3
        ads = col_t(22)
        s_hit = (
            (ads > eps_det) & (pu_s >= 0.0) & (pv_s >= 0.0)
            & (pu_s + pv_s <= ads) & (ts_s > col_t(23))
        )
        occ = jnp.max(
            s_hit.astype(dtype), axis=0, keepdims=True
        ).astype(jnp.float32)                           # [1, R]
    else:
        occ = jnp.zeros(t_best.shape, jnp.float32)

    t_best = t_best.astype(jnp.float32)
    hit_any = t_best < t_max

    # albedo: materials (base_color x texture) or flat tri colors
    if use_materials:
        uvx = frow(A_UV0X) + u_win * frow(A_DU1X) + v_win * frow(A_DU2X)
        uvy = frow(A_UV0Y) + u_win * frow(A_DU1Y) + v_win * frow(A_DU2Y)
        tr_, tg_, tb_ = _sample_atlas(
            atlas_ref[:], frow(A_TEX), uvx, uvy, tex_size
        )
        alb = (frow(A_BR) * tr_, frow(A_BG) * tg_, frow(A_BB) * tb_)
    else:
        alb = (frow(A_FR), frow(A_FG), frow(A_FB))

    lam_b = frow(A_LAMB)
    lam_s = frow(A_LAMS)
    occf = occ * hit_any.astype(jnp.float32)
    if use_lights:
        # reference multi-light compose (bvh_raycast.cpp:921-925):
        # shade = max(ambient floor, sum of light contributions), clamp
        contrib = lam_b + lam_s * (1.0 - occf)
        shade = jnp.maximum(ambient, contrib)
        rgb = tuple(jnp.clip(alb[c] * shade, 0.0, 1.0) for c in range(3))
    else:
        # fixed-light compose (render/raycast.py::_pick_shade /
        # blas.py single-light path): no clamp, |n.l| lambert
        scale = 1.0 - occf * (1.0 - shadow_ambient)
        shade = ambient + (1.0 - ambient) * lam_b * scale
        rgb = tuple(alb[c] * shade for c in range(3))
    rgb = tuple(
        jnp.where(hit_any, rgb[c], sky[c]) for c in range(3)
    )

    r = t_best.shape[1]
    pad = jnp.zeros((PO - 7, r), jnp.float32)
    out_ref[0] = jnp.concatenate(
        [rgb[0], rgb[1], rgb[2], t_best, occf, u_win, v_win, pad],
        axis=0,
    )                                                   # [PO, R]


def make_raytrace(
    n_tris: int,
    n_rays: int,
    t_max: float,
    *,
    shadows: bool = True,
    use_lights: bool = False,
    use_materials: bool = False,
    ambient: float = 0.35,
    shadow_ambient: float = 0.25,
    sky=(0.1, 0.2, 0.4),
    tex_size: int = 64,
    t_min: float = 1e-3,
    eps_det: float = None,
    dtype=jnp.float32,
    tile_r: int = 512,
    interpret: bool = False,
):
    """Build the jitted trace kernel.

    fn(setup [WV, T_pad, PS], attrs [WV, FA, T_pad], dl [8, R_pad],
       atlas [3*S, A*S]) -> out [WV, PO, R_pad] f32
    T_pad must be a multiple of 8 (sublane dim), R_pad a multiple of
    tile_r; callers pad with zero setup rows / arbitrary dl rows (pad
    rays produce garbage planes that the caller slices off).
    """
    t_pad = -(-n_tris // 8) * 8
    if eps_det is None:
        eps_det = 1e-9 if dtype == jnp.float32 else 1e-5
    kern = functools.partial(
        _raycast_kernel, float(t_max), float(t_min), float(eps_det),
        bool(shadows), bool(use_lights), bool(use_materials),
        float(ambient), float(shadow_ambient),
        tuple(float(c) for c in sky), int(tex_size), dtype,
    )

    def run(setup, attrs, dl, atlas):
        wv = setup.shape[0]
        r_pad = dl.shape[1]
        assert setup.shape == (wv, t_pad, PS), setup.shape
        assert attrs.shape == (wv, FA, t_pad), attrs.shape
        tr = min(tile_r, r_pad)
        a_rows, a_cols = atlas.shape
        grid = (wv, pl.cdiv(r_pad, tr))
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, t_pad, PS), lambda wi, ri: (wi, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, FA, t_pad), lambda wi, ri: (wi, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (8, tr), lambda wi, ri: (0, ri),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (a_rows, a_cols), lambda wi, ri: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, PO, tr), lambda wi, ri: (wi, 0, ri),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((wv, PO, r_pad), jnp.float32),
            interpret=interpret,
        )(setup, attrs, dl, atlas)

    return run
