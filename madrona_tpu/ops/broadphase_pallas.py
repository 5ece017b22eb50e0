"""Pallas TPU kernel: all-pairs broadphase + typed candidate compaction.

The XLA all-pairs tier (physics/broadphase.py::find_candidates — the
TPU answer to the reference's per-world AABB tree walk,
``src/physics/broadphase.cpp:930-1027``) materializes [W, P, 3]-class
pair gathers, one-hot compaction matmuls, and W-major<->planar
transposes that cross fusion boundaries; profiling on v5e showed them
as ~0.4 ms of async-slice traffic per escape-room step at 2048 worlds.
This kernel computes the whole thing for a tile of worlds in VMEM and
emits the candidate buffers DIRECTLY in the planar [cap, W] layout the
narrowphase/solver kernels consume: the only HBM traffic is one packed
[BPF, N, W] body read and one [OUT_ROWS, W] candidate write.

Bit parity with find_candidates (checked exactly by the test suite, so
the whole physics step stays bit-identical across tiers):
  * world AABB = center/extent abs-rotation transform
    (utils/math3d.py::aabb_transform) + velocity expansion
    (broadphase.py::world_aabbs).
  * hit = overlap & both_live & ~both_static over the upper triangle.
  * pair ordered lower-prim-type-code first (the reference's swap,
    narrowphase.cpp:1752-1760); compaction rank is row-major over the
    triu enumeration — the same order as jnp.triu_indices.
  * buffers carry the row sentinel ``n`` past the used slots; counts
    clamp to cap; saturation reported (Candidates.overflow contract).

Layout: worlds on lanes, bodies on sublanes ([N, TW] planes); pair
quantities are [N, N, TW] with (i=leading, j=sublane). The per-type
rank is a sublane cumsum within each row i plus an exclusive prefix of
row totals over i — exactly the row-major flattened cumsum of the XLA
path. Scope: all-pairs scale (tens of bodies); the swept tier stays in
XLA for many-body worlds (its [N, N] grid would not fit VMEM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# input pack rows: 0:3 pos | 3:7 rot | 7:10 scale | 10:13 vel
#   | 13:16 local aabb lo | 16:19 local aabb hi | 19 prim_type
#   | 20 live | 21 static
BPF = 22

TYPE_NONE = 0.0
TYPE_SPHERE = 1.0
TYPE_HULL = 2.0
TYPE_PLANE = 4.0


def _world_aabb(bp, n, expansion_dt):
    """Planes [N, TW] -> (lo, hi) tuples of 3 planes. Mirrors
    world_aabbs + aabb_transform op-for-op (center/extent abs-rot)."""
    pos = (bp[0], bp[1], bp[2])
    q = (bp[3], bp[4], bp[5], bp[6])
    scale = (bp[7], bp[8], bp[9])
    vel = (bp[10], bp[11], bp[12])
    lo_l = (bp[13], bp[14], bp[15])
    hi_l = (bp[16], bp[17], bp[18])

    center = tuple((lo_l[i] + hi_l[i]) * 0.5 for i in range(3))
    extent = tuple((hi_l[i] - lo_l[i]) * 0.5 for i in range(3))
    center = tuple(center[i] * scale[i] for i in range(3))
    extent = tuple(extent[i] * jnp.abs(scale[i]) for i in range(3))

    # quat_to_mat3 rows (same expression order as math3d.quat_to_mat3)
    w, x, y, z = q
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = (
        (1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)),
        (2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)),
        (2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)),
    )
    nc = tuple(
        m[i][0] * center[0] + m[i][1] * center[1] + m[i][2] * center[2]
        + pos[i]
        for i in range(3)
    )
    ne = tuple(
        jnp.abs(m[i][0]) * extent[0] + jnp.abs(m[i][1]) * extent[1]
        + jnp.abs(m[i][2]) * extent[2]
        for i in range(3)
    )
    lo = tuple(nc[i] - ne[i] for i in range(3))
    hi = tuple(nc[i] + ne[i] for i in range(3))
    delta = tuple(vel[i] * expansion_dt for i in range(3))
    lo = tuple(lo[i] + jnp.minimum(delta[i], 0.0) for i in range(3))
    hi = tuple(hi[i] + jnp.maximum(delta[i], 0.0) for i in range(3))
    return lo, hi


def _cumsum(x, axis):
    """Inclusive prefix sum along ``axis`` via log-shift adds (Mosaic
    has no cumsum primitive; shifted zero-padded concatenates lower
    cleanly). Exact for the 0/1 counts used here."""
    n = x.shape[axis]
    s = 1
    while s < n:
        pad_shape = list(x.shape)
        pad_shape[axis] = s
        zeros = jnp.zeros(pad_shape, x.dtype)
        shifted = jnp.concatenate(
            [zeros, jax.lax.slice_in_dim(x, 0, n - s, axis=axis)],
            axis=axis,
        )
        x = x + shifted
        s *= 2
    return x


def _rank_rowmajor(hitf, n):
    """Row-major rank of each hit within its type: [N, N, TW] f32 0/1 ->
    (rank [N, N, TW], total [1, TW]). Rank = exclusive count of hits
    before (i, j) scanning i-major — identical to the flattened-triu
    cumsum of the XLA compact()."""
    row_cum = _cumsum(hitf, axis=1)                   # inclusive, per row
    # Mosaic layout rule (measured): the [N, TW] result of a 3D
    # sublane-axis reduce carries a replicated layout — elementwise /
    # slice / concat / broadcast-back consumers are fine, but it cannot
    # be sublane-REDUCED again. So row totals feed only elementwise ops
    # here, and grand totals reduce the LEADING axis first (_tot2d).
    row_tot = jnp.sum(hitf, axis=1)                   # [N, TW]
    shifted = jnp.concatenate(
        [jnp.zeros_like(row_tot[0:1]), row_tot[: n - 1]], axis=0
    )
    prefix = _cumsum(shifted, axis=0)                 # exclusive prefix
    rank = prefix[:, None, :] + row_cum - hitf
    # total = exclusive prefix at the last row + its row total (all
    # elementwise on [1, TW] slices)
    total = prefix[n - 1 : n] + row_tot[n - 1 : n]    # [1, TW]
    return rank, total


def _compact(hitf, rank, cap, n, vals):
    """Emit cap slots: for slot c, the value planes of the hit ranked c
    (sentinel n where no such hit). vals: tuple of [N, N, TW] planes.
    Returns list (per val) of lists of [1, TW] rows (len cap each)."""
    outs = [[] for _ in vals]
    sent = jnp.float32(n)

    def tot2d(x):                                     # [N, N, TW] -> [1, TW]
        # leading-axis reduce FIRST (packed layout), then the 2D
        # sublane reduce — see the layout rule in _rank_rowmajor
        return jnp.sum(jnp.sum(x, axis=0), axis=0, keepdims=True)

    for c in range(cap):
        sel = jnp.where(rank == jnp.float32(c), hitf, 0.0)
        got = tot2d(sel)                              # [1, TW] 0/1
        for k, v in enumerate(vals):
            vc = tot2d(sel * v)
            outs[k].append(jnp.where(got > 0.5, vc, sent))
    return outs


def _bp_kernel(n, sentinel, cap_hh, cap_hp, cap_sp, expansion_dt,
               bp_ref, out_ref):
    # n here is the SUBLANE-PADDED body count (multiple of 8): Mosaic's
    # f32 ADD reductions over the sublane axis need full tiles with
    # explicit zero contributions, which the live=0 pad rows provide.
    # ``sentinel`` is the real body count (the XLA tier's invalid-row
    # marker, preserved for bit parity).
    bp = bp_ref[:]                                    # [BPF, N, TW]
    tw = bp.shape[2]
    lo, hi = _world_aabb(bp, n, expansion_dt)
    ptype = bp[19]
    live = bp[20] > 0.5
    static = bp[21] > 0.5

    ai = lambda p: p[:, None, :]                      # [N, 1, TW]
    bj = lambda p: p[None, :, :]                      # [1, N, TW]

    ov = None
    for k in range(3):
        c = (ai(lo[k]) <= bj(hi[k])) & (bj(lo[k]) <= ai(hi[k]))
        ov = c if ov is None else (ov & c)
    pair_live = ai(live) & bj(live)
    both_static = ai(static) & bj(static)
    # Mosaic iota is integer-only; cast to f32 for the value planes
    iota_i = jax.lax.broadcasted_iota(jnp.int32, (n, n, tw), 0).astype(
        jnp.float32
    )
    iota_j = jax.lax.broadcasted_iota(jnp.int32, (n, n, tw), 1).astype(
        jnp.float32
    )
    triu = iota_i < iota_j
    hit = ov & pair_live & (~both_static) & triu

    ta = ai(ptype)
    tb = bj(ptype)
    swap = ta > tb
    first = jnp.where(swap, iota_j, iota_i)
    second = jnp.where(swap, iota_i, iota_j)
    t_lo = jnp.minimum(ta, tb)
    t_hi = jnp.maximum(ta, tb)
    kind2 = t_hi                                      # type of 'second'

    is_hh = hit & (t_lo == TYPE_HULL) & (t_hi == TYPE_HULL)
    is_hp = hit & (t_lo == TYPE_HULL) & (t_hi == TYPE_PLANE)
    is_sp = hit & (t_lo == TYPE_SPHERE) & (t_hi != TYPE_NONE)

    rows = []
    counts = []
    sat = jnp.zeros((1, tw), jnp.float32)
    for mask, cap, want_kind in (
        (is_hh, cap_hh, False), (is_hp, cap_hp, False), (is_sp, cap_sp, True),
    ):
        hitf = mask.astype(jnp.float32)
        rank, total = _rank_rowmajor(hitf, n)         # total [1, TW]
        vals = (first, second, kind2) if want_kind else (first, second)
        outs = _compact(hitf, rank, cap, sentinel, vals)
        if want_kind:
            # sentinel kind = TYPE_NONE past used slots (parity with
            # broadphase.py sp_kind where)
            outs[2] = [
                jnp.where(o < jnp.float32(sentinel), k2, TYPE_NONE)
                for o, k2 in zip(outs[1], outs[2])
            ]
        for o in outs:
            rows.extend(o)
        counts.append(jnp.minimum(total, jnp.float32(cap)))
        sat = jnp.maximum(
            sat, (total > jnp.float32(cap)).astype(jnp.float32)
        )

    rows.extend(counts)
    rows.append(sat)
    out_ref[:] = jnp.concatenate(rows, axis=0)        # [OUT_ROWS, TW]


def out_rows(cap_hh: int, cap_hp: int, cap_sp: int) -> int:
    return 2 * cap_hh + 2 * cap_hp + 3 * cap_sp + 4


def make_broadphase(n_bodies: int, cap_hh: int, cap_hp: int, cap_sp: int,
                    expansion_dt: float, tile_w: int = 128,
                    interpret: bool = False):
    """Build the jitted broadphase+compaction kernel.

    fn(bp_t [BPF, N, W] f32) -> out [OUT_ROWS, W] f32 with rows:
      [0:cap_hh]                hh first rows   (sentinel n)
      [cap_hh:2*cap_hh]         hh second rows
      ... hp first/second, sp first/second/kind ...
      [-4] hh_num | [-3] hp_num | [-2] sp_num | [-1] overflow flag
    """
    n = n_bodies
    # sublane-pad the body axis: f32 ADD reductions over a partial
    # sublane tile hit Mosaic relayout limits; dead pad rows (live=0,
    # appended by run()) contribute exact zeros instead
    n_pad = -(-n // 8) * 8
    rows_total = out_rows(cap_hh, cap_hp, cap_sp)
    kern = functools.partial(
        _bp_kernel, n_pad, n, cap_hh, cap_hp, cap_sp, float(expansion_dt)
    )

    def run(bp_t):
        w = bp_t.shape[2]
        if n_pad != n:
            pad = jnp.zeros((BPF, n_pad - n, w), bp_t.dtype)
            bp_t = jnp.concatenate([bp_t, pad], axis=1)
        tw = min(tile_w, w)
        grid = (pl.cdiv(w, tw),)
        wspec = lambda lead: pl.BlockSpec(
            lead + (tw,), (lambda wi: (0,) * len(lead) + (wi,)),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[wspec((BPF, n_pad))],
            out_specs=wspec((rows_total,)),
            out_shape=jax.ShapeDtypeStruct((rows_total, w), jnp.float32),
            interpret=interpret,
        )(bp_t)

    return run
