"""Broadphase: velocity-expanded AABB overlap -> typed candidate buffers.

TPU-native equivalent of ``src/physics/broadphase.cpp`` (1,054 LoC). The
reference maintains a 4-wide AABB tree per world (rebuild/refit) and
walks it per leaf to emit ``CandidateCollision`` temporaries
(findIntersectingEntry, broadphase.cpp:930-1027). On TPU, with the
example-env body counts (tens per world), the all-pairs masked test is a
single fused VPU op over the upper-triangle enumeration and beats tree
traversal by a wide margin — SURVEY.md §7 explicitly calls for "masked
pairs first, LBVH later". For many-body worlds there is a sweep-and-prune
tier (``find_candidates_swept``, selected by ``PhysicsConfig.broadphase``)
— the analogue of the reference's tree walk; the renderer's LBVH lives in
render/tlas.py where instance counts are larger.

Parity notes:
  * AABBs are expanded by velocity (BVH::expandLeaf semantics,
    broadphase.cpp:487 — pre-expansion so one tree serves all substeps).
  * Candidate pairs are pre-sorted by primitive-type code so the
    narrowphase dispatch is static per buffer (the reference sorts a/b
    per pair at runtime, narrowphase.cpp:1752-1760).
  * Static|static pairs are skipped (the reference relies on its
    tree structure + response types; same effect).
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from ..utils import math3d as m3
from . import geo
from .bodies import RESPONSE_STATIC
from .xpbd import BodyState


@dataclasses.dataclass(frozen=True)
class CandidateCaps:
    """Fixed capacities for each narrowphase kernel's candidate buffer."""

    hull_hull: int = 32
    hull_plane: int = 16
    sphere_any: int = 16   # SS, SH, SP share the cheap kernel


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Candidates:
    """Per-world typed candidate row-index pairs; N = invalid sentinel.

    Layout convention per buffer: pair = (a_row, b_row) ordered so the
    lower primitive-type code comes first, matching the reference's swap
    (sphere < hull < plane)."""

    hh: jax.Array       # [W, CAP_HH, 2] i32
    hh_num: jax.Array   # [W]
    hp: jax.Array       # [W, CAP_HP, 2] i32 (hull, plane)
    hp_num: jax.Array
    sp: jax.Array       # [W, CAP_S, 2] i32 (sphere first)
    sp_num: jax.Array
    sp_kind: jax.Array  # [W, CAP_S] i32 — geo type of second prim
    # [W] bool: True where the tier may have MISSED pairs (swept tier's
    # window saturated). All-pairs never sets it. Mirrors the repo's
    # capacity-overflow signal convention (Executor.maybe_grow).
    overflow: jax.Array = None


def world_aabbs(body: BodyState, om, expansion_dt: float, params=None):
    """Per-body world AABB, expanded along velocity (updateLeafPositions +
    expandLeaf). Returns (lo [W,N,3], hi [W,N,3])."""
    params = params or om.obj_params(body.obj_id)
    lo_l = params["aabb_min"]
    hi_l = params["aabb_max"]
    lo, hi = m3.aabb_transform((lo_l, hi_l), body.pos, body.rot, body.scale)
    delta = body.vel * expansion_dt
    lo = lo + jnp.minimum(delta, 0.0)
    hi = hi + jnp.maximum(delta, 0.0)
    return lo, hi


def first_index_geq(pos_inc, targets):
    """Per-row first index i with ``pos_inc[:, i] >= target`` for each
    target — an unrolled binary search (XLA's searchsorted lowers to a
    serial while loop; measured 12+ ms/tier at pile scale). ``pos_inc``
    must be nondecreasing per row ([W, P]); ``targets`` is [cap].
    Returns indices clipped to P-1; callers verify the hit with a
    gather-compare. ceil(log2(P+1)) steps: the interval [0, P] holds
    P+1 candidate answers and must converge to width 0 (ceil(log2(P))
    is one short when P is a power of two — dropped the hit at index 1).
    """
    w_, p_len = pos_inc.shape
    cap = targets.shape[0]
    lo = jnp.zeros((w_, cap), jnp.int32)
    hi = jnp.full((w_, cap), p_len, jnp.int32)
    steps = max(1, int(np.ceil(np.log2(p_len + 1))))
    for _ in range(steps):
        mid = (lo + hi) >> 1
        vm = jnp.take_along_axis(
            pos_inc, jnp.minimum(mid, p_len - 1), axis=1
        )
        go_right = vm < targets[None]
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    return jnp.minimum(lo, p_len - 1)


def _typed_compact(
    first, second, hit, ptype, n: int, caps: CandidateCaps,
    overflow=None,
) -> Candidates:
    """Shared tail of both broadphase tiers: type each hit pair, order it
    (lower prim-type code first, the reference's swap), and compact into
    the three fixed-capacity buffers.

    first/second: [P] or [W, P] row indices; hit: [W, P] bool.
    """
    w = hit.shape[0]
    if first.ndim == 1:
        # static pair enumeration (all-pairs tier): constant-index
        # gathers lower to cheap slices on TPU — keep them, the dynamic
        # [W, P] gather below is measurably slower
        ta = ptype[:, first]
        tb = ptype[:, second]
        first = jnp.broadcast_to(first[None, :], hit.shape)
        second = jnp.broadcast_to(second[None, :], hit.shape)
    else:
        widx = jnp.arange(w)[:, None]
        ta = ptype[widx, jnp.clip(first, 0, n - 1)]
        tb = ptype[widx, jnp.clip(second, 0, n - 1)]
    # order pair so lower type code first (reference swap)
    swap = ta > tb
    first, second = (
        jnp.where(swap, second, first), jnp.where(swap, first, second)
    )
    t_first = jnp.minimum(ta, tb)
    t_second = jnp.maximum(ta, tb)

    pair_code = t_first | t_second   # NarrowphaseTest encoding
    is_hh = hit & (pair_code == (geo.TYPE_HULL | geo.TYPE_HULL))
    is_hp = hit & (pair_code == (geo.TYPE_HULL | geo.TYPE_PLANE))
    is_sphere = hit & (t_first == geo.TYPE_SPHERE) & (
        t_second != geo.TYPE_NONE
    )

    def compact(mask, cap):
        """Pack (first, second) of masked pairs into [W, cap, 2].

        Returns (buf, count, saturated [W] bool — True where more than
        ``cap`` pairs matched and the excess was DROPPED; callers must
        surface it through Candidates.overflow, the same contract as
        the swept window / Executor.maybe_grow re-tier signal).

        Small tiers compact via one-hot MXU matmul (a [W, P, cap]
        one-hot is cheap at all-pairs sizes and beats TPU scatter);
        past ~2^16 cells per world the one-hot dominates memory (the
        swept tier's P grows with window*n), so large tiers use the
        ECS's race-free masked scatter instead — identical output."""
        w_ = mask.shape[0]
        mi = mask.astype(jnp.int32)
        pos = jnp.cumsum(mi, axis=1) - mi
        total = jnp.sum(mi, axis=1)
        count = jnp.minimum(total, cap)
        saturated = total > cap
        pair = jnp.stack(
            [jnp.broadcast_to(first, mask.shape),
             jnp.broadcast_to(second, mask.shape)], axis=-1
        )                                                   # [W, P, 2]
        if mask.shape[1] * cap <= 1 << 16:
            dest = jnp.where(mask & (pos < cap), pos, -1)
            oh = jax.nn.one_hot(dest, cap, dtype=jnp.float32)
            filled = jnp.einsum(
                "wpc,wpk->wck", oh, pair.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            used = jnp.einsum("wpc->wc", oh) > 0.5          # [W, cap]
            buf = jnp.where(
                used[..., None], filled, jnp.float32(n)
            ).astype(jnp.int32)
        else:
            # large tier (swept-broadphase scale: P*cap up to ~20M
            # cells): the c-th hit lives at the FIRST index whose
            # inclusive mask-cumsum equals c+1 — a per-world
            # searchsorted over the nondecreasing cumsum + one gather
            # per slot. Bit-identical output to the one-hot tier at
            # O(cap log P) instead of a multi-million-update scatter
            # (XLA lowers those to sort chains; measured 60+ ms/step
            # on the 256-body pile at 64 worlds).
            pos_inc = pos + mi                               # inclusive
            targets = jnp.arange(1, cap + 1)
            p_len = mask.shape[1]
            idx_c = first_index_geq(pos_inc, targets)
            got = jnp.take_along_axis(pos_inc, idx_c, axis=1) == targets
            vals = jnp.take_along_axis(
                pair.astype(jnp.int32), idx_c[..., None], axis=1
            )                                                # [W, cap, 2]
            buf = jnp.where(got[..., None], vals, n)
        return buf, count, saturated

    hh, hh_num, hh_sat = compact(is_hh, caps.hull_hull)
    hp, hp_num, hp_sat = compact(is_hp, caps.hull_plane)
    sp, sp_num, sp_sat = compact(is_sphere, caps.sphere_any)
    cap_sat = hh_sat | hp_sat | sp_sat

    # second-prim type per sphere candidate (for SS/SH/SP select)
    widx = jnp.arange(w)[:, None]
    sp_b = jnp.clip(sp[..., 1], 0, n - 1)
    sp_kind = jnp.where(
        sp[..., 1] < n, ptype[widx, sp_b], geo.TYPE_NONE
    )
    if overflow is None:
        overflow = jnp.zeros((w,), bool)
    return Candidates(
        hh=hh, hh_num=hh_num, hp=hp, hp_num=hp_num,
        sp=sp, sp_num=sp_num, sp_kind=sp_kind,
        overflow=overflow | cap_sat,
    )


def find_candidates(
    body: BodyState, om, caps: CandidateCaps, expansion_dt: float
) -> Candidates:
    """All-pairs overlap -> compacted typed candidate buffers (the tier
    for the example envs' tens-of-bodies worlds)."""
    w, n = body.pos.shape[:2]
    params = om.obj_params(body.obj_id)
    lo, hi = world_aabbs(body, om, expansion_dt, params=params)
    ptype = params["prim_type"]                           # [W, N]
    static = body.response == RESPONSE_STATIC

    # upper-triangle pair enumeration (static shape: P = n*(n-1)/2)
    iu, ju = jnp.triu_indices(n, k=1)
    a_lo, a_hi = lo[:, iu], hi[:, iu]
    b_lo, b_hi = lo[:, ju], hi[:, ju]
    overlap = jnp.all((a_lo <= b_hi) & (b_lo <= a_hi), axis=-1)  # [W, P]
    both_live = body.active[:, iu] & body.active[:, ju]
    both_static = static[:, iu] & static[:, ju]
    hit = overlap & both_live & (~both_static)
    return _typed_compact(iu, ju, hit, ptype, n, caps)


def find_candidates_swept(
    body: BodyState,
    om,
    caps: CandidateCaps,
    expansion_dt: float,
    window: int = 32,
    large_slots: int = 8,
) -> Candidates:
    """Sweep-and-prune tier for many-body worlds (hundreds+).

    The reference's answer at this scale is the per-world 4-wide AABB
    tree (``broadphase::BVH::{rebuild,refit,findIntersecting}``,
    ``src/physics/broadphase.cpp:487-1027``). A pointer-chasing tree walk
    is TPU-hostile (divergent control flow, scalar gathers), so the
    TPU-native equivalent is the other classic broadphase, in two parts:

    * **Large-object split**: the ``large_slots`` widest bodies along x
      per world (walls, floors, terrain — anything whose x-interval
      would overlap everyone and poison a sweep) are tested *densely*
      against all bodies: [W, L, N] AABB tests, cheap for small L.
    * **Sweep-and-prune over the rest**: sort small bodies by AABB min-x
      per world, then only pairs within ``window`` sorted positions are
      tested — O(N log N + N·K) instead of O(N²). Exactness invariant:
      in sorted-x order every overlapping partner of small body i
      appears among the subsequent smalls whose lo.x <= hi.x(i); if more
      than ``window`` such smalls exist, ``overflow`` is reported for
      that world (same contract as candidate-buffer saturation /
      ``Executor.maybe_grow``) — callers re-tier the window. For a dense
      3D pile the slab population grows ~n^(2/3), so size ``window``
      accordingly.

    Dead rows sort to +inf (excluded from sweep and from large slots).
    """
    w, n = body.pos.shape[:2]
    params = om.obj_params(body.obj_id)
    lo, hi = world_aabbs(body, om, expansion_dt, params=params)
    ptype = params["prim_type"]
    static = body.response == RESPONSE_STATIC
    live = body.active
    widx = jnp.arange(w)[:, None]

    # ---- large-object selection: top-L x-extent among live bodies
    l_slots = min(large_slots, n)
    extent = jnp.where(live, hi[..., 0] - lo[..., 0], -jnp.inf)
    _, large_idx = jax.lax.top_k(extent, l_slots)            # [W, L]
    is_large = jnp.zeros((w, n), bool).at[widx, large_idx].set(
        live[widx, large_idx]
    )

    # ---- dense large-vs-all pairs
    la_lo = lo[widx, large_idx]                              # [W, L, 3]
    la_hi = hi[widx, large_idx]
    ov_large = jnp.all(
        (la_lo[:, :, None, :] <= hi[:, None, :, :])
        & (lo[:, None, :, :] <= la_hi[:, :, None, :]),
        axis=-1,
    )                                                        # [W, L, N]
    li_live = live[widx, large_idx]
    pair_live = li_live[:, :, None] & live[:, None, :]
    both_static = (
        static[widx, large_idx][:, :, None] & static[:, None, :]
    )
    not_self = large_idx[:, :, None] != jnp.arange(n)[None, None, :]
    # dedup large-large: count the pair only from the lower slot
    j_is_large = is_large[:, None, :]                        # [W, 1, N]
    # rank of each body among large slots (n if not large)
    rank = jnp.full((w, n), l_slots, jnp.int32).at[
        widx, large_idx
    ].set(jnp.broadcast_to(jnp.arange(l_slots)[None], (w, l_slots)))
    j_rank = rank[:, None, :]
    i_rank = jnp.arange(l_slots)[None, :, None]
    ll_keep = (~j_is_large) | (j_rank > i_rank)
    hit_large = (
        ov_large & pair_live & ~both_static & not_self & ll_keep
    ).reshape(w, -1)
    first_large = jnp.broadcast_to(
        large_idx[:, :, None], (w, l_slots, n)
    ).reshape(w, -1)
    second_large = jnp.broadcast_to(
        jnp.arange(n)[None, None, :], (w, l_slots, n)
    ).reshape(w, -1)

    # ---- sweep over smalls
    small_live = live & ~is_large
    sort_key = jnp.where(small_live, lo[..., 0], jnp.inf)    # [W, N]
    order = jnp.argsort(sort_key, axis=1)                    # [W, N]
    s_lo = lo[widx, order]                                   # [W, N, 3]
    s_hi = hi[widx, order]
    s_live = small_live[widx, order]
    s_static = static[widx, order]

    # exactness check: # of subsequent smalls whose x-interval starts
    # before this one ends must fit in the window
    s_key = jnp.where(s_live, s_lo[..., 0], jnp.inf)
    # vectorized per-world searchsorted: count of lo.x <= hi.x(i) —
    # side='right' because the sweep's pair test is INCLUSIVE
    # (b_lo <= a_hi); side='left' would miss exactly-touching partners
    # beyond the window without raising overflow
    reach = jax.vmap(
        lambda k_, v_: jnp.searchsorted(k_, v_, side="right"),
    )(s_key, jnp.where(s_live, s_hi[..., 0], -jnp.inf))      # [W, N]
    span = reach - jnp.arange(n)[None, :] - 1                # partners after i
    overflow = jnp.any(s_live & (span > window), axis=1)     # [W]

    # ---- typed hit masks per block, WITHOUT materializing [W, P]
    # pair-value/type arrays (the old concat of 80 shifted [W, N] row
    # copies lowered to ~32 ms of layout-churning fusions at pile
    # scale); pair rows/types are reconstructed ONLY at the <= cap
    # selected indices (pair_at below). Block order [large | k=1..K]
    # matches the old enumeration, so compaction order is unchanged.
    s_type = ptype[widx, order]                              # [W, N]
    li_type = ptype[widx, large_idx]                         # [W, L]

    def typed(hit, ta, tb):
        t_lo = jnp.minimum(ta, tb)
        t_hi = jnp.maximum(ta, tb)
        code = t_lo | t_hi
        return (
            hit & (code == (geo.TYPE_HULL | geo.TYPE_HULL)),
            hit & (code == (geo.TYPE_HULL | geo.TYPE_PLANE)),
            hit & (t_lo == geo.TYPE_SPHERE) & (t_hi != geo.TYPE_NONE),
        )

    hh_l, hp_l, sp_l = typed(
        hit_large.reshape(w, l_slots, n),
        li_type[:, :, None], ptype[:, None, :],
    )
    hh_m = [hh_l.reshape(w, -1)]
    hp_m = [hp_l.reshape(w, -1)]
    sp_m = [sp_l.reshape(w, -1)]
    idx = jnp.arange(n)
    k_max = min(window, n - 1)
    for k in range(1, k_max + 1):
        j = idx + k
        valid = j < n
        jc = jnp.minimum(j, n - 1)
        a_lo, a_hi = s_lo, s_hi
        b_lo = s_lo[:, jc]
        b_hi = s_hi[:, jc]
        # x-prune first (the sweep invariant), then full AABB test
        x_live = b_lo[..., 0] <= a_hi[..., 0]
        overlap = jnp.all((a_lo <= b_hi) & (b_lo <= a_hi), axis=-1)
        pair_live = s_live & s_live[:, jc]
        both_static = s_static & s_static[:, jc]
        hit_k = (
            overlap & x_live & pair_live & ~both_static & valid[None, :]
        )
        hh_k, hp_k, sp_k = typed(hit_k, s_type, s_type[:, jc])
        hh_m.append(hh_k)
        hp_m.append(hp_k)
        sp_m.append(sp_k)

    ln = l_slots * n
    nc = jnp.clip  # brevity

    def pair_at(idx_c):
        """Reconstruct (first, second, second_type) at selected flat
        pair indices [W, cap] — the lazy inverse of the block
        enumeration, ordered lower-type-code-first (reference swap)."""
        in_large = idx_c < ln
        li = nc(idx_c, 0, max(ln - 1, 0))
        f_l = jnp.take_along_axis(large_idx, li // n, axis=1)
        s_l = li % n
        ps = nc(idx_c - ln, 0, k_max * n - 1)
        k_s = ps // n + 1
        i_s = ps % n
        j_s = jnp.minimum(i_s + k_s, n - 1)
        f_s = jnp.take_along_axis(order, i_s, axis=1)
        s_s = jnp.take_along_axis(order, j_s, axis=1)
        f = jnp.where(in_large, f_l, f_s)
        s = jnp.where(in_large, s_l, s_s)
        tf = jnp.take_along_axis(ptype, nc(f, 0, n - 1), axis=1)
        ts = jnp.take_along_axis(ptype, nc(s, 0, n - 1), axis=1)
        sw = tf > ts
        return (
            jnp.where(sw, s, f), jnp.where(sw, f, s),
            jnp.maximum(tf, ts),
        )

    def compact_lazy(masks, cap):
        mask = jnp.concatenate(masks, axis=1)                # [W, P] pred
        mi = mask.astype(jnp.int32)
        pos_inc = jnp.cumsum(mi, axis=1)
        total = pos_inc[:, -1]
        count = jnp.minimum(total, cap)
        saturated = total > cap
        p_len = mask.shape[1]
        targets = jnp.arange(1, cap + 1)
        idx_c = first_index_geq(pos_inc, targets)
        got = jnp.take_along_axis(pos_inc, idx_c, axis=1) == targets
        f, s, t2 = pair_at(idx_c)
        buf = jnp.stack(
            [jnp.where(got, f, n), jnp.where(got, s, n)], axis=-1
        ).astype(jnp.int32)
        kind = jnp.where(got, t2, geo.TYPE_NONE)
        return buf, count, saturated, kind

    hh, hh_num, hh_sat, _ = compact_lazy(hh_m, caps.hull_hull)
    hp, hp_num, hp_sat, _ = compact_lazy(hp_m, caps.hull_plane)
    sp, sp_num, sp_sat, sp_kind = compact_lazy(sp_m, caps.sphere_any)
    return Candidates(
        hh=hh, hh_num=hh_num, hp=hp, hp_num=hp_num,
        sp=sp, sp_num=sp_num, sp_kind=sp_kind.astype(jnp.int32),
        overflow=overflow | hh_sat | hp_sat | sp_sat,
    )


def find_candidates_pallas(
    body: BodyState, om, caps: CandidateCaps, expansion_dt: float,
    tile_w: int = 128, interpret=None,
) -> Candidates:
    """All-pairs tier on the Pallas broadphase kernel
    (ops/broadphase_pallas): bit-identical Candidates to
    :func:`find_candidates`, computed in VMEM with the compaction done
    in-kernel — no [W, P]-class pair intermediates in HBM."""
    from ..ops import broadphase_pallas as bpk

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    w, n = body.pos.shape[:2]
    params = om.obj_params(body.obj_id)
    static = body.response == RESPONSE_STATIC
    f32c = lambda b: b.astype(jnp.float32)[..., None]
    pack = jnp.concatenate(
        [
            body.pos, body.rot, body.scale, body.vel,
            params["aabb_min"], params["aabb_max"],
            f32c(params["prim_type"]), f32c(body.active), f32c(static),
        ],
        axis=-1,
    )                                                  # [W, N, BPF]
    bp_t = jnp.transpose(pack, (2, 1, 0))
    fn = bpk.make_broadphase(
        n, caps.hull_hull, caps.hull_plane, caps.sphere_any,
        expansion_dt, tile_w=min(tile_w, w), interpret=interpret,
    )
    out = fn(bp_t)                                     # [R, W]

    off = [0]

    def take(k):
        r = out[off[0]:off[0] + k]
        off[0] += k
        return r

    ch, cp, cs = caps.hull_hull, caps.hull_plane, caps.sphere_any
    hh_a, hh_b = take(ch), take(ch)
    hp_h, hp_p = take(cp), take(cp)
    sp_s, sp_o, sp_k = take(cs), take(cs), take(cs)
    nums = take(3)
    ovf = take(1)
    t = lambda x: jnp.transpose(x, (1, 0))
    pair = lambda a, b: jnp.stack([t(a), t(b)], axis=-1).astype(jnp.int32)
    return Candidates(
        hh=pair(hh_a, hh_b), hh_num=t(nums)[:, 0].astype(jnp.int32),
        hp=pair(hp_h, hp_p), hp_num=t(nums)[:, 1].astype(jnp.int32),
        sp=pair(sp_s, sp_o), sp_num=t(nums)[:, 2].astype(jnp.int32),
        sp_kind=t(sp_k).astype(jnp.int32),
        overflow=t(ovf)[:, 0] > 0.5,
    )
