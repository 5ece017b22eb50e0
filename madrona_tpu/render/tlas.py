"""TLAS tier: LBVH over instances + per-view culling for large scenes.

TPU-native equivalent of the reference's GPU TLAS chain
(``src/mw/device/bvh.cpp`` — morton codes, Karras radix-tree build,
bottom-up AABB fit — consumed by the persistent raycast kernel
``src/mw/device/bvh_raycast.cpp``). Design translation (SURVEY.md §7):

- The **build** is the same algorithm (30-bit morton sort + Karras 2012
  internal-node ranges + bottom-up refit) but expressed as fixed-depth
  vectorized passes over ``[I]`` arrays instead of one thread per node —
  every step is a dense gather/compare, nothing data-dependent, so the
  whole build jits into the step function and rebuilds every frame like
  the reference's ``bvhBuildSlow`` path.
- **Traversal** is stackless skip-link walking (threaded tree), one
  ``lax.while_loop`` per ray vmapped into lockstep over the ray batch.
  It returns a fixed-K candidate instance set per ray; actual
  triangle intersection stays on the dense Moller-Trumbore sweep of
  render/raycast.py over the compacted candidates (static shapes).
- For camera views the rays of one view share locality, so the cheap
  tier culls per *view*, not per ray: frustum + distance top-K over
  instance world AABBs, then the dense tracer runs on the K compacted
  instances (``render_views_tlas``). This is the TPU answer to "TLAS
  cuts per-ray work": one cull amortized over H*W rays, zero divergence.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..utils import math3d as m3
from ..utils.morton import morton3d
from .mesh import MeshTables

BIG = 3.0e38


# ----------------------------------------------------------------- AABBs


def object_aabbs(mesh: MeshTables):
    """Local-space AABB of every render object [O, 3] lo / hi."""
    pts = jnp.stack(
        [mesh.tri_v0, mesh.tri_v0 + mesh.tri_e1, mesh.tri_v0 + mesh.tri_e2],
        axis=2,
    )  # [O, T, 3, 3]
    m = mesh.tri_mask[:, :, None, None]
    lo = jnp.min(jnp.where(m, pts, BIG), axis=(1, 2))
    hi = jnp.max(jnp.where(m, pts, -BIG), axis=(1, 2))
    return lo, hi


def instance_world_aabbs(obj_lo, obj_hi, inst_pos, inst_rot, inst_scale,
                         inst_obj):
    """Conservative world AABBs of instances [I, 3] lo / hi (the
    reference recomputes these per frame in the instance-AABB kernel)."""
    oh = jax.nn.one_hot(inst_obj, obj_lo.shape[0])
    lo = oh @ obj_lo                                  # [I, 3]
    hi = oh @ obj_hi
    c_l = (lo + hi) * 0.5 * inst_scale
    e_l = (hi - lo) * 0.5 * inst_scale
    rm = m3.quat_to_mat3(inst_rot)                    # [I, 3, 3]
    c_w = jnp.einsum("iab,ib->ia", rm, c_l) + inst_pos
    e_w = jnp.einsum("iab,ib->ia", jnp.abs(rm), e_l)
    return c_w - e_w, c_w + e_w


# ------------------------------------------------------------ LBVH build


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TLAS:
    """Flat threaded LBVH. Pointer space: [0, I-2] internal nodes,
    [I-1, 2I-2] leaves (leaf p holds instance ``inst[p - (I-1)]``).
    SENTINEL = 2I-1 ends traversal."""

    node_lo: jnp.ndarray     # [2I-1, 3] AABB per pointer
    node_hi: jnp.ndarray     # [2I-1, 3]
    left: jnp.ndarray        # [2I-1] i32: first-child ptr (leaves: self)
    skip: jnp.ndarray        # [2I-1] i32: next ptr on miss/leaf-done
    inst: jnp.ndarray        # [I] i32: instance id per leaf slot
    num_leaves: int = dataclasses.field(
        default=0, metadata=dict(static=True)
    )


def _delta(codes, i, j, n):
    """Common-prefix length of sorted keys i and j (index tie-break ==
    appending the index bits below the code bits); -1 outside range."""
    j_ok = (j >= 0) & (j < n)
    jc = jnp.clip(j, 0, n - 1)
    ci = codes[i]
    cj = codes[jc]
    x = ci ^ cj
    ix = (i ^ jc).astype(jnp.uint32)
    d = jnp.where(x == 0, 32 + jax.lax.clz(ix), jax.lax.clz(x))
    return jnp.where(j_ok, d.astype(jnp.int32), -1)


def build_tlas(inst_lo, inst_hi, inst_mask, scene_lo, scene_hi) -> TLAS:
    """Build the threaded LBVH over instance AABBs (one world).

    Dead instances sort to the end with inverted AABBs (never hit).
    Fixed-depth vectorized Karras build: every loop below runs a static
    number of passes (log2 I searches, <=64 refit/thread passes)."""
    i_n = inst_lo.shape[0]
    if i_n < 2:
        # degenerate 0/1-instance tree: ONE root==leaf node always
        # exists (zero instances get an inverted never-hit box), so
        # every TLAS field is consistently length-1 — a size-0 node
        # array would make tlas_candidates' sentinel walk gather out
        # of bounds
        one_mask = (
            inst_mask[:1] if i_n == 1 else jnp.zeros((1,), bool)
        )
        lo = jnp.where(
            one_mask[:, None],
            inst_lo[:1] if i_n == 1 else jnp.full((1, 3), BIG),
            BIG,
        )
        hi = jnp.where(
            one_mask[:, None],
            inst_hi[:1] if i_n == 1 else jnp.full((1, 3), -BIG),
            -BIG,
        )
        return TLAS(
            node_lo=lo, node_hi=hi,
            left=jnp.zeros((1,), jnp.int32),
            skip=jnp.full((1,), 1, jnp.int32),
            inst=jnp.where(one_mask, 0, -1).astype(jnp.int32),
            num_leaves=1,
        )

    center = (inst_lo + inst_hi) * 0.5
    codes = morton3d(center, scene_lo, scene_hi)
    codes = jnp.where(inst_mask, codes, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(codes)
    codes = codes[order]
    lo_s = jnp.where(inst_mask[order][:, None], inst_lo[order], BIG)
    hi_s = jnp.where(inst_mask[order][:, None], inst_hi[order], -BIG)

    n = i_n
    ii = jnp.arange(n - 1, dtype=jnp.int32)          # internal node ids
    delta = functools.partial(_delta, codes, n=n)

    d = jnp.sign(delta(ii, ii + 1) - delta(ii, ii - 1)).astype(jnp.int32)
    d = jnp.where(d == 0, 1, d)
    delta_min = delta(ii, ii - d)

    # upper bound on range length: largest l with delta(i, i+l*d) > min.
    # delta is non-increasing in l over sorted keys -> binary search on
    # the bits of n (static pass count).
    nbits = max(1, (n - 1).bit_length())
    l = jnp.zeros_like(ii)
    for b in range(nbits, -1, -1):
        cand = l + (1 << b)
        ok = (cand <= n) & (delta(ii, ii + cand * d) > delta_min)
        l = jnp.where(ok, cand, l)
    j = ii + l * d                                    # other range end

    delta_node = delta(ii, j)
    # split: largest s with delta(i, i + s*d) > delta_node
    s = jnp.zeros_like(ii)
    for b in range(nbits, -1, -1):
        cand = s + (1 << b)
        ok = (cand < l) & (delta(ii, ii + cand * d) > delta_node)
        s = jnp.where(ok, cand, s)
    gamma = ii + s * d + jnp.minimum(d, 0)

    lo_rng = jnp.minimum(ii, j)
    hi_rng = jnp.maximum(ii, j)
    leaf_ptr = lambda k: k + (n - 1)
    left_child = jnp.where(lo_rng == gamma, leaf_ptr(gamma), gamma)
    right_child = jnp.where(
        hi_rng == gamma + 1, leaf_ptr(gamma + 1), gamma + 1
    )

    # parent pointers over the full ptr space
    num_ptr = 2 * n - 1
    parent = jnp.zeros((num_ptr,), jnp.int32)
    parent = parent.at[left_child].set(ii)
    parent = parent.at[right_child].set(ii)
    is_right = jnp.zeros((num_ptr,), bool).at[right_child].set(True)

    # bottom-up AABB refit: fixed passes (tree depth <= code+index bits)
    node_lo = jnp.concatenate([jnp.full((n - 1, 3), BIG), lo_s], axis=0)
    node_hi = jnp.concatenate([jnp.full((n - 1, 3), -BIG), hi_s], axis=0)
    depth = min(n - 1, 64)

    def refit(_, nodes):
        nlo, nhi = nodes
        int_lo = jnp.minimum(nlo[left_child], nlo[right_child])
        int_hi = jnp.maximum(nhi[left_child], nhi[right_child])
        return (
            jnp.concatenate([int_lo, lo_s], axis=0),
            jnp.concatenate([int_hi, hi_s], axis=0),
        )

    node_lo, node_hi = jax.lax.fori_loop(
        0, depth, refit, (node_lo, node_hi)
    )

    # skip links: skip[left] = right sibling; skip[right] = skip[parent]
    # (resolved along right spines in depth passes; root skips to END)
    sentinel = jnp.int32(num_ptr)
    right_sib = jnp.zeros((num_ptr,), jnp.int32).at[left_child].set(
        right_child
    )
    skip = jnp.where(
        jnp.arange(num_ptr) == 0, sentinel,
        jnp.where(is_right, sentinel, right_sib),
    ).astype(jnp.int32)
    skip = jax.lax.fori_loop(
        0, depth,
        lambda _, s: jnp.where(is_right, s[parent], s).astype(jnp.int32),
        skip,
    )
    skip = skip.at[0].set(sentinel)

    left_full = jnp.concatenate(
        [left_child, jnp.arange(n - 1, num_ptr, dtype=jnp.int32)]
    )
    # dead leaves: inverted AABBs are union-identities for the refit but
    # still pass a slab test (min/max un-inverts them) — tag them with
    # inst = -1 so traversal records nothing.
    return TLAS(
        node_lo=node_lo, node_hi=node_hi,
        left=left_full.astype(jnp.int32), skip=skip,
        inst=jnp.where(
            inst_mask[order], order, -1
        ).astype(jnp.int32),
        num_leaves=n,
    )


# -------------------------------------------------------------- traverse


def _ray_aabb(lo, hi, o, inv_d, t_max):
    t0 = (lo - o) * inv_d
    t1 = (hi - o) * inv_d
    t_near = jnp.max(jnp.minimum(t0, t1))
    t_far = jnp.min(jnp.maximum(t0, t1))
    return (t_near <= t_far) & (t_far > 0.0) & (t_near < t_max)


def tlas_candidates(tlas: TLAS, origins, dirs, k: int, t_max: float):
    """Walk the threaded LBVH for each ray; return up to K candidate
    instance ids (padded with -1) + the true overlap count (callers can
    export it as an overflow signal, like the broadphase caps).

    origins/dirs: [R, 3]. The while_loop runs in lockstep over the ray
    batch (vmapped); bound = every pointer visited once."""
    n_ptr = tlas.left.shape[0]
    sentinel = n_ptr
    leaf0 = max(tlas.num_leaves - 1, 0)

    def one_ray(o, d):
        inv_d = 1.0 / jnp.where(jnp.abs(d) > 1e-12, d, 1e-12)

        def cond(st):
            return st[0] < sentinel

        def body(st):
            ptr, cands, cnt = st
            p = jnp.minimum(ptr, n_ptr - 1)
            hit = _ray_aabb(tlas.node_lo[p], tlas.node_hi[p], o, inv_d,
                            t_max)
            is_leaf = p >= leaf0
            inst = tlas.inst[jnp.maximum(p - leaf0, 0)]
            take = hit & is_leaf & (inst >= 0)
            slot = jnp.minimum(cnt, k - 1)
            cands = jnp.where(
                take & (cnt < k),
                cands.at[slot].set(inst),
                cands,
            )
            cnt = cnt + jnp.where(take, 1, 0)
            nxt = jnp.where(hit & ~is_leaf, tlas.left[p], tlas.skip[p])
            return nxt, cands, cnt

        init = (jnp.int32(0), jnp.full((k,), -1, jnp.int32), jnp.int32(0))
        _, cands, cnt = jax.lax.while_loop(cond, body, init)
        return cands, cnt

    return jax.vmap(one_ray)(origins, dirs)


# ------------------------------------------------------- per-view culling


def cull_view_topk(inst_lo, inst_hi, inst_mask, cam_pos, cam_rot, k: int,
                   fov_deg: float, aspect: float, t_max: float):
    """Frustum + distance cull for one camera: K nearest instances whose
    world AABB intersects the view frustum. Returns ([K] indices into the
    instance arrays, [K] valid mask, overlap count)."""
    c = (inst_lo + inst_hi) * 0.5
    e = (inst_hi - inst_lo) * 0.5
    r = jnp.linalg.norm(e, axis=-1)                   # bounding-sphere cull

    # frustum planes in camera space (+y forward, x right, z up)
    half_x = jnp.tan(jnp.deg2rad(fov_deg) * 0.5) * aspect
    half_z = jnp.tan(jnp.deg2rad(fov_deg) * 0.5)
    c_cam = m3.quat_rotate(
        m3.quat_inv(cam_rot)[None, :], c - cam_pos[None, :]
    )
    nrm = lambda v: jnp.asarray(v) / jnp.linalg.norm(jnp.asarray(v))
    planes = jnp.stack([
        nrm([0.0, 1.0, 0.0]),                         # near (y > 0)
        nrm([-1.0, half_x, 0.0]),                     # +x side
        nrm([1.0, half_x, 0.0]),                      # -x side
        nrm([0.0, half_z, -1.0]),                     # +z side
        nrm([0.0, half_z, 1.0]),                      # -z side
    ])                                                # [5, 3]
    sd = jnp.einsum("pc,ic->ip", planes, c_cam)
    inside = jnp.all(sd > -r[:, None], axis=1)
    dist = jnp.linalg.norm(c - cam_pos[None, :], axis=-1)
    inside &= (dist - r) < t_max
    inside &= inst_mask & (inst_hi[:, 0] >= inst_lo[:, 0])

    score = jnp.where(inside, -dist, -BIG)
    top, idx = jax.lax.top_k(score, k)
    return idx, top > -BIG, jnp.sum(inside.astype(jnp.int32))


def render_views_tlas(cfg, mesh: MeshTables, inst_pos, inst_rot, inst_scale,
                      inst_obj, inst_mask, cam_pos, cam_rot,
                      max_instances_per_view: int = 16):
    """Drop-in for render_views at scene scale: per-view frustum/top-K
    cull over instance world AABBs, then the dense tracer on the K
    compacted instances. Exact whenever <= K instances overlap a view
    frustum (callers size K like the broadphase candidate caps).

    Returns (rgb [W, V, H, Wpx, 3], depth [W, V, H, Wpx], overlap
    [W, V] — the true per-view overlap count for overflow detection)."""
    from .raycast import (
        camera_rays, resolve_tracer, _trace_rays, _trace_rays_matmul,
    )

    h, w = cfg.height, cfg.width
    tracer = resolve_tracer(cfg)
    k = max_instances_per_view
    obj_lo, obj_hi = object_aabbs(mesh)
    n_views = cam_pos.shape[1]
    if inst_mask.ndim == 2:
        inst_mask = jnp.broadcast_to(
            inst_mask[:, None, :],
            (inst_mask.shape[0], n_views, inst_mask.shape[1]),
        )

    from .kernel import (
        kernel_eligible, render_views_kernel, view_overlap_counts,
    )

    if kernel_eligible(cfg, mesh, None, k, inst_pos.shape[1]):
        # megakernel tier traces the FULL set (exact regardless of
        # frustum overlap); the overlap count keeps the adaptive-K
        # contract for callers (RenderingSystem.maybe_grow_tlas)
        rgb, depth = render_views_kernel(
            cfg, mesh, inst_pos, inst_rot, inst_scale, inst_obj,
            inst_mask, cam_pos, cam_rot,
        )
        overlap = view_overlap_counts(
            obj_lo, obj_hi, inst_pos, inst_rot, inst_scale, inst_obj,
            inst_mask, cam_pos, cam_rot, cfg,
        )
        return rgb, depth, overlap

    def per_world(ip, ir, isc, io, ims, cps, crs):
        lo, hi = instance_world_aabbs(obj_lo, obj_hi, ip, ir, isc, io)

        def per_cam(im, cp, cr):
            idx, ok, n_overlap = cull_view_topk(
                lo, hi, im, cp, cr, k, cfg.fov_deg, w / h, cfg.t_max
            )
            oh = jax.nn.one_hot(idx, ip.shape[0], dtype=jnp.float32)
            pick = lambda a: jnp.einsum(
                "ki,i...->k...", oh,
                a.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            o, d = camera_rays(cfg, cp, cr)
            k_obj = (pick(io.astype(jnp.float32)) + 0.5).astype(jnp.int32)
            if tracer == "matmul":
                rgb, dep = _trace_rays_matmul(
                    cfg, mesh, pick(ip), pick(ir), pick(isc), k_obj,
                    ok, cp, d.reshape(-1, 3),
                )
            else:
                rgb, dep = _trace_rays(
                    cfg, mesh, pick(ip), pick(ir), pick(isc), k_obj,
                    ok, o.reshape(-1, 3), d.reshape(-1, 3),
                )
            return rgb.reshape(h, w, 3), dep.reshape(h, w), n_overlap

        return jax.vmap(per_cam)(ims, cps, crs)

    return jax.vmap(per_world)(
        inst_pos, inst_rot, inst_scale, inst_obj, inst_mask,
        cam_pos, cam_rot,
    )
