"""Device-side mesh-BVH (BLAS) traversal for the batch raycaster.

TPU-native equivalent of the reference's quantized-wide-BVH ray
traversal (``include/madrona/mesh_bvh.hpp:20-212`` ``MeshBVH::traceRay``
+ the raycast kernel's TLAS→BLAS walk,
``src/mw/device/bvh_raycast.cpp:225-520``). The reference traverses a
compressed 8-wide BVH with a short stack per CUDA thread; the TPU
design keeps the same *algorithm* (ordered depth-first walk, nearest
child first, fixed stack) but vectorizes it across all (instance, ray)
lanes of a ``lax.while_loop`` — every lane advances one node per
iteration, so wall time is the *maximum* per-lane node count, which
coherent camera-pixel rays keep low. Node/tri fetches are XLA gathers
into the padded per-object tables.

This is the tier for imported meshes of real polycount; the dense
masked sweep (``render/raycast.py``) remains the fast path for the
toy-geometry envs (tens of tris per object), exactly as the reference
keeps separate paths for procedural vs mesh geometry.

Bake: ``bake_blas`` stacks per-object ``assets/bvh.py::MeshBVH``
(native binned-SAH builds, ``native/importer.cpp:160-353``) into padded
device arrays, with triangles pre-reordered into leaf order so a leaf
is a contiguous ``[first, first+count)`` slice (the reference bakes the
same layout, ``src/render/asset_processor.cpp:155-254``).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import math3d as m3


@dataclasses.dataclass
class BlasTables:
    """All render objects' BVHs as stacked padded device arrays.

    Triangles are stored in BVH leaf order; ``left`` of a leaf node is
    the first triangle slot, ``right`` is ``-count``. Inner nodes store
    child indices. Padding nodes are empty leaves (count 0).
    """

    node_min: jnp.ndarray   # [O, N, 3] f32
    node_max: jnp.ndarray   # [O, N, 3] f32
    left: jnp.ndarray       # [O, N] i32
    right: jnp.ndarray      # [O, N] i32
    tri_v0: jnp.ndarray     # [O, T, 3] f32 (leaf order)
    tri_e1: jnp.ndarray     # [O, T, 3]
    tri_e2: jnp.ndarray     # [O, T, 3]
    tri_color: jnp.ndarray  # [O, T, 3]
    tri_uv: jnp.ndarray = None   # [O, T, 3, 2] f32 (per-corner UVs)
    tri_mat: jnp.ndarray = None  # [O, T] i32 material slot (0 = default)
    max_leaf: int = 4
    num_objects: int = 0
    # optional 4-wide collapse (Blas4Tables); when present the tracer
    # walks it instead of the binary tree — same hits, ~half the
    # while_loop trips. Attach with :func:`with_wide`.
    wide: object = None

    @property
    def num_nodes(self) -> int:
        return self.node_min.shape[1]


def bake_blas(
    bvhs: Sequence,
    colors=None,
    tri_colors=None,
    uvs=None,
    materials=None,
) -> BlasTables:
    """Stack per-object MeshBVH builds into BlasTables.

    bvhs: list of assets.bvh.MeshBVH. colors: per-object RGB (or
    ``tri_colors``: list of [T, 3] arrays in *original* tri order).
    uvs: per-object [V, 2] vertex UVs (or None). materials: per-object
    material slot (int; use imported-id + 1, 0 = default) — the
    reference's per-leaf material index (mesh_bvh.hpp leaf material,
    asset_processor.cpp:155-254).
    """
    o = len(bvhs)
    max_n = max(b.num_nodes for b in bvhs)
    max_t = max(len(b.indices) for b in bvhs)
    max_leaf = max(
        int(max(-b.right[b.right < 0])) if (b.right < 0).any() else 1
        for b in bvhs
    )
    # pad nodes: large-FINITE inverted boxes (never hit by the slab
    # test). Not +-inf: the one-hot walker fetches node rows by matmul,
    # and 0 * inf = NaN would poison every lane of an object set whose
    # table carries pad rows.
    node_min = np.full((o, max_n, 3), 1e30, np.float32)
    node_max = np.full((o, max_n, 3), -1e30, np.float32)
    left = np.zeros((o, max_n), np.int32)
    right = np.zeros((o, max_n), np.int32)   # pad nodes: leaf count 0
    v0 = np.zeros((o, max_t, 3), np.float32)
    e1 = np.zeros((o, max_t, 3), np.float32)
    e2 = np.zeros((o, max_t, 3), np.float32)
    col = np.full((o, max_t, 3), 0.8, np.float32)
    uv = np.zeros((o, max_t, 3, 2), np.float32)
    mat = np.zeros((o, max_t), np.int32)
    for i, b in enumerate(bvhs):
        nn, nt = b.num_nodes, len(b.indices)
        node_min[i, :nn] = b.node_min
        node_max[i, :nn] = b.node_max
        left[i, :nn] = b.left
        right[i, :nn] = b.right
        # reorder tris into leaf order
        order = b.tri_order
        tri = b.indices[order]
        p = b.positions
        v0[i, :nt] = p[tri[:, 0]]
        e1[i, :nt] = p[tri[:, 1]] - p[tri[:, 0]]
        e2[i, :nt] = p[tri[:, 2]] - p[tri[:, 0]]
        if tri_colors is not None and tri_colors[i] is not None:
            col[i, :nt] = np.asarray(tri_colors[i], np.float32)[order]
        elif colors is not None:
            col[i, :nt] = np.asarray(colors[i], np.float32)
        if uvs is not None and uvs[i] is not None:
            vuv = np.asarray(uvs[i], np.float32)
            uv[i, :nt] = vuv[tri]                      # [T, 3, 2]
        if materials is not None:
            mat[i, :nt] = np.asarray(materials[i], np.int32)
    return BlasTables(
        node_min=jnp.asarray(node_min), node_max=jnp.asarray(node_max),
        left=jnp.asarray(left), right=jnp.asarray(right),
        tri_v0=jnp.asarray(v0), tri_e1=jnp.asarray(e1),
        tri_e2=jnp.asarray(e2), tri_color=jnp.asarray(col),
        tri_uv=jnp.asarray(uv), tri_mat=jnp.asarray(mat),
        max_leaf=max_leaf, num_objects=o,
    )


def bake_assets_blas(assets, leaf_size: int = 4, tex_size: int = 64):
    """One-call bake of ``assets.importer.ImportedAssets`` into the
    renderer's (BlasTables, MaterialTables) pair — the
    ``AssetProcessor::makeBVHData`` + ``initMaterialData`` analogue.
    Returns (blas, materials, object_ids) with one render object per
    imported mesh.
    """
    from ..assets.bvh import build_mesh_bvh
    from .materials import bake_materials

    bvhs, mats = [], []
    uv_list = []
    for mesh in assets.meshes:
        bvhs.append(
            build_mesh_bvh(mesh.positions, mesh.indices, leaf_size)
        )
        uv_list.append(mesh.uvs)
        mats.append(mesh.material + 1)     # slot 0 = default material
    blas = bake_blas(bvhs, uvs=uv_list, materials=mats)
    mat_tables = bake_materials(
        assets.materials, assets.textures, tex_size=tex_size
    )
    return blas, mat_tables, list(range(len(assets.meshes)))


@dataclasses.dataclass
class Blas4Tables:
    """4-wide collapse of :class:`BlasTables` — the TPU answer to the
    reference's compressed wide BVH (``include/madrona/mesh_bvh.hpp``
    nodes hold several children; the CUDA walker tests them together).
    Halving tree depth halves the gather-bound ``while_loop`` trip
    count, which is what the lockstep TPU walker pays for.

    Child entry encoding (``c_entry``): >= 0 — index of the child wide
    node; < 0 — leaf slot ``-(entry) - 1`` into ``leaf_first/count``.
    Empty child slots carry +inf/-inf AABBs so the slab test never
    hits them. ``c_min/c_max`` may be stored bfloat16 (conservatively
    rounded outward at bake time — min down, max up — so quantization
    can only admit extra node visits, never miss a hit); triangles and
    the final intersection always run f32.
    """

    c_min: jnp.ndarray       # [O, N4, 4, 3] f32 or bf16
    c_max: jnp.ndarray       # [O, N4, 4, 3]
    c_entry: jnp.ndarray     # [O, N4, 4] i32
    leaf_first: jnp.ndarray  # [O, L] i32
    leaf_count: jnp.ndarray  # [O, L] i32
    tri_v0: jnp.ndarray      # [O, T, 3] f32 (leaf order, shared layout)
    tri_e1: jnp.ndarray
    tri_e2: jnp.ndarray
    max_leaf: int = 4


def _bf16_outward(lo: np.ndarray, hi: np.ndarray):
    """Round AABBs outward to bf16: lo down, hi up (one ulp when the
    truncation moved the bound inward)."""
    lo16 = lo.astype(np.float32).view(np.uint32) >> 16
    lo_t = (lo16 << 16).view(np.float32).astype(np.float32)
    lo_t = lo_t.reshape(lo.shape)
    # truncation rounds toward zero: too high for negative... simplest
    # robust fix: nudge one bf16 ulp outward wherever truncation landed
    # strictly inside
    def step_down(x):
        b = x.view(np.uint32) >> 16
        # branch on the SIGN BIT, not x >= 0: -0.0 compares >= 0 but its
        # next value toward -inf is -min_bf16 (bits 0x8001), not +huge
        neg = (b & 0x8000) != 0
        b2 = np.where(neg, b + 1, np.where(b == 0, 0x8001, b - 1))
        return (b2.astype(np.uint32) << 16).view(np.float32)

    def step_up(x):
        b = x.view(np.uint32) >> 16
        neg = (b & 0x8000) != 0
        # next toward +inf: -0.0/0x8000 -> +min_bf16 (0x0001)
        b2 = np.where(
            neg, np.where(b == 0x8000, 0x0001, b - 1), b + 1
        )
        return (b2.astype(np.uint32) << 16).view(np.float32)

    lo_q = np.where(lo_t <= lo, lo_t, step_down(lo_t.copy()))
    hi16 = hi.astype(np.float32).view(np.uint32) >> 16
    hi_t = (hi16 << 16).view(np.float32).astype(np.float32)
    hi_q = np.where(hi_t >= hi, hi_t, step_up(hi_t.copy()))
    return lo_q.astype(np.float32), hi_q.astype(np.float32)


def widen_blas(blas: BlasTables, aabb_dtype: str = "float32") -> Blas4Tables:
    """Collapse each object's binary BVH into 4-wide nodes (host-side).

    Each binary inner node's children become: the child itself if it is
    a leaf, else its two children — up to 4 entries whose AABBs are the
    binary nodes' own boxes. Triangle tables are shared with ``blas``
    (same leaf order), so hits are bit-identical to the binary walker.
    """
    nm = np.asarray(blas.node_min)
    nx = np.asarray(blas.node_max)
    lf = np.asarray(blas.left)
    rt = np.asarray(blas.right)
    o = nm.shape[0]

    all_cmin, all_cmax, all_centry = [], [], []
    all_lfirst, all_lcount = [], []
    for i in range(o):
        leaves = []          # (first, count)
        wide = []            # each: list of (min3, max3, entry)
        wid_of = {}          # binary inner idx -> wide idx

        def leaf_slot(b):
            leaves.append((int(lf[i, b]), int(-rt[i, b])))
            return -len(leaves)          # encodes -(slot)-1, slot=len-1

        is_leaf = lambda b: rt[i, b] <= 0

        if is_leaf(0):
            wide.append([(nm[i, 0], nx[i, 0], leaf_slot(0))])
        else:
            wid_of[0] = 0
            wide.append(None)
            work = [0]
            while work:
                b = work.pop()
                kids = []
                for c in (int(lf[i, b]), int(rt[i, b])):
                    if is_leaf(c):
                        kids.append((nm[i, c], nx[i, c], leaf_slot(c)))
                    else:
                        for g in (int(lf[i, c]), int(rt[i, c])):
                            if is_leaf(g):
                                kids.append(
                                    (nm[i, g], nx[i, g], leaf_slot(g))
                                )
                            else:
                                if g not in wid_of:
                                    wid_of[g] = len(wide)
                                    wide.append(None)
                                    work.append(g)
                                kids.append((nm[i, g], nx[i, g], wid_of[g]))
                wide[wid_of[b]] = kids
        n4 = len(wide)
        cmin = np.full((n4, 4, 3), np.inf, np.float32)
        cmax = np.full((n4, 4, 3), -np.inf, np.float32)
        cent = np.zeros((n4, 4), np.int32)
        for w_, kids in enumerate(wide):
            for s, (mn, mx, e) in enumerate(kids):
                cmin[w_, s] = mn
                cmax[w_, s] = mx
                cent[w_, s] = e
        all_cmin.append(cmin)
        all_cmax.append(cmax)
        all_centry.append(cent)
        all_lfirst.append(np.asarray([a for a, _ in leaves], np.int32))
        all_lcount.append(np.asarray([c for _, c in leaves], np.int32))

    n4_max = max(a.shape[0] for a in all_cmin)
    l_max = max(max(len(a), 1) for a in all_lfirst)
    cmin = np.full((o, n4_max, 4, 3), np.inf, np.float32)
    cmax = np.full((o, n4_max, 4, 3), -np.inf, np.float32)
    cent = np.zeros((o, n4_max, 4), np.int32)
    lfir = np.zeros((o, l_max), np.int32)
    lcnt = np.zeros((o, l_max), np.int32)
    for i in range(o):
        n4, l_ = all_cmin[i].shape[0], len(all_lfirst[i])
        cmin[i, :n4] = all_cmin[i]
        cmax[i, :n4] = all_cmax[i]
        cent[i, :n4] = all_centry[i]
        lfir[i, :l_] = all_lfirst[i]
        lcnt[i, :l_] = all_lcount[i]
    if aabb_dtype == "bfloat16":
        lo_q, hi_q = _bf16_outward(cmin, cmax)
        cmin_j = jnp.asarray(lo_q, jnp.bfloat16)
        cmax_j = jnp.asarray(hi_q, jnp.bfloat16)
    else:
        cmin_j = jnp.asarray(cmin)
        cmax_j = jnp.asarray(cmax)
    return Blas4Tables(
        c_min=cmin_j, c_max=cmax_j, c_entry=jnp.asarray(cent),
        leaf_first=jnp.asarray(lfir), leaf_count=jnp.asarray(lcnt),
        tri_v0=blas.tri_v0, tri_e1=blas.tri_e1, tri_e2=blas.tri_e2,
        max_leaf=blas.max_leaf,
    )


def with_wide(blas: BlasTables, aabb_dtype: str = "float32") -> BlasTables:
    """Return ``blas`` with the 4-wide collapse attached (tracer then
    walks the wide tree; hits are identical, tests/test_blas.py)."""
    return dataclasses.replace(blas, wide=widen_blas(blas, aabb_dtype))


def trace_rays_blas4(
    blas4: Blas4Tables,
    obj: jnp.ndarray,
    o_l: jnp.ndarray,
    d_l: jnp.ndarray,
    live: jnp.ndarray,
    t_max: float,
    stack_size: int = 48,
):
    """4-wide walker; contract identical to :func:`trace_rays_blas`.

    Stack entries: >= 1 — wide node index + 1; <= -1 — leaf slot
    ``-e - 1``; the +1 bias keeps 0 free as the stack's empty filler.
    """
    b = obj.shape[0]
    inv_d = jnp.where(jnp.abs(d_l) > 1e-12, 1.0 / d_l, jnp.float32(1e30))
    stack = jnp.zeros((b, stack_size), jnp.int32)
    # push the root (wide node 0 -> entry +1) on live lanes
    stack = stack.at[:, 0].set(jnp.where(live, 1, 0))
    sp = live.astype(jnp.int32)
    best_t = jnp.full((b,), t_max, jnp.float32)
    best_tri = jnp.full((b,), -1, jnp.int32)
    best_u = jnp.zeros((b,), jnp.float32)
    best_v = jnp.zeros((b,), jnp.float32)
    lanes = jnp.arange(b)

    def cond(c):
        return jnp.any(c[1] > 0)

    def body(c):
        stack, sp, best_t, best_tri, best_u, best_v = c
        active = sp > 0
        e = stack[lanes, jnp.maximum(sp - 1, 0)]
        sp = sp - active.astype(jnp.int32)
        is_leaf = e < 0

        # ---- leaf lanes: masked Moller-Trumbore over the leaf budget
        slot = jnp.where(is_leaf, -e - 1, 0)
        first = blas4.leaf_first[obj, slot]
        count = jnp.where(is_leaf & active, blas4.leaf_count[obj, slot], 0)
        for k in range(blas4.max_leaf):
            ti = jnp.clip(first + k, 0, blas4.tri_v0.shape[1] - 1)
            valid = k < count
            v0 = blas4.tri_v0[obj, ti]
            e1 = blas4.tri_e1[obj, ti]
            e2 = blas4.tri_e2[obj, ti]
            p = jnp.cross(d_l, e2)
            det = jnp.sum(e1 * p, axis=-1)
            inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
            tv = o_l - v0
            u = jnp.sum(tv * p, axis=-1) * inv_det
            q = jnp.cross(tv, e1)
            v = jnp.sum(d_l * q, axis=-1) * inv_det
            t = jnp.sum(e2 * q, axis=-1) * inv_det
            hit = (
                valid & (jnp.abs(det) > 1e-12)
                & (u >= 0) & (v >= 0) & (u + v <= 1)
                & (t > 1e-3) & (t < best_t)
            )
            best_tri = jnp.where(hit, ti, best_tri)
            best_u = jnp.where(hit, u, best_u)
            best_v = jnp.where(hit, v, best_v)
            best_t = jnp.where(hit, t, best_t)

        # ---- inner lanes: test 4 children, push far-to-near
        node = jnp.where(is_leaf | ~active, 0, e - 1)
        cmin = blas4.c_min[obj, node].astype(jnp.float32)   # [B, 4, 3]
        cmax = blas4.c_max[obj, node].astype(jnp.float32)
        t0 = (cmin - o_l[:, None, :]) * inv_d[:, None, :]
        t1 = (cmax - o_l[:, None, :]) * inv_d[:, None, :]
        lo = jnp.max(jnp.minimum(t0, t1), axis=-1)          # [B, 4]
        hi = jnp.min(jnp.maximum(t0, t1), axis=-1)
        enter = jnp.maximum(lo, 0.0)
        # empty child slots carry inverted (inf, -inf) boxes; a negative
        # inv_d flips the slab interval to (-inf, inf), so mask them
        # explicitly rather than relying on the interval test
        cvalid = jnp.all(cmax >= cmin, axis=-1)             # [B, 4]
        chit = cvalid & (hi >= enter) & (enter <= best_t[:, None])
        chit = chit & (~is_leaf & active)[:, None]
        ent = blas4.c_entry[obj, node]                      # [B, 4]
        # stack encoding: inner e>=0 -> e+1 ; leaf e<0 stays
        enc = jnp.where(ent >= 0, ent + 1, ent)
        # sort the 4 children by enter distance (miss -> +inf) with a
        # 5-comparator network, then push in DESCENDING order so the
        # nearest child pops first
        dist = jnp.where(chit, enter, jnp.float32(jnp.inf))

        def cswap(d, en, hh, i, j):
            swap = d[:, i] > d[:, j]
            pick = lambda a: (
                a.at[:, i].set(jnp.where(swap, a[:, j], a[:, i]))
                .at[:, j].set(jnp.where(swap, a[:, i], a[:, j]))
            )
            return pick(d), pick(en), pick(hh)

        d_, en_, h_ = dist, enc, chit
        for (i, j) in ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)):
            d_, en_, h_ = cswap(d_, en_, h_, i, j)
        for s in (3, 2, 1, 0):                 # farthest pushed first
            do = h_[:, s] & (sp < stack_size)
            pos = jnp.minimum(sp, stack_size - 1)
            stack = stack.at[lanes, pos].set(
                jnp.where(do, en_[:, s], stack[lanes, pos])
            )
            sp = sp + do.astype(jnp.int32)
        return stack, sp, best_t, best_tri, best_u, best_v

    _, _, best_t, best_tri, best_u, best_v = jax.lax.while_loop(
        cond, body, (stack, sp, best_t, best_tri, best_u, best_v)
    )
    return best_t, best_tri, best_u, best_v


def _slab(nmin, nmax, o, inv_d, t_best):
    """Ray-AABB slab test. All [B, 3] / [B]. Returns (enter, hit)."""
    t0 = (nmin - o) * inv_d
    t1 = (nmax - o) * inv_d
    lo = jnp.max(jnp.minimum(t0, t1), axis=-1)
    hi = jnp.min(jnp.maximum(t0, t1), axis=-1)
    enter = jnp.maximum(lo, 0.0)
    return enter, (hi >= enter) & (enter <= t_best)


def trace_rays_blas(
    blas: BlasTables,
    obj: jnp.ndarray,       # [B] i32 object id per lane
    o_l: jnp.ndarray,       # [B, 3] ray origin, object-local
    d_l: jnp.ndarray,       # [B, 3] ray dir, object-local (unnormalized ok)
    live: jnp.ndarray,      # [B] bool lane mask
    t_max: float,
    stack_size: int = 48,
):
    """Vectorized ordered-DFS BVH walk over all lanes.

    Returns (t [B], tri [B] leaf-order slot or -1, u [B], v [B]).
    Matches ``assets/bvh.py::MeshBVH.trace_ray`` semantics (nearest hit,
    t in (1e-3, t_max)); cross-checked by tests/test_blas.py.
    """
    b = obj.shape[0]
    inv_d = jnp.where(
        jnp.abs(d_l) > 1e-12, 1.0 / d_l, jnp.float32(1e30)
    )
    stack = jnp.zeros((b, stack_size), jnp.int32)
    sp = live.astype(jnp.int32)                     # root pushed if live
    best_t = jnp.full((b,), t_max, jnp.float32)
    best_tri = jnp.full((b,), -1, jnp.int32)
    best_u = jnp.zeros((b,), jnp.float32)
    best_v = jnp.zeros((b,), jnp.float32)
    lanes = jnp.arange(b)

    def cond(c):
        return jnp.any(c[1] > 0)

    def body(c):
        stack, sp, best_t, best_tri, best_u, best_v = c
        active = sp > 0
        node = stack[lanes, jnp.maximum(sp - 1, 0)]
        sp = sp - active.astype(jnp.int32)

        nmin = blas.node_min[obj, node]             # [B, 3]
        nmax = blas.node_max[obj, node]
        _, node_hit = _slab(nmin, nmax, o_l, inv_d, best_t)
        node_hit = node_hit & active

        l = blas.left[obj, node]
        r = blas.right[obj, node]
        is_leaf = r <= 0

        # ---- leaf: masked Moller-Trumbore over the fixed leaf budget
        count = jnp.where(is_leaf & node_hit, -r, 0)
        for k in range(blas.max_leaf):
            ti = jnp.clip(l + k, 0, blas.tri_v0.shape[1] - 1)
            valid = k < count
            v0 = blas.tri_v0[obj, ti]
            e1 = blas.tri_e1[obj, ti]
            e2 = blas.tri_e2[obj, ti]
            p = jnp.cross(d_l, e2)
            det = jnp.sum(e1 * p, axis=-1)
            inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
            tv = o_l - v0
            u = jnp.sum(tv * p, axis=-1) * inv_det
            q = jnp.cross(tv, e1)
            v = jnp.sum(d_l * q, axis=-1) * inv_det
            t = jnp.sum(e2 * q, axis=-1) * inv_det
            hit = (
                valid & (jnp.abs(det) > 1e-12)
                & (u >= 0) & (v >= 0) & (u + v <= 1)
                & (t > 1e-3) & (t < best_t)
            )
            best_tri = jnp.where(hit, ti, best_tri)
            best_u = jnp.where(hit, u, best_u)
            best_v = jnp.where(hit, v, best_v)
            best_t = jnp.where(hit, t, best_t)

        # ---- inner: push children ordered (near child popped first)
        push = node_hit & ~is_leaf
        lmin = blas.node_min[obj, l]
        lmax = blas.node_max[obj, l]
        rmin = blas.node_min[obj, r]
        rmax = blas.node_max[obj, r]
        lt, lhit = _slab(lmin, lmax, o_l, inv_d, best_t)
        rt, rhit = _slab(rmin, rmax, o_l, inv_d, best_t)
        lhit = lhit & push
        rhit = rhit & push
        l_near = lt <= rt
        first = jnp.where(l_near, l, r)
        second = jnp.where(l_near, r, l)
        f_hit = jnp.where(l_near, lhit, rhit)
        s_hit = jnp.where(l_near, rhit, lhit)
        # push far first so near pops first
        can = sp < stack_size  # drop on overflow (sized to never happen)
        do_s = s_hit & can
        stack = stack.at[lanes, jnp.minimum(sp, stack_size - 1)].set(
            jnp.where(do_s, second, stack[lanes, jnp.minimum(sp, stack_size - 1)])
        )
        sp = sp + do_s.astype(jnp.int32)
        do_f = f_hit & (sp < stack_size)
        stack = stack.at[lanes, jnp.minimum(sp, stack_size - 1)].set(
            jnp.where(do_f, first, stack[lanes, jnp.minimum(sp, stack_size - 1)])
        )
        sp = sp + do_f.astype(jnp.int32)
        return stack, sp, best_t, best_tri, best_u, best_v

    _, _, best_t, best_tri, best_u, best_v = jax.lax.while_loop(
        cond, body, (stack, sp, best_t, best_tri, best_u, best_v)
    )
    return best_t, best_tri, best_u, best_v


def _trace_nearest(cfg, blas, inst_pos, inst_rot, inst_scale, inst_obj,
                   inst_mask, origins, dirs, t_max):
    """Nearest hit over all instances. Returns (depth [R], win [R]
    winning instance, tri [R] leaf slot or -1, u, v)."""
    i_n = inst_pos.shape[0]
    r_n = origins.shape[0]

    inv_q = m3.quat_inv(inst_rot)                       # [I, 4]
    scale = jnp.maximum(inst_scale, 1e-12)
    o_l = m3.quat_rotate(
        inv_q[:, None, :], origins[None, :, :] - inst_pos[:, None, :]
    ) / scale[:, None, :]                               # [I, R, 3]
    d_l = m3.quat_rotate(inv_q[:, None, :], dirs[None, :, :]) / (
        scale[:, None, :]
    )
    # NOTE: the affine map keeps the ray parameterization — p_l(t) =
    # (R^-1(p_w(t) - pos))/s — so local t IS world t; no correction.

    flat = lambda a: a.reshape((i_n * r_n,) + a.shape[2:])
    obj = jnp.repeat(inst_obj, r_n)
    live = jnp.repeat(inst_mask, r_n)
    walker = getattr(cfg, "blas_walker", "auto")
    o_n = blas.node_min.shape[0] * blas.node_min.shape[1]
    o_t = blas.tri_v0.shape[0] * blas.tri_v0.shape[1]
    if walker == "auto":
        # one-hot (MXU) walker wherever its [B, O*N]/[B, O*T] one-hots
        # are affordable — per-lane dynamic gathers are ~100x slower on
        # TPU; the gather walker remains for very large table sets
        # (and as the onehot walker's oracle)
        import jax as _jax

        walker = (
            "onehot"
            if (o_n <= 4096 and o_t <= 8192
                and _jax.default_backend() != "cpu")
            else ("wide" if blas.wide is not None else "gather")
        )
    if walker == "onehot":
        t, tri, u, v = trace_rays_blas_onehot(
            blas, obj, flat(o_l), flat(d_l), live, t_max
        )
    elif walker == "wide" and blas.wide is not None:
        t, tri, u, v = trace_rays_blas4(
            blas.wide, obj, flat(o_l), flat(d_l), live, t_max
        )
    else:
        t, tri, u, v = trace_rays_blas(
            blas, obj, flat(o_l), flat(d_l), live, t_max
        )
    t = t.reshape(i_n, r_n)
    tri = tri.reshape(i_n, r_n)
    u = u.reshape(i_n, r_n)
    v = v.reshape(i_n, r_n)
    win = jnp.argmin(t, axis=0)                         # [R]
    depth = jnp.min(t, axis=0)
    rr = jnp.arange(r_n)
    return depth, win, tri[win, rr], u[win, rr], v[win, rr]


def trace_scene_blas(
    cfg,
    blas: BlasTables,
    inst_pos, inst_rot, inst_scale, inst_obj, inst_mask,  # [I, ...]
    origins, dirs,                                        # [R, 3]
    materials=None,
    lights=None,
    shadow_scene=None,
):
    """Nearest hit over all instances via per-(instance, ray) walks;
    same contract as raycast._trace_rays: returns (rgb [R,3], depth [R]).

    With ``materials`` (render.materials.MaterialTables), hits shade as
    base_color x texture(uv) x (ambient + lambert), the reference's
    computeFragment path (bvh_raycast.cpp:776-790); otherwise flat
    per-tri colors. ``cfg.shadows`` adds one occlusion trace toward the
    light per pixel (bvh_raycast.cpp:898-912). With ``lights``
    (render.lights.Lights rows for this world, [L] capacity) shading
    runs the reference's full multi-light loop instead — directional +
    spotlight cones + per-light shadow casting
    (bvh_raycast.cpp:865-925); cfg.shadows then gates whether ANY
    occlusion rays are traced (one per light).

    ``shadow_scene``: optional (pos, rot, scale, obj, mask) instance set
    for occlusion traces. Callers that cull the primary set to a view
    frustum MUST pass the full set here — occluders outside the frustum
    still cast shadows into it (frustum culling is only valid for
    primary rays).
    """
    depth, win, w_tri_raw, u, v = _trace_nearest(
        cfg, blas, inst_pos, inst_rot, inst_scale, inst_obj, inst_mask,
        origins, dirs, cfg.t_max,
    )
    hit_any = w_tri_raw >= 0
    w_obj = inst_obj[win]
    w_tri = jnp.maximum(w_tri_raw, 0)

    e1 = blas.tri_e1[w_obj, w_tri]
    e2 = blas.tri_e2[w_obj, w_tri]
    n_l = jnp.cross(e1, e2)
    n_w = m3.quat_rotate(
        inst_rot[win], n_l / jnp.maximum(inst_scale[win], 1e-12)
    )
    n_w = n_w / jnp.maximum(
        jnp.linalg.norm(n_w, axis=-1, keepdims=True), 1e-12
    )

    if materials is not None and blas.tri_uv is not None:
        from .materials import sample_materials

        uvs = blas.tri_uv[w_obj, w_tri]                  # [R, 3, 2]
        uv = (
            uvs[:, 0]
            + u[:, None] * (uvs[:, 1] - uvs[:, 0])
            + v[:, None] * (uvs[:, 2] - uvs[:, 0])
        )
        mat = blas.tri_mat[w_obj, w_tri]
        albedo = sample_materials(materials, mat, uv)
    else:
        albedo = blas.tri_color[w_obj, w_tri]

    sh_pos, sh_rot, sh_scale, sh_obj, sh_mask = (
        shadow_scene if shadow_scene is not None
        else (inst_pos, inst_rot, inst_scale, inst_obj, inst_mask)
    )

    def shadow_trace(s_org, s_dir, t_limit):
        """Occluded iff something hits strictly BEFORE t_limit — for a
        spotlight that is the distance to the light; geometry beyond
        the light must not shadow (bvh_raycast.cpp traces the shadow
        segment, not an infinite ray)."""
        s_dep, _, s_tri, _, _ = _trace_nearest(
            cfg, blas, sh_pos, sh_rot, sh_scale, sh_obj,
            sh_mask, s_org, s_dir, cfg.t_max,
        )
        return (s_tri >= 0) & (s_dep < t_limit)

    if lights is not None:
        from .lights import light_contrib

        hit_p = origins + depth[:, None] * dirs
        contrib = light_contrib(
            lights, hit_p, n_w, hit_any, shadow_trace,
            use_shadows=bool(cfg.shadows),
        )
        # reference: acc = fmaxf(0.2, contrib) * color, clamped
        # (bvh_raycast.cpp:921-925); the floor here is cfg.ambient
        shade = jnp.maximum(jnp.float32(cfg.ambient), contrib)
        rgb = jnp.clip(albedo * shade[:, None], 0.0, 1.0)
        sky = jnp.asarray(cfg.sky_color, jnp.float32)
        rgb = jnp.where(hit_any[:, None], rgb, sky[None, :])
        depth = jnp.where(hit_any, depth, cfg.t_max)
        return rgb, depth

    # single hardcoded directional light (only reached when no light
    # table was given — computed after the multi-light early return)
    light = -jnp.asarray(
        np.array(cfg.light_dir) / np.linalg.norm(cfg.light_dir),
        jnp.float32,
    )
    lam = jnp.abs(jnp.sum(n_w * light, axis=-1))

    light_scale = jnp.ones_like(lam)
    if cfg.shadows:
        # occlusion trace from the hit point toward the light
        hit_p = origins + depth[:, None] * dirs
        s_org = hit_p + n_w * jnp.where(
            jnp.sum(n_w * light, axis=-1) >= 0, 1e-2, -1e-2
        )[:, None]
        occluded = shadow_trace(
            s_org, jnp.broadcast_to(light[None, :], s_org.shape),
            jnp.full(s_org.shape[:1], jnp.inf, jnp.float32),
        ) & hit_any
        light_scale = jnp.where(occluded, cfg.shadow_ambient, 1.0)

    shade = cfg.ambient + (1 - cfg.ambient) * lam * light_scale
    rgb = albedo * shade[:, None]
    sky = jnp.asarray(cfg.sky_color, jnp.float32)
    rgb = jnp.where(hit_any[:, None], rgb, sky[None, :])
    depth = jnp.where(hit_any, depth, cfg.t_max)
    return rgb, depth


def render_views_blas(
    cfg, blas: BlasTables, inst_pos, inst_rot, inst_scale, inst_obj,
    inst_mask, cam_pos, cam_rot, materials=None, lights=None,
    max_instances_per_view: int = 0,
):
    """BLAS-tier analogue of raycast.render_views ([W, ...] batches).
    ``inst_mask``: [W, I] shared or [W, V, I] per-view (ego cameras
    excluding their own body). ``lights``: render.lights.Lights with
    [W, L] tables (per-world slices feed the multi-light shading
    loop).

    ``max_instances_per_view`` > 0 runs the per-view frustum/top-K cull
    (render/tlas.py::cull_view_topk) over instance world AABBs derived
    from the BLAS root nodes BEFORE tracing, so the per-(instance, ray)
    lane count is bounded by K instead of the scene instance count —
    the reference's TLAS→BLAS two-level walk
    (bvh_raycast.cpp:225-520) expressed as cull-then-trace. Exact while
    ≤ K instances overlap a frustum; returns an extra [W, V] overlap
    count for overflow detection (else overlap is None)."""
    from .raycast import camera_rays

    h, w = cfg.height, cfg.width
    n_views = cam_pos.shape[1]
    if inst_mask.ndim == 2:
        inst_mask = jnp.broadcast_to(
            inst_mask[:, None, :],
            (inst_mask.shape[0], n_views, inst_mask.shape[1]),
        )
    k = max_instances_per_view

    from .kernel import (
        kernel_eligible, render_views_kernel, view_overlap_counts,
    )

    if kernel_eligible(cfg, blas, lights, k, inst_pos.shape[1]):
        # Pallas raycast megakernel tier: the whole per-view trace +
        # shadow pass in VMEM (ops/raycast_pallas — the analogue of the
        # reference's persistent raycast kernel,
        # bvh_raycast.cpp:940-1029). Same contract; the BVH-walking
        # tiers below remain the oracle / big-mesh path. With k > 0 the
        # kernel traces the FULL set (exact regardless of overlap) and
        # only the overlap-count export is computed from the cull math.
        out = render_views_kernel(
            cfg, blas, inst_pos, inst_rot, inst_scale, inst_obj,
            inst_mask, cam_pos, cam_rot, materials=materials,
            lights=lights,
        )
        if k > 0:
            overlap = view_overlap_counts(
                blas.node_min[:, 0], blas.node_max[:, 0],
                inst_pos, inst_rot, inst_scale, inst_obj, inst_mask,
                cam_pos, cam_rot, cfg,
            )
            return out[0], out[1], overlap
        return out

    def per_cam(ip, ir, isc, io, im, lt, cp, cr, lo=None, hi=None):
        o, d = camera_rays(cfg, cp, cr)
        n_overlap = None
        # occlusion rays always see the FULL instance set: an occluder
        # outside the view frustum still casts shadows into it
        shadow_scene = (ip, ir, isc, io, im)
        if k > 0:
            from .tlas import cull_view_topk

            idx, ok, n_overlap = cull_view_topk(
                lo, hi, im, cp, cr, k, cfg.fov_deg, w / h, cfg.t_max
            )
            oh = jax.nn.one_hot(idx, ip.shape[0], dtype=jnp.float32)
            pick = lambda a: jnp.einsum(
                "ki,i...->k...", oh, a.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            ip, ir, isc = pick(ip), pick(ir), pick(isc)
            io = (pick(io.astype(jnp.float32)) + 0.5).astype(jnp.int32)
            im = ok
        rays_o = o.reshape(-1, 3)
        rays_d = d.reshape(-1, 3)
        n_rays = rays_o.shape[0]
        rc = cfg.ray_chunk or (n_rays if n_rays <= 1024 else 1024)
        if rc < n_rays:
            # sequential ray chunks bound the (instance, ray, stack)
            # working set — one unchunked 64x64 view over a full world
            # batch allocates ~30 GB of traversal scratch. Exact: rays
            # are independent.
            if n_rays % rc:
                raise ValueError(
                    f"ray_chunk {rc} must divide rays/view {n_rays}"
                )
            ro = rays_o.reshape(-1, rc, 3)
            rd = rays_d.reshape(-1, rc, 3)
            rgb, dep = jax.lax.map(
                lambda od: trace_scene_blas(
                    cfg, blas, ip, ir, isc, io, im, od[0], od[1],
                    materials=materials, lights=lt,
                    shadow_scene=shadow_scene,
                ),
                (ro, rd),
            )
            rgb = rgb.reshape(n_rays, 3)
            dep = dep.reshape(n_rays)
        else:
            rgb, dep = trace_scene_blas(
                cfg, blas, ip, ir, isc, io, im,
                rays_o, rays_d, materials=materials,
                lights=lt, shadow_scene=shadow_scene,
            )
        return rgb.reshape(h, w, 3), dep.reshape(h, w), n_overlap

    def per_world(ip, ir, isc, io, ims, lt, cps, crs):
        lo = hi = None
        if k > 0:
            from .tlas import instance_world_aabbs

            # object AABBs = BLAS root nodes (slot 0)
            lo, hi = instance_world_aabbs(
                blas.node_min[:, 0], blas.node_max[:, 0],
                ip, ir, isc, io,
            )
        return jax.vmap(
            lambda im, cp, cr: per_cam(ip, ir, isc, io, im, lt, cp, cr,
                                       lo=lo, hi=hi)
        )(ims, cps, crs)

    args = (inst_pos, inst_rot, inst_scale, inst_obj, inst_mask, lights,
            cam_pos, cam_rot)
    n_worlds = inst_pos.shape[0]
    # world-chunk the vmapped render: the traversal working set scales
    # with (worlds x views x rays x instances x stack); big-image whole
    # batches exceed HBM (a 256-world 4-view 64x64 render allocates
    # ~30+ GB unchunked). Sequential over chunks, exact.
    # 2^17 view-ray lanes per chunk: the scanned step's BLAS walk
    # device-faults at 256-world 4-view 16px batches (and HBM-OOMs at
    # 64px); <=128-world-equivalent chunks are measured stable
    budget = 1 << 17
    per_world_rays = n_views * h * w
    wc = max(1, min(n_worlds, budget // max(per_world_rays, 1)))
    if wc < n_worlds:
        # pad the world batch up to a multiple of the chunk size by
        # replicating the last world (valid data, sliced off below) —
        # a largest-divisor fallback degrades to wc=1 on prime world
        # counts and unrolls n_worlds separate vmap bodies (compile
        # blowup; round-4 advisor).
        n_pad = -n_worlds % wc
        if n_pad:
            args = jax.tree_util.tree_map(
                lambda a: jnp.concatenate(
                    [a, jnp.repeat(a[-1:], n_pad, axis=0)], axis=0
                ), args
            )
        # unrolled chunk loop (NOT lax.map): a nested scan inside the
        # caller's step scan device-faults on this backend; the unroll
        # compiles each chunk as straight-line code with the same
        # bounded working set
        outs = []
        for c0 in range(0, n_worlds + n_pad, wc):
            ch = jax.tree_util.tree_map(
                lambda a, c0=c0: a[c0:c0 + wc], args
            )
            outs.append(jax.vmap(per_world)(*ch))
        cat = lambda xs: jnp.concatenate(xs, axis=0)[:n_worlds]
        rgb = cat([o[0] for o in outs])
        dep = cat([o[1] for o in outs])
        if k > 0:
            return rgb, dep, cat([o[2] for o in outs])
        return rgb, dep
    rgb, dep, overlap = jax.vmap(per_world)(*args)
    if k > 0:
        return rgb, dep, overlap
    return rgb, dep


# ------------------------------------------------- one-hot (MXU) walker


def trace_rays_blas_onehot(
    blas: BlasTables,
    obj: jnp.ndarray,       # [B] i32 object id per lane
    o_l: jnp.ndarray,       # [B, 3]
    d_l: jnp.ndarray,       # [B, 3]
    live: jnp.ndarray,      # [B] bool
    t_max: float,
    stack_size: int = 48,
):
    """The binary BVH walk with every per-lane memory op rebuilt for the
    TPU: node/tri fetches are one-hot matmuls against packed tables
    (MXU) and stack pops/pushes are one-hot selects/blends (VPU) — no
    XLA gather/scatter anywhere. Bit-identical traversal decisions to
    :func:`trace_rays_blas` (same slab tests, same near-first ordering,
    same leaf budget); measured ~100x faster at batch scale on v5e,
    where the gather walker's per-lane dynamic fetches dominate wall
    time (the reference's CUDA walker leans on hardware gathers the TPU
    does not have — mesh_bvh.hpp traceRay).

    Scope: table sizes where the [B, O*N]/[B, O*T] one-hots are
    affordable (small-to-medium meshes — tens to a few hundred tris per
    object). ``_trace_nearest`` auto-selects per table size.
    """
    b = obj.shape[0]
    o_n = blas.node_min.shape[0] * blas.node_min.shape[1]
    o_t = blas.tri_v0.shape[0] * blas.tri_v0.shape[1]
    n_nodes = blas.node_min.shape[1]
    n_tris = blas.tri_v0.shape[1]

    # packed node table [O*N, 8]: min xyz | max xyz | left | right
    node_pack = jnp.concatenate(
        [
            blas.node_min.reshape(o_n, 3),
            blas.node_max.reshape(o_n, 3),
            blas.left.reshape(o_n, 1).astype(jnp.float32),
            blas.right.reshape(o_n, 1).astype(jnp.float32),
        ],
        axis=1,
    )
    # packed tri table [O*T, 9]: v0 | e1 | e2
    tri_pack = jnp.concatenate(
        [
            blas.tri_v0.reshape(o_t, 3),
            blas.tri_e1.reshape(o_t, 3),
            blas.tri_e2.reshape(o_t, 3),
        ],
        axis=1,
    )
    obj_base_n = obj * n_nodes                      # [B]
    obj_base_t = obj * n_tris

    iota_on = jnp.arange(o_n)[None, :]              # [1, O*N]
    iota_ot = jnp.arange(o_t)[None, :]
    iota_s = jnp.arange(stack_size)[None, :]        # [1, S]

    def fetch_node(node):
        oh = (iota_on == (obj_base_n + node)[:, None]).astype(jnp.float32)
        f = jax.lax.dot_general(
            oh, node_pack, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )                                           # [B, 8]
        return f

    def fetch_tri(ti):
        oh = (iota_ot == (obj_base_t + ti)[:, None]).astype(jnp.float32)
        return jax.lax.dot_general(
            oh, tri_pack, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )                                           # [B, 9]

    inv_d = jnp.where(
        jnp.abs(d_l) > 1e-12, 1.0 / d_l, jnp.float32(1e30)
    )
    stack = jnp.zeros((b, stack_size), jnp.float32)
    sp = live.astype(jnp.int32)
    best_t = jnp.full((b,), t_max, jnp.float32)
    best_tri = jnp.full((b,), -1, jnp.int32)
    best_u = jnp.zeros((b,), jnp.float32)
    best_v = jnp.zeros((b,), jnp.float32)

    def cond(c):
        return jnp.any(c[1] > 0)

    def body(c):
        stack, sp, best_t, best_tri, best_u, best_v = c
        active = sp > 0
        oh_pop = (iota_s == (sp - 1)[:, None]).astype(jnp.float32)
        node = jnp.sum(stack * oh_pop, axis=1).astype(jnp.int32)
        sp = sp - active.astype(jnp.int32)

        nf = fetch_node(node)
        nmin, nmax = nf[:, 0:3], nf[:, 3:6]
        l = nf[:, 6].astype(jnp.int32)
        r_f = nf[:, 7]
        r = r_f.astype(jnp.int32)
        _, node_hit = _slab(nmin, nmax, o_l, inv_d, best_t)
        node_hit = node_hit & active
        is_leaf = r <= 0

        count = jnp.where(is_leaf & node_hit, -r, 0)
        for k in range(blas.max_leaf):
            ti = jnp.clip(l + k, 0, n_tris - 1)
            valid = k < count
            tf = fetch_tri(ti)
            v0, e1, e2 = tf[:, 0:3], tf[:, 3:6], tf[:, 6:9]
            p = jnp.cross(d_l, e2)
            det = jnp.sum(e1 * p, axis=-1)
            inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
            tv = o_l - v0
            u = jnp.sum(tv * p, axis=-1) * inv_det
            q = jnp.cross(tv, e1)
            v = jnp.sum(d_l * q, axis=-1) * inv_det
            t = jnp.sum(e2 * q, axis=-1) * inv_det
            hit = (
                valid & (jnp.abs(det) > 1e-12)
                & (u >= 0) & (v >= 0) & (u + v <= 1)
                & (t > 1e-3) & (t < best_t)
            )
            best_tri = jnp.where(hit, ti, best_tri)
            best_u = jnp.where(hit, u, best_u)
            best_v = jnp.where(hit, v, best_v)
            best_t = jnp.where(hit, t, best_t)

        push = node_hit & ~is_leaf
        lf = fetch_node(l)
        rf = fetch_node(r)
        lt, lhit = _slab(lf[:, 0:3], lf[:, 3:6], o_l, inv_d, best_t)
        rt, rhit = _slab(rf[:, 0:3], rf[:, 3:6], o_l, inv_d, best_t)
        lhit = lhit & push
        rhit = rhit & push
        l_near = lt <= rt
        first = jnp.where(l_near, l, r).astype(jnp.float32)
        second = jnp.where(l_near, r, l).astype(jnp.float32)
        f_hit = jnp.where(l_near, lhit, rhit)
        s_hit = jnp.where(l_near, rhit, lhit)

        def oh_push(stack, sp, val, do):
            m = (iota_s == sp[:, None]) & do[:, None]
            mf = m.astype(jnp.float32)
            stack = stack * (1.0 - mf) + val[:, None] * mf
            return stack, sp + do.astype(jnp.int32)

        stack, sp = oh_push(stack, sp, second, s_hit & (sp < stack_size))
        stack, sp = oh_push(stack, sp, first, f_hit & (sp < stack_size))
        return stack, sp, best_t, best_tri, best_u, best_v

    _, _, best_t, best_tri, best_u, best_v = jax.lax.while_loop(
        cond, body, (stack, sp, best_t, best_tri, best_u, best_v)
    )
    return best_t, best_tri, best_u, best_v
