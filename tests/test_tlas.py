"""TLAS tier tests: LBVH build validity, traversal completeness vs
brute force, and per-view culled rendering vs the dense tracer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madrona_tpu.render.tlas import (
    TLAS, build_tlas, tlas_candidates, instance_world_aabbs, object_aabbs,
    cull_view_topk, render_views_tlas,
)
from madrona_tpu.render.mesh import MeshRegistry
from madrona_tpu.render.raycast import RenderConfig, render_views


def _random_aabbs(rs, n, dead=0):
    c = rs.uniform(-20, 20, (n, 3)).astype(np.float32)
    e = rs.uniform(0.2, 2.0, (n, 3)).astype(np.float32)
    lo, hi = c - e, c + e
    mask = np.ones(n, bool)
    if dead:
        mask[rs.choice(n, dead, replace=False)] = False
    return jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(mask)


def _tree_to_host(t: TLAS):
    return jax.tree_util.tree_map(np.asarray, t)


@pytest.mark.parametrize("n", [2, 3, 17, 64])
def test_lbvh_build_validity(n):
    rs = np.random.RandomState(n)
    lo, hi, mask = _random_aabbs(rs, n)
    t = _tree_to_host(jax.jit(
        lambda a, b, m: build_tlas(a, b, m, [-25.0] * 3, [25.0] * 3)
    )(lo, hi, mask))

    leaf0 = n - 1
    # every instance appears exactly once as a leaf
    assert sorted(t.inst.tolist()) == list(range(n))
    # walk the tree from the root; every live leaf must be reachable and
    # every internal AABB must contain its children
    seen = []
    stack = [0]
    while stack:
        p = stack.pop()
        if p >= leaf0:
            seen.append(p - leaf0)
            continue
        l = int(t.left[p])
        r = int(t.skip[l]) if l < leaf0 else None
        # right child: skip of the left child
        r = int(t.skip[l])
        for c in (l, r):
            assert (t.node_lo[p] <= t.node_lo[c] + 1e-5).all()
            assert (t.node_hi[p] >= t.node_hi[c] - 1e-5).all()
            stack.append(c)
    assert sorted(seen) == list(range(n))


def test_lbvh_traversal_matches_bruteforce():
    rs = np.random.RandomState(0)
    n, k = 32, 16
    lo, hi, mask = _random_aabbs(rs, n, dead=4)
    tl = jax.jit(
        lambda a, b, m: build_tlas(a, b, m, [-25.0] * 3, [25.0] * 3)
    )(lo, hi, mask)

    r = 64
    o = rs.uniform(-30, 30, (r, 3)).astype(np.float32)
    d = rs.randn(r, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t_max = 100.0
    cands, cnt = jax.jit(
        lambda t, oo, dd: tlas_candidates(t, oo, dd, k, t_max)
    )(tl, jnp.asarray(o), jnp.asarray(d))
    cands, cnt = np.asarray(cands), np.asarray(cnt)

    lo_h, hi_h, mask_h = np.asarray(lo), np.asarray(hi), np.asarray(mask)
    for ri in range(r):
        expect = set()
        for i in range(n):
            if not mask_h[i]:
                continue
            inv = 1.0 / np.where(np.abs(d[ri]) > 1e-12, d[ri], 1e-12)
            t0 = (lo_h[i] - o[ri]) * inv
            t1 = (hi_h[i] - o[ri]) * inv
            tn = np.minimum(t0, t1).max()
            tf = np.maximum(t0, t1).min()
            if tn <= tf and tf > 0 and tn < t_max:
                expect.add(i)
        got = set(int(x) for x in cands[ri] if x >= 0)
        assert cnt[ri] == len(expect)
        if len(expect) <= k:
            assert got == expect
        else:
            assert got <= expect and len(got) == k


def _toy_scene(rs, w, n_inst, n_views):
    reg = MeshRegistry()
    reg.add_box(0.5, color=(0.9, 0.2, 0.2))
    reg.add_box((0.3, 0.8, 0.4), color=(0.2, 0.9, 0.2))
    reg.add_quad(40.0)
    mesh = reg.build()
    pos = rs.uniform(-10, 10, (w, n_inst, 3)).astype(np.float32)
    pos[..., 2] = rs.uniform(0.5, 3.0, (w, n_inst))
    pos[:, 0] = 0.0                       # instance 0: ground quad
    ax = rs.randn(w, n_inst, 3)
    ax /= np.linalg.norm(ax, axis=-1, keepdims=True)
    ang = rs.uniform(0, np.pi, (w, n_inst, 1))
    rot = np.concatenate(
        [np.cos(ang / 2), ax * np.sin(ang / 2)], axis=-1
    ).astype(np.float32)
    rot[:, 0] = [1, 0, 0, 0]
    scale = np.ones((w, n_inst, 3), np.float32)
    obj = rs.randint(0, 2, (w, n_inst)).astype(np.int32)
    obj[:, 0] = 2
    inst_mask = np.ones((w, n_inst), bool)
    cam_pos = np.zeros((w, n_views, 3), np.float32)
    cam_pos[..., 2] = 1.5
    cam_pos[..., 1] = -12.0
    cam_rot = np.tile(
        np.array([1, 0, 0, 0], np.float32), (w, n_views, 1)
    )
    return mesh, *(jnp.asarray(x) for x in
                   (pos, rot, scale, obj, inst_mask, cam_pos, cam_rot))


def test_render_views_tlas_matches_dense_when_k_covers():
    rs = np.random.RandomState(7)
    cfg = RenderConfig(width=24, height=16, t_max=60.0)
    mesh, pos, rot, scale, obj, mask, cpos, crot = _toy_scene(rs, 2, 12, 1)
    rgb_d, dep_d = jax.jit(
        lambda *a: render_views(cfg, mesh, *a)
    )(pos, rot, scale, obj, mask, cpos, crot)
    rgb_t, dep_t, overlap = jax.jit(
        lambda *a: render_views_tlas(cfg, mesh, *a,
                                     max_instances_per_view=12)
    )(pos, rot, scale, obj, mask, cpos, crot)
    assert int(np.max(np.asarray(overlap))) <= 12
    np.testing.assert_allclose(
        np.asarray(dep_t), np.asarray(dep_d), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(rgb_t), np.asarray(rgb_d), atol=1e-4
    )


def test_cull_view_topk_keeps_frustum_hits():
    rs = np.random.RandomState(3)
    n = 24
    lo, hi, mask = _random_aabbs(rs, n)
    cam_pos = jnp.asarray([0.0, -30.0, 0.0])
    cam_rot = jnp.asarray([1.0, 0.0, 0.0, 0.0])   # +y forward
    idx, ok, cnt = jax.jit(
        lambda *a: cull_view_topk(*a, k=n, fov_deg=90.0, aspect=1.0,
                                  t_max=200.0)
    )(lo, hi, mask, cam_pos, cam_rot)
    idx, ok, cnt = np.asarray(idx), np.asarray(ok), int(cnt)
    kept = set(idx[ok].tolist())
    # everything in front of the camera within the 90deg cone must be kept
    lo_h, hi_h = np.asarray(lo), np.asarray(hi)
    c = (lo_h + hi_h) / 2
    r = np.linalg.norm((hi_h - lo_h) / 2, axis=1)
    rel = c - np.asarray(cam_pos)
    half = np.tan(np.radians(45.0))
    strictly_inside = (
        (rel[:, 1] > r)
        & (np.abs(rel[:, 0]) + r < half * rel[:, 1])
        & (np.abs(rel[:, 2]) + r < half * rel[:, 1])
    )
    for i in np.nonzero(strictly_inside)[0]:
        assert int(i) in kept
    assert cnt == len(kept)


def test_tlas_single_instance():
    lo = jnp.asarray([[-1.0, -1.0, -1.0]])
    hi = jnp.asarray([[1.0, 1.0, 1.0]])
    t = jax.jit(
        lambda a, b: build_tlas(a, b, jnp.ones(1, bool),
                                [-2.0] * 3, [2.0] * 3)
    )(lo, hi)
    o = jnp.asarray([[0.0, -5.0, 0.0], [0.0, -5.0, 4.0]])
    d = jnp.asarray([[0.0, 1.0, 0.0], [0.0, 1.0, 0.0]])
    cands, cnt = tlas_candidates(t, o, d, 4, 100.0)
    assert np.asarray(cnt).tolist() == [1, 0]
    assert int(cands[0, 0]) == 0


def test_adaptive_tlas_k_grows():
    """TlasOverlap export + RenderingSystem.maybe_grow_tlas: a K too
    small for the scene reports the true overlap and re-tiers."""
    import numpy as np
    import jax.numpy as jnp
    from madrona_tpu.models.base import make_sim
    from madrona_tpu.models.hide_seek import HideSeek

    w = 2
    env = HideSeek(render_size=8, pixels=True, tlas_max_instances=2)
    sim = make_sim(env, num_worlds=w, seed=0, donate=False)
    step = sim.step_fn()
    s = sim.state
    acts = HideSeek.random_actions(np.random.RandomState(0), 2, w)
    for t in range(2):
        s, o = step(s, {"action": acts[t],
                        "reset": jnp.zeros((w,), jnp.int32)})
    sim.state = s
    overlap = np.asarray(o["tlas_overlap"])
    assert overlap.shape == (w, len(env.rsys.camera_rows))
    assert overlap.max() > 2      # scene has 11 instances; K=2 saturates
    new_k = env.rsys.maybe_grow_tlas(sim.executor)
    assert new_k >= overlap.max()
    assert env.rsys.tlas_max_instances == new_k
    # re-traced step at the new tier still runs (fresh compile)
    o = sim.step({"action": acts[0], "reset": jnp.zeros((w,), jnp.int32)})
    assert np.isfinite(np.asarray(o["rgb"])).all()
    assert np.asarray(o["tlas_overlap"]).shape == (w, len(env.rsys.camera_rows))


def test_build_tlas_zero_instances_safe():
    """Zero-instance scenes build a consistent 1-node never-hit TLAS
    (size-0 node arrays would make the candidate walk gather OOB)."""
    from madrona_tpu.render.tlas import build_tlas, tlas_candidates

    empty = jnp.zeros((0, 3), jnp.float32)
    t = build_tlas(empty, empty, jnp.zeros((0,), bool),
                   jnp.zeros((3,)), jnp.ones((3,)))
    assert t.node_lo.shape[0] == 1 and t.left.shape[0] == 1
    assert int(np.asarray(t.inst)[0]) == -1
    cand, n = tlas_candidates(
        t, jnp.zeros((4, 3), jnp.float32),
        jnp.tile(jnp.asarray([[0.0, 0, -1.0]]), (4, 1)),
        4, 100.0,
    )
    assert (np.asarray(n) == 0).all()
    assert (np.asarray(cand) < 0).all()
