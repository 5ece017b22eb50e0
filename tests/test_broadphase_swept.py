"""Sweep-and-prune broadphase tier (physics/broadphase.py::
find_candidates_swept) vs the all-pairs oracle — the many-body analogue
of the reference's AABB-tree candidates (broadphase.cpp:487-1027)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from madrona_tpu.physics import bodies, broadphase as bp
from madrona_tpu.physics.xpbd import BodyState


def _random_bodies(w, n, seed, span=20.0):
    reg = bodies.ObjectRegistry()
    reg.add_box([0.5, 0.5, 0.5], mass=1.0)                 # 0
    reg.add_sphere(0.4, mass=1.0)                          # 1
    reg.add_box([4.0, 4.0, 0.25], mass=0.0,
                response=bodies.RESPONSE_STATIC)           # 2
    om = reg.build()
    rs = np.random.RandomState(seed)
    pos = rs.uniform(-span, span, size=(w, n, 3)).astype(np.float32)
    obj = rs.randint(0, 3, size=(w, n)).astype(np.int32)
    resp = np.where(
        obj == 2, bodies.RESPONSE_STATIC, bodies.RESPONSE_DYNAMIC
    ).astype(np.int32)
    vel = rs.uniform(-2, 2, size=(w, n, 3)).astype(np.float32)
    active = rs.uniform(size=(w, n)) < 0.9
    z3 = jnp.zeros((w, n, 3), jnp.float32)
    ident = jnp.tile(
        jnp.asarray([1.0, 0, 0, 0], jnp.float32)[None, None], (w, n, 1)
    )
    body = BodyState(
        pos=jnp.asarray(pos), rot=ident,
        scale=jnp.ones((w, n, 3), jnp.float32),
        vel=jnp.asarray(vel), omega=z3,
        obj_id=jnp.asarray(obj), response=jnp.asarray(resp),
        ext_force=z3, ext_torque=z3,
        prev_x=jnp.asarray(pos), prev_q=ident,
        presolve_x=jnp.asarray(pos), presolve_q=ident,
        presolve_v=jnp.asarray(vel), presolve_w=z3,
        active=jnp.asarray(active),
    )
    return body, om


def _pair_sets(c, n):
    """Set of (a, b) per world per buffer, order-normalized."""
    out = []
    for wi in range(c.hh.shape[0]):
        s = set()
        for buf, num in ((c.hh, c.hh_num), (c.hp, c.hp_num),
                         (c.sp, c.sp_num)):
            k = int(num[wi])
            for j in range(k):
                a, b = int(buf[wi, j, 0]), int(buf[wi, j, 1])
                assert a < n and b < n
                s.add((min(a, b), max(a, b)))
        out.append(s)
    return out


def test_swept_matches_all_pairs():
    w, n = 4, 64
    body, om = _random_bodies(w, n, seed=0)
    caps = bp.CandidateCaps(hull_hull=256, hull_plane=64, sphere_any=256)
    ref = bp.find_candidates(body, om, caps, 1.0 / 30.0)
    got = bp.find_candidates_swept(
        body, om, caps, 1.0 / 30.0, window=n  # full window: must be exact
    )
    assert not bool(np.asarray(got.overflow).any())
    rs, gs = _pair_sets(ref, n), _pair_sets(got, n)
    for wi in range(w):
        assert rs[wi] == gs[wi], (wi, rs[wi] ^ gs[wi])


def test_swept_windowed_exact_when_no_overflow():
    w, n = 4, 128
    body, om = _random_bodies(w, n, seed=3, span=60.0)  # sparse scene
    caps = bp.CandidateCaps(hull_hull=256, hull_plane=128, sphere_any=256)
    ref = bp.find_candidates(body, om, caps, 1.0 / 30.0)
    got = bp.find_candidates_swept(
        body, om, caps, 1.0 / 30.0, window=16
    )
    if bool(np.asarray(got.overflow).any()):
        # seed chosen so this shouldn't happen; fail loudly if it does
        raise AssertionError("window saturated in the sparse scene")
    rs, gs = _pair_sets(ref, n), _pair_sets(got, n)
    for wi in range(w):
        assert rs[wi] == gs[wi]


def test_swept_overflow_flags_dense_world():
    w, n = 2, 64
    body, om = _random_bodies(w, n, seed=1, span=1.5)   # everything piled
    caps = bp.CandidateCaps(hull_hull=512, hull_plane=256, sphere_any=512)
    got = bp.find_candidates_swept(body, om, caps, 1.0 / 30.0, window=4)
    assert bool(np.asarray(got.overflow).all())
    full = bp.find_candidates_swept(body, om, caps, 1.0 / 30.0, window=n)
    assert not bool(np.asarray(full.overflow).any())


def test_first_index_geq_power_of_two_lengths():
    """Regression (round-4 advisor, high): the unrolled binary search ran
    ceil(log2(P)) steps — one short when P is a power of two, silently
    dropping a hit at index 1. Exercise exactly that shape for each
    power-of-two P plus random masks, vs np.searchsorted."""
    for p_len in (2, 4, 8, 16, 1024):
        # single hit at index 1 (the advisor's repro)
        mask = np.zeros((1, p_len), np.int32)
        mask[0, 1] = 1
        pos_inc = np.cumsum(mask, axis=1).astype(np.int32)
        cap = 4
        targets = np.arange(1, cap + 1, dtype=np.int32)
        idx = np.asarray(
            bp.first_index_geq(jnp.asarray(pos_inc), jnp.asarray(targets))
        )
        ref = np.minimum(
            np.searchsorted(pos_inc[0], targets, side="left"), p_len - 1
        )
        assert (idx[0] == ref).all(), (p_len, idx[0], ref)
        got = pos_inc[0][idx[0]] == targets
        assert got[0] and not got[1:].any()
        # random masks, several worlds
        rs = np.random.RandomState(p_len)
        m = (rs.uniform(size=(3, p_len)) < 0.3).astype(np.int32)
        pi = np.cumsum(m, axis=1).astype(np.int32)
        idx = np.asarray(
            bp.first_index_geq(jnp.asarray(pi), jnp.asarray(targets))
        )
        for wi in range(3):
            ref = np.minimum(
                np.searchsorted(pi[wi], targets, side="left"), p_len - 1
            )
            assert (idx[wi] == ref).all(), (p_len, wi)


def test_swept_ignores_dead_rows():
    w, n = 2, 32
    body, om = _random_bodies(w, n, seed=2, span=2.0)
    body = dataclasses.replace(body, active=jnp.zeros((w, n), bool))
    caps = bp.CandidateCaps()
    got = bp.find_candidates_swept(body, om, caps, 1.0 / 30.0, window=8)
    assert int(np.asarray(got.hh_num).sum()) == 0
    assert int(np.asarray(got.hp_num).sum()) == 0
    assert int(np.asarray(got.sp_num).sum()) == 0
    assert not bool(np.asarray(got.overflow).any())
