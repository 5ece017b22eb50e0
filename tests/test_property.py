"""Property-based tests (hypothesis): ECS op invariants, quaternion
algebra, RNG stream independence, and SAT-vs-GJK consistency fuzzing
(SURVEY.md §4 "test strategy" — randomized invariants on the substrate
the envs are built from)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from madrona_tpu.core import archetype as arch
from madrona_tpu.core.component import ArchetypeSpec, ComponentSpec
from madrona_tpu.utils import math3d as m3
from madrona_tpu.utils import rng as _rng
from madrona_tpu.utils.morton import morton3d

SET = settings(max_examples=20, deadline=None)


def _table(w, cap):
    comp = {"V": ComponentSpec("V", (2,), jnp.float32)}
    spec = ArchetypeSpec(
        name="T", components=("V",), capacity=cap, no_entities=True
    )
    return arch.make_table(spec, comp, w)


# ------------------------------------------------------------- ECS appends


@SET
@given(st.data())
def test_append_many_invariants(data):
    w = data.draw(st.integers(1, 4))
    cap = data.draw(st.integers(1, 8))
    k = data.draw(st.integers(1, 12))
    valid = np.asarray(
        data.draw(
            st.lists(
                st.lists(st.booleans(), min_size=k, max_size=k),
                min_size=w, max_size=w,
            )
        )
    )
    t = _table(w, cap)
    vals = np.arange(w * k * 2, dtype=np.float32).reshape(w, k, 2)
    t2 = arch.append_many(
        t, {"V": jnp.asarray(vals)}, jnp.asarray(valid)
    )
    for wi in range(w):
        want = vals[wi][valid[wi]]
        kept = min(len(want), cap)
        # counts: num_rows = kept, overflow = dropped
        assert int(t2.num_rows[wi]) == kept
        assert int(t2.overflow[wi]) == len(want) - kept
        # values land compacted, in order
        np.testing.assert_array_equal(
            np.asarray(t2.columns["V"])[wi, :kept], want[:kept]
        )
        # rows beyond num_rows untouched (zeros from make_table)
        np.testing.assert_array_equal(
            np.asarray(t2.columns["V"])[wi, kept:], 0.0
        )


@SET
@given(st.data())
def test_gather_rows_preserves_rows(data):
    w = data.draw(st.integers(1, 3))
    cap = 6
    t = _table(w, cap)
    vals = np.random.RandomState(0).randn(w, cap, 2).astype(np.float32)
    t = dataclasses.replace(
        t, columns={"V": jnp.asarray(vals)},
        num_rows=jnp.full((w,), cap, jnp.int32),
    )
    perms = np.stack(
        [np.random.RandomState(data.draw(st.integers(0, 999))).permutation(cap)
         for _ in range(w)]
    ).astype(np.int32)
    t2 = arch.gather_rows(t, jnp.asarray(perms))
    for wi in range(w):
        np.testing.assert_array_equal(
            np.asarray(t2.columns["V"])[wi], vals[wi][perms[wi]]
        )


# ------------------------------------------------------------ quaternions


finite3 = st.lists(
    st.floats(-10, 10, allow_nan=False, width=32), min_size=3, max_size=3
)
quat4 = st.lists(
    st.floats(-1, 1, allow_nan=False, width=32), min_size=4, max_size=4
).filter(lambda q: sum(x * x for x in q) > 1e-2)


@SET
@given(quat4, finite3)
def test_quat_rotate_preserves_norm(q, v):
    qn = m3.quat_normalize(jnp.asarray(q))
    r = m3.quat_rotate(qn, jnp.asarray(v))
    np.testing.assert_allclose(
        float(jnp.linalg.norm(r)), float(jnp.linalg.norm(jnp.asarray(v))),
        rtol=1e-4, atol=1e-5,
    )


@SET
@given(quat4, finite3)
def test_quat_rotate_inv_roundtrip(q, v):
    qn = m3.quat_normalize(jnp.asarray(q))
    v = jnp.asarray(v)
    back = m3.quat_rotate(m3.quat_inv(qn), m3.quat_rotate(qn, v))
    np.testing.assert_allclose(np.asarray(back), np.asarray(v),
                               rtol=1e-3, atol=1e-4)


@SET
@given(quat4, quat4, finite3)
def test_quat_mul_composes_rotations(a, b, v):
    qa = m3.quat_normalize(jnp.asarray(a))
    qb = m3.quat_normalize(jnp.asarray(b))
    v = jnp.asarray(v)
    lhs = m3.quat_rotate(m3.quat_mul(qa, qb), v)
    rhs = m3.quat_rotate(qa, m3.quat_rotate(qb, v))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                               rtol=2e-3, atol=2e-4)


# ------------------------------------------------------------------- RNG


@SET
@given(st.integers(0, 2**31 - 1), st.integers(0, 2**31 - 1))
def test_rng_streams_deterministic_and_distinct(seed, idx):
    k = _rng.key(jnp.full((1,), seed, jnp.uint32))
    a = _rng.sample_uniform(_rng.split_i(k, jnp.full((1,), idx, jnp.uint32)))
    b = _rng.sample_uniform(_rng.split_i(k, jnp.full((1,), idx, jnp.uint32)))
    c = _rng.sample_uniform(
        _rng.split_i(k, jnp.full((1,), (idx + 1) % 2**31, jnp.uint32))
    )
    a, b, c = float(a[0]), float(b[0]), float(c[0])
    assert a == b                          # deterministic
    assert 0.0 <= a < 1.0
    assert a != c                          # distinct streams


# ----------------------------------------------------------------- morton


@SET
@given(st.lists(st.integers(0, 1023), min_size=3, max_size=3),
       st.lists(st.integers(0, 1023), min_size=3, max_size=3))
def test_morton_injective_on_grid(p, q):
    lo, hi = [0.0] * 3, [1023.0] * 3
    cp = morton3d(jnp.asarray(p, jnp.float32) + 0.0001, lo, hi)
    cq = morton3d(jnp.asarray(q, jnp.float32) + 0.0001, lo, hi)
    if p == q:
        assert int(cp) == int(cq)
    else:
        assert int(cp) != int(cq)


# --------------------------------------------------- SAT vs GJK fuzzing


def _sat_gjk_case():
    from madrona_tpu.physics import bodies, gjk, narrowphase as nph

    reg = bodies.ObjectRegistry()
    reg.add_box([1.0, 0.7, 0.5], mass=1.0)
    om = reg.build()
    ident = jnp.asarray([1.0, 0, 0, 0])
    one = jnp.ones(3)

    def run(pos_b, q_b):
        ha = nph.hull_to_world(om, 0, jnp.zeros(3), ident, one)
        hb = nph.hull_to_world(om, 0, pos_b, q_b, one)
        sep_a, _ = nph.query_face_directions(ha, hb)
        sep_b, _ = nph.query_face_directions(hb, ha)
        sep_e = nph.query_edge_directions(ha, hb)[0]
        sat = jnp.maximum(jnp.maximum(sep_a, sep_b), sep_e)
        d2 = gjk.hull_hull_distance2(
            ha.verts, ha.verts_mask, hb.verts, hb.verts_mask
        )
        return sat, d2

    return jax.jit(run)


_SAT_GJK = None


@settings(max_examples=25, deadline=None)
@given(finite3, quat4)
def test_sat_gjk_consistency_fuzz(pos, q):
    """SAT separation is a lower bound on GJK distance when separated;
    overlap per SAT implies GJK distance 0."""
    global _SAT_GJK
    if _SAT_GJK is None:
        _SAT_GJK = _sat_gjk_case()
    qn = m3.quat_normalize(jnp.asarray(q))
    sat, d2 = _SAT_GJK(jnp.asarray(pos), qn)
    sat, dist = float(sat), float(np.sqrt(max(float(d2), 0.0)))
    if sat > 1e-3:
        assert sat <= dist * (1 + 2e-3) + 2e-4, (sat, dist)
    elif sat < -1e-3:
        assert dist <= 1e-3, (sat, dist)
