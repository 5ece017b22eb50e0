"""Counter-based RNG with Threefry2x32 key splitting.

TPU-native re-implementation of the reference's RNG layer
(``include/madrona/rand.hpp:9-56``, ``include/madrona/rand.inl:12-16``).
The reference explicitly models its key-splitting on JAX's threefry
implementation (20 rounds), so bit-level parity between this module and the
reference C++ is achievable: ``split_i`` here produces the identical key
stream for identical inputs.

Everything is expressed in vectorized ``jnp.uint32`` ops so keys can be
split for ``[num_worlds]`` or ``[num_worlds, num_entities]`` batches in one
fused XLA computation — the TPU-idiomatic replacement for the reference's
per-thread scalar RNG objects.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_U32 = jnp.uint32

# Rotation distances specified by the Threefry2x32 algorithm
# (reference: include/madrona/rand.inl:31).
_ROTATIONS = (13, 15, 26, 6, 17, 29, 16, 24)

# Parity constant specified by the Threefry2x32 algorithm.
_PARITY = 0x1BD11BDA


def key(seed, seed_upper=0):
    """Build a RandKey array of shape [..., 2] (a, b) from 32-bit seeds.

    Mirrors ``rand::initKey`` (include/madrona/rand.inl:7-10): the initial
    key is ``split_i({seed, seed_upper}, 0)``.
    """
    seed = jnp.asarray(seed, _U32)
    upper = jnp.broadcast_to(jnp.asarray(seed_upper, _U32), seed.shape)
    raw = jnp.stack([seed, upper], axis=-1)
    return split_i(raw, jnp.zeros(seed.shape, _U32))


def _rotl(v, d):
    return (v << _U32(d)) | (v >> _U32(32 - d))


def split_i(k, idx, idx_upper=0):
    """Threefry2x32 (20 rounds): derive a child key from ``k`` and ``idx``.

    ``k`` has shape [..., 2]; ``idx``/``idx_upper`` broadcast against
    ``k[..., 0]``. Bit-exact with ``rand::split_i``
    (include/madrona/rand.inl:28-100) and with JAX's own threefry2x32.
    """
    k = jnp.asarray(k, _U32)
    ks0 = k[..., 0]
    ks1 = k[..., 1]
    ks2 = _U32(_PARITY) ^ ks0 ^ ks1

    x0 = jnp.broadcast_to(jnp.asarray(idx, _U32), ks0.shape) + ks0
    x1 = jnp.broadcast_to(jnp.asarray(idx_upper, _U32), ks0.shape) + ks1

    def rounds(x0, x1, rots):
        for r in rots:
            x0 = x0 + x1
            x1 = _rotl(x1, r)
            x1 = x1 ^ x0
        return x0, x1

    x0, x1 = rounds(x0, x1, _ROTATIONS[:4])
    x0, x1 = x0 + ks1, x1 + ks2 + _U32(1)
    x0, x1 = rounds(x0, x1, _ROTATIONS[4:])
    x0, x1 = x0 + ks2, x1 + ks0 + _U32(2)
    x0, x1 = rounds(x0, x1, _ROTATIONS[:4])
    x0, x1 = x0 + ks0, x1 + ks1 + _U32(3)
    x0, x1 = rounds(x0, x1, _ROTATIONS[4:])
    x0, x1 = x0 + ks1, x1 + ks2 + _U32(4)
    x0, x1 = rounds(x0, x1, _ROTATIONS[:4])

    out0 = x0 + ks2
    out1 = x1 + ks0 + _U32(5)
    return jnp.stack([out0, out1], axis=-1)


def bits32(k):
    """32 random bits from a key (reference: rand::bits32 = a ^ b)."""
    k = jnp.asarray(k, _U32)
    return k[..., 0] ^ k[..., 1]


def bits_to_float01(rand_bits):
    """[0, 1) float from 32 bits, mantissa-randomizing construction.

    Bit-exact with ``rand::bitsToFloat01`` (include/madrona/rand.inl:223):
    top 24 bits scaled by 2^-24.
    """
    rand_bits = jnp.asarray(rand_bits, _U32)
    return (rand_bits >> _U32(8)).astype(jnp.float32) * jnp.float32(2.0 ** -24)


def sample_uniform(k):
    """Uniform float in [0, 1) (reference: rand::sampleUniform)."""
    return bits_to_float01(bits32(k))


def sample_2x_uniform(k):
    """Two uniforms from one key: (float01(a), float01(b)).

    Reference: rand::sample2xUniform (include/madrona/rand.inl:214-220).
    """
    k = jnp.asarray(k, _U32)
    return bits_to_float01(k[..., 0]), bits_to_float01(k[..., 1])


def sample_bool(k):
    """Boolean from popcount parity (reference: rand::sampleBool)."""
    bits = bits32(k)
    num_set = jax.lax.population_count(bits)
    return (num_set & _U32(1)) == _U32(0)


def sample_i32_biased(k, a, b):
    """Integer in [0, b - a) via u32 mulhi — slightly biased, branch-free.

    CAREFUL: despite taking ``a``, the result is NOT shifted by it —
    the reference's own sampleI32Biased omits the ``+ a`` (its sibling
    sampleI32 adds it) and we reproduce that bit-for-bit. Use
    :func:`sample_i32` for a true [a, b) sample.

    Reference: rand::sampleI32Biased (include/madrona/rand.inl:161-167).
    This is the variant the TPU path prefers; the unbiased Lemire loop
    (``sampleI32``) requires data-dependent rejection, which we emulate with
    a fixed number of retry rounds in :func:`sample_i32`.
    """
    s = (jnp.asarray(b, jnp.int32) - jnp.asarray(a, jnp.int32)).astype(_U32)
    x = bits32(k)
    h = _u32_mulhi(x, s)
    # NOTE: the reference returns mulhi(x, s) WITHOUT adding ``a``
    # (include/madrona/rand.inl:161-167) — reproduced exactly for parity.
    return h.astype(jnp.int32)


_MAX_LEMIRE_RETRIES = 4


def sample_i32(k, a, b):
    """Unbiased integer in [a, b): Lemire rejection, fixed retry depth.

    Mirrors ``rand::sampleI32`` (include/madrona/rand.inl:108-159). The
    reference loops until acceptance; rejection probability is < 2^-32 * s
    per round so a fixed unrolled depth of 4 leaves a disagreement
    probability that is negligible (and zero when s divides 2^32, e.g.
    powers of two) while keeping the computation static-shaped for XLA.
    """
    a = jnp.asarray(a, jnp.int32)
    s = (jnp.asarray(b, jnp.int32) - a).astype(_U32)
    k = jnp.asarray(k, _U32)

    x = bits32(k)
    l = x * s
    h = _u32_mulhi(x, s)
    t = (_U32(0) - s) % s
    for _ in range(_MAX_LEMIRE_RETRIES):
        reject = l < t
        k = jnp.where(reject[..., None], split_i(k, jnp.zeros_like(l)), k)
        x = bits32(k)
        l2 = x * s
        h2 = _u32_mulhi(x, s)
        l = jnp.where(reject, l2, l)
        h = jnp.where(reject, h2, h)
    return h.astype(jnp.int32) + a


def _u32_mulhi(x, y):
    # High 32 bits of a 32x32 multiply via 16-bit limbs (uint64 is
    # unavailable without jax x64 mode; this carries correctly in u32).
    x = jnp.asarray(x, _U32)
    y = jnp.asarray(y, _U32)
    m16 = _U32(0xFFFF)
    xl, xh = x & m16, x >> _U32(16)
    yl, yh = y & m16, y >> _U32(16)
    lo = xl * yl
    t = xh * yl + (lo >> _U32(16))
    t2 = xl * yh + (t & m16)
    return xh * yh + (t >> _U32(16)) + (t2 >> _U32(16))


class RNG:
    """Stateful counter RNG facade mirroring the reference's ``RNG`` class.

    Usage inside host-side (non-jit) code or traced code where a Python
    object lifetime maps to a trace: each sample advances an internal
    counter and derives ``split_i(base_key, count)`` — identical key
    schedule to ``RNG::advance`` (include/madrona/rand.inl:279-304).
    """

    def __init__(self, k):
        if isinstance(k, int):
            k = key(jnp.asarray(k, _U32))
        self._k = jnp.asarray(k, _U32)
        self._count = 0

    def _advance(self):
        sample_k = split_i(self._k, jnp.full(self._k.shape[:-1], self._count, _U32))
        self._count += 1
        return sample_k

    def rand_key(self):
        return self._advance()

    def sample_uniform(self):
        return sample_uniform(self._advance())

    def sample_bool(self):
        return sample_bool(self._advance())

    def sample_i32(self, a, b):
        return sample_i32(self._advance(), a, b)

    def sample_i32_biased(self, a, b):
        return sample_i32_biased(self._advance(), a, b)
