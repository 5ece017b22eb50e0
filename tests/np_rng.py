"""Independent NumPy implementation of Threefry2x32(20 rounds) splitting.

Used as the oracle side in trajectory-equivalence tests so the reference
RNG behavior is derived twice (engine: jnp; oracle: numpy) and compared.
"""

import numpy as np

_ROT = (13, 15, 26, 6, 17, 29, 16, 24)


def _rotl(v, d):
    return ((v << np.uint32(d)) | (v >> np.uint32(32 - d))).astype(np.uint32)


def split_i(k, idx, idx_upper=0):
    k = np.asarray(k, np.uint32)
    ks0 = k[..., 0]
    ks1 = k[..., 1]
    ks2 = np.uint32(0x1BD11BDA) ^ ks0 ^ ks1
    x0 = (np.broadcast_to(np.asarray(idx, np.uint32), ks0.shape) + ks0).astype(
        np.uint32
    )
    x1 = (
        np.broadcast_to(np.asarray(idx_upper, np.uint32), ks0.shape) + ks1
    ).astype(np.uint32)

    def rounds(x0, x1, rots):
        for r in rots:
            x0 = (x0 + x1).astype(np.uint32)
            x1 = _rotl(x1, r)
            x1 = x1 ^ x0
        return x0, x1

    with np.errstate(over="ignore"):
        x0, x1 = rounds(x0, x1, _ROT[:4])
        x0, x1 = (x0 + ks1).astype(np.uint32), (x1 + ks2 + np.uint32(1)).astype(np.uint32)
        x0, x1 = rounds(x0, x1, _ROT[4:])
        x0, x1 = (x0 + ks2).astype(np.uint32), (x1 + ks0 + np.uint32(2)).astype(np.uint32)
        x0, x1 = rounds(x0, x1, _ROT[:4])
        x0, x1 = (x0 + ks0).astype(np.uint32), (x1 + ks1 + np.uint32(3)).astype(np.uint32)
        x0, x1 = rounds(x0, x1, _ROT[4:])
        x0, x1 = (x0 + ks1).astype(np.uint32), (x1 + ks2 + np.uint32(4)).astype(np.uint32)
        x0, x1 = rounds(x0, x1, _ROT[:4])
        out0 = (x0 + ks2).astype(np.uint32)
        out1 = (x1 + ks0 + np.uint32(5)).astype(np.uint32)
    return np.stack([out0, out1], axis=-1)


def key(seed, seed_upper=0):
    seed = np.asarray(seed, np.uint32)
    upper = np.broadcast_to(np.asarray(seed_upper, np.uint32), seed.shape)
    return split_i(np.stack([seed, upper], axis=-1), np.zeros(seed.shape, np.uint32))


def bits32(k):
    k = np.asarray(k, np.uint32)
    return k[..., 0] ^ k[..., 1]


def uniform(k):
    return ((bits32(k) >> np.uint32(8)).astype(np.float32) * np.float32(2.0**-24))
