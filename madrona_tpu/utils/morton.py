"""Morton (Z-order) codes: spatial sort keys.

Reference parity: the render ECS sorts instances by (MortonCode,
WorldID) for memory-coherent traversal (src/render/ecs_system.cpp
mortonCodeUpdate; LBVH builds key off the same codes,
src/mw/device/bvh.cpp). Vectorized 30-bit 3D encode over jnp arrays —
usable directly as a taskgraph sort node key_fn."""

from __future__ import annotations

import jax.numpy as jnp


def _expand_bits10(v):
    """Spread the low 10 bits of v so there are 2 zero bits between each
    (the standard LBVH bit-twiddle)."""
    v = v & 0x3FF
    v = (v | (v << 16)) & jnp.uint32(0x030000FF)
    v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
    v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
    v = (v | (v << 2)) & jnp.uint32(0x09249249)
    return v


def morton3d(pos, lo, hi):
    """30-bit 3D Morton code of points normalized into [lo, hi].

    pos [..., 3] float; lo/hi [3] scene bounds. Returns [...] uint32."""
    lo = jnp.asarray(lo, jnp.float32)
    hi = jnp.asarray(hi, jnp.float32)
    n = jnp.clip((pos - lo) / jnp.maximum(hi - lo, 1e-12), 0.0, 1.0)
    q = jnp.minimum((n * 1024.0), 1023.0).astype(jnp.uint32)
    x = _expand_bits10(q[..., 0])
    y = _expand_bits10(q[..., 1])
    z = _expand_bits10(q[..., 2])
    return (x << 2) | (y << 1) | z
