"""Component and archetype *specifications*.

TPU-native equivalent of the reference's type-registration layer
(``include/madrona/type_tracker.hpp``, ``include/madrona/ecs.hpp``,
``include/madrona/registry.hpp``). Where the reference maps C++ struct
types to stable integer IDs at runtime, here a component is a declarative
schema (name + array layout) resolved entirely at Python build time; the
"type id" is simply the name, and storage layout questions (column order,
padding) disappear because every component field is its own dense
``[num_worlds, capacity, ...]`` array (struct-of-arrays of arrays).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping, Sequence

import jax.numpy as jnp

__all__ = [
    "ComponentSpec",
    "ArchetypeSpec",
    "Entity",
    "NULL_ENTITY",
    "f32",
    "i32",
    "u32",
    "scalar",
    "vec2",
    "vec3",
    "vec4",
    "quat",
    "entity_ref",
]

f32 = jnp.float32
i32 = jnp.int32
u32 = jnp.uint32


def scalar(dtype=f32):
    return ((), dtype)


def vec2(dtype=f32):
    return ((2,), dtype)


def vec3(dtype=f32):
    return ((3,), dtype)


def vec4(dtype=f32):
    return ((4,), dtype)


def quat():
    """Quaternion (w, x, y, z) — see utils.math3d."""
    return ((4,), f32)


def entity_ref():
    """An Entity reference stored in a component: (gen, id) int32 pair.

    Mirrors ``Entity {gen, id}`` (include/madrona/ecs.hpp:17-31).
    """
    return ((2,), i32)


# Sentinel matching Entity::none(): gen == -1 (invalid generation).
NULL_ENTITY = (-1, -1)


class Entity:
    """Namespace for entity-reference helpers over [..., 2] int32 arrays."""

    @staticmethod
    def none(shape=()):
        return jnp.full(tuple(shape) + (2,), -1, i32)

    @staticmethod
    def make(gen, eid):
        return jnp.stack(
            [jnp.asarray(gen, i32), jnp.asarray(eid, i32)], axis=-1
        )

    @staticmethod
    def gen(e):
        return e[..., 0]

    @staticmethod
    def id(e):
        return e[..., 1]

    @staticmethod
    def is_none(e):
        return e[..., 0] < 0


@dataclasses.dataclass(frozen=True)
class ComponentSpec:
    """Schema for one component.

    Either a plain array component (``shape``/``dtype``) or a struct
    component with named ``fields`` (each field an array spec). Struct
    components are stored field-per-array, which is the TPU-idiomatic
    answer to the reference's interleaved C structs-in-columns
    (``include/madrona/table.hpp:25-56``): it keeps every field contiguous
    and lane-aligned for the VPU.
    """

    name: str
    shape: tuple = ()
    dtype: Any = f32
    fields: Mapping[str, tuple] | None = None

    @property
    def is_struct(self) -> bool:
        return self.fields is not None

    def zeros(self, lead_shape: Sequence[int]):
        lead = tuple(lead_shape)
        if self.is_struct:
            return {
                fname: jnp.zeros(lead + tuple(fshape), fdtype)
                for fname, (fshape, fdtype) in self.fields.items()
            }
        return jnp.zeros(lead + tuple(self.shape), self.dtype)


@dataclasses.dataclass(frozen=True)
class ArchetypeSpec:
    """Schema for one archetype: a fixed component set + capacity policy.

    Equivalent to ``registerArchetype`` metadata
    (``include/madrona/state.hpp:96-235``) plus the capacity decisions the
    reference makes dynamically (table growth via VA mapping,
    ``src/mw/device/state.cpp:29-60``). On TPU shapes are static, so
    capacity is part of the schema; growth means re-tracing at a larger
    tier (handled by the state manager, not silently).

    flags:
      fixed_rows    — every world always has exactly ``capacity`` live rows
                      (no validity masking needed; fastest path).
      temporary     — rows live for one step; cleared by ClearTmp nodes
                      (reference ``makeTemporary`` / ``ClearTmpNode``).
      no_entities   — rows carry no Entity ids (true for temporaries).
    """

    name: str
    components: tuple
    capacity: int
    fixed_rows: bool = False
    temporary: bool = False
    no_entities: bool = False
