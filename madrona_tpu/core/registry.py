"""ECSRegistry: the app-facing registration facade.

Mirrors ``include/madrona/registry.hpp:18-75`` — a thin wrapper over
StateManager handed to each environment's ``register_types`` hook, so app
code reads like the reference API while staying pure-Python declarative.
"""

from __future__ import annotations

from typing import Optional, Sequence

from .component import ArchetypeSpec, ComponentSpec
from .state import StateManager


class ECSRegistry:
    def __init__(self, sm: StateManager):
        self._sm = sm

    def register_component(
        self, name: str, shape=(), dtype=None, fields=None
    ) -> ComponentSpec:
        import jax.numpy as jnp

        if dtype is None:
            dtype = jnp.float32
        spec = ComponentSpec(
            name=name, shape=tuple(shape), dtype=dtype, fields=fields
        )
        return self._sm.register_component(spec)

    def register_archetype(
        self,
        name: str,
        components: Sequence[str],
        capacity: int,
        fixed_rows: bool = False,
        temporary: bool = False,
    ) -> ArchetypeSpec:
        spec = ArchetypeSpec(
            name=name,
            components=tuple(components),
            capacity=capacity,
            fixed_rows=fixed_rows,
            temporary=temporary,
            no_entities=temporary,
        )
        return self._sm.register_archetype(spec)

    def register_bundle(self, name: str, components: Sequence[str]):
        """A named component group expandable inside archetype component
        lists (reference registerBundle, include/madrona/state.hpp:96-235;
        e.g. the physics RigidBody bundle). Bundles may nest."""
        return self._sm.register_bundle(name, components)

    def register_bundle_alias(self, alias: str, bundle: str):
        """registerBundleAlias: a second name for an existing bundle (the
        reference uses it to swap solver-specific state bundles)."""
        return self._sm.register_bundle_alias(alias, bundle)

    def register_singleton(
        self, name: str, shape=(), dtype=None, fields=None
    ) -> ComponentSpec:
        import jax.numpy as jnp

        if dtype is None:
            dtype = jnp.float32
        spec = ComponentSpec(
            name=name, shape=tuple(shape), dtype=dtype, fields=fields
        )
        return self._sm.register_singleton(spec)

    def export_column(self, arch: str, comp: str, slot: Optional[str] = None):
        return self._sm.export_column(arch, comp, slot)

    def export_singleton(self, name: str, slot: Optional[str] = None):
        return self._sm.export_singleton(name, slot)

    def import_column(self, arch: str, comp: str, slot: Optional[str] = None):
        return self._sm.import_column(arch, comp, slot)

    def import_singleton(self, name: str, slot: Optional[str] = None):
        return self._sm.import_singleton(name, slot)
