"""StateManager: the single source of truth for ECS schemas and state.

TPU-native equivalent of the reference ``StateManager``
(``include/madrona/state.hpp:96-235``, ``src/core/state.cpp``). Two halves:

  * **Schema side** (Python build time): component/archetype/singleton
    registration, export slots, archetype indices. This replaces the
    reference's runtime type registry — on TPU everything about layout must
    be known before tracing, which registration guarantees.
  * **State side**: :class:`SimState`, a pytree holding every archetype
    :class:`~madrona_tpu.core.archetype.Table`, every singleton (a
    ``[num_worlds, ...]`` array per field), the
    :class:`~madrona_tpu.core.entity_store.EntityStore`, a per-world RNG
    key, and the global step counter. The *exported tensors of the
    reference's TrainInterface are just these arrays* — no copy-out/copy-in
    passes (``src/core/state.cpp:506-620``) exist because observations and
    actions already live as device arrays in the state pytree.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from . import archetype as _arch
from . import entity_store as _estore
from .component import ArchetypeSpec, ComponentSpec
from ..ops import scatter as _scatter
from ..utils import rng as _rng


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SimState:
    tables: Dict[str, _arch.Table]
    singletons: Dict[str, Any]
    entities: _estore.EntityStore
    rng: jax.Array        # [W, 2] uint32 — per-world base key for this run
    step: jax.Array       # [] int32 — global step counter


class StateManager:
    """Registry of specs + factory for :class:`SimState`."""

    def __init__(self):
        self.components: Dict[str, ComponentSpec] = {}
        self.archetypes: Dict[str, ArchetypeSpec] = {}
        self.singletons: Dict[str, ComponentSpec] = {}
        self.bundles: Dict[str, Tuple[str, ...]] = {}
        self.exports: Dict[str, Tuple[str, str]] = {}  # slot -> (arch, comp)
        self.singleton_exports: Dict[str, str] = {}    # slot -> singleton
        self.imports: Dict[str, Tuple[str, str]] = {}  # slot -> (arch, comp)
        self.singleton_imports: Dict[str, str] = {}    # slot -> singleton
        self._arch_index: Dict[str, int] = {}
        self._frozen = False

    # -- registration (mirrors ECSRegistry / StateManager::register*) ------

    def register_component(self, spec: ComponentSpec) -> ComponentSpec:
        self._check_open()
        if spec.name in self.components:
            raise ValueError(f"component {spec.name!r} already registered")
        self.components[spec.name] = spec
        return spec

    def register_archetype(self, spec: ArchetypeSpec) -> ArchetypeSpec:
        self._check_open()
        if spec.name in self.archetypes:
            raise ValueError(f"archetype {spec.name!r} already registered")
        expanded = self._expand_bundles(spec.components, spec.name)
        if expanded != spec.components:
            spec = dataclasses.replace(spec, components=expanded)
        for cname in spec.components:
            if cname not in self.components:
                raise ValueError(
                    f"archetype {spec.name!r} references unregistered "
                    f"component {cname!r}"
                )
        self._arch_index[spec.name] = len(self.archetypes)
        self.archetypes[spec.name] = spec
        return spec

    def register_bundle(self, name: str, components) -> Tuple[str, ...]:
        """Named component group usable inside archetype component lists
        (reference registerBundle/Bundle<>; bundles may nest)."""
        self._check_open()
        if name in self.bundles or name in self.components:
            raise ValueError(f"bundle {name!r} collides with existing name")
        expanded = self._expand_bundles(tuple(components), name)
        for cname in expanded:
            if cname not in self.components:
                raise ValueError(
                    f"bundle {name!r} references unregistered "
                    f"component {cname!r}"
                )
        self.bundles[name] = expanded
        return expanded

    def register_bundle_alias(self, alias: str, bundle: str):
        """registerBundleAlias equivalent."""
        self._check_open()
        if bundle not in self.bundles:
            raise ValueError(f"bundle {bundle!r} not registered")
        if alias in self.bundles or alias in self.components:
            raise ValueError(f"alias {alias!r} collides with existing name")
        self.bundles[alias] = self.bundles[bundle]
        return self.bundles[alias]

    def _expand_bundles(self, components, owner: str) -> Tuple[str, ...]:
        out = []
        for cname in components:
            if cname in self.bundles:
                out.extend(self.bundles[cname])
            else:
                out.append(cname)
        # duplicates can arise from overlapping bundles
        seen = set()
        uniq = []
        for c in out:
            if c not in seen:
                seen.add(c)
                uniq.append(c)
        return tuple(uniq)

    def register_singleton(self, spec: ComponentSpec) -> ComponentSpec:
        self._check_open()
        if spec.name in self.singletons:
            raise ValueError(f"singleton {spec.name!r} already registered")
        self.singletons[spec.name] = spec
        return spec

    def export_column(self, arch: str, comp: str, slot: Optional[str] = None):
        """Declare an exported tensor slot (reference: exportColumn,
        ``include/madrona/state.hpp``). The step function returns these
        arrays by name — zero-copy by construction."""
        slot = slot or f"{arch}.{comp}"
        if comp not in self.archetypes[arch].components:
            raise ValueError(f"{comp!r} not in archetype {arch!r}")
        self.exports[slot] = (arch, comp)
        return slot

    def export_singleton(self, name: str, slot: Optional[str] = None):
        slot = slot or name
        if name not in self.singletons:
            raise ValueError(f"singleton {name!r} not registered")
        self.singleton_exports[slot] = name
        return slot

    def import_column(self, arch: str, comp: str, slot: Optional[str] = None):
        """Declare a step-input tensor (actions/resets). Equivalent of the
        reference TrainInterface stepInputs + copyInExportedColumns
        (``src/core/state.cpp:549``) — but here "copy in" is just using the
        caller's array as the column for this step."""
        slot = slot or f"{arch}.{comp}"
        if comp not in self.archetypes[arch].components:
            raise ValueError(f"{comp!r} not in archetype {arch!r}")
        self.imports[slot] = (arch, comp)
        return slot

    def import_singleton(self, name: str, slot: Optional[str] = None):
        slot = slot or name
        if name not in self.singletons:
            raise ValueError(f"singleton {name!r} not registered")
        self.singleton_imports[slot] = name
        return slot

    def apply_imports(self, state: SimState, inputs: Dict[str, Any]) -> SimState:
        if not inputs:
            return state
        tables = dict(state.tables)
        singles = dict(state.singletons)
        for slot, value in inputs.items():
            if slot in self.imports:
                arch, comp = self.imports[slot]
                old = tables[arch].columns[comp]
                cols = dict(tables[arch].columns)
                cols[comp] = jax.tree_util.tree_map(
                    lambda o, v: jnp.asarray(v, o.dtype).reshape(o.shape),
                    old, value,
                )
                tables[arch] = dataclasses.replace(tables[arch], columns=cols)
            elif slot in self.singleton_imports:
                name = self.singleton_imports[slot]
                singles[name] = jax.tree_util.tree_map(
                    lambda o, v: jnp.asarray(v, o.dtype).reshape(o.shape),
                    singles[name], value,
                )
            else:
                raise KeyError(f"unknown input slot {slot!r}")
        return dataclasses.replace(state, tables=tables, singletons=singles)

    def arch_index(self, name: str) -> int:
        return self._arch_index[name]

    def _check_open(self):
        if self._frozen:
            raise RuntimeError("StateManager is frozen (state already built)")

    # -- queries (static resolution, reference Query/QueryRef) -------------

    def query(self, *component_names: str):
        """Archetypes containing all of ``component_names``, in
        registration order — the static equivalent of the reference's
        cached ``QueryRef`` (``include/madrona/query.hpp:17-46``)."""
        return [
            a.name
            for a in self.archetypes.values()
            if all(c in a.components for c in component_names)
        ]

    # -- state construction -------------------------------------------------

    def init_state(
        self,
        num_worlds: int,
        seed: int = 0,
        max_entities: Optional[int] = None,
    ) -> SimState:
        self._frozen = True
        if max_entities is None:
            max_entities = max(
                1,
                sum(
                    a.capacity
                    for a in self.archetypes.values()
                    if not a.no_entities
                ),
            )
        tables = {
            name: _arch.make_table(spec, self.components, num_worlds)
            for name, spec in self.archetypes.items()
        }
        singles = {
            name: spec.zeros((num_worlds,))
            for name, spec in self.singletons.items()
        }
        world_seeds = jnp.full((num_worlds,), seed, jnp.uint32)
        base = _rng.key(world_seeds)
        keys = _rng.split_i(base, jnp.arange(num_worlds, dtype=jnp.uint32))
        return SimState(
            tables=tables,
            singletons=singles,
            entities=_estore.init(num_worlds, max_entities),
            rng=keys,
            step=jnp.zeros((), jnp.int32),
        )

    # -- export --------------------------------------------------------------

    def collect_exports(self, state: SimState) -> Dict[str, Any]:
        out = {}
        for slot, (arch, comp) in self.exports.items():
            out[slot] = state.tables[arch].columns[comp]
        for slot, name in self.singleton_exports.items():
            out[slot] = state.singletons[name]
        return out

    # -- entity ops (functional makeEntityNow / destroyEntityNow) -----------

    def make_entities(self, state: SimState, arch: str, values, valid):
        """Create up to K entities per world in archetype ``arch``.

        values[comp]: [W, K, ...]; valid: [W, K] bool. Returns
        (state', entity [W, K, 2]). Equivalent to makeEntityNow called K
        times per world, but batched and deterministic.
        """
        spec = self.archetypes[arch]
        table = state.tables[arch]
        base_row = table.num_rows
        # mask candidates whose row would overflow the table BEFORE id
        # allocation: otherwise the store hands out live handles whose
        # rows append_many silently drops (phantom entities pointing
        # past capacity — lookup() would return valid with row >= cap).
        vi = valid.astype(jnp.int32)
        rank = jnp.cumsum(vi, axis=1) - vi
        fits = base_row[:, None] + rank < spec.capacity
        store, ent, rows = _estore.alloc(
            state.entities, valid & fits, self._arch_index[arch], base_row
        )
        ok = rows >= 0
        table = _arch.append_many(table, values, ok)
        # capacity-dropped candidates never reached append_many (they
        # were masked pre-alloc), so count them into the overflow
        # re-trace signal here (Executor.maybe_grow reads it)
        table = dataclasses.replace(
            table,
            overflow=table.overflow + jnp.sum(
                (valid & ~fits).astype(jnp.int32), axis=1
            ),
        )
        # Record entity ids into the table rows just written.
        w, k = ok.shape
        widx = jnp.broadcast_to(jnp.arange(w)[:, None], (w, k))
        eid = _scatter.masked_set_2d(
            table.entity_id, widx, rows, ent[..., 1], ok
        )
        egen = _scatter.masked_set_2d(
            table.entity_gen, widx, rows, ent[..., 0], ok
        )
        table = dataclasses.replace(table, entity_id=eid, entity_gen=egen)
        new_tables = dict(state.tables)
        new_tables[arch] = table
        state = dataclasses.replace(
            state, tables=new_tables, entities=store
        )
        return state, ent

    def append_temporaries(self, state: SimState, arch: str, values, valid):
        """makeTemporary equivalent: append id-less rows to a temporary
        archetype (``no_entities=True``)."""
        table = _arch.append_many(state.tables[arch], values, valid)
        new_tables = dict(state.tables)
        new_tables[arch] = table
        return dataclasses.replace(state, tables=new_tables)
