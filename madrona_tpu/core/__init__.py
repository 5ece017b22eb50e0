from . import archetype, component, entity_store, registry, state
