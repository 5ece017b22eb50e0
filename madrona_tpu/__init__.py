"""madrona_tpu — a TPU-native batch-simulation engine.

Brand-new JAX/XLA/Pallas re-design with the capabilities of the Madrona
batch-simulation engine (reference: shacklettbp/madrona): thousands of
ECS-based environment instances stepped in lockstep under a single jitted
step function, XPBD rigid-body physics, and a batch raycast renderer, with
worlds sharded across TPU meshes. See SURVEY.md for the layer-by-layer
mapping to the reference.
"""

from .core.component import (
    ArchetypeSpec,
    ComponentSpec,
    Entity,
    NULL_ENTITY,
    entity_ref,
    f32,
    i32,
    u32,
    quat,
    scalar,
    vec2,
    vec3,
    vec4,
)
from .core.state import SimState, StateManager
from .core.registry import ECSRegistry
from .graph.builder import Ctx, TaskGraph, TaskGraphBuilder, TaskGraphID
from .graph.executor import Executor
from .utils import math3d, rng

__version__ = "0.1.0"

__all__ = [
    "ArchetypeSpec",
    "ComponentSpec",
    "ECSRegistry",
    "Entity",
    "Executor",
    "Ctx",
    "NULL_ENTITY",
    "SimState",
    "StateManager",
    "TaskGraph",
    "TaskGraphBuilder",
    "TaskGraphID",
    "entity_ref",
    "f32",
    "i32",
    "u32",
    "math3d",
    "quat",
    "rng",
    "scalar",
    "vec2",
    "vec3",
    "vec4",
]
