"""World-sharding over TPU device meshes.

The reference has no multi-device story (SURVEY.md §2.6/§5.8: single
process, single GPU; "scale" = world batch on one device). The TPU-native
design extends the same principle across chips: worlds are the shard unit,
every state array carries a leading ``[num_worlds]`` axis, so the entire
SimState shards with ``NamedSharding(P("worlds"))`` and a step contains
**zero cross-world communication** — collectives only appear in the
learner (psum over gradients), exactly as BASELINE.md's multi-host target
prescribes. Weak scaling is therefore communication-free by construction.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

WORLD_AXIS = "worlds"


def make_mesh(devices=None, axis: str = WORLD_AXIS) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def state_shardings(state, mesh: Mesh, axis: str = WORLD_AXIS):
    """A sharding pytree for SimState: leading worlds axis sharded, scalars
    (e.g. the step counter) replicated."""
    num_worlds = state.rng.shape[0]

    def spec(x):
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] == num_worlds:
            return NamedSharding(mesh, P(axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec, state)


def shard_state(state, mesh: Optional[Mesh] = None, axis: str = WORLD_AXIS):
    """Place a SimState onto the mesh, worlds axis sharded across devices."""
    if mesh is None:
        mesh = make_mesh(axis=axis)
    shardings = state_shardings(state, mesh, axis)
    return jax.device_put(state, shardings)


def input_shardings(inputs: Any, mesh: Mesh, axis: str = WORLD_AXIS):
    """Inputs (action/reset slots) are [W, ...] — shard on worlds."""
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, P(axis)), inputs
    )


def shard_sim(sim, mesh: Optional[Mesh] = None, axis: str = WORLD_AXIS):
    """Shard a live Sim's state in place; subsequent jitted steps run SPMD
    with XLA propagating the worlds sharding through every op."""
    if mesh is None:
        mesh = make_mesh(axis=axis)
    sim.state = shard_state(sim.state, mesh, axis)
    return sim
