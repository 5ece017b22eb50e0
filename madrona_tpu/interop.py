"""Framework interop: zero-copy tensor bridges + the train interface.

TPU-native equivalent of the reference's Python bridge layer
(``src/python/bindings.cpp:54-86`` tensor_to_pytorch / tensor_to_jax via
dlpack; ``TrainInterface`` named tensor bundles,
``include/madrona/py/utils.hpp:143-201``). Here the sim's tensors
already ARE jax arrays, so the jax side is the identity; the torch
bridge uses dlpack (zero-copy on CPU; device transfer where backends
differ, exactly like the reference's CPU<->CUDA staging copies).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp


def to_torch(array):
    """jax array -> torch tensor (dlpack; zero-copy when same device)."""
    import torch

    return torch.from_dlpack(array)


def from_torch(tensor):
    """torch tensor -> jax array (dlpack)."""
    return jnp.from_dlpack(tensor)


@dataclasses.dataclass
class TrainInterface:
    """Named step-input/output tensor sets (reference TrainInterface).

    Wraps a Sim: ``step_inputs`` names the imported slots with shapes,
    ``step_outputs`` the exports; ``torch_step`` runs one sim step from
    torch tensors and returns torch tensors (the reference's
    cudaCopyStepInputs/Outputs path collapses to dlpack hops)."""

    sim: Any

    @property
    def step_inputs(self) -> Dict[str, tuple]:
        sm = self.sim.executor.sm
        out = {}
        for slot, name in sm.singleton_imports.items():
            spec = sm.singletons[name]
            out[slot] = ((self.sim.executor.num_worlds,) + tuple(spec.shape),
                         spec.dtype)
        for slot, (arch, comp) in sm.imports.items():
            spec = sm.components[comp]
            a = sm.archetypes[arch]
            out[slot] = (
                (self.sim.executor.num_worlds, a.capacity)
                + tuple(spec.shape),
                spec.dtype,
            )
        return out

    @property
    def step_outputs(self) -> Dict[str, Any]:
        return self.sim.executor.sm.collect_exports(self.sim.state)

    def torch_step(self, **torch_inputs):
        inputs = {k: from_torch(v) for k, v in torch_inputs.items()}
        outputs = self.sim.step(inputs)
        return {k: to_torch(v) for k, v in outputs.items()}
