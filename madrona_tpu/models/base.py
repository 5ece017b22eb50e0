"""Environment base: the app-facing shell around the ECS engine.

TPU-native equivalent of the reference's app pattern: a simulator class
registers types (``WorldT::registerTypes``), constructs per-world state
(``WorldT`` ctor), and wires systems into taskgraphs
(``WorldT::setupTasks``) — see ``include/madrona/mw_cpu.inl:5-97``. The
training-facing surface replaces the reference ``TrainInterface`` +
XLA-custom-call glue (``src/python/jax_register.py``,
``include/madrona/py/utils.hpp:143-201``): because state already lives as
JAX arrays, the step *is* a jittable pure function
``(state, actions) -> (state, outputs)`` with no custom calls, no copies,
no ordered-effect tokens.

Standard RL singletons every env gets (mirroring the common madrona env
conventions): ``Action`` (imported), ``Reward``, ``Done``, ``Reset``
(imported; world resets when its episode ends or the learner forces it),
``EpisodeStep``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax

from ..core.registry import ECSRegistry
from ..core.state import SimState, StateManager
from ..graph.builder import TaskGraphBuilder
from ..graph.executor import Executor


class EnvBase:
    """Subclass contract (the reference app hooks, renamed pythonically):

      * ``register_types(self, reg)``   — components/archetypes/exports
      * ``setup_tasks(self, builder)``  — system wiring
      * ``init_worlds(self, sm, state)``— world construction (pure)

    Class attrs: ``name``, ``action_spec`` (shape/dtype of the per-world
    action input), ``num_agents`` (actions arrive [W, num_agents, ...]).
    """

    name = "env"

    def register_types(self, reg: ECSRegistry):
        raise NotImplementedError

    def setup_tasks(self, builder: TaskGraphBuilder):
        raise NotImplementedError

    def init_worlds(self, sm: StateManager, state: SimState) -> SimState:
        return state


def make_sim(
    env: EnvBase,
    num_worlds: int,
    seed: int = 0,
    jit: bool = True,
    donate: bool = True,
    max_entities: Optional[int] = None,
) -> "Sim":
    """Construct the executor for an env (reference: TaskGraphExecutor /
    MWCudaExecutor construction sequence, SURVEY.md §3.1/§3.2)."""
    sm = StateManager()
    reg = ECSRegistry(sm)
    env.register_types(reg)
    builder = TaskGraphBuilder(sm, "step")
    env.setup_tasks(builder)
    graph = builder.build()
    ex = Executor(
        sm,
        {"step": graph},
        num_worlds=num_worlds,
        seed=seed,
        init_fn=env.init_worlds,
        jit=jit,
        donate=donate,
        max_entities=max_entities,
    )
    return Sim(env=env, executor=ex)


@dataclasses.dataclass
class Sim:
    """The live simulator: stateful convenience wrapper + pure step fn."""

    env: EnvBase
    executor: Executor

    @property
    def state(self) -> SimState:
        return self.executor.state

    @state.setter
    def state(self, s: SimState):
        self.executor.state = s

    def step(self, inputs: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        return self.executor.run(("step",), inputs)

    def step_fn(self) -> Callable:
        """Pure jitted ``(state, inputs) -> (state, outputs)`` for use
        inside learner scan loops (zero host involvement per step)."""
        return self.executor.step_fn(("step",))


def rollout(sim: Sim, actions_seq, unroll: int = 1):
    """Scan a whole action sequence through the sim on device.

    actions_seq: dict slot -> [T, ...per-step shape]. Returns stacked
    outputs [T, ...]. This is the "training loop stays on device" shape
    that replaces the reference's per-step custom-call round trips.
    """
    fn = sim.step_fn()

    def body(state, acts):
        state, outs = fn(state, acts)
        return state, outs

    final_state, outs = jax.lax.scan(
        body, sim.state, actions_seq, unroll=unroll
    )
    sim.state = final_state
    return outs
