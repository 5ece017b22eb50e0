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
from ..graph.builder import TaskGraphBuilder, TaskGraphManager
from ..graph.executor import Executor


class EnvBase:
    """Subclass contract (the reference app hooks, renamed pythonically):

      * ``register_types(self, reg)``   — components/archetypes/exports
      * ``setup_tasks(self, builder)``  — system wiring
      * ``init_worlds(self, sm, state)``— world construction (pure)

    Class attrs: ``name``, ``action_spec`` (shape/dtype of the per-world
    action input), ``num_agents`` (actions arrive [W, num_agents, ...]).

    Envs with a single graph implement ``setup_tasks(builder)``; envs
    with several (init/step/render — reference
    ``TaskGraphManager::init(enum)``,
    ``include/madrona/taskgraph_builder.hpp:93-108``) implement
    ``setup_graphs(mgr)`` instead and pick graphs per ``Sim.step``.
    ``default_launch`` names the graph tuple ``Sim.step()`` runs.
    """

    name = "env"
    default_launch = ("step",)

    def register_types(self, reg: ECSRegistry):
        raise NotImplementedError

    def setup_tasks(self, builder: TaskGraphBuilder):
        raise NotImplementedError

    def setup_graphs(self, mgr: "TaskGraphManager"):
        """Multi-graph hook; default wires ``setup_tasks`` as "step"."""
        self.setup_tasks(mgr.init("step"))

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
    mgr = TaskGraphManager(sm)
    env.setup_graphs(mgr)
    graphs = mgr.build_all()
    ex = Executor(
        sm,
        graphs,
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

    def step(
        self, inputs: Optional[Dict[str, Any]] = None, launch=None
    ) -> Dict[str, Any]:
        launch = launch or getattr(self.env, "default_launch", ("step",))
        return self.executor.run(launch, inputs)

    def step_fn(self, launch=None) -> Callable:
        """Pure jitted ``(state, inputs) -> (state, outputs)`` for use
        inside learner scan loops (zero host involvement per step).

        ``launch`` selects which named taskgraphs compose the step
        (reference ``buildLaunchGraph([ids])``); defaults to the env's
        ``default_launch``."""
        launch = launch or getattr(self.env, "default_launch", ("step",))
        return self.executor.step_fn(launch)


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


def rollout_flat(sim: Sim, actions_seq, unroll: int = 1):
    """Like :func:`rollout` but keeps only the learner-facing slots
    (``flat_obs``/``obs``, ``reward``, ``done``), so the scan's stacked
    carry stays small — the rollout-buffer shape PPO consumes directly:
    obs [T, W, A, D], reward [T, W, ...], done [T, W]."""
    fn = sim.step_fn()
    keep = ("flat_obs", "obs", "reward", "done")

    def body(state, acts):
        state, outs = fn(state, acts)
        return state, {k: outs[k] for k in keep if k in outs}

    final_state, outs = jax.lax.scan(
        body, sim.state, actions_seq, unroll=unroll
    )
    sim.state = final_state
    return outs
