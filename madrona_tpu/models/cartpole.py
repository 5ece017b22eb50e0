"""Cartpole: the minimum end-to-end environment (pure ECS, no physics).

Capability-parity target for the reference's Cartpole example env
(madrona_rl_envs ``cartpole_env``, which wraps the classic Gym
CartPole-v1 dynamics in ECS systems). Dynamics follow Barto, Sutton &
Anderson (1983) exactly as Gym implements them: Euler integration at
tau=0.02, force ±10 N, termination at |x| > 2.4, |theta| > 12deg, episode
cap 500 steps; reset state uniform in [-0.05, 0.05)^4 drawn from the
engine's threefry stream for that (world, step).

ECS shape: one "Cart" archetype row per world (fixed_rows) so the state
flows through real component tables; Action/Reward/Done/Reset are the
standard train-interface singletons.


Auto-reset convention note: the step on which a world resets counts as
episode step 1 with reward 1.0 while the physics holds (the in-flight
action was chosen from the previous episode's terminal observation).
This mirrors the batched auto-reset convention used throughout the
package (see hanabi's reset-step hold) and means an episode contains
499 dynamics transitions within the 500-step cap — bit-parity with the
NumPy twin oracle is the contract, not step-for-step Gym equivalence.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.registry import ECSRegistry
from ..graph.builder import TaskGraphBuilder
from ..utils import rng as _rng
from .base import EnvBase

GRAVITY = 9.8
MASS_CART = 1.0
MASS_POLE = 0.1
TOTAL_MASS = MASS_CART + MASS_POLE
POLE_HALF_LENGTH = 0.5
POLE_MASS_LENGTH = MASS_POLE * POLE_HALF_LENGTH
FORCE_MAG = 10.0
TAU = 0.02
THETA_LIMIT = 12 * 2 * jnp.pi / 360
X_LIMIT = 2.4
EPISODE_LEN = 500


class Cartpole(EnvBase):
    name = "cartpole"
    num_agents = 1

    def register_types(self, reg: ECSRegistry):
        reg.register_component("CartState", (4,), jnp.float32)
        reg.register_archetype("Cart", ["CartState"], 1, fixed_rows=True)

        reg.register_singleton("Action", (), jnp.int32)
        reg.register_singleton("Reward", (), jnp.float32)
        reg.register_singleton("Done", (), jnp.int32)
        reg.register_singleton("Reset", (), jnp.int32)
        reg.register_singleton("EpisodeStep", (), jnp.int32)

        reg.import_singleton("Action", "action")
        reg.import_singleton("Reset", "reset")
        reg.export_column("Cart", "CartState", "obs")
        reg.export_singleton("Reward", "reward")
        reg.export_singleton("Done", "done")

    def setup_tasks(self, b: TaskGraphBuilder):
        # reset (episode end or forced) -> physics -> termination/reward
        n_reset = b.custom(_reset_system, name="cartpole_reset")
        n_phys = b.parallel_for(
            _physics_system,
            "Cart",
            read=["CartState"],
            write=["CartState"],
            read_singletons=["Action", "Done", "Reset"],
            deps=[n_reset],
            name="cartpole_physics",
        )
        b.custom(_termination_system, deps=[n_phys], name="cartpole_done")

    def init_worlds(self, sm, state):
        # Start every world "done" so the first step's reset system draws
        # the initial state from the RNG stream.
        import dataclasses

        singles = dict(state.singletons)
        singles["Done"] = jnp.ones_like(singles["Done"])
        return dataclasses.replace(state, singletons=singles)


def _physics_system(ctx, s):
    """One Euler step of the cart-pole dynamics for live (non-reset) worlds."""
    x, x_dot, theta, theta_dot = s[0], s[1], s[2], s[3]
    force = jnp.where(ctx.singleton("Action") > 0, FORCE_MAG, -FORCE_MAG)
    cos_t = jnp.cos(theta)
    sin_t = jnp.sin(theta)
    temp = (force + POLE_MASS_LENGTH * theta_dot**2 * sin_t) / TOTAL_MASS
    theta_acc = (GRAVITY * sin_t - cos_t * temp) / (
        POLE_HALF_LENGTH
        * (4.0 / 3.0 - MASS_POLE * cos_t**2 / TOTAL_MASS)
    )
    x_acc = temp - POLE_MASS_LENGTH * theta_acc * cos_t / TOTAL_MASS
    new = jnp.stack(
        [
            x + TAU * x_dot,
            x_dot + TAU * x_acc,
            theta + TAU * theta_dot,
            theta_dot + TAU * theta_acc,
        ]
    )
    # Worlds that were just reset (episode end or forced) hold their
    # freshly drawn state this step.
    just_reset = (ctx.singleton("Done") > 0) | (ctx.singleton("Reset") > 0)
    return jnp.where(just_reset, s, new)


def _reset_system(sm, state, node_key):
    """Redraw state for worlds flagged done (or externally reset).

    node_key is [W, 2]; four uniforms come from split children, mirroring
    the reference envs' per-world key-split discipline.
    """
    import dataclasses

    done = state.singletons["Done"] > 0
    forced = state.singletons["Reset"] > 0
    need = done | forced

    w = done.shape[0]
    draws = []
    for i in range(4):
        k = _rng.split_i(node_key, jnp.full((w,), i, jnp.uint32))
        draws.append(_rng.sample_uniform(k) * 0.1 - 0.05)
    fresh = jnp.stack(draws, axis=-1)  # [W, 4]

    cart = state.tables["Cart"]
    cur = cart.columns["CartState"]  # [W, 1, 4]
    new_state = jnp.where(need[:, None, None], fresh[:, None, :], cur)
    cols = dict(cart.columns)
    cols["CartState"] = new_state
    tables = dict(state.tables)
    tables["Cart"] = dataclasses.replace(cart, columns=cols)

    singles = dict(state.singletons)
    singles["EpisodeStep"] = jnp.where(
        need, 0, state.singletons["EpisodeStep"]
    )
    return dataclasses.replace(state, tables=tables, singletons=singles)


def _termination_system(sm, state, node_key):
    import dataclasses

    s = state.tables["Cart"].columns["CartState"][:, 0, :]  # [W, 4]
    x, theta = s[:, 0], s[:, 2]
    ep = state.singletons["EpisodeStep"] + 1
    out_of_bounds = (jnp.abs(x) > X_LIMIT) | (jnp.abs(theta) > THETA_LIMIT)
    done = out_of_bounds | (ep >= EPISODE_LEN)

    singles = dict(state.singletons)
    singles["EpisodeStep"] = ep
    singles["Done"] = done.astype(jnp.int32)
    # Gym semantics: reward 1.0 every step including the terminating one.
    singles["Reward"] = jnp.ones_like(state.singletons["Reward"])
    return dataclasses.replace(state, singletons=singles)
