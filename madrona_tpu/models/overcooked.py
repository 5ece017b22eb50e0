"""Overcooked: 2-agent cooperative cooking gridworld.

Capability-parity target for the reference ecosystem's Overcooked env
(madrona_rl_envs ``overcooked_env`` / ``overcooked2_env``, wrapping the
overcooked_ai MDP; ``/root/reference/README.md:41-43``). Semantics follow
OvercookedGridworld defaults: 6 actions (N/S/E/W/stay/interact), facing
updates on every move attempt, collision rule (same-target or swap ->
neither moves), onion pots that auto-start cooking at 3 onions (20-tick
cook), dish pickup of ready soup, +20 shared reward per delivery,
counters hold one item each, horizon 400.

Layouts are static per-env-instance strings (X counter, P pot, O onion
dispenser, D dish dispenser, S serving, ' ' floor, 1/2 start positions).
All per-step logic is branchless masked updates over [W] worlds; the env
is fully deterministic (reset state is the layout).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core.registry import ECSRegistry
from ..graph.builder import TaskGraphBuilder
from .base import EnvBase

CRAMPED_ROOM = (
    "XXPXX",
    "O1 2O",
    "X   X",
    "XDXSX",
)

ASYMMETRIC_ADVANTAGES = (
    "XXXXXXXXX",
    "O XSXOX S",
    "X   P 1 X",
    "X2  P   X",
    "XXXDXDXXX",
)

LAYOUTS = {
    "cramped_room": CRAMPED_ROOM,
    "asymmetric_advantages": ASYMMETRIC_ADVANTAGES,
}

# actions
A_NORTH, A_SOUTH, A_EAST, A_WEST, A_STAY, A_INTERACT = range(6)
# grid deltas (row, col); north = up = row-1
DELTAS = np.array([(-1, 0), (1, 0), (0, 1), (0, -1), (0, 0)], np.int32)

# held items
H_NONE, H_ONION, H_DISH, H_SOUP = range(4)

T_FLOOR, T_COUNTER, T_POT, T_ONION, T_DISH, T_SERVE = range(6)
_TCHAR = {" ": T_FLOOR, "1": T_FLOOR, "2": T_FLOOR, "X": T_COUNTER,
          "P": T_POT, "O": T_ONION, "D": T_DISH, "S": T_SERVE}

COOK_TIME = 20
POT_CAPACITY = 3
DELIVERY_REWARD = 20.0
EPISODE_LEN = 400
N_AGENTS = 2


class Overcooked(EnvBase):
    name = "overcooked"
    num_agents = N_AGENTS
    action_is_discrete = True
    action_shape = (N_AGENTS,)
    action_buckets = (6,)

    def __init__(self, layout: str = "cramped_room",
                 shaped_rewards: bool = False):
        # overcooked_ai's default shaped rewards (training aid; the
        # oracle-equivalence tests run with the sparse default):
        # +3 onion into pot, +3 dish pickup, +5 soup pickup
        self.shaped_rewards = shaped_rewards
        rows = LAYOUTS[layout] if isinstance(layout, str) else layout
        self.layout_name = layout if isinstance(layout, str) else "custom"
        self.H = len(rows)
        self.W = len(rows[0])
        self.terrain = np.array(
            [[_TCHAR[ch] for ch in row] for row in rows], np.int32
        )
        starts = {}
        for r, row in enumerate(rows):
            for c, ch in enumerate(row):
                if ch in "12":
                    starts[int(ch) - 1] = (r, c)
        self.start_pos = np.array(
            [starts[0], starts[1]], np.int32
        )  # [2, 2] (row, col)
        pots = np.argwhere(self.terrain == T_POT)
        self.pot_rc = pots.astype(np.int32)          # [n_pots, 2]
        self.n_pots = len(pots)
        self.obs_channels = 16

    @staticmethod
    def random_actions(rs, steps, num_worlds):
        return jnp.asarray(
            rs.randint(0, 6, (steps, num_worlds, N_AGENTS)), jnp.int32
        )

    def register_types(self, reg: ECSRegistry):
        H, W_ = self.H, self.W
        reg.register_singleton("AgentPos", (N_AGENTS, 2), jnp.int32)
        reg.register_singleton("AgentDir", (N_AGENTS,), jnp.int32)
        reg.register_singleton("Held", (N_AGENTS,), jnp.int32)
        reg.register_singleton("PotCount", (self.n_pots,), jnp.int32)
        reg.register_singleton("PotTimer", (self.n_pots,), jnp.int32)
        reg.register_singleton("ItemGrid", (H, W_), jnp.int32)
        reg.register_singleton("Action", (N_AGENTS,), jnp.int32)
        reg.register_singleton("Reward", (), jnp.float32)
        reg.register_singleton("Done", (), jnp.int32)
        reg.register_singleton("Reset", (), jnp.int32)
        reg.register_singleton("EpisodeStep", (), jnp.int32)
        reg.register_singleton(
            "Obs", (N_AGENTS, H, W_, self.obs_channels), jnp.float32
        )

        reg.register_singleton("Deliveries", (), jnp.int32)
        reg.export_singleton("Deliveries", "deliveries")

        reg.import_singleton("Action", "action")
        reg.import_singleton("Reset", "reset")
        reg.export_singleton("Obs", "obs")
        reg.export_singleton("Reward", "reward")
        reg.export_singleton("Done", "done")
        reg.export_singleton("EpisodeStep", "steps_taken")

    def setup_tasks(self, b: TaskGraphBuilder):
        n_reset = b.custom(self._reset_system, name="oc_reset")
        n_step = b.custom(self._step_system, deps=[n_reset], name="oc_step")
        b.custom(self._obs_system, deps=[n_step], name="oc_obs")

    def init_worlds(self, sm, state):
        singles = dict(state.singletons)
        singles["Done"] = jnp.ones_like(singles["Done"])
        return dataclasses.replace(state, singletons=singles)

    # ------------------------------------------------------------- systems

    def _reset_system(self, sm, state, node_key):
        s = dict(state.singletons)
        need = (s["Done"] > 0) | (s["Reset"] > 0)
        w = need.shape[0]

        def pick(name, fresh):
            cur = s[name]
            sel = need.reshape((w,) + (1,) * (cur.ndim - 1))
            return jnp.where(sel, jnp.asarray(fresh, cur.dtype), cur)

        s["AgentPos"] = pick("AgentPos", jnp.asarray(self.start_pos)[None])
        s["AgentDir"] = pick("AgentDir", A_SOUTH)
        s["Held"] = pick("Held", H_NONE)
        s["PotCount"] = pick("PotCount", 0)
        s["PotTimer"] = pick("PotTimer", -1)
        s["ItemGrid"] = pick("ItemGrid", 0)
        s["Deliveries"] = pick("Deliveries", 0)
        s["EpisodeStep"] = pick("EpisodeStep", 0)
        return dataclasses.replace(state, singletons=s)

    def _step_system(self, sm, state, node_key):
        s = dict(state.singletons)
        w = s["Done"].shape[0]
        widx = jnp.arange(w)
        terrain = jnp.asarray(self.terrain)
        H, W_ = self.H, self.W
        deltas = jnp.asarray(DELTAS)
        pot_rc = jnp.asarray(self.pot_rc)

        act = s["Action"]                            # [W, 2]
        pos = s["AgentPos"]                          # [W, 2, 2]
        dirs = s["AgentDir"]
        held = s["Held"]
        items = s["ItemGrid"]
        pot_cnt = s["PotCount"]
        pot_tmr = s["PotTimer"]
        reward = jnp.zeros((w,), jnp.float32)
        deliveries = s["Deliveries"]

        # ---- movement (face first, then move if free; collision rule)
        is_move = act < 4
        new_dir = jnp.where(is_move, act, dirs)
        step_d = deltas[jnp.clip(act, 0, 4)]         # [W, 2, 2]
        tgt = pos + jnp.where(is_move[..., None], step_d, 0)
        tgt = jnp.stack(
            [jnp.clip(tgt[..., 0], 0, H - 1), jnp.clip(tgt[..., 1], 0, W_ - 1)],
            axis=-1,
        )
        walkable = terrain[tgt[..., 0], tgt[..., 1]] == T_FLOOR
        prop = jnp.where(walkable[..., None], tgt, pos)
        # conflict: same target cell, or swapping cells
        same = jnp.all(prop[:, 0] == prop[:, 1], axis=-1)
        swap = jnp.all(prop[:, 0] == pos[:, 1], axis=-1) & jnp.all(
            prop[:, 1] == pos[:, 0], axis=-1
        )
        conflict = (same | swap)[:, None, None]
        new_pos = jnp.where(conflict, pos, prop)

        # ---- interact
        facing = new_pos + deltas[jnp.clip(new_dir, 0, 3)]
        fr = jnp.clip(facing[..., 0], 0, H - 1)
        fc = jnp.clip(facing[..., 1], 0, W_ - 1)
        ftile = terrain[fr, fc]                      # [W, 2]
        interact = act == A_INTERACT

        # resolve agents sequentially (agent 0 then agent 1) so two
        # agents interacting with the same tile behave deterministically
        for a in range(N_AGENTS):
            ia = interact[:, a]
            h = held[:, a]
            tr, tc = fr[:, a], fc[:, a]
            tile = ftile[:, a]

            # onion / dish dispensers
            grab_onion = ia & (tile == T_ONION) & (h == H_NONE)
            grab_dish = ia & (tile == T_DISH) & (h == H_NONE)

            # pot interactions: find which pot (if any) is faced
            pot_match = (pot_rc[None, :, 0] == tr[:, None]) & (
                pot_rc[None, :, 1] == tc[:, None]
            )  # [W, n_pots]
            faces_pot = ia & (tile == T_POT) & jnp.any(pot_match, axis=1)
            pot_idx = jnp.argmax(pot_match, axis=1)
            cnt = pot_cnt[widx, pot_idx]
            tmr = pot_tmr[widx, pot_idx]
            add_onion = (
                faces_pot & (h == H_ONION) & (cnt < POT_CAPACITY) & (tmr < 0)
            )
            new_cnt = cnt + add_onion
            start_cook = add_onion & (new_cnt == POT_CAPACITY)
            take_soup = faces_pot & (h == H_DISH) & (tmr == 0)
            pot_cnt = pot_cnt.at[widx, pot_idx].set(
                jnp.where(take_soup, 0, new_cnt)
            )
            pot_tmr = pot_tmr.at[widx, pot_idx].set(
                jnp.where(
                    take_soup, -1, jnp.where(start_cook, COOK_TIME, tmr)
                )
            )

            # serving
            serve = ia & (tile == T_SERVE) & (h == H_SOUP)
            reward = reward + jnp.where(serve, DELIVERY_REWARD, 0.0)
            deliveries = deliveries + serve.astype(jnp.int32)
            if self.shaped_rewards:
                reward = (
                    reward
                    + 3.0 * add_onion + 3.0 * grab_dish + 5.0 * take_soup
                )

            # counters: put down on empty / pick up from occupied
            citem = items[widx, tr, tc]
            on_counter = ia & (tile == T_COUNTER)
            put = on_counter & (h != H_NONE) & (citem == H_NONE)
            take = on_counter & (h == H_NONE) & (citem != H_NONE)
            items = items.at[widx, tr, tc].set(
                jnp.where(put, h, jnp.where(take, H_NONE, citem))
            )

            new_h = jnp.where(grab_onion, H_ONION, h)
            new_h = jnp.where(grab_dish, H_DISH, new_h)
            new_h = jnp.where(add_onion, H_NONE, new_h)
            new_h = jnp.where(take_soup, H_SOUP, new_h)
            new_h = jnp.where(serve, H_NONE, new_h)
            new_h = jnp.where(put, H_NONE, new_h)
            new_h = jnp.where(take, citem, new_h)
            held = held.at[:, a].set(new_h)

        # ---- pots cook
        pot_tmr = jnp.where(pot_tmr > 0, pot_tmr - 1, pot_tmr)

        ep = s["EpisodeStep"] + 1
        s["AgentPos"] = new_pos
        s["AgentDir"] = new_dir
        s["Held"] = held
        s["ItemGrid"] = items
        s["PotCount"] = pot_cnt
        s["PotTimer"] = pot_tmr
        s["Reward"] = reward
        s["Deliveries"] = deliveries
        s["EpisodeStep"] = ep
        s["Done"] = (ep >= EPISODE_LEN).astype(jnp.int32)
        return dataclasses.replace(state, singletons=s)

    def _obs_system(self, sm, state, node_key):
        """Lossless-style feature planes per agent ([H, W, 16]):
        0 own pos, 1-4 own dir, 5 other pos, 6-9 other dir, 10 pot onions
        /3, 11 cook remaining /20, 12 soup ready, 13-15 items on grid."""
        s = dict(state.singletons)
        w = s["Done"].shape[0]
        H, W_ = self.H, self.W
        terrain = self.terrain
        pot_rc = self.pot_rc

        pos = s["AgentPos"]
        dirs = s["AgentDir"]
        items = s["ItemGrid"]

        base = jnp.zeros((w, H, W_, self.obs_channels), jnp.float32)
        widx = jnp.arange(w)

        pot_plane = jnp.zeros((w, H, W_), jnp.float32)
        cook_plane = jnp.zeros((w, H, W_), jnp.float32)
        ready_plane = jnp.zeros((w, H, W_), jnp.float32)
        for i in range(self.n_pots):
            r, c = int(pot_rc[i, 0]), int(pot_rc[i, 1])
            pot_plane = pot_plane.at[:, r, c].set(
                s["PotCount"][:, i] / POT_CAPACITY
            )
            cook_plane = cook_plane.at[:, r, c].set(
                jnp.maximum(s["PotTimer"][:, i], 0) / COOK_TIME
            )
            ready_plane = ready_plane.at[:, r, c].set(
                (s["PotTimer"][:, i] == 0).astype(jnp.float32)
            )

        item_planes = jnp.stack(
            [(items == k).astype(jnp.float32) for k in (H_ONION, H_DISH, H_SOUP)],
            axis=-1,
        )

        def view(p):
            o = base
            other = 1 - p
            o = o.at[widx, pos[:, p, 0], pos[:, p, 1], 0].set(1.0)
            o = o.at[widx, pos[:, p, 0], pos[:, p, 1], 1 + dirs[:, p]].set(1.0)
            o = o.at[widx, pos[:, other, 0], pos[:, other, 1], 5].set(1.0)
            o = o.at[
                widx, pos[:, other, 0], pos[:, other, 1], 6 + dirs[:, other]
            ].set(1.0)
            o = o.at[..., 10].set(pot_plane)
            o = o.at[..., 11].set(cook_plane)
            o = o.at[..., 12].set(ready_plane)
            o = o.at[..., 13:16].set(item_planes)
            return o

        s["Obs"] = jnp.stack([view(p) for p in range(N_AGENTS)], axis=1)
        return dataclasses.replace(state, singletons=s)
