"""Overcooked: independent NumPy oracle + trajectory equivalence.

The env is deterministic (no RNG), so the oracle is a direct rules
re-implementation stepped with the same action stream; rewards, agent
state and pot state must match exactly. Plus a scripted cook-and-serve
episode that checks the full onion -> pot -> cook -> dish -> soup ->
delivery chain pays DELIVERY_REWARD.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from madrona_tpu.models.base import make_sim
from madrona_tpu.models import overcooked as OC
from madrona_tpu.models.overcooked import Overcooked

W = 4


class Oracle:
    def __init__(self, env):
        self.t = env.terrain
        self.H, self.W = env.H, env.W
        self.pot_rc = [tuple(rc) for rc in env.pot_rc]
        self.start = env.start_pos
        self.reset()

    def reset(self):
        self.pos = [tuple(self.start[0]), tuple(self.start[1])]
        self.dir = [OC.A_SOUTH, OC.A_SOUTH]
        self.held = [OC.H_NONE, OC.H_NONE]
        self.pot_cnt = [0] * len(self.pot_rc)
        self.pot_tmr = [-1] * len(self.pot_rc)
        self.items = np.zeros((self.H, self.W), np.int32)
        self.step_i = 0

    def step(self, acts):
        D = OC.DELTAS
        # movement
        new_dir = list(self.dir)
        prop = list(self.pos)
        for a in range(2):
            act = int(acts[a])
            if act < 4:
                new_dir[a] = act
                r = min(max(self.pos[a][0] + D[act][0], 0), self.H - 1)
                c = min(max(self.pos[a][1] + D[act][1], 0), self.W - 1)
                if self.t[r, c] == OC.T_FLOOR:
                    prop[a] = (r, c)
        if prop[0] == prop[1] or (
            prop[0] == self.pos[1] and prop[1] == self.pos[0]
        ):
            prop = list(self.pos)
        self.pos = prop
        self.dir = new_dir

        reward = 0.0
        for a in range(2):
            if int(acts[a]) != OC.A_INTERACT:
                continue
            r = min(max(self.pos[a][0] + D[self.dir[a]][0], 0), self.H - 1)
            c = min(max(self.pos[a][1] + D[self.dir[a]][1], 0), self.W - 1)
            tile = self.t[r, c]
            h = self.held[a]
            if tile == OC.T_ONION and h == OC.H_NONE:
                self.held[a] = OC.H_ONION
            elif tile == OC.T_DISH and h == OC.H_NONE:
                self.held[a] = OC.H_DISH
            elif tile == OC.T_POT and (r, c) in self.pot_rc:
                i = self.pot_rc.index((r, c))
                if (
                    h == OC.H_ONION
                    and self.pot_cnt[i] < OC.POT_CAPACITY
                    and self.pot_tmr[i] < 0
                ):
                    self.pot_cnt[i] += 1
                    self.held[a] = OC.H_NONE
                    if self.pot_cnt[i] == OC.POT_CAPACITY:
                        self.pot_tmr[i] = OC.COOK_TIME
                elif h == OC.H_DISH and self.pot_tmr[i] == 0:
                    self.pot_cnt[i] = 0
                    self.pot_tmr[i] = -1
                    self.held[a] = OC.H_SOUP
            elif tile == OC.T_SERVE and h == OC.H_SOUP:
                reward += OC.DELIVERY_REWARD
                self.held[a] = OC.H_NONE
            elif tile == OC.T_COUNTER:
                ci = self.items[r, c]
                if h != OC.H_NONE and ci == OC.H_NONE:
                    self.items[r, c] = h
                    self.held[a] = OC.H_NONE
                elif h == OC.H_NONE and ci != OC.H_NONE:
                    self.held[a] = ci
                    self.items[r, c] = OC.H_NONE
        for i in range(len(self.pot_rc)):
            if self.pot_tmr[i] > 0:
                self.pot_tmr[i] -= 1
        self.step_i += 1
        return reward


def test_trajectory_matches_numpy_oracle():
    env = Overcooked()
    sim = make_sim(env, num_worlds=W, seed=0, donate=False)
    step = sim.step_fn()
    s = sim.state
    rs = np.random.RandomState(3)
    acts = Overcooked.random_actions(rs, 150, W)
    oracles = [Oracle(env) for _ in range(W)]
    for t in range(150):
        s, o = step(
            s, {"action": acts[t], "reset": jnp.zeros((W,), jnp.int32)}
        )
        pos = np.asarray(s.singletons["AgentPos"])
        held = np.asarray(s.singletons["Held"])
        cnt = np.asarray(s.singletons["PotCount"])
        tmr = np.asarray(s.singletons["PotTimer"])
        rew = np.asarray(o["reward"])
        for wi in range(W):
            r = oracles[wi].step(np.asarray(acts[t, wi]))
            assert rew[wi] == r, (t, wi)
            assert (pos[wi] == np.asarray(oracles[wi].pos)).all(), (t, wi)
            assert (held[wi] == oracles[wi].held).all(), (t, wi)
            assert (cnt[wi] == oracles[wi].pot_cnt).all(), (t, wi)
            assert (tmr[wi] == oracles[wi].pot_tmr).all(), (t, wi)


def test_scripted_cook_and_serve():
    """Agent 0 cooks and serves one soup in cramped_room."""
    env = Overcooked()
    sim = make_sim(env, num_worlds=1, seed=0, donate=False)
    step = sim.step_fn()
    s = sim.state

    def do(s, a0, a1=OC.A_STAY):
        acts = jnp.asarray([[a0, a1]], jnp.int32)
        return step(s, {"action": acts, "reset": jnp.zeros((1,), jnp.int32)})

    # layout: pot at (0,2); onion dispensers at (1,0)/(1,4); dish at (3,1);
    # serve at (3,3). Agent 0 starts at (1,1), agent 1 at (1,3).
    total = 0.0
    script = []
    # 3x: face onion dispenser west, grab, go to pot, drop
    for _ in range(3):
        script += [OC.A_WEST, OC.A_INTERACT]           # face+grab onion
        script += [OC.A_EAST, OC.A_NORTH, OC.A_INTERACT]  # face pot, drop
        script += [OC.A_WEST]                           # back to (1,1)... west moves
    # wait for cook (20 ticks), grab dish at (3,1): go south twice, face dish
    script += [OC.A_STAY] * OC.COOK_TIME
    # dish: (1,1) -> (2,1), face dish (3,1), grab
    script += [OC.A_SOUTH, OC.A_SOUTH, OC.A_INTERACT]
    # soup: (2,1) -> (1,1) -> (1,2), face pot (0,2), take
    script += [OC.A_NORTH, OC.A_EAST, OC.A_NORTH, OC.A_INTERACT]
    rewards = []
    for a in script:
        s, o = do(s, a)
        rewards.append(float(o["reward"][0]))
    held = int(np.asarray(s.singletons["Held"])[0, 0])
    assert held == OC.H_SOUP, f"expected soup in hand, got {held}"
    # serve: (1,2) -> (2,2) -> (2,3), face serve (3,3), deliver
    for a in [OC.A_SOUTH, OC.A_EAST, OC.A_SOUTH, OC.A_INTERACT]:
        s, o = do(s, a)
        rewards.append(float(o["reward"][0]))
    assert max(rewards) == OC.DELIVERY_REWARD, rewards


def test_collision_rules():
    env = Overcooked()
    sim = make_sim(env, num_worlds=1, seed=0, donate=False)
    step = sim.step_fn()
    s = sim.state
    # agents at (1,1) and (1,3); both move toward (1,2) -> neither moves
    acts = jnp.asarray([[OC.A_EAST, OC.A_WEST]], jnp.int32)
    s, _ = step(s, {"action": acts, "reset": jnp.zeros((1,), jnp.int32)})
    pos = np.asarray(s.singletons["AgentPos"])[0]
    assert (pos == env.start_pos).all(), pos
