"""Hanabi: independent NumPy oracle + trajectory equivalence.

Mirrors the Cartpole oracle pattern (SURVEY.md §4): the game rules are
implemented twice — engine (jnp systems) and oracle (this file, numpy) —
and stepped with the same action stream; score/state trajectories must
match exactly, including the deck permutations drawn from the Threefry
stream.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import np_rng
from madrona_tpu.models.base import make_sim
from madrona_tpu.models import hanabi as H
from madrona_tpu.models.hanabi import Hanabi

W = 4
SEED = 11


class OracleHanabi:
    """One world's game, NumPy, HLE-default rules (see hanabi.py)."""

    def __init__(self, world_key):
        self.k = world_key  # [2] uint32 per-world engine key
        self.step_idx = 0
        self.done = True    # init_worlds forces first-step reset

    def _node_key(self, node_id):
        sk = np_rng.split_i(self.k, np.uint32(self.step_idx))
        return np_rng.split_i(sk, np.uint32(node_id))

    def maybe_reset(self):
        if not self.done:
            return
        nk = self._node_key(0)
        u = np.array(
            [np_rng.uniform(np_rng.split_i(nk, np.uint32(i)))
             for i in range(H.DECK)]
        )
        perm = np.argsort(u, kind="stable").astype(np.int64)
        self.deck = perm
        self.hands = [list(perm[:5]), list(perm[5:10])]
        self.deck_pos = 10
        self.hint_c = [[-1] * 5 for _ in range(2)]
        self.hint_r = [[-1] * 5 for _ in range(2)]
        self.fireworks = [0] * 5
        self.discards = [0] * 25
        self.info = H.MAX_INFO
        self.lives = H.MAX_LIVES
        self.cur = 0
        self.score = 0
        self.final_turns = -1
        self.done = False

    @staticmethod
    def color(c):
        return c // 10

    @staticmethod
    def rank(c):
        return int(H.CARD_RANK[c])

    def legal(self):
        out = np.zeros(20, np.int32)
        hand = self.hands[self.cur]
        other = self.hands[1 - self.cur]
        for i in range(5):
            occ = hand[i] >= 0
            if occ and self.info < H.MAX_INFO:
                out[i] = 1
            if occ:
                out[5 + i] = 1
        if self.info > 0:
            for i in range(5):
                if any(c >= 0 and self.color(c) == i for c in other):
                    out[10 + i] = 1
                if any(c >= 0 and self.rank(c) == i for c in other):
                    out[15 + i] = 1
        return out

    def step(self, actions):
        self.maybe_reset()
        legal = self.legal()
        a = int(actions[self.cur])
        if not legal[a]:
            a = int(np.argmax(legal))
        kind, slot = a // 5, a % 5
        cur, other = self.cur, 1 - self.cur
        hand = self.hands[cur]
        old_score = self.score

        if kind in (0, 1):  # discard / play
            card = hand[slot]
            if kind == 1:
                if self.rank(card) == self.fireworks[self.color(card)]:
                    self.fireworks[self.color(card)] += 1
                    if self.fireworks[self.color(card)] == 5:
                        self.info = min(self.info + 1, H.MAX_INFO)
                else:
                    self.lives -= 1
                    self.discards[self.color(card) * 5 + self.rank(card)] += 1
            else:
                self.info = min(self.info + 1, H.MAX_INFO)
                self.discards[self.color(card) * 5 + self.rank(card)] += 1
            # shift-left + draw at rightmost
            del hand[slot]
            del self.hint_c[cur][slot]
            del self.hint_r[cur][slot]
            if self.deck_pos < H.DECK:
                hand.append(int(self.deck[self.deck_pos]))
                self.deck_pos += 1
            else:
                hand.append(-1)
            self.hint_c[cur].append(-1)
            self.hint_r[cur].append(-1)
        else:  # hints
            self.info -= 1
            for i, c in enumerate(self.hands[other]):
                if c < 0:
                    continue
                if kind == 2 and self.color(c) == slot:
                    self.hint_c[other][i] = slot
                if kind == 3 and self.rank(c) == slot:
                    self.hint_r[other][i] = slot

        self.score = sum(self.fireworks)
        if self.final_turns > 0:
            self.final_turns -= 1
        if self.deck_pos >= H.DECK and self.final_turns < 0:
            self.final_turns = 2
        dead = self.lives <= 0
        perfect = self.score == 25
        self.done = dead or perfect or self.final_turns == 0
        if dead:
            self.score = 0
        reward = self.score - old_score
        self.cur = other
        self.step_idx += 1
        return reward


@pytest.fixture(scope="module")
def rollout():
    sim = make_sim(Hanabi(), num_worlds=W, seed=SEED, donate=False)
    step = sim.step_fn()
    s = sim.state
    rs = np.random.RandomState(7)
    acts = Hanabi.random_actions(rs, 120, W)
    outs = []
    for t in range(120):
        s, o = step(
            s, {"action": acts[t], "reset": jnp.zeros((W,), jnp.int32)}
        )
        outs.append({k: np.asarray(v) for k, v in o.items()})
    return np.asarray(acts), outs, s


def test_trajectory_matches_numpy_oracle(rollout):
    acts, outs, _ = rollout
    base = np_rng.key(np.full((W,), SEED, np.uint32))
    keys = np_rng.split_i(base, np.arange(W, dtype=np.uint32))
    for wi in range(W):
        oracle = OracleHanabi(keys[wi])
        for t in range(120):
            r = oracle.step(np.asarray(acts[t, wi]))
            assert outs[t]["reward"][wi] == r, (wi, t)
            assert outs[t]["score"][wi] == oracle.score, (wi, t)
            assert outs[t]["done"][wi] == int(oracle.done), (wi, t)


def test_legal_moves_and_conservation(rollout):
    _, outs, s = rollout
    # tokens in range; card conservation at the end of the run
    info = np.asarray(s.singletons["Info"])
    lives = np.asarray(s.singletons["Lives"])
    assert ((info >= 0) & (info <= H.MAX_INFO)).all()
    assert ((lives >= 0) & (lives <= H.MAX_LIVES)).all()
    for o in outs[-5:]:
        lm = o["legal_moves"]
        assert lm.shape == (W, 20)
        assert (lm.sum(axis=1) >= 1).all()


def test_deterministic(rollout):
    acts, outs, _ = rollout
    sim = make_sim(Hanabi(), num_worlds=W, seed=SEED, donate=False)
    step = sim.step_fn()
    s = sim.state
    for t in range(30):
        s, o = step(
            s,
            {"action": jnp.asarray(acts[t]), "reset": jnp.zeros((W,), jnp.int32)},
        )
        np.testing.assert_array_equal(np.asarray(o["obs"]), outs[t]["obs"])
