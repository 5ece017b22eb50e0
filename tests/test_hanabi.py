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
            return False
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
        return True

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
        if self.maybe_reset():
            # reset-step hold (mirrors the env: the in-flight action was
            # chosen from the dead episode's terminal obs)
            self.step_idx += 1
            return 0.0
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
    acts = Hanabi().random_actions(rs, 120, W)
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


# ------------------------------------------------- N-player generalization

class OracleHanabiN:
    """N-player oracle with the HLE action layout (hanabi.py docstring)."""

    def __init__(self, world_key, p):
        self.k = world_key
        self.p = p
        self.h = H.hand_size(p)
        self.step_idx = 0
        self.done = True

    def _node_key(self, node_id):
        sk = np_rng.split_i(self.k, np.uint32(self.step_idx))
        return np_rng.split_i(sk, np.uint32(node_id))

    def maybe_reset(self):
        if not self.done:
            return False
        nk = self._node_key(0)
        u = np.array(
            [np_rng.uniform(np_rng.split_i(nk, np.uint32(i)))
             for i in range(H.DECK)]
        )
        perm = np.argsort(u, kind="stable").astype(np.int64)
        p, h = self.p, self.h
        self.deck = perm
        self.hands = [list(perm[q * h:(q + 1) * h]) for q in range(p)]
        self.deck_pos = p * h
        self.hint_c = [[-1] * h for _ in range(p)]
        self.hint_r = [[-1] * h for _ in range(p)]
        self.fireworks = [0] * 5
        self.discards = [0] * 25
        self.info = H.MAX_INFO
        self.lives = H.MAX_LIVES
        self.cur = 0
        self.score = 0
        self.final_turns = -1
        self.done = False
        return True

    color = staticmethod(OracleHanabi.color)

    @staticmethod
    def rank(c):
        return int(H.CARD_RANK[c])

    def legal(self):
        p, h = self.p, self.h
        out = np.zeros(H.num_actions(p), np.int32)
        hand = self.hands[self.cur]
        for i in range(h):
            if hand[i] >= 0 and self.info < H.MAX_INFO:
                out[i] = 1
            if hand[i] >= 0:
                out[h + i] = 1
        if self.info > 0:
            for off in range(1, p):
                tgt = self.hands[(self.cur + off) % p]
                for v in range(5):
                    if any(c >= 0 and self.color(c) == v for c in tgt):
                        out[2 * h + (off - 1) * 5 + v] = 1
                    if any(c >= 0 and self.rank(c) == v for c in tgt):
                        out[2 * h + (p - 1) * 5 + (off - 1) * 5 + v] = 1
        return out

    def step(self, actions):
        if self.maybe_reset():
            self.step_idx += 1       # reset-step hold (see OracleHanabi)
            return 0.0
        p, h = self.p, self.h
        legal = self.legal()
        a = int(actions[self.cur])
        if not legal[a]:
            a = int(np.argmax(legal))
        cur = self.cur
        hand = self.hands[cur]
        old_score = self.score

        if a < 2 * h:  # discard / play
            kind, slot = (0, a) if a < h else (1, a - h)
            card = hand[slot]
            if kind == 1:
                if self.rank(card) == self.fireworks[self.color(card)]:
                    self.fireworks[self.color(card)] += 1
                    if self.fireworks[self.color(card)] == 5:
                        self.info = min(self.info + 1, H.MAX_INFO)
                else:
                    self.lives -= 1
                    self.discards[
                        self.color(card) * 5 + self.rank(card)
                    ] += 1
            else:
                self.info = min(self.info + 1, H.MAX_INFO)
                self.discards[self.color(card) * 5 + self.rank(card)] += 1
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
            hid = a - 2 * h
            if hid < (p - 1) * 5:
                off, val, is_color = hid // 5 + 1, hid % 5, True
            else:
                rid = hid - (p - 1) * 5
                off, val, is_color = rid // 5 + 1, rid % 5, False
            tgt = (cur + off) % p
            for i, c in enumerate(self.hands[tgt]):
                if c < 0:
                    continue
                if is_color and self.color(c) == val:
                    self.hint_c[tgt][i] = val
                if not is_color and self.rank(c) == val:
                    self.hint_r[tgt][i] = val

        self.score = sum(self.fireworks)
        if self.final_turns > 0:
            self.final_turns -= 1
        if self.deck_pos >= H.DECK and self.final_turns < 0:
            self.final_turns = p
        dead = self.lives <= 0
        perfect = self.score == 25
        self.done = dead or perfect or self.final_turns == 0
        if dead:
            self.score = 0
        reward = self.score - old_score
        self.cur = (cur + 1) % p
        self.step_idx += 1
        return reward


@pytest.mark.parametrize("p", [3, 4])
def test_nplayer_matches_oracle(p):
    env = Hanabi(num_players=p)
    sim = make_sim(env, num_worlds=2, seed=SEED + p, donate=False)
    step = sim.step_fn()
    s = sim.state
    rs = np.random.RandomState(p)
    acts = env.random_actions(rs, 120, 2)
    outs = []
    for t in range(120):
        s, o = step(
            s, {"action": acts[t], "reset": jnp.zeros((2,), jnp.int32)}
        )
        outs.append({k: np.asarray(v) for k, v in o.items()})

    base = np_rng.key(np.full((2,), SEED + p, np.uint32))
    keys = np_rng.split_i(base, np.arange(2, dtype=np.uint32))
    for wi in range(2):
        oracle = OracleHanabiN(keys[wi], p)
        for t in range(120):
            r = oracle.step(np.asarray(acts[t, wi]))
            assert outs[t]["reward"][wi] == r, (wi, t)
            assert outs[t]["score"][wi] == oracle.score, (wi, t)
            assert outs[t]["done"][wi] == int(oracle.done), (wi, t)


def test_card_knowledge_negative_info():
    env = Hanabi(obs_mode="card_knowledge")
    sim = make_sim(env, num_worlds=1, seed=3, donate=False)
    step = sim.step_fn()
    s = sim.state
    zero = jnp.zeros((1,), jnp.int32)
    # first step: any action resets then plays; use a color hint on
    # player 1's card 0 color: need the dealt hand => step once with
    # action 5 (play slot 0) to trigger reset, then read hands
    s, o = step(s, {"action": jnp.asarray([[5, 5]], jnp.int32),
                    "reset": zero})
    hands = np.asarray(s.singletons["Hands"])[0]
    cur = int(np.asarray(s.singletons["CurPlayer"])[0])
    other = 1 - cur
    tgt_color = int(H.CARD_COLOR[hands[other][0]])
    act = 10 + tgt_color     # reveal color to the only other player
    a = np.zeros((1, 2), np.int32)
    a[0, cur] = act
    s, o = step(s, {"action": jnp.asarray(a), "reset": zero})

    kc = np.asarray(s.singletons["KnowColor"])[0, other]   # [h, 5]
    hc = np.asarray(s.singletons["HintedColor"])[0, other]
    for i in range(5):
        card = hands[other][i]
        if card < 0:
            continue
        if int(H.CARD_COLOR[card]) == tgt_color:
            # matched: knowledge collapsed to one-hot + positive hint
            assert hc[i] == tgt_color
            assert kc[i].tolist() == [
                1 if c == tgt_color else 0 for c in range(5)
            ]
        else:
            # unmatched: hinted color excluded (negative information)
            assert kc[i, tgt_color] == 0
            assert kc[i].sum() == 4

    # obs carries the plausibility section and matches declared dim
    obs = np.asarray(o["obs"])
    assert obs.shape == (1, 2, env.obs_dim)
    assert np.isfinite(obs).all()
    base = H.compact_obs_dim(2)
    know_sec = obs[0, other, base:].reshape(2, 5, 35)
    # own (seat-relative 0) plausibility for card i == kc x kr outer
    kr = np.asarray(s.singletons["KnowRank"])[0, other]
    expect = (kc[:, :, None] * kr[:, None, :]).reshape(5, 25)
    np.testing.assert_array_equal(know_sec[0, :, :25], expect)


def test_knowledge_shifts_on_removal():
    env = Hanabi(obs_mode="card_knowledge")
    sim = make_sim(env, num_worlds=1, seed=5, donate=False)
    step = sim.step_fn()
    s = sim.state
    zero = jnp.zeros((1,), jnp.int32)
    s, _ = step(s, {"action": jnp.asarray([[5, 5]], jnp.int32),
                    "reset": zero})
    hands = np.asarray(s.singletons["Hands"])[0]
    cur = int(np.asarray(s.singletons["CurPlayer"])[0])
    other = 1 - cur
    tgt_color = int(H.CARD_COLOR[hands[other][0]])
    a = np.zeros((1, 2), np.int32)
    a[0, cur] = 10 + tgt_color
    s, _ = step(s, {"action": jnp.asarray(a), "reset": zero})
    kc_before = np.asarray(s.singletons["KnowColor"])[0, other]
    # the hinted player (now current) discards slot 0 -> knowledge shifts
    a2 = np.zeros((1, 2), np.int32)
    a2[0, other] = 0
    s, _ = step(s, {"action": jnp.asarray(a2), "reset": zero})
    kc_after = np.asarray(s.singletons["KnowColor"])[0, other]
    np.testing.assert_array_equal(kc_after[:4], kc_before[1:])
    assert kc_after[4].tolist() == [1] * 5     # fresh draw: all possible


# ----------------------------------------------- rule-derived vectors
# These assert public HLE/Hanabi rules on hand-stacked states, fully
# independent of the NumPy twin (PARITY.md oracle caveat): the expected
# values below are derived from the published rules of Hanabi, not from
# running any oracle.


def _stacked_state(sim, **overrides):
    """Set singletons of world 0 to a known configuration."""
    import dataclasses

    s = dict(sim.state.singletons)
    overrides.setdefault("FinalTurns", -1)   # deck not out
    overrides.setdefault("DeckPos", 20)
    for k, v in overrides.items():
        arr = np.asarray(s[k]).copy()
        arr[0] = v
        s[k] = jnp.asarray(arr)
    return dataclasses.replace(sim.state, singletons=s)


def _rule_sim():
    sim = make_sim(Hanabi(), num_worlds=1, seed=3, donate=False)
    return sim, sim.step_fn()


def _step0(sim, step, state, action):
    acts = np.zeros((1, 2), np.int32)
    acts[0, :] = action
    return step(
        state, {"action": jnp.asarray(acts),
                "reset": jnp.zeros((1,), jnp.int32)}
    )


def test_rule_play_correct_card_scores():
    """Playing the next rank of a color raises that firework by one and
    scores exactly one point (rule: fireworks ascend 1..5 per color)."""
    sim, step = _rule_sim()
    # card id 0 = color 0, rank 0; empty fireworks -> playable
    st = _stacked_state(
        sim, Hands=[[0, 10, 20, 30, 40], [1, 11, 21, 31, 41]],
        Fireworks=[0] * 5, Info=4, Lives=3, CurPlayer=0, Score=0,
        Done=0, Reset=0,
    )
    st, o = _step0(sim, step, st, H.HAND + 0)  # play slot 0
    assert int(np.asarray(st.singletons["Fireworks"])[0, 0]) == 1
    assert float(o["reward"][0]) == 1.0
    assert int(o["score"][0]) == 1
    assert int(np.asarray(st.singletons["Lives"])[0]) == 3


def test_rule_misplay_burns_life_not_score():
    sim, step = _rule_sim()
    # card id 9 = color 0, rank 4 — not playable on an empty firework
    st = _stacked_state(
        sim, Hands=[[9, 10, 20, 30, 40], [1, 11, 21, 31, 41]],
        Fireworks=[0] * 5, Info=4, Lives=3, CurPlayer=0, Score=0,
        Done=0, Reset=0,
    )
    st, o = _step0(sim, step, st, H.HAND + 0)
    assert int(np.asarray(st.singletons["Lives"])[0]) == 2
    assert int(o["score"][0]) == 0
    assert float(o["reward"][0]) == 0.0
    # misplayed card goes to the discard pile (type color0 rank4 = 4)
    assert int(np.asarray(st.singletons["DiscardCount"])[0, 4]) == 1


def test_rule_hint_costs_token_discard_regains():
    sim, step = _rule_sim()
    st = _stacked_state(
        sim, Hands=[[0, 10, 20, 30, 40], [1, 11, 21, 31, 41]],
        Info=4, Lives=3, CurPlayer=0, Done=0, Reset=0,
    )
    # hint color 0 to the other player (action 2h + color)
    st, _ = _step0(sim, step, st, 2 * H.HAND + 0)
    assert int(np.asarray(st.singletons["Info"])[0]) == 3
    # now player 1 discards slot 0 -> token returns
    st, _ = _step0(sim, step, st, 0)
    assert int(np.asarray(st.singletons["Info"])[0]) == 4


def test_rule_completing_firework_grants_bonus_token():
    """Finishing a color's firework (playing its 5) restores one info
    token even without discarding (HLE rule)."""
    sim, step = _rule_sim()
    # card id 9 = color 0, rank 4 (the "5"); firework 0 at height 4
    st = _stacked_state(
        sim, Hands=[[9, 10, 20, 30, 40], [1, 11, 21, 31, 41]],
        Fireworks=[4, 0, 0, 0, 0], Info=2, Lives=3, CurPlayer=0,
        Score=4, Done=0, Reset=0,
    )
    st, o = _step0(sim, step, st, H.HAND + 0)
    assert int(np.asarray(st.singletons["Fireworks"])[0, 0]) == 5
    assert int(np.asarray(st.singletons["Info"])[0]) == 3
    assert float(o["reward"][0]) == 1.0


def test_rule_discard_illegal_at_max_tokens():
    sim, step = _rule_sim()
    st = _stacked_state(
        sim, Hands=[[0, 10, 20, 30, 40], [1, 11, 21, 31, 41]],
        Info=H.MAX_INFO, CurPlayer=0, Done=0, Reset=0,
    )
    # legal_moves export reflects the *post-step* state for the next
    # player; compute directly instead
    lm = np.asarray(H._legal_moves(sim.env, dict(st.singletons)))
    assert (lm[0, :H.HAND] == 0).all()          # discards illegal
    assert (lm[0, H.HAND:2 * H.HAND] == 1).all()  # plays legal


def test_rule_out_of_lives_zeroes_score():
    sim, step = _rule_sim()
    st = _stacked_state(
        sim, Hands=[[9, 10, 20, 30, 40], [1, 11, 21, 31, 41]],
        Fireworks=[0, 3, 0, 0, 0], Info=4, Lives=1, CurPlayer=0,
        Score=3, Done=0, Reset=0,
    )
    st, o = _step0(sim, step, st, H.HAND + 0)   # misplay with 1 life left
    assert int(o["done"][0]) == 1
    assert int(o["score"][0]) == 0              # HLE: death zeroes score
