"""Hanabi: cooperative card game environment (2 players, full deck).

Capability-parity target for the reference ecosystem's Hanabi env
(madrona_rl_envs ``hanabi_env``, which wraps Hanabi-Learning-Environment
semantics in ECS systems; ``/root/reference/README.md:44-49``). Rules
follow the HLE defaults for the 2-player game: 5 colors x 5 ranks, deck
counts (3,2,2,2,1) per color, hand size 5, 8 info tokens, 3 life tokens;
running out of lives ends the game with score 0; after the deck empties
every player gets one final turn.

Action space (20, current player only): 0-4 discard slot, 5-9 play slot,
10-14 reveal color, 15-19 reveal rank. Illegal actions are replaced by
the first legal action (deterministic; the learner should mask with the
exported ``legal_moves``).

TPU design: the whole game is singleton arrays stepped by one custom
node — branchless masked updates over [W] worlds; hands shift-left on
removal exactly like HLE; the deck is a 50-card permutation drawn from
the engine's per-(world, step) Threefry stream at reset.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core.registry import ECSRegistry
from ..graph.builder import TaskGraphBuilder
from ..utils import rng as _rng
from .base import EnvBase

N_COLORS = 5
N_RANKS = 5
HAND = 5
N_PLAYERS = 2
DECK = 50
MAX_INFO = 8
MAX_LIVES = 3
N_ACTIONS = 4 * HAND  # 20: discard/play slots + color/rank hints

# deck composition per color: ranks 0,0,0,1,1,2,2,3,3,4
_RANK_COUNTS = (3, 2, 2, 2, 1)
_CARD_RANKS = np.concatenate(
    [np.full(c, r) for r, c in enumerate(_RANK_COUNTS)]
)  # [10]
CARD_COLOR = np.repeat(np.arange(N_COLORS), 10).astype(np.int32)   # [50]
CARD_RANK = np.tile(_CARD_RANKS, N_COLORS).astype(np.int32)        # [50]

OBS_DIM = (
    N_COLORS * (N_RANKS + 1)        # fireworks one-hot (incl. empty)
    + (MAX_INFO + 1) + (MAX_LIVES + 1) + (DECK + 1)  # token/deck one-hots
    + HAND * (N_COLORS * N_RANKS + 1)   # partner hand one-hot (+empty)
    + HAND * (N_COLORS + N_RANKS + 2)   # own knowledge (hinted onehots+flags)
    + DECK // 2                          # discard counts per (color, rank)/...
)


class Hanabi(EnvBase):
    name = "hanabi"
    num_agents = N_PLAYERS
    action_is_discrete = True
    action_shape = (N_PLAYERS,)
    action_buckets = (N_ACTIONS,)

    @staticmethod
    def random_actions(rs, steps, num_worlds):
        return jnp.asarray(
            rs.randint(0, N_ACTIONS, (steps, num_worlds, N_PLAYERS)),
            jnp.int32,
        )

    def register_types(self, reg: ECSRegistry):
        reg.register_singleton("Deck", (DECK,), jnp.int32)      # card ids
        reg.register_singleton("DeckPos", (), jnp.int32)
        reg.register_singleton("Hands", (N_PLAYERS, HAND), jnp.int32)
        reg.register_singleton("HintedColor", (N_PLAYERS, HAND), jnp.int32)
        reg.register_singleton("HintedRank", (N_PLAYERS, HAND), jnp.int32)
        reg.register_singleton("Fireworks", (N_COLORS,), jnp.int32)
        reg.register_singleton("DiscardCount", (DECK // 2,), jnp.int32)
        reg.register_singleton("Info", (), jnp.int32)
        reg.register_singleton("Lives", (), jnp.int32)
        reg.register_singleton("CurPlayer", (), jnp.int32)
        reg.register_singleton("Score", (), jnp.int32)
        reg.register_singleton("FinalTurns", (), jnp.int32)  # -1 until deck out
        reg.register_singleton("Action", (N_PLAYERS,), jnp.int32)
        reg.register_singleton("Reward", (), jnp.float32)
        reg.register_singleton("Done", (), jnp.int32)
        reg.register_singleton("Reset", (), jnp.int32)
        reg.register_singleton("EpisodeStep", (), jnp.int32)
        reg.register_singleton("Obs", (N_PLAYERS, OBS_DIM), jnp.float32)
        reg.register_singleton("LegalMoves", (N_ACTIONS,), jnp.int32)

        reg.import_singleton("Action", "action")
        reg.import_singleton("Reset", "reset")
        reg.export_singleton("Obs", "obs")
        reg.export_singleton("LegalMoves", "legal_moves")
        reg.export_singleton("Reward", "reward")
        reg.export_singleton("Done", "done")
        reg.export_singleton("Score", "score")
        reg.export_singleton("CurPlayer", "cur_player")

    def setup_tasks(self, b: TaskGraphBuilder):
        n_reset = b.custom(_reset_system, name="hanabi_reset")
        n_step = b.custom(_turn_system, deps=[n_reset], name="hanabi_turn")
        b.custom(_obs_system, deps=[n_step], name="hanabi_obs")

    def init_worlds(self, sm, state):
        singles = dict(state.singletons)
        singles["Done"] = jnp.ones_like(singles["Done"])
        return dataclasses.replace(state, singletons=singles)


def card_color(card):
    return card // 10


def card_rank(card):
    rank_tbl = jnp.asarray(CARD_RANK)
    return jnp.where(card >= 0, rank_tbl[jnp.clip(card, 0, DECK - 1)], -1)


def _legal_moves(s):
    """[W, 20] int mask for the current player."""
    w = s["Info"].shape[0]
    cur = s["CurPlayer"]
    widx = jnp.arange(w)
    hand = s["Hands"][widx, cur]                      # [W, 5]
    other = s["Hands"][widx, 1 - cur]
    occupied = hand >= 0
    can_discard = occupied & (s["Info"] < MAX_INFO)[:, None]
    can_play = occupied
    oc = card_color(other)
    orank = card_rank(other)
    has_info = (s["Info"] > 0)[:, None]
    color_hint = has_info & jax.vmap(
        lambda occ, c: jnp.array(
            [jnp.any(occ & (c == i)) for i in range(N_COLORS)]
        )
    )(other >= 0, oc)
    rank_hint = has_info & jax.vmap(
        lambda occ, r: jnp.array(
            [jnp.any(occ & (r == i)) for i in range(N_RANKS)]
        )
    )(other >= 0, orank)
    return jnp.concatenate(
        [can_discard, can_play, color_hint, rank_hint], axis=1
    ).astype(jnp.int32)


def _reset_system(sm, state, node_key):
    need = (state.singletons["Done"] > 0) | (state.singletons["Reset"] > 0)
    w = need.shape[0]

    # deck permutation: sort 50 uniforms from the per-world stream
    u = jnp.stack(
        [
            _rng.sample_uniform(
                _rng.split_i(node_key, jnp.full((w,), i, jnp.uint32))
            )
            for i in range(DECK)
        ],
        axis=-1,
    )  # [W, 50]
    perm = jnp.argsort(u, axis=-1).astype(jnp.int32)  # card ids in draw order

    hands = jnp.stack(
        [perm[:, p * HAND:(p + 1) * HAND] for p in range(N_PLAYERS)], axis=1
    )
    s = dict(state.singletons)

    def pick(name, fresh):
        cur = s[name]
        sel = need.reshape((w,) + (1,) * (cur.ndim - 1))
        return jnp.where(sel, jnp.asarray(fresh, cur.dtype), cur)

    s["Deck"] = pick("Deck", perm)
    s["DeckPos"] = pick("DeckPos", N_PLAYERS * HAND)
    s["Hands"] = pick("Hands", hands)
    s["HintedColor"] = pick("HintedColor", jnp.full((w, N_PLAYERS, HAND), -1))
    s["HintedRank"] = pick("HintedRank", jnp.full((w, N_PLAYERS, HAND), -1))
    s["Fireworks"] = pick("Fireworks", jnp.zeros((w, N_COLORS)))
    s["DiscardCount"] = pick("DiscardCount", jnp.zeros((w, DECK // 2)))
    s["Info"] = pick("Info", MAX_INFO)
    s["Lives"] = pick("Lives", MAX_LIVES)
    s["CurPlayer"] = pick("CurPlayer", 0)
    s["Score"] = pick("Score", 0)
    s["FinalTurns"] = pick("FinalTurns", -1)
    s["EpisodeStep"] = pick("EpisodeStep", 0)
    return dataclasses.replace(state, singletons=s)


def _turn_system(sm, state, node_key):
    s = dict(state.singletons)
    w = s["Info"].shape[0]
    widx = jnp.arange(w)
    cur = s["CurPlayer"]

    legal = _legal_moves(s)                          # [W, 20]
    raw = s["Action"][widx, cur]
    is_legal = legal[widx, raw] > 0
    first_legal = jnp.argmax(legal, axis=1)
    act = jnp.where(is_legal, raw, first_legal)

    kind = act // HAND          # 0 discard, 1 play, 2 color hint, 3 rank hint
    slot = act % HAND

    hand = s["Hands"][widx, cur]                     # [W, 5]
    card = hand[widx, jnp.clip(slot, 0, HAND - 1)]
    ccol = card_color(jnp.maximum(card, 0))
    crank = card_rank(card)

    is_discard = kind == 0
    is_play = kind == 1
    is_chint = kind == 2
    is_rhint = kind == 3
    removes = is_discard | is_play

    # ---- play resolution
    fw = s["Fireworks"]
    fw_cur = fw[widx, ccol]
    success = is_play & (crank == fw_cur)
    fw = fw.at[widx, ccol].add(jnp.where(success, 1, 0))
    completed = success & (fw[widx, ccol] == N_RANKS)
    lives = s["Lives"] - jnp.where(is_play & ~success, 1, 0)
    info = s["Info"] + jnp.where(
        is_discard | completed, 1, 0
    )
    info = info - jnp.where(is_chint | is_rhint, 1, 0)
    info = jnp.clip(info, 0, MAX_INFO)

    # discard pile: count per card *type* (color*5+rank)
    ctype = ccol * N_RANKS + jnp.maximum(crank, 0)
    add_discard = (is_discard | (is_play & ~success)) & (card >= 0)
    discards = s["DiscardCount"].at[widx, ctype].add(
        jnp.where(add_discard, 1, 0)
    )

    # ---- hand update: shift-left removal + draw at the rightmost slot
    deck_pos = s["DeckPos"]
    can_draw = deck_pos < DECK
    drawn = jnp.where(can_draw, s["Deck"][widx, jnp.clip(deck_pos, 0, DECK - 1)], -1)

    slots = jnp.arange(HAND)[None, :]
    shift = removes[:, None] & (slots >= slot[:, None])
    next_slot = jnp.clip(slots + 1, 0, HAND - 1)
    hand_shifted = jnp.where(shift, hand[widx[:, None], next_slot], hand)
    hand_shifted = jnp.where(
        removes[:, None] & (slots == HAND - 1), drawn[:, None], hand_shifted
    )
    hc = s["HintedColor"][widx, cur]
    hr = s["HintedRank"][widx, cur]
    hc_shift = jnp.where(shift, hc[widx[:, None], next_slot], hc)
    hr_shift = jnp.where(shift, hr[widx[:, None], next_slot], hr)
    hc_shift = jnp.where(removes[:, None] & (slots == HAND - 1), -1, hc_shift)
    hr_shift = jnp.where(removes[:, None] & (slots == HAND - 1), -1, hr_shift)

    hands = s["Hands"].at[widx, cur].set(
        jnp.where(removes[:, None], hand_shifted, hand)
    )
    hinted_c = s["HintedColor"].at[widx, cur].set(
        jnp.where(removes[:, None], hc_shift, hc)
    )
    hinted_r = s["HintedRank"].at[widx, cur].set(
        jnp.where(removes[:, None], hr_shift, hr)
    )
    deck_pos = deck_pos + jnp.where(removes & can_draw, 1, 0)

    # ---- hints mark the other player's matching cards
    other = 1 - cur
    ohand = hands[widx, other]
    oc = card_color(jnp.maximum(ohand, 0))
    orank = card_rank(ohand)
    target = slot  # hint value rides in the slot field
    mark_c = is_chint[:, None] & (ohand >= 0) & (oc == target[:, None])
    mark_r = is_rhint[:, None] & (ohand >= 0) & (orank == target[:, None])
    hinted_c = hinted_c.at[widx, other].set(
        jnp.where(mark_c, target[:, None], hinted_c[widx, other])
    )
    hinted_r = hinted_r.at[widx, other].set(
        jnp.where(mark_r, target[:, None], hinted_r[widx, other])
    )

    # ---- scoring / termination (HLE: out of lives -> score 0)
    old_score = s["Score"]
    score = jnp.sum(fw, axis=1)
    dead = lives <= 0
    final_turns = s["FinalTurns"]
    # decrement an active countdown first, THEN arm it when the deck just
    # ran out — the player who drew the last card also gets a final turn
    final_turns = jnp.where(final_turns > 0, final_turns - 1, final_turns)
    deck_out = (deck_pos >= DECK) & (final_turns < 0)
    final_turns = jnp.where(deck_out, N_PLAYERS, final_turns)
    perfect = score == N_COLORS * N_RANKS
    done = dead | perfect | (final_turns == 0)
    score = jnp.where(dead, 0, score)
    reward = (score - old_score).astype(jnp.float32)

    s["Fireworks"] = fw
    s["Lives"] = lives
    s["Info"] = info
    s["DiscardCount"] = discards
    s["Hands"] = hands
    s["HintedColor"] = hinted_c
    s["HintedRank"] = hinted_r
    s["DeckPos"] = deck_pos
    s["CurPlayer"] = other
    s["Score"] = score
    s["FinalTurns"] = final_turns
    s["Done"] = done.astype(jnp.int32)
    s["Reward"] = reward
    s["EpisodeStep"] = s["EpisodeStep"] + 1
    return dataclasses.replace(state, singletons=s)


def _obs_system(sm, state, node_key):
    s = dict(state.singletons)
    w = s["Info"].shape[0]
    widx = jnp.arange(w)

    def onehot(x, n):
        return jax.nn.one_hot(jnp.clip(x, 0, n - 1), n) * (x >= 0)[..., None]

    fw = jax.nn.one_hot(s["Fireworks"], N_RANKS + 1).reshape(w, -1)
    info = jax.nn.one_hot(s["Info"], MAX_INFO + 1)
    lives = jax.nn.one_hot(s["Lives"], MAX_LIVES + 1)
    deck_left = jax.nn.one_hot(DECK - s["DeckPos"], DECK + 1)
    discards = s["DiscardCount"].astype(jnp.float32) / 3.0

    def player_view(p):
        other = 1 - p
        ohand = s["Hands"][:, other]
        otype = card_color(jnp.maximum(ohand, 0)) * N_RANKS + jnp.maximum(
            card_rank(ohand), 0
        )
        ocard = jnp.concatenate(
            [
                onehot(jnp.where(ohand >= 0, otype, -1), N_COLORS * N_RANKS),
                (ohand < 0)[..., None].astype(jnp.float32),
            ],
            axis=-1,
        ).reshape(w, -1)
        kc = s["HintedColor"][:, p]
        kr = s["HintedRank"][:, p]
        know = jnp.concatenate(
            [
                onehot(kc, N_COLORS),
                onehot(kr, N_RANKS),
                (kc >= 0)[..., None].astype(jnp.float32),
                (kr >= 0)[..., None].astype(jnp.float32),
            ],
            axis=-1,
        ).reshape(w, -1)
        return jnp.concatenate(
            [fw, info, lives, deck_left, ocard, know, discards], axis=-1
        )

    obs = jnp.stack([player_view(p) for p in range(N_PLAYERS)], axis=1)
    s["Obs"] = obs
    s["LegalMoves"] = _legal_moves(s)
    return dataclasses.replace(state, singletons=s)
