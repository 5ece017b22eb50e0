"""Hanabi: cooperative card game environment (2-5 players, full deck).

Capability-parity target for the reference ecosystem's Hanabi env
(madrona_rl_envs ``hanabi_env``, which wraps Hanabi-Learning-Environment
semantics in ECS systems; ``/root/reference/README.md:44-49``). Rules
follow the HLE defaults: 5 colors x 5 ranks, deck counts (3,2,2,2,1) per
color, hand size 5 (2-3 players) / 4 (4-5 players), 8 info tokens,
3 life tokens; running out of lives ends the game with score 0; after
the deck empties every player gets one final turn.

Action space (current player only), HLE layout:
``[discard slot x H | play slot x H | reveal color x (P-1)*5 |
reveal rank x (P-1)*5]`` — hint actions are ordered by target offset
(+1..P-1 seats ahead) then hint value. For 2 players this is the
familiar 20-action space. Illegal actions are replaced by the first
legal action (deterministic; learners should mask with the exported
``legal_moves``).

Observations: ``obs_mode="compact"`` (default) packs fireworks / tokens
/ deck / other hands / own positive hints / discards; ``"card_knowledge"``
appends the HLE V0 knowledge section — per (relative player, slot): the
25-bit color x rank plausibility mask maintained with NEGATIVE hint
information (a color hint also rules that color out for unmarked cards),
plus the directly-hinted color/rank one-hots (35 floats per card).

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
HAND = 5                 # 2-3 player hand size (module default: 2 players)
N_PLAYERS = 2
DECK = 50
MAX_INFO = 8
MAX_LIVES = 3
N_ACTIONS = 4 * HAND     # the 2-player action space

# deck composition per color: ranks 0,0,0,1,1,2,2,3,3,4
_RANK_COUNTS = (3, 2, 2, 2, 1)
_CARD_RANKS = np.concatenate(
    [np.full(c, r) for r, c in enumerate(_RANK_COUNTS)]
)  # [10]
CARD_COLOR = np.repeat(np.arange(N_COLORS), 10).astype(np.int32)   # [50]
CARD_RANK = np.tile(_CARD_RANKS, N_COLORS).astype(np.int32)        # [50]


def hand_size(num_players: int) -> int:
    """HLE default hand sizes."""
    return 5 if num_players <= 3 else 4


def num_actions(num_players: int) -> int:
    h = hand_size(num_players)
    return 2 * h + (num_players - 1) * (N_COLORS + N_RANKS)


def compact_obs_dim(num_players: int) -> int:
    h = hand_size(num_players)
    return (
        N_COLORS * (N_RANKS + 1)
        + (MAX_INFO + 1) + (MAX_LIVES + 1) + (DECK + 1)
        + (num_players - 1) * h * (N_COLORS * N_RANKS + 1)
        + h * (N_COLORS + N_RANKS + 2)
        + DECK // 2
    )


def knowledge_obs_dim(num_players: int) -> int:
    h = hand_size(num_players)
    return num_players * h * (N_COLORS * N_RANKS + N_COLORS + N_RANKS)


OBS_DIM = compact_obs_dim(2)


class Hanabi(EnvBase):
    name = "hanabi"
    action_is_discrete = True

    def __init__(self, num_players: int = 2, obs_mode: str = "compact"):
        if not 2 <= num_players <= 5:
            raise ValueError("HLE supports 2-5 players")
        if obs_mode not in ("compact", "card_knowledge"):
            raise ValueError(f"unknown obs_mode {obs_mode!r}")
        self.num_players = num_players
        self.obs_mode = obs_mode
        self.hand = hand_size(num_players)
        self.n_actions = num_actions(num_players)
        self.num_agents = num_players
        self.action_shape = (num_players,)
        self.action_buckets = (self.n_actions,)
        self.obs_dim = compact_obs_dim(num_players) + (
            knowledge_obs_dim(num_players)
            if obs_mode == "card_knowledge" else 0
        )

    def random_actions(self, rs, steps, num_worlds):
        return jnp.asarray(
            rs.randint(
                0, self.n_actions, (steps, num_worlds, self.num_players)
            ),
            jnp.int32,
        )

    def register_types(self, reg: ECSRegistry):
        p, h = self.num_players, self.hand
        reg.register_singleton("Deck", (DECK,), jnp.int32)      # card ids
        reg.register_singleton("DeckPos", (), jnp.int32)
        reg.register_singleton("Hands", (p, h), jnp.int32)
        reg.register_singleton("HintedColor", (p, h), jnp.int32)
        reg.register_singleton("HintedRank", (p, h), jnp.int32)
        reg.register_singleton("KnowColor", (p, h, N_COLORS), jnp.int32)
        reg.register_singleton("KnowRank", (p, h, N_RANKS), jnp.int32)
        reg.register_singleton("Fireworks", (N_COLORS,), jnp.int32)
        reg.register_singleton("DiscardCount", (DECK // 2,), jnp.int32)
        reg.register_singleton("Info", (), jnp.int32)
        reg.register_singleton("Lives", (), jnp.int32)
        reg.register_singleton("CurPlayer", (), jnp.int32)
        reg.register_singleton("Score", (), jnp.int32)
        reg.register_singleton("FinalTurns", (), jnp.int32)  # -1 until deck out
        reg.register_singleton("Action", (p,), jnp.int32)
        reg.register_singleton("Reward", (), jnp.float32)
        reg.register_singleton("Done", (), jnp.int32)
        reg.register_singleton("Reset", (), jnp.int32)
        reg.register_singleton("JustReset", (), jnp.int32)
        reg.register_singleton("EpisodeStep", (), jnp.int32)
        reg.register_singleton("Obs", (p, self.obs_dim), jnp.float32)
        reg.register_singleton("LegalMoves", (self.n_actions,), jnp.int32)

        reg.import_singleton("Action", "action")
        reg.import_singleton("Reset", "reset")
        reg.export_singleton("Obs", "obs")
        reg.export_singleton("LegalMoves", "legal_moves")
        reg.export_singleton("Reward", "reward")
        reg.export_singleton("Done", "done")
        reg.export_singleton("Score", "score")
        reg.export_singleton("CurPlayer", "cur_player")

    def setup_tasks(self, b: TaskGraphBuilder):
        env = self
        n_reset = b.custom(
            lambda sm, st, nk: _reset_system(env, sm, st, nk),
            name="hanabi_reset",
        )
        n_step = b.custom(
            lambda sm, st, nk: _turn_system(env, sm, st, nk),
            deps=[n_reset], name="hanabi_turn",
        )
        b.custom(
            lambda sm, st, nk: _obs_system(env, sm, st, nk),
            deps=[n_step], name="hanabi_obs",
        )

    def init_worlds(self, sm, state):
        singles = dict(state.singletons)
        singles["Done"] = jnp.ones_like(singles["Done"])
        return dataclasses.replace(state, singletons=singles)


def card_color(card):
    return card // 10


def card_rank(card):
    rank_tbl = jnp.asarray(CARD_RANK)
    return jnp.where(card >= 0, rank_tbl[jnp.clip(card, 0, DECK - 1)], -1)


def _legal_moves(env: Hanabi, s):
    """[W, A] int mask for the current player (HLE action layout)."""
    p, h = env.num_players, env.hand
    w = s["Info"].shape[0]
    cur = s["CurPlayer"]
    widx = jnp.arange(w)
    hand = s["Hands"][widx, cur]                      # [W, h]
    occupied = hand >= 0
    can_discard = occupied & (s["Info"] < MAX_INFO)[:, None]
    can_play = occupied
    has_info = (s["Info"] > 0)[:, None]

    hint_cols = []
    hint_ranks = []
    for off in range(1, p):
        tgt = (cur + off) % p
        thand = s["Hands"][widx, tgt]
        tc = card_color(thand)
        tr = card_rank(thand)
        occ = thand >= 0
        hint_cols.append(
            has_info
            & jnp.stack(
                [jnp.any(occ & (tc == i), axis=1) for i in range(N_COLORS)],
                axis=1,
            )
        )
        hint_ranks.append(
            has_info
            & jnp.stack(
                [jnp.any(occ & (tr == i), axis=1) for i in range(N_RANKS)],
                axis=1,
            )
        )
    return jnp.concatenate(
        [can_discard, can_play] + hint_cols + hint_ranks, axis=1
    ).astype(jnp.int32)


def _reset_system(env: Hanabi, sm, state, node_key):
    p, h = env.num_players, env.hand
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
        [perm[:, q * h:(q + 1) * h] for q in range(p)], axis=1
    )
    s = dict(state.singletons)

    def pick(name, fresh):
        cur = s[name]
        sel = need.reshape((w,) + (1,) * (cur.ndim - 1))
        return jnp.where(sel, jnp.asarray(fresh, cur.dtype), cur)

    s["Deck"] = pick("Deck", perm)
    s["DeckPos"] = pick("DeckPos", p * h)
    s["Hands"] = pick("Hands", hands)
    s["HintedColor"] = pick("HintedColor", jnp.full((w, p, h), -1))
    s["HintedRank"] = pick("HintedRank", jnp.full((w, p, h), -1))
    s["KnowColor"] = pick("KnowColor", jnp.ones((w, p, h, N_COLORS)))
    s["KnowRank"] = pick("KnowRank", jnp.ones((w, p, h, N_RANKS)))
    s["Fireworks"] = pick("Fireworks", jnp.zeros((w, N_COLORS)))
    s["DiscardCount"] = pick("DiscardCount", jnp.zeros((w, DECK // 2)))
    s["Info"] = pick("Info", MAX_INFO)
    s["Lives"] = pick("Lives", MAX_LIVES)
    s["CurPlayer"] = pick("CurPlayer", 0)
    s["Score"] = pick("Score", 0)
    s["FinalTurns"] = pick("FinalTurns", -1)
    s["EpisodeStep"] = pick("EpisodeStep", 0)
    s["JustReset"] = need.astype(jnp.int32)
    return dataclasses.replace(state, singletons=s)


def _turn_system(env: Hanabi, sm, state, node_key):
    p, h = env.num_players, env.hand
    s = dict(state.singletons)
    pre = state.singletons
    w = s["Info"].shape[0]
    widx = jnp.arange(w)
    cur = s["CurPlayer"]

    legal = _legal_moves(env, s)                     # [W, A]
    raw = s["Action"][widx, cur]
    is_legal = legal[widx, raw] > 0
    first_legal = jnp.argmax(legal, axis=1)
    act = jnp.where(is_legal, raw, first_legal)

    # HLE layout decode
    is_discard = act < h
    is_play = (act >= h) & (act < 2 * h)
    hint_id = act - 2 * h                            # >= 0 iff a hint
    n_chints = (p - 1) * N_COLORS
    is_chint = (hint_id >= 0) & (hint_id < n_chints)
    is_rhint = hint_id >= n_chints
    rhint_id = hint_id - n_chints
    hint_off = jnp.where(
        is_chint, hint_id // N_COLORS, rhint_id // N_RANKS
    ) + 1
    hint_val = jnp.where(
        is_chint, hint_id % N_COLORS, rhint_id % N_RANKS
    )
    hint_tgt = (cur + jnp.clip(hint_off, 1, p - 1)) % p
    slot = jnp.where(is_discard, act, act - h)       # card slot if remove
    slot = jnp.clip(slot, 0, h - 1)
    removes = is_discard | is_play

    hand = s["Hands"][widx, cur]                     # [W, h]
    card = hand[widx, slot]
    ccol = card_color(jnp.maximum(card, 0))
    crank = card_rank(card)

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
    drawn = jnp.where(
        can_draw, s["Deck"][widx, jnp.clip(deck_pos, 0, DECK - 1)], -1
    )

    slots = jnp.arange(h)[None, :]
    shift = removes[:, None] & (slots >= slot[:, None])
    next_slot = jnp.clip(slots + 1, 0, h - 1)
    last = slots == h - 1

    def shift_left(arr, fresh):
        """arr [W, h, ...]: remove `slot`, shift left, append fresh."""
        sh = shift.reshape(shift.shape + (1,) * (arr.ndim - 2))
        ls = (removes[:, None] & last).reshape(
            (w, h) + (1,) * (arr.ndim - 2)
        )
        out = jnp.where(sh, arr[widx[:, None], next_slot], arr)
        return jnp.where(ls, fresh, out)

    hand_new = shift_left(hand, drawn[:, None])
    hc = s["HintedColor"][widx, cur]
    hr = s["HintedRank"][widx, cur]
    hc_new = shift_left(hc, -1)
    hr_new = shift_left(hr, -1)
    kc = s["KnowColor"][widx, cur]                   # [W, h, C]
    kr = s["KnowRank"][widx, cur]
    kc_new = shift_left(kc, 1)
    kr_new = shift_left(kr, 1)

    rm = removes[:, None]
    hands = s["Hands"].at[widx, cur].set(jnp.where(rm, hand_new, hand))
    hinted_c = s["HintedColor"].at[widx, cur].set(
        jnp.where(rm, hc_new, hc)
    )
    hinted_r = s["HintedRank"].at[widx, cur].set(
        jnp.where(rm, hr_new, hr)
    )
    know_c = s["KnowColor"].at[widx, cur].set(
        jnp.where(rm[..., None], kc_new, kc)
    )
    know_r = s["KnowRank"].at[widx, cur].set(
        jnp.where(rm[..., None], kr_new, kr)
    )
    deck_pos = deck_pos + jnp.where(removes & can_draw, 1, 0)

    # ---- hints mark the target player's matching cards (+ negative info)
    thand = hands[widx, hint_tgt]
    tc = card_color(jnp.maximum(thand, 0))
    tr = card_rank(thand)
    occ = thand >= 0
    mark_c = is_chint[:, None] & occ & (tc == hint_val[:, None])
    mark_r = is_rhint[:, None] & occ & (tr == hint_val[:, None])
    hinted_c = hinted_c.at[widx, hint_tgt].set(
        jnp.where(mark_c, hint_val[:, None], hinted_c[widx, hint_tgt])
    )
    hinted_r = hinted_r.at[widx, hint_tgt].set(
        jnp.where(mark_r, hint_val[:, None], hinted_r[widx, hint_tgt])
    )
    # knowledge (HLE V0): matching cards collapse to the hinted value;
    # non-matching occupied cards exclude it
    tkc = know_c[widx, hint_tgt]                     # [W, h, C]
    val_oh = jax.nn.one_hot(hint_val, N_COLORS, dtype=tkc.dtype)
    hit_c = mark_c[..., None]
    miss_c = (is_chint[:, None] & occ & ~mark_c)[..., None]
    tkc = jnp.where(hit_c, val_oh[:, None, :], tkc)
    tkc = jnp.where(miss_c & (val_oh[:, None, :] > 0), 0, tkc)
    know_c = know_c.at[widx, hint_tgt].set(tkc)
    tkr = know_r[widx, hint_tgt]
    val_oh_r = jax.nn.one_hot(hint_val, N_RANKS, dtype=tkr.dtype)
    hit_r = mark_r[..., None]
    miss_r = (is_rhint[:, None] & occ & ~mark_r)[..., None]
    tkr = jnp.where(hit_r, val_oh_r[:, None, :], tkr)
    tkr = jnp.where(miss_r & (val_oh_r[:, None, :] > 0), 0, tkr)
    know_r = know_r.at[widx, hint_tgt].set(tkr)

    # ---- scoring / termination (HLE: out of lives -> score 0)
    old_score = s["Score"]
    score = jnp.sum(fw, axis=1)
    dead = lives <= 0
    final_turns = s["FinalTurns"]
    # decrement an active countdown first, THEN arm it when the deck just
    # ran out — the player who drew the last card also gets a final turn
    final_turns = jnp.where(final_turns > 0, final_turns - 1, final_turns)
    deck_out = (deck_pos >= DECK) & (final_turns < 0)
    final_turns = jnp.where(deck_out, p, final_turns)
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
    s["KnowColor"] = know_c
    s["KnowRank"] = know_r
    s["DeckPos"] = deck_pos
    s["CurPlayer"] = (cur + 1) % p
    s["Score"] = score
    s["FinalTurns"] = final_turns
    s["Done"] = done.astype(jnp.int32)
    s["Reward"] = reward
    s["EpisodeStep"] = s["EpisodeStep"] + 1
    # hold on just-reset worlds (the cartpole convention,
    # cartpole.py:104): the action in flight was chosen from the DEAD
    # episode's terminal observation, so the fresh deal must be
    # observed first; reward 0 / done 0 on the held step
    hold = pre["JustReset"] > 0
    for key, val in list(s.items()):
        if val is not pre[key]:
            sel = hold.reshape((w,) + (1,) * (val.ndim - 1))
            s[key] = jnp.where(sel, pre[key], val)
    s["Reward"] = jnp.where(hold, 0.0, s["Reward"])
    s["Done"] = jnp.where(hold, 0, s["Done"])
    return dataclasses.replace(state, singletons=s)


def _obs_system(env: Hanabi, sm, state, node_key):
    p, h = env.num_players, env.hand
    s = dict(state.singletons)
    w = s["Info"].shape[0]

    def onehot(x, n):
        return jax.nn.one_hot(jnp.clip(x, 0, n - 1), n) * (x >= 0)[..., None]

    fw = jax.nn.one_hot(s["Fireworks"], N_RANKS + 1).reshape(w, -1)
    info = jax.nn.one_hot(s["Info"], MAX_INFO + 1)
    lives = jax.nn.one_hot(s["Lives"], MAX_LIVES + 1)
    deck_left = jax.nn.one_hot(DECK - s["DeckPos"], DECK + 1)
    discards = s["DiscardCount"].astype(jnp.float32) / 3.0

    def player_view(q):
        # other hands in relative seat order (+1 .. +p-1)
        ocards = []
        for off in range(1, p):
            other = (q + off) % p
            ohand = s["Hands"][:, other]
            otype = card_color(
                jnp.maximum(ohand, 0)
            ) * N_RANKS + jnp.maximum(card_rank(ohand), 0)
            ocards.append(
                jnp.concatenate(
                    [
                        onehot(
                            jnp.where(ohand >= 0, otype, -1),
                            N_COLORS * N_RANKS,
                        ),
                        (ohand < 0)[..., None].astype(jnp.float32),
                    ],
                    axis=-1,
                ).reshape(w, -1)
            )
        kc = s["HintedColor"][:, q]
        kr = s["HintedRank"][:, q]
        know = jnp.concatenate(
            [
                onehot(kc, N_COLORS),
                onehot(kr, N_RANKS),
                (kc >= 0)[..., None].astype(jnp.float32),
                (kr >= 0)[..., None].astype(jnp.float32),
            ],
            axis=-1,
        ).reshape(w, -1)
        parts = [fw, info, lives, deck_left] + ocards + [know, discards]
        if env.obs_mode == "card_knowledge":
            # HLE V0 knowledge section: relative seats starting at self
            sec = []
            for off in range(p):
                q2 = (q + off) % p
                plaus = (
                    s["KnowColor"][:, q2][..., :, None]
                    * s["KnowRank"][:, q2][..., None, :]
                ).reshape(w, h, -1)                 # [W, h, 25]
                sec.append(
                    jnp.concatenate(
                        [
                            plaus.astype(jnp.float32),
                            onehot(s["HintedColor"][:, q2], N_COLORS),
                            onehot(s["HintedRank"][:, q2], N_RANKS),
                        ],
                        axis=-1,
                    ).reshape(w, -1)
                )
            parts += sec
        return jnp.concatenate(parts, axis=-1)

    obs = jnp.stack([player_view(q) for q in range(p)], axis=1)
    s["Obs"] = obs
    s["LegalMoves"] = _legal_moves(env, s)
    return dataclasses.replace(state, singletons=s)
