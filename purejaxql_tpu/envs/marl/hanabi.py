"""MiniHanabi: a Hanabi-class imperfect-information cooperative card game.

Two players build fireworks (one ascending rank stack per color) from a
shuffled deck. Each player sees the PARTNER's hand but never their own —
information flows only through paid hint actions ("all your color-c
cards" / "all your rank-r cards"), which burn a shared info-token pool
(refunded by discards and completed stacks). Playing an unplayable card
burns one of 3 shared lives. The team scores +1 per successful play.

This fills the hanabi branch of the reference's MARL dispatch
(/root/reference/purejaxql/pqn_vdn_rnn_jaxmarl.py:654-680: jaxmarl
``hanabi``) for the in-tree VDN-PQN engine. Like jaxmarl's Hanabi the
game is turn-based inside a simultaneous-step protocol: the acting seat
rotates and the off-turn agent's only legal action is ``noop``, enforced
through the legal-action masks the VDN engine already consumes
(pqn_vdn_rnn_jaxmarl.py:143-168 masked eps-greedy). Default shape is a
mini deck (2 colors x 5 ranks, counts 3/2/2/2/1, hand size 3 -> 13
actions, max score 10); colors/hand size are constructor knobs.

Everything is branchless jnp over static shapes: the deck is a shuffled
(deck_size,) card-type vector + draw pointer, hint knowledge is a pair of
boolean possibility masks per slot, and the whole game steps under vmap
in CTRolloutManager. Departure from tabletop scoring: a bombed-out game
keeps the points earned so far (the standard RL convention) rather than
zeroing the score.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from purejaxql_tpu.envs import spaces
from purejaxql_tpu.envs.marl.base import MultiAgentEnv


@struct.dataclass
class HanabiState:
    deck: jax.Array          # (deck_size,) int32 card types, play order
    deck_ptr: jax.Array      # int32, next card to draw
    hands: jax.Array         # (2, H) int32 card types, -1 = empty slot
    know_color: jax.Array    # (2, H, C) bool, colors still possible
    know_rank: jax.Array     # (2, H, R) bool, ranks still possible
    fireworks: jax.Array     # (C,) int32, next rank needed (0..R)
    discards: jax.Array      # (C, R) int32 counts
    info_tokens: jax.Array   # int32
    lives: jax.Array         # int32
    cur_player: jax.Array    # int32
    turns_since_empty: jax.Array  # int32
    last_action: jax.Array   # int32, previous acting player's action
    time: jax.Array          # int32


class MiniHanabi(MultiAgentEnv):
    """2-player mini Hanabi with hint-mask observations."""

    def __init__(
        self,
        num_colors: int = 2,
        num_ranks: int = 5,
        hand_size: int = 3,
        max_info_tokens: int = 8,
        max_lives: int = 3,
        max_steps: int = 80,
    ):
        assert num_ranks >= 2
        self.num_agents = 2
        self.agents = ["agent_0", "agent_1"]
        self.C = num_colors
        self.R = num_ranks
        self.H = hand_size
        self.max_info = max_info_tokens
        self.max_lives = max_lives
        self.max_steps = max_steps

        # deck composition: 3 copies of rank 1, 1 of the top rank, 2 else
        counts = [3] + [2] * (num_ranks - 2) + [1]
        self.rank_counts = np.asarray(counts, np.int32)
        types = []
        for c in range(num_colors):
            for r in range(num_ranks):
                types += [c * num_ranks + r] * counts[r]
        self._deck_types = jnp.asarray(types, jnp.int32)
        self.deck_size = len(types)
        assert self.deck_size > 2 * hand_size, "deck must cover both hands"

        # action layout: discard h | play h | hint color c | hint rank r | noop
        self.num_actions = 2 * hand_size + num_colors + num_ranks + 1
        self.A_NOOP = self.num_actions - 1
        self.obs_dim = (
            hand_size * (num_colors * num_ranks + 1)   # partner hand one-hot
            + hand_size                                # own slot-present flags
            + hand_size * (num_colors + num_ranks)     # own hint knowledge
            + hand_size * (num_colors + num_ranks)     # partner's knowledge
            + num_colors * (num_ranks + 1)             # fireworks one-hot
            + num_colors * num_ranks                   # discards (normalized)
            + 3                                        # info, lives, deck left
            + 1                                        # my-turn flag
            + self.num_actions                         # last action one-hot
        )

    # -- helpers -----------------------------------------------------------

    def _card_color(self, card):
        return jnp.where(card >= 0, card // self.R, 0)

    def _card_rank(self, card):
        return jnp.where(card >= 0, card % self.R, 0)

    # -- protocol ----------------------------------------------------------

    def reset(self, key: jax.Array):
        deck = jax.random.permutation(key, self._deck_types)
        hands = deck[: 2 * self.H].reshape(2, self.H)
        state = HanabiState(
            deck=deck,
            deck_ptr=jnp.asarray(2 * self.H, jnp.int32),
            hands=hands,
            know_color=jnp.ones((2, self.H, self.C), bool),
            know_rank=jnp.ones((2, self.H, self.R), bool),
            fireworks=jnp.zeros((self.C,), jnp.int32),
            discards=jnp.zeros((self.C, self.R), jnp.int32),
            info_tokens=jnp.asarray(self.max_info, jnp.int32),
            lives=jnp.asarray(self.max_lives, jnp.int32),
            cur_player=jnp.asarray(0, jnp.int32),
            turns_since_empty=jnp.asarray(0, jnp.int32),
            last_action=jnp.asarray(self.A_NOOP, jnp.int32),
            time=jnp.asarray(0, jnp.int32),
        )
        return self.get_obs(state), state

    def step(self, key: jax.Array, state: HanabiState, actions: Dict):
        H, C, R = self.H, self.C, self.R
        cur = state.cur_player
        partner = 1 - cur
        acts = jnp.stack([actions[a] for a in self.agents])
        a = acts[cur].astype(jnp.int32)

        is_discard = a < H
        is_play = (a >= H) & (a < 2 * H)
        is_hint_color = (a >= 2 * H) & (a < 2 * H + C)
        is_hint_rank = (a >= 2 * H + C) & (a < 2 * H + C + R)
        slot = jnp.where(is_play, a - H, jnp.where(is_discard, a, 0))
        hint_c = jnp.clip(a - 2 * H, 0, C - 1)
        hint_r = jnp.clip(a - 2 * H - C, 0, R - 1)

        card = state.hands[cur, slot]
        color = self._card_color(card)
        rank = self._card_rank(card)
        valid_pd = (is_play | is_discard) & (card >= 0)
        playable = valid_pd & (state.fireworks[color] == rank)
        success = is_play & playable
        misplay = is_play & valid_pd & ~playable
        discarded = is_discard & valid_pd

        # fireworks / lives / discard pile
        fireworks = state.fireworks.at[color].add(
            jnp.where(success, 1, 0)
        )
        completed = success & (rank == R - 1)
        lives = state.lives - misplay.astype(jnp.int32)
        to_pile = misplay | discarded
        discards = state.discards.at[color, rank].add(
            jnp.where(to_pile, 1, 0)
        )

        # info tokens: hints pay, discards and completed stacks refund
        used_hint = is_hint_color | is_hint_rank
        info_tokens = jnp.clip(
            state.info_tokens
            - used_hint.astype(jnp.int32)
            + discarded.astype(jnp.int32)
            + completed.astype(jnp.int32),
            0,
            self.max_info,
        )

        # draw replacement into the used slot (-1 once the deck is out)
        empty_at_start = state.deck_ptr >= self.deck_size
        drawn = jnp.where(
            state.deck_ptr < self.deck_size,
            state.deck[jnp.clip(state.deck_ptr, 0, self.deck_size - 1)],
            -1,
        )
        hands = state.hands.at[cur, slot].set(
            jnp.where(valid_pd, drawn, card)
        )
        deck_ptr = jnp.minimum(
            state.deck_ptr + valid_pd.astype(jnp.int32), self.deck_size
        )

        # hint knowledge: positively identify matching partner cards,
        # eliminate the hinted value elsewhere (Hanabi's full information
        # content); a redrawn slot resets to all-possible
        p_cards = state.hands[partner]
        p_present = p_cards >= 0
        p_colors = self._card_color(p_cards)
        p_ranks = self._card_rank(p_cards)

        onehot_c = jax.nn.one_hot(hint_c, C, dtype=bool)
        match_c = (p_colors == hint_c) & p_present
        kc_partner = jnp.where(
            (is_hint_color & match_c)[:, None],
            onehot_c[None, :],
            jnp.where(
                (is_hint_color & ~match_c)[:, None] & onehot_c[None, :],
                False,
                state.know_color[partner],
            ),
        )
        onehot_r = jax.nn.one_hot(hint_r, R, dtype=bool)
        match_r = (p_ranks == hint_r) & p_present
        kr_partner = jnp.where(
            (is_hint_rank & match_r)[:, None],
            onehot_r[None, :],
            jnp.where(
                (is_hint_rank & ~match_r)[:, None] & onehot_r[None, :],
                False,
                state.know_rank[partner],
            ),
        )
        know_color = state.know_color.at[partner].set(kc_partner)
        know_rank = state.know_rank.at[partner].set(kr_partner)
        # reset knowledge for the redrawn slot
        know_color = know_color.at[cur, slot].set(
            jnp.where(valid_pd, jnp.ones((C,), bool), know_color[cur, slot])
        )
        know_rank = know_rank.at[cur, slot].set(
            jnp.where(valid_pd, jnp.ones((R,), bool), know_rank[cur, slot])
        )

        reward = success.astype(jnp.float32)
        time = state.time + 1
        turns_since_empty = state.turns_since_empty + empty_at_start.astype(
            jnp.int32
        )
        done = (
            (lives <= 0)
            | (fireworks.sum() >= C * R)
            | (turns_since_empty >= self.num_agents)
            | (time >= self.max_steps)
        )

        stepped = HanabiState(
            deck=state.deck,
            deck_ptr=deck_ptr,
            hands=hands,
            know_color=know_color,
            know_rank=know_rank,
            fireworks=fireworks,
            discards=discards,
            info_tokens=info_tokens,
            lives=lives,
            cur_player=partner,
            turns_since_empty=turns_since_empty,
            last_action=a,
            time=time,
        )
        obs_re, state_re = self.reset(key)
        new_state = jax.tree_util.tree_map(
            lambda re, st: jax.lax.select(done, re, st), state_re, stepped
        )
        obs_st = self.get_obs(stepped)
        obs = jax.tree_util.tree_map(
            lambda re, st: jax.lax.select(done, re, st), obs_re, obs_st
        )

        rewards = {a_: reward for a_ in self.agents}
        rewards["__all__"] = reward
        dones = {a_: done for a_ in self.agents}
        dones["__all__"] = done
        info = {"score": fireworks.sum()}
        return obs, new_state, rewards, dones, info

    def get_obs(self, state: HanabiState) -> Dict:
        H, C, R = self.H, self.C, self.R

        def single(i):
            partner = 1 - i
            p_cards = state.hands[partner]
            p_onehot = jax.nn.one_hot(
                jnp.where(p_cards >= 0, p_cards, C * R), C * R + 1
            ).reshape(-1)
            own_present = (state.hands[i] >= 0).astype(jnp.float32)
            own_know = jnp.concatenate(
                [
                    state.know_color[i].astype(jnp.float32).reshape(-1),
                    state.know_rank[i].astype(jnp.float32).reshape(-1),
                ]
            )
            partner_know = jnp.concatenate(
                [
                    state.know_color[partner].astype(jnp.float32).reshape(-1),
                    state.know_rank[partner].astype(jnp.float32).reshape(-1),
                ]
            )
            fw = jax.nn.one_hot(state.fireworks, R + 1).reshape(-1)
            disc = (
                state.discards.astype(jnp.float32)
                / jnp.asarray(self.rank_counts, jnp.float32)[None, :]
            ).reshape(-1)
            scalars = jnp.stack(
                [
                    state.info_tokens / self.max_info,
                    state.lives / self.max_lives,
                    (self.deck_size - state.deck_ptr) / self.deck_size,
                ]
            ).astype(jnp.float32)
            my_turn = (state.cur_player == i).astype(jnp.float32)[None]
            last_a = jax.nn.one_hot(state.last_action, self.num_actions)
            return jnp.concatenate(
                [
                    p_onehot,
                    own_present,
                    own_know,
                    partner_know,
                    fw,
                    disc,
                    scalars,
                    my_turn,
                    last_a,
                ]
            )

        return {a: single(i) for i, a in enumerate(self.agents)}

    def get_avail_actions(self, state: HanabiState) -> Dict:
        H, C, R = self.H, self.C, self.R

        def single(i):
            my_turn = state.cur_player == i
            partner = 1 - i
            present = state.hands[i] >= 0
            can_discard = present & (state.info_tokens < self.max_info)
            can_play = present
            p_cards = state.hands[partner]
            p_present = p_cards >= 0
            has_tokens = state.info_tokens > 0
            color_exists = jnp.zeros((C,), bool).at[
                self._card_color(p_cards)
            ].max(p_present)
            rank_exists = jnp.zeros((R,), bool).at[
                self._card_rank(p_cards)
            ].max(p_present)
            acting = jnp.concatenate(
                [
                    can_discard,
                    can_play,
                    has_tokens & color_exists,
                    has_tokens & rank_exists,
                ]
            )
            # noop: the off-turn action, and the on-turn fallback when
            # nothing else is legal (empty hand in the endgame)
            noop = ~my_turn | ~acting.any()
            mask = jnp.concatenate([acting & my_turn, noop[None]])
            return mask.astype(jnp.float32)

        return {a: single(i) for i, a in enumerate(self.agents)}

    def observation_space(self, agent: str) -> spaces.Box:
        return spaces.Box(0.0, 1.0, (self.obs_dim,), jnp.float32)

    def action_space(self, agent: str) -> spaces.Discrete:
        return spaces.Discrete(self.num_actions)
