"""Kitchen: an Overcooked-class cooperative cooking env in pure JAX.

Two agents in a walled kitchen must cook and deliver onion soup: carry 3
onions into a pot, wait out the cook timer, fetch the soup with a plate,
and deliver it at the serving window for a +20 team reward. Coordination
pressure comes from the layout (narrow corridors, counters that items can
be passed over, pot/pile placement) and Overcooked's movement rules (both
agents move simultaneously; same-target and swap moves are blocked).

This fills the overcooked branch of the reference's MARL dispatch
(/root/reference/purejaxql/pqn_vdn_rnn_jaxmarl.py:654-680: jaxmarl
``overcooked`` with layouts) for the in-tree VDN-PQN engine: dict
obs/actions, team reward/done, and state-dependent legal-action masks
(wall-blocked moves are masked out), trained by the unchanged
`algo/pqn_vdn.py`.

Layouts are string maps (X wall/counter, P pot, O onion pile, D plate
pile, S serving window, 1/2 agent starts, space floor). Everything is
branchless jnp over static-shape arrays; worlds vmap to thousands of
parallel kitchens under CTRolloutManager.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from purejaxql_tpu.envs import spaces
from purejaxql_tpu.envs.marl.base import MultiAgentEnv

# tile types
FLOOR, WALL, POT, ONION_PILE, PLATE_PILE, SERVE = range(6)
# held items
H_NONE, H_ONION, H_PLATE, H_SOUP = range(4)
# actions
A_UP, A_DOWN, A_LEFT, A_RIGHT, A_NOOP, A_INTERACT = range(6)
NUM_ACTIONS = 6

_DIRS = jnp.array([[-1, 0], [1, 0], [0, -1], [0, 1]])  # up/down/left/right

LAYOUTS = {
    # the classic 5x4 cramped room: one pot, shared tight floor space
    "cramped_room": [
        "XXPXX",
        "O1 2O",
        "X   X",
        "XDXSX",
    ],
    # ring corridor: pots top-right, piles bottom-left, forced traffic
    "coord_ring": [
        "XXXPX",
        "X 1 P",
        "D X X",
        "O2  X",
        "XOSXX",
    ],
    # asymmetric: only agent 1 can reach the piles, only agent 2 the pots;
    # items must be passed over the middle counter row
    "asymmetric_pass": [
        "XXXXXXX",
        "O 1X2 P",
        "O  X  P",
        "X  X  S",
        "XDXXXXX",
    ],
}

MAX_POTS = 2
COOK_TIME = 20


@struct.dataclass
class KitchenState:
    pos: jax.Array          # (2, 2) int32 (y, x)
    facing: jax.Array       # (2,) int32 0..3
    held: jax.Array         # (2,) int32 H_*
    pot_onions: jax.Array   # (MAX_POTS,) int32 0..3
    pot_timer: jax.Array    # (MAX_POTS,) int32; >0 cooking, 0 & onions==3 ready
    counter_items: jax.Array  # (H, W) int32 H_* items resting on counters
    time: jax.Array


def _parse_layout(rows: List[str]):
    H, W = len(rows), len(rows[0])
    grid = np.zeros((H, W), np.int32)
    starts = [None, None]
    pots = []
    for y, row in enumerate(rows):
        for x, ch in enumerate(row):
            if ch == "X":
                grid[y, x] = WALL
            elif ch == "P":
                grid[y, x] = POT
                pots.append((y, x))
            elif ch == "O":
                grid[y, x] = ONION_PILE
            elif ch == "D":
                grid[y, x] = PLATE_PILE
            elif ch == "S":
                grid[y, x] = SERVE
            elif ch == "1":
                starts[0] = (y, x)
            elif ch == "2":
                starts[1] = (y, x)
    assert starts[0] and starts[1], "layout needs agent starts 1 and 2"
    assert 1 <= len(pots) <= MAX_POTS, "layout needs 1..MAX_POTS pots"
    while len(pots) < MAX_POTS:
        pots.append((-9, -9))  # unreachable padding slot
    return grid, np.array(starts, np.int32), np.array(pots, np.int32)


class Kitchen(MultiAgentEnv):
    def __init__(
        self,
        layout: str = "cramped_room",
        max_steps: int = 400,
        cook_time: int = COOK_TIME,
        shaped_rewards: bool = True,
    ):
        rows = LAYOUTS[layout]
        self.layout_name = layout
        self.grid, self._starts, self._pots = _parse_layout(rows)
        self.height, self.width = self.grid.shape
        self.max_steps = max_steps
        self.cook_time = cook_time
        self.shaped_rewards = shaped_rewards
        self.num_agents = 2
        self.agents = ["agent_0", "agent_1"]
        # obs channels: 6 static tile types + self pos + other pos +
        # self facing (4) + other facing (4) + held one-hot at agent pos
        # (3: onion/plate/soup for each of self/other) + pot onions (norm)
        # + pot ready + pot cooking + counter item (3)
        self.obs_channels = 6 + 2 + 8 + 6 + 3 + 3
        self.obs_dim = self.height * self.width * self.obs_channels

    # ------------------------------------------------------------------
    def reset(self, key: jax.Array):
        state = KitchenState(
            pos=jnp.asarray(self._starts),
            facing=jnp.asarray([1, 1], jnp.int32),  # face down
            held=jnp.zeros(2, jnp.int32),
            pot_onions=jnp.zeros(MAX_POTS, jnp.int32),
            pot_timer=jnp.zeros(MAX_POTS, jnp.int32),
            counter_items=jnp.zeros((self.height, self.width), jnp.int32),
            time=jnp.asarray(0, jnp.int32),
        )
        return self.get_obs(state), state

    # ------------------------------------------------------------------
    def step(self, key: jax.Array, state: KitchenState, actions: Dict):
        grid = jnp.asarray(self.grid)
        pots = jnp.asarray(self._pots)
        acts = jnp.stack([actions[a] for a in self.agents]).astype(jnp.int32)

        # -- movement (simultaneous, overcooked collision rules) --------
        is_move = acts < 4
        move_dir = jnp.where(is_move, acts, 0)
        facing = jnp.where(is_move, move_dir, state.facing)
        prop = state.pos + jnp.where(is_move[:, None], _DIRS[move_dir], 0)
        blocked = grid[prop[:, 0], prop[:, 1]] != FLOOR
        prop = jnp.where(blocked[:, None], state.pos, prop)
        same_target = (prop[0] == prop[1]).all()
        swap = jnp.logical_and(
            (prop[0] == state.pos[1]).all(), (prop[1] == state.pos[0]).all()
        )
        revert = jnp.logical_or(same_target, swap)
        pos = jnp.where(revert, state.pos, prop)

        # -- interact ---------------------------------------------------
        held = state.held
        pot_onions = state.pot_onions
        pot_timer = state.pot_timer
        counter_items = state.counter_items
        reward = jnp.asarray(0.0)
        shaped = jnp.asarray(0.0)

        # agents interact in index order (agent_0 first) — sequential
        # resolution makes simultaneous interactions with the same tile
        # deterministic, like overcooked's per-player loop
        for i in range(2):
            do = acts[i] == A_INTERACT
            tgt = pos[i] + _DIRS[facing[i]]
            ty, tx = tgt[0], tgt[1]
            tile = grid[ty, tx]
            h = held[i]

            pot_here = jnp.logical_and(
                pots[:, 0] == ty, pots[:, 1] == tx
            )  # (MAX_POTS,)
            pot_idx = jnp.argmax(pot_here)
            at_pot = jnp.logical_and(do, pot_here.any())

            # onion pile -> take onion
            take_onion = do & (tile == ONION_PILE) & (h == H_NONE)
            # plate pile -> take plate
            take_plate = do & (tile == PLATE_PILE) & (h == H_NONE)
            # pot: drop onion (if <3 and not cooking/ready)
            drop_onion = (
                at_pot
                & (h == H_ONION)
                & (pot_onions[pot_idx] < 3)
            )
            # pot: scoop ready soup with a plate
            ready = jnp.logical_and(
                pot_onions[pot_idx] == 3, pot_timer[pot_idx] == 0
            )
            take_soup = at_pot & (h == H_PLATE) & ready
            # serving window: deliver soup
            deliver = do & (tile == SERVE) & (h == H_SOUP)
            # counter: place / pick item
            c_item = counter_items[ty, tx]
            place = do & (tile == WALL) & (h != H_NONE) & (c_item == H_NONE)
            pick = do & (tile == WALL) & (h == H_NONE) & (c_item != H_NONE)

            new_h = h
            new_h = jnp.where(take_onion, H_ONION, new_h)
            new_h = jnp.where(take_plate, H_PLATE, new_h)
            new_h = jnp.where(drop_onion, H_NONE, new_h)
            new_h = jnp.where(take_soup, H_SOUP, new_h)
            new_h = jnp.where(deliver, H_NONE, new_h)
            new_h = jnp.where(place, H_NONE, new_h)
            new_h = jnp.where(pick, c_item, new_h)
            held = held.at[i].set(new_h)

            added = drop_onion.astype(jnp.int32)
            pot_onions = pot_onions.at[pot_idx].add(
                jnp.where(at_pot, added, 0)
            )
            # start cooking when the third onion lands
            start_cook = drop_onion & (pot_onions[pot_idx] == 3)
            pot_timer = pot_timer.at[pot_idx].set(
                jnp.where(start_cook, self.cook_time, pot_timer[pot_idx])
            )
            # scooping empties the pot
            pot_onions = pot_onions.at[pot_idx].set(
                jnp.where(take_soup, 0, pot_onions[pot_idx])
            )

            counter_items = counter_items.at[ty, tx].set(
                jnp.where(
                    place, h, jnp.where(pick, H_NONE, c_item)
                )
            )

            reward = reward + jnp.where(deliver, 20.0, 0.0)
            shaped = shaped + jnp.where(drop_onion, 1.0, 0.0)
            shaped = shaped + jnp.where(take_soup, 3.0, 0.0)

        # pots cook down
        pot_timer = jnp.maximum(pot_timer - (pot_onions == 3), 0)

        if self.shaped_rewards:
            reward = reward + shaped

        t = state.time + 1
        done = t >= self.max_steps
        new_state = KitchenState(
            pos=pos, facing=facing, held=held,
            pot_onions=pot_onions, pot_timer=pot_timer,
            counter_items=counter_items, time=t,
        )
        # auto-reset at the horizon (fixed-length episodes, overcooked-style)
        reset_obs, reset_state = self.reset(key)
        new_state = jax.tree_util.tree_map(
            lambda r, s: jnp.where(done, r, s), reset_state, new_state
        )
        obs = self.get_obs(new_state)

        rewards = {a: reward for a in self.agents}
        rewards["__all__"] = reward
        dones = {a: done for a in self.agents}
        dones["__all__"] = done
        return obs, new_state, rewards, dones, {}

    # ------------------------------------------------------------------
    def get_avail_actions(self, state: KitchenState) -> Dict:
        """Wall-blocked moves are illegal; noop/interact always legal."""
        grid = jnp.asarray(self.grid)

        def mask_for(i):
            tgts = state.pos[i][None, :] + _DIRS  # (4, 2)
            ok = grid[tgts[:, 0], tgts[:, 1]] == FLOOR
            return jnp.concatenate(
                [ok.astype(jnp.float32), jnp.ones(2)]
            )

        return {a: mask_for(i) for i, a in enumerate(self.agents)}

    # ------------------------------------------------------------------
    def get_obs(self, state: KitchenState) -> Dict:
        grid = jnp.asarray(self.grid)
        pots = jnp.asarray(self._pots)
        H, W = self.height, self.width
        static = jax.nn.one_hot(grid, 6)  # (H, W, 6)

        pot_mask = jnp.zeros((H, W))
        pot_norm = jnp.zeros((H, W))
        pot_ready = jnp.zeros((H, W))
        pot_cooking = jnp.zeros((H, W))
        for p in range(MAX_POTS):
            py, px = pots[p, 0], pots[p, 1]
            valid = (py >= 0).astype(jnp.float32)
            pot_norm = pot_norm.at[py, px].add(
                valid * state.pot_onions[p] / 3.0
            )
            pot_ready = pot_ready.at[py, px].add(
                valid
                * jnp.logical_and(
                    state.pot_onions[p] == 3, state.pot_timer[p] == 0
                ).astype(jnp.float32)
            )
            pot_cooking = pot_cooking.at[py, px].add(
                valid * (state.pot_timer[p] > 0).astype(jnp.float32)
            )
        counter = jax.nn.one_hot(state.counter_items, 4)[..., 1:]  # (H,W,3)

        def agent_view(me, other):
            me_pos = jnp.zeros((H, W)).at[
                state.pos[me, 0], state.pos[me, 1]
            ].set(1.0)
            ot_pos = jnp.zeros((H, W)).at[
                state.pos[other, 0], state.pos[other, 1]
            ].set(1.0)
            me_face = (
                me_pos[..., None] * jax.nn.one_hot(state.facing[me], 4)
            )
            ot_face = (
                ot_pos[..., None] * jax.nn.one_hot(state.facing[other], 4)
            )
            me_held = (
                me_pos[..., None]
                * jax.nn.one_hot(state.held[me], 4)[1:]
            )
            ot_held = (
                ot_pos[..., None]
                * jax.nn.one_hot(state.held[other], 4)[1:]
            )
            return jnp.concatenate(
                [
                    static,
                    me_pos[..., None], ot_pos[..., None],
                    me_face, ot_face,
                    me_held, ot_held,
                    pot_norm[..., None], pot_ready[..., None],
                    pot_cooking[..., None],
                    counter,
                ],
                axis=-1,
            ).reshape(-1)

        return {
            "agent_0": agent_view(0, 1),
            "agent_1": agent_view(1, 0),
        }

    def observation_space(self, agent: str) -> spaces.Box:
        return spaces.Box(0.0, 1.0, (self.obs_dim,), jnp.float32)

    def action_space(self, agent: str) -> spaces.Discrete:
        return spaces.Discrete(NUM_ACTIONS)
