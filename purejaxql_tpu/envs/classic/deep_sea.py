"""DeepSea (bsuite-style) — the canonical hard-exploration task, pure JAX.

An `N x N` grid: the agent starts top-left and descends one row per step,
choosing left or right. Only the all-right trajectory reaches the
treasure in the bottom-right corner (+1); every right move costs a small
penalty (0.01/N), so greedy short-horizon behavior drifts left and the
optimal return is discoverable only by deep directed exploration. The
action-to-direction mapping is randomized per column at reset
(bsuite's `randomize_actions`), defeating the trivial "always press 1"
policy. This is gymnax's `DeepSea-bsuite`, part of the FF-PQN gymnax
family surface (/root/reference/purejaxql/pqn_gymnax.py:92).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from purejaxql_tpu.envs import spaces
from purejaxql_tpu.envs.base import Environment


@struct.dataclass
class DeepSeaState:
    row: jax.Array
    column: jax.Array
    action_map: jax.Array   # (size,) 0/1: which action means "right" per column
    time: jax.Array


@struct.dataclass
class DeepSeaParams:
    size: int = struct.field(pytree_node=False, default=8)
    deterministic: bool = struct.field(pytree_node=False, default=True)
    max_steps_in_episode: int = struct.field(pytree_node=False, default=2000)


class DeepSea(Environment):
    @property
    def default_params(self) -> DeepSeaParams:
        return DeepSeaParams()

    @property
    def name(self) -> str:
        return "DeepSea-bsuite"

    def reset_env(self, key, params):
        action_map = jax.random.bernoulli(key, 0.5, (params.size,)).astype(
            jnp.int32
        )
        state = DeepSeaState(
            row=jnp.asarray(0, jnp.int32),
            column=jnp.asarray(0, jnp.int32),
            action_map=action_map,
            time=jnp.asarray(0, jnp.int32),
        )
        return self.get_obs(state, params), state

    def step_env(self, key, state, action, params):
        go_right = (
            jnp.asarray(action, jnp.int32) == state.action_map[state.column]
        )
        column = jnp.clip(
            jnp.where(go_right, state.column + 1, state.column - 1),
            0,
            params.size - 1,
        )
        row = state.row + 1
        at_bottom = row == params.size
        treasure = at_bottom & (column == params.size - 1)
        reward = (
            jnp.where(treasure, 1.0, 0.0)
            - jnp.where(go_right, 0.01 / params.size, 0.0)
        )
        new_state = DeepSeaState(
            row=jnp.minimum(row, params.size - 1),
            column=column,
            action_map=state.action_map,
            time=state.time + 1,
        )
        done = at_bottom | (new_state.time >= params.max_steps_in_episode)
        return (
            jax.lax.stop_gradient(self.get_obs(new_state, params)),
            jax.lax.stop_gradient(new_state),
            jnp.asarray(reward, jnp.float32),
            done,
            {},
        )

    def get_obs(self, state, params):
        board = jnp.zeros((params.size, params.size), jnp.float32)
        board = board.at[state.row, state.column].set(1.0)
        return board.reshape(-1)

    def observation_space(self, params):
        return spaces.Box(0.0, 1.0, (params.size * params.size,), jnp.float32)

    def action_space(self, params=None):
        return spaces.Discrete(2)
