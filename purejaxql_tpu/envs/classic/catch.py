"""Catch (bsuite-style) — the minimal visual control task, pure JAX.

A ball falls one row per step down a `rows x columns` board; the agent
moves a paddle on the bottom row (left / stay / right) and must be under
the ball when it lands: +1 for a catch, -1 for a miss, 0 elsewhere. This
is gymnax's `Catch-bsuite`, part of the FF-PQN gymnax family surface the
reference trains via `pqn_gymnax.py` (env construction at
/root/reference/purejaxql/pqn_gymnax.py:92). Observations are the flat
one-hot board (ball cell + paddle cell), so a feedforward MLP solves it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from purejaxql_tpu.envs import spaces
from purejaxql_tpu.envs.base import Environment


@struct.dataclass
class CatchState:
    ball_y: jax.Array
    ball_x: jax.Array
    paddle_x: jax.Array
    time: jax.Array


@struct.dataclass
class CatchParams:
    rows: int = struct.field(pytree_node=False, default=10)
    columns: int = struct.field(pytree_node=False, default=5)
    max_steps_in_episode: int = struct.field(pytree_node=False, default=2000)


class Catch(Environment):
    @property
    def default_params(self) -> CatchParams:
        return CatchParams()

    @property
    def name(self) -> str:
        return "Catch-bsuite"

    def reset_env(self, key, params):
        ball_x = jax.random.randint(key, (), 0, params.columns)
        state = CatchState(
            ball_y=jnp.asarray(0, jnp.int32),
            ball_x=ball_x.astype(jnp.int32),
            paddle_x=jnp.asarray(params.columns // 2, jnp.int32),
            time=jnp.asarray(0, jnp.int32),
        )
        return self.get_obs(state, params), state

    def step_env(self, key, state, action, params):
        # action: 0 left, 1 stay, 2 right
        dx = jnp.asarray(action, jnp.int32) - 1
        paddle_x = jnp.clip(state.paddle_x + dx, 0, params.columns - 1)
        ball_y = state.ball_y + 1
        landed = ball_y == params.rows - 1
        reward = jnp.where(
            landed, jnp.where(state.ball_x == paddle_x, 1.0, -1.0), 0.0
        )
        # auto-redrop: a new ball spawns at the top the step after landing
        # (bsuite resets the episode; the redrop keeps episodes one drop
        # long via `done` below and matches gymnax's semantics)
        new_state = CatchState(
            ball_y=ball_y,
            ball_x=state.ball_x,
            paddle_x=paddle_x,
            time=state.time + 1,
        )
        done = landed | (new_state.time >= params.max_steps_in_episode)
        return (
            jax.lax.stop_gradient(self.get_obs(new_state, params)),
            jax.lax.stop_gradient(new_state),
            jnp.asarray(reward, jnp.float32),
            done,
            {},
        )

    def get_obs(self, state, params):
        board = jnp.zeros((params.rows, params.columns), jnp.float32)
        board = board.at[state.ball_y, state.ball_x].set(1.0)
        board = board.at[params.rows - 1, state.paddle_x].set(1.0)
        return board.reshape(-1)

    def observation_space(self, params):
        return spaces.Box(0.0, 1.0, (params.rows * params.columns,), jnp.float32)

    def action_space(self, params=None):
        return spaces.Discrete(3)
