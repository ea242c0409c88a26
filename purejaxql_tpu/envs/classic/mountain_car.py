"""MountainCar-v0 (discrete) — pure JAX implementation of the Moore car."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from purejaxql_tpu.envs import spaces
from purejaxql_tpu.envs.base import Environment


@struct.dataclass
class MountainCarState:
    position: jax.Array
    velocity: jax.Array
    time: jax.Array


@struct.dataclass
class MountainCarParams:
    min_position: float = -1.2
    max_position: float = 0.6
    max_speed: float = 0.07
    goal_position: float = 0.5
    goal_velocity: float = 0.0
    force: float = 0.001
    gravity: float = 0.0025
    max_steps_in_episode: int = struct.field(pytree_node=False, default=200)


class MountainCar(Environment):
    """MountainCar-v0 with 3 discrete actions (left / none / right)."""

    @property
    def default_params(self) -> MountainCarParams:
        return MountainCarParams()

    @property
    def name(self) -> str:
        return "MountainCar-v0"

    def reset_env(self, key, params):
        pos = jax.random.uniform(key, (), minval=-0.6, maxval=-0.4)
        state = MountainCarState(
            position=pos,
            velocity=jnp.asarray(0.0),
            time=jnp.asarray(0, dtype=jnp.int32),
        )
        return self.get_obs(state), state

    def step_env(self, key, state, action, params):
        velocity = state.velocity + (action - 1) * params.force + jnp.cos(
            3 * state.position
        ) * (-params.gravity)
        velocity = jnp.clip(velocity, -params.max_speed, params.max_speed)
        position = state.position + velocity
        position = jnp.clip(position, params.min_position, params.max_position)
        velocity = velocity * (1 - (position == params.min_position) * (velocity < 0))
        new_state = MountainCarState(
            position=position, velocity=velocity, time=state.time + 1
        )
        done = self.is_terminal(new_state, params)
        reward = -1.0
        return (
            jax.lax.stop_gradient(self.get_obs(new_state)),
            jax.lax.stop_gradient(new_state),
            jnp.asarray(reward, dtype=jnp.float32),
            done,
            {},
        )

    def get_obs(self, state):
        return jnp.array([state.position, state.velocity])

    def is_terminal(self, state, params):
        solved = jnp.logical_and(
            state.position >= params.goal_position,
            state.velocity >= params.goal_velocity,
        )
        truncated = state.time >= params.max_steps_in_episode
        return jnp.logical_or(solved, truncated)

    def observation_space(self, params):
        low = np.array([params.min_position, -params.max_speed], np.float32)
        high = np.array([params.max_position, params.max_speed], np.float32)
        return spaces.Box(low, high, (2,), np.float32)

    def action_space(self, params=None):
        return spaces.Discrete(3)
