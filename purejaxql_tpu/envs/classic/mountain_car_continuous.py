"""MountainCarContinuous-v0: classic continuous-control hill climb.

Standard gym dynamics: a car on a 1-D valley applies a bounded force and
must build momentum to reach the right hilltop. Sparse +100 on success
minus a quadratic control cost — the classic exploration-hard continuous
task (reference trains 50 continuous tasks via mujoco_playground,
pqn_mujoco_playground.py; this is the in-tree dm-suite-class analogue).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from purejaxql_tpu.envs import spaces
from purejaxql_tpu.envs.base import Environment


@struct.dataclass
class MCCState:
    position: jax.Array
    velocity: jax.Array
    time: jax.Array


@struct.dataclass
class MCCParams:
    min_position: float = -1.2
    max_position: float = 0.6
    max_speed: float = 0.07
    goal_position: float = 0.45
    power: float = 0.0015
    max_steps_in_episode: int = struct.field(pytree_node=False, default=999)


class MountainCarContinuous(Environment):
    @property
    def default_params(self) -> MCCParams:
        return MCCParams()

    @property
    def name(self) -> str:
        return "MountainCarContinuous-v0"

    def reset_env(self, key, params):
        pos = jax.random.uniform(key, (), minval=-0.6, maxval=-0.4)
        state = MCCState(
            position=pos,
            velocity=jnp.asarray(0.0),
            time=jnp.asarray(0, jnp.int32),
        )
        return self.get_obs(state), state

    def step_env(self, key, state, action, params):
        force = jnp.clip(action[0], -1.0, 1.0)
        velocity = state.velocity + force * params.power - 0.0025 * jnp.cos(
            3.0 * state.position
        )
        velocity = jnp.clip(velocity, -params.max_speed, params.max_speed)
        position = jnp.clip(
            state.position + velocity, params.min_position, params.max_position
        )
        velocity = jnp.where(
            (position <= params.min_position) & (velocity < 0), 0.0, velocity
        )
        reached = position >= params.goal_position
        reward = jnp.where(reached, 100.0, 0.0) - 0.1 * force**2
        new_state = MCCState(
            position=position, velocity=velocity, time=state.time + 1
        )
        done = self.is_terminal(new_state, params)
        return (
            jax.lax.stop_gradient(self.get_obs(new_state)),
            jax.lax.stop_gradient(new_state),
            reward.astype(jnp.float32),
            done,
            {},
        )

    def get_obs(self, state) -> jax.Array:
        return jnp.array([state.position, state.velocity])

    def is_terminal(self, state, params):
        return jnp.logical_or(
            state.position >= params.goal_position,
            state.time >= params.max_steps_in_episode,
        )

    def observation_space(self, params):
        low = np.array([params.min_position, -params.max_speed], np.float32)
        high = np.array([params.max_position, params.max_speed], np.float32)
        return spaces.Box(low, high, (2,), np.float32)

    def action_space(self, params=None):
        return spaces.Box(-1.0, 1.0, (1,), np.float32)
