"""PointMass-v0: force-actuated 2-D point mass driven to a target.

The dm-suite point_mass-class task from the reference's playground family
(/root/reference/scripts/train_playground_all.sh dm-suite block:
PointMass). A unit mass on a bounded plane accelerates under a 2-D force
action with viscous damping; the start position is random, the target is
the origin. Dense reward: a linear proximity bonus inside a 0.5 radius
minus a small control cost. No early termination; 250-step episodes.

Observation (4): position (2), velocity (2). Action (2) in [-1, 1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from purejaxql_tpu.envs import spaces
from purejaxql_tpu.envs.base import Environment


@struct.dataclass
class PointMassState:
    pos: jax.Array   # (2,)
    vel: jax.Array   # (2,)
    time: jax.Array


@struct.dataclass
class PointMassParams:
    dt: float = 0.05
    gear: float = 2.0
    damping: float = 0.95
    arena: float = 1.0        # |pos| per axis is clipped to this
    reward_radius: float = 0.5
    max_steps_in_episode: int = struct.field(pytree_node=False, default=250)


class PointMass(Environment):
    @property
    def default_params(self) -> PointMassParams:
        return PointMassParams()

    @property
    def name(self) -> str:
        return "PointMass-v0"

    def reset_env(self, key, params):
        pos = jax.random.uniform(key, (2,), minval=-0.8, maxval=0.8)
        state = PointMassState(
            pos=pos, vel=jnp.zeros(2), time=jnp.asarray(0, jnp.int32)
        )
        return self.get_obs(state, params), state

    def step_env(self, key, state, action, params):
        force = jnp.clip(jnp.asarray(action).reshape(2), -1.0, 1.0)
        vel = state.vel * params.damping + force * params.gear * params.dt
        pos = jnp.clip(
            state.pos + vel * params.dt, -params.arena, params.arena
        )
        # walls are sticky: hitting an edge zeroes that velocity component
        vel = jnp.where(jnp.abs(pos) >= params.arena, 0.0, vel)

        new_state = PointMassState(pos=pos, vel=vel, time=state.time + 1)
        dist = jnp.linalg.norm(pos)
        reward = (
            jnp.maximum(0.0, 1.0 - dist / params.reward_radius)
            - 0.01 * jnp.square(force).sum()
        )
        done = new_state.time >= params.max_steps_in_episode
        return (
            jax.lax.stop_gradient(self.get_obs(new_state, params)),
            jax.lax.stop_gradient(new_state),
            jnp.asarray(reward, jnp.float32),
            done,
            {},
        )

    def get_obs(self, state, params=None) -> jax.Array:
        return jnp.concatenate([state.pos, state.vel]).astype(jnp.float32)

    def observation_space(self, params):
        return spaces.Box(-np.inf, np.inf, (4,), np.float32)

    def action_space(self, params=None):
        return spaces.Box(-1.0, 1.0, (2,), np.float32)
