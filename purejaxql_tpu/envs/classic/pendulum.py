"""Pendulum-v1 (continuous torque control) — pure JAX.

The continuous-control smoke env for the AC-PQN family (the reference trains
its actor-critic variant on MuJoCo Playground,
/root/reference/purejaxql/pqn_mujoco_playground.py; this framework ships
Pendulum as the in-tree continuous benchmark so the AC engine is exercised
without external physics deps).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from purejaxql_tpu.envs import spaces
from purejaxql_tpu.envs.base import Environment


@struct.dataclass
class PendulumState:
    theta: jax.Array
    theta_dot: jax.Array
    last_u: jax.Array
    time: jax.Array


@struct.dataclass
class PendulumParams:
    max_speed: float = 8.0
    max_torque: float = 2.0
    dt: float = 0.05
    g: float = 10.0
    m: float = 1.0
    l: float = 1.0
    max_steps_in_episode: int = struct.field(pytree_node=False, default=200)


class Pendulum(Environment):
    """Pendulum-v1: 1-D continuous torque in [-2, 2]."""

    @property
    def default_params(self) -> PendulumParams:
        return PendulumParams()

    @property
    def name(self) -> str:
        return "Pendulum-v1"

    def reset_env(self, key, params):
        high = jnp.array([jnp.pi, 1.0])
        init = jax.random.uniform(key, (2,), minval=-high, maxval=high)
        state = PendulumState(
            theta=init[0],
            theta_dot=init[1],
            last_u=jnp.asarray(0.0),
            time=jnp.asarray(0, dtype=jnp.int32),
        )
        return self.get_obs(state), state

    def step_env(self, key, state, action, params):
        u = jnp.clip(
            jnp.asarray(action).reshape(()), -params.max_torque, params.max_torque
        )
        angle = _angle_normalize(state.theta)
        cost = angle**2 + 0.1 * state.theta_dot**2 + 0.001 * u**2

        newthdot = state.theta_dot + (
            3 * params.g / (2 * params.l) * jnp.sin(state.theta)
            + 3.0 / (params.m * params.l**2) * u
        ) * params.dt
        newthdot = jnp.clip(newthdot, -params.max_speed, params.max_speed)
        newth = state.theta + newthdot * params.dt

        new_state = PendulumState(
            theta=newth, theta_dot=newthdot, last_u=u, time=state.time + 1
        )
        done = new_state.time >= params.max_steps_in_episode
        return (
            jax.lax.stop_gradient(self.get_obs(new_state)),
            jax.lax.stop_gradient(new_state),
            jnp.asarray(-cost, dtype=jnp.float32),
            done,
            {},
        )

    def get_obs(self, state):
        return jnp.array([jnp.cos(state.theta), jnp.sin(state.theta), state.theta_dot])

    def observation_space(self, params):
        high = np.array([1.0, 1.0, params.max_speed], np.float32)
        return spaces.Box(-high, high, (3,), np.float32)

    def action_space(self, params=None):
        p = params if params is not None else self.default_params
        return spaces.Box(-p.max_torque, p.max_torque, (1,), jnp.float32)


def _angle_normalize(x):
    return ((x + jnp.pi) % (2 * jnp.pi)) - jnp.pi
