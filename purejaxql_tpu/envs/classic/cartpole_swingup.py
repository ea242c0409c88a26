"""CartPoleSwingUp: dm-suite cartpole.swingup-class continuous control.

Same rigid-body dynamics as CartPole-v1 but the pole starts hanging DOWN,
the force is continuous in [-10, 10] N, there is no early termination,
and the per-step reward is an uprightness bonus attenuated near the track
edges — the canonical dense swing-up task from the dm_control suite the
reference's playground family covers (scripts/train_playground_all.sh
dm-suite block).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from purejaxql_tpu.envs import spaces
from purejaxql_tpu.envs.base import Environment


@struct.dataclass
class SwingUpState:
    x: jax.Array
    x_dot: jax.Array
    theta: jax.Array       # 0 = upright, pi = hanging down
    theta_dot: jax.Array
    time: jax.Array


@struct.dataclass
class SwingUpParams:
    gravity: float = 9.8
    masscart: float = 1.0
    masspole: float = 0.1
    total_mass: float = 1.1
    length: float = 0.5
    polemass_length: float = 0.05
    force_mag: float = 10.0
    tau: float = 0.02
    x_threshold: float = 2.4
    max_steps_in_episode: int = struct.field(pytree_node=False, default=500)


class CartPoleSwingUp(Environment):
    @property
    def default_params(self) -> SwingUpParams:
        return SwingUpParams()

    @property
    def name(self) -> str:
        return "CartPoleSwingUp-v0"

    def reset_env(self, key, params):
        k1, k2 = jax.random.split(key)
        state = SwingUpState(
            x=jax.random.uniform(k1, (), minval=-0.1, maxval=0.1),
            x_dot=jnp.asarray(0.0),
            # hanging down, slightly perturbed
            theta=jnp.pi + jax.random.uniform(k2, (), minval=-0.1, maxval=0.1),
            theta_dot=jnp.asarray(0.0),
            time=jnp.asarray(0, jnp.int32),
        )
        return self.get_obs(state), state

    def step_env(self, key, state, action, params):
        force = params.force_mag * jnp.clip(action[0], -1.0, 1.0)
        costheta = jnp.cos(state.theta)
        sintheta = jnp.sin(state.theta)
        temp = (
            force + params.polemass_length * state.theta_dot**2 * sintheta
        ) / params.total_mass
        thetaacc = (params.gravity * sintheta - costheta * temp) / (
            params.length
            * (4.0 / 3.0 - params.masspole * costheta**2 / params.total_mass)
        )
        xacc = temp - params.polemass_length * thetaacc * costheta / params.total_mass

        x = jnp.clip(
            state.x + params.tau * state.x_dot,
            -params.x_threshold,
            params.x_threshold,
        )
        x_dot = state.x_dot + params.tau * xacc
        x_dot = jnp.where(jnp.abs(x) >= params.x_threshold, 0.0, x_dot)
        theta = state.theta + params.tau * state.theta_dot
        theta_dot = state.theta_dot + params.tau * thetaacc

        new_state = SwingUpState(
            x=x, x_dot=x_dot, theta=theta, theta_dot=theta_dot,
            time=state.time + 1,
        )
        # uprightness bonus, attenuated toward the track edges
        upright = (1.0 + jnp.cos(theta)) / 2.0
        centered = 1.0 - jnp.abs(x) / params.x_threshold
        reward = upright * (0.5 + 0.5 * centered)
        done = self.is_terminal(new_state, params)
        return (
            jax.lax.stop_gradient(self.get_obs(new_state)),
            jax.lax.stop_gradient(new_state),
            reward.astype(jnp.float32),
            done,
            {},
        )

    def get_obs(self, state) -> jax.Array:
        return jnp.array(
            [
                state.x,
                state.x_dot,
                jnp.cos(state.theta),
                jnp.sin(state.theta),
                state.theta_dot,
            ]
        )

    def is_terminal(self, state, params):
        return state.time >= params.max_steps_in_episode

    def observation_space(self, params):
        high = np.array(
            [params.x_threshold, np.finfo(np.float32).max, 1.0, 1.0,
             np.finfo(np.float32).max],
            np.float32,
        )
        return spaces.Box(-high, high, (5,), np.float32)

    def action_space(self, params=None):
        return spaces.Box(-1.0, 1.0, (1,), np.float32)
