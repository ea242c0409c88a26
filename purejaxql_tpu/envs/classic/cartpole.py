"""CartPole-v1: classic cart-pole balancing, implemented as pure JAX.

Dynamics follow the canonical OpenAI Gym / gymnax CartPole-v1 formulation
(Euler integration of the Barto-Sutton-Anderson pole; the env family the
reference trains on via `gymnax.make("CartPole-v1")`,
/root/reference/purejaxql/pqn_gymnax.py:92). Reward is 1 per step with the
"reward on the step entering the terminal state" convention, 500-step limit.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from purejaxql_tpu.envs import spaces
from purejaxql_tpu.envs.base import Environment


@struct.dataclass
class CartPoleState:
    x: jax.Array
    x_dot: jax.Array
    theta: jax.Array
    theta_dot: jax.Array
    time: jax.Array


@struct.dataclass
class CartPoleParams:
    gravity: float = 9.8
    masscart: float = 1.0
    masspole: float = 0.1
    total_mass: float = 1.1
    length: float = 0.5
    polemass_length: float = 0.05
    force_mag: float = 10.0
    tau: float = 0.02
    theta_threshold_radians: float = 12 * 2 * jnp.pi / 360
    x_threshold: float = 2.4
    max_steps_in_episode: int = struct.field(pytree_node=False, default=500)


class CartPole(Environment):
    """CartPole-v1 with 2 discrete actions (push left / push right)."""

    @property
    def default_params(self) -> CartPoleParams:
        return CartPoleParams()

    @property
    def name(self) -> str:
        return "CartPole-v1"

    def reset_env(self, key, params) -> Tuple[jax.Array, CartPoleState]:
        init = jax.random.uniform(key, (4,), minval=-0.05, maxval=0.05)
        state = CartPoleState(
            x=init[0],
            x_dot=init[1],
            theta=init[2],
            theta_dot=init[3],
            time=jnp.asarray(0, dtype=jnp.int32),
        )
        return self.get_obs(state), state

    def step_env(self, key, state, action, params):
        # Terminality of the *incoming* state decides the reward, so the
        # step that crosses the threshold still earns 1.0.
        prev_done = self.is_terminal(state, params)

        force = params.force_mag * action - params.force_mag * (1 - action)
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

        x = state.x + params.tau * state.x_dot
        x_dot = state.x_dot + params.tau * xacc
        theta = state.theta + params.tau * state.theta_dot
        theta_dot = state.theta_dot + params.tau * thetaacc

        new_state = CartPoleState(
            x=x,
            x_dot=x_dot,
            theta=theta,
            theta_dot=theta_dot,
            time=state.time + 1,
        )
        done = self.is_terminal(new_state, params)
        reward = 1.0 - prev_done
        return (
            jax.lax.stop_gradient(self.get_obs(new_state)),
            jax.lax.stop_gradient(new_state),
            jnp.asarray(reward, dtype=jnp.float32),
            done,
            {},
        )

    def get_obs(self, state: CartPoleState) -> jax.Array:
        return jnp.array([state.x, state.x_dot, state.theta, state.theta_dot])

    def is_terminal(self, state: CartPoleState, params: CartPoleParams) -> jax.Array:
        out_of_bounds = jnp.logical_or(
            jnp.abs(state.x) > params.x_threshold,
            jnp.abs(state.theta) > params.theta_threshold_radians,
        )
        truncated = state.time >= params.max_steps_in_episode
        return jnp.logical_or(out_of_bounds, truncated)

    def observation_space(self, params) -> spaces.Box:
        # static numpy bounds: observation_space must be callable inside
        # traced code (the reference queries it under jit, pqn_gymnax.py:151)
        high = np.array(
            [
                params.x_threshold * 2,
                np.finfo(np.float32).max,
                params.theta_threshold_radians * 2,
                np.finfo(np.float32).max,
            ],
            np.float32,
        )
        return spaces.Box(-high, high, (4,), np.float32)

    def action_space(self, params=None) -> spaces.Discrete:
        return spaces.Discrete(2)
