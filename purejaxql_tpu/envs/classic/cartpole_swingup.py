"""CartPoleSwingUp: dm-suite cartpole-class continuous control, 4 tasks.

Same rigid-body dynamics as CartPole-v1 but with a continuous force in
[-10, 10] N and no early termination. Like the dm_control cartpole domain
the reference's playground family covers (scripts/train_playground_all.sh
dm-suite block: CartpoleSwingup / CartpoleSwingupSparse / CartpoleBalance /
CartpoleBalanceSparse), one dynamics model carries four reward/reset tasks:

- "swingup" (default): pole starts hanging DOWN; dense uprightness bonus
  attenuated toward the track edges.
- "swingup_sparse": same start; reward 1 only while nearly upright
  (cos(theta) > 0.995) and near the track center.
- "balance": pole starts UP (small perturbation); dense reward.
- "balance_sparse": upright start, sparse reward.
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


_TASKS = ("swingup", "swingup_sparse", "balance", "balance_sparse")


class CartPoleSwingUp(Environment):
    def __init__(self, task: str = "swingup"):
        assert task in _TASKS, f"task must be one of {_TASKS}"
        self.task = task

    @property
    def default_params(self) -> SwingUpParams:
        return SwingUpParams()

    @property
    def name(self) -> str:
        return {
            "swingup": "CartPoleSwingUp-v0",
            "swingup_sparse": "CartPoleSwingUpSparse-v0",
            "balance": "CartpoleBalance-v0",
            "balance_sparse": "CartpoleBalanceSparse-v0",
        }[self.task]

    def reset_env(self, key, params):
        k1, k2 = jax.random.split(key)
        # balance tasks start upright, swingup tasks hang down
        theta0 = 0.0 if self.task.startswith("balance") else jnp.pi
        state = SwingUpState(
            x=jax.random.uniform(k1, (), minval=-0.1, maxval=0.1),
            x_dot=jnp.asarray(0.0),
            theta=theta0 + jax.random.uniform(k2, (), minval=-0.1, maxval=0.1),
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
        if self.task.endswith("sparse"):
            # reward 1 only while nearly upright and near the track center
            reward = (
                (jnp.cos(theta) > 0.995)
                & (jnp.abs(x) < 0.5 * params.x_threshold)
            ).astype(jnp.float32)
        else:
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
