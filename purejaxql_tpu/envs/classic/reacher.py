"""Reacher-v0: 2-joint planar arm reaching a random target — pure JAX.

A second in-tree continuous-control benchmark for the AC-PQN family
(alongside Pendulum), in the spirit of the dm-control/playground reach
tasks the reference trains on (pqn_mujoco_playground.py). Torque-controlled
double pendulum (simplified decoupled joint dynamics), dense reward
-(distance to target), episode length 150, target resampled per episode.
Action: 2-D torque in [-1, 1].

Like the dm_control reacher domain (reference playground dm-suite block:
ReacherEasy / ReacherHard), the same dynamics also carry two SPARSE tasks:
reward 1 while the fingertip is inside the target disc, whose radius is
large ("easy", 0.20 of the 1.0 arm span) or small ("hard", 0.06) —
proportionally the dm_control target sizes (.05/.015 on a .24 arm).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from purejaxql_tpu.envs import spaces
from purejaxql_tpu.envs.base import Environment


@struct.dataclass
class ReacherState:
    theta: jax.Array      # (2,) joint angles
    theta_dot: jax.Array  # (2,)
    target: jax.Array     # (2,) xy
    time: jax.Array


@struct.dataclass
class ReacherParams:
    dt: float = 0.05
    gear: float = 4.0
    damping: float = 0.9
    max_speed: float = 8.0
    l1: float = 0.6
    l2: float = 0.4
    max_steps_in_episode: int = struct.field(pytree_node=False, default=150)


_TARGET_RADIUS = {"easy": 0.20, "hard": 0.06}


class Reacher(Environment):
    def __init__(self, task: str = "dense"):
        assert task in ("dense", "easy", "hard"), task
        self.task = task

    @property
    def default_params(self) -> ReacherParams:
        return ReacherParams()

    @property
    def name(self) -> str:
        return {
            "dense": "Reacher-v0",
            "easy": "ReacherEasy-v0",
            "hard": "ReacherHard-v0",
        }[self.task]

    def _fingertip(self, theta, params):
        x = params.l1 * jnp.cos(theta[0]) + params.l2 * jnp.cos(
            theta[0] + theta[1]
        )
        y = params.l1 * jnp.sin(theta[0]) + params.l2 * jnp.sin(
            theta[0] + theta[1]
        )
        return jnp.array([x, y])

    def reset_env(self, key, params):
        k_theta, k_target = jax.random.split(key)
        theta = jax.random.uniform(k_theta, (2,), minval=-jnp.pi, maxval=jnp.pi)
        # target within reach (radius in [0.2, l1+l2 - 0.05])
        k_r, k_a = jax.random.split(k_target)
        radius = jax.random.uniform(
            k_r, (), minval=0.2, maxval=params.l1 + params.l2 - 0.05
        )
        angle = jax.random.uniform(k_a, (), minval=-jnp.pi, maxval=jnp.pi)
        target = radius * jnp.array([jnp.cos(angle), jnp.sin(angle)])
        state = ReacherState(
            theta=theta,
            theta_dot=jnp.zeros(2),
            target=target,
            time=jnp.asarray(0, jnp.int32),
        )
        return self.get_obs(state, params), state

    def step_env(self, key, state, action, params):
        torque = jnp.clip(jnp.asarray(action).reshape(2), -1.0, 1.0)
        theta_dot = (
            state.theta_dot * params.damping + torque * params.gear * params.dt
        )
        theta_dot = jnp.clip(theta_dot, -params.max_speed, params.max_speed)
        theta = state.theta + theta_dot * params.dt

        new_state = ReacherState(
            theta=theta,
            theta_dot=theta_dot,
            target=state.target,
            time=state.time + 1,
        )
        tip = self._fingertip(theta, params)
        dist = jnp.linalg.norm(tip - state.target)
        if self.task == "dense":
            reward = -dist - 0.01 * jnp.square(torque).sum()
        else:
            reward = (dist < _TARGET_RADIUS[self.task]).astype(jnp.float32)
        done = new_state.time >= params.max_steps_in_episode
        return (
            jax.lax.stop_gradient(self.get_obs(new_state, params)),
            jax.lax.stop_gradient(new_state),
            jnp.asarray(reward, jnp.float32),
            done,
            {},
        )

    def get_obs(self, state, params):
        tip = self._fingertip(state.theta, params)
        return jnp.concatenate(
            [
                jnp.cos(state.theta),
                jnp.sin(state.theta),
                state.theta_dot / params.max_speed,
                state.target,
                tip - state.target,
            ]
        ).astype(jnp.float32)

    def observation_space(self, params):
        return spaces.Box(-2.0, 2.0, (10,), jnp.float32)

    def action_space(self, params=None):
        return spaces.Box(-1.0, 1.0, (2,), jnp.float32)
