"""Acrobot-v1: two-link underactuated pendulum swing-up, pure JAX.

Canonical Gym/gymnax Acrobot-v1 dynamics (RK4 integration of the two-link
equations of motion, torque in {-1, 0, +1}). Reward is -1 per step until the
tip crosses the line, 500-step limit. The reference's alternative env for
`pqn_gymnax.py` (/root/reference/purejaxql/config/alg/pqn_cartpole.yaml:28).
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
class AcrobotState:
    joint_angle1: jax.Array
    joint_angle2: jax.Array
    velocity_1: jax.Array
    velocity_2: jax.Array
    time: jax.Array


@struct.dataclass
class AcrobotParams:
    dt: float = 0.2
    link_length_1: float = 1.0
    link_length_2: float = 1.0
    link_mass_1: float = 1.0
    link_mass_2: float = 1.0
    link_com_pos_1: float = 0.5
    link_com_pos_2: float = 0.5
    link_moi: float = 1.0
    max_vel_1: float = 4 * jnp.pi
    max_vel_2: float = 9 * jnp.pi
    torque_noise_max: float = 0.0
    max_steps_in_episode: int = struct.field(pytree_node=False, default=500)


class Acrobot(Environment):
    """Acrobot-v1 with 3 discrete torque actions."""

    @property
    def default_params(self) -> AcrobotParams:
        return AcrobotParams()

    @property
    def name(self) -> str:
        return "Acrobot-v1"

    def reset_env(self, key, params) -> Tuple[jax.Array, AcrobotState]:
        init = jax.random.uniform(key, (4,), minval=-0.1, maxval=0.1)
        state = AcrobotState(
            joint_angle1=init[0],
            joint_angle2=init[1],
            velocity_1=init[2],
            velocity_2=init[3],
            time=jnp.asarray(0, dtype=jnp.int32),
        )
        return self.get_obs(state), state

    def step_env(self, key, state, action, params):
        torque = jnp.take(jnp.array([-1.0, 0.0, 1.0]), action)
        torque = torque + jax.random.uniform(
            key, (), minval=-params.torque_noise_max, maxval=params.torque_noise_max
        )

        s_augmented = jnp.array(
            [
                state.joint_angle1,
                state.joint_angle2,
                state.velocity_1,
                state.velocity_2,
                torque,
            ]
        )
        ns = _rk4_step(s_augmented, params)

        joint_angle1 = _wrap(ns[0], -jnp.pi, jnp.pi)
        joint_angle2 = _wrap(ns[1], -jnp.pi, jnp.pi)
        velocity_1 = jnp.clip(ns[2], -params.max_vel_1, params.max_vel_1)
        velocity_2 = jnp.clip(ns[3], -params.max_vel_2, params.max_vel_2)

        new_state = AcrobotState(
            joint_angle1=joint_angle1,
            joint_angle2=joint_angle2,
            velocity_1=velocity_1,
            velocity_2=velocity_2,
            time=state.time + 1,
        )
        done = self.is_terminal(new_state, params)
        solved = -jnp.cos(joint_angle1) - jnp.cos(joint_angle2 + joint_angle1) > 1.0
        reward = -1.0 + solved
        return (
            jax.lax.stop_gradient(self.get_obs(new_state)),
            jax.lax.stop_gradient(new_state),
            jnp.asarray(reward, dtype=jnp.float32),
            done,
            {},
        )

    def get_obs(self, state: AcrobotState) -> jax.Array:
        return jnp.array(
            [
                jnp.cos(state.joint_angle1),
                jnp.sin(state.joint_angle1),
                jnp.cos(state.joint_angle2),
                jnp.sin(state.joint_angle2),
                state.velocity_1,
                state.velocity_2,
            ]
        )

    def is_terminal(self, state: AcrobotState, params: AcrobotParams) -> jax.Array:
        solved = (
            -jnp.cos(state.joint_angle1)
            - jnp.cos(state.joint_angle2 + state.joint_angle1)
            > 1.0
        )
        truncated = state.time >= params.max_steps_in_episode
        return jnp.logical_or(solved, truncated)

    def observation_space(self, params) -> spaces.Box:
        high = np.array(
            [1.0, 1.0, 1.0, 1.0, params.max_vel_1, params.max_vel_2], np.float32
        )
        return spaces.Box(-high, high, (6,), np.float32)

    def action_space(self, params=None) -> spaces.Discrete:
        return spaces.Discrete(3)


def _dsdt(s_augmented: jax.Array, params: AcrobotParams) -> jax.Array:
    """Two-link equations of motion (Sutton's acrobot, 'book' convention)."""
    m1, m2 = params.link_mass_1, params.link_mass_2
    l1 = params.link_length_1
    lc1, lc2 = params.link_com_pos_1, params.link_com_pos_2
    i1, i2 = params.link_moi, params.link_moi
    g = 9.8
    a = s_augmented[4]
    theta1, theta2, dtheta1, dtheta2 = s_augmented[:4]

    d1 = (
        m1 * lc1**2
        + m2 * (l1**2 + lc2**2 + 2 * l1 * lc2 * jnp.cos(theta2))
        + i1
        + i2
    )
    d2 = m2 * (lc2**2 + l1 * lc2 * jnp.cos(theta2)) + i2
    phi2 = m2 * lc2 * g * jnp.cos(theta1 + theta2 - jnp.pi / 2.0)
    phi1 = (
        -m2 * l1 * lc2 * dtheta2**2 * jnp.sin(theta2)
        - 2 * m2 * l1 * lc2 * dtheta2 * dtheta1 * jnp.sin(theta2)
        + (m1 * lc1 + m2 * l1) * g * jnp.cos(theta1 - jnp.pi / 2)
        + phi2
    )
    ddtheta2 = (
        a + d2 / d1 * phi1 - m2 * l1 * lc2 * dtheta1**2 * jnp.sin(theta2) - phi2
    ) / (m2 * lc2**2 + i2 - d2**2 / d1)
    ddtheta1 = -(d2 * ddtheta2 + phi1) / d1
    return jnp.array([dtheta1, dtheta2, ddtheta1, ddtheta2, 0.0])


def _rk4_step(s_augmented: jax.Array, params: AcrobotParams) -> jax.Array:
    dt = params.dt
    k1 = _dsdt(s_augmented, params)
    k2 = _dsdt(s_augmented + dt / 2 * k1, params)
    k3 = _dsdt(s_augmented + dt / 2 * k2, params)
    k4 = _dsdt(s_augmented + dt * k3, params)
    return s_augmented + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)


def _wrap(x: jax.Array, low: float, high: float) -> jax.Array:
    diff = high - low
    return ((x - low) % diff) + low
