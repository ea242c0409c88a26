"""AcrobotSwingup-v0 / AcrobotSwingupSparse-v0: continuous-torque acrobot.

The dm-suite acrobot-class tasks from the reference's playground family
(/root/reference/scripts/train_playground_all.sh dm-suite block:
AcrobotSwingup / AcrobotSwingupSparse). Reuses the in-tree Acrobot-v1
two-link equations of motion and RK4 integrator (classic/acrobot.py)
unchanged, but with:

- a CONTINUOUS elbow torque in [-1, 1] (the AC-PQN action interface),
- no solve-and-terminate: fixed 500-step episodes,
- dm-style rewards over the normalized tip height
  h = (-cos(q1) - cos(q1 + q2)) / 2 in [-1, 1]:
  dense task: (h + 1) / 2; sparse task: 1 only while h > 0.9.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from purejaxql_tpu.envs import spaces
from purejaxql_tpu.envs.base import Environment
from purejaxql_tpu.envs.classic.acrobot import (
    AcrobotParams,
    AcrobotState,
    _rk4_step,
    _wrap,
)


@struct.dataclass
class AcrobotSwingupParams(AcrobotParams):
    max_steps_in_episode: int = struct.field(pytree_node=False, default=500)


class AcrobotSwingup(Environment):
    def __init__(self, sparse: bool = False):
        self.sparse = sparse

    @property
    def default_params(self) -> AcrobotSwingupParams:
        return AcrobotSwingupParams()

    @property
    def name(self) -> str:
        return "AcrobotSwingupSparse-v0" if self.sparse else "AcrobotSwingup-v0"

    def reset_env(self, key, params):
        # hanging straight down with a small perturbation
        init = jax.random.uniform(key, (4,), minval=-0.1, maxval=0.1)
        state = AcrobotState(
            joint_angle1=init[0],
            joint_angle2=init[1],
            velocity_1=init[2],
            velocity_2=init[3],
            time=jnp.asarray(0, jnp.int32),
        )
        return self.get_obs(state), state

    def step_env(self, key, state, action, params):
        torque = jnp.clip(jnp.asarray(action).reshape(()), -1.0, 1.0)
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
        new_state = AcrobotState(
            joint_angle1=_wrap(ns[0], -jnp.pi, jnp.pi),
            joint_angle2=_wrap(ns[1], -jnp.pi, jnp.pi),
            velocity_1=jnp.clip(ns[2], -params.max_vel_1, params.max_vel_1),
            velocity_2=jnp.clip(ns[3], -params.max_vel_2, params.max_vel_2),
            time=state.time + 1,
        )
        # normalized tip height in [-1, 1]: -1 hanging, +1 fully inverted
        h = (
            -jnp.cos(new_state.joint_angle1)
            - jnp.cos(new_state.joint_angle1 + new_state.joint_angle2)
        ) / 2.0
        if self.sparse:
            reward = (h > 0.9).astype(jnp.float32)
        else:
            reward = (h + 1.0) / 2.0
        done = new_state.time >= params.max_steps_in_episode
        return (
            jax.lax.stop_gradient(self.get_obs(new_state)),
            jax.lax.stop_gradient(new_state),
            jnp.asarray(reward, jnp.float32),
            done,
            {},
        )

    def get_obs(self, state) -> jax.Array:
        return jnp.array(
            [
                jnp.cos(state.joint_angle1),
                jnp.sin(state.joint_angle1),
                jnp.cos(state.joint_angle2),
                jnp.sin(state.joint_angle2),
                state.velocity_1,
                state.velocity_2,
            ]
        ).astype(jnp.float32)

    def observation_space(self, params):
        high = np.array(
            [1.0, 1.0, 1.0, 1.0, params.max_vel_1, params.max_vel_2],
            np.float32,
        )
        return spaces.Box(-high, high, (6,), np.float32)

    def action_space(self, params=None):
        return spaces.Box(-1.0, 1.0, (1,), np.float32)
