"""Hopper: planar SLIP (spring-loaded inverted pendulum) locomotion.

The locomotion-class continuous task for the AC-PQN family (the reference
covers this family via mujoco_playground's locomotion suite,
scripts/train_playground_all.sh). A point-mass body rides a massless
springy leg: in FLIGHT the body is ballistic and the action aims the leg
for touchdown; in STANCE the spring compresses and the action modulates
leg thrust. Lightly damped, so sustained hopping — and forward progress —
requires active thrust and landing-angle control.

The leg retracts on touchdown (Raibert-style): the foot plants along the
commanded leg direction at the body's current distance-to-ground, so the
spring always starts uncompressed (energy-consistent contact) and thrust
injects energy by EXTENDING the spring's rest length during stance. The
state machine is branchless (phase flag + jnp.where), integrated with
semi-implicit Euler at dt=0.0025 x 16 substeps per env step. Reward is
forward velocity + alive bonus - control cost; the episode ends if the
body sinks below crawl height (energy starved or crashed).

Actions (2, in [-1, 1]):
  a[0]: leg touchdown angle (flight), scaled to +-0.5 rad
  a[1]: stance thrust (rest-length extension, >=0 half used)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from purejaxql_tpu.envs import spaces
from purejaxql_tpu.envs.base import Environment


@struct.dataclass
class HopperState:
    x: jax.Array
    z: jax.Array
    vx: jax.Array
    vz: jax.Array
    leg_angle: jax.Array   # from vertical, + forward (flight-controlled)
    foot_x: jax.Array      # planted foot position (stance)
    leg_rest: jax.Array    # spring rest length set at touchdown (<= L0)
    stance: jax.Array      # bool phase flag
    time: jax.Array


@struct.dataclass
class HopperParams:
    mass: float = 1.0
    gravity: float = 9.8
    leg_length: float = 1.0
    spring_k: float = 250.0
    thrust_ext: float = 0.15
    damping: float = 6.0
    angle_rate: float = 6.0
    max_angle: float = 0.5
    dt: float = 0.0025
    substeps: int = struct.field(pytree_node=False, default=16)
    min_height: float = 0.35
    max_steps_in_episode: int = struct.field(pytree_node=False, default=1000)


class Hopper(Environment):
    """One SLIP dynamics model, two reward tasks — like the dm_control
    hopper domain behind the reference's HopperHop / HopperStand playground
    tasks: "hop" (default, Hopper-v0) rewards forward velocity, "stand"
    (HopperStand-v0) rewards standing tall and still."""

    def __init__(self, task: str = "hop"):
        assert task in ("hop", "stand"), task
        self.task = task

    @property
    def default_params(self) -> HopperParams:
        return HopperParams()

    @property
    def name(self) -> str:
        return "Hopper-v0" if self.task == "hop" else "HopperStand-v0"

    def reset_env(self, key, params):
        k1, k2 = jax.random.split(key)
        state = HopperState(
            x=jnp.asarray(0.0),
            z=params.leg_length
            + 0.05
            + jax.random.uniform(k1, (), minval=0.0, maxval=0.1),
            vx=jax.random.uniform(k2, (), minval=-0.1, maxval=0.1),
            vz=jnp.asarray(0.0),
            leg_angle=jnp.asarray(0.0),
            foot_x=jnp.asarray(0.0),
            leg_rest=jnp.asarray(params.leg_length),
            stance=jnp.asarray(False),
            time=jnp.asarray(0, jnp.int32),
        )
        return self.get_obs(state, params), state

    def _substep(self, s: HopperState, action, params):
        target_angle = params.max_angle * action[0]
        thrust = jnp.maximum(action[1], 0.0)

        # flight: steer the leg toward the commanded touchdown angle
        angle_err = target_angle - s.leg_angle
        leg_angle = jnp.where(
            s.stance,
            s.leg_angle,
            s.leg_angle
            + jnp.clip(
                params.angle_rate * angle_err * params.dt,
                -params.angle_rate * params.dt,
                params.angle_rate * params.dt,
            ),
        )

        # stance: spring force along the (foot -> body) leg vector; thrust
        # extends the rest length, doing positive work on the body
        lx = s.x - s.foot_x
        lz = s.z
        l = jnp.sqrt(lx**2 + lz**2) + 1e-8
        ux, uz = lx / l, lz / l
        rest = s.leg_rest + params.thrust_ext * thrust
        compression = jnp.maximum(rest - l, 0.0)
        # radial velocity for damping
        vr = s.vx * ux + s.vz * uz
        f = jnp.maximum(
            params.spring_k * compression - params.damping * vr, 0.0
        )
        ax = jnp.where(s.stance, f * ux / params.mass, 0.0)
        az = jnp.where(s.stance, f * uz / params.mass, 0.0) - params.gravity

        vx = s.vx + ax * params.dt
        vz = s.vz + az * params.dt
        x = s.x + vx * params.dt
        z = s.z + vz * params.dt

        # phase transitions. The leg retracts to the body's reachable
        # length at touchdown, so contact NEVER starts pre-compressed (an
        # energy-consistent plant at any height); liftoff when the leg
        # passes its rest length moving outward.
        cos_a = jnp.cos(leg_angle)
        reach = jnp.minimum(params.leg_length, z / jnp.maximum(cos_a, 0.5))
        touchdown = (~s.stance) & (vz < 0.0) & (
            z <= params.leg_length * cos_a
        )
        new_foot_x = jnp.where(
            touchdown, x + reach * jnp.sin(leg_angle), s.foot_x
        )
        leg_rest = jnp.where(touchdown, reach, s.leg_rest)
        liftoff = s.stance & (l >= rest) & (vr > 0.0)
        stance = jnp.where(touchdown, True, jnp.where(liftoff, False, s.stance))
        # on liftoff the leg swings back under the body
        leg_angle = jnp.where(liftoff, 0.0, leg_angle)

        return HopperState(
            x=x, z=z, vx=vx, vz=vz, leg_angle=leg_angle,
            foot_x=new_foot_x, leg_rest=leg_rest, stance=stance, time=s.time,
        )

    def step_env(self, key, state, action, params):
        action = jnp.clip(action, -1.0, 1.0)
        s = state
        for _ in range(params.substeps):
            s = self._substep(s, action, params)
        s = s.replace(time=state.time + 1)

        fell = s.z < params.min_height
        ctrl_cost = 0.05 * jnp.sum(action**2)
        if self.task == "stand":
            reward = (
                jnp.clip(s.z / params.leg_length, 0.0, 1.0)
                - 0.3 * jnp.abs(s.vx)
                + 0.5
                - ctrl_cost
            )
        else:
            reward = 1.5 * jnp.clip(s.vx, -2.0, 3.0) + 0.5 - ctrl_cost
        reward = jnp.where(fell, reward - 1.0, reward)
        done = self.is_terminal(s, params)
        return (
            jax.lax.stop_gradient(self.get_obs(s, params)),
            jax.lax.stop_gradient(s),
            reward.astype(jnp.float32),
            done,
            {},
        )

    def get_obs(self, state, params=None) -> jax.Array:
        params = params or self.default_params
        lx = state.x - state.foot_x
        l = jnp.sqrt(lx**2 + state.z**2) + 1e-8
        return jnp.array(
            [
                state.z,
                state.vx,
                state.vz,
                jnp.sin(state.leg_angle),
                jnp.cos(state.leg_angle),
                state.stance.astype(jnp.float32),
                jnp.maximum(state.leg_rest - l, 0.0),  # compression
                jnp.clip(lx, -1.5, 1.5),               # foot offset
            ]
        )

    def is_terminal(self, state, params):
        return jnp.logical_or(
            state.z < params.min_height,
            state.time >= params.max_steps_in_episode,
        )

    def observation_space(self, params):
        return spaces.Box(-np.inf, np.inf, (8,), np.float32)

    def action_space(self, params=None):
        return spaces.Box(-1.0, 1.0, (2,), np.float32)
