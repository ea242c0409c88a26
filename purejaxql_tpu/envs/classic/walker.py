"""Walker-v0: planar two-leg SLIP locomotion — pure JAX.

The biped locomotion-class task for the AC-PQN family (the reference
covers walker-class tasks via mujoco_playground's locomotion suite,
scripts/train_playground_all.sh: WalkerWalk/WalkerRun). Extends the
Hopper's spring-loaded-inverted-pendulum contact model (hopper.py) to TWO
massless springy legs on one point-mass body — the canonical bipedal
walking model (compass-SLIP): steady gaits alternate stance legs, and
double support happens naturally when both springs load.

Per-leg dynamics are identical to the Hopper's (Raibert touchdown
retraction so contact never starts pre-compressed, thrust extends the
rest length during stance, radial damping) and are computed VECTORIZED
over a (2,) leg axis — the whole two-leg force model is the same op count
as one leg. Branchless, semi-implicit Euler at dt=0.0025 x 16 substeps.

Reward is forward velocity + alive bonus - control cost; episodes end if
the body sinks below crawl height. Sustained progress requires the legs
to alternate: a single leg cannot carry the body through its own swing.

Actions (4, in [-1, 1]):
  a[0], a[1]: touchdown angle per leg, scaled to +-0.5 rad
  a[2], a[3]: stance thrust per leg (>=0 half used)

Observation (13): z, vx, vz, then per leg sin/cos(angle), stance flag,
spring compression, foot offset.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from purejaxql_tpu.envs import spaces
from purejaxql_tpu.envs.base import Environment


@struct.dataclass
class WalkerState:
    x: jax.Array
    z: jax.Array
    vx: jax.Array
    vz: jax.Array
    leg_angle: jax.Array   # (2,) from vertical, + forward
    foot_x: jax.Array      # (2,) planted foot positions
    leg_rest: jax.Array    # (2,) spring rest length set at touchdown
    stance: jax.Array      # (2,) bool phase flags
    time: jax.Array


@struct.dataclass
class WalkerParams:
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


class Walker(Environment):
    """One dynamics model, three reward tasks — like the dm_control walker
    domain behind the reference's WalkerStand / WalkerWalk / WalkerRun
    playground tasks (scripts/train_playground_all.sh dm-suite block):

    - "walk" (default, Walker-v0): forward velocity toward a moderate
      target speed + alive bonus.
    - "stand" (WalkerStand-v0): height/stillness — reward peaks standing
      tall with no horizontal motion.
    - "run" (WalkerRun-v0): same shape as walk but the speed reward
      saturates at 6 m/s instead of 3, favoring fast gaits.
    """

    def __init__(self, task: str = "walk"):
        assert task in ("walk", "stand", "run"), task
        self.task = task

    @property
    def default_params(self) -> WalkerParams:
        return WalkerParams()

    @property
    def name(self) -> str:
        return {
            "walk": "Walker-v0",
            "stand": "WalkerStand-v0",
            "run": "WalkerRun-v0",
        }[self.task]

    def reset_env(self, key, params):
        k1, k2 = jax.random.split(key)
        state = WalkerState(
            x=jnp.asarray(0.0),
            z=params.leg_length
            + 0.05
            + jax.random.uniform(k1, (), minval=0.0, maxval=0.1),
            vx=jax.random.uniform(k2, (), minval=-0.1, maxval=0.1),
            vz=jnp.asarray(0.0),
            # legs start split slightly fore/aft so the first touchdown
            # breaks symmetry even under a symmetric policy
            leg_angle=jnp.array([0.1, -0.1]),
            foot_x=jnp.zeros(2),
            leg_rest=jnp.full(2, params.leg_length),
            stance=jnp.zeros(2, bool),
            time=jnp.asarray(0, jnp.int32),
        )
        return self.get_obs(state, params), state

    def _substep(self, s: WalkerState, action, params):
        target_angle = params.max_angle * action[:2]          # (2,)
        thrust = jnp.maximum(action[2:], 0.0)                 # (2,)

        # swing legs steer toward their commanded touchdown angles
        angle_err = target_angle - s.leg_angle
        rate = params.angle_rate * params.dt
        leg_angle = jnp.where(
            s.stance,
            s.leg_angle,
            s.leg_angle + jnp.clip(params.angle_rate * angle_err * params.dt,
                                   -rate, rate),
        )

        # stance legs: spring force along each (foot -> body) leg vector;
        # one vectorized pass over the (2,) leg axis, forces sum
        lx = s.x - s.foot_x                                   # (2,)
        lz = s.z
        l = jnp.sqrt(lx**2 + lz**2) + 1e-8
        ux, uz = lx / l, lz / l
        rest = s.leg_rest + params.thrust_ext * thrust
        compression = jnp.maximum(rest - l, 0.0)
        vr = s.vx * ux + s.vz * uz
        f = jnp.maximum(
            params.spring_k * compression - params.damping * vr, 0.0
        )
        f = jnp.where(s.stance, f, 0.0)
        ax = (f * ux).sum() / params.mass
        az = (f * uz).sum() / params.mass - params.gravity

        vx = s.vx + ax * params.dt
        vz = s.vz + az * params.dt
        x = s.x + vx * params.dt
        z = s.z + vz * params.dt

        # per-leg phase transitions (same rules as the Hopper's)
        cos_a = jnp.cos(leg_angle)
        reach = jnp.minimum(params.leg_length, z / jnp.maximum(cos_a, 0.5))
        touchdown = (~s.stance) & (vz < 0.0) & (z <= params.leg_length * cos_a)
        new_foot_x = jnp.where(touchdown, x + reach * jnp.sin(leg_angle), s.foot_x)
        leg_rest = jnp.where(touchdown, reach, s.leg_rest)
        liftoff = s.stance & (l >= rest) & (vr > 0.0)
        stance = jnp.where(touchdown, True, jnp.where(liftoff, False, s.stance))
        leg_angle = jnp.where(liftoff, 0.0, leg_angle)

        return WalkerState(
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
            # standing tall and still: height bonus minus motion penalty
            reward = (
                jnp.clip(s.z / params.leg_length, 0.0, 1.0)
                - 0.3 * jnp.abs(s.vx)
                + 0.5
                - ctrl_cost
            )
        elif self.task == "run":
            reward = 0.75 * jnp.clip(s.vx, -2.0, 6.0) + 0.5 - ctrl_cost
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
        per_leg = jnp.stack(
            [
                jnp.sin(state.leg_angle),
                jnp.cos(state.leg_angle),
                state.stance.astype(jnp.float32),
                jnp.maximum(state.leg_rest - l, 0.0),
                jnp.clip(lx, -1.5, 1.5),
            ],
            axis=0,
        )  # (5, 2)
        return jnp.concatenate(
            [jnp.stack([state.z, state.vx, state.vz]), per_leg.reshape(-1)]
        ).astype(jnp.float32)

    def is_terminal(self, state, params):
        return jnp.logical_or(
            state.z < params.min_height,
            state.time >= params.max_steps_in_episode,
        )

    def observation_space(self, params):
        return spaces.Box(-np.inf, np.inf, (13,), np.float32)

    def action_space(self, params=None):
        return spaces.Box(-1.0, 1.0, (4,), np.float32)
