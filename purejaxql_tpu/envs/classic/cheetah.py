"""CheetahRun-v0: planar quadruped gallop — a pitching body on four
SLIP legs, pure JAX.

The cheetah-class locomotion task for the AC-PQN family (the reference
covers it via mujoco_playground's CheetahRun, scripts/
train_playground_all.sh dm-suite block). Extends the Walker's
two-leg point-mass SLIP model (walker.py) with the one ingredient a
galloping quadruped adds over a walking biped: a RIGID BODY WITH PITCH.
The torso is a planar rigid body (COM + pitch angle + inertia); two legs
hang from the fore hip and two from the hind hip, and every leg force is
applied AT ITS HIP, so fore/hind imbalance torques the body — the gallop
has to manage pitch, not just height, and nose-diving ends the episode.

Per-leg dynamics are the Walker's (Raibert touchdown retraction, stance
thrust extending the spring rest length, radial damping), computed
vectorized over a (4,) leg axis. Branchless, semi-implicit Euler at
dt=0.0025 x 16 substeps.

Actions (8, in [-1, 1]):
  a[0:4]: touchdown angle per leg (fore pair first), scaled to +-0.6 rad
  a[4:8]: stance thrust per leg (>=0 half used)

Observation (26): z, vx, vz, sin/cos(pitch), omega, then per leg
sin/cos(angle), stance flag, spring compression, foot offset.

Reward: forward velocity (clipped at 8 m/s — the "run" saturation) +
alive bonus - control cost; termination on body height below crawl
height or |pitch| beyond ~57 deg (a somersaulting cheetah has fallen).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from purejaxql_tpu.envs import spaces
from purejaxql_tpu.envs.base import Environment


@struct.dataclass
class CheetahState:
    x: jax.Array
    z: jax.Array
    vx: jax.Array
    vz: jax.Array
    pitch: jax.Array
    omega: jax.Array
    leg_angle: jax.Array   # (4,) from vertical, + forward
    foot_x: jax.Array      # (4,) planted foot positions
    leg_rest: jax.Array    # (4,) spring rest length set at touchdown
    stance: jax.Array      # (4,) bool phase flags
    time: jax.Array


@struct.dataclass
class CheetahParams:
    mass: float = 1.0
    inertia: float = 0.15
    body_half: float = 0.35   # hip lever arm fore/aft of the COM
    gravity: float = 9.8
    leg_length: float = 0.9
    spring_k: float = 250.0
    thrust_ext: float = 0.15
    damping: float = 6.0
    angle_rate: float = 7.0
    max_angle: float = 0.6
    dt: float = 0.0025
    substeps: int = struct.field(pytree_node=False, default=16)
    min_height: float = 0.3
    max_pitch: float = 1.0
    max_steps_in_episode: int = struct.field(pytree_node=False, default=1000)


# static hip lever per leg: legs 0,1 on the fore hip, 2,3 on the hind
_HIP = np.array([1.0, 1.0, -1.0, -1.0], np.float32)


class Cheetah(Environment):
    """One quadruped dynamics model, one reward task ("run") — the
    dm_control cheetah domain behind the reference's CheetahRun
    playground task."""

    def __init__(self, task: str = "run"):
        assert task in ("run",), task
        self.task = task

    @property
    def default_params(self) -> CheetahParams:
        return CheetahParams()

    @property
    def name(self) -> str:
        return "CheetahRun-v0"

    def reset_env(self, key, params):
        k1, k2 = jax.random.split(key)
        state = CheetahState(
            x=jnp.asarray(0.0),
            z=params.leg_length
            + 0.05
            + jax.random.uniform(k1, (), minval=0.0, maxval=0.1),
            vx=jax.random.uniform(k2, (), minval=-0.1, maxval=0.1),
            vz=jnp.asarray(0.0),
            pitch=jnp.asarray(0.0),
            omega=jnp.asarray(0.0),
            # fore/hind pairs start split so a symmetric policy still
            # breaks into an alternating gait at first touchdown
            leg_angle=jnp.array([0.15, 0.05, -0.05, -0.15]),
            foot_x=jnp.zeros(4),
            leg_rest=jnp.full(4, params.leg_length),
            stance=jnp.zeros(4, bool),
            time=jnp.asarray(0, jnp.int32),
        )
        return self.get_obs(state, params), state

    def _hips(self, s, params):
        """Hip anchor positions and velocities from the rigid body."""
        h = jnp.asarray(_HIP) * params.body_half           # (4,)
        c, sn = jnp.cos(s.pitch), jnp.sin(s.pitch)
        hx = s.x + h * c
        hz = s.z + h * sn
        # hip velocity = COM velocity + omega x r
        vhx = s.vx - s.omega * h * sn
        vhz = s.vz + s.omega * h * c
        return hx, hz, vhx, vhz, h, c, sn

    def _substep(self, s: CheetahState, action, params):
        target_angle = params.max_angle * action[:4]          # (4,)
        thrust = jnp.maximum(action[4:], 0.0)                 # (4,)

        angle_err = target_angle - s.leg_angle
        rate = params.angle_rate * params.dt
        leg_angle = jnp.where(
            s.stance,
            s.leg_angle,
            s.leg_angle + jnp.clip(params.angle_rate * angle_err * params.dt,
                                   -rate, rate),
        )

        hx, hz, vhx, vhz, h, c, sn = self._hips(s, params)

        # stance legs: spring force along each (foot -> hip) leg vector,
        # applied AT the hip — one vectorized (4,) pass
        lx = hx - s.foot_x
        lz = hz
        l = jnp.sqrt(lx**2 + lz**2) + 1e-8
        ux, uz = lx / l, lz / l
        rest = s.leg_rest + params.thrust_ext * thrust
        compression = jnp.maximum(rest - l, 0.0)
        vr = vhx * ux + vhz * uz
        f = jnp.maximum(
            params.spring_k * compression - params.damping * vr, 0.0
        )
        f = jnp.where(s.stance, f, 0.0)
        fx, fz = f * ux, f * uz
        ax = fx.sum() / params.mass
        az = fz.sum() / params.mass - params.gravity
        # torque about the COM: r x F with r = (h cos, h sin)
        tau = (h * c * fz - h * sn * fx).sum()
        alpha = tau / params.inertia

        vx = s.vx + ax * params.dt
        vz = s.vz + az * params.dt
        omega = s.omega + alpha * params.dt
        x = s.x + vx * params.dt
        z = s.z + vz * params.dt
        pitch = s.pitch + omega * params.dt

        # per-leg phase transitions, gated on the LEG'S OWN hip height
        cos_a = jnp.cos(leg_angle)
        reach = jnp.minimum(params.leg_length, hz / jnp.maximum(cos_a, 0.5))
        touchdown = (
            (~s.stance) & (vhz < 0.0) & (hz <= params.leg_length * cos_a)
        )
        new_foot_x = jnp.where(
            touchdown, hx + reach * jnp.sin(leg_angle), s.foot_x
        )
        leg_rest = jnp.where(touchdown, reach, s.leg_rest)
        liftoff = s.stance & (l >= rest) & (vr > 0.0)
        stance = jnp.where(touchdown, True, jnp.where(liftoff, False, s.stance))
        leg_angle = jnp.where(liftoff, 0.0, leg_angle)

        return CheetahState(
            x=x, z=z, vx=vx, vz=vz, pitch=pitch, omega=omega,
            leg_angle=leg_angle, foot_x=new_foot_x, leg_rest=leg_rest,
            stance=stance, time=s.time,
        )

    def step_env(self, key, state, action, params):
        action = jnp.clip(action, -1.0, 1.0)
        s = state
        for _ in range(params.substeps):
            s = self._substep(s, action, params)
        s = s.replace(time=state.time + 1)

        fell = jnp.logical_or(
            s.z < params.min_height, jnp.abs(s.pitch) > params.max_pitch
        )
        ctrl_cost = 0.05 * jnp.sum(action**2)
        reward = (
            0.6 * jnp.clip(s.vx, -2.0, 8.0)
            + 0.5
            - ctrl_cost
            - 0.05 * s.omega**2
        )
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
        hx, hz, _, _, _, _, _ = self._hips(state, params)
        lx = hx - state.foot_x
        l = jnp.sqrt(lx**2 + hz**2) + 1e-8
        per_leg = jnp.stack(
            [
                jnp.sin(state.leg_angle),
                jnp.cos(state.leg_angle),
                state.stance.astype(jnp.float32),
                jnp.maximum(state.leg_rest - l, 0.0),
                jnp.clip(lx, -1.5, 1.5),
            ],
            axis=0,
        )  # (5, 4)
        return jnp.concatenate(
            [
                jnp.stack([
                    state.z, state.vx, state.vz,
                    jnp.sin(state.pitch), jnp.cos(state.pitch), state.omega,
                ]),
                per_leg.reshape(-1),
            ]
        ).astype(jnp.float32)

    def is_terminal(self, state, params):
        return jnp.logical_or(
            jnp.logical_or(
                state.z < params.min_height,
                jnp.abs(state.pitch) > params.max_pitch,
            ),
            state.time >= params.max_steps_in_episode,
        )

    def observation_space(self, params):
        return spaces.Box(-np.inf, np.inf, (26,), np.float32)

    def action_space(self, params=None):
        return spaces.Box(-1.0, 1.0, (8,), np.float32)
