"""BallInCup-v0: swing a tethered ball into a moving cup — pure JAX.

The dm-suite-class sparse-reward manipulation task for the AC-PQN family
(the reference covers this family via mujoco_playground's dm-suite set,
scripts/train_playground_all.sh lists ball_in_cup among its tasks). An
actuated cup slides in the vertical plane; a ball hangs from its rim on an
inextensible string. The agent accelerates the cup to swing the ball up
and catch it.

Dynamics are a taut-string constraint model: the ball is ballistic under
gravity while the string is slack; when the string reaches full length and
the ball is separating, the radial velocity component (relative to the
cup) is removed — an inelastic snap, which is what makes energy pumping by
cup motion possible. The cup is velocity-damped and confined to a box.
Branchless (jnp.where only), 4 substeps of semi-implicit Euler per step.

Reward is the dm-suite sparse catch signal (1 while the ball sits inside
the cup mouth) plus a small default shaping term rewarding height of the
ball relative to the cup (SHAPING=0.05; set shaping=0.0 for the pure
sparse task). Catching also requires the ball to be moving slowly relative
to the cup, so flythroughs don't score.

Actions (2, in [-1, 1]): cup acceleration (x, z).
Observation (8): cup xz, cup vel, ball-relative xz, ball-relative vel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from purejaxql_tpu.envs import spaces
from purejaxql_tpu.envs.base import Environment


@struct.dataclass
class BallInCupState:
    cup: jax.Array       # (2,) x, z
    cup_vel: jax.Array   # (2,)
    ball: jax.Array      # (2,)
    ball_vel: jax.Array  # (2,)
    time: jax.Array


@struct.dataclass
class BallInCupParams:
    gravity: float = 9.8
    string_len: float = 0.3
    cup_accel: float = 20.0
    cup_damping: float = 4.0
    box: float = 0.6             # cup confined to [-box, box]^2
    mouth_half_w: float = 0.05   # catch window half-width
    mouth_depth: float = 0.06    # how far below the rim counts as "in"
    catch_speed: float = 1.5     # max relative speed that still catches
    shaping: float = 0.05
    dt: float = 0.01
    substeps: int = struct.field(pytree_node=False, default=4)
    max_steps_in_episode: int = struct.field(pytree_node=False, default=500)


class BallInCup(Environment):
    @property
    def default_params(self) -> BallInCupParams:
        return BallInCupParams()

    @property
    def name(self) -> str:
        return "BallInCup-v0"

    def reset_env(self, key, params):
        # ball hangs below the cup with a small random angle/perturbation
        k_ang, k_vel = jax.random.split(key)
        ang = jax.random.uniform(k_ang, (), minval=-0.4, maxval=0.4)
        cup = jnp.zeros(2)
        ball = cup + params.string_len * jnp.stack(
            [jnp.sin(ang), -jnp.cos(ang)]
        )
        ball_vel = 0.1 * jax.random.normal(k_vel, (2,))
        state = BallInCupState(
            cup=cup,
            cup_vel=jnp.zeros(2),
            ball=ball,
            ball_vel=ball_vel,
            time=jnp.asarray(0, jnp.int32),
        )
        return self.get_obs(state, params), state

    def _substep(self, state: BallInCupState, accel, params):
        dt = params.dt
        cup_vel = state.cup_vel + dt * (
            params.cup_accel * accel - params.cup_damping * state.cup_vel
        )
        cup = state.cup + dt * cup_vel
        # reflect-free box clamp: kill the outward velocity at the wall
        hit_lo = cup < -params.box
        hit_hi = cup > params.box
        cup = jnp.clip(cup, -params.box, params.box)
        cup_vel = jnp.where(hit_lo | hit_hi, 0.0, cup_vel)

        ball_vel = state.ball_vel + dt * jnp.array([0.0, -params.gravity])
        ball = state.ball + dt * ball_vel

        # taut-string constraint (relative to the cup anchor)
        rel = ball - cup
        dist = jnp.sqrt((rel**2).sum() + 1e-12)
        taut = dist >= params.string_len
        u = rel / dist
        # clamp the ball back onto the circle
        ball = jnp.where(taut, cup + u * params.string_len, ball)
        # remove the separating radial component of the RELATIVE velocity
        rel_vel = ball_vel - cup_vel
        v_rad = (rel_vel * u).sum()
        snap = taut & (v_rad > 0)
        ball_vel = jnp.where(snap, ball_vel - v_rad * u, ball_vel)
        return state.replace(cup=cup, cup_vel=cup_vel, ball=ball, ball_vel=ball_vel)

    def _caught(self, state: BallInCupState, params):
        rel = state.ball - state.cup
        rel_vel = state.ball_vel - state.cup_vel
        slow = (rel_vel**2).sum() < params.catch_speed**2
        return (
            (jnp.abs(rel[0]) < params.mouth_half_w)
            & (rel[1] < 0.0)
            & (rel[1] > -params.mouth_depth)
            & slow
        )

    def step_env(self, key, state, action, params):
        accel = jnp.clip(jnp.asarray(action, jnp.float32), -1.0, 1.0)
        for _ in range(params.substeps):
            state = self._substep(state, accel, params)
        caught = self._caught(state, params)
        # shaping: ball height relative to the cup, scaled to [0, 1]
        height = (state.ball[1] - state.cup[1]) / params.string_len
        reward = (
            caught.astype(jnp.float32)
            + params.shaping * jnp.clip(height, 0.0, 1.0)
        )
        state = state.replace(time=state.time + 1)
        done = self.is_terminal(state, params)
        return (
            jax.lax.stop_gradient(self.get_obs(state, params)),
            jax.lax.stop_gradient(state),
            reward,
            done,
            {},
        )

    def get_obs(self, state: BallInCupState, params) -> jax.Array:
        return jnp.concatenate(
            [
                state.cup,
                state.cup_vel,
                (state.ball - state.cup) / params.string_len,
                state.ball_vel - state.cup_vel,
            ]
        ).astype(jnp.float32)

    def is_terminal(self, state, params):
        return state.time >= params.max_steps_in_episode

    def observation_space(self, params):
        return spaces.Box(-np.inf, np.inf, (8,), np.float32)

    def action_space(self, params=None):
        return spaces.Box(-1.0, 1.0, (2,), np.float32)
