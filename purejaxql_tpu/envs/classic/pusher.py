"""Pusher-v0: 2-joint planar arm pushing a puck to a goal — pure JAX.

The manipulation-class continuous task for the AC-PQN family: the
reference covers this family via mujoco_playground's manipulation suite
(PandaPickCube etc., scripts/train_playground_all.sh and
config/alg/pqn_playground_manipulation.yaml). Same torque-controlled
double-pendulum arm as Reacher, plus a free puck on the plane that the
fingertip must push onto a goal pad. Contact is a branchless disk model:
while the fingertip overlaps the puck, the puck is de-penetrated along
the contact normal and picks up the fingertip's approach velocity, then
slides with friction. Reward is the manipulation shaping recipe — reach
term (tip→puck) + push term (puck→goal) + in-goal bonus − control cost.

Action: 2-D torque in [-1, 1]. Episode length 150; puck and goal are
resampled per episode inside the arm's reach annulus.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from purejaxql_tpu.envs import spaces
from purejaxql_tpu.envs.base import Environment


@struct.dataclass
class PusherState:
    theta: jax.Array      # (2,) joint angles
    theta_dot: jax.Array  # (2,)
    puck: jax.Array       # (2,) xy
    puck_vel: jax.Array   # (2,)
    goal: jax.Array       # (2,) xy
    time: jax.Array


@struct.dataclass
class PusherParams:
    dt: float = 0.05
    gear: float = 4.0
    damping: float = 0.9
    max_speed: float = 8.0
    l1: float = 0.6
    l2: float = 0.4
    contact_radius: float = 0.2    # fingertip disk + puck disk
    puck_friction: float = 0.85    # per-step velocity retention
    goal_radius: float = 0.1
    max_steps_in_episode: int = struct.field(pytree_node=False, default=150)


class Pusher(Environment):
    @property
    def default_params(self) -> PusherParams:
        return PusherParams()

    @property
    def name(self) -> str:
        return "Pusher-v0"

    def _fingertip(self, theta, params):
        x = params.l1 * jnp.cos(theta[0]) + params.l2 * jnp.cos(
            theta[0] + theta[1]
        )
        y = params.l1 * jnp.sin(theta[0]) + params.l2 * jnp.sin(
            theta[0] + theta[1]
        )
        return jnp.array([x, y])

    def reset_env(self, key, params):
        k_theta, k_puck, k_goal = jax.random.split(key, 3)
        theta = jax.random.uniform(k_theta, (2,), minval=-jnp.pi, maxval=jnp.pi)
        reach = params.l1 + params.l2

        def _annulus(k, lo, hi):
            k_r, k_a = jax.random.split(k)
            radius = jax.random.uniform(k_r, (), minval=lo, maxval=hi)
            angle = jax.random.uniform(k_a, (), minval=-jnp.pi, maxval=jnp.pi)
            return radius * jnp.array([jnp.cos(angle), jnp.sin(angle)])

        # puck well inside reach (it must stay pushable); the goal lands
        # 0.25-0.5 away from the puck in a random direction — a push of
        # roughly one contact chain, the playground-style task scale (a
        # fully random goal demands multi-orbit pushing a 2-joint arm
        # can't discover from shaped reward alone)
        puck = _annulus(k_puck, 0.3, reach - 0.25)
        k_r, k_a = jax.random.split(k_goal)
        off_r = jax.random.uniform(k_r, (), minval=0.25, maxval=0.5)
        off_a = jax.random.uniform(k_a, (), minval=-jnp.pi, maxval=jnp.pi)
        goal = puck + off_r * jnp.array([jnp.cos(off_a), jnp.sin(off_a)])
        goal = goal * jnp.minimum(1.0, (reach - 0.1) / jnp.linalg.norm(goal))
        state = PusherState(
            theta=theta,
            theta_dot=jnp.zeros(2),
            puck=puck,
            puck_vel=jnp.zeros(2),
            goal=goal,
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

        tip_old = self._fingertip(state.theta, params)
        tip = self._fingertip(theta, params)
        tip_vel = (tip - tip_old) / params.dt

        # disk contact: de-penetrate the puck along the contact normal and
        # transfer the fingertip's approach-speed component to it
        delta = state.puck - tip
        dist = jnp.linalg.norm(delta) + 1e-8
        normal = delta / dist
        overlap = jnp.maximum(params.contact_radius - dist, 0.0)
        touching = overlap > 0.0
        approach = jnp.maximum(jnp.dot(tip_vel, normal), 0.0)
        puck_vel = state.puck_vel + touching * approach * normal
        puck = state.puck + overlap * normal + puck_vel * params.dt
        puck_vel = puck_vel * params.puck_friction

        new_state = PusherState(
            theta=theta,
            theta_dot=theta_dot,
            puck=puck,
            puck_vel=puck_vel,
            goal=state.goal,
            time=state.time + 1,
        )
        d_goal = jnp.linalg.norm(puck - state.goal)
        d_tip = jnp.linalg.norm(tip - puck)
        in_goal = d_goal < params.goal_radius
        # reach + push shaping, with a terminal success bonus: parking the
        # puck on the pad ends the episode at +10 (a crisp, discountable
        # event instead of a drip of in-goal reward)
        reward = (
            -d_goal
            - 0.5 * d_tip
            + 10.0 * in_goal
            - 0.01 * jnp.square(torque).sum()
        )
        done = in_goal | (new_state.time >= params.max_steps_in_episode)
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
                tip,
                state.puck,
                state.puck_vel,
                state.goal,
                state.puck - state.goal,
                tip - state.puck,
            ]
        ).astype(jnp.float32)

    def observation_space(self, params):
        return spaces.Box(-8.0, 8.0, (18,), jnp.float32)

    def action_space(self, params=None):
        return spaces.Box(-1.0, 1.0, (2,), jnp.float32)
