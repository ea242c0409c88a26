"""FishSwim: a tail-propelled swimmer steering to a random target.

The dm-suite FishSwim row of the reference's playground block
(/root/reference/scripts/train_playground_all.sh:19), on this package's
own resistive-force hydrodynamics (the same low-Reynolds drag model the
6-link swimmer uses, swimmer.py): a rigid body with heading carries an
actuated tail; lateral tail motion pushes against anisotropic water drag,
producing forward thrust and yaw moments, and two pectoral-fin channels
give fine thrust/turn authority. Planar adaptation of the dm_control
fish (the upright/roll DOFs have no analogue without a 3D body).

Action (3, in [-1, 1]): tail servo target, left fin, right fin.
Reward: exponential distance-to-target shaping + an in-target bonus;
the target resamples every reset.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from purejaxql_tpu.envs import spaces
from purejaxql_tpu.envs.base import Environment


@struct.dataclass
class FishState:
    x: jax.Array
    y: jax.Array
    heading: jax.Array
    vx: jax.Array
    vy: jax.Array
    omega: jax.Array
    tail: jax.Array       # tail joint angle (body frame)
    tail_vel: jax.Array
    target: jax.Array     # (2,)
    time: jax.Array


@struct.dataclass
class FishParams:
    mass: float = 1.0
    inertia: float = 0.05
    body_len: float = 0.4
    tail_len: float = 0.25
    drag_par: float = 0.3      # drag along the body axis
    drag_perp: float = 6.0     # drag across it (anisotropy drives thrust)
    drag_rot: float = 0.08
    tail_drag: float = 4.0
    tail_rate: float = 14.0
    max_tail: float = 1.0
    fin_force: float = 0.3
    arena: float = 2.0
    target_radius: float = 0.12
    dt: float = 0.005
    substeps: int = struct.field(pytree_node=False, default=8)
    max_steps_in_episode: int = struct.field(pytree_node=False, default=1000)


class Fish(Environment):
    @property
    def default_params(self) -> FishParams:
        return FishParams()

    @property
    def name(self) -> str:
        return "FishSwim-v0"

    def reset_env(self, key, params):
        k1, k2, k3 = jax.random.split(key, 3)
        pos = jax.random.uniform(k1, (2,), minval=-0.5, maxval=0.5)
        heading = jax.random.uniform(k2, (), minval=-jnp.pi, maxval=jnp.pi)
        target = jax.random.uniform(
            k3, (2,), minval=-0.8 * params.arena, maxval=0.8 * params.arena
        )
        state = FishState(
            x=pos[0], y=pos[1], heading=heading,
            vx=jnp.asarray(0.0), vy=jnp.asarray(0.0),
            omega=jnp.asarray(0.0),
            tail=jnp.asarray(0.0), tail_vel=jnp.asarray(0.0),
            target=target,
            time=jnp.asarray(0, jnp.int32),
        )
        return self.get_obs(state, params), state

    def _substep(self, s: FishState, action, params):
        ch, sh = jnp.cos(s.heading), jnp.sin(s.heading)
        fwd = jnp.array([ch, sh])
        left = jnp.array([-sh, ch])

        # tail servo toward commanded angle (rate-limited)
        tail_cmd = params.max_tail * action[0]
        tail_vel = jnp.clip(
            (tail_cmd - s.tail) * params.tail_rate,
            -params.tail_rate, params.tail_rate,
        )
        tail = s.tail + tail_vel * params.dt

        # tail midpoint kinematics: lateral sweep velocity in world frame.
        # Tail extends backward at body-frame angle `tail`; its midpoint
        # moves with the body plus the joint sweep.
        tail_ang = s.heading + jnp.pi + tail
        t_dir = jnp.array([jnp.cos(tail_ang), jnp.sin(tail_ang)])
        t_norm = jnp.array([-t_dir[1], t_dir[0]])
        arm = 0.5 * params.tail_len
        v_tail = (
            jnp.array([s.vx, s.vy])
            + (s.omega + tail_vel) * arm * t_norm
        )
        # resistive force normal to the tail segment
        vn = jnp.dot(v_tail, t_norm)
        f_tail = -params.tail_drag * vn * t_norm
        # applied at the tail midpoint, offset behind the body center
        r_tail = (0.5 * params.body_len) * (-fwd) + arm * t_dir
        tau_tail = r_tail[0] * f_tail[1] - r_tail[1] * f_tail[0]

        # pectoral fins: small forward thrust per side, differential = yaw
        fl = params.fin_force * jnp.maximum(action[1], 0.0)
        fr = params.fin_force * jnp.maximum(action[2], 0.0)
        f_fins = (fl + fr) * fwd
        tau_fins = 0.15 * params.body_len * (fr - fl)

        # anisotropic body drag
        v = jnp.array([s.vx, s.vy])
        v_par = jnp.dot(v, fwd)
        v_perp = jnp.dot(v, left)
        f_drag = -(
            params.drag_par * v_par * fwd + params.drag_perp * v_perp * left
        )

        f = f_tail + f_fins + f_drag
        tau = tau_tail + tau_fins - params.drag_rot * s.omega

        vx = s.vx + f[0] / params.mass * params.dt
        vy = s.vy + f[1] / params.mass * params.dt
        omega = s.omega + tau / params.inertia * params.dt
        x = jnp.clip(s.x + vx * params.dt, -params.arena, params.arena)
        y = jnp.clip(s.y + vy * params.dt, -params.arena, params.arena)
        heading = s.heading + omega * params.dt
        return s.replace(
            x=x, y=y, heading=heading, vx=vx, vy=vy, omega=omega,
            tail=tail, tail_vel=tail_vel,
        )

    def step_env(self, key, state, action, params):
        action = jnp.clip(action, -1.0, 1.0)
        s = jax.lax.scan(
            lambda c, _: (self._substep(c, action, params), None),
            state,
            None,
            length=params.substeps,
        )[0]
        s = s.replace(time=state.time + 1)

        dist = jnp.linalg.norm(jnp.array([s.x, s.y]) - s.target)
        inside = dist < params.target_radius
        reward = (
            jnp.exp(-dist / 0.5)
            + jnp.where(inside, 1.0, 0.0)
            - 0.01 * jnp.sum(action**2)
        )
        done = s.time >= params.max_steps_in_episode
        return (
            jax.lax.stop_gradient(self.get_obs(s, params)),
            jax.lax.stop_gradient(s),
            reward.astype(jnp.float32),
            done,
            {},
        )

    def get_obs(self, state, params=None):
        params = params or self.default_params
        s = state
        ch, sh = jnp.cos(s.heading), jnp.sin(s.heading)
        # target in the body frame (what the fish "sees")
        dx = s.target[0] - s.x
        dy = s.target[1] - s.y
        tx = ch * dx + sh * dy
        ty = -sh * dx + ch * dy
        v_par = ch * s.vx + sh * s.vy
        v_perp = -sh * s.vx + ch * s.vy
        return jnp.stack(
            [
                tx, ty, v_par, v_perp, s.omega,
                jnp.sin(s.tail), jnp.cos(s.tail), s.tail_vel / 10.0,
                s.x / params.arena, s.y / params.arena, ch, sh,
            ]
        ).astype(jnp.float32)

    def is_terminal(self, state, params):
        return state.time >= params.max_steps_in_episode

    def observation_space(self, params):
        return spaces.Box(-np.inf, np.inf, (12,), np.float32)

    def action_space(self, params=None):
        return spaces.Box(-1.0, 1.0, (3,), np.float32)
