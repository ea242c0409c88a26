"""SwimmerSwimmer6-v0: 6-link low-Reynolds planar swimmer.

The dm-suite swimmer-class task from the reference's playground family
(/root/reference/scripts/train_playground_all.sh dm-suite block:
SwimmerSwimmer6). Honest low-Reynolds-number swimming via resistive-force
theory: each link feels anisotropic viscous drag (normal drag > tangential
drag), inertia is negligible, and the rigid-body motion of the chain is
whatever makes the NET drag force and torque vanish — a 3x3 linear solve
for (vx, vy, omega) per substep given the commanded joint-angle rates.
This is the standard kinematic reduction for Purcell-type swimmers; it is
what makes undulation produce net locomotion while reciprocal flapping
produces none (the scallop theorem), the physics the dm_control swimmer
exists to exercise.

Task: swim the nose to a target sampled per episode. Dense proximity
reward, 500-step episodes, no early termination.

Observation (10): target direction in the nose frame (2), joint angles
(5), nose-frame body velocity (2), body angular velocity (1). Action (5)
in [-1, 1]: joint-angle rates for the 5 joints.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from purejaxql_tpu.envs import spaces
from purejaxql_tpu.envs.base import Environment

_N_LINKS = 6
_N_JOINTS = _N_LINKS - 1


@struct.dataclass
class SwimmerState:
    nose: jax.Array      # (2,) head endpoint position
    theta: jax.Array     # () absolute angle of the first link
    phi: jax.Array       # (5,) joint angles
    body_vel: jax.Array  # (3,) last solved (vx, vy, omega), world frame
    target: jax.Array    # (2,)
    time: jax.Array


@struct.dataclass
class SwimmerParams:
    dt: float = 0.03
    n_substeps: int = struct.field(pytree_node=False, default=2)
    link_length: float = 0.1
    drag_tangent: float = 1.0
    drag_normal: float = 10.0       # anisotropy ratio ~10, slender-body RFT
    joint_rate: float = 4.0         # rad/s at |action| = 1
    joint_limit: float = 1.7        # |phi| clip, ~dm swimmer joint range
    target_radius: float = 0.1
    reward_margin: float = 1.2      # dense reward ramps over this distance
    max_steps_in_episode: int = struct.field(pytree_node=False, default=500)


def _body_solve(theta, phi, phidot, params):
    """Solve the quasi-static force/torque balance for (vx, vy, omega).

    Link i has absolute angle alpha_i = theta + cumsum(phi)[:i]; its center
    velocity is affine in the unknown nose velocity v and body rate omega:
        c_dot_i = v + omega * A_i + B_i
    with A_i the moment arms of the chain and B_i the known shape-change
    contribution from phidot. RFT drag on link i is F_i = -D_i c_dot_i with
    D_i = l (c_t t t^T + c_n n n^T). Sum of forces = 0 and sum of torques
    about the nose = 0 give a 3x3 system M z = b for z = (vx, vy, omega).
    """
    l = params.link_length
    alpha = theta + jnp.concatenate([jnp.zeros(1), jnp.cumsum(phi)])
    # per-link angular rates relative to the body: g_i = sum_{j<=i} phidot_j
    g = jnp.concatenate([jnp.zeros(1), jnp.cumsum(phidot)])
    t_hat = jnp.stack([jnp.cos(alpha), jnp.sin(alpha)], axis=-1)   # (6, 2)
    n_hat = jnp.stack([-jnp.sin(alpha), jnp.cos(alpha)], axis=-1)  # (6, 2)

    # chain geometry relative to the nose: link i center at
    # r_i = sum_{j<i} l t_j + (l/2) t_i
    pref = jnp.concatenate(
        [jnp.zeros((1, 2)), jnp.cumsum(l * t_hat, axis=0)[:-1]], axis=0
    )
    r = pref + 0.5 * l * t_hat                                     # (6, 2)
    # d r_i / d theta with the shape frozen: rotate every arm 90 degrees
    pref_n = jnp.concatenate(
        [jnp.zeros((1, 2)), jnp.cumsum(l * n_hat, axis=0)[:-1]], axis=0
    )
    A = pref_n + 0.5 * l * n_hat                                   # (6, 2)
    # shape-change velocity of each center (omega and v excluded)
    contrib = l * n_hat * g[:, None]                               # (6, 2)
    pref_b = jnp.concatenate(
        [jnp.zeros((1, 2)), jnp.cumsum(contrib, axis=0)[:-1]], axis=0
    )
    B = pref_b + 0.5 * l * n_hat * g[:, None]                      # (6, 2)

    # drag matrices D_i = l (c_t t t^T + c_n n n^T), shape (6, 2, 2)
    D = l * (
        params.drag_tangent * t_hat[:, :, None] * t_hat[:, None, :]
        + params.drag_normal * n_hat[:, :, None] * n_hat[:, None, :]
    )
    DA = jnp.einsum("ijk,ik->ij", D, A)                            # (6, 2)
    DB = jnp.einsum("ijk,ik->ij", D, B)                            # (6, 2)
    r_perp = jnp.stack([-r[:, 1], r[:, 0]], axis=-1)               # (6, 2)
    # rotational drag of each link about its own center
    c_rot = params.drag_normal * l**3 / 12.0

    M = jnp.zeros((3, 3))
    M = M.at[:2, :2].set(jnp.sum(D, axis=0))
    M = M.at[:2, 2].set(jnp.sum(DA, axis=0))
    M = M.at[2, :2].set(jnp.einsum("ij,ijk->k", r_perp, D))
    M = M.at[2, 2].set(
        jnp.sum(jnp.einsum("ij,ij->i", r_perp, DA)) + _N_LINKS * c_rot
    )
    b = jnp.concatenate(
        [
            -jnp.sum(DB, axis=0),
            (
                -jnp.sum(jnp.einsum("ij,ij->i", r_perp, DB))
                - c_rot * jnp.sum(g)
            )[None],
        ]
    )
    return jnp.linalg.solve(M, b)  # (vx, vy, omega)


class Swimmer(Environment):
    @property
    def default_params(self) -> SwimmerParams:
        return SwimmerParams()

    @property
    def name(self) -> str:
        return "SwimmerSwimmer6-v0"

    def reset_env(self, key, params):
        k1, k2, k3 = jax.random.split(key, 3)
        dist = jax.random.uniform(k1, (), minval=0.4, maxval=0.8)
        ang = jax.random.uniform(k2, (), minval=-jnp.pi, maxval=jnp.pi)
        target = dist * jnp.stack([jnp.cos(ang), jnp.sin(ang)])
        phi = jax.random.uniform(
            k3, (_N_JOINTS,), minval=-0.3, maxval=0.3
        )
        state = SwimmerState(
            nose=jnp.zeros(2),
            theta=jnp.asarray(0.0),
            phi=phi,
            body_vel=jnp.zeros(3),
            target=target,
            time=jnp.asarray(0, jnp.int32),
        )
        return self.get_obs(state, params), state

    def step_env(self, key, state, action, params):
        rate = (
            jnp.clip(jnp.asarray(action).reshape(_N_JOINTS), -1.0, 1.0)
            * params.joint_rate
        )
        h = params.dt / params.n_substeps

        def substep(carry, _):
            nose, theta, phi = carry
            # joint limits: zero the commanded rate where it pushes past
            at_limit = (
                (phi >= params.joint_limit) & (rate > 0)
            ) | ((phi <= -params.joint_limit) & (rate < 0))
            phidot = jnp.where(at_limit, 0.0, rate)
            # midpoint rule: the body velocity is a geometric connection
            # (rate-independent in phidot), so evaluating it mid-stroke makes
            # retraced shape paths cancel to O(h^2) — without this, Euler
            # drift would visibly violate the scallop theorem per cycle.
            z1 = _body_solve(theta, phi, phidot, params)
            z = _body_solve(
                theta + 0.5 * h * z1[2], phi + 0.5 * h * phidot, phidot, params
            )
            nose = nose + z[:2] * h
            theta = theta + z[2] * h
            phi = jnp.clip(
                phi + phidot * h, -params.joint_limit, params.joint_limit
            )
            return (nose, theta, phi), z

        (nose, theta, phi), zs = jax.lax.scan(
            substep,
            (state.nose, state.theta, state.phi),
            None,
            length=params.n_substeps,
        )
        new_state = SwimmerState(
            nose=nose,
            theta=theta,
            phi=phi,
            body_vel=zs[-1],
            target=state.target,
            time=state.time + 1,
        )
        dist = jnp.linalg.norm(nose - state.target)
        # dense: 1 inside the target, ramping to 0 over reward_margin
        reward = jnp.clip(
            1.0 - (dist - params.target_radius) / params.reward_margin,
            0.0,
            1.0,
        )
        done = new_state.time >= params.max_steps_in_episode
        return (
            jax.lax.stop_gradient(self.get_obs(new_state, params)),
            jax.lax.stop_gradient(new_state),
            jnp.asarray(reward, jnp.float32),
            done,
            {},
        )

    def get_obs(self, state, params=None) -> jax.Array:
        # rotate world vectors into the nose (first-link) frame
        c, s = jnp.cos(state.theta), jnp.sin(state.theta)
        rot = jnp.array([[c, s], [-s, c]])
        to_target = rot @ (state.target - state.nose)
        v_body = rot @ state.body_vel[:2]
        return jnp.concatenate(
            [to_target, state.phi, v_body, state.body_vel[2:]]
        ).astype(jnp.float32)

    def observation_space(self, params):
        return spaces.Box(-np.inf, np.inf, (2 + _N_JOINTS + 3,), np.float32)

    def action_space(self, params=None):
        return spaces.Box(-1.0, 1.0, (_N_JOINTS,), np.float32)
