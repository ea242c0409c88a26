"""Deterministic actor + Q-critic ensemble for continuous-control PQN.

Semantics match the reference playground models
(/root/reference/purejaxql/pqn_mujoco_playground.py:25-105): orthogonal
init, norm-type switch with the dummy-input-BatchNorm convention, tanh
actor head scaled/biased into the action box, critic over concat(obs,
action) -> scalar. The critic ensemble is N independently-initialized
parameter sets applied via vmap (pqn_mujoco_playground.py:242-289).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn


def _normalizer(norm_type: str, train: bool, axis_name: Optional[str]):
    if norm_type == "layer_norm":
        return lambda h: nn.LayerNorm(epsilon=1e-6)(h)
    if norm_type == "batch_norm":
        return lambda h: nn.BatchNorm(
            use_running_average=not train, epsilon=1e-5, axis_name=axis_name
        )(h)
    return lambda h: h


class Actor(nn.Module):
    action_dim: int
    action_scale: jnp.ndarray
    action_bias: jnp.ndarray
    hidden_sizes: Sequence[int]
    activation: str = "relu"
    norm_type: str = "layer_norm"
    norm_input: bool = False
    init_scale: float = 1.0
    norm_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        activation = nn.relu if self.activation == "relu" else nn.tanh
        input_norm = nn.BatchNorm(
            use_running_average=not train, epsilon=1e-5,
            axis_name=self.norm_axis_name,
        )
        if self.norm_input:
            x = input_norm(x)
        else:
            _ = input_norm(x)
        normalize = _normalizer(self.norm_type, train, self.norm_axis_name)

        for hs in self.hidden_sizes:
            x = nn.Dense(
                hs, kernel_init=nn.initializers.orthogonal(self.init_scale)
            )(x)
            x = normalize(x)
            x = activation(x)

        x = nn.Dense(
            self.action_dim,
            kernel_init=nn.initializers.orthogonal(self.init_scale),
        )(x)
        x = nn.tanh(x)
        return x * self.action_scale + self.action_bias


class Critic(nn.Module):
    hidden_sizes: Sequence[int]
    norm_type: str = "layer_norm"
    norm_input: bool = False
    init_scale: float = 1.0
    norm_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, action, train: bool = False):
        x = jnp.concatenate([x, action], axis=-1)
        input_norm = nn.BatchNorm(
            use_running_average=not train, epsilon=1e-5,
            axis_name=self.norm_axis_name,
        )
        if self.norm_input:
            x = input_norm(x)
        else:
            _ = input_norm(x)
        normalize = _normalizer(self.norm_type, train, self.norm_axis_name)

        for hs in self.hidden_sizes:
            x = nn.Dense(
                hs, kernel_init=nn.initializers.orthogonal(self.init_scale)
            )(x)
            x = normalize(x)
            x = nn.relu(x)

        x = nn.Dense(
            1, kernel_init=nn.initializers.orthogonal(self.init_scale)
        )(x)
        return jnp.squeeze(x, axis=-1)
