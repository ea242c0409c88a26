"""Convolutional Q-networks: MinAtar single-conv CNN and the Nature-DQN CNN.

Semantics match the reference models (/root/reference/purejaxql/
pqn_minatar.py:24-69 and pqn_atari.py:27-97): conv -> norm -> relu stacks
with he_normal init, a dense trunk, and the always-instantiated input
BatchNorm / divide-by-255 convention for byte observations.

TPU notes: convolutions lower to MXU contractions; the flatten + Dense(128)
is the dominant matmul. Channels-last (NHWC) layout is kept throughout —
the native XLA:TPU conv layout. An optional compute dtype lets the trunk run
in bfloat16 while Q-values come back in float32.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn


def _make_normalizer(
    norm_type: str,
    train: bool,
    axis_name: Optional[str],
    dtype: Optional[jnp.dtype] = None,
):
    # Mixed precision: keep the tensor in the trunk compute dtype through
    # the norm layers (flax computes norm STATISTICS in f32 internally
    # regardless) — without this every conv/dense output bounces
    # bf16 -> f32 -> bf16 around each norm, which is why the first
    # BF16_COMPUTE attempt measured SLOWER than f32 on MinAtar. For f32
    # (dtype None) the traced program is unchanged.
    ln_dtype = None if dtype in (None, jnp.float32) else dtype
    if norm_type == "layer_norm":
        return lambda h: nn.LayerNorm(dtype=ln_dtype)(h)
    if norm_type == "batch_norm":
        return lambda h: nn.BatchNorm(
            use_running_average=not train, axis_name=axis_name, dtype=ln_dtype
        )(h)
    if norm_type == "batch_renorm":
        from purejaxql_tpu.models.batch_renorm import BatchRenorm

        return lambda h: BatchRenorm(
            use_running_average=not train, axis_name=axis_name
        )(h)
    return lambda h: h


class MinAtarCNN(nn.Module):
    """One 3x3 VALID conv (16ch) + Dense(128) trunk (pqn_minatar.py:24-51)."""

    norm_type: str = "layer_norm"
    norm_axis_name: Optional[str] = None
    hidden_size: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool):
        normalize = _make_normalizer(
            self.norm_type, train, self.norm_axis_name, self.dtype
        )
        x = nn.Conv(
            16,
            kernel_size=(3, 3),
            strides=1,
            padding="VALID",
            kernel_init=nn.initializers.he_normal(),
            dtype=self.dtype,
        )(x)
        x = normalize(x)
        x = nn.relu(x)
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(self.hidden_size, kernel_init=nn.initializers.he_normal(),
                     dtype=self.dtype)(x)
        x = normalize(x)
        x = nn.relu(x)
        return x


class NatureCNN(nn.Module):
    """Three-conv Nature-DQN trunk + Dense(512) (pqn_atari.py:27-70)."""

    norm_type: str = "layer_norm"
    norm_axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool):
        normalize = _make_normalizer(
            self.norm_type, train, self.norm_axis_name, self.dtype
        )
        for features, kernel, stride in ((32, 8, 4), (64, 4, 2), (64, 3, 1)):
            x = nn.Conv(
                features,
                kernel_size=(kernel, kernel),
                strides=(stride, stride),
                padding="VALID",
                kernel_init=nn.initializers.he_normal(),
                dtype=self.dtype,
            )(x)
            x = normalize(x)
            x = nn.relu(x)
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(512, kernel_init=nn.initializers.he_normal(), dtype=self.dtype)(x)
        x = normalize(x)
        x = nn.relu(x)
        return x


class CNNQNetwork(nn.Module):
    """Q-head over a CNN trunk with the input-norm convention of the
    reference (pqn_minatar.py:54-69): BatchNorm over input when norm_input,
    else a dummy BatchNorm (identical param trees) and x/255 byte scaling.
    """

    action_dim: int
    norm_type: str = "layer_norm"
    norm_input: bool = False
    norm_axis_name: Optional[str] = None
    trunk: str = "minatar"  # "minatar" | "nature"
    hidden_size: int = 128
    input_scale: float = 255.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool):
        # input norm runs in f32 (running statistics must not quantize);
        # the trunk casts once below and stays in the compute dtype
        input_norm = nn.BatchNorm(
            use_running_average=not train, axis_name=self.norm_axis_name
        )
        if self.norm_input:
            x = input_norm(x)
        else:
            _ = input_norm(x)
            x = x / self.input_scale
        x = x.astype(self.dtype)
        # name="CNN_0": flax folds the module path into every param's init
        # key, and the reference's trunk class is named `CNN` in both the
        # minatar and atari scripts (pqn_minatar.py:24, pqn_atari.py:27) —
        # matching the auto-generated path keeps init bitwise-identical.
        if self.trunk == "nature":
            x = NatureCNN(
                norm_type=self.norm_type,
                norm_axis_name=self.norm_axis_name,
                dtype=self.dtype,
                name="CNN_0",
            )(x, train)
        else:
            x = MinAtarCNN(
                norm_type=self.norm_type,
                norm_axis_name=self.norm_axis_name,
                hidden_size=self.hidden_size,
                dtype=self.dtype,
                name="CNN_0",
            )(x, train)
        q = nn.Dense(self.action_dim, dtype=self.dtype)(x)
        return q.astype(jnp.float32)
