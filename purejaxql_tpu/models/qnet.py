"""Normalization-aware MLP Q-network.

Semantics match the reference QNetwork (/root/reference/purejaxql/
pqn_gymnax.py:29-58): Dense -> norm -> relu stacks with a NORM_TYPE switch
(layer_norm | batch_norm | none), and a BatchNorm over the input that is
*always instantiated* (as a dummy when norm_input=False) so the param tree
is identical across configs.

TPU notes: the trunk is pure Dense matmuls — XLA tiles them onto the MXU and
fuses the norm/relu elementwise epilogue. `norm_axis_name` threads a mesh
axis into BatchNorm so running statistics are computed over the *global*
sharded batch (cross-replica psum-mean), which the reference never needed
single-device but is required for equal learning dynamics under env sharding
(SURVEY.md §7 hard parts).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn


class QNetwork(nn.Module):
    action_dim: int
    hidden_size: int = 128
    num_layers: int = 2
    norm_type: str = "layer_norm"
    norm_input: bool = False
    # The craftax-family scripts use BatchRenorm (not BatchNorm) for the
    # input norm and its dummy (pqn_craftax.py:41-46); the flax module path
    # differs, so this must match per family for bitwise init parity.
    input_norm_type: str = "batch_norm"
    norm_axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool):
        if self.input_norm_type == "batch_renorm":
            from purejaxql_tpu.models.batch_renorm import BatchRenorm

            input_norm = BatchRenorm(
                use_running_average=not train, axis_name=self.norm_axis_name
            )
        else:
            input_norm = nn.BatchNorm(
                use_running_average=not train, axis_name=self.norm_axis_name
            )
        if self.norm_input:
            x = input_norm(x)
        else:
            # Instantiate unused so the param tree is config-independent.
            _ = input_norm(x)

        # Mixed precision (BF16_COMPUTE): the input norm above runs in f32
        # (running statistics must not quantize); the trunk casts once here
        # and stays bf16 end-to-end — Dense GEMMs hit the MXU at bf16 rate
        # and LayerNorm keeps the tensor in bf16 (flax computes the norm
        # statistics in f32 internally either way). Params stay f32 master
        # weights (flax param_dtype default), so the optimizer sees full
        # precision. For dtype=f32 this whole block is the identity and
        # the traced program is unchanged (bitwise parity path).
        x = x.astype(self.dtype)
        ln_dtype = None if self.dtype == jnp.float32 else self.dtype

        if self.norm_type == "layer_norm":
            normalize = lambda h: nn.LayerNorm(dtype=ln_dtype)(h)
        elif self.norm_type == "batch_norm":
            normalize = lambda h: nn.BatchNorm(
                use_running_average=not train,
                axis_name=self.norm_axis_name,
                dtype=ln_dtype,
            )(h)
        elif self.norm_type == "batch_renorm":
            from purejaxql_tpu.models.batch_renorm import BatchRenorm

            # BatchRenorm (custom module) computes in f32; under
            # BF16_COMPUTE this branch pays the per-layer cast bounce the
            # LayerNorm/BatchNorm branches avoid — acceptable: the
            # batch_renorm trunks (craftax family) ship layer_norm
            # NORM_TYPE, renorm appears only as the input norm
            normalize = lambda h: BatchRenorm(
                use_running_average=not train, axis_name=self.norm_axis_name
            )(h)
        else:
            normalize = lambda h: h

        for _ in range(self.num_layers):
            x = nn.Dense(self.hidden_size, dtype=self.dtype)(x)
            x = normalize(x)
            x = nn.relu(x)

        q = nn.Dense(self.action_dim, dtype=self.dtype)(x)
        return q.astype(jnp.float32)
