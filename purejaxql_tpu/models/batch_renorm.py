"""Batch Renormalization (Ioffe, arXiv 1702.03275) as a flax module.

The stabilizer the reference's craftax scripts use in place of BatchNorm
(/root/reference/purejaxql/utils/batch_renorm.py:19-131): batch statistics
are corrected toward the running statistics with clipped factors

    r = clip(sigma_batch / sigma_run, 1/r_max, r_max)     (stop-grad)
    d = clip((mu_batch - mu_run) / sigma_run, -d_max, d_max)

which decouples train-time normalization from the batch composition once
running stats are trustworthy. For the first `warmup_steps` updates it
behaves exactly like BatchNorm while the running stats build up; the step
counter, r_max and d_max live in the `batch_stats` collection so the whole
schedule is carried through the fused training scan on-device.

`axis_name` makes the batch statistics cross-replica (pmean over the mesh
axis) under shard_map — required for shard-count-independent learning
dynamics when envs are sharded (SURVEY.md §7 hard parts).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


class BatchRenorm(nn.Module):
    use_running_average: Optional[bool] = None
    momentum: float = 0.999
    epsilon: float = 0.001
    use_bias: bool = True
    use_scale: bool = True
    r_max: float = 3.0
    d_max: float = 5.0
    warmup_steps: int = 1000
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        use_running_average = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        features = x.shape[-1]
        reduction_axes = tuple(range(x.ndim - 1))

        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(features, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(features, jnp.float32)
        )
        # r_max / d_max ride in batch_stats (not just module attrs) so the
        # batch_stats tree is layout-compatible with reference checkpoints
        # (utils/batch_renorm.py:59-76 stores r_max=3, d_max=5, steps=0).
        r_max = self.variable(
            "batch_stats", "r_max", lambda: jnp.float32(self.r_max)
        )
        d_max = self.variable(
            "batch_stats", "d_max", lambda: jnp.float32(self.d_max)
        )
        steps = self.variable(
            "batch_stats", "steps", lambda: jnp.zeros((), jnp.int32)
        )

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            batch_mean = jnp.mean(x, axis=reduction_axes)
            batch_var = jnp.var(x, axis=reduction_axes)
            if self.axis_name is not None and not self.is_initializing():
                # cross-replica statistics over the sharded batch
                batch_mean = jax.lax.pmean(batch_mean, self.axis_name)
                mean_of_sq = jax.lax.pmean(
                    batch_var + batch_mean_local_sq(x, reduction_axes),
                    self.axis_name,
                )
                batch_var = mean_of_sq - jnp.square(batch_mean)

            mean, var = batch_mean, batch_var
            if not self.is_initializing():
                std = jnp.sqrt(batch_var + self.epsilon)
                ra_std = jnp.sqrt(ra_var.value + self.epsilon)
                r = jax.lax.stop_gradient(
                    jnp.clip(std / ra_std, 1.0 / r_max.value, r_max.value)
                )
                d = jax.lax.stop_gradient(
                    jnp.clip(
                        (batch_mean - ra_mean.value) / ra_std,
                        -d_max.value,
                        d_max.value,
                    )
                )
                # renorm-corrected statistics (equivalent reformulation:
                # normalizing by (var/r^2, mean - d*std/r) applies x*r + d).
                # The d-shift uses sqrt(var) WITHOUT epsilon, exactly like the
                # reference (utils/batch_renorm.py:104 `jnp.sqrt(custom_var)`),
                # keeping BatchRenorm configs bitwise-parity eligible.
                tmp_var = batch_var / (r**2)
                tmp_mean = batch_mean - d * jnp.sqrt(batch_var) / r

                warmed_up = (steps.value >= self.warmup_steps).astype(jnp.float32)
                var = warmed_up * tmp_var + (1.0 - warmed_up) * var
                mean = warmed_up * tmp_mean + (1.0 - warmed_up) * mean

                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * batch_mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * batch_var
                )
                steps.value = steps.value + 1

        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.use_scale:
            y = y * self.param("scale", nn.initializers.ones, (features,))
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (features,))
        return y


def batch_mean_local_sq(x, reduction_axes):
    return jnp.square(jnp.mean(x, axis=reduction_axes))
