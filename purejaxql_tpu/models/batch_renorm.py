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
            # Fast-variance form E[x^2] - E[x]^2, exactly like flax's
            # _compute_stats(use_fast_variance=True) which the reference's
            # BatchRenorm calls (utils/batch_renorm.py:85-91) — the two-pass
            # jnp.var differs in the last ulp and breaks bitwise parity.
            # It also makes cross-replica stats exact: pmean of the two
            # moments over the mesh axis IS the global-batch statistic.
            batch_mean = jnp.mean(x, axis=reduction_axes)
            mean2 = jnp.mean(jax.lax.square(x), axis=reduction_axes)
            if self.axis_name is not None and not self.is_initializing():
                batch_mean = jax.lax.pmean(batch_mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
            # clamp: roundoff can make the fast variance negative, which
            # would NaN the sqrt in the renorm d-shift (flax does the same)
            batch_var = jnp.maximum(0.0, mean2 - jax.lax.square(batch_mean))

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

        # flax _normalize arithmetic order (scale folded into the rsqrt
        # multiplier BEFORE the product with y) for bitwise parity.
        y = x - mean
        mul = jax.lax.rsqrt(var + self.epsilon)
        if self.use_scale:
            mul = mul * self.param("scale", nn.initializers.ones, (features,))
        y = y * mul
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (features,))
        return y
