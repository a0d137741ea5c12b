"""FusedBatchNorm — drop-in ``nn.BatchNorm`` with Pallas single-pass stats.

Identical param/batch_stats tree to ``flax.linen.BatchNorm`` (params:
scale/bias; batch_stats: mean/var, biased batch variance in the running
average) so checkpoints and torch importers are unaffected. Training mode
routes the statistics and the backward reductions through the Pallas
kernels in ``ops/pallas/bn_kernels.py`` (one bf16 read per reduction pair
instead of XLA's separate convert+reduce passes — see docs/DESIGN.md §5);
eval mode is a plain fused elementwise normalize.

The Pallas path engages only on real TPU executions: during module
initialization (and anywhere XLA must lower for CPU) the plain jnp
formulation is used, and off-TPU the kernels run in interpreter mode, so
CPU tests exercise the same arithmetic.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from skinjax.ops.pallas.bn_kernels import batch_norm_train


class FusedBatchNorm(nn.Module):
    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))
        dtype = self.dtype or x.dtype
        x = x.astype(dtype)

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
            rstd = jax.lax.rsqrt(var + self.epsilon)
            mul = (rstd * scale).astype(dtype)
            add = (bias - mean * rstd * scale).astype(dtype)
            return x * mul + add

        if self.is_initializing():
            # shape-only pass: plain jnp stats keep the init program
            # lowerable on any backend
            n = x.size // C
            xf = x.astype(jnp.float32).reshape(n, C)
            mean = xf.mean(axis=0)
            var = jnp.maximum((xf * xf).mean(axis=0) - mean * mean, 0.0)
            rstd = jax.lax.rsqrt(var + self.epsilon)
            y = ((xf - mean) * rstd * scale + bias).astype(dtype)
            return y.reshape(x.shape)

        y, mean, var = batch_norm_train(x, scale, bias, self.epsilon)
        ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
        ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        return y
