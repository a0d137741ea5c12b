"""FusedBatchNorm (Pallas single-pass stats) parity vs flax nn.BatchNorm:
forward values, gradients (x/scale/bias), and running-stat updates, in both
train and eval modes. Off-TPU the kernels run in interpreter mode, so this
exercises the exact kernel arithmetic."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from flax import linen as nn

from skinjax.ops.fused_bn import FusedBatchNorm
from skinjax.ops.pallas.bn_kernels import bn_grad_stats, bn_stats


def test_bn_stats_kernels_match_numpy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(64, 24)).astype(np.float32) * 3 + 1
    dy = rng.normal(size=(64, 24)).astype(np.float32)
    s, q = bn_stats(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(s), x.sum(0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(q), (x * x).sum(0), rtol=1e-5)
    sdy, sdyx = bn_grad_stats(jnp.asarray(x), jnp.asarray(dy))
    np.testing.assert_allclose(np.asarray(sdy), dy.sum(0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sdyx), (dy * x).sum(0), rtol=1e-5)


@pytest.mark.parametrize("train", [True, False])
def test_fused_bn_matches_flax(train):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(8, 6, 6, 16)).astype(np.float32) * 2 + 0.5

    ref = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                       epsilon=1e-5)
    fused = FusedBatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5)
    vref = ref.init(jax.random.key(0), jnp.asarray(x))
    # perturb params + running stats so the comparison is nontrivial
    scale = rng.normal(size=16).astype(np.float32) + 1.5
    bias = rng.normal(size=16).astype(np.float32)
    mean = rng.normal(size=16).astype(np.float32)
    var = (rng.random(16).astype(np.float32) + 0.5)
    variables = {
        "params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
        "batch_stats": {"mean": jnp.asarray(mean), "var": jnp.asarray(var)},
    }
    if train:
        yr, mr = ref.apply(variables, jnp.asarray(x), mutable=["batch_stats"])
        yf, mf = fused.apply(variables, jnp.asarray(x),
                             mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(yf), np.asarray(yr),
                                   atol=2e-4, rtol=2e-4)
        for k in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(mf["batch_stats"][k]),
                np.asarray(mr["batch_stats"][k]), atol=1e-4, rtol=1e-4,
            )
    else:
        yr = ref.apply(variables, jnp.asarray(x))
        yf = fused.apply(variables, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(yf), np.asarray(yr),
                                   atol=2e-4, rtol=2e-4)


def test_fused_bn_gradients_match_flax():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(4, 5, 5, 8)).astype(np.float32) * 1.7

    def make_loss(mod):
        def loss(params, xx):
            variables = {"params": params,
                         "batch_stats": {"mean": jnp.zeros(8),
                                         "var": jnp.ones(8)}}
            y, _ = mod.apply(variables, xx, mutable=["batch_stats"])
            return jnp.sum(y * jnp.sin(y))  # nonlinear so dy varies
        return loss

    ref = nn.BatchNorm(use_running_average=False)
    fused = FusedBatchNorm(use_running_average=False)
    params = {
        "scale": jnp.asarray(rng.normal(size=8).astype(np.float32) + 1.2),
        "bias": jnp.asarray(rng.normal(size=8).astype(np.float32)),
    }
    gr = jax.grad(make_loss(ref), argnums=(0, 1))(params, jnp.asarray(x))
    gf = jax.grad(make_loss(fused), argnums=(0, 1))(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(gf[0]["scale"]),
                               np.asarray(gr[0]["scale"]), atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gf[0]["bias"]),
                               np.asarray(gr[0]["bias"]), atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gr[1]),
                               atol=1e-3, rtol=1e-3)


def test_fused_bn_bf16_path():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, 8, 8, 32)).astype(np.float32))
    mod = FusedBatchNorm(use_running_average=False, dtype=jnp.bfloat16)
    variables = mod.init(jax.random.key(0), x)
    y, _ = mod.apply(variables, x.astype(jnp.bfloat16),
                     mutable=["batch_stats"])
    assert y.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(y, np.float32)).all()
