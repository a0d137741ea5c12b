"""Pipeline parallelism (parallel/pipeline.py) on the 8-device virtual CPU
mesh: the GPipe schedule must reproduce sequential forward AND backward
numerics exactly, compose with data parallelism, and split stage params
across devices."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from skinjax.models.backbones.vit import ViT
from skinjax.parallel import create_mesh
from skinjax.parallel.pipeline import (
    gpipe,
    stack_stage_params,
    vit_pipeline_apply,
)


def _mlp_stage(p, x):
    h = jnp.tanh(x @ p["w1"] + p["b1"])
    return x + h @ p["w2"]


def _make_stages(key, K, d, hid):
    ks = jax.random.split(key, K)
    return [
        {
            "w1": jax.random.normal(k, (d, hid)) * 0.1,
            "b1": jnp.zeros((hid,)),
            "w2": jax.random.normal(jax.random.fold_in(k, 1), (hid, d)) * 0.1,
        }
        for k in ks
    ]


def test_gpipe_matches_sequential_fwd_and_grad():
    K, d, hid, B, M = 8, 16, 32, 16, 4
    mesh = create_mesh(n_data=1, n_model=8)
    stages = _make_stages(jax.random.key(0), K, d, hid)
    stacked = stack_stage_params(stages)
    x = jax.random.normal(jax.random.key(1), (B, 6, d))

    def seq(stages, x):
        for p in stages:
            x = _mlp_stage(p, x)
        return x

    def piped(stacked, x):
        return gpipe(_mlp_stage, stacked, x, mesh=mesh, axis="model",
                     num_microbatches=M)

    y_ref = seq(stages, x)
    y_pp = jax.jit(piped)(stacked, x)
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_ref), atol=1e-5)

    # gradients through the schedule (reverse pipeline via AD) are exact
    def loss_seq(stages, x):
        return jnp.mean(seq(stages, x) ** 2)

    def loss_pp(stacked, x):
        return jnp.mean(piped(stacked, x) ** 2)

    g_ref = jax.grad(loss_seq)(stages, x)
    g_pp = jax.jit(jax.grad(loss_pp))(stacked, x)
    g_ref_stacked = stack_stage_params(g_ref)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref_stacked),
                    jax.tree_util.tree_leaves(jax.device_get(g_pp))):
        # fp32 reduction-order noise only: the schedules sum the same
        # per-microbatch contributions in different orders
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-3,
                                   atol=1e-5)


def test_gpipe_composes_with_data_parallelism():
    """dp2 x pp4: microbatches shard over 'data' while stages shard over
    'model'; numerics still match the sequential loop."""
    K, d, B, M = 4, 12, 16, 4
    mesh = create_mesh(n_data=2, n_model=4)
    stages = _make_stages(jax.random.key(2), K, d, 24)
    stacked = stack_stage_params(stages)
    x = jax.random.normal(jax.random.key(3), (B, 5, d))

    y_ref = x
    for p in stages:
        y_ref = _mlp_stage(p, y_ref)
    y_pp = jax.jit(lambda s, x: gpipe(
        _mlp_stage, s, x, mesh=mesh, axis="model", num_microbatches=M,
        data_axis="data",
    ))(stacked, x)
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_ref), atol=1e-5)


def test_vit_pipeline_matches_module():
    """8-stage pipelined ViT-depth-8 forward == vit.apply, and each device
    holds only its stage's block params (K-way depth split of the params)."""
    vit = ViT(dim=32, depth=8, num_heads=4, patch=8)
    mesh = create_mesh(n_data=1, n_model=8)
    x = jax.random.normal(jax.random.key(0), (8, 32, 32, 3))
    params = vit.init(jax.random.key(1), x)["params"]

    y_ref = vit.apply({"params": params}, x)
    y_pp = jax.jit(lambda p, x: vit_pipeline_apply(
        vit, p, x, mesh=mesh, num_microbatches=4))(params, x)
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_ref),
                               atol=2e-5)


def test_vit_pipeline_grad_matches_module():
    vit = ViT(dim=16, depth=4, num_heads=2, patch=8)
    mesh = create_mesh(n_data=2, n_model=4)
    x = jax.random.normal(jax.random.key(4), (8, 16, 16, 3))
    params = vit.init(jax.random.key(5), x)["params"]

    def loss_ref(p):
        return jnp.sum(vit.apply({"params": p}, x) ** 2)

    def loss_pp(p):
        return jnp.sum(vit_pipeline_apply(
            vit, p, x, mesh=mesh, num_microbatches=4, data_axis="data") ** 2)

    g_ref = jax.grad(loss_ref)(params)
    g_pp = jax.jit(jax.grad(loss_pp))(params)
    for (ka, a), (kb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(g_ref),
               key=lambda t: jax.tree_util.keystr(t[0])),
        sorted(jax.tree_util.tree_leaves_with_path(jax.device_get(g_pp)),
               key=lambda t: jax.tree_util.keystr(t[0])),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=5e-4,
            err_msg=jax.tree_util.keystr(ka))


def test_gpipe_rejects_bad_microbatch():
    mesh = create_mesh(n_data=1, n_model=8)
    stages = _make_stages(jax.random.key(0), 8, 8, 8)
    with pytest.raises(ValueError, match="not divisible"):
        gpipe(_mlp_stage, stack_stage_params(stages),
              jnp.zeros((10, 2, 8)), mesh=mesh, num_microbatches=4)
