"""ViT(scan_blocks=True): identical math to the loop layout after
stack_block_params, and a trace-time reduction (the compile-time lever for
deep encoders, docs/DESIGN.md compile-time table)."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from skinjax.models.backbones.vit import ViT, stack_block_params


def test_scan_matches_loop():
    depth = 4
    loop = ViT(dim=64, depth=depth, num_heads=4, patch=8)
    scan = ViT(dim=64, depth=depth, num_heads=4, patch=8, scan_blocks=True)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)),
                    jnp.float32)
    params = loop.init(jax.random.key(0), x)["params"]
    sparams = stack_block_params(params, depth)
    got = scan.apply({"params": sparams}, x)
    want = loop.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_scan_param_layout_and_grads():
    depth = 3
    scan = ViT(dim=32, depth=depth, num_heads=2, patch=8, scan_blocks=True)
    x = jnp.ones((2, 16, 16, 3), jnp.float32)
    params = scan.init(jax.random.key(0), x)["params"]
    # stacked leading depth axis
    assert params["blocks"]["block"]["norm1"]["scale"].shape == (depth, 32)

    def loss(p):
        return jnp.sum(scan.apply({"params": p}, x) ** 2)

    g = jax.grad(loss)(params)
    gnorm = np.asarray(
        jnp.linalg.norm(g["blocks"]["block"]["mlp_in"]["kernel"].reshape(
            depth, -1), axis=1))
    assert (gnorm > 0).all()  # every layer receives gradient


def test_scan_traces_faster_when_deep():
    x = jnp.ones((1, 32, 32, 3), jnp.float32)

    def trace_time(scan_blocks):
        m = ViT(dim=64, depth=24, num_heads=4, patch=8,
                scan_blocks=scan_blocks)
        t0 = time.perf_counter()
        jax.eval_shape(lambda: m.init(jax.random.key(0), x))
        return time.perf_counter() - t0

    t_loop = trace_time(False)
    t_scan = trace_time(True)
    # scan traces the body once vs 24 times; require a real reduction
    assert t_scan < t_loop * 0.7, (t_scan, t_loop)


def test_beit_scan_matches_loop():
    from skinjax.models.backbones.beit import Beit

    depth = 3
    loop = Beit(dim=32, depth=depth, num_heads=2, patch=8)
    scan = Beit(dim=32, depth=depth, num_heads=2, patch=8, scan_blocks=True)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 32, 32, 3)),
                    jnp.float32)
    params = loop.init(jax.random.key(0), x)["params"]
    sparams = stack_block_params(params, depth)
    got = scan.apply({"params": sparams}, x)
    want = loop.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
