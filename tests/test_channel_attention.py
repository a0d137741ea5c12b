"""Parity tests for the fused channel-attention kernel
(ops/pallas/channel_attention.py) — CPU interpret mode via conftest."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skinjax.ops.pallas.channel_attention import (
    channel_attention,
    channel_attention_reference,
)


def _setup(B=2, N=196, C=96, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, N, C)) * 0.5, dtype)
    wqkv = jnp.asarray(rng.normal(size=(C, 3 * C)) * 0.05, dtype)
    bqkv = jnp.asarray(rng.normal(size=(3 * C,)) * 0.02, dtype)
    wproj = jnp.asarray(rng.normal(size=(C, C)) * 0.05, dtype)
    bproj = jnp.asarray(rng.normal(size=(C,)) * 0.02, dtype)
    return x, wqkv, bqkv, wproj, bproj


@pytest.mark.parametrize("B,N,C,h", [
    (2, 196, 96, 3),   # stage-1-like (small N for CPU interpret)
    (1, 49, 768, 24),  # stage-4-like: 24 heads, hd=32
    (4, 64, 64, 2),    # CB growth
])
def test_channel_attention_forward_parity(B, N, C, h):
    args = _setup(B, N, C)
    got = channel_attention(*args, h)
    want = channel_attention_reference(*args, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_channel_attention_gradient_parity():
    args = _setup()

    def loss_k(*a):
        return jnp.sum(jnp.sin(
            channel_attention(*a, 3).astype(jnp.float32)))

    def loss_r(*a):
        return jnp.sum(jnp.sin(
            channel_attention_reference(*a, 3).astype(jnp.float32)))

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4))(*args)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(*args)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=3e-4)


def test_channel_block_fused_matches_unfused():
    """ChannelBlock(fused_attn=True) — same params, same output."""
    from skinjax.models.backbones.davit import ChannelBlock

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 14, 14, 96)) * 0.5, jnp.float32)
    fused = ChannelBlock(96, 3, fused_attn=True)
    plain = ChannelBlock(96, 3)
    variables = plain.init(jax.random.key(0), x)
    np.testing.assert_allclose(
        np.asarray(fused.apply(variables, x)),
        np.asarray(plain.apply(variables, x)),
        atol=2e-5, rtol=2e-5)
