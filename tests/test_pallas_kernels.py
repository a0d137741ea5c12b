"""Pallas fusion kernels vs linen reference modules (CPU interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp

from skinjax.models.fusion.blocks import GatedAlteredResidualBlock, MetaBlock, MLPHead
from skinjax.ops.attention import MultiHeadAttention
from skinjax.ops.pallas import fusion_kernels as fk

B, D = 8, 64


def _rand(*shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32)
    )


def test_seq1_attention_kernel_matches_mha():
    mha = MultiHeadAttention(embed_dim=D, num_heads=8)
    x = _rand(B, 1, D, seed=1)
    params = mha.init(jax.random.key(0), x, x, x)["params"]
    ref = mha.apply({"params": params}, x, x, x)[:, 0]
    out = fk.seq1_attention(x[:, 0], *fk.mha_args(params))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_gated_residual_kernel_matches_block():
    blk = GatedAlteredResidualBlock(dim=D, num_heads=8)
    q = _rand(B, 1, D, seed=2)
    kv = _rand(B, 1, D, seed=3)
    params = blk.init(jax.random.key(0), q, kv, kv)["params"]
    ref = blk.apply({"params": params}, q, kv, kv, deterministic=True)[:, 0]
    out = fk.gated_residual_seq1(q[:, 0], kv[:, 0], *fk.grb_args(params))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_metablock_kernel_matches_block():
    mb = MetaBlock(v_dim=D)
    v = _rand(B, D, seed=4)
    u = _rand(B, 48, seed=5)
    params = mb.init(jax.random.key(0), v, u)["params"]
    ref = mb.apply({"params": params}, v, u)
    out = fk.metablock_film(v, u, *fk.metablock_args(params))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_mlp_head_kernel_matches_module():
    head = MLPHead(hidden=D, num_classes=6)
    x = _rand(B, 2 * D, seed=6)
    params = head.init(jax.random.key(0), x)["params"]
    ref = head.apply({"params": params}, x, deterministic=True)
    out = fk.mlp_head(x, *fk.mlp_head_args(params))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
