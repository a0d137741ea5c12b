"""Parity of skinjax MultiHeadAttention vs torch nn.MultiheadAttention.

The torch modules here are built inline from the public torch API (not copied
from the reference) purely as a numerical oracle.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from skinjax.ops.attention import MultiHeadAttention


def _torch_mha(dim, heads, seed=0):
    torch.manual_seed(seed)
    return torch.nn.MultiheadAttention(dim, heads, batch_first=True)


def _import_torch_mha_params(tm, dim):
    """torch packed in_proj (3D, D) -> flax q/k/v/out kernels (in, out)."""
    w = tm.in_proj_weight.detach().numpy()
    b = tm.in_proj_bias.detach().numpy()
    mk = lambda W, bb: {"kernel": jnp.asarray(W.T), "bias": jnp.asarray(bb)}
    return {
        "q_proj": mk(w[:dim], b[:dim]),
        "k_proj": mk(w[dim : 2 * dim], b[dim : 2 * dim]),
        "v_proj": mk(w[2 * dim :], b[2 * dim :]),
        "out_proj": mk(
            tm.out_proj.weight.detach().numpy(), tm.out_proj.bias.detach().numpy()
        ),
    }


@pytest.mark.parametrize("sq,skv", [(1, 1), (4, 4), (3, 7)])
@pytest.mark.parametrize("heads", [1, 4])
def test_mha_matches_torch(sq, skv, heads):
    dim, B = 32, 5
    tm = _torch_mha(dim, heads)
    params = {"params": _import_torch_mha_params(tm, dim)}

    rng = np.random.default_rng(1)
    q = rng.normal(size=(B, sq, dim)).astype(np.float32)
    k = rng.normal(size=(B, skv, dim)).astype(np.float32)
    v = rng.normal(size=(B, skv, dim)).astype(np.float32)

    with torch.no_grad():
        ref, _ = tm(torch.tensor(q), torch.tensor(k), torch.tensor(v))

    mod = MultiHeadAttention(embed_dim=dim, num_heads=heads)
    out = mod.apply(params, jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=2e-5, rtol=2e-5)


def test_seq1_param_tree_complete():
    """q/k/v/out params must all exist even on the seq-1 fast path."""
    mod = MultiHeadAttention(embed_dim=16, num_heads=2)
    x = jnp.ones((2, 1, 16))
    params = mod.init(jax.random.key(0), x, x, x)["params"]
    assert set(params) == {"q_proj", "k_proj", "v_proj", "out_proj"}


def test_seq1_grad_matches_general_path():
    """Fast path must match the general path including gradients."""
    dim, heads = 16, 4
    mod = MultiHeadAttention(embed_dim=dim, num_heads=heads)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(3, 1, dim)), jnp.float32)
    params = mod.init(jax.random.key(0), x, x, x)

    tm = _torch_mha(dim, heads, seed=3)
    params = {"params": _import_torch_mha_params(tm, dim)}

    def loss_fast(p, x):
        return (mod.apply(p, x, x, x) ** 2).sum()

    tx = torch.tensor(np.asarray(x), requires_grad=True)
    out, _ = tm(tx, tx, tx)
    (out**2).sum().backward()

    gx = jax.grad(loss_fast, argnums=1)(params, x)
    np.testing.assert_allclose(np.asarray(gx), tx.grad.numpy(), atol=1e-4, rtol=1e-4)


def test_gated_residual_block_matches_torch():
    """GatedAlteredResidualBlock (and the stacked variant) vs the reference
    math implemented inline in torch (gatedResidualBlock.py:4-42)."""
    from skinjax.models.fusion.blocks import (
        GatedAlteredResidualBlock,
        StackedGatedResidualBlock,
    )

    dim, B = 32, 4

    class TGRB(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.norm = torch.nn.LayerNorm(dim)
            self.attn = torch.nn.MultiheadAttention(dim, 8, batch_first=True)
            self.gate_linear = torch.nn.Linear(dim, dim)

        def forward(self, q, k, v):
            a, _ = self.attn(q, k, v)
            g = torch.sigmoid(self.gate_linear(q))
            return self.norm(g * a + (1 - g) * q)

    torch.manual_seed(21)
    tm = TGRB().eval()
    params = {
        "attn": _import_torch_mha_params(tm.attn, dim),
        "gate_linear": {
            "kernel": jnp.asarray(tm.gate_linear.weight.detach().numpy().T),
            "bias": jnp.asarray(tm.gate_linear.bias.detach().numpy()),
        },
        "norm": {
            "scale": jnp.asarray(tm.norm.weight.detach().numpy()),
            "bias": jnp.asarray(tm.norm.bias.detach().numpy()),
        },
    }
    rng = np.random.default_rng(21)
    q = rng.normal(size=(B, 1, dim)).astype(np.float32)
    kv = rng.normal(size=(B, 1, dim)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(q), torch.tensor(kv), torch.tensor(kv)).numpy()
    blk = GatedAlteredResidualBlock(dim=dim, num_heads=8)
    out = blk.apply({"params": params}, jnp.asarray(q), jnp.asarray(kv),
                    jnp.asarray(kv), deterministic=True)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)

    # stacked variant threads q while k/v stay fixed
    stacked = StackedGatedResidualBlock(dim=dim, depth=2, num_heads=8)
    sp = {"block_0": params, "block_1": params}
    out2 = stacked.apply({"params": sp}, jnp.asarray(q), jnp.asarray(kv),
                         jnp.asarray(kv), deterministic=True)
    with torch.no_grad():
        r = torch.tensor(q)
        for _ in range(2):
            r = tm(r, torch.tensor(kv), torch.tensor(kv))
    np.testing.assert_allclose(np.asarray(out2), r.numpy(), atol=5e-5, rtol=5e-5)
