"""Fused pooled (cross-shaped) attention kernel for MViTv2
(ops/pallas/pooled_attention.py): forward + gradient parity vs the einsum
reference, including the in-kernel decomposed rel-pos bias expansion, and
the MViTAttention module integration (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from skinjax.ops.pallas.pooled_attention import (
    pooled_attention,
    pooled_attention_reference,
)


def _inputs(B, h, q_size, k_size, hd, seed=0):
    rng = np.random.default_rng(seed)
    Nq, Nk = q_size[0] * q_size[1], k_size[0] * k_size[1]
    mk = lambda *s: jnp.asarray(rng.normal(size=s) * 0.5, jnp.float32)
    return (mk(B, h, Nq, hd), mk(B, h, Nk, hd), mk(B, h, Nk, hd),
            mk(B, h, Nq, k_size[0]) * 0.2, mk(B, h, Nq, k_size[1]) * 0.2)


# shapes drawn from mvitv2_small's stages (scaled down): equal N, pooled
# kv (Nq > Nk), expanding q (Nq < Nk), odd sizes needing padding
@pytest.mark.parametrize(
    "B,h,q_size,k_size,hd",
    [
        (2, 2, (4, 4), (4, 4), 32),    # equal lengths (stage-2 body)
        (2, 1, (8, 8), (4, 4), 32),    # pooled kv (stage-0 shape)
        (2, 4, (4, 4), (8, 8), 16),    # stage-2 transition: Nq < Nk
        (1, 2, (5, 5), (3, 3), 24),    # odd everything -> pad 16
    ],
)
def test_forward_parity(B, h, q_size, k_size, hd):
    q, k, v, bh, bw = _inputs(B, h, q_size, k_size, hd)
    got = pooled_attention(q, k, v, bh, bw, k_size)
    want = pooled_attention_reference(q, k, v, bh, bw, k_size)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize(
    "B,h,q_size,k_size,hd",
    [
        (2, 2, (4, 4), (4, 4), 32),
        (2, 1, (8, 8), (4, 4), 32),
        (1, 2, (5, 5), (3, 3), 24),
    ],
)
def test_gradient_parity(B, h, q_size, k_size, hd):
    q, k, v, bh, bw = _inputs(B, h, q_size, k_size, hd, seed=1)

    def loss(fn, *a):
        return jnp.sum(jnp.sin(fn(*a, k_size).astype(jnp.float32)))

    gk = jax.grad(lambda *a: loss(pooled_attention, *a),
                  argnums=(0, 1, 2, 3, 4))(q, k, v, bh, bw)
    gr = jax.grad(lambda *a: loss(pooled_attention_reference, *a),
                  argnums=(0, 1, 2, 3, 4))(q, k, v, bh, bw)
    for n, a, b in zip(["dq", "dk", "dv", "dbh", "dbw"], gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4, err_msg=n)


def test_chunked_query_parity():
    """Query-chunk folding (the §5l stage-0 workaround) is exact: fwd and
    grads match the reference with the query axis split into grid cells."""
    from skinjax.ops.pallas.pooled_attention import (
        pooled_attention_chunked, query_chunks)

    assert query_chunks(3136) == 4      # mvitv2 stage-0: 4 x 784
    assert query_chunks(784) == 1       # already under the row cap
    assert query_chunks(1031) is None   # prime > cap: not chunkable

    B, h, q_size, k_size, hd = 2, 2, (8, 8), (4, 4), 32
    q, k, v, bh, bw = _inputs(B, h, q_size, k_size, hd, seed=2)
    got = pooled_attention_chunked(q, k, v, bh, bw, k_size, 4)
    want = pooled_attention_reference(q, k, v, bh, bw, k_size)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)

    def loss(fn, *a):
        return jnp.sum(jnp.sin(fn(*a).astype(jnp.float32)))

    gk = jax.grad(lambda *a: loss(
        lambda *b: pooled_attention_chunked(*b, k_size, 4), *a),
        argnums=(0, 1, 2, 3, 4))(q, k, v, bh, bw)
    gr = jax.grad(lambda *a: loss(
        lambda *b: pooled_attention_reference(*b, k_size), *a),
        argnums=(0, 1, 2, 3, 4))(q, k, v, bh, bw)
    for n, a, b in zip(["dq", "dk", "dv", "dbh", "dbw"], gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4, err_msg=n)


def test_pooled_attn_capacity_gate():
    """ADVICE r4 (low): the fuse gate must cap the EQUAL-length case too —
    an Nq=Nk>=2048 block would put a multi-ten-MB f32 P plane in one VMEM
    block (Mosaic-crash territory) and an unbounded stored-P residual."""
    from skinjax.ops.pallas.pooled_attention import pooled_attn_ok

    # every mvitv2_small production block shape stays fused
    assert pooled_attn_ok(32, 1, 784, 784)     # stage-1 body
    assert pooled_attn_ok(32, 2, 784, 196)     # stage-1 transition
    assert pooled_attn_ok(32, 8, 49, 49)       # stage-3 body
    # equal-length blocks past the VMEM cell cap are rejected
    assert not pooled_attn_ok(1, 1, 2048, 2048)
    assert not pooled_attn_ok(1, 1, 3136, 3136)
    # residual ceiling: huge batch x heads rejects even small cells
    assert not pooled_attn_ok(4096, 16, 784, 784)


def test_mvit_attention_module_parity(monkeypatch):
    """MViTAttention with the fused kernel enabled == the XLA einsum path
    (same params, same input) — the module-integration check."""
    from skinjax.models.backbones.mvit import MViTAttention

    mod = MViTAttention(dim_out=32, num_heads=2, stride_q=1, stride_kv=2,
                       feat=(8, 8))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 64, 32)), jnp.float32)
    variables = mod.init(jax.random.key(0), x)

    monkeypatch.setenv("SKINJAX_GLOBATTN", "")
    want, fs = mod.apply(variables, x)
    monkeypatch.setenv("SKINJAX_GLOBATTN", "pallas")
    got, fs2 = mod.apply(variables, x)
    assert fs == fs2
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)

    # gradients through the module too
    def loss(params, env):
        monkeypatch.setenv("SKINJAX_GLOBATTN", env)
        out, _ = mod.apply({"params": params}, x)
        return jnp.sum(jnp.sin(out.astype(jnp.float32)))

    g1 = jax.grad(lambda p: loss(p, ""))(variables["params"])
    g2 = jax.grad(lambda p: loss(p, "pallas"))(variables["params"])
    flat1 = dict(jax.tree_util.tree_leaves_with_path(g1))
    flat2 = dict(jax.tree_util.tree_leaves_with_path(g2))
    for path in flat1:
        np.testing.assert_allclose(
            np.asarray(flat2[path]), np.asarray(flat1[path]),
            atol=5e-4, rtol=5e-4, err_msg=str(path))
