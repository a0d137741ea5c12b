"""Parity for the fused CoaT MLP kernel (ops/pallas/fused_mlp.py).

CPU interpret-mode: forward + full gradient set vs the pure-XLA oracle
(identical math to the two-Dense + exact-GELU chain the CoaT serial block
runs, models/backbones/coat.py; reference semantics timm Mlp inside
coat_lite_small, loaded via loadImageModelClassifier.py:115-150).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skinjax.ops.pallas.fused_mlp import mlp_gelu, mlp_gelu_reference


def _args(T, D, H, dtype, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    x = jax.random.normal(ks[0], (T, D), dtype)
    w1 = jax.random.normal(ks[1], (D, H), dtype) * (D ** -0.5)
    b1 = jax.random.normal(ks[2], (H,), dtype) * 0.1
    w2 = jax.random.normal(ks[3], (H, D), dtype) * (H ** -0.5)
    b2 = jax.random.normal(ks[4], (D,), dtype) * 0.1
    return x, w1, b1, w2, b2


@pytest.mark.parametrize("T,D,H", [(197, 64, 512), (512, 64, 512),
                                   (321, 128, 1024)])
def test_forward_parity_f32(T, D, H):
    args = _args(T, D, H, jnp.float32)
    got = mlp_gelu(*args)
    want = mlp_gelu_reference(*args)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_forward_parity_bf16_batched():
    # (B, N, D) leading-dims path at a non-tile-divisible token count
    x, w1, b1, w2, b2 = _args(4 * 197, 64, 512, jnp.bfloat16)
    x3 = x.reshape(4, 197, 64)
    got = mlp_gelu(x3, w1, b1, w2, b2)
    want = mlp_gelu_reference(x3, w1, b1, w2, b2)
    assert got.shape == (4, 197, 64) and got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.float32(got), np.float32(want),
                               atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("dtype,atol", [(jnp.float32, 2e-4),
                                        (jnp.bfloat16, 6e-2)])
def test_grad_parity(dtype, atol):
    args = _args(321, 64, 512, dtype, seed=1)
    cot = jax.random.normal(jax.random.PRNGKey(9), (321, 64), dtype)

    def loss(fn):
        return lambda *a: jnp.sum(fn(*a).astype(jnp.float32)
                                  * cot.astype(jnp.float32))

    g_got = jax.grad(loss(mlp_gelu), argnums=(0, 1, 2, 3, 4))(*args)
    g_want = jax.grad(loss(mlp_gelu_reference), argnums=(0, 1, 2, 3, 4))(*args)
    for a, b, name in zip(g_got, g_want, ["dx", "dw1", "db1", "dw2", "db2"]):
        assert a.dtype == b.dtype, name
        scale = max(1.0, float(jnp.max(jnp.abs(b.astype(jnp.float32)))))
        np.testing.assert_allclose(
            np.float32(a) / scale, np.float32(b) / scale, atol=atol,
            err_msg=name)


def test_padding_rows_do_not_leak_into_grads():
    # T=1 forces maximal padding; grads must equal the oracle's exactly
    args = _args(1, 64, 512, jnp.float32, seed=2)

    def s(fn):
        return lambda *a: jnp.sum(fn(*a) ** 2)

    g_got = jax.grad(s(mlp_gelu), argnums=(1, 2, 3, 4))(*args)
    g_want = jax.grad(s(mlp_gelu_reference), argnums=(1, 2, 3, 4))(*args)
    for a, b in zip(g_got, g_want):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-4)


def test_coat_default_is_fused_and_paths_match(monkeypatch):
    """Routing default is 'fused' — evidence-backed (bench/ab_coat_mlp.py,
    DESIGN §5p: 946.3/946.8 fused vs 879.4/875.7 XLA img/s at B=64, both
    passes); 'all' routes every block through the kernel and must match the
    XLA path on the full CoaT-lite forward + grads. The 'fused' scope only
    engages blocks with >=48 MB intermediates, so tiny models run XLA."""
    from skinjax.models.backbones.coat import CoaTLite, coat_mlp_mode

    monkeypatch.delenv("SKINJAX_COAT_MLP", raising=False)
    assert coat_mlp_mode() == "fused"
    monkeypatch.setenv("SKINJAX_EXPORT_COMPAT", "1")
    monkeypatch.setenv("SKINJAX_COAT_MLP", "all")
    assert coat_mlp_mode() == ""  # export tracing can't lower pallas_call
    monkeypatch.delenv("SKINJAX_EXPORT_COMPAT")

    model = CoaTLite(dims=(16, 32), depths=(1, 1), heads=8,
                     mlp_ratios=(2.0, 2.0), dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), x)

    def run(mode):
        monkeypatch.setenv("SKINJAX_COAT_MLP", mode)
        loss = lambda p: jnp.sum(model.apply(p, x) ** 2)
        val, grads = jax.value_and_grad(loss)(params)
        return val, grads

    v_xla, g_xla = run("")
    v_fused, g_fused = run("all")
    np.testing.assert_allclose(v_fused, v_xla, rtol=2e-5)
    flat_x = jax.tree_util.tree_leaves(g_xla)
    flat_f = jax.tree_util.tree_leaves(g_fused)
    for a, b in zip(flat_f, flat_x):
        np.testing.assert_allclose(a, b, atol=2e-4, rtol=2e-3)


@pytest.mark.parametrize("dtype,atol", [(jnp.float32, 2e-4),
                                        (jnp.bfloat16, 6e-2)])
def test_star_grad_parity(dtype, atol):
    from skinjax.ops.pallas.fused_mlp import mlp_star, mlp_star_reference

    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    x = jax.random.normal(ks[0], (321, 64), dtype)
    w1 = jax.random.normal(ks[1], (64, 256), dtype) * (64 ** -0.5)
    w2 = jax.random.normal(ks[2], (256, 64), dtype) * (256 ** -0.5)
    s = jnp.array([1.3], jnp.float32)
    b = jnp.array([-0.2], jnp.float32)
    args = (x, w1, s, b, w2)

    got = mlp_star(*args)
    want = mlp_star_reference(*args)
    np.testing.assert_allclose(np.float32(got), np.float32(want),
                               atol=atol, rtol=atol)

    def loss(fn):
        return lambda *a: jnp.sum(fn(*a).astype(jnp.float32) ** 2)

    g_got = jax.grad(loss(mlp_star), argnums=(0, 1, 2, 3, 4))(*args)
    g_want = jax.grad(loss(mlp_star_reference), argnums=(0, 1, 2, 3, 4))(*args)
    for a, b_, name in zip(g_got, g_want, ["dx", "dw1", "ds", "db", "dw2"]):
        assert a.shape == b_.shape and a.dtype == b_.dtype, name
        scale = max(1.0, float(jnp.max(jnp.abs(b_.astype(jnp.float32)))))
        np.testing.assert_allclose(
            np.float32(a) / scale, np.float32(b_) / scale, atol=atol,
            err_msg=name)


def test_caformer_default_is_xla_and_fused_matches(monkeypatch):
    """caformer routing default stays XLA (house rule); 'all' must match the
    default path on a tiny CAFormer forward + grads, and the param tree must
    keep the Dense/StarReLU layout the importer consumes."""
    from skinjax.models.backbones.caformer import CAFormer, caformer_mlp_mode

    monkeypatch.delenv("SKINJAX_CAFORMER_MLP", raising=False)
    assert caformer_mlp_mode() == ""

    model = CAFormer(dims=(16, 32), depths=(1, 1), mixers=("conv", "attention"),
                     res_scale_stages=(False, True), dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), x)
    mlp = params["params"]["stage0_block0"]["mlp"]
    assert set(mlp.keys()) == {"fc1", "act", "fc2"}
    assert set(mlp["act"].keys()) == {"scale", "bias"}
    assert mlp["fc1"]["kernel"].shape == (16, 64)

    def run(mode):
        monkeypatch.setenv("SKINJAX_CAFORMER_MLP", mode)
        loss = lambda p: jnp.sum(model.apply(p, x) ** 2)
        return jax.value_and_grad(loss)(params)

    v_xla, g_xla = run("")
    v_fused, g_fused = run("all")
    np.testing.assert_allclose(v_fused, v_xla, rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_fused),
                    jax.tree_util.tree_leaves(g_xla)):
        np.testing.assert_allclose(a, b, atol=2e-4, rtol=2e-3)


def test_davit_default_is_xla_and_fused_matches(monkeypatch):
    """davit routing default stays XLA; 'all' routes block MLPs through
    mlp_gelu and must match the default path (init always builds the
    nn.Dense tree — the fused path binds DenseParams to the same names)."""
    from skinjax.models.backbones.davit import DaViT, davit_mlp_mode

    monkeypatch.delenv("SKINJAX_DAVIT_MLP", raising=False)
    assert davit_mlp_mode() == ""

    model = DaViT(dims=(32, 64), depths=(1, 1), heads=(2, 4),
                  window=4, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), x)

    def run(mode):
        monkeypatch.setenv("SKINJAX_DAVIT_MLP", mode)
        loss = lambda p: jnp.sum(model.apply(p, x) ** 2)
        return jax.value_and_grad(loss)(params)

    v_xla, g_xla = run("")
    v_fused, g_fused = run("all")
    np.testing.assert_allclose(v_fused, v_xla, rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_fused),
                    jax.tree_util.tree_leaves(g_xla)):
        np.testing.assert_allclose(a, b, atol=2e-4, rtol=2e-3)
