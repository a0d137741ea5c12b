"""Fused global-attention core (ops/pallas/global_attention.py): forward +
gradient parity vs the einsum reference, and the BEiT / MultiHeadAttention
module integrations (interpret mode on CPU runs the kernel arithmetic)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from skinjax.ops.pallas.global_attention import (
    attention_core,
    attention_core_reference,
)


def _qkv(B=4, N=19, C=48, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, N, C)) * 0.5, dtype)
    k = jnp.asarray(rng.normal(size=(B, N, C)) * 0.5, dtype)
    v = jnp.asarray(rng.normal(size=(B, N, C)) * 0.5, dtype)
    return q, k, v


@pytest.mark.parametrize(
    "B,N,C,h,bias",
    [
        (4, 19, 48, 3, False),   # odd N (pad to 32), full-C head group
        (4, 19, 48, 3, True),
        (8, 32, 256, 8, True),   # lane-aligned CG=128 groups (hd=32, g=4)
        (2, 50, 64, 2, False),   # N=50 -> pad 64
    ],
)
def test_forward_parity(B, N, C, h, bias):
    q, k, v = _qkv(B, N, C)
    rng = np.random.default_rng(1)
    b = (jnp.asarray(rng.normal(size=(h, N, N)) * 0.1, jnp.float32)
         if bias else None)
    got = attention_core(q, k, v, b, None, None, h)
    want = attention_core_reference(q, k, v, h, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_gradient_parity():
    B, N, C, h = 4, 19, 48, 3
    q, k, v = _qkv(B, N, C)
    b = jnp.asarray(np.random.default_rng(1).normal(size=(h, N, N)) * 0.1,
                    jnp.float32)

    def loss(fn, q, k, v, b):
        y = fn(q, k, v, b)
        return jnp.sum(jnp.sin(y.astype(jnp.float32)))

    gk = jax.grad(lambda *a: loss(
        lambda q, k, v, b: attention_core(q, k, v, b, None, None, h), *a),
        argnums=(0, 1, 2, 3))(q, k, v, b)
    gr = jax.grad(lambda *a: loss(
        lambda q, k, v, b: attention_core_reference(q, k, v, h, b), *a),
        argnums=(0, 1, 2, 3))(q, k, v, b)
    for n, a, bb in zip(["dq", "dk", "dv", "dbias"], gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=5e-4, rtol=5e-4, err_msg=n)


@pytest.mark.parametrize("bwd_mode", ["store", "recompute"])
def test_gradient_parity_grouped_no_bias(bwd_mode, monkeypatch):
    # CG=128 head groups (hd=32, hg>1) — BOTH backward modes must keep
    # grouped-heads gradient coverage (r3 advisor: the recompute path lost
    # it when the default flipped to store)
    monkeypatch.setenv("SKINJAX_GLOBATTN_BWD", bwd_mode)
    B, N, C, h = 8, 32, 256, 8
    q, k, v = _qkv(B, N, C)

    def loss(fn, q, k, v):
        return jnp.sum(jnp.sin(fn(q, k, v).astype(jnp.float32)))

    gk = jax.grad(lambda *a: loss(
        lambda q, k, v: attention_core(q, k, v, None, None, None, h), *a),
        argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda *a: loss(
        lambda q, k, v: attention_core_reference(q, k, v, h), *a),
        argnums=(0, 1, 2))(q, k, v)
    for n, a, bb in zip(["dq", "dk", "dv"], gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=5e-4, rtol=5e-4, err_msg=n)


def test_bwd_mode_env_validation(monkeypatch):
    # a typo must error, not silently select recompute (r3 advisor)
    from skinjax.ops.pallas.global_attention import globattn_bwd_mode
    monkeypatch.setenv("SKINJAX_GLOBATTN_BWD", "stored")
    with pytest.raises(ValueError):
        globattn_bwd_mode()
    monkeypatch.setenv("SKINJAX_GLOBATTN_BWD", "recompute")
    assert globattn_bwd_mode() == "recompute"
    monkeypatch.delenv("SKINJAX_GLOBATTN_BWD")
    assert globattn_bwd_mode() == "store"


def test_store_gate_falls_back_above_residual_cap(monkeypatch):
    # unset default: residual-size gate routes big-P calls to recompute
    from skinjax.ops.pallas.global_attention import _store_p_ok
    monkeypatch.delenv("SKINJAX_GLOBATTN_BWD", raising=False)
    assert _store_p_ok(32, 16, 208)            # beitv2_large B=32: ~88 MB
    assert not _store_p_ok(32, 12, 1024)       # GPT-2 T=1024: ~1.6 GB
    monkeypatch.setenv("SKINJAX_GLOBATTN_STORE_MAX_MB", "1")
    assert not _store_p_ok(32, 16, 208)
    # gradients stay correct when the gate trips (recompute path engages)
    monkeypatch.setenv("SKINJAX_GLOBATTN_STORE_MAX_MB", "0.0001")
    B, N, C, h = 2, 19, 48, 3
    q, k, v = _qkv(B, N, C)

    def loss(fn, q, k, v):
        return jnp.sum(jnp.sin(fn(q, k, v).astype(jnp.float32)))

    gk = jax.grad(lambda *a: loss(
        lambda q, k, v: attention_core(q, k, v, None, None, None, h), *a),
        argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda *a: loss(
        lambda q, k, v: attention_core_reference(q, k, v, h), *a),
        argnums=(0, 1, 2))(q, k, v)
    for n, a, bb in zip(["dq", "dk", "dv"], gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=5e-4, rtol=5e-4, err_msg=n)


def _padmask(B, N, lengths):
    """Additive key mask: 0 for t < length, -1e9 beyond (BERT padding)."""
    m = np.zeros((B, N), np.float32)
    for i, L in enumerate(lengths):
        m[i, L:] = -1e9
    return jnp.asarray(m)


def test_forward_parity_kmask():
    B, N, C, h = 4, 19, 48, 3
    q, k, v = _qkv(B, N, C)
    km = _padmask(B, N, [19, 11, 5, 16])
    got = attention_core(q, k, v, None, km, None, h)
    want = attention_core_reference(q, k, v, h, kmask=km)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_gradient_parity_kmask():
    B, N, C, h = 4, 19, 48, 3
    q, k, v = _qkv(B, N, C)
    km = _padmask(B, N, [19, 11, 5, 16])

    def loss(fn, q, k, v):
        return jnp.sum(jnp.sin(fn(q, k, v).astype(jnp.float32)))

    gk = jax.grad(lambda *a: loss(
        lambda q, k, v: attention_core(q, k, v, None, km, None, h), *a),
        argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda *a: loss(
        lambda q, k, v: attention_core_reference(q, k, v, h, kmask=km), *a),
        argnums=(0, 1, 2))(q, k, v)
    for n, a, bb in zip(["dq", "dk", "dv"], gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=5e-4, rtol=5e-4, err_msg=n)


def test_bf16_forward_runs():
    q, k, v = _qkv(4, 19, 48, dtype=jnp.bfloat16)
    y = attention_core(q, k, v, None, None, None, 3)
    assert y.dtype == jnp.bfloat16 and y.shape == (4, 19, 48)
    assert np.isfinite(np.asarray(y, np.float32)).all()


def _pmult(N, rate=0.3, seed=5):
    """Flax broadcast attention-prob dropout multiplier: ONE (N, N)
    keep/keep_prob mask shared over batch+heads."""
    keep = jax.random.bernoulli(jax.random.key(seed), 1.0 - rate,
                                (1, 1, N, N))
    return (keep.astype(jnp.float32) / (1.0 - rate))[0, 0]


def test_forward_parity_pmult():
    B, N, C, h = 4, 19, 48, 3
    q, k, v = _qkv(B, N, C)
    km = _padmask(B, N, [19, 11, 5, 16])
    pm = _pmult(N)
    got = attention_core(q, k, v, None, km, pm, h)
    want = attention_core_reference(q, k, v, h, kmask=km, pmult=pm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_gradient_parity_pmult():
    """Dropout-in-kernel backward: the multiplier must hit dv/of via p*m and
    dp BEFORE the softmax vjp — compared against AD through the einsum
    oracle, with a bias so dbias is exercised under dropout too."""
    B, N, C, h = 4, 19, 48, 3
    q, k, v = _qkv(B, N, C)
    b = jnp.asarray(np.random.default_rng(2).normal(size=(h, N, N)) * 0.1,
                    jnp.float32)
    pm = _pmult(N)

    def loss(fn, q, k, v, b):
        return jnp.sum(jnp.sin(fn(q, k, v, b).astype(jnp.float32)))

    gk = jax.grad(lambda *a: loss(
        lambda q, k, v, b: attention_core(q, k, v, b, None, pm, h), *a),
        argnums=(0, 1, 2, 3))(q, k, v, b)
    gr = jax.grad(lambda *a: loss(
        lambda q, k, v, b: attention_core_reference(q, k, v, h, b, pmult=pm),
        *a), argnums=(0, 1, 2, 3))(q, k, v, b)
    for n, a, bb in zip(["dq", "dk", "dv", "dbias"], gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=5e-4, rtol=5e-4, err_msg=n)


def test_bwd_modes_agree(monkeypatch):
    """The stored-P backward (_bwd_p_core) and the flash-style recompute
    backward (_bwd_core) are interchangeable: identical grads vs the einsum
    oracle for the full-featured case (bias + kmask + pmult), whatever the
    session default (SKINJAX_GLOBATTN_BWD) is."""
    B, N, C, h = 4, 19, 48, 3
    q, k, v = _qkv(B, N, C)
    b = jnp.asarray(np.random.default_rng(3).normal(size=(h, N, N)) * 0.1,
                    jnp.float32)
    km = _padmask(B, N, [19, 11, 5, 16])
    pm = _pmult(N)

    def loss(fn, q, k, v, b):
        return jnp.sum(jnp.sin(fn(q, k, v, b).astype(jnp.float32)))

    gr = jax.grad(lambda *a: loss(
        lambda q, k, v, b: attention_core_reference(
            q, k, v, h, b, kmask=km, pmult=pm), *a),
        argnums=(0, 1, 2, 3))(q, k, v, b)
    for mode in ("store", "recompute"):
        monkeypatch.setenv("SKINJAX_GLOBATTN_BWD", mode)
        gk = jax.grad(lambda *a: loss(
            lambda q, k, v, b: attention_core(q, k, v, b, km, pm, h), *a),
            argnums=(0, 1, 2, 3))(q, k, v, b)
        for n, a, bb in zip(["dq", "dk", "dv", "dbias"], gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                       atol=5e-4, rtol=5e-4,
                                       err_msg=f"{mode}:{n}")


# ---------------------------------------------------------------------------
# module integrations: kernel path == XLA path on identical params
# ---------------------------------------------------------------------------

def test_beit_attention_paths_match(monkeypatch):
    from skinjax.models.backbones.beit import BeitAttention

    B, gh, gw, C, h = 2, 3, 3, 32, 2
    N = gh * gw + 1
    mod = BeitAttention(C, h, (gh, gw))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, N, C)) * 0.5,
                    jnp.float32)
    params = mod.init(jax.random.key(0), x)
    # make the rel-pos bias non-trivial (zeros-init would hide bias bugs)
    params = jax.tree_util.tree_map(
        lambda p: p + 0.05 * np.random.default_rng(1).normal(size=p.shape)
        .astype(np.float32), params)

    monkeypatch.setenv("SKINJAX_GLOBATTN", "")
    want = mod.apply(params, x)
    monkeypatch.setenv("SKINJAX_GLOBATTN", "pallas")
    got = mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)

    # grads flow through the rel-pos TABLE (gather chained outside kernel)
    def loss(p, env):
        monkeypatch.setenv("SKINJAX_GLOBATTN", env)
        return jnp.sum(jnp.sin(mod.apply(p, x).astype(jnp.float32)))

    gk = jax.grad(lambda p: loss(p, "pallas"))(params)
    gr = jax.grad(lambda p: loss(p, ""))(params)
    flat_k = jax.tree_util.tree_leaves_with_path(gk)
    flat_r = dict(
        (jax.tree_util.keystr(kp), g)
        for kp, g in jax.tree_util.tree_leaves_with_path(gr))
    for kp, g in flat_k:
        name = jax.tree_util.keystr(kp)
        np.testing.assert_allclose(np.asarray(g), np.asarray(flat_r[name]),
                                   atol=5e-4, rtol=5e-4, err_msg=name)
    gt = np.asarray(
        gk["params"]["rel_bias_table"])
    assert np.abs(gt).max() > 0  # table actually receives gradient


def test_mha_general_path_matches(monkeypatch):
    from skinjax.ops.attention import MultiHeadAttention

    B, S, D, h = 2, 11, 32, 2
    mod = MultiHeadAttention(D, h)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, S, D)) * 0.5, jnp.float32)
    params = mod.init(jax.random.key(0), x, x, x)

    monkeypatch.setenv("SKINJAX_GLOBATTN", "")
    want = mod.apply(params, x, x, x)
    monkeypatch.setenv("SKINJAX_GLOBATTN", "pallas")
    got = mod.apply(params, x, x, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_mode_resolution(monkeypatch):
    from skinjax.ops.pallas.global_attention import globattn_mode

    monkeypatch.setenv("SKINJAX_GLOBATTN", "pallas")
    assert globattn_mode() == "pallas"
    # export tracing always forces the XLA form (emitter can't express
    # pallas_call), even over an explicit env override
    monkeypatch.setenv("SKINJAX_EXPORT_COMPAT", "1")
    assert globattn_mode() == ""
    monkeypatch.delenv("SKINJAX_EXPORT_COMPAT")
    monkeypatch.setenv("SKINJAX_GLOBATTN", "")
    assert globattn_mode() == ""
    monkeypatch.delenv("SKINJAX_GLOBATTN")
    assert globattn_mode() == ""  # CPU backend in tests -> XLA default


def test_globattn_ok_sequence_caps(monkeypatch):
    # helper-crash caps (DESIGN §5m): bias path <=512, plain path <=1024
    from skinjax.ops.pallas.global_attention import globattn_ok
    monkeypatch.setenv("SKINJAX_GLOBATTN", "pallas")
    assert globattn_ok(197, has_bias=True)      # ViT/BEiT
    assert globattn_ok(512, has_bias=True)      # GPT-2 T=512
    assert not globattn_ok(640, has_bias=True)  # helper crash territory
    assert not globattn_ok(1024, has_bias=True)
    assert globattn_ok(1024)                    # kmask/no-bias path
    assert not globattn_ok(1040)
    monkeypatch.setenv("SKINJAX_GLOBATTN", "")
    assert not globattn_ok(197, has_bias=True)


def test_caformer_attention_default_is_xla(monkeypatch):
    """Without the explicit opt-in, MetaFormerAttention must stay on the
    XLA einsum path even when the global kernel mode is on — the fused
    default was reverted on measured evidence (DESIGN §5n)."""
    from skinjax.models.backbones.caformer import MetaFormerAttention
    from skinjax.ops.pallas import global_attention as ga

    mod = MetaFormerAttention(dim=64, head_dim=32)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 64)), jnp.float32)
    variables = mod.init(jax.random.key(0), x)

    monkeypatch.setenv("SKINJAX_GLOBATTN", "pallas")
    monkeypatch.delenv("SKINJAX_CAFORMER_ATTN", raising=False)

    def boom(*a, **k):
        raise AssertionError("fused core must not engage by default")

    monkeypatch.setattr(ga, "attention_core", boom)
    mod.apply(variables, x)  # einsum path; boom would fail the test


def test_caformer_attention_module_parity(monkeypatch):
    """MetaFormerAttention with the fused core == the einsum path (same
    params/input) — interpret mode on CPU runs the kernel arithmetic.
    The fused path is OPT-IN (SKINJAX_CAFORMER_ATTN=pallas): the full-
    program default was measured-refuted on chip (DESIGN §5n — remote
    compile-helper crash), so the kernel stays parity-covered but off."""
    from skinjax.models.backbones.caformer import MetaFormerAttention

    mod = MetaFormerAttention(dim=64, head_dim=32)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 64)), jnp.float32)
    variables = mod.init(jax.random.key(0), x)

    monkeypatch.setenv("SKINJAX_CAFORMER_ATTN", "pallas")
    monkeypatch.setenv("SKINJAX_GLOBATTN", "")
    want = mod.apply(variables, x)
    monkeypatch.setenv("SKINJAX_GLOBATTN", "pallas")
    got = mod.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)

    def loss(params, env):
        monkeypatch.setenv("SKINJAX_GLOBATTN", env)
        return jnp.sum(jnp.sin(mod.apply({"params": params}, x)
                               .astype(jnp.float32)))

    g1 = jax.grad(lambda p: loss(p, ""))(variables["params"])
    g2 = jax.grad(lambda p: loss(p, "pallas"))(variables["params"])
    for path, l1 in jax.tree_util.tree_leaves_with_path(g1):
        l2 = dict(jax.tree_util.tree_leaves_with_path(g2))[path]
        np.testing.assert_allclose(np.asarray(l2), np.asarray(l1),
                                   atol=5e-4, rtol=5e-4, err_msg=str(path))
