"""Fused window-attention Pallas kernel: forward + gradient parity vs the
einsum reference (interpret mode on CPU runs the kernel arithmetic)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from skinjax.ops.pallas.window_attention import (
    window_attention,
    window_attention_reference,
)


def _setup(nB=8, N=49, C=96, h=3, bias=False, mask_nw=0, seed=0,
           dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(nB, N, C)) * 0.5, dtype)
    wqkv = jnp.asarray(rng.normal(size=(C, 3 * C)) * 0.05, dtype)
    bqkv = jnp.asarray(rng.normal(size=(3 * C,)) * 0.02, dtype)
    wproj = jnp.asarray(rng.normal(size=(C, C)) * 0.05, dtype)
    bproj = jnp.asarray(rng.normal(size=(C,)) * 0.02, dtype)
    b = jnp.asarray(rng.normal(size=(h, N, N)) * 0.1, jnp.float32) if bias else None
    m = (jnp.asarray(
        np.where(rng.uniform(size=(mask_nw, N, N)) > 0.8, -100.0, 0.0),
        jnp.float32) if mask_nw else None)
    return x, wqkv, bqkv, wproj, bproj, b, m


@pytest.mark.parametrize("bias,mask_nw", [(False, 0), (True, 0), (True, 4)])
def test_forward_parity(bias, mask_nw):
    x, wqkv, bqkv, wproj, bproj, b, m = _setup(bias=bias, mask_nw=mask_nw)
    got = window_attention(x, wqkv, bqkv, wproj, bproj, b, m, 3)
    want = window_attention_reference(x, wqkv, bqkv, wproj, bproj, 3, b, m)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_gradient_parity():
    x, wqkv, bqkv, wproj, bproj, b, m = _setup(nB=8, bias=True, mask_nw=4)

    def loss_k(x, wqkv, bqkv, wproj, bproj, b):
        y = window_attention(x, wqkv, bqkv, wproj, bproj, b, m, 3)
        return jnp.sum(jnp.sin(y.astype(jnp.float32)))

    def loss_r(x, wqkv, bqkv, wproj, bproj, b):
        y = window_attention_reference(x, wqkv, bqkv, wproj, bproj, 3, b, m)
        return jnp.sum(jnp.sin(y.astype(jnp.float32)))

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4, 5))(
        x, wqkv, bqkv, wproj, bproj, b)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4, 5))(
        x, wqkv, bqkv, wproj, bproj, b)
    names = ["dx", "dwqkv", "dbqkv", "dwproj", "dbproj", "dbias"]
    for n, a, bb in zip(names, gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=5e-4, rtol=5e-4, err_msg=n)


def test_bf16_forward_runs():
    x, wqkv, bqkv, wproj, bproj, b, m = _setup(dtype=jnp.bfloat16)
    got = window_attention(x, wqkv, bqkv, wproj, bproj, None, None, 3)
    want = window_attention_reference(x, wqkv, bqkv, wproj, bproj, 3)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2)


# ---------------------------------------------------------------------------
# module integration: fused path == plain-XLA path on the SAME params
# ---------------------------------------------------------------------------

def test_davit_module_fused_matches_unfused():
    from skinjax.models.backbones.davit import DaViTWindowAttention

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 49, 96)) * 0.5, jnp.float32)
    plain = DaViTWindowAttention(96, 3)
    fused = DaViTWindowAttention(96, 3, fused=True)
    params = plain.init(jax.random.key(0), x)
    got = fused.apply(params, x)
    want = plain.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


def test_swin_module_fused_matches_unfused():
    from skinjax.models.backbones.transformer_zoo import (
        WindowAttention as SwinWA,
        _swin_attn_mask,
    )

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(8, 49, 96)) * 0.5, jnp.float32)
    mask = jnp.asarray(_swin_attn_mask(14, 14, 7, 3))  # (4, 49, 49)
    plain = SwinWA(96, 3, 7)
    fused = SwinWA(96, 3, 7, fused=True)
    params = plain.init(jax.random.key(0), x, mask)
    got = fused.apply(params, x, mask)
    want = plain.apply(params, x, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)

    # gradient flows into the rel-pos table through the fused kernel
    g = jax.grad(
        lambda p: jnp.sum(jnp.sin(fused.apply(p, x, mask)))
    )(params)["params"]["rel_bias"]
    assert float(jnp.abs(g).max()) > 0


def test_mask_period_exceeds_block():
    """Swin stage-1 regime: n_win (64 distinct shifted masks) > the
    VMEM-safe block size, so blocks map to mask slices by grid index."""
    from skinjax.ops.pallas import window_attention as wa

    x, wqkv, bqkv, wproj, bproj, _, m = _setup(nB=128, N=49, C=96,
                                               mask_nw=64, seed=3)
    winb = wa._pick_winb(128, 64, wa._fwd_window_bytes(64, 96, 4))
    assert winb < 64  # the slice path is actually exercised
    got = window_attention(x, wqkv, bqkv, wproj, bproj, None, m, 3)
    want = window_attention_reference(x, wqkv, bqkv, wproj, bproj, 3, None, m)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)

    # gradients through the slice path
    gk = jax.grad(lambda a: jnp.sum(jnp.sin(
        window_attention(a, wqkv, bqkv, wproj, bproj, None, m, 3))))(x)
    gr = jax.grad(lambda a: jnp.sum(jnp.sin(
        window_attention_reference(a, wqkv, bqkv, wproj, bproj, 3,
                                   None, m))))(x)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                               atol=5e-4, rtol=5e-4)


def _nhwc_setup(B=2, H=14, W=14, C=96, h=3, seed=3, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, H, W, C)) * 0.5, dtype)
    wqkv = jnp.asarray(rng.normal(size=(C, 3 * C)) * 0.05, dtype)
    bqkv = jnp.asarray(rng.normal(size=(3 * C,)) * 0.02, dtype)
    wproj = jnp.asarray(rng.normal(size=(C, C)) * 0.05, dtype)
    bproj = jnp.asarray(rng.normal(size=(C,)) * 0.02, dtype)
    return x, wqkv, bqkv, wproj, bproj


def _nhwc_reference(x, wqkv, bqkv, wproj, bproj, h, w):
    from skinjax.models.backbones.transformer_zoo import (
        window_partition,
        window_reverse,
    )

    B, H, W, C = x.shape
    y = window_attention_reference(
        window_partition(x, w), wqkv, bqkv, wproj, bproj, h)
    return window_reverse(y, w, H, W)


@pytest.mark.parametrize("B,H,W,C,h", [
    (2, 14, 14, 96, 3),   # stage-2-like: 2x2 windows
    (2, 7, 7, 96, 3),     # stage-3-like: single window per image
    (1, 28, 28, 64, 2),   # 4x4 windows, SB growth
])
def test_nhwc_strip_forward_parity(B, H, W, C, h):
    """The strip-blocked NHWC kernel == partition->reference->reverse."""
    from skinjax.ops.pallas.window_attention import window_attention_nhwc

    x, wqkv, bqkv, wproj, bproj = _nhwc_setup(B, H, W, C, h)
    got = window_attention_nhwc(x, wqkv, bqkv, wproj, bproj, None, None, h, 7)
    want = _nhwc_reference(x, wqkv, bqkv, wproj, bproj, h, 7)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("iface", ["6d", "4d"])
def test_nhwc_strip_gradient_parity(iface):
    """Both kernel interfaces (6-D window view / 4-D NHWC strips) pin their
    full backward against the reference."""
    from skinjax.ops.pallas.window_attention import window_attention_nhwc

    x, wqkv, bqkv, wproj, bproj = _nhwc_setup()

    def loss_k(*a):
        return jnp.sum(jnp.sin(
            window_attention_nhwc(
                *a, None, None, 3, 7, iface).astype(jnp.float32)))

    def loss_r(*a):
        return jnp.sum(jnp.sin(
            _nhwc_reference(*a, 3, 7).astype(jnp.float32)))

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4))(
        x, wqkv, bqkv, wproj, bproj)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(
        x, wqkv, bqkv, wproj, bproj)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=3e-4)


def _nhwc_bias_mask_reference(x, wqkv, bqkv, wproj, bproj, b, m, h, w):
    from skinjax.models.backbones.transformer_zoo import (
        window_partition,
        window_reverse,
    )

    B, H, W, C = x.shape
    y = window_attention_reference(
        window_partition(x, w), wqkv, bqkv, wproj, bproj, h, b, m)
    return window_reverse(y, w, H, W)


@pytest.mark.parametrize("B,H,W,C,h", [
    (2, 14, 14, 96, 3),   # 4 windows: mask sliced per window row
    (2, 7, 7, 96, 3),     # single window
])
def test_nhwc_strip_bias_mask_forward_parity(B, H, W, C, h):
    """Strip kernel with rel-pos bias + per-window mask (the Swin path) ==
    partition->reference->reverse with the same additive terms."""
    from skinjax.ops.pallas.window_attention import window_attention_nhwc

    rng = np.random.default_rng(7)
    x, wqkv, bqkv, wproj, bproj = _nhwc_setup(B, H, W, C, h)
    N = 49
    n_win = (H // 7) * (W // 7)
    b = jnp.asarray(rng.normal(size=(h, N, N)) * 0.1, jnp.float32)
    m = jnp.asarray(
        np.where(rng.uniform(size=(n_win, N, N)) > 0.8, -100.0, 0.0),
        jnp.float32)
    got = window_attention_nhwc(x, wqkv, bqkv, wproj, bproj, b, m, h, 7)
    want = _nhwc_bias_mask_reference(x, wqkv, bqkv, wproj, bproj, b, m, h, 7)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("iface", ["6d", "4d"])
def test_nhwc_strip_bias_mask_gradient_parity(iface):
    """dbias accumulates across grid cells in-kernel; all grads match the
    reference, including the rel-pos bias — on both kernel interfaces
    (the 4-D one is Swin's training default)."""
    from skinjax.ops.pallas.window_attention import window_attention_nhwc

    rng = np.random.default_rng(8)
    x, wqkv, bqkv, wproj, bproj = _nhwc_setup(2, 14, 14, 96, 3)
    b = jnp.asarray(rng.normal(size=(3, 49, 49)) * 0.1, jnp.float32)
    m = jnp.asarray(
        np.where(rng.uniform(size=(4, 49, 49)) > 0.8, -100.0, 0.0),
        jnp.float32)

    def loss_k(x, wqkv, bqkv, wproj, bproj, b):
        return jnp.sum(jnp.sin(window_attention_nhwc(
            x, wqkv, bqkv, wproj, bproj, b, m, 3, 7,
            iface).astype(jnp.float32)))

    def loss_r(x, wqkv, bqkv, wproj, bproj, b):
        return jnp.sum(jnp.sin(_nhwc_bias_mask_reference(
            x, wqkv, bqkv, wproj, bproj, b, m, 3, 7).astype(jnp.float32)))

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4, 5))(
        x, wqkv, bqkv, wproj, bproj, b)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4, 5))(
        x, wqkv, bqkv, wproj, bproj, b)
    names = ["dx", "dwqkv", "dbqkv", "dwproj", "dbproj", "dbias"]
    for n, a, want in zip(names, gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(want),
                                   atol=5e-4, rtol=5e-4, err_msg=n)


def test_swin_block_strip_matches_plain():
    """SwinBlock strip path (NHWC kernel, rolls in XLA) == the partitioned
    XLA path on the same params — shifted block included."""
    from skinjax.models.backbones.transformer_zoo import SwinBlock

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(2, 14, 14, 96)) * 0.5, jnp.float32)
    for shift in (0, 3):
        plain = SwinBlock(96, 3, 7, shift)
        strip = SwinBlock(96, 3, 7, shift, strip_attn=True)
        variables = plain.init(jax.random.key(0), x)
        want = plain.apply(variables, x)
        got = strip.apply(variables, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5, rtol=3e-5,
                                   err_msg=f"shift={shift}")


def test_davit_module_nhwc_fused_matches_unfused():
    """SpatialBlock routes fused_attn through the NHWC strip kernel — same
    params, same output as the unfused XLA path."""
    from skinjax.models.backbones.davit import SpatialBlock

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 14, 14, 96)) * 0.5, jnp.float32)
    fused = SpatialBlock(96, 3, strip_attn=True)
    plain = SpatialBlock(96, 3)
    variables = plain.init(jax.random.key(0), x)
    want = plain.apply(variables, x)
    got = fused.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_winattn_mode_resolution(monkeypatch):
    """Auto default: pallas on TPU, XLA elsewhere; env overrides; the ONNX
    exporter's trace guard wins over everything (the emitter cannot express
    pallas_call)."""
    from skinjax.ops.pallas import window_attention as wa

    monkeypatch.delenv("SKINJAX_WINATTN", raising=False)
    monkeypatch.delenv("SKINJAX_EXPORT_COMPAT", raising=False)
    assert wa.winattn_mode() == ""  # tests run on CPU

    monkeypatch.setattr(wa.jax, "default_backend", lambda: "tpu")
    assert wa.winattn_mode() == "pallas"

    monkeypatch.setenv("SKINJAX_WINATTN", "einsum")
    assert wa.winattn_mode() == "einsum"
    monkeypatch.setenv("SKINJAX_WINATTN", "")
    assert wa.winattn_mode() == ""  # explicit empty = force XLA on TPU

    monkeypatch.setenv("SKINJAX_WINATTN", "pallas")
    monkeypatch.setenv("SKINJAX_EXPORT_COMPAT", "1")
    assert wa.winattn_mode() == ""


def test_model_level_auto_routes_through_kernel(monkeypatch):
    """DaViT/Swin with flags unset resolve winattn_mode() at apply time:
    pallas_call appears in the jaxpr exactly when the mode says pallas,
    and the output matches the XLA path (same params)."""
    from skinjax.models.backbones.davit import DaViT
    from skinjax.models.backbones.transformer_zoo import Swin

    rng = np.random.default_rng(3)
    for model, size in (
        (DaViT(dims=(32, 64), depths=(1, 1), heads=(2, 2)), 56),
        (Swin(dims=(32, 64), depths=(1, 2), heads=(2, 2)), 56),
    ):
        x = jnp.asarray(rng.normal(size=(1, size, size, 3)), jnp.float32)
        monkeypatch.delenv("SKINJAX_WINATTN", raising=False)
        variables = model.init(jax.random.key(0), x)
        want = model.apply(variables, x)
        assert "pallas_call" not in str(
            jax.make_jaxpr(lambda v, a: model.apply(v, a))(variables, x)
        )
        monkeypatch.setenv("SKINJAX_WINATTN", "pallas")
        assert "pallas_call" in str(
            jax.make_jaxpr(lambda v, a: model.apply(v, a))(variables, x)
        )
        got = model.apply(variables, x)  # interpret-mode kernel on CPU
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-5, rtol=5e-5)
