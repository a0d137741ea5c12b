"""ConvPosEnc shift-add formulation == depthwise conv (exact math, same
param tree) — fwd and grads. SKINJAX_CPE=shift swaps the implementation
under the davit backbones (docs/DESIGN.md §5b)."""

import numpy as np
import jax
import jax.numpy as jnp

from skinjax.models.backbones.davit import ConvPosEnc


def test_shift_cpe_matches_conv():
    conv = ConvPosEnc(16, shift_impl=False)
    shift = ConvPosEnc(16, shift_impl=True)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 16)),
                    jnp.float32)
    variables = conv.init(jax.random.key(0), x)
    # same param tree: shift must consume conv's params verbatim
    y_conv = conv.apply(variables, x)
    y_shift = shift.apply(variables, x)
    np.testing.assert_allclose(np.asarray(y_shift), np.asarray(y_conv),
                               atol=1e-5, rtol=1e-5)

    def loss(fn):
        def f(params, x):
            return jnp.sum(fn.apply({"params": params}, x) ** 2)
        return f

    g_conv = jax.grad(loss(conv), argnums=(0, 1))(variables["params"], x)
    g_shift = jax.grad(loss(shift), argnums=(0, 1))(variables["params"], x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4),
        g_conv, g_shift,
    )


def test_identity_probe_keeps_param_tree():
    conv = ConvPosEnc(16, shift_impl=False)
    x = jnp.zeros((1, 4, 4, 16), jnp.float32)
    v_conv = conv.init(jax.random.key(0), x)
    import os
    os.environ["SKINJAX_CPE"] = "identity"
    try:
        ident = ConvPosEnc(16)
        v_id = ident.init(jax.random.key(0), x)
        assert jax.tree_util.tree_structure(v_conv) == \
            jax.tree_util.tree_structure(v_id)
        shapes = lambda t: jax.tree_util.tree_map(lambda a: a.shape, t)
        assert shapes(v_conv) == shapes(v_id)
        np.testing.assert_array_equal(
            np.asarray(ident.apply(v_conv, x)), np.asarray(x))
    finally:
        del os.environ["SKINJAX_CPE"]
