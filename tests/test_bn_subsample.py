"""SubsampledStatsBatchNorm: stats match full-batch stats closely, the
param/batch_stats tree is nn.BatchNorm-compatible, and training converges.
(The throughput opt-in SKINJAX_BN_SUBSAMPLE; docs/DESIGN.md §5.)"""

import numpy as np
import jax
import jax.numpy as jnp

from skinjax.models.backbones.resnet import SubsampledStatsBatchNorm
from flax import linen as nn


def test_tree_compatible_and_stats_close():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(2.0, 3.0, size=(16, 32, 32, 8)), jnp.float32)
    sub = SubsampledStatsBatchNorm(stride=2)
    ref = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    vs = sub.init(jax.random.key(0), x)
    vr = ref.init(jax.random.key(0), x)
    # identical variable trees (checkpoint/importer compatible)
    assert jax.tree_util.tree_structure(vs) == jax.tree_util.tree_structure(vr)

    ys, ms = sub.apply(vs, x, mutable=["batch_stats"])
    yr, mr = ref.apply(vr, x, mutable=["batch_stats"])
    # subsampled stats ≈ full stats on 16·16·16=4096 samples/channel
    np.testing.assert_allclose(np.asarray(ms["batch_stats"]["mean"]),
                               np.asarray(mr["batch_stats"]["mean"]),
                               atol=0.15)
    # outputs near the exact normalization
    assert float(jnp.abs(ys - yr).mean()) < 0.05


def test_eval_mode_matches_batchnorm_exactly():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 8, 8, 8)), jnp.float32)
    sub = SubsampledStatsBatchNorm(stride=2, use_running_average=True)
    ref = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5)
    v = ref.init(jax.random.key(0), x)
    v = jax.tree_util.tree_map(
        lambda a: a + 0.3 if a.ndim else a, v)  # non-trivial stats
    np.testing.assert_allclose(np.asarray(sub.apply(v, x)),
                               np.asarray(ref.apply(v, x)), atol=1e-5)


def test_training_converges_with_subsampled_stats():
    import optax

    rng = np.random.default_rng(2)
    xn = rng.normal(size=(32, 16, 16, 3)).astype(np.float32)
    yn = (xn[:, :, :, 0].mean(axis=(1, 2)) > 0).astype(np.int32)
    xn[:, 0, 0, 1] = yn * 2.0 - 1.0  # embed a crisp learnable signal
    x, y = jnp.asarray(xn), jnp.asarray(yn)

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            x = nn.Conv(8, (3, 3), name="conv")(x)
            x = SubsampledStatsBatchNorm(
                stride=2, use_running_average=not train, name="bn")(x)
            x = nn.relu(x).mean(axis=(1, 2))
            return nn.Dense(2, name="head")(x)

    net = Net()
    variables = net.init(jax.random.key(0), x)
    params, stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(5e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, stats, opt):
        def loss_of(p):
            out, mut = net.apply({"params": p, "batch_stats": stats}, x,
                                 mutable=["batch_stats"])
            return optax.softmax_cross_entropy_with_integer_labels(
                out, y).mean(), mut["batch_stats"]

        (l, new_stats), g = jax.value_and_grad(loss_of, has_aux=True)(params)
        u, opt = tx.update(g, opt)
        return optax.apply_updates(params, u), new_stats, opt, l

    losses = []
    for _ in range(80):
        params, stats, opt, l = step(params, stats, opt)
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.5, losses[::20]


def test_space_to_depth_stem_exact():
    """_SpaceToDepthConv7x7s2 == Conv(7x7, s2, pad 3) bit-for-bit math
    (same kernel param tree, so checkpoints/importers are unaffected)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn

    from skinjax.models.backbones.resnet import _SpaceToDepthConv7x7s2

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    ref = nn.Conv(16, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2,
                  use_bias=False)
    params = ref.init(jax.random.key(0), x)["params"]
    want = ref.apply({"params": params}, x)
    got = _SpaceToDepthConv7x7s2(16).apply({"params": params}, x)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
