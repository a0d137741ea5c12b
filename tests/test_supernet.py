"""Masked-supernet exactness + vmapped population NAS training.

The supernet must reproduce DynamicCNN (the reference NAS search-space model,
dynamicMultimodalmodel.py:6-219) EXACTLY for every candidate in the envelope:
forward logits, and gradients on the candidate's live parameters — that is
what licenses training K candidates in one vmapped program without changing
search semantics.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from skinjax.data import synthetic_source
from skinjax.nas import (
    SuperNet,
    candidate_masks,
    embed_params,
    envelope_of,
    make_dynamic_model,
    run_nas,
)
from skinjax.nas.population import PopulationTrainer
from skinjax.train.kfold import SubsetSource
from skinjax.train.loop import TrainConfig

# the maximal config per pooling mode forces real masking in every envelope
MAX_POOL = {
    "num_blocks": 3, "initial_filters": 32, "kernel_size": 5,
    "layers_per_block": 2, "use_pooling": True, "common_dim": 64,
    "attention_mecanism": "gfcam", "num_layers_text_fc": 3,
    "neurons_per_layer_size_of_text_fc": 64, "num_layers_fc_module": 2,
    "neurons_per_layer_size_of_fc_module": 64,
}

CANDIDATES = [
    {"num_blocks": 2, "initial_filters": 16, "kernel_size": 3,
     "layers_per_block": 1, "use_pooling": True, "common_dim": 32,
     "attention_mecanism": "concatenation", "num_layers_text_fc": 1,
     "neurons_per_layer_size_of_text_fc": 32, "num_layers_fc_module": 1,
     "neurons_per_layer_size_of_fc_module": 32},
    {"num_blocks": 3, "initial_filters": 32, "kernel_size": 5,
     "layers_per_block": 2, "use_pooling": True, "common_dim": 64,
     "attention_mecanism": "crossattention", "num_layers_text_fc": 2,
     "neurons_per_layer_size_of_text_fc": 64, "num_layers_fc_module": 2,
     "neurons_per_layer_size_of_fc_module": 64},
    {"num_blocks": 1, "initial_filters": 8, "kernel_size": 3,
     "layers_per_block": 2, "use_pooling": True, "common_dim": 16,
     "attention_mecanism": "metablock", "num_layers_text_fc": 1,
     "neurons_per_layer_size_of_text_fc": 16, "num_layers_fc_module": 2,
     "neurons_per_layer_size_of_fc_module": 32},
    {"num_blocks": 2, "initial_filters": 16, "kernel_size": 3,
     "layers_per_block": 1, "use_pooling": True, "common_dim": 64,
     "attention_mecanism": "gfcam", "num_layers_text_fc": 3,
     "neurons_per_layer_size_of_text_fc": 32, "num_layers_fc_module": 1,
     "neurons_per_layer_size_of_fc_module": 64},
]

VOCAB, CLASSES = 11, 4


def _data(batch=3, size=16, seed=0):
    rng = np.random.default_rng(seed)
    img = jnp.asarray(rng.normal(size=(batch, size, size, 3)), jnp.float32)
    md = jnp.asarray(rng.normal(size=(batch, VOCAB)), jnp.float32)
    lb = jnp.asarray(rng.integers(0, CLASSES, batch), jnp.int32)
    return img, md, lb


def _pair(config):
    """(candidate model+params, supernet model+embedded params+masks)."""
    env = envelope_of([config, MAX_POOL])
    img, md, _ = _data()
    cand_model = make_dynamic_model(config, num_classes=CLASSES, vocab_size=VOCAB)
    cand = cand_model.init(jax.random.key(1), img, md)["params"]
    sup_model = SuperNet(env, num_classes=CLASSES, vocab_size=VOCAB)
    masks = jax.tree_util.tree_map(
        jnp.asarray, candidate_masks(config, env)
    )
    sup0 = sup_model.init(jax.random.key(2), img, md, masks)["params"]
    sup = embed_params(cand, sup0, config, env)
    return cand_model, cand, sup_model, sup, masks


@pytest.mark.parametrize("config", CANDIDATES,
                         ids=[c["attention_mecanism"] + str(i)
                              for i, c in enumerate(CANDIDATES)])
def test_masked_forward_matches_candidate(config):
    cand_model, cand, sup_model, sup, masks = _pair(config)
    img, md, _ = _data()
    want = cand_model.apply({"params": cand}, img, md)
    got = sup_model.apply({"params": sup}, img, md, masks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_two_adam_steps_match_candidate():
    """End-to-end gradient exactness: two Adam steps on supernet(masked) and
    on the standalone candidate give identical logits afterwards — covers
    grads, masking dead-paths, and optimizer interaction in one check."""
    config = CANDIDATES[1]
    cand_model, cand, sup_model, sup, masks = _pair(config)
    img, md, lb = _data()
    tx = optax.adam(1e-3)

    def fit(apply_fn, params):
        opt = tx.init(params)
        for _ in range(2):
            def loss_of(p):
                logits = apply_fn(p)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits.astype(jnp.float32), lb
                ).mean()

            grads = jax.grad(lambda p: loss_of(p))(params)
            updates, opt = tx.update(grads, opt, params)
            params = optax.apply_updates(params, updates)
        return apply_fn(params)

    want = fit(lambda p: cand_model.apply({"params": p}, img, md), cand)
    got = fit(lambda p: sup_model.apply({"params": p}, img, md, masks), sup)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=5e-5)


def test_vmapped_population_matches_per_candidate_forward():
    """The stacked (params, masks) vmap reproduces each candidate's forward."""
    env = envelope_of(CANDIDATES)
    img, md, _ = _data()
    sup_model = SuperNet(env, num_classes=CLASSES, vocab_size=VOCAB)
    packs = []
    for i, config in enumerate(CANDIDATES):
        cand_model = make_dynamic_model(config, num_classes=CLASSES,
                                        vocab_size=VOCAB)
        cand = cand_model.init(jax.random.key(10 + i), img, md)["params"]
        masks = candidate_masks(config, env)
        sup0 = sup_model.init(
            jax.random.key(0), img, md,
            jax.tree_util.tree_map(jnp.asarray, masks),
        )["params"]
        want = cand_model.apply({"params": cand}, img, md)
        packs.append((embed_params(cand, sup0, config, env), masks, want))

    params = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                    *[p for p, _, _ in packs])
    masks = jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
        *[m for _, m, _ in packs])
    got = jax.vmap(
        lambda p, m: sup_model.apply({"params": p}, img, md, m)
    )(params, masks)
    for ki, (_, _, want) in enumerate(packs):
        np.testing.assert_allclose(np.asarray(got[ki]), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)


def test_population_trainer_end_to_end():
    src = synthetic_source(n=48, image_size=(16, 16), feature_dim=VOCAB,
                           num_classes=CLASSES, seed=3)
    idx = np.arange(len(src))
    trainer = PopulationTrainer(
        SubsetSource(src, idx[:36]), SubsetSource(src, idx[36:]),
        num_classes=CLASSES,
        config=TrainConfig(num_epochs=2, batch_size=12,
                           early_stopping_patience=2,
                           early_stopping_metric="val_bacc",
                           image_dtype="float32"),
        vocab_size=VOCAB,
    )
    rewards = trainer.evaluate(CANDIDATES)
    assert len(rewards) == len(CANDIDATES)
    assert all(0.0 <= r <= 1.0 for r in rewards)


def test_population_pad_width_rewards_identical():
    """pad_width fills buckets with clones of the last config so every
    envelope compiles one fixed-width program; rewards must be identical
    to the unpadded bucket (clones are config-keyed for init/dropout and
    sliced off)."""
    src = synthetic_source(n=48, image_size=(16, 16), feature_dim=VOCAB,
                           num_classes=CLASSES, seed=5)
    idx = np.arange(len(src))
    kw = dict(
        num_classes=CLASSES,
        config=TrainConfig(num_epochs=2, batch_size=12,
                           early_stopping_patience=2,
                           early_stopping_metric="val_bacc",
                           image_dtype="float32"),
        vocab_size=VOCAB,
        exact_init=True,
    )
    plain = PopulationTrainer(
        SubsetSource(src, idx[:36]), SubsetSource(src, idx[36:]), **kw)
    padded = PopulationTrainer(
        SubsetSource(src, idx[:36]), SubsetSource(src, idx[36:]),
        pad_width=4, **kw)
    subset = CANDIDATES[:2]
    r_plain = plain.evaluate(subset)
    r_padded = padded.evaluate(subset)
    assert len(r_padded) == len(subset)
    np.testing.assert_allclose(r_plain, r_padded, atol=1e-6)


def test_population_fixed_envelope_program_reuse():
    """§5e-r4 follow-up (a): with ``fixed_envelope`` (a search-space dict),
    a bucket's envelope pins all width dims to the SPACE maxima, so program
    identity follows the bucket KEY alone — a config re-evaluated later in
    a different grouping reuses the cached program and draws the identical
    reward (the memoization premise, now strict: without the fix the
    envelope's widths track each bucket's sampled contents and the same
    bucket recompiles whenever its max widths change)."""
    space = {
        "num_blocks": [1, 2, 3], "initial_filters": [8, 16, 32],
        "kernel_size": [3, 5], "layers_per_block": [1, 2],
        "use_pooling": [True], "common_dim": [16, 32, 64],
        "attention_mecanism": ["concatenation", "crossattention",
                               "metablock", "gfcam"],
        "num_layers_text_fc": [1, 2, 3],
        "neurons_per_layer_size_of_text_fc": [16, 32, 64],
        "num_layers_fc_module": [1, 2],
        "neurons_per_layer_size_of_fc_module": [32, 64],
    }
    src = synthetic_source(n=48, image_size=(16, 16), feature_dim=VOCAB,
                           num_classes=CLASSES, seed=7)
    idx = np.arange(len(src))
    trainer = PopulationTrainer(
        SubsetSource(src, idx[:36]), SubsetSource(src, idx[36:]),
        num_classes=CLASSES,
        config=TrainConfig(num_epochs=2, batch_size=12,
                           early_stopping_patience=2,
                           early_stopping_metric="val_bacc",
                           image_dtype="float32"),
        vocab_size=VOCAB, exact_init=True, pad_width=4,
        fixed_envelope=space,
    )
    r1 = trainer.evaluate(CANDIDATES)
    assert len(r1) == len(CANDIDATES)
    assert all(r is not None and 0.0 <= r <= 1.0 for r in r1)
    # CANDIDATES span 3 bucket keys: (nb=2,ks=3), (nb=3,ks=5), (nb=1,ks=3)
    # -> exactly 3 cached programs, width-padded to 4 each
    assert len(trainer._programs) == 3, list(trainer._programs)
    # re-evaluating two of the configs in a different grouping reuses the
    # cached programs (no new compiles) and reproduces rewards exactly
    r2 = trainer.evaluate([CANDIDATES[2], CANDIDATES[0]])
    assert len(trainer._programs) == 3
    np.testing.assert_allclose(r2, [r1[2], r1[0]], atol=1e-6)


def test_run_nas_population_and_memoization():
    src = synthetic_source(n=40, image_size=(16, 16), feature_dim=VOCAB,
                           num_classes=CLASSES, seed=4)
    space = {
        "num_blocks": [1], "initial_filters": [8], "kernel_size": [3],
        "layers_per_block": [1], "use_pooling": [True], "common_dim": [16],
        "attention_mecanism": ["concatenation", "metablock"],
        "num_layers_text_fc": [1], "neurons_per_layer_size_of_text_fc": [16],
        "num_layers_fc_module": [1],
        "neurons_per_layer_size_of_fc_module": [32],
    }
    best_cfg, best_reward, log = run_nas(
        src, num_classes=CLASSES, strategy="random", search_steps=6,
        search_space=space, population_size=3,
        train_cfg=TrainConfig(num_epochs=1, batch_size=10,
                              early_stopping_patience=1,
                              early_stopping_metric="val_bacc",
                              image_dtype="float32"),
        results_dir="/tmp/nas_pop_test", seed=0,
    )
    assert len(log) == 6
    assert best_cfg is not None and 0.0 <= best_reward <= 1.0
    # 2-config space, 6 draws: pigeonhole guarantees repeats -> memo hits
    assert any(e.get("cached") for e in log)
    # every repeat of a config earned exactly the cached reward
    by_key = {}
    for e in log:
        key = tuple(sorted((k, str(v)) for k, v in e["config"].items()))
        by_key.setdefault(key, set()).add(round(e["reward"], 9))
    assert all(len(v) == 1 for v in by_key.values())


def test_population_sharded_over_mesh_matches_unsharded():
    """pjit across candidates (SURVEY §7): stacked candidate axis sharded
    one-per-device over the 8-device CPU mesh; rewards match the unsharded
    run (deterministic trainer)."""
    from jax.sharding import Mesh

    devices = np.array(jax.devices())
    if devices.size < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(devices[:8].reshape(8), axis_names=("data",))

    # 8 candidates in ONE bucket (same pooling/blocks/kernel)
    base = CANDIDATES[0]
    pop = []
    for i in range(8):
        c = dict(base)
        c["common_dim"] = [16, 32, 64][i % 3]
        c["attention_mecanism"] = ["concatenation", "crossattention",
                                   "metablock", "gfcam"][i % 4]
        pop.append(c)

    src = synthetic_source(n=40, image_size=(16, 16), feature_dim=VOCAB,
                           num_classes=CLASSES, seed=5)
    idx = np.arange(len(src))
    cfg = TrainConfig(num_epochs=1, batch_size=10, early_stopping_patience=1,
                      early_stopping_metric="val_bacc", image_dtype="float32")

    def run(mesh_arg):
        tr = PopulationTrainer(
            SubsetSource(src, idx[:32]), SubsetSource(src, idx[32:]),
            num_classes=CLASSES, config=cfg, vocab_size=VOCAB, mesh=mesh_arg)
        return tr.evaluate(pop)

    plain = run(None)
    sharded = run(mesh)
    np.testing.assert_allclose(sharded, plain, atol=1e-4)


def test_masked_forward_no_pooling_envelope():
    """use_pooling=False population (deep spatial maps, no pool guard)."""
    config = {"num_blocks": 2, "initial_filters": 16, "kernel_size": 3,
              "layers_per_block": 1, "use_pooling": False, "common_dim": 32,
              "attention_mecanism": "concatenation", "num_layers_text_fc": 1,
              "neurons_per_layer_size_of_text_fc": 32,
              "num_layers_fc_module": 1,
              "neurons_per_layer_size_of_fc_module": 32}
    maxi = dict(MAX_POOL, use_pooling=False)
    env = envelope_of([config, maxi])
    img, md, _ = _data(size=12)
    cand_model = make_dynamic_model(config, num_classes=CLASSES,
                                    vocab_size=VOCAB)
    cand = cand_model.init(jax.random.key(1), img, md)["params"]
    sup_model = SuperNet(env, num_classes=CLASSES, vocab_size=VOCAB)
    masks = jax.tree_util.tree_map(jnp.asarray, candidate_masks(config, env))
    sup0 = sup_model.init(jax.random.key(2), img, md, masks)["params"]
    sup = embed_params(cand, sup0, config, env)
    want = cand_model.apply({"params": cand}, img, md)
    got = sup_model.apply({"params": sup}, img, md, masks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_population_exact_init_matches_candidate_first_eval():
    """exact_init=True: the vmapped candidate starts from the SAME params
    its standalone DynamicCNN init would draw (embedded layout)."""
    src = synthetic_source(n=24, image_size=(12, 12), feature_dim=VOCAB,
                           num_classes=CLASSES, seed=6)
    idx = np.arange(len(src))
    trainer = PopulationTrainer(
        SubsetSource(src, idx[:18]), SubsetSource(src, idx[18:]),
        num_classes=CLASSES,
        config=TrainConfig(num_epochs=1, batch_size=6,
                           early_stopping_patience=1,
                           early_stopping_metric="val_bacc",
                           image_dtype="float32"),
        vocab_size=VOCAB, exact_init=True,
    )
    rewards = trainer.evaluate(CANDIDATES[:2])
    assert len(rewards) == 2 and all(0.0 <= r <= 1.0 for r in rewards)


def test_run_nas_reinforce_with_population():
    """REINFORCE + vmapped population: controller updates consume per-sample
    rewards from grouped evaluations, entropy/baseline stats intact."""
    src = synthetic_source(n=40, image_size=(16, 16), feature_dim=VOCAB,
                           num_classes=CLASSES, seed=8)
    space = {
        "num_blocks": [1, 2], "initial_filters": [8], "kernel_size": [3],
        "layers_per_block": [1], "use_pooling": [True], "common_dim": [16],
        "attention_mecanism": ["concatenation", "gfcam"],
        "num_layers_text_fc": [1], "neurons_per_layer_size_of_text_fc": [16],
        "num_layers_fc_module": [1],
        "neurons_per_layer_size_of_fc_module": [32],
    }
    best_cfg, best_reward, log = run_nas(
        src, num_classes=CLASSES, strategy="reinforce", search_steps=4,
        search_space=space, population_size=2,
        train_cfg=TrainConfig(num_epochs=1, batch_size=10,
                              early_stopping_patience=1,
                              early_stopping_metric="val_bacc",
                              image_dtype="float32"),
        results_dir="/tmp/nas_pop_reinforce_test", seed=0,
    )
    assert len(log) == 4 and best_cfg is not None
    # REINFORCE stats flow through grouped evaluation
    assert all("entropy" in e or "baseline" in e or "reward" in e for e in log)


def test_masked_forward_matches_candidate_bf16_input():
    """bfloat16 input pipeline (the TrainConfig default): both nets promote
    bf16 image x f32 kernel to f32 compute — exactness must survive."""
    config = CANDIDATES[0]
    cand_model, cand, sup_model, sup, masks = _pair(config)
    img, md, _ = _data()
    img16 = img.astype(jnp.bfloat16)
    want = cand_model.apply({"params": cand}, img16, md)
    got = sup_model.apply({"params": sup}, img16, md, masks)
    assert got.dtype == want.dtype
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-5, rtol=2e-5)


def test_failed_candidate_isolated_from_bucket_mates():
    """One pathological config must not zero its bucket-mates' rewards; it
    scores None (run_nas: controller sees 0.0 but no memo entry)."""
    src = synthetic_source(n=32, image_size=(12, 12), feature_dim=VOCAB,
                           num_classes=CLASSES, seed=7)
    idx = np.arange(len(src))
    trainer = PopulationTrainer(
        SubsetSource(src, idx[:24]), SubsetSource(src, idx[24:]),
        num_classes=CLASSES,
        config=TrainConfig(num_epochs=1, batch_size=8,
                           early_stopping_patience=1,
                           early_stopping_metric="val_bacc",
                           image_dtype="float32"),
        vocab_size=VOCAB,
    )
    good = CANDIDATES[0]
    bad = dict(good, attention_mecanism="not-a-mechanism")
    rewards = trainer.evaluate([good, bad, good])
    assert rewards[1] is None
    assert rewards[0] is not None and 0.0 <= rewards[0] <= 1.0
    assert rewards[2] == rewards[0]


def test_partial_config_uses_dynamiccnn_defaults():
    """Configs valid for the sequential path (DynamicCNN cfg.get defaults)
    must bucket/envelope instead of KeyError-ing."""
    src = synthetic_source(n=24, image_size=(12, 12), feature_dim=VOCAB,
                           num_classes=CLASSES, seed=9)
    idx = np.arange(len(src))
    trainer = PopulationTrainer(
        SubsetSource(src, idx[:18]), SubsetSource(src, idx[18:]),
        num_classes=CLASSES,
        config=TrainConfig(num_epochs=1, batch_size=6,
                           early_stopping_patience=1,
                           early_stopping_metric="val_bacc",
                           image_dtype="float32"),
        vocab_size=VOCAB,
    )
    rewards = trainer.evaluate([
        {"num_blocks": 1, "initial_filters": 8, "common_dim": 16,
         "neurons_per_layer_size_of_text_fc": 16,
         "neurons_per_layer_size_of_fc_module": 32,
         "num_layers_fc_module": 1, "num_layers_text_fc": 1,
         "layers_per_block": 1},
    ])
    assert rewards[0] is not None and 0.0 <= rewards[0] <= 1.0


def test_population_reward_bucket_position_independent():
    """The same candidate trained at different positions with different
    bucket-mates (same ENVELOPE — envelope width still shapes dropout draws,
    see make_population_evaluator) earns the SAME reward: init AND dropout
    keys derive from the config, not bucket position (advisor r2 —
    positional split keys made memoized rewards bucket-dependent)."""
    src = synthetic_source(n=40, image_size=(16, 16), feature_dim=VOCAB,
                           num_classes=CLASSES, seed=11)
    idx = np.arange(len(src))
    cfg = TrainConfig(num_epochs=2, batch_size=10, early_stopping_patience=2,
                      early_stopping_metric="val_bacc", image_dtype="float32")

    def rewards_of(pop):
        tr = PopulationTrainer(
            SubsetSource(src, idx[:32]), SubsetSource(src, idx[32:]),
            num_classes=CLASSES, config=cfg, vocab_size=VOCAB)
        return tr.evaluate(pop)

    target = CANDIDATES[0]
    # mates stay within target's dims so both groups share one envelope
    mates_a = [dict(target, common_dim=16),
               dict(target, attention_mecanism="crossattention")]
    mates_b = [dict(target, common_dim=16,
                    attention_mecanism="metablock")]
    r_first = rewards_of([target] + mates_a)[0]
    r_last = rewards_of(mates_b + [target])[-1]
    assert r_first == pytest.approx(r_last, abs=1e-6)


def test_population_vs_sequential_reward_shift_magnitude():
    """Quantify the documented population/sequential reward-semantics gap
    (VERDICT r2 weak #8): with patience >= epochs the early-stop policies
    coincide, so the remaining shift is only the stochastic-stream and
    supernet-embedding difference — it must be small on a learnable task."""
    from skinjax.nas.search import _default_trainer

    src = synthetic_source(n=50, image_size=(16, 16), feature_dim=VOCAB,
                           num_classes=CLASSES, seed=12)
    cfg = TrainConfig(num_epochs=2, batch_size=10, early_stopping_patience=3,
                      early_stopping_metric="val_bacc", image_dtype="float32")
    seq = _default_trainer(src, CLASSES, cfg, seed=0)
    from skinjax.nas.population import make_population_evaluator

    pop = make_population_evaluator(src, CLASSES, train_cfg=cfg, seed=0)
    shifts = []
    for cand in CANDIDATES[:2]:
        r_seq = seq(cand)
        r_pop = pop([cand])[0]
        shifts.append(abs(r_seq - r_pop))
    # the two paths see the same split and the same data; rewards may differ
    # through dropout/augment stream derivation but not systematically
    assert max(shifts) <= 0.35, shifts


def test_population_hbm_width_cap_rewards_identical(monkeypatch):
    """A bucket whose envelope exceeds the HBM budget trains in capped-width
    chunks; rewards must match the single-vmap bucket. The 4 configs are
    built so every chunk's envelope equals the full bucket's (per-field
    maxes and mechanism sets match), making rewards exactly comparable."""
    from skinjax.nas.population import (
        envelope_step_bytes,
        hbm_width_cap,
    )
    from skinjax.nas.supernet import envelope_of

    base = dict(CANDIDATES[0])
    A = dict(base, attention_mecanism="concatenation", common_dim=32,
             neurons_per_layer_size_of_text_fc=32, num_layers_text_fc=1,
             num_layers_fc_module=1, neurons_per_layer_size_of_fc_module=32)
    B = dict(base, attention_mecanism="gfcam", common_dim=64,
             neurons_per_layer_size_of_text_fc=64, num_layers_text_fc=2,
             num_layers_fc_module=2, neurons_per_layer_size_of_fc_module=64)
    C = dict(base, attention_mecanism="concatenation", common_dim=64,
             neurons_per_layer_size_of_text_fc=32, num_layers_text_fc=2,
             num_layers_fc_module=1, neurons_per_layer_size_of_fc_module=64)
    D = dict(base, attention_mecanism="gfcam", common_dim=32,
             neurons_per_layer_size_of_text_fc=64, num_layers_text_fc=1,
             num_layers_fc_module=2, neurons_per_layer_size_of_fc_module=32)
    group = [A, B, C, D]
    env = envelope_of(group)
    assert envelope_of([A, B]) == envelope_of([C, D]) == env

    src = synthetic_source(n=48, image_size=(16, 16), feature_dim=VOCAB,
                           num_classes=CLASSES, seed=5)
    idx = np.arange(len(src))
    kw = dict(
        num_classes=CLASSES,
        config=TrainConfig(num_epochs=2, batch_size=12,
                           early_stopping_patience=5,
                           early_stopping_metric="val_bacc",
                           image_dtype="float32"),
        vocab_size=VOCAB,
        exact_init=True,
    )
    full = PopulationTrainer(
        SubsetSource(src, idx[:36]), SubsetSource(src, idx[36:]), **kw)
    r_full = full.evaluate(group)

    per = envelope_step_bytes(env, (16, 16), 12)
    monkeypatch.setenv("SKINJAX_POP_HBM_GB", f"{2.5 * per / 1e9:.12f}")
    assert hbm_width_cap(env, (16, 16), 12) == 2
    capped = PopulationTrainer(
        SubsetSource(src, idx[:36]), SubsetSource(src, idx[36:]), **kw)
    r_capped = capped.evaluate(group)
    np.testing.assert_allclose(r_full, r_capped, atol=1e-6)


def test_envelope_step_bytes_scales():
    """Pooling shrinks the estimate; width/depth grow it monotonically."""
    from skinjax.nas.population import envelope_step_bytes
    from skinjax.nas.supernet import envelope_of

    small = envelope_of([dict(CANDIDATES[0])])
    nopool = envelope_of([dict(CANDIDATES[0], use_pooling=False)])
    deep = envelope_of([dict(CANDIDATES[0], num_blocks=5,
                             initial_filters=64, use_pooling=False)])
    b = lambda e: envelope_step_bytes(e, (64, 64), 32)
    assert b(small) < b(nopool) < b(deep)
    # the measured OOM case: 10-block no-pooling 64-filter env at 64x64,
    # B=32 — the estimator must flag that K=8 cannot fit 11 GB
    huge = envelope_of([dict(CANDIDATES[0], num_blocks=10,
                             initial_filters=64, use_pooling=False,
                             layers_per_block=2)])
    from skinjax.nas.population import hbm_width_cap
    assert hbm_width_cap(huge, (64, 64), 32) < 8
