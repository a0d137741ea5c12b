"""XAI tests: CAM shapes/properties, flip-rate, uncertainty, FDS,
missing-data simulator, LIME/SHAP sanity."""

import numpy as np
import pandas as pd
import pytest
import jax
import jax.numpy as jnp

from skinjax.data.featurizer import MetadataFeaturizer
from skinjax.models import MultimodalModel
from skinjax.xai import (
    cam_methods_comparison,
    default_pad20_mutations,
    faithfulness_degradation_score,
    grad_cam,
    grad_cam_pp,
    js_divergence,
    kernel_shap,
    lime_tabular,
    missing_data_sweep,
    prediction_uncertainty,
    run_flip_analysis,
    score_cam,
    simulate_missing_metadata,
)

B, HW, VOCAB, NCLS = 2, 32, 8, 4


@pytest.fixture(scope="module")
def cam_setup():
    model = MultimodalModel(
        num_classes=NCLS, num_heads=4, cnn_model_name="resnet-18", common_dim=32,
        text_encoder_dim_output=32, vocab_size=VOCAB,
        attention_mechanism="concatenation",
    )
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(B, HW, HW, 3)), jnp.float32)
    meta = jnp.asarray(rng.normal(size=(B, VOCAB)), jnp.float32)
    variables = model.init(jax.random.key(0), img, meta)
    cls = jnp.asarray(rng.integers(0, NCLS, B), jnp.int32)
    return model, variables, img, meta, cls


def test_grad_cam_shape_range(cam_setup):
    model, variables, img, meta, cls = cam_setup
    cam = grad_cam(model, variables, img, meta, cls)
    assert cam.shape == (B, HW, HW)
    c = np.asarray(cam)
    assert c.min() >= 0.0 and c.max() <= 1.0 + 1e-6
    assert np.isfinite(c).all()


def test_grad_cam_pp_shape(cam_setup):
    model, variables, img, meta, cls = cam_setup
    cam = grad_cam_pp(model, variables, img, meta, cls)
    assert cam.shape == (B, HW, HW)
    assert np.isfinite(np.asarray(cam)).all()


def test_score_cam_shape(cam_setup):
    model, variables, img, meta, cls = cam_setup
    cam = score_cam(model, variables, img, meta, cls, top_k=8, batch_channels=4)
    assert cam.shape == (B, HW, HW)
    assert np.isfinite(np.asarray(cam)).all()


def test_cam_methods_comparison_panel(cam_setup, tmp_path):
    """Side-by-side original/ScoreCAM/GradCAM/GradCAM++ figure
    (cam_methods_comparison.py:20-45): one 1×4 PNG per sample."""
    model, variables, img, meta, cls = cam_setup
    out = str(tmp_path / "cams.png")
    written = cam_methods_comparison(
        model, variables, img, meta, cls, out, score_cam_top_k=8
    )
    assert len(written) == B
    for p in written:
        assert (tmp_path / p.split("/")[-1]).stat().st_size > 0


def _toy_prepared(n=40, seed=0):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "smoke": rng.choice(["True", "False"], n),
        "region": rng.choice(["ARM", "FACE", "NECK"], n),
        "gender": rng.choice(["MALE", "FEMALE"], n),
        "age": rng.integers(20, 90, n).astype(float),
        "diameter_1": rng.uniform(1, 9, n),
    })
    fz = MetadataFeaturizer(
        categorical_cols=["smoke", "region", "gender"],
        numerical_cols=["age", "diameter_1"],
    )
    fz.fit({c: df[c].to_numpy() for c in df.columns}, ["x"])
    return df, fz


def _linear_predictor(F, K=3, seed=1):
    W = np.random.default_rng(seed).normal(size=(F, K))

    def predict(features):
        z = features @ W
        e = np.exp(z - z.max(axis=1, keepdims=True))
        return e / e.sum(axis=1, keepdims=True)

    return predict, W


def test_flip_analysis(n=40):
    df, fz = _toy_prepared(n)
    predict, _ = _linear_predictor(fz.dim)
    res = run_flip_analysis(predict, df, fz)
    assert "smoke" in res["mutations"] and "region" in res["mutations"]
    for name, r in res["mutations"].items():
        assert 0.0 <= r["flip_rate"] <= 1.0
        assert r["transition_matrix"].sum() == n
        # diagonal counts = non-flips
        assert np.trace(r["transition_matrix"]) == n - r["n_flips"]


def test_uncertainty_and_fds():
    rng = np.random.default_rng(0)
    p = rng.dirichlet(np.ones(4), 50)
    assert np.allclose(js_divergence(p, p), 0, atol=1e-9)
    q = rng.dirichlet(np.ones(4), 50)
    u = prediction_uncertainty(p, q)
    assert u["js"] > 0 and u["kl"] > 0
    assert faithfulness_degradation_score(p, p) < 1e-9
    fds = faithfulness_degradation_score(p, q)
    assert 0 < fds <= 1.0


def test_missing_data_simulator_rates():
    df, fz = _toy_prepared(n=500)
    out = simulate_missing_metadata(df, 0.3, seed=7, categorical_cols=fz.categorical_cols,
                                    numerical_cols=fz.numerical_cols)
    frac_empty = (out["smoke"] == "EMPTY").mean()
    assert 0.2 < frac_empty < 0.4
    frac_neg = (out["age"] == -1).mean()
    assert 0.2 < frac_neg < 0.4
    # determinism
    out2 = simulate_missing_metadata(df, 0.3, seed=7, categorical_cols=fz.categorical_cols,
                                     numerical_cols=fz.numerical_cols)
    pd.testing.assert_frame_equal(out, out2)


def test_missing_data_sweep_rows():
    df, fz = _toy_prepared(n=60)
    predict, W = _linear_predictor(fz.dim, K=3)
    feats = fz.transform({c: df[c].to_numpy() for c in df.columns})
    labels = predict(feats).argmax(1)
    rows = missing_data_sweep(predict, df, fz, labels, fold=1, rates=(0.0, 0.5))
    assert len(rows) == 2
    assert rows[0]["accuracy"] == 1.0  # rate 0 reproduces its own labels
    assert rows[1]["accuracy"] <= 1.0


def test_lime_recovers_linear_weights():
    F, K = 6, 3
    predict, W = _linear_predictor(F, K, seed=2)
    x = np.zeros(F, dtype=np.float32)
    phi = lime_tabular(predict, x, class_idx=1, num_samples=3000, seed=0)
    # for a (soft)linear model near x, attribution should correlate strongly
    # with the true class-1 direction (gradient of softmax ~ W[:,1] - mean)
    direction = W[:, 1] - W.mean(axis=1)
    corr = np.corrcoef(phi, direction)[0, 1]
    assert corr > 0.9


def test_kernel_shap_sums_to_prediction_gap():
    F = 5
    predict, W = _linear_predictor(F, K=3, seed=3)
    x = np.random.default_rng(4).normal(size=F)
    bg = np.random.default_rng(5).normal(size=(20, F))
    phi = kernel_shap(predict, x, bg, class_idx=0, num_samples=1024, seed=0)
    f_x = predict(x[None].astype(np.float32))[0, 0]
    f_bg = predict(bg.mean(0, keepdims=True).astype(np.float32))[0, 0]
    np.testing.assert_allclose(phi.sum(), f_x - f_bg, atol=1e-6)


def test_lime_categorical_sampling_mode():
    """Categorical features resample from training frequencies and the
    surrogate uses match indicators: a feature the model depends on through
    equality (not magnitude) must get the top attribution
    (lime.lime_tabular categorical_features semantics)."""
    from skinjax.xai.tabular import lime_tabular_categorical

    rng = np.random.default_rng(0)
    n, F = 400, 4
    train = np.column_stack([
        rng.choice([0.0, 1.0, 2.0], n),          # categorical, 3 levels
        rng.choice([0.0, 1.0], n),               # categorical, 2 levels
        rng.normal(0, 2.0, n),                   # continuous
        rng.normal(0, 0.5, n),                   # continuous
    ])

    def predict(Z):
        # class-1 prob depends ONLY on cat0 == 2 (equality, not magnitude)
        p1 = 0.1 + 0.8 * (Z[:, 0] == 2.0)
        return np.column_stack([1 - p1, p1]).astype(np.float32)

    x = np.array([2.0, 1.0, 0.3, -0.1])
    phi = lime_tabular_categorical(
        predict, x, class_idx=1, training_data=train,
        categorical_idx=[0, 1], num_samples=4000, seed=1,
    )
    assert np.argmax(np.abs(phi)) == 0
    assert phi[0] > 0  # matching the instance's category raises the prob
    assert abs(phi[0]) > 5 * max(abs(phi[2]), abs(phi[3]))


def test_score_cam_topk_error_bound():
    """Exact-by-default sweep vs top-k approximation: the top-k CAM must stay
    within a small max-abs error of the exact CAM (VERDICT r1 #10). Needs a
    spatially non-degenerate feature map, so 64² inputs (2×2×512 for
    resnet-18) rather than cam_setup's 1×1."""
    model = MultimodalModel(
        num_classes=NCLS, num_heads=4, cnn_model_name="resnet-18",
        common_dim=32, text_encoder_dim_output=32, vocab_size=VOCAB,
        attention_mechanism="concatenation",
    )
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    meta = jnp.asarray(rng.normal(size=(2, VOCAB)), jnp.float32)
    variables = model.init(jax.random.key(1), img, meta)
    cls = jnp.asarray([0, 1], jnp.int32)

    exact = np.asarray(score_cam(model, variables, img, meta, cls,
                                 batch_channels=64))
    approx = np.asarray(score_cam(model, variables, img, meta, cls,
                                  top_k=64, batch_channels=64))
    assert exact.std() > 0  # non-degenerate CAM
    err = np.max(np.abs(exact - approx))
    corr = np.corrcoef(exact.ravel(), approx.ravel())[0, 1]
    assert err < 0.25 and corr > 0.9, (err, corr)
