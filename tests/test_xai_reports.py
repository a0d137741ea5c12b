"""XAI report tests."""

import os

import numpy as np
import pandas as pd

from skinjax.data.featurizer import MetadataFeaturizer
from skinjax.xai import run_flip_analysis
from skinjax.xai.reports import (
    degradation_comparison_plot,
    flip_rate_barplot,
    per_feature_uncertainty,
    transition_heatmap,
)


def _flip_results(n=30):
    rng = np.random.default_rng(0)
    df = pd.DataFrame({
        "smoke": rng.choice(["True", "False"], n),
        "region": rng.choice(["ARM", "FACE"], n),
        "age": rng.integers(20, 90, n).astype(float),
    })
    fz = MetadataFeaturizer(categorical_cols=["smoke", "region"],
                            numerical_cols=["age"])
    fz.fit({c: df[c].to_numpy() for c in df.columns}, ["x"])
    W = rng.normal(size=(fz.dim, 3))

    def predict(x):
        z = x @ W
        e = np.exp(z - z.max(1, keepdims=True))
        return e / e.sum(1, keepdims=True)

    return run_flip_analysis(predict, df, fz)


def test_per_feature_uncertainty_and_plots(tmp_path):
    res = _flip_results()
    rows = per_feature_uncertainty(res)
    assert {r["feature"] for r in rows} >= {"smoke", "region", "age"}
    assert all(0 <= r["fds"] <= 1 for r in rows)
    assert rows == sorted(rows, key=lambda r: -r["fds"])

    p1 = str(tmp_path / "flips.png")
    flip_rate_barplot(res, p1)
    assert os.path.getsize(p1) > 0
    p2 = str(tmp_path / "trans.png")
    transition_heatmap(res, "smoke", ["a", "b", "c"], p2)
    assert os.path.getsize(p2) > 0


def test_degradation_plot(tmp_path):
    sweeps = {
        "m1": [{"missing_rate": r, "balanced_accuracy": 0.8 - r * 0.3}
               for r in (0.0, 0.2, 0.5)],
        "m2": [{"missing_rate": r, "balanced_accuracy": 0.75 - r * 0.1}
               for r in (0.0, 0.2, 0.5)],
    }
    p = str(tmp_path / "deg.png")
    degradation_comparison_plot(sweeps, p)
    assert os.path.getsize(p) > 0
