"""Stats, sentence tooling, preprocessing tools, profiling utils."""

import numpy as np
import pandas as pd
import pytest

from skinjax.eval.stats import (
    average_metrics,
    count_params,
    frugality_table,
    statistical_test,
    wilcoxon_pairwise,
)
from skinjax.tools.preprocess import collapse_onehot_columns
from skinjax.tools.sentences import (
    add_template_sentences,
    join_metadata_and_predictions,
    row_to_template_sentence,
)


def test_statistical_test_matches_scipy():
    rng = np.random.default_rng(0)
    a = rng.normal(0.80, 0.02, 5)
    b = a + rng.normal(0.02, 0.005, 5)  # consistently better
    c = rng.normal(0.78, 0.02, 5)
    res = statistical_test({"A": a, "B": b, "C": c})
    assert res["friedman"]["p_value"] <= 1.0
    pair = [p for p in res["pairwise"] if {p["model_a"], p["model_b"]} == {"A", "B"}][0]
    assert pair["better"] == "B"
    from scipy.stats import wilcoxon

    stat, p = wilcoxon(a, b)
    assert np.isclose(pair["p_value"], p)


def test_wilcoxon_identical_groups():
    res = wilcoxon_pairwise({"A": [1, 2, 3], "B": [1, 2, 3]})
    assert res[0]["p_value"] == 1.0 and not res[0]["significant"]


def test_average_metrics():
    rows = [
        {"model": "m1", "fold": 1, "balanced_accuracy": 0.8, "auc": 0.9},
        {"model": "m1", "fold": 2, "balanced_accuracy": 0.9, "auc": 0.8},
        {"model": "m2", "fold": 1, "balanced_accuracy": 0.7, "auc": 0.7},
    ]
    agg = average_metrics(rows)
    m1 = [a for a in agg if a["model"] == "m1"][0]
    assert np.isclose(m1["balanced_accuracy_mean"], 0.85)
    assert m1["n_folds"] == 2


def test_count_params():
    import jax.numpy as jnp

    tree = {"a": jnp.zeros((3, 4)), "b": {"c": jnp.zeros(5)}}
    assert count_params(tree) == 17


def test_frugality_table():
    t = frugality_table([
        {"model": "davit", "bacc": 0.8228, "params_m": 28},
        {"model": "mobilenet", "bacc": 0.7999, "params_m": 3.4},
    ])
    assert t[0]["model"] == "davit"
    assert t[1]["bacc_per_mparam"] > t[0]["bacc_per_mparam"]


def test_template_sentence():
    row = {"patient_id": "PAT_1", "age": 55, "gender": "MALE", "region": "ARM",
           "diameter_1": 5.0, "diameter_2": 4.0, "smoke": "False"}
    s = row_to_template_sentence(row)
    assert "55 years old" in s and "ARM" in s and "N/A" in s  # missing -> N/A
    df = add_template_sentences(pd.DataFrame([row]))
    assert "sentence" in df.columns and "PAT_1" in df["sentence"][0]


def test_collapse_onehot():
    df = pd.DataFrame({
        "image": ["a", "b", "c"],
        "MEL": [1.0, 0.0, 0.0], "NV": [0.0, 1.0, 0.0], "BCC": [0.0, 0.0, 0.0],
    })
    out = collapse_onehot_columns(df, ["MEL", "NV", "BCC"])
    assert list(out["category"]) == ["MEL", "NV", "UNK"]
    assert "MEL" not in out.columns


def test_join_metadata_and_predictions():
    meta = pd.DataFrame({"img_id": ["x.png", "y.png"], "age": [30, 40]})
    preds = pd.DataFrame({"image_name": ["x.png"], "prediction": [2]})
    j = join_metadata_and_predictions(meta, preds)
    assert len(j) == 1 and j["prediction"][0] == 2


def test_step_timer():
    import time

    from skinjax.utils import StepTimer

    t = StepTimer(batch_size=32, n_chips=2, warmup=0)
    for _ in range(3):
        with t:
            time.sleep(0.01)
    s = t.summary()
    # generous ceiling: sleep(0.01) has stretched past 100 ms under load on
    # this 1-core host (observed 141 ms) — the assertion targets plumbing,
    # not scheduler latency
    assert s["steps"] == 3 and 5 < s["mean_step_ms"] < 2000
    assert np.isclose(s["images_per_sec_per_chip"], s["images_per_sec"] / 2)
