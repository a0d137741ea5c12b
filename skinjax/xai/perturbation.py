"""Metadata perturbation analyses: flip-rate, prediction uncertainty, FDS,
missing-data robustness.

Rebuilds interpretability/flip_rate.py:164-306,
analyze_prediction_uncertainty.py:166-193, generate_fds_analysis.py:16-47 and
inference_all_folds.py:116-129. All analyses are expressed against a
``predict_probs(features) -> probs`` callable (a jitted batched forward with
the images fixed), so a whole perturbation sweep is a handful of XLA
executions instead of the reference's per-sample python loops.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

from skinjax.data.featurizer import MetadataFeaturizer

# ---------------------------------------------------------------------------
# mutations (flip_rate.py:164-183)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Mutation:
    """One metadata intervention: feature name + a column transform."""

    feature: str
    transform: Callable[[pd.Series], pd.Series]
    description: str = ""


def default_pad20_mutations() -> List[Mutation]:
    """The reference's intervention set: booleans flip, age -> 80,
    diameters + 5, gender swap, region -> FACE."""
    muts: List[Mutation] = []
    for b in ("smoke", "drink", "pesticide", "skin_cancer_history",
              "cancer_history", "has_piped_water", "has_sanitation", "itch",
              "grew", "hurt", "changed", "bleed", "elevation", "biopsed"):
        muts.append(
            Mutation(
                b,
                lambda s: s.map(
                    lambda v: "False" if str(v) == "True" else ("True" if str(v) == "False" else v)
                ),
                "bool flip",
            )
        )
    muts.append(Mutation("age", lambda s: pd.Series(np.full(len(s), 80.0)), "age->80"))
    muts.append(
        Mutation("diameter_1", lambda s: pd.to_numeric(s, errors="coerce").fillna(-1) + 5, "+5mm")
    )
    muts.append(
        Mutation("diameter_2", lambda s: pd.to_numeric(s, errors="coerce").fillna(-1) + 5, "+5mm")
    )
    muts.append(
        Mutation(
            "gender",
            lambda s: s.map(lambda v: "MALE" if str(v) == "FEMALE" else ("FEMALE" if str(v) == "MALE" else v)),
            "gender swap",
        )
    )
    muts.append(Mutation("region", lambda s: pd.Series(np.full(len(s), "FACE"), dtype=object), "region->FACE"))
    return muts


def _featurize(fz: MetadataFeaturizer, df: pd.DataFrame) -> np.ndarray:
    cols = fz.categorical_cols + fz.numerical_cols
    table = {c: df[c].to_numpy() for c in cols}
    return fz.transform(table)


def run_flip_analysis(
    predict_probs: Callable[[np.ndarray], np.ndarray],
    raw_df: pd.DataFrame,
    featurizer: MetadataFeaturizer,
    mutations: Optional[Sequence[Mutation]] = None,
    num_classes: Optional[int] = None,
) -> Dict:
    """For each mutation: re-run inference, compute flip rate and the K×K
    prediction transition matrix (flip_rate.py:197-306)."""
    mutations = list(mutations or default_pad20_mutations())
    mutations = [m for m in mutations if m.feature in raw_df.columns]

    base_probs = predict_probs(_featurize(featurizer, raw_df))
    base_pred = base_probs.argmax(axis=1)
    K = num_classes or base_probs.shape[1]

    results = {}
    for m in mutations:
        mutated = raw_df.copy()
        mutated[m.feature] = m.transform(mutated[m.feature]).values
        probs = predict_probs(_featurize(featurizer, mutated))
        pred = probs.argmax(axis=1)
        flips = pred != base_pred
        trans = np.zeros((K, K), dtype=np.int64)
        np.add.at(trans, (base_pred, pred), 1)
        results[m.feature] = {
            "flip_rate": float(flips.mean()),
            "n_flips": int(flips.sum()),
            "transition_matrix": trans,
            "probs": probs,
            "description": m.description,
        }
    return {"base_probs": base_probs, "base_pred": base_pred, "mutations": results}


# ---------------------------------------------------------------------------
# uncertainty (analyze_prediction_uncertainty.py:166-193)
# ---------------------------------------------------------------------------


def entropy(p: np.ndarray, eps: float = 1e-12) -> np.ndarray:
    p = np.clip(p, eps, 1.0)
    return -(p * np.log(p)).sum(axis=-1)


def kl_divergence(p: np.ndarray, q: np.ndarray, eps: float = 1e-12) -> np.ndarray:
    p = np.clip(p, eps, 1.0)
    q = np.clip(q, eps, 1.0)
    return (p * (np.log(p) - np.log(q))).sum(axis=-1)


def js_divergence(p: np.ndarray, q: np.ndarray) -> np.ndarray:
    m = 0.5 * (p + q)
    return 0.5 * kl_divergence(p, m) + 0.5 * kl_divergence(q, m)


def prediction_uncertainty(base_probs: np.ndarray, ablated_probs: np.ndarray) -> Dict:
    return {
        "entropy_base": float(entropy(base_probs).mean()),
        "entropy_ablated": float(entropy(ablated_probs).mean()),
        "kl": float(kl_divergence(base_probs, ablated_probs).mean()),
        "js": float(js_divergence(base_probs, ablated_probs).mean()),
    }


# ---------------------------------------------------------------------------
# FDS (generate_fds_analysis.py:16-47)
# ---------------------------------------------------------------------------


def faithfulness_degradation_score(
    base_probs: np.ndarray, ablated_probs: np.ndarray
) -> float:
    """FDS = 0.45·JS_norm + 0.35·Δconf_norm + 0.20·flip_rate; JS normalized by
    ln(K) (max JS), confidence drop normalized to [0, 1]."""
    K = base_probs.shape[1]
    js = js_divergence(base_probs, ablated_probs).mean() / np.log(K)
    base_conf = base_probs.max(axis=1)
    abl_conf = np.take_along_axis(
        ablated_probs, base_probs.argmax(axis=1)[:, None], axis=1
    )[:, 0]
    dconf = np.clip(base_conf - abl_conf, 0.0, 1.0).mean()
    flip = (base_probs.argmax(1) != ablated_probs.argmax(1)).mean()
    return float(0.45 * js + 0.35 * dconf + 0.20 * flip)


# ---------------------------------------------------------------------------
# missing-data robustness (inference_all_folds.py:116-129)
# ---------------------------------------------------------------------------


def simulate_missing_metadata(
    df: pd.DataFrame,
    missing_rate: float,
    seed: int,
    categorical_cols: Sequence[str],
    numerical_cols: Sequence[str],
) -> pd.DataFrame:
    """RNG mask over feature cells: numeric -> -1, categorical -> 'EMPTY';
    seeded exactly like the reference (fold + rate*1000)."""
    out = df.copy()
    rng = np.random.default_rng(seed)
    for col in list(categorical_cols) + list(numerical_cols):
        if col not in out.columns or missing_rate <= 0:
            continue
        mask = rng.random(len(out)) < missing_rate
        if col in numerical_cols:
            vals = pd.to_numeric(out[col], errors="coerce").fillna(-1).astype(float)
            vals[mask] = -1.0
            out[col] = vals
        else:
            vals = out[col].astype(object).copy()
            vals[mask] = "EMPTY"
            out[col] = vals
    return out


def missing_data_sweep(
    predict_probs: Callable[[np.ndarray], np.ndarray],
    raw_df: pd.DataFrame,
    featurizer: MetadataFeaturizer,
    labels: np.ndarray,
    fold: int = 1,
    rates: Sequence[float] = (0.0, 0.1, 0.2, 0.3, 0.5, 0.7),
) -> List[Dict]:
    """acc/bacc/f1/auc per missing rate (missing_metadata_experiment.csv rows)."""
    from skinjax.train.metrics import classification_metrics

    rows = []
    for rate in rates:
        seed = int(fold + rate * 1000)
        mutated = simulate_missing_metadata(
            raw_df, rate, seed, featurizer.categorical_cols, featurizer.numerical_cols
        )
        probs = predict_probs(_featurize(featurizer, mutated))
        m = classification_metrics(labels, probs.argmax(1), probs)
        rows.append({"fold": fold, "missing_rate": rate, **m})
    return rows
