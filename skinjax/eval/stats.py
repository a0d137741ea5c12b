"""Statistical comparison + aggregation of fold metrics.

Rebuilds src/scripts/aggreation: Friedman omnibus + pairwise Wilcoxon
signed-rank over per-fold metrics (aggreation/stats.py:6-62), fold/model
metric averaging (average_metric_values.py:11-60), and the frugality
(BACC vs params) data (others/frugality_bacc_by_models.py:5-43).
"""

from __future__ import annotations

from itertools import combinations
from typing import Dict, List, Optional, Sequence

import numpy as np


def friedman_test(*groups: Sequence[float]) -> Dict[str, float]:
    """Friedman chi-square over k related samples (rows = folds)."""
    from scipy.stats import friedmanchisquare

    stat, p = friedmanchisquare(*groups)
    return {"statistic": float(stat), "p_value": float(p)}


def wilcoxon_pairwise(
    results: Dict[str, Sequence[float]], alpha: float = 0.05
) -> List[Dict]:
    """All-pairs Wilcoxon signed-rank over per-fold metrics."""
    from scipy.stats import wilcoxon

    out = []
    for a, b in combinations(results.keys(), 2):
        xa, xb = np.asarray(results[a]), np.asarray(results[b])
        if np.allclose(xa, xb):
            stat, p = 0.0, 1.0
        else:
            stat, p = wilcoxon(xa, xb)
        out.append({
            "model_a": a, "model_b": b, "statistic": float(stat),
            "p_value": float(p), "significant": bool(p < alpha),
            "better": a if xa.mean() > xb.mean() else b,
        })
    return out


def statistical_test(
    results: Dict[str, Sequence[float]], alpha: float = 0.05
) -> Dict:
    """Friedman omnibus; if significant, pairwise Wilcoxon (stats.py:6-62)."""
    fr = friedman_test(*results.values()) if len(results) >= 3 else None
    pairwise = wilcoxon_pairwise(results, alpha)
    return {"friedman": fr, "pairwise": pairwise}


def average_metrics(rows: List[Dict], group_key: str = "model") -> List[Dict]:
    """Mean ± std of numeric metrics grouped by model
    (average_metric_values.py:11-60)."""
    groups: Dict[str, List[Dict]] = {}
    for r in rows:
        groups.setdefault(str(r.get(group_key, "model")), []).append(r)
    out = []
    for name, rs in groups.items():
        numeric = {
            k for k in rs[0]
            if isinstance(rs[0][k], (int, float)) and rs[0][k] is not None
        }
        agg = {group_key: name, "n_folds": len(rs)}
        for k in sorted(numeric):
            vals = np.asarray([r[k] for r in rs if r.get(k) is not None], float)
            if len(vals):
                agg[f"{k}_mean"] = float(vals.mean())
                agg[f"{k}_std"] = float(vals.std())
        out.append(agg)
    return out


def count_params(params) -> int:
    import jax

    return sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params))


def frugality_table(entries: List[Dict]) -> List[Dict]:
    """[{model, bacc, params_m}] -> sorted by bacc/params frontier
    (frugality_bacc_by_models.py analogue)."""
    out = sorted(entries, key=lambda e: (-e["bacc"], e["params_m"]))
    for e in out:
        e["bacc_per_mparam"] = e["bacc"] / max(e["params_m"], 1e-9)
    return out


def frugality_plot(entries: List[Dict], path: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4))
    for e in entries:
        ax.scatter(e["params_m"], e["bacc"])
        ax.annotate(e["model"], (e["params_m"], e["bacc"]), fontsize=7)
    ax.set_xlabel("params (M)")
    ax.set_ylabel("balanced accuracy")
    fig.tight_layout()
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=120)
    plt.close(fig)
