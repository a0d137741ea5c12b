"""Results aggregation CLI — the reference's src/scripts/aggreation drivers:
read model_metrics.csv files, average per model across folds, run
Friedman + Wilcoxon across models, and emit plots.

  python -m skinjax.tools.aggregate_cli results/model_metrics.csv \
      [--metric balanced_accuracy] [--out results/aggregated]
"""

from __future__ import annotations

import argparse
import csv
import json
import os
from typing import Dict, List


def read_metrics_csv(path: str) -> List[Dict]:
    rows = []
    with open(path) as f:
        for r in csv.DictReader(f):
            for k, v in list(r.items()):
                try:
                    r[k] = float(v)
                except (TypeError, ValueError):
                    pass
            rows.append(r)
    return rows


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("csv", nargs="+", help="model_metrics.csv path(s)")
    p.add_argument("--metric", default="balanced_accuracy")
    p.add_argument("--group-key", default="model")
    p.add_argument("--out", default="./results/aggregated")
    args = p.parse_args(argv)

    from skinjax.eval.plots import grouped_bacc_barplot
    from skinjax.eval.stats import average_metrics, statistical_test

    rows: List[Dict] = []
    for path in args.csv:
        rows.extend(read_metrics_csv(path))
    os.makedirs(args.out, exist_ok=True)

    agg = average_metrics(rows, group_key=args.group_key)
    with open(os.path.join(args.out, "averaged_metrics.json"), "w") as f:
        json.dump(agg, f, indent=1)

    per_model: Dict[str, List[float]] = {}
    for r in rows:
        if isinstance(r.get(args.metric), float):
            per_model.setdefault(str(r[args.group_key]), []).append(r[args.metric])
    per_model = {k: v for k, v in per_model.items() if len(v) >= 2}
    stats = None
    lengths = {len(v) for v in per_model.values()}
    if len(per_model) >= 2 and len(lengths) == 1:
        stats = statistical_test(per_model)
        with open(os.path.join(args.out, "statistical_tests.json"), "w") as f:
            json.dump(stats, f, indent=1)

    if rows and "backbone" in rows[0] and "mechanism" in rows[0]:
        grouped_bacc_barplot(
            rows, os.path.join(args.out, f"{args.metric}_by_model.png"),
            metric=args.metric,
        )

    print(json.dumps({"models": len(per_model), "rows": len(rows),
                      "averaged": agg, "stats": stats}, indent=1, default=str))


if __name__ == "__main__":
    main()
