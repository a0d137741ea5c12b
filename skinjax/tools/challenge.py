"""Challenge submission writer — the MILK10K / ISIC-challenge inference
formatter (interpretability/inference_test_milk10k-ISIC-CHALLENGE.py:55-136):
run batched inference over a test split and emit the submission CSV with one
probability column per class keyed by isic_id."""

from __future__ import annotations

import csv
import os
from typing import Callable, List, Optional, Sequence

import numpy as np


def write_challenge_submission(
    predict_probs: Callable[[np.ndarray, np.ndarray], np.ndarray],
    image_ids: Sequence[str],
    images: np.ndarray,
    features: np.ndarray,
    class_names: Sequence[str],
    out_csv: str,
    id_column: str = "isic_id",
    batch: int = 64,
) -> str:
    """predict_probs(images, features) -> (B, C); writes id + per-class probs."""
    os.makedirs(os.path.dirname(out_csv) or ".", exist_ok=True)
    n = len(image_ids)
    with open(out_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow([id_column] + list(class_names))
        for s in range(0, n, batch):
            e = min(s + batch, n)
            probs = predict_probs(images[s:e], features[s:e])
            for i, row in enumerate(probs):
                w.writerow([image_ids[s + i]] + [f"{p:.6f}" for p in row])
    return out_csv
