"""Fold-level parallelism across hosts/slices.

The 5-fold × sweep grid is embarrassingly parallel (SURVEY.md §2: 'fold-level
parallelism across hosts'): each host/process trains its own subset of folds
with its own chips, and results merge through the shared model_metrics.csv /
tracker. No communication is needed beyond the filesystem, so this composes
with the in-fold dp×tp mesh without touching it.
"""

from __future__ import annotations

import os
from typing import List, Optional


def my_process_index() -> int:
    """jax process index; honors SKINJAX_PROCESS_INDEX for non-jax launchers."""
    env = os.environ.get("SKINJAX_PROCESS_INDEX")
    if env is not None:
        return int(env)
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


def process_count() -> int:
    env = os.environ.get("SKINJAX_PROCESS_COUNT")
    if env is not None:
        return int(env)
    try:
        import jax

        return jax.process_count()
    except Exception:
        return 1


def folds_for_this_host(k_folds: int, index: Optional[int] = None,
                        count: Optional[int] = None) -> List[int]:
    """Round-robin fold assignment: host i takes folds {i+1, i+1+n, ...}
    (folds are 1-based, matching run_kfold's fold_num)."""
    i = my_process_index() if index is None else index
    n = process_count() if count is None else count
    return [f for f in range(1, k_folds + 1) if (f - 1) % n == i]
