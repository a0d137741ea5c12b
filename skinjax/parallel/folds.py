"""Fold-level parallelism across hosts/slices.

The 5-fold × sweep grid is embarrassingly parallel (SURVEY.md §2: 'fold-level
parallelism across hosts'): each host/process trains its own subset of folds
with its own chips, and results merge through the shared model_metrics.csv /
tracker. No communication is needed beyond the filesystem, so this composes
with the in-fold dp×tp mesh without touching it.
"""

from __future__ import annotations

import os
import warnings
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


# -- mesh-native fold parallelism: concurrent folds on disjoint submeshes ----


def fold_submeshes(k: int, n_data: int = 1, n_model: int = 1, devices=None):
    """Partition the device list into ``k`` DISJOINT ("data", "model")
    submeshes of shape (n_data, n_model) — one per concurrently-training
    fold. The mesh-native expression of SURVEY §2's 'fold-level parallelism'
    on a single slice: e.g. 8 chips = 2 folds × (2, 2) dp×tp submeshes.
    Composes with the in-fold sharding rules untouched (each fold's
    collectives ride only its own submesh's ICI links)."""
    import jax

    from skinjax.parallel.mesh import create_mesh

    devices = list(jax.devices()) if devices is None else list(devices)
    per = n_data * n_model
    if k * per > len(devices):
        raise ValueError(
            f"{k} folds x ({n_data}x{n_model}) submeshes need {k * per} "
            f"devices, have {len(devices)}")
    return [
        create_mesh(n_data=n_data, n_model=n_model,
                    devices=devices[i * per:(i + 1) * per])
        for i in range(k)
    ]


def run_kfold_submeshes(
    model_factory,
    source,
    labels,
    groups,
    num_classes,
    class_names,
    submeshes,
    config=None,
    k_folds: int = 5,
    results_dir: str = "./results",
    model_name: str = "model",
    **kw,
) -> List[dict]:
    """``run_kfold`` with folds trained CONCURRENTLY, fold i on submesh
    ``i % len(submeshes)``. Each submesh thread runs the stock fold loop
    (jitted steps dispatch asynchronously, so disjoint-device programs
    overlap on hardware); artifacts are written per-submesh and merged into
    ``results_dir`` afterwards (fold dirs moved up, model_metrics.csv rows
    appended in fold order). Numerics are identical to sequential
    ``run_kfold`` runs on an equal-shape mesh (tests/test_fold_submesh.py).
    """
    import shutil
    from concurrent.futures import ThreadPoolExecutor

    from skinjax.train.kfold import run_kfold
    from skinjax.train.loop import TrainConfig

    config = config if config is not None else TrainConfig()
    n = len(submeshes)

    def work(i):
        folds = [f for f in range(1, k_folds + 1) if (f - 1) % n == i]
        return run_kfold(
            model_factory, source, labels, groups, num_classes, class_names,
            config=config, k_folds=k_folds,
            results_dir=os.path.join(results_dir, f"submesh{i}"),
            model_name=model_name, folds=folds, mesh=submeshes[i], **kw)

    with ThreadPoolExecutor(max_workers=n) as ex:
        per_mesh = list(ex.map(work, range(n)))

    # merge artifacts up into results_dir
    merged: List[dict] = []
    for i in range(n):
        sub = os.path.join(results_dir, f"submesh{i}")
        if not os.path.isdir(sub):
            continue
        for entry in sorted(os.listdir(sub)):
            src_p = os.path.join(sub, entry)
            if entry == "model_metrics.csv":
                continue  # rebuilt below in fold order
            dst = os.path.join(results_dir, entry)
            if os.path.exists(dst):
                # same-named artifact from two submeshes (e.g. a shared
                # summary/plot filename): keep BOTH, namespacing the later
                # one by submesh instead of silently dropping it
                # (ADVICE r4, low)
                stem, ext = os.path.splitext(entry)
                dst = os.path.join(results_dir, f"{stem}.submesh{i}{ext}")
                warnings.warn(
                    f"submesh artifact collision: {entry} already merged; "
                    f"keeping submesh {i}'s copy as {os.path.basename(dst)}")
            shutil.move(src_p, dst)
        shutil.rmtree(sub, ignore_errors=True)
    merged = sorted((m for r in per_mesh for m in r),
                    key=lambda m: m.get("fold", 0))
    from skinjax.eval import artifacts
    for m in merged:
        artifacts.save_metrics_csv(
            {"model": model_name, **m},
            os.path.join(results_dir, "model_metrics.csv"))
    return merged
