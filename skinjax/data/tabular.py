"""Tabular (index-encoded) metadata source for the TabTransformer tower.

The one-hot featurizer serves the MLP towers; TabTransformer instead takes
per-column categorical *indices* plus scaled numerics
(tab_transformer.py:40-60). This module derives the index encoding from the
same persisted featurizer vocabulary — so the tab-transformer path shares the
exact category space (and unknown-category semantics) with the one-hot path.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from skinjax.data.featurizer import MetadataFeaturizer


def index_encode(
    featurizer: MetadataFeaturizer, table: Dict[str, np.ndarray]
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (categorical_idx (N, n_cat) int32, numerical (N, n_num) f32).

    Unknown categories map to a dedicated last index per column (the
    embedding-table analogue of handle_unknown='ignore').
    """
    n = len(next(iter(table.values()))) if table else 0
    cats = np.zeros((n, len(featurizer.categorical_cols)), dtype=np.int32)
    for ci, (col, categories) in enumerate(
        zip(featurizer.categorical_cols, featurizer.ohe.categories)
    ):
        lookup = {c: i for i, c in enumerate(categories)}
        unknown = len(categories)
        cats[:, ci] = [lookup.get(str(v), unknown) for v in table[col]]
    if featurizer.numerical_cols:
        num = np.stack(
            [np.asarray(table[c], dtype=np.float64)
             for c in featurizer.numerical_cols], axis=1,
        )
        num = (
            featurizer.scaler.transform(num)
            if featurizer.scale_numerics and featurizer.scaler.mean is not None
            else num.astype(np.float32)
        )
    else:
        num = np.zeros((n, 0), dtype=np.float32)
    return cats, num.astype(np.float32)


def cardinalities(featurizer: MetadataFeaturizer) -> Tuple[int, ...]:
    """Per-column embedding-table sizes (+1 for the unknown bucket)."""
    return tuple(len(c) + 1 for c in featurizer.ohe.categories)


class TabularSource:
    """Images + index-encoded tabular metadata + labels; batches carry the
    dict metadata the TabTransformer input mode expects."""

    def __init__(self, images_or_store, image_files, categorical: np.ndarray,
                 numerical: np.ndarray, labels: np.ndarray):
        self._store = None
        self._images = None
        if isinstance(images_or_store, np.ndarray):
            self._images = images_or_store
        else:
            self._store = images_or_store
            self._files = list(image_files)
        self.categorical = categorical.astype(np.int32)
        self.numerical = numerical.astype(np.float32)
        self.labels = labels.astype(np.int32)

    @classmethod
    def from_prepared(cls, prepared, images_or_store, image_files=None):
        raw = prepared.raw
        fz = prepared.featurizer
        table = {c: raw[c].to_numpy()
                 for c in fz.categorical_cols + fz.numerical_cols}
        cats, nums = index_encode(fz, table)
        return cls(images_or_store, image_files or prepared.image_files,
                   cats, nums, prepared.labels)

    def __len__(self):
        return len(self.labels)

    def batch(self, idx: np.ndarray) -> Dict[str, object]:
        idx = np.asarray(idx)
        if self._images is not None:
            imgs = self._images[idx]
        else:
            imgs = self._store.gather([self._files[i] for i in idx])
        return {
            "image": imgs,
            "metadata": {
                "categorical": self.categorical[idx],
                "numerical": self.numerical[idx],
            },
            "label": self.labels[idx],
        }
