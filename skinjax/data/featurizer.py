"""Metadata featurizer: one-hot + standard-scaling + label encoding in pure
numpy with JSON persistence.

Replaces the reference's pickled sklearn ``OneHotEncoder / StandardScaler /
LabelEncoder`` trio (skinLesionDatasets.py:154-198) with an implementation
whose on-disk format is human-readable JSON and whose feature ordering is
**bit-identical to sklearn's** (per-column sorted unique categories,
``handle_unknown='ignore'`` → unknown rows get all-zeros; scaler uses
population std with zero-variance columns mapped to scale 1.0). Train and
serving share the same persisted vocab, which is the reference's contract for
checkpoint compatibility.

``from_sklearn_pickles`` ingests the reference's pickles once so feature
spaces line up exactly when comparing against reference checkpoints.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np


def _as_str_array(col: Sequence) -> np.ndarray:
    return np.asarray([str(v) for v in col], dtype=object)


@dataclass
class OneHotEncoder:
    """sklearn-parity one-hot over string columns (sorted-unique categories)."""

    categories: List[List[str]] = field(default_factory=list)

    def fit(self, columns: Sequence[Sequence]) -> "OneHotEncoder":
        self.categories = [
            sorted(set(str(v) for v in col)) for col in columns
        ]
        return self

    @property
    def dim(self) -> int:
        return sum(len(c) for c in self.categories)

    def transform(self, columns: Sequence[Sequence]) -> np.ndarray:
        if len(columns) != len(self.categories):
            raise ValueError(
                f"expected {len(self.categories)} categorical columns, got {len(columns)}"
            )
        n = len(columns[0]) if columns else 0
        out = np.zeros((n, self.dim), dtype=np.float32)
        offset = 0
        for col, cats in zip(columns, self.categories):
            index = {c: i for i, c in enumerate(cats)}
            vals = _as_str_array(col)
            for row, v in enumerate(vals):
                j = index.get(v)  # handle_unknown='ignore' → all zeros
                if j is not None:
                    out[row, offset + j] = 1.0
            offset += len(cats)
        return out


@dataclass
class StandardScaler:
    mean: Optional[np.ndarray] = None
    scale: Optional[np.ndarray] = None

    def fit(self, x: np.ndarray) -> "StandardScaler":
        x = np.asarray(x, dtype=np.float64)
        self.mean = x.mean(axis=0)
        var = x.var(axis=0)
        scale = np.sqrt(var)
        scale[scale == 0.0] = 1.0  # sklearn: constant columns pass through
        self.scale = scale
        return self

    def transform(self, x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, dtype=np.float64)
        return ((x - self.mean) / self.scale).astype(np.float32)


@dataclass
class LabelEncoder:
    classes: List[str] = field(default_factory=list)

    def fit(self, labels: Sequence) -> "LabelEncoder":
        self.classes = sorted(set(str(v) for v in labels))
        return self

    def transform(self, labels: Sequence) -> np.ndarray:
        index = {c: i for i, c in enumerate(self.classes)}
        try:
            return np.asarray([index[str(v)] for v in labels], dtype=np.int32)
        except KeyError as e:  # pragma: no cover - error path
            raise ValueError(f"unseen label {e} (classes={self.classes})") from e

    def inverse(self, ids: Sequence[int]) -> List[str]:
        return [self.classes[int(i)] for i in ids]


@dataclass
class MetadataFeaturizer:
    """Column-schema-driven featurizer: categorical one-hots then scaled
    numerics, horizontally stacked (skinLesionDatasets.py:199-201 ordering)."""

    categorical_cols: List[str]
    numerical_cols: List[str]
    scale_numerics: bool = True
    ohe: OneHotEncoder = field(default_factory=OneHotEncoder)
    scaler: StandardScaler = field(default_factory=StandardScaler)
    label_encoder: LabelEncoder = field(default_factory=LabelEncoder)

    # -- fitting ----------------------------------------------------------
    def fit(self, table: Dict[str, np.ndarray], labels: Sequence) -> "MetadataFeaturizer":
        self.ohe.fit([table[c] for c in self.categorical_cols])
        if self.numerical_cols:
            num = np.stack(
                [np.asarray(table[c], dtype=np.float64) for c in self.numerical_cols],
                axis=1,
            )
            if self.scale_numerics:
                self.scaler.fit(num)
        self.label_encoder.fit(labels)
        return self

    def transform(self, table: Dict[str, np.ndarray]) -> np.ndarray:
        parts = [self.ohe.transform([table[c] for c in self.categorical_cols])]
        if self.numerical_cols:
            num = np.stack(
                [np.asarray(table[c], dtype=np.float64) for c in self.numerical_cols],
                axis=1,
            )
            parts.append(
                self.scaler.transform(num)
                if self.scale_numerics
                else num.astype(np.float32)
            )
        return np.concatenate(parts, axis=1)

    @property
    def dim(self) -> int:
        return self.ohe.dim + len(self.numerical_cols)

    @property
    def num_classes(self) -> int:
        return len(self.label_encoder.classes)

    # -- persistence -------------------------------------------------------
    def save(self, path: str) -> None:
        payload = {
            "categorical_cols": self.categorical_cols,
            "numerical_cols": self.numerical_cols,
            "scale_numerics": self.scale_numerics,
            "categories": self.ohe.categories,
            "mean": None if self.scaler.mean is None else self.scaler.mean.tolist(),
            "scale": None if self.scaler.scale is None else self.scaler.scale.tolist(),
            "classes": self.label_encoder.classes,
        }
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(payload, f, indent=1)

    @classmethod
    def load(cls, path: str) -> "MetadataFeaturizer":
        with open(path) as f:
            p = json.load(f)
        fz = cls(
            categorical_cols=p["categorical_cols"],
            numerical_cols=p["numerical_cols"],
            scale_numerics=p["scale_numerics"],
        )
        fz.ohe.categories = p["categories"]
        if p["mean"] is not None:
            fz.scaler.mean = np.asarray(p["mean"], dtype=np.float64)
            fz.scaler.scale = np.asarray(p["scale"], dtype=np.float64)
        fz.label_encoder.classes = p["classes"]
        return fz

    @classmethod
    def from_sklearn_pickles(
        cls,
        categorical_cols: List[str],
        numerical_cols: List[str],
        ohe_pickle: str,
        scaler_pickle: Optional[str] = None,
        label_pickle: Optional[str] = None,
    ) -> "MetadataFeaturizer":
        """Ingest the reference's fitted sklearn pickles (one-time converter,
        for feature-space parity with reference checkpoints)."""
        import pickle

        fz = cls(categorical_cols=categorical_cols, numerical_cols=numerical_cols)
        with open(ohe_pickle, "rb") as f:
            sk_ohe = pickle.load(f)
        fz.ohe.categories = [[str(c) for c in cats] for cats in sk_ohe.categories_]
        if scaler_pickle and os.path.exists(scaler_pickle):
            with open(scaler_pickle, "rb") as f:
                sk_scaler = pickle.load(f)
            fz.scaler.mean = np.asarray(sk_scaler.mean_, dtype=np.float64)
            fz.scaler.scale = np.asarray(sk_scaler.scale_, dtype=np.float64)
        if label_pickle and os.path.exists(label_pickle):
            with open(label_pickle, "rb") as f:
                sk_le = pickle.load(f)
            fz.label_encoder.classes = [str(c) for c in sk_le.classes_]
        return fz
