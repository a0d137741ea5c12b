"""Dataset preprocessing tools.

Rebuilds src/scripts/data_preprocessing: ISIC-2019 one-hot→categorical merge
(preprocess_isic_2019.py:12-50), PAD-25 cleanup (preprocess_pad_25.py), the
augmentation-grid visualizer (data_augmentation.py:8-60), and generic helpers.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

ISIC2019_DIAGNOSIS_COLS = ("MEL", "NV", "BCC", "AK", "BKL", "DF", "VASC", "SCC", "UNK")


def collapse_onehot_columns(
    df: pd.DataFrame, columns: Sequence[str], out_col: str = "category",
    drop: bool = True,
) -> pd.DataFrame:
    """One-hot label columns -> single categorical column (the ISIC-2019
    ground-truth format fix, preprocess_isic_2019.py:12-50)."""
    cols = [c for c in columns if c in df.columns]
    out = df.copy()
    onehot = out[cols].to_numpy(dtype=float)
    idx = onehot.argmax(axis=1)
    valid = onehot.max(axis=1) > 0
    out[out_col] = [cols[i] if v else "UNK" for i, v in zip(idx, valid)]
    if drop:
        out = out.drop(columns=cols)
    return out


def preprocess_isic_2019(gt_csv: str, meta_csv: str, out_csv: Optional[str] = None
                         ) -> pd.DataFrame:
    gt = pd.read_csv(gt_csv)
    gt = collapse_onehot_columns(gt, ISIC2019_DIAGNOSIS_COLS, "category")
    meta = pd.read_csv(meta_csv)
    df = meta.merge(gt[["image", "category"]], on="image", how="inner")
    if out_csv:
        df.to_csv(out_csv, index=False)
    return df


def augmentation_grid(image_u8: np.ndarray, path: str, n: int = 8, seed: int = 0):
    """Visualize the on-device augmentation distribution on one image
    (data_augmentation.py:8-60 analogue)."""
    import jax
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from skinjax.data.augment import IMAGENET_MEAN, IMAGENET_STD, augment_batch

    batch = jnp.asarray(np.stack([image_u8] * n))
    out = augment_batch(batch, jax.random.key(seed), train=True)
    out = np.asarray(out) * np.asarray(IMAGENET_STD) + np.asarray(IMAGENET_MEAN)
    out = np.clip(out, 0, 1)
    cols = 4
    rows = -(-n // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows))
    for i, ax in enumerate(np.ravel(axes)):
        ax.axis("off")
        if i < n:
            ax.imshow(out[i])
    fig.tight_layout()
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=100)
    plt.close(fig)
    return path
