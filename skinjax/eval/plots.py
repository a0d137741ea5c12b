"""Reporting plots beyond the per-fold artifacts.

Rebuilds src/scripts/benchmark/plots: grouped BACC barplots, confusion matrix
from a predictions CSV (plot_confusion_matrix_from_csv.py:18), dataset sample
grids; plus the frugality scatter living in eval/stats.py.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def grouped_bacc_barplot(
    rows: List[Dict], path: str, group_key: str = "backbone",
    hue_key: str = "mechanism", metric: str = "balanced_accuracy",
) -> None:
    """Mean metric per (group, hue) with std error bars."""
    plt = _plt()
    groups = sorted({str(r[group_key]) for r in rows})
    hues = sorted({str(r[hue_key]) for r in rows})
    width = 0.8 / max(len(hues), 1)
    fig, ax = plt.subplots(figsize=(max(6, len(groups) * 1.2), 4))
    for hi, hue in enumerate(hues):
        means, stds = [], []
        for g in groups:
            vals = [
                r[metric] for r in rows
                if str(r[group_key]) == g and str(r[hue_key]) == hue
                and r.get(metric) is not None
            ]
            means.append(np.mean(vals) if vals else 0.0)
            stds.append(np.std(vals) if vals else 0.0)
        x = np.arange(len(groups)) + hi * width
        ax.bar(x, means, width=width, yerr=stds, capsize=2, label=hue)
    ax.set_xticks(np.arange(len(groups)) + 0.4 - width / 2, groups,
                  rotation=30, ha="right", fontsize=8)
    ax.set_ylabel(metric)
    ax.legend(fontsize=7)
    fig.tight_layout()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=120)
    plt.close(fig)


def confusion_from_predictions_csv(
    csv_path: str, out_path: str, class_names: Optional[Sequence[str]] = None
) -> None:
    """predictions_eval_fold_N.csv -> normalized confusion matrix PNG."""
    import pandas as pd

    from skinjax.eval.artifacts import plot_confusion_matrix

    df = pd.read_csv(csv_path)
    labels = df["label"].to_numpy()
    preds = df["prediction"].to_numpy()
    if class_names is None:
        prob_cols = [c for c in df.columns if c.startswith("prob_")]
        class_names = [c[len("prob_"):] for c in prob_cols]
    plot_confusion_matrix(labels, preds, class_names, out_path)


def model_summary(params, max_depth: int = 2) -> str:
    """Text summary of a param tree: per-module parameter counts (the
    torchviz plot_model.py:52-82 role, as greppable text)."""
    import jax

    counts: Dict[str, int] = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        keys = [p.key if hasattr(p, "key") else str(p) for p in path]
        prefix = "/".join(keys[:max_depth])
        counts[prefix] = counts.get(prefix, 0) + int(np.prod(leaf.shape))
    total = sum(counts.values())
    lines = [f"{'module':50s} {'params':>12s}  share"]
    for name, c in sorted(counts.items(), key=lambda kv: -kv[1]):
        lines.append(f"{name:50s} {c:12,d}  {100 * c / total:5.1f}%")
    lines.append(f"{'TOTAL':50s} {total:12,d}")
    return "\n".join(lines)


def nas_convergence_plot(step_log: Sequence[Dict], path: str) -> None:
    """reward + best-so-far vs step (the BO variant's convergence plot)."""
    plt = _plt()
    rewards = [r["reward"] for r in step_log]
    best = np.maximum.accumulate(rewards)
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(rewards, ".", alpha=0.5, label="reward")
    ax.plot(best, "-", label="best so far")
    ax.set_xlabel("search step")
    ax.set_ylabel("balanced accuracy")
    ax.legend()
    fig.tight_layout()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=120)
    plt.close(fig)


def dataset_sample_grid(
    source, path: str, n: int = 16, class_names: Optional[Sequence[str]] = None,
    seed: int = 0,
) -> None:
    """Random grid of dataset samples with their labels."""
    plt = _plt()
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(source), size=min(n, len(source)), replace=False)
    batch = source.batch(idx)
    cols = 4
    rows = -(-len(idx) // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(2.4 * cols, 2.4 * rows))
    for i, ax in enumerate(np.ravel(axes)):
        ax.axis("off")
        if i < len(idx):
            ax.imshow(batch["image"][i])
            lbl = int(batch["label"][i])
            ax.set_title(
                class_names[lbl] if class_names else str(lbl), fontsize=8
            )
    fig.tight_layout()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=100)
    plt.close(fig)


def create_gif(
    image_paths: Sequence[str], output_gif_path: str,
    titles: Optional[Sequence[str]] = None, duration: int = 500,
) -> None:
    """Titled animated GIF from saved plot images (plots/create_gif.py:29-45:
    title drawn centered at the top of each frame, 500 ms default frame
    duration, infinite loop)."""
    from PIL import Image, ImageDraw, ImageFont

    titles = list(titles or [])
    frames = []
    for i, p in enumerate(image_paths):
        img = Image.open(p).convert("RGB")
        title = titles[i] if i < len(titles) else f"Image {i + 1}"
        draw = ImageDraw.Draw(img)
        font = ImageFont.load_default()
        box = draw.textbbox((0, 0), title, font=font)
        draw.text(((img.width - (box[2] - box[0])) // 2, 10), title,
                  font=font, fill="white")
        frames.append(img)
    if not frames:
        raise ValueError("create_gif needs at least one image")
    os.makedirs(os.path.dirname(output_gif_path) or ".", exist_ok=True)
    frames[0].save(
        output_gif_path, save_all=True, append_images=frames[1:],
        duration=duration, loop=0,
    )


def export_model_graph(params, dot_path: str, png_path: Optional[str] = None,
                       max_depth: int = 2) -> str:
    """Architecture graph export (the torchviz make_dot role,
    plots/plot_model.py:52-82): a Graphviz DOT file of the module hierarchy
    with per-module parameter counts, plus an optional matplotlib-rendered
    PNG (no graphviz binary in the image). Returns the DOT text."""
    import jax

    counts: Dict[str, int] = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        keys = [p.key if hasattr(p, "key") else str(p) for p in path]
        for d in range(1, min(max_depth, len(keys)) + 1):
            prefix = "/".join(keys[:d])
            counts[prefix] = counts.get(prefix, 0) + int(np.prod(leaf.shape))

    def nid(name: str) -> str:
        return "n_" + name.replace("/", "__").replace("-", "_").replace(".", "_")

    lines = ["digraph model {", '  rankdir="TB";',
             '  node [shape=box, fontsize=10];']
    for name, c in sorted(counts.items()):
        label = f"{name.rsplit('/', 1)[-1]}\\n{c:,} params"
        lines.append(f'  {nid(name)} [label="{label}"];')
        if "/" in name:
            lines.append(f"  {nid(name.rsplit('/', 1)[0])} -> {nid(name)};")
    lines.append("}")
    dot = "\n".join(lines)
    os.makedirs(os.path.dirname(dot_path) or ".", exist_ok=True)
    with open(dot_path, "w") as f:
        f.write(dot)

    if png_path:  # simple tree render: one row per module, indented by depth
        plt = _plt()
        names = sorted(counts)
        fig, ax = plt.subplots(figsize=(8, 0.28 * len(names) + 1))
        ax.axis("off")
        total = max(
            (c for n, c in counts.items() if "/" not in n), default=1
        )
        for i, name in enumerate(names):
            depth = name.count("/")
            c = counts[name]
            y = len(names) - i
            ax.text(0.02 + 0.06 * depth, y, name.rsplit("/", 1)[-1],
                    fontsize=8, va="center")
            ax.barh(y, 0.3 * c / max(total, 1), left=0.62, height=0.6,
                    color="#4878d0")
            ax.text(0.94, y, f"{c:,}", fontsize=7, va="center", ha="right")
        ax.set_xlim(0, 1)
        ax.set_ylim(0, len(names) + 1)
        fig.tight_layout()
        os.makedirs(os.path.dirname(png_path) or ".", exist_ok=True)
        fig.savefig(png_path, dpi=120)
        plt.close(fig)
    return dot
