"""Plot + aggregation CLI tests."""

import json
import os

import numpy as np


def test_grouped_barplot_and_sample_grid(tmp_path):
    from skinjax.data import synthetic_source
    from skinjax.eval.plots import dataset_sample_grid, grouped_bacc_barplot

    rows = []
    rng = np.random.default_rng(0)
    for backbone in ("resnet-50", "davit_tiny"):
        for mech in ("concatenation", "gfcam"):
            for fold in range(3):
                rows.append({
                    "backbone": backbone, "mechanism": mech, "fold": fold,
                    "balanced_accuracy": float(rng.uniform(0.7, 0.85)),
                })
    p1 = str(tmp_path / "bacc.png")
    grouped_bacc_barplot(rows, p1)
    assert os.path.getsize(p1) > 0

    src = synthetic_source(n=8, image_size=(24, 24), num_classes=3)
    p2 = str(tmp_path / "grid.png")
    dataset_sample_grid(src, p2, n=8, class_names=["a", "b", "c"])
    assert os.path.getsize(p2) > 0


def test_confusion_from_predictions_csv(tmp_path):
    import csv

    from skinjax.eval.plots import confusion_from_predictions_csv

    p = tmp_path / "preds.csv"
    with open(p, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["image_name", "label", "prediction", "prob_a", "prob_b"])
        for i in range(10):
            w.writerow([f"i{i}.png", i % 2, (i + 1) % 2, 0.4, 0.6])
    out = str(tmp_path / "cm.png")
    confusion_from_predictions_csv(str(p), out)
    assert os.path.getsize(out) > 0


def test_aggregate_cli(tmp_path, capsys):
    import csv

    from skinjax.tools.aggregate_cli import main

    p = tmp_path / "model_metrics.csv"
    rng = np.random.default_rng(1)
    with open(p, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["model", "fold", "balanced_accuracy",
                                          "backbone", "mechanism"])
        w.writeheader()
        for model in ("m1", "m2", "m3"):
            for fold in range(5):
                w.writerow({
                    "model": model, "fold": fold,
                    "balanced_accuracy": float(rng.uniform(0.7, 0.9)),
                    "backbone": model, "mechanism": "concatenation",
                })
    out = str(tmp_path / "agg")
    main([str(p), "--out", out])
    assert os.path.exists(os.path.join(out, "averaged_metrics.json"))
    with open(os.path.join(out, "statistical_tests.json")) as f:
        stats = json.load(f)
    assert stats["friedman"] is not None and len(stats["pairwise"]) == 3


def test_model_summary_and_nas_convergence(tmp_path):
    import jax
    import jax.numpy as jnp

    from skinjax.eval.plots import model_summary, nas_convergence_plot
    from skinjax.models import MultimodalModel

    model = MultimodalModel(
        num_classes=3, num_heads=4, cnn_model_name="custom-cnn", common_dim=32,
        text_encoder_dim_output=32, vocab_size=8,
        attention_mechanism="concatenation",
    )
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 8))
    )["params"]
    s = model_summary(params)
    assert "TOTAL" in s and "fc_fusion" in s

    log = [{"reward": r} for r in [0.2, 0.5, 0.3, 0.7, 0.6]]
    p = str(tmp_path / "conv.png")
    nas_convergence_plot(log, p)
    import os

    assert os.path.getsize(p) > 0


def test_create_gif_and_model_graph(tmp_path):
    """GIF + architecture-graph exports (plots/create_gif.py,
    plots/plot_model.py — the round-1 'token omissions')."""
    import numpy as np
    from PIL import Image

    from skinjax.eval.plots import create_gif, export_model_graph

    paths = []
    for i in range(3):
        p = tmp_path / f"f{i}.png"
        Image.fromarray(
            np.full((40, 60, 3), 60 * i, dtype=np.uint8)).save(p)
        paths.append(str(p))
    gif = tmp_path / "out.gif"
    create_gif(paths, str(gif), titles=["a", "b"])
    img = Image.open(gif)
    assert getattr(img, "n_frames", 1) == 3

    params = {
        "backbone": {"conv1": {"kernel": np.zeros((3, 3, 3, 8))},
                     "bn": {"scale": np.zeros(8)}},
        "head": {"kernel": np.zeros((8, 4)), "bias": np.zeros(4)},
    }
    dot = export_model_graph(
        params, str(tmp_path / "g.dot"), png_path=str(tmp_path / "g.png"))
    assert (tmp_path / "g.dot").exists() and (tmp_path / "g.png").exists()
    assert "backbone" in dot and "->" in dot
