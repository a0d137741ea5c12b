"""xai_cli end-to-end on a fake disk dataset (missing-data + flip-rate)."""

import json
import os

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def disk(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("xaicli")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    n = 24
    rows = []
    for i in range(n):
        cv2.imwrite(str(img_dir / f"im{i}.png"),
                    rng.integers(0, 256, (40, 40, 3), dtype=np.uint8))
        rows.append({
            "patient_id": f"P{i % 8}", "lesion_id": i, "img_id": f"im{i}.png",
            "biopsed": "True",
            "diagnostic": ["ACK", "BCC", "MEL"][i % 3],
            "smoke": rng.choice(["True", "False"]),
            "region": rng.choice(["ARM", "FACE"]),
            "age": int(rng.integers(20, 90)),
            "diameter_1": float(rng.uniform(1, 9)),
            "diameter_2": float(rng.uniform(1, 9)),
        })
    csv = root / "meta.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    return str(csv), str(img_dir), str(root)


def test_xai_cli_missing_data(disk, capsys):
    csv, img_dir, root = disk
    from skinjax.tools.xai_cli import main

    out = os.path.join(root, "xai_md")
    main(["missing-data", "--metadata-csv", csv, "--images-dir", img_dir,
          "--backbone", "custom-cnn", "--mechanism", "concatenation",
          "--common-dim", "32", "--num-heads", "4",
          "--rates", "0.0", "0.5", "--out", out])
    assert os.path.exists(os.path.join(out, "missing_metadata_experiment.csv"))
    rows = json.loads(capsys.readouterr().out)
    assert len(rows) == 2 and {r["missing_rate"] for r in rows} == {0.0, 0.5}


def test_xai_cli_flip_rate(disk, capsys):
    csv, img_dir, root = disk
    from skinjax.tools.xai_cli import main

    out = os.path.join(root, "xai_fr")
    main(["flip-rate", "--metadata-csv", csv, "--images-dir", img_dir,
          "--backbone", "custom-cnn", "--mechanism", "concatenation",
          "--common-dim", "32", "--num-heads", "4", "--out", out])
    with open(os.path.join(out, "flip_rates.json")) as f:
        summary = json.load(f)
    assert "smoke" in summary and "region" in summary
    assert all(0.0 <= v["flip_rate"] <= 1.0 for v in summary.values())


def test_train_cli_on_disk_data(disk, capsys):
    """The user-facing training CLI over real files end to end."""
    csv, img_dir, root = disk
    import os

    from skinjax.tools.train_cli import main

    out = os.path.join(root, "train_cli")
    main(["--dataset", "pad-ufes-20", "--metadata-csv", csv,
          "--images-dir", img_dir, "--results-dir", out,
          "--backbones", "custom-cnn", "--mechanisms", "concatenation",
          "--num-heads", "4", "--common-dim", "32", "--k-folds", "2",
          "--epochs", "1", "--batch-size", "8"])
    import json

    printed = capsys.readouterr().out
    result = json.loads(printed[: printed.rfind("}") + 1])
    assert result["n_runs"] == 2
    assert os.path.exists(os.path.join(
        out, "multimodal_custom-cnn_concatenation_h4", "model_metrics.csv"))
    # featurizer persisted for serving parity
    assert os.path.exists(os.path.join(
        out, "preprocess_data", "featurizer_pad-ufes-20.json"))
