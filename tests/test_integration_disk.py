"""End-to-end integration: a fake PAD-UFES-20 dataset on disk (PNGs + CSV)
through prepare_dataset → ImageStore/FileSource → run_kfold → artifacts →
serving engine on the persisted featurizer."""

import os

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def disk_dataset(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("pad20")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    n = 36
    rows = []
    for i in range(n):
        label = ["ACK", "BCC", "MEL"][i % 3]
        img = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
        img[:, :, 0] = np.clip(img[:, :, 0] + (i % 3) * 60, 0, 255)  # signal
        name = f"img_{i}.png"
        cv2.imwrite(str(img_dir / name), img)
        rows.append({
            "patient_id": f"PAT_{i % 12}", "lesion_id": i, "img_id": name,
            "biopsed": "True", "diagnostic": label,
            "smoke": rng.choice(["True", "False"]),
            "region": rng.choice(["ARM", "FACE"]),
            "age": int(rng.integers(20, 90)),
            "diameter_1": float(rng.uniform(1, 9)),
            "diameter_2": float(rng.uniform(1, 9)),
        })
    csv = root / "metadata.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    return root, str(csv), str(img_dir)


def test_disk_kfold_end_to_end(disk_dataset, tmp_path):
    from skinjax.data.pipeline import FileSource, ImageStore
    from skinjax.data.schemas import prepare_dataset
    from skinjax.models import MultimodalModel
    from skinjax.train import TrainConfig, run_kfold

    root, csv, img_dir = disk_dataset
    fzp = str(tmp_path / "fz.json")
    prepared = prepare_dataset("pad-ufes-20", csv, featurizer_path=fzp)
    assert prepared.num_classes == 3
    store = ImageStore(img_dir, size=(32, 32))
    source = FileSource(store, prepared.image_files, prepared.features,
                        prepared.labels)

    metrics = run_kfold(
        model_factory=lambda: MultimodalModel(
            num_classes=3, num_heads=4, cnn_model_name="custom-cnn",
            common_dim=32, text_encoder_dim_output=32,
            vocab_size=prepared.feature_dim, attention_mechanism="concatenation",
        ),
        source=source, labels=prepared.labels, groups=prepared.groups,
        num_classes=3, class_names=prepared.class_names,
        config=TrainConfig(num_epochs=1, batch_size=8, image_dtype="float32",
                           augment=True),
        k_folds=2, results_dir=str(tmp_path / "results"), model_name="it",
    )
    assert len(metrics) == 2
    assert (tmp_path / "results" / "model_metrics.csv").exists()
    assert (tmp_path / "results" / "it_fold_1" / "roc.png").exists()

    # patient grouping respected: no patient straddles train/val
    from skinjax.data.splits import stratified_group_kfold

    for tr, va in stratified_group_kfold(prepared.labels, prepared.groups, 2):
        assert set(prepared.groups[tr]).isdisjoint(prepared.groups[va])


def test_disk_serving_roundtrip(disk_dataset, tmp_path):
    import cv2
    import jax
    import jax.numpy as jnp

    from skinjax.data.schemas import prepare_dataset
    from skinjax.models import MultimodalModel
    from skinjax.serve.engine import InferenceEngine

    root, csv, img_dir = disk_dataset
    fzp = str(tmp_path / "fz.json")
    prepared = prepare_dataset("pad-ufes-20", csv, featurizer_path=fzp)

    model = MultimodalModel(
        num_classes=3, num_heads=4, cnn_model_name="custom-cnn", common_dim=32,
        text_encoder_dim_output=32, vocab_size=prepared.feature_dim,
        attention_mechanism="concatenation",
    )
    img = jnp.zeros((1, 224, 224, 3))
    meta = jnp.zeros((1, prepared.feature_dim))
    variables = model.init(jax.random.key(0), img, meta)
    engine = InferenceEngine(model, variables, prepared.featurizer)

    raw = cv2.cvtColor(
        cv2.imread(os.path.join(img_dir, prepared.image_files[0])),
        cv2.COLOR_BGR2RGB,
    )
    # CSV line in featurizer column order (cats then nums)
    fz = prepared.featurizer
    cols = fz.categorical_cols + fz.numerical_cols
    vals = {"biopsed": "True", "smoke": "False", "region": "ARM",
            "age": "44", "diameter_1": "3.2", "diameter_2": "2.1"}
    line = ",".join(vals.get(c, "EMPTY") for c in cols)
    out = engine.predict(raw, line)
    assert out["predicted_classname"] in prepared.class_names
    assert abs(sum(out["probabilities"]) - 1.0) < 1e-5
