"""Env-configured service bootstrap (serve/run_service.build_engine)."""

import os

import numpy as np


def test_build_engine_from_env(tmp_path, monkeypatch):
    from skinjax.data.featurizer import MetadataFeaturizer

    fz = MetadataFeaturizer(categorical_cols=["region"], numerical_cols=["age"])
    fz.ohe.categories = [["ARM", "FACE"]]
    fz.scaler.mean = np.array([50.0])
    fz.scaler.scale = np.array([20.0])
    fz.label_encoder.classes = ["ACK", "BCC", "MEL"]
    fzp = str(tmp_path / "fz.json")
    fz.save(fzp)

    monkeypatch.setenv("FEATURIZER_JSON", fzp)
    monkeypatch.setenv("CNN_MODEL_NAME", "custom-cnn")
    monkeypatch.setenv("ATTENTION_MECHANISM", "concatenation")
    monkeypatch.setenv("COMMON_DIM", "32")
    monkeypatch.setenv("NUM_HEADS", "4")
    monkeypatch.delenv("MODEL_CHECKPOINT", raising=False)
    monkeypatch.delenv("NUM_LABELS", raising=False)
    monkeypatch.delenv("VOCAB_SIZE", raising=False)

    from skinjax.serve.run_service import build_engine

    engine, model, variables = build_engine()
    assert model.num_classes == 3  # inferred from featurizer classes
    assert model.vocab_size == fz.dim
    img = np.random.default_rng(0).integers(0, 256, (40, 40, 3), dtype=np.uint8)
    out = engine.predict(img, "FACE, 61")
    assert out["predicted_classname"] in ["ACK", "BCC", "MEL"]
