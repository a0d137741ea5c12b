"""HPO tuner + XAI web app tests."""

import threading
import urllib.request

import numpy as np
import pytest

from skinjax.nas.hpo import tune_hyperparameters


def test_hpo_gp_minimizes():
    space = {"lr": [1e-4, 1e-3, 1e-2], "width": [32, 64, 128]}

    def objective(p):
        # optimum at lr=1e-3, width=64
        return abs(np.log10(p["lr"]) + 3) + abs(p["width"] - 64) / 64

    best, val, log = tune_hyperparameters(objective, space, n_trials=20, seed=0)
    assert best["lr"] == 1e-3 and best["width"] == 64
    assert val == 0.0 and len(log) == 20


def test_hpo_survives_failures():
    def objective(p):
        raise RuntimeError("boom")

    best, val, log = tune_hyperparameters(
        objective, {"x": [1, 2]}, n_trials=3, strategy="random"
    )
    assert len(log) == 3 and best is None


def test_xai_app_serves_form_and_analyzes():
    import json

    import cv2
    import jax
    import jax.numpy as jnp

    from http.server import ThreadingHTTPServer

    from skinjax.data.featurizer import MetadataFeaturizer
    from skinjax.models import MultimodalModel
    from skinjax.serve.engine import InferenceEngine
    from skinjax.serve.xai_app import build_metadata_values, make_xai_handler

    fz = MetadataFeaturizer(
        categorical_cols=["region", "itch"], numerical_cols=["age"]
    )
    fz.ohe.categories = [["ARM", "FACE"], ["True", "False", "EMPTY"]]
    fz.scaler.mean = np.array([50.0])
    fz.scaler.scale = np.array([20.0])
    fz.label_encoder.classes = ["ACK", "BCC", "MEL"]

    model = MultimodalModel(
        num_classes=3, num_heads=4, cnn_model_name="resnet-18", common_dim=32,
        text_encoder_dim_output=32, vocab_size=fz.dim,
        attention_mechanism="concatenation",
    )
    img = jnp.zeros((1, 32, 32, 3))
    meta = jnp.zeros((1, fz.dim))
    variables = model.init(jax.random.key(0), img, meta)
    engine = InferenceEngine(model, variables, fz, use_fused=False)

    # group gating: disabled groups -> EMPTY/-1
    line = build_metadata_values(
        {"region": "FACE", "itch": "True", "age": "60"},
        enabled_groups=["lesion_geometry"], featurizer=fz,
    )
    assert line == "FACE,EMPTY,-1"

    server = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_xai_handler(engine, model, variables)
    )
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/", timeout=30) as r:
            page = r.read().decode()
        assert "skinjax" in page and "lesion_geometry" in page

        # multipart POST with an image + metadata
        rng = np.random.default_rng(0)
        ok, buf = cv2.imencode(".png", rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
        boundary = "XBOUNDARY"
        parts = []
        parts.append(
            f'--{boundary}\r\nContent-Disposition: form-data; name="file"; '
            f'filename="x.png"\r\nContent-Type: image/png\r\n\r\n'.encode()
            + buf.tobytes() + b"\r\n"
        )
        for k, v in [("region", "ARM"), ("itch", "False"), ("age", "44"),
                     ("group_lesion_geometry", "on"), ("group_symptoms", "on"),
                     ("group_demographics", "on"), ("group_history", "on")]:
            parts.append(
                f'--{boundary}\r\nContent-Disposition: form-data; name="{k}"'
                f"\r\n\r\n{v}\r\n".encode()
            )
        body = b"".join(parts) + f"--{boundary}--\r\n".encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/analyze", data=body,
            headers={"Content-Type": f"multipart/form-data; boundary={boundary}"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            page = r.read().decode()
        assert "Prediction:" in page and "data:image/png;base64" in page
    finally:
        server.shutdown()
