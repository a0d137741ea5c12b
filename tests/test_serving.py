"""Serving tests: fused engine == plain forward, HTTP API round-trip,
StableHLO export round-trip."""

import json
import threading
import urllib.request

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from skinjax.data.featurizer import MetadataFeaturizer
from skinjax.models import MultimodalModel
from skinjax.serve.engine import InferenceEngine

VOCAB = 7  # 2 cat features (4+? cats) + numerics must match featurizer below


def _featurizer():
    fz = MetadataFeaturizer(
        categorical_cols=["region", "itch"], numerical_cols=["age"]
    )
    fz.ohe.categories = [["ARM", "FACE", "NECK"], ["False", "True", "EMPTY"]]
    fz.scaler.mean = np.array([50.0])
    fz.scaler.scale = np.array([20.0])
    fz.label_encoder.classes = ["ACK", "BCC", "MEL", "NEV"]
    return fz


def _engine(mech, use_fused):
    fz = _featurizer()
    model = MultimodalModel(
        num_classes=4, num_heads=4, cnn_model_name="custom-cnn", common_dim=32,
        text_encoder_dim_output=32, vocab_size=fz.dim, attention_mechanism=mech,
    )
    img = jnp.zeros((1, 32, 32, 3))
    meta = jnp.zeros((1, fz.dim))
    variables = model.init(jax.random.key(0), img, meta)
    return InferenceEngine(model, variables, fz, use_fused=use_fused)


@pytest.mark.parametrize(
    "mech",
    ["concatenation", "crossattention", "weighted", "gfcam",
     "cross-weights-after-crossattention", "metablock", "rg-att",
     "cross-attention-only",
     "att-intramodal+residual+cross-attention-metadados",
     "att-intramodal+residual+cross-attention-metadados+metablock"],
)
def test_fused_engine_matches_plain(mech):
    rng = np.random.default_rng(0)
    img = rng.normal(size=(3, 32, 32, 3)).astype(np.float32)
    meta = rng.normal(size=(3, 7)).astype(np.float32)
    plain = _engine(mech, use_fused=False)
    fused = _engine(mech, use_fused=True)
    assert fused.fused
    p1 = plain.predict_probs(img, meta)
    p2 = fused.predict_probs(img, meta)
    np.testing.assert_allclose(p1, p2, atol=1e-5)


def test_predict_from_raw_inputs():
    eng = _engine("concatenation", use_fused=True)
    img = np.random.default_rng(0).integers(0, 256, (50, 60, 3), dtype=np.uint8)
    out = eng.predict(img, "FACE, True, 63")
    assert set(out) == {"predicted_label_index", "predicted_classname", "probabilities"}
    assert out["predicted_classname"] in ["ACK", "BCC", "MEL", "NEV"]
    np.testing.assert_allclose(sum(out["probabilities"]), 1.0, atol=1e-5)


def test_http_api_roundtrip():
    import base64
    import cv2

    from skinjax.serve.api import make_handler
    from http.server import ThreadingHTTPServer

    eng = _engine("concatenation", use_fused=False)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(eng))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        img = np.random.default_rng(1).integers(0, 256, (40, 40, 3), dtype=np.uint8)
        ok, buf = cv2.imencode(".png", img)
        assert ok
        payload = json.dumps({
            "image_b64": base64.b64encode(buf.tobytes()).decode(),
            "metadata": "ARM, False, 41",
        }).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict/", data=payload,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            out = json.loads(resp.read())
        assert "predicted_classname" in out and len(out["probabilities"]) == 4
        # health
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/health", timeout=10) as r:
            assert json.loads(r.read())["status"] == "ok"
    finally:
        server.shutdown()


def test_stablehlo_export_roundtrip(tmp_path):
    from skinjax.serve.export import export_stablehlo, load_stablehlo

    model = MultimodalModel(
        num_classes=4, num_heads=4, cnn_model_name="custom-cnn", common_dim=32,
        text_encoder_dim_output=32, vocab_size=7,
        attention_mechanism="concatenation",
    )
    img = jnp.zeros((2, 32, 32, 3))
    meta = jnp.zeros((2, 7))
    variables = model.init(jax.random.key(0), img, meta)
    p = str(tmp_path / "model.shlo")
    export_stablehlo(model, variables, p, batch=2, image_size=(32, 32), vocab_size=7)
    exported = load_stablehlo(p)
    ref = model.apply(variables, img, meta)
    out = exported.call(img, meta)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_engine_handles_odd_image_sizes_and_bad_metadata():
    eng = _engine("concatenation", use_fused=True)
    rng = np.random.default_rng(5)
    # huge and tiny images both resize to the model input
    for shape in [(7, 9, 3), (500, 333, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        out = eng.predict(img, "ARM, True, 50")
        assert len(out["probabilities"]) == 4
    # wrong arity metadata -> clear error
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="expected 3 metadata values"):
        eng.predict(img, "ARM, True")
    # unknown category + junk numeric degrade gracefully (EMPTY/-1 semantics)
    out = eng.predict(img, "MARS, maybe, not_a_number")
    assert abs(sum(out["probabilities"]) - 1.0) < 1e-5


def test_api_error_responses():
    import urllib.error
    import urllib.request
    from http.server import ThreadingHTTPServer

    from skinjax.serve.api import make_handler

    eng = _engine("concatenation", use_fused=False)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(eng))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        # invalid image bytes -> 400
        payload = json.dumps({"image_b64": "aGVsbG8=", "metadata": "ARM, True, 4"})
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict/", data=payload.encode(),
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        # unknown route -> 404
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/nope", timeout=10)
            assert False
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.shutdown()
