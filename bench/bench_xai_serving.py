"""XAI serving latency on the v5e (r3 verdict Weak #6): p50/p95 for the
interactive Grad-CAM++ path the web demo serves — prediction + CAM
(forward + jax.grad) + heatmap overlay + PNG encode — measured BOTH as the
direct function chain and end-to-end through serve/xai_app.py's HTTP
handler, for the flagship (resnet-50) and davit_tiny backbones.
Match: reference src/services/XAI/models/inference.py:29-64."""
import os as _os, sys as _sys  # repo-root import shim (scripts live in bench/)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import io
import json
import threading
import time
import urllib.request
import uuid

import numpy as np

import os
os.environ.setdefault("SKINJAX_WINATTN", "pallas")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import cv2

from skinjax.data.featurizer import MetadataFeaturizer
from skinjax.models import MultimodalModel
from skinjax.serve.engine import InferenceEngine
from skinjax.serve.xai_app import make_xai_handler
from skinjax.serve.engine import preprocess_image
from skinjax.xai.cam import grad_cam_pp, overlay_heatmap

out = {}
rng = np.random.default_rng(0)
cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]


def _featurizer():
    fz = MetadataFeaturizer(categorical_cols=["region", "itch"],
                            numerical_cols=["age"])
    fz.ohe.categories = [["ARM", "FACE", "NECK"], ["False", "True", "EMPTY"]]
    fz.scaler.mean = np.array([50.0])
    fz.scaler.scale = np.array([20.0])
    fz.label_encoder.classes = ["ACK", "BCC", "MEL", "NEV", "SCC", "SEK"]
    return fz


def build(backbone):
    fz = _featurizer()
    model = MultimodalModel(
        num_classes=6, num_heads=8, cnn_model_name=backbone,
        text_model_name="one-hot-encoder", common_dim=512, vocab_size=fz.dim,
        attention_mechanism="att-intramodal+residual+cross-attention-metadados",
        dtype=jnp.bfloat16)
    if backbone in ("davit_tiny",) and os.environ.get("SKINJAX_WINATTN") == "pallas":
        # the strip window kernel engages at init; CPU-pinned init cannot
        # lower a compiled pallas_call (bench.py has the same split)
        variables = model.init(jax.random.key(0),
                               jnp.zeros((1, 224, 224, 3)),
                               jnp.zeros((1, fz.dim)))
    else:
        with jax.default_device(cpu):
            variables = model.init(jax.random.key(0),
                                   jnp.zeros((1, 224, 224, 3)),
                                   jnp.zeros((1, fz.dim)))
        variables = jax.device_put(variables, dev)
    engine = InferenceEngine(model, variables, fz)
    return model, variables, engine, fz


IMG = rng.integers(0, 256, (224, 224, 3), dtype=np.uint8)
CSV_LINE = "FACE, True, 63"


def measure_direct(tag, backbone):
    model, variables, engine, fz = build(backbone)
    feats = engine._featurize_csv_line(CSV_LINE)
    image = preprocess_image(IMG)

    def once():
        result = engine.predict(IMG, CSV_LINE)
        cam = grad_cam_pp(model, variables, jnp.asarray(image),
                          jnp.asarray(feats),
                          jnp.asarray([result["predicted_label_index"]]))
        overlay = overlay_heatmap(IMG, np.asarray(cam)[0])
        ok, buf = cv2.imencode(".png", overlay)
        return buf

    for _ in range(3):
        once()
    ts = []
    for _ in range(30):
        t0 = time.perf_counter()
        once()
        ts.append((time.perf_counter() - t0) * 1000)
    out[f"{tag}_direct_p50_ms"] = round(float(np.percentile(ts, 50)), 1)
    out[f"{tag}_direct_p95_ms"] = round(float(np.percentile(ts, 95)), 1)
    print(json.dumps({k: v for k, v in out.items() if k.startswith(tag)}),
          flush=True)
    return model, variables, engine


def measure_http(tag, model, variables, engine, port):
    from http.server import ThreadingHTTPServer

    handler = make_xai_handler(engine, model, variables)
    srv = ThreadingHTTPServer(("127.0.0.1", port), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()

    ok, png = cv2.imencode(".png", cv2.cvtColor(IMG, cv2.COLOR_RGB2BGR))
    boundary = uuid.uuid4().hex
    parts = io.BytesIO()

    def field(name, value):
        parts.write(f"--{boundary}\r\nContent-Disposition: form-data; "
                    f"name=\"{name}\"\r\n\r\n{value}\r\n".encode())

    parts.write(f"--{boundary}\r\nContent-Disposition: form-data; "
                f"name=\"file\"; filename=\"x.png\"\r\n"
                f"Content-Type: image/png\r\n\r\n".encode())
    parts.write(png.tobytes())
    parts.write(b"\r\n")
    field("region", "FACE")
    field("itch", "True")
    field("age", "63")
    field("group_lesion_geometry", "on")
    field("group_symptoms", "on")
    field("group_demographics", "on")
    parts.write(f"--{boundary}--\r\n".encode())
    body = parts.getvalue()

    def once():
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/", data=body,
            headers={"Content-Type":
                     f"multipart/form-data; boundary={boundary}"})
        with urllib.request.urlopen(req, timeout=120) as r:
            page = r.read()
        assert b"Prediction" in page, page[:200]
        return page

    for _ in range(3):
        once()
    ts = []
    for _ in range(30):
        t0 = time.perf_counter()
        once()
        ts.append((time.perf_counter() - t0) * 1000)
    out[f"{tag}_http_p50_ms"] = round(float(np.percentile(ts, 50)), 1)
    out[f"{tag}_http_p95_ms"] = round(float(np.percentile(ts, 95)), 1)
    srv.shutdown()
    print(json.dumps({k: v for k, v in out.items() if k.startswith(tag)}),
          flush=True)


m, v, e = measure_direct("flagship", "resnet-50")
measure_http("flagship", m, v, e, 7991)
m, v, e = measure_direct("davit", "davit_tiny")
measure_http("davit", m, v, e, 7992)
print(json.dumps(out))
