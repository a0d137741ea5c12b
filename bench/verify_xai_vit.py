"""Verify driver: XAI HTTP app serving Grad-CAM++ overlays on a ViT
backbone — end-to-end check of the round-3 token-backbone capture path
through the real serving surface. CPU-only; exits 0 on success."""
import os as _os, sys as _sys  # repo-root import shim (scripts live in bench/)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

import cv2

from skinjax.data.featurizer import MetadataFeaturizer
from skinjax.models import MultimodalModel
from skinjax.serve.engine import InferenceEngine
from skinjax.serve.xai_app import make_xai_handler

fz = MetadataFeaturizer(categorical_cols=["region", "itch"],
                        numerical_cols=["age"])
fz.ohe.categories = [["ARM", "FACE", "NECK"], ["False", "True", "EMPTY"]]
fz.scaler.mean = np.array([50.0])
fz.scaler.scale = np.array([20.0])
fz.label_encoder.classes = ["ACK", "BCC", "MEL", "NEV"]

model = MultimodalModel(
    num_classes=4, num_heads=4, cnn_model_name="vit_tiny_patch16_224",
    common_dim=32, text_encoder_dim_output=32, vocab_size=fz.dim,
    attention_mechanism="concatenation",
)
img = jnp.zeros((1, 224, 224, 3))
meta = jnp.zeros((1, fz.dim))
variables = model.init(jax.random.key(0), img, meta)
engine = InferenceEngine(model, variables, fz, use_fused=False)

server = ThreadingHTTPServer(
    ("127.0.0.1", 0), make_xai_handler(engine, model, variables))
port = server.server_address[1]
threading.Thread(target=server.serve_forever, daemon=True).start()

# GET form page
page = urllib.request.urlopen(
    f"http://127.0.0.1:{port}/", timeout=30).read().decode()
assert "region" in page, "form page missing featurizer fields"
print("GET / ok")

# POST image + metadata -> prediction + CAM overlay
rgb = (np.random.default_rng(0).uniform(0, 255, (224, 224, 3))
       .astype(np.uint8))
ok, png = cv2.imencode(".png", cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
assert ok
boundary = "XaIvErIfY"
parts = []
parts.append(
    f'--{boundary}\r\nContent-Disposition: form-data; name="file"; '
    f'filename="x.png"\r\nContent-Type: image/png\r\n\r\n'.encode()
    + png.tobytes() + b"\r\n")
for k, v in (("region", "FACE"), ("itch", "True"), ("age", "63"),
             ("group_region", "on"), ("group_itch", "on"),
             ("group_age", "on")):
    parts.append(
        f'--{boundary}\r\nContent-Disposition: form-data; name="{k}"'
        f"\r\n\r\n{v}\r\n".encode())
parts.append(f"--{boundary}--\r\n".encode())
body = b"".join(parts)
req = urllib.request.Request(
    f"http://127.0.0.1:{port}/", data=body, method="POST",
    headers={"Content-Type": f"multipart/form-data; boundary={boundary}"})
resp = urllib.request.urlopen(req, timeout=600)
html_out = resp.read().decode()
assert resp.status == 200, resp.status
assert "Prediction:" in html_out, html_out[:300]
assert "data:image/png;base64," in html_out, "no CAM overlay in response"
b64 = html_out.split("data:image/png;base64,")[1].split('"')[0]
import base64
overlay = cv2.imdecode(np.frombuffer(base64.b64decode(b64), np.uint8),
                       cv2.IMREAD_COLOR)
assert overlay is not None and overlay.shape[:2] == (224, 224)
assert overlay.std() > 0, "degenerate overlay"
print(f"POST /predict ok: overlay {overlay.shape}, std={overlay.std():.1f}")
server.shutdown()
print("VERIFY-OK")
