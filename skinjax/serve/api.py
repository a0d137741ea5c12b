"""HTTP inference service — the reference's FastAPI ``POST /predict/``
(api.py:165-203) on the Python stdlib (fastapi/uvicorn aren't in this image;
the endpoint schema and response JSON are identical, so clients port 1:1).

Endpoints:
  GET  /health    -> {"status": "ok"}
  POST /predict/  multipart/form-data with fields ``file`` (image bytes) and
                  ``metadata`` (one raw CSV line in training column order)
                  -> {"predicted_label_index", "predicted_classname",
                      "probabilities"}
"""

from __future__ import annotations

import io
import json
import re
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from skinjax.serve.engine import InferenceEngine


def _parse_multipart(body: bytes, content_type: str):
    m = re.search(r"boundary=([^;]+)", content_type)
    if not m:
        raise ValueError("missing multipart boundary")
    boundary = m.group(1).strip('"').encode()
    parts = body.split(b"--" + boundary)
    fields = {}
    for part in parts:
        if b"\r\n\r\n" not in part:
            continue
        head, _, payload = part.partition(b"\r\n\r\n")
        # each part's payload is terminated by exactly CRLF before the next
        # boundary marker (don't rstrip byte classes — binary payloads may
        # legitimately end in '-', '\r' or '\n')
        if payload.endswith(b"\r\n"):
            payload = payload[:-2]
        # anchor to a parameter boundary so 'filename="..."' can't shadow
        # the 'name' parameter (ADVICE r1)
        nm = re.search(rb'(?:^|;\s*)name="([^"]+)"', head, re.M)
        if nm:
            fields[nm.group(1).decode()] = payload
    return fields


def make_handler(engine: InferenceEngine):
    class Handler(BaseHTTPRequestHandler):
        def _json(self, code: int, payload: dict):
            data = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            if self.path.rstrip("/") in ("", "/health"):
                self._json(200, {"status": "ok"})
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if not self.path.startswith("/predict"):
                return self._json(404, {"error": "not found"})
            try:
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length)
                ctype = self.headers.get("Content-Type", "")
                if ctype.startswith("multipart/form-data"):
                    fields = _parse_multipart(body, ctype)
                    img_bytes = fields.get("file", b"")
                    metadata = fields.get("metadata", b"").decode()
                else:  # JSON fallback: {"image_b64": ..., "metadata": ...}
                    payload = json.loads(body)
                    import base64

                    img_bytes = base64.b64decode(payload["image_b64"])
                    metadata = payload["metadata"]

                import cv2

                arr = np.frombuffer(img_bytes, dtype=np.uint8)
                img = cv2.imdecode(arr, cv2.IMREAD_COLOR)
                if img is None:
                    return self._json(400, {"error": "invalid image"})
                img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
                result = engine.predict(img, metadata)
                self._json(200, result)
            except Exception as e:  # noqa: BLE001 - serving boundary
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):  # quiet
            pass

    return Handler


def serve(engine: InferenceEngine, host: str = "0.0.0.0", port: int = 8000):
    server = ThreadingHTTPServer((host, port), make_handler(engine))
    print(f"skinjax inference service on {host}:{port}")
    server.serve_forever()
