"""XAI demo web app — the reference's Gradio service (src/services/XAI/app.py)
rebuilt on the stdlib HTTP server (gradio isn't in this image).

Features parity: metadata fields organized in toggleable groups
(metadata_groups.py:1-32 — demographics / history / symptoms /
lesion_geometry); disabled groups feed neutral values (EMPTY / -1), the
PAD-schema CSV line is rebuilt (metadata_builder.py:11-38), and the response
shows the prediction plus a Grad-CAM++ heatmap overlay.
"""

from __future__ import annotations

import base64
import html
import io
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Sequence

import numpy as np

# PAD-UFES-20 field groups (metadata_groups.py:1-32)
METADATA_GROUPS: Dict[str, List[str]] = {
    "demographics": ["age", "gender", "fitspatrick", "background_father",
                     "background_mother"],
    "history": ["smoke", "drink", "pesticide", "skin_cancer_history",
                "cancer_history", "has_piped_water", "has_sanitation"],
    "symptoms": ["itch", "grew", "hurt", "changed", "bleed", "elevation"],
    "lesion_geometry": ["region", "diameter_1", "diameter_2"],
}


def build_metadata_values(
    values: Dict[str, str],
    enabled_groups: Sequence[str],
    featurizer,
) -> str:
    """Group-gated CSV line in training column order (metadata_builder.py:11-38)."""
    enabled_fields = set()
    for g in enabled_groups:
        enabled_fields.update(METADATA_GROUPS.get(g, []))
    cols = featurizer.categorical_cols + featurizer.numerical_cols
    out = []
    for c in cols:
        if c in enabled_fields and values.get(c, "") != "":
            out.append(str(values[c]))
        else:
            out.append("-1" if c in featurizer.numerical_cols else "EMPTY")
    return ",".join(out)


_PAGE = """<!doctype html><html><head><title>skinjax XAI demo</title>
<style>body{font-family:sans-serif;max-width:900px;margin:2em auto}
fieldset{margin:.6em 0}label{display:inline-block;width:180px}
img{max-width:380px;border:1px solid #ccc;margin:4px}</style></head><body>
<h2>skinjax — multimodal skin-lesion XAI demo</h2>
<form method="post" action="/analyze" enctype="multipart/form-data">
<p><input type="file" name="file" accept="image/*" required></p>
%FIELDSETS%
<p><button type="submit">Predict + explain</button></p>
</form>%RESULT%</body></html>"""


def _fieldsets(featurizer) -> str:
    cols = set(featurizer.categorical_cols + featurizer.numerical_cols)
    html = []
    for group, fields in METADATA_GROUPS.items():
        rows = [
            f'<fieldset><legend><label><input type="checkbox" name="group_{group}"'
            f' checked> {group}</label></legend>'
        ]
        for f in fields:
            if f in cols:
                rows.append(f'<label>{f}</label><input name="{f}"><br>')
        rows.append("</fieldset>")
        html.append("\n".join(rows))
    return "\n".join(html)


def make_xai_handler(engine, model, variables):
    """engine: InferenceEngine; model/variables for the CAM pass."""
    import cv2
    import jax.numpy as jnp

    from skinjax.serve.api import _parse_multipart
    from skinjax.serve.engine import preprocess_image
    from skinjax.xai import grad_cam_pp, overlay_heatmap

    fz = engine.featurizer

    class Handler(BaseHTTPRequestHandler):
        def _html(self, body: str, code: int = 200):
            data = body.encode()
            self.send_response(code)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            page = _PAGE.replace("%FIELDSETS%", _fieldsets(fz)).replace("%RESULT%", "")
            self._html(page)

        def do_POST(self):
            try:
                length = int(self.headers.get("Content-Length", 0))
                fields = _parse_multipart(
                    self.rfile.read(length), self.headers.get("Content-Type", "")
                )
                img_bytes = fields.pop("file", b"")
                values = {k: v.decode() for k, v in fields.items()}
                enabled = [
                    g for g in METADATA_GROUPS if values.pop(f"group_{g}", None)
                ]
                arr = np.frombuffer(img_bytes, dtype=np.uint8)
                img_u8 = cv2.cvtColor(
                    cv2.imdecode(arr, cv2.IMREAD_COLOR), cv2.COLOR_BGR2RGB
                )

                csv_line = build_metadata_values(values, enabled, fz)
                result = engine.predict(img_u8, csv_line)

                # Grad-CAM++ overlay on the predicted class
                image = preprocess_image(img_u8)
                feats = engine._featurize_csv_line(csv_line)
                cam = grad_cam_pp(
                    model, variables, jnp.asarray(image), jnp.asarray(feats),
                    jnp.asarray([result["predicted_label_index"]]),
                )
                img224 = cv2.resize(img_u8, (image.shape[2], image.shape[1]))
                overlay = overlay_heatmap(img224, np.asarray(cam)[0])
                ok, buf = cv2.imencode(
                    ".png", cv2.cvtColor(overlay, cv2.COLOR_RGB2BGR)
                )
                b64 = base64.b64encode(buf.tobytes()).decode()

                probs = "".join(
                    f"<li>{html.escape(str(c))}: {p:.3f}</li>"
                    for c, p in zip(engine.class_names, result["probabilities"])
                )
                res = (
                    f"<h3>Prediction: "
                    f"{html.escape(str(result['predicted_classname']))}</h3>"
                    f"<ul>{probs}</ul>"
                    f'<img src="data:image/png;base64,{b64}" alt="Grad-CAM++">'
                )
                page = _PAGE.replace("%FIELDSETS%", _fieldsets(fz)).replace(
                    "%RESULT%", res
                )
                self._html(page)
            except Exception as e:  # noqa: BLE001 - serving boundary
                # exception text can embed user-supplied form values —
                # escape to avoid reflected XSS (ADVICE r1)
                self._html(
                    f"<pre>error: {type(e).__name__}: "
                    f"{html.escape(str(e))}</pre>", 500,
                )

        def log_message(self, fmt, *args):
            pass

    return Handler


def serve_xai(engine, model, variables, host: str = "0.0.0.0", port: int = 7860):
    server = ThreadingHTTPServer(
        (host, port), make_xai_handler(engine, model, variables)
    )
    print(f"skinjax XAI demo on {host}:{port}")
    server.serve_forever()
