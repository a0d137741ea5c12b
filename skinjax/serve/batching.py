"""Dynamic-batching frontend for the inference engine.

The reference serves one request per forward (api.py:165-203 — FastAPI calls
``inference()`` per request). On TPU a batch-1 forward leaves the chip >90%
idle: the same compiled program at batch 32 costs barely more wall time than
batch 1, so under concurrency a queue + batcher multiplies throughput at a
bounded latency cost.

``BatchingEngine`` wraps :class:`InferenceEngine` with the same ``predict``
surface:

  * requests enqueue (featurized, preprocessed) and block on an event;
  * one worker drains the queue, groups up to ``max_batch`` requests that
    arrive within ``max_wait_ms``, pads the group to the next power-of-two
    bucket (so XLA compiles at most log2(max_batch)+1 programs, each cached),
    runs ONE forward, and fans results back out;
  * a lone request under no load pays at most ``max_wait_ms`` extra — and
    nothing at all when the queue was empty at enqueue time (fast path).
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Dict, List, Optional

import numpy as np

from skinjax.serve.engine import InferenceEngine, preprocess_image_u8


class _Pending:
    __slots__ = ("image", "feats", "event", "probs", "error", "abandoned")

    def __init__(self, image: np.ndarray, feats: np.ndarray):
        # accept unbatched (H, W, 3)/(F,) — a bare-rank request would
        # otherwise produce an inscrutable shape error inside the jitted
        # forward of whatever batch it lands in
        self.image = image if image.ndim == 4 else image[None]
        self.feats = feats if feats.ndim == 2 else feats[None]
        if self.image.shape[0] != 1 or self.feats.shape[0] != 1:
            raise ValueError(
                "predict_probs_queued takes ONE request: image (1, H, W, 3) "
                f"and feats (1, F); got {image.shape} / {feats.shape}"
            )
        self.event = threading.Event()
        self.probs: Optional[np.ndarray] = None
        self.error: Optional[Exception] = None
        # set by the caller when it gives up waiting (timeout): the worker
        # drops abandoned entries instead of spending a TPU forward on a
        # request nobody is waiting for — which would amplify load exactly
        # when the engine is already backed up
        self.abandoned = False


def _bucket(n: int, max_batch: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return min(b, max_batch)


class BatchingEngine:
    """Drop-in ``predict``-compatible wrapper adding dynamic batching."""

    def __init__(
        self,
        engine: InferenceEngine,
        max_batch: int = 32,
        max_wait_ms: float = 5.0,
        timeout_s: float = 60.0,
    ):
        self.engine = engine
        self.max_batch = int(max_batch)
        self.max_wait_s = max_wait_ms / 1e3
        self.timeout_s = timeout_s
        self._q: "queue.Queue[_Pending]" = queue.Queue()
        self._stop = threading.Event()
        self._direct = threading.Lock()  # guards the low-load fast path
        # stats are written from the worker AND from fast-path caller
        # threads — non-atomic += would drop counts
        self._stats_lock = threading.Lock()
        # occupancy_sum/forward_s/idle_s: server-side accounting that
        # separates "the worker is saturated" from "the worker is starved
        # waiting for requests" — the evidence that attributes throughput
        # regressions to the server pipeline vs the client side (README
        # serving table: 32-client dip on the 1-core host)
        self.stats = {"requests": 0, "batches": 0, "batched_requests": 0,
                      "direct_requests": 0, "occupancy_sum": 0,
                      "forward_s": 0.0, "idle_s": 0.0}
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # -- same public surface as InferenceEngine.predict ----------------------
    @property
    def class_names(self):
        return self.engine.class_names

    def predict(self, image_u8: np.ndarray, metadata_csv_line: str) -> Dict:
        # uint8 through the queue: normalization happens on-device, so each
        # request ships 4× fewer bytes to the (possibly tunneled) chip
        image = preprocess_image_u8(image_u8)
        if self.engine.featurizer is None:
            # mirror InferenceEngine.predict's guard — without it the private
            # _featurize_csv_line call fails with an unclear deep error
            raise ValueError("predict() on raw inputs requires a featurizer")
        feats = self.engine._featurize_csv_line(metadata_csv_line)
        probs = self.predict_probs_queued(image, feats)[0]
        idx = int(probs.argmax())
        names = self.engine.class_names
        return {
            "predicted_label_index": idx,
            "predicted_classname": names[idx] if names else str(idx),
            "probabilities": probs.tolist(),
        }

    def predict_probs_queued(
        self, image: np.ndarray, feats: np.ndarray
    ) -> np.ndarray:
        """Enqueue one preprocessed request; blocks until its batch ran.

        Fast path: when nothing is queued and no other direct call is in
        flight, run the batch-1 forward in the caller's thread — a lone
        client pays direct-call latency (no linger, no queue/thread
        handoff). Under load the lock is held or the queue is non-empty and
        requests flow through the batching worker."""
        p = _Pending(np.asarray(image), np.asarray(feats))
        if self._q.empty() and self._direct.acquire(blocking=False):
            try:
                if self._q.empty():
                    probs = self.engine.predict_probs(p.image, p.feats)
                    with self._stats_lock:
                        self.stats["requests"] += 1
                        self.stats["direct_requests"] += 1
                    return probs
            finally:
                self._direct.release()
        self._q.put(p)
        if not p.event.wait(self.timeout_s):
            p.abandoned = True
            raise TimeoutError("batched inference timed out")
        if p.error is not None:
            raise p.error
        return p.probs

    def shutdown(self):
        self._stop.set()
        self._worker.join(timeout=5)

    # -- worker ---------------------------------------------------------------
    def _collect(self) -> List[_Pending]:
        t0 = time.perf_counter()
        try:
            first = self._q.get(timeout=0.1)
        except queue.Empty:
            with self._stats_lock:
                self.stats["idle_s"] += time.perf_counter() - t0
            return []
        with self._stats_lock:
            self.stats["idle_s"] += time.perf_counter() - t0
        group = [first]
        deadline = time.perf_counter() + self.max_wait_s
        while len(group) < self.max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                group.append(self._q.get(timeout=remaining))
            except queue.Empty:
                break
        return group

    def _run(self):
        while not self._stop.is_set():
            group = self._collect()
            if not group:
                continue
            # one forward per dtype family: uint8 requests (on-device
            # normalize) and pre-normalized float requests can't share a
            # concatenated batch. Errors are isolated per subgroup — a
            # failing uint8 batch must not clobber float results that
            # already completed (and vice versa).
            subgroups: Dict[bool, List[_Pending]] = {}
            for p in group:
                if p.abandoned:  # caller already timed out — skip, don't run
                    p.event.set()
                    continue
                subgroups.setdefault(p.image.dtype == np.uint8, []).append(p)
            for sub in subgroups.values():
                try:
                    n = len(sub)
                    b = _bucket(n, self.max_batch)
                    images = np.concatenate(
                        [p.image for p in sub]
                        + [sub[-1].image] * (b - n)  # pad to the bucket size
                    )
                    feats = np.concatenate(
                        [p.feats for p in sub] + [sub[-1].feats] * (b - n)
                    )
                    tf = time.perf_counter()
                    probs = self.engine.predict_probs(images, feats)
                    tf = time.perf_counter() - tf
                    for i, p in enumerate(sub):
                        p.probs = probs[i : i + 1]
                    with self._stats_lock:
                        self.stats["requests"] += n
                        self.stats["batches"] += 1
                        self.stats["occupancy_sum"] += n
                        self.stats["forward_s"] += tf
                        if n > 1:
                            self.stats["batched_requests"] += n
                except Exception as e:  # noqa: BLE001 - fan the error out
                    for p in sub:
                        p.error = e
                finally:
                    for p in sub:
                        p.event.set()
