"""Host-side input pipeline: decode/cache/prefetch; augmentation runs on-device.

Design (vs. the reference's DataLoader(num_workers=10) + CPU albumentations,
train_pad_20.py:306-335): the host does the irreducible IO — JPEG/PNG decode
(native via OpenCV) and a one-time resize to the model's static input size —
and keeps decoded uint8 images in an in-memory cache (a 224² RGB image is
147 KB; the largest dataset here fits in host RAM comfortably). Batches are
assembled as pinned numpy arrays on a background prefetch thread while the
device trains; all stochastic augmentation happens on-device inside the jitted
train step (skinjax/data/augment.py), so host CPU never bottlenecks the MXU.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Dict, Iterator, Optional, Sequence

import numpy as np


class ImageStore:
    """Decode-once uint8 image cache keyed by file name."""

    def __init__(self, img_dir: str, size=(224, 224), cache: bool = True):
        self.img_dir = img_dir
        self.size = tuple(size)
        self._cache: Optional[Dict[str, np.ndarray]] = {} if cache else None

    def _load(self, name: str) -> np.ndarray:
        import cv2

        path = os.path.join(self.img_dir, name)
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(f"Imagem inválida: {path}")
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        if img.shape[:2] != self.size:
            img = cv2.resize(img, self.size[::-1], interpolation=cv2.INTER_LINEAR)
        return np.ascontiguousarray(img, dtype=np.uint8)

    def get(self, name: str) -> np.ndarray:
        if self._cache is None:
            return self._load(name)
        hit = self._cache.get(name)
        if hit is None:
            hit = self._cache[name] = self._load(name)
        return hit

    def gather(self, names: Sequence[str]) -> np.ndarray:
        return np.stack([self.get(n) for n in names])


class ArraySource:
    """In-memory data source: images (N,H,W,3) uint8 + features + labels.
    Used for synthetic data (tests/bench) and for fully-cached datasets."""

    def __init__(self, images: np.ndarray, features: np.ndarray, labels: np.ndarray):
        assert len(images) == len(features) == len(labels)
        self.images = images
        self.features = features.astype(np.float32)
        self.labels = labels.astype(np.int32)

    def __len__(self):
        return len(self.images)

    def batch(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        return {
            "image": self.images[idx],
            "metadata": self.features[idx],
            "label": self.labels[idx],
        }


class FileSource:
    """Disk-backed source: ImageStore + featurized metadata arrays."""

    def __init__(
        self,
        store: ImageStore,
        image_files: Sequence[str],
        features: np.ndarray,
        labels: np.ndarray,
    ):
        self.store = store
        self.image_files = list(image_files)
        self.features = features.astype(np.float32)
        self.labels = labels.astype(np.int32)

    def __len__(self):
        return len(self.image_files)

    def batch(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        return {
            "image": self.store.gather([self.image_files[i] for i in idx]),
            "metadata": self.features[idx],
            "label": self.labels[idx],
        }


class TokenSource:
    """Source for sentence-metadata datasets (skinLesionDatasetsWithBert.py):
    images + tokenized sentences (input_ids/attention_mask) + labels. The
    metadata of a batch is a dict pytree, which the train/eval steps accept.
    """

    def __init__(
        self,
        images_or_store,
        image_files,
        input_ids: np.ndarray,
        attention_mask: np.ndarray,
        labels: np.ndarray,
    ):
        self._store = None
        self._images = None
        if isinstance(images_or_store, np.ndarray):
            self._images = images_or_store
        else:
            self._store = images_or_store
            self._files = list(image_files)
        self.input_ids = input_ids.astype(np.int32)
        self.attention_mask = attention_mask.astype(np.int32)
        self.labels = labels.astype(np.int32)

    def __len__(self):
        return len(self.labels)

    def batch(self, idx: np.ndarray) -> Dict[str, object]:
        idx = np.asarray(idx)
        if self._images is not None:
            imgs = self._images[idx]
        else:
            imgs = self._store.gather([self._files[i] for i in idx])
        return {
            "image": imgs,
            "metadata": {
                "input_ids": self.input_ids[idx],
                "attention_mask": self.attention_mask[idx],
            },
            "label": self.labels[idx],
        }


def synthetic_source(
    n: int = 256,
    image_size=(224, 224),
    feature_dim: int = 91,
    num_classes: int = 6,
    seed: int = 0,
) -> ArraySource:
    """Random-but-deterministic dataset with class-conditional signal, used by
    tests and bench (the fake-dataset fixture mandated by SURVEY.md §4)."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, num_classes, size=n).astype(np.int32)
    images = rng.integers(0, 256, size=(n, *image_size, 3), dtype=np.uint8)
    # plant a per-class brightness signal so learning is testable
    images = np.clip(
        images.astype(np.int32) + (labels * 12)[:, None, None, None], 0, 255
    ).astype(np.uint8)
    features = rng.normal(size=(n, feature_dim)).astype(np.float32)
    features[np.arange(n), labels % feature_dim] += 2.0
    return ArraySource(images, features, labels)


def prefetch_batches(
    source, index_matrix: np.ndarray, prefetch: int = 4
) -> Iterator[Dict[str, np.ndarray]]:
    """Yield batches for the given (num_batches, B) index matrix, assembled on
    a daemon thread ahead of consumption."""
    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    stop = object()
    cancelled = threading.Event()
    error: list = []

    def _put(item) -> bool:
        # bounded put that re-checks cancellation, so an abandoned consumer
        # (break / exception in the train loop) can't strand the producer
        # blocked forever on a full queue (ADVICE r1)
        while not cancelled.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for row in index_matrix:
                if cancelled.is_set() or not _put(source.batch(row)):
                    return
        except BaseException as e:  # surface loader failures to the consumer
            error.append(e)
        finally:
            _put(stop)

    threading.Thread(target=worker, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is stop:
                if error:
                    raise error[0]
                return
            yield item
    finally:
        cancelled.set()
