"""Dynamic-batching frontend: concurrency correctness, grouping, error
fan-out, HTTP integration (VERDICT r1 #9; reference serves one request per
forward, api.py:165-203)."""

import threading

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from skinjax.serve.batching import BatchingEngine, _bucket
from tests.test_serving import _engine


def test_bucket_sizes():
    assert [_bucket(n, 32) for n in (1, 2, 3, 5, 9, 32, 40)] == [
        1, 2, 4, 8, 16, 32, 32]


@pytest.fixture(scope="module")
def batcher():
    eng = BatchingEngine(_engine("concatenation", use_fused=False),
                         max_batch=8, max_wait_ms=30.0)
    yield eng
    eng.shutdown()


def test_concurrent_predictions_match_serial(batcher):
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (12, 32, 32, 3), dtype=np.uint8)
    lines = [f"ARM, True, {20 + i}" for i in range(12)]

    serial = [batcher.engine.predict(imgs[i], lines[i]) for i in range(12)]

    results = [None] * 12

    def worker(i):
        results[i] = batcher.predict(imgs[i], lines[i])

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(12)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    for got, want in zip(results, serial):
        assert got["predicted_label_index"] == want["predicted_label_index"]
        np.testing.assert_allclose(
            got["probabilities"], want["probabilities"], atol=1e-5)

    # under 12 concurrent requests with a 30 ms linger, at least one forward
    # must have grouped >1 request
    assert batcher.stats["batched_requests"] > 0
    assert batcher.stats["batches"] < batcher.stats["requests"]


def test_error_fans_out_not_hangs(batcher):
    img = np.zeros((32, 32, 3), np.uint8)
    with pytest.raises(ValueError):
        batcher.predict(img, "not,enough")  # featurizer arity error (raised
        # on the caller thread, before enqueue)

    # errors raised inside the worker batch fan out to every waiter
    bad = BatchingEngine(batcher.engine, max_batch=4, max_wait_ms=10.0)
    try:
        orig = bad.engine.predict_probs
        bad.engine.predict_probs = lambda *a: (_ for _ in ()).throw(
            RuntimeError("boom"))
        with pytest.raises(RuntimeError):
            bad.predict_probs_queued(np.zeros((1, 32, 32, 3), np.float32),
                                     np.zeros((1, 7), np.float32))
    finally:
        bad.engine.predict_probs = orig
        bad.shutdown()


def test_timed_out_request_is_skipped_by_worker(batcher):
    """A request whose caller already timed out must not cost a forward
    (advisor r2: abandoned _Pendings were batched anyway, amplifying load
    exactly when the engine is backed up)."""
    import time

    from skinjax.serve.batching import _Pending

    eng = BatchingEngine(batcher.engine, max_batch=4, max_wait_ms=5.0,
                         timeout_s=0.05)
    orig = eng.engine.predict_probs
    try:
        calls = []
        release = threading.Event()

        def slow_predict(im, ft):
            calls.append(im.shape[0])
            release.wait(2.0)
            return orig(im, ft)

        eng.engine.predict_probs = slow_predict
        # park the worker on a slow batch so the next enqueue times out
        p_block = _Pending(np.zeros((1, 32, 32, 3), np.float32),
                           np.zeros((1, 7), np.float32))
        eng._q.put(p_block)  # worker picks this up and blocks in the fwd
        time.sleep(0.1)
        with eng._direct:  # disable the caller-thread fast path
            with pytest.raises(TimeoutError):
                eng.predict_probs_queued(
                    np.zeros((1, 32, 32, 3), np.float32),
                    np.zeros((1, 7), np.float32))
        release.set()
        assert p_block.event.wait(3.0)
        time.sleep(0.3)  # let the worker drain the abandoned entry
        # only the blocking request ran a forward; the abandoned one was
        # dropped by the worker, not executed
        assert calls == [1]
    finally:
        eng.engine.predict_probs = orig
        eng.shutdown()


def test_http_api_with_batching(batcher):
    """The HTTP handler works unchanged over a BatchingEngine."""
    import json
    import urllib.request
    from http.server import ThreadingHTTPServer

    import cv2

    from skinjax.serve.api import make_handler

    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(batcher))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        img = np.random.default_rng(1).integers(
            0, 256, (32, 32, 3), dtype=np.uint8)
        ok, png = cv2.imencode(".png", img)
        assert ok
        boundary = b"xBOUNDx"
        body = (
            b"--xBOUNDx\r\n"
            b'Content-Disposition: form-data; name="file"; filename="a.png"\r\n'
            b"\r\n" + png.tobytes() + b"\r\n"
            b"--xBOUNDx\r\n"
            b'Content-Disposition: form-data; name="metadata"\r\n'
            b"\r\nFACE, False, 41\r\n"
            b"--xBOUNDx--\r\n"
        )
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict/", data=body,
            headers={"Content-Type": "multipart/form-data; boundary=xBOUNDx"},
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            out = json.loads(resp.read())
        assert set(out) == {"predicted_label_index", "predicted_classname",
                            "probabilities"}
        assert len(out["probabilities"]) == 4
    finally:
        server.shutdown()


def test_unbatched_request_rank_normalized(batcher):
    """A bare (H, W, 3)/(F,) request is auto-batched instead of poisoning
    the whole batch with a shape error."""
    eng = batcher.engine
    feat_dim = eng.featurizer.dim if eng.featurizer else 16
    probs = batcher.predict_probs_queued(
        np.zeros((32, 32, 3), np.float32), np.zeros(feat_dim, np.float32))
    assert probs.shape[0] == 1


def test_lone_request_takes_direct_fast_path(batcher):
    """An idle-queue request runs in the caller thread (no linger)."""
    before = batcher.stats["direct_requests"]
    eng = batcher.engine
    feat_dim = eng.featurizer.dim if eng.featurizer else 16
    batcher.predict_probs_queued(
        np.zeros((1, 32, 32, 3), np.float32),
        np.zeros((1, feat_dim), np.float32))
    assert batcher.stats["direct_requests"] == before + 1


def test_uint8_requests_normalize_on_device(batcher):
    """uint8 path (on-device normalization, 4x smaller transfer) agrees
    with the pre-normalized float path; mixed-dtype groups are split."""
    from skinjax.serve.engine import preprocess_image, preprocess_image_u8

    eng = batcher.engine
    feat_dim = eng.featurizer.dim if eng.featurizer else 16
    rng = np.random.default_rng(3)
    raw = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    feats = np.zeros((1, feat_dim), np.float32)
    p_f32 = eng.predict_probs(preprocess_image(raw, size=(32, 32)), feats)
    p_u8 = eng.predict_probs(preprocess_image_u8(raw, size=(32, 32)), feats)
    np.testing.assert_allclose(p_u8, p_f32, atol=1e-4)

    # mixed dtypes through the queue resolve to the same answers
    results = {}

    def call(key, img):
        results[key] = batcher.predict_probs_queued(img, feats)

    ts = [threading.Thread(target=call, args=("f32", preprocess_image(raw, size=(32, 32)))),
          threading.Thread(target=call, args=("u8", preprocess_image_u8(raw, size=(32, 32))))]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    np.testing.assert_allclose(results["u8"], results["f32"], atol=1e-4)
